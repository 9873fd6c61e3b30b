package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): times individual declared
  * queries EXACTLY like the frozen `graft.Bench` phase 1 (same session
  * config, same `fn(s, sfDir).count()` action), but with
  *  - a query-name filter (args = substrings; empty = all),
  *  - N repetitions per query (SPARK_GRAFT_REPS, default 3) with min/all
  *    samples printed — one-shot timings at 32 cores are noise-dominated,
  *  - optional `.explain("formatted")` dump per query to plans/r06/
  *    (SPARK_GRAFT_EXPLAIN=before|after),
  *  - optional noop-sink isolation (SPARK_GRAFT_NOOP=1) per guide §1.4 —
  *    computes every column instead of count()'s pruned plan.
  *
  * Never run by the driver; numbers are cited in OPTIMIZATION_r06.md.
  */
object BenchExtra {

  private def tmpfs: String = sys.env.getOrElse("SPARK_GRAFT_TMPFS", "/dev/shm")

  /** Jobs/stages/tasks + executor task-time tally for ONE query rep —
    * separates driver/scheduling overhead (wall >> taskSum) from executor
    * compute (wall ~ taskSum/cores).
    */
  private final class Tally extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) { taskTimeMs += m.executorRunTime; gcTimeMs += m.jvmGCTime }
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcTimeMs = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val explainTag = sys.env.get("SPARK_GRAFT_EXPLAIN") // before|after
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpfs/graft_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val tally = new Tally
    s.sparkContext.addSparkListener(tally)

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.contains))
    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      s.sparkContext.setJobDescription(name)
      val samples = (0 until reps).map { r =>
        if (r == reps - 1) { Thread.sleep(50); tally.reset() }
        val t0 = System.nanoTime()
        val df = fn(s, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(100) // listener events drain asynchronously
      explainTag.foreach { tag =>
        val plan = fn(s, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val out = java.nio.file.Paths.get("plans", "r06", s"${name}_$tag.txt")
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
      }
      totals(name) = samples.min
      println(f"QUERY $name%-18s min=${samples.min}%7.3f  samples=${samples.map(x => f"$x%.3f").mkString(",")}  lastRep: jobs=${tally.jobs} stages=${tally.stages} tasks=${tally.tasks} taskSum=${tally.taskTimeMs / 1e3}%.2fs gc=${tally.gcTimeMs / 1e3}%.2fs")
      System.out.flush()
    }
    println(f"TOTAL ${totals.values.sum}%.3f s over ${totals.size} queries (reps=$reps, noop=$noop)")
    s.stop()
  }
}
