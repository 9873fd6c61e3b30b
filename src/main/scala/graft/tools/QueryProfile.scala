package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one or more declared queries (guide §7.1 without a
  * UI): run each query twice (first = warm), and during the second run print
  * every completed stage's name, task count, summed executor run time, and
  * shuffle/input bytes. Never run by the driver.
  *
  * Usage: sbt "runMain graft.tools.QueryProfile <query> [query ...]"
  */
object QueryProfile {

  private final class StagePrinter extends SparkListener {
    @volatile var enabled = false
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (enabled) {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val name = si.name.linesIterator.next().take(100)
      println(f"  stage ${si.stageId}%4d tasks=${si.numTasks}%3d run=${m.executorRunTime / 1e3}%7.2fs " +
        f"cpu=${m.executorCpuTime / 1e9}%7.2fs deser=${m.executorDeserializeTime / 1e3}%5.2fs " +
        f"gc=${m.jvmGCTime / 1e3}%5.2fs in=${m.inputMetrics.bytesRead / 1e6}%8.2fMB " +
        f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB  $name")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tmpfs = sys.env.getOrElse("SPARK_GRAFT_TMPFS", "/dev/shm")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-queryprofile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpfs/graft_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val printer = new StagePrinter
    s.sparkContext.addSparkListener(printer)

    val coldStages = sys.env.get("QPROF_COLD").contains("1")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      if (coldStages) printer.enabled = true
      val w0 = { val t = System.nanoTime(); fn(s, sfDir).count(); (System.nanoTime() - t) / 1e9 }
      Thread.sleep(200)
      printer.enabled = false
      println(f"== $name (warm run below; first run $w0%.2fs)")
      printer.enabled = true
      val t0 = System.nanoTime()
      fn(s, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      printer.enabled = false
      println(f"== $name wall=$w%.2fs")
    }
    s.stop()
  }
}
