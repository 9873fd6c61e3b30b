package graft.tools

import graft.codec.BtrConfig
import graft.engine.BlockFiles
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage breakdown of the bench's RANGE pipeline
  * (BlockFiles.write(..., rangeCols, compressedExchange = true)) — the
  * 2->8-core gate metric. Mirrors the Bench encodeChild session config
  * (64 shuffle partitions, 16m splits, tmpfs spill) so stage times map
  * 1:1 onto the gate forks.
  */
object RangeProfile {
  private def tmpfs: String = sys.env.getOrElse("SPARK_GRAFT_TMPFS", "/dev/shm")

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-range-profile-$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", s"$tmpfs/graft_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int, Long, Long)]()
    val taskDetail = sys.env.get("SPARK_GRAFT_TASKS").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        stages.put(si.stageId,
          (si.name.take(70), wall, si.numTasks, tm.executorRunTime, tm.shuffleWriteMetrics.bytesWritten))
        println(f"  [gc] stage ${si.stageId}%3d gc=${tm.jvmGCTime / 1000.0}%6.2f s cpu=${tm.executorCpuTime / 1e9}%7.2f s run=${tm.executorRunTime / 1000.0}%7.2f s shufWriteTime=${tm.shuffleWriteMetrics.writeTime / 1e9}%6.2f s")
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = if (taskDetail) {
        val ti = te.taskInfo
        val m = te.taskMetrics
        println(f"    task stage=${te.stageId}%3d id=${ti.index}%3d launch=${ti.launchTime}%d dur=${ti.duration}%5d run=${m.executorRunTime}%5d deser=${m.executorDeserializeTime}%4d gc=${m.jvmGCTime}%4d fetchWait=${m.shuffleReadMetrics.fetchWaitTime}%4d shRead=${m.shuffleReadMetrics.totalBytesRead / 1000000}%4dMB")
      }
    })

    val input = "file:" + sys.env.getOrElse("SPARK_GRAFT_BENCH_INPUT", "/root/repo/target/tmp/bench_input")
    val out = s"file:$tmpfs/graft_range_profile"
    def rm(): Unit =
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(out),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(out), true)

    // warm pass (JIT), same shape as the bench warmup
    val allFiles = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(input),
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(input))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
    val warmFiles = allFiles.take(math.max(4, allFiles.length / 8))
    BlockFiles.write(spark.read.parquet(warmFiles: _*), out,
      BtrConfig.default, rangeCols = Seq("repo", "path"), compressedExchange = true)
    rm()

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    for (i <- 0 until reps) {
      stages.clear()
      val t0 = System.nanoTime()
      BlockFiles.write(spark.read.parquet(input), out,
        BtrConfig.default, rangeCols = Seq("repo", "path"), compressedExchange = true)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"RANGE rep=$i cores=$cores TOTAL $total%.2f s")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (name, wall, n, taskMs, shw)) =>
        println(f"  stage $id%3d wall=${wall / 1000.0}%6.2f s tasks=$n%3d taskTime=${taskMs / 1000.0}%7.2f s shufW=${shw / 1e6}%7.1f MB  $name")
      }
      rm()
      System.out.flush()
    }
    spark.stop()
  }
}
