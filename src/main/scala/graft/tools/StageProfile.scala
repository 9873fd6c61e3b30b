package graft.tools

import graft.codec.BtrConfig
import graft.engine.BtrTable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task-time breakdown of one BtrTable.write run. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val taskTime = si.taskMetrics.executorRunTime
        stages.put(si.stageId, (si.name.take(60), wall, si.numTasks, taskTime))
      }
    })

    val input = "file:/root/repo/target/tmp/bench_input"
    // warm
    BtrTable.write(spark.read.parquet(input), "file:/root/repo/target/tmp/sp_warm",
      BtrConfig.default, rangeCols = Seq("repo", "path"))
    stages.clear()
    val t0 = System.nanoTime()
    BtrTable.write(spark.read.parquet(input), "file:/root/repo/target/tmp/sp_run",
      BtrConfig.default, rangeCols = Seq("repo", "path"))
    val total = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL $total%.2f s  (cores=$cores)")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (name, wall, n, taskMs)) =>
      println(f"stage $id%3d  wall=${wall / 1000.0}%6.2f s  tasks=$n%3d  taskTime=${taskMs / 1000.0}%7.2f s  $name")
    }
    spark.stop()
  }
}
