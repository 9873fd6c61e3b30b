package graft.tools

import graft.codec.BtrConfig
import graft.engine.{BlockFiles, BtrTable}
import org.apache.spark.sql.SparkSession

/** One measured encode run at a given core count — for profiling the
  * scaling anomaly (args: cores mode [inputDir] [outDir]).
  * mode: range | mapside | range-blocks | mapside-blocks
  */
object EncodeOnce {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val mode = args(1)
    val input = if (args.length > 2) args(2) else "file:/root/repo/target/tmp/bench_input"
    val out = if (args.length > 3) args(3) else s"file:/dev/shm/graft_once_$mode$cores"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(input)
    println(s"ENCODE_ONCE scanPartitions=${df.rdd.getNumPartitions}")
    val reps = sys.env.getOrElse("ENCODE_ONCE_REPS", "1").toInt
    for (i <- 0 until reps) {
      val t0 = System.nanoTime()
      val m = mode match {
        case "range"          => BtrTable.write(df, s"$out/$i", BtrConfig.default, rangeCols = Seq("repo", "path"))
        case "mapside"        => BtrTable.write(df, s"$out/$i", BtrConfig.default)
        case "range-blocks"   => BlockFiles.write(df, s"$out/$i", BtrConfig.default, rangeCols = Seq("repo", "path"))
        case "mapside-blocks" => BlockFiles.write(df, s"$out/$i", BtrConfig.default)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ENCODE_ONCE rep=$i mode=$mode cores=$cores sec=$sec%.2f raw=${m.rawBytes} enc=${m.encBytes} gbps=${m.rawBytes / 1e9 / sec}%.3f")
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(out),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$out/$i"), true)
    }
    spark.stop()
  }
}
