package graft.tools

import graft.data.SourceCodeGen
import org.apache.spark.sql.SparkSession

/** Materialize the deterministic bench input table (same as Bench phase 0)
  * so encode runs can be repeated without regenerating.
  */
object GenBenchInput {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 4000000L
    val out = if (args.length > 1) args(1) else "file:/root/repo/target/tmp/bench_input"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SourceCodeGen.table(s, rows).toDF()
      .selectExpr("CAST(row_id AS INT) AS row_id", "repo", "path", "commit", "lang", "content")
      .repartition(cpus * 2)
      .write.mode("overwrite").parquet(out)
    println(s"wrote $rows rows to $out")
    s.stop()
  }
}
