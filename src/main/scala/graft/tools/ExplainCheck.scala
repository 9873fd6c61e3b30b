package graft.tools

import graft.codec.BtrConfig
import graft.engine.BtrTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the load/prune/stats paths so pushdown,
  * column pruning, and WholeStageCodegen coverage can be inspected.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "file:/root/repo/target/tmp/explain_btr"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("int").as("doc_id"), col("text"), col("lang"))
    BtrTable.write(docs, dir, BtrConfig.default, rangeCols = Seq("doc_id"))

    println("===== stats plan (must NOT read `bytes` column) =====")
    BtrTable.stats(spark, dir).explain("formatted")

    println("===== pruned-load parts plan (zone-map filters pushed) =====")
    BtrTable.loadPruned(spark, dir, "doc_id", 10, 20).explain("formatted")

    println("===== column-pruned decode (only lang parts read) =====")
    BtrTable.load(spark, dir, Seq("lang")).explain("formatted")

    println("===== q1_agg plan (parquet filter/projection pushdown) =====")
    graft.Queries.all("q1_agg")(spark, "/root/testdata/sf0.001").explain("formatted")

    println("===== DSv2 source with range filter (zoneFilters in scan desc) =====")
    val bdir = "file:/root/repo/target/tmp/explain_blocks"
    graft.engine.BlockFiles.write(docs, bdir, BtrConfig.default, rangeCols = Seq("doc_id"))
    spark.read.format("btr").load(bdir)
      .where(col("doc_id").between(10, 20)).explain("formatted")

    println("===== filtered aggregate pushdown (BtrAggScan + exactFilters; headers-only for covered chunks) =====")
    spark.read.format("btr").load(bdir)
      .where(col("doc_id").between(10, 20))
      .agg(count(lit(1)).as("n"), min(col("lang")).as("mn")).explain("formatted")

    println("===== stream_sessions plan (window fn, no mapGroups) =====")
    graft.ops.StreamingOps.userSessions(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
