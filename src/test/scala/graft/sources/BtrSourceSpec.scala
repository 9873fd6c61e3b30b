package graft.sources

import graft.codec.BtrConfig
import graft.engine.BlockFiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Paths

/** Raw block-file layout + DSv2 connector: write blocks, read back via
  * spark.read.format("btr"), verify values, column pruning, and SQL over
  * the source (the reference's DataFusion TableProvider surface, S4).
  */
class BtrSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String = {
    val p = Paths.get("target", "tmp", s"src_$name")
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (p.toFile.exists()) rm(p.toFile)
    "file:" + p.toAbsolutePath
  }

  test("blocks write -> DSv2 read round-trip, multi-chunk") {
    import spark.implicits._
    val dir = tmp("rt")
    val df = (0 until 5000)
      .map(i => (i, s"name_${i % 13}", i * 0.5, s"content line $i\n" * (1 + i % 3)))
      .toDF("id", "name", "score", "content").repartition(3)
    val m = BlockFiles.write(df, dir, BtrConfig(blockSize = 512))
    assert(m.numRows == 5000)
    assert(m.encBytes < m.rawBytes)

    val back = spark.read.format("btr").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "content"))
    assert(back.count() == 5000)
    val r = back.filter(col("id") === 4321).collect()
    assert(r.length == 1)
    assert(r(0).getString(1) == s"name_${4321 % 13}")
    assert(r(0).getDouble(2) == 4321 * 0.5)
    assert(r(0).getString(3) == "content line 4321\n" * 2)
    // full equality via anti-join
    val orig = df
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("column pruning reaches the scan (readSchema pruned)") {
    import spark.implicits._
    val dir = tmp("prune")
    val df = (0 until 2000).map(i => (i, s"x$i", s"yyyyyyyyyy$i")).toDF("id", "a", "b")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256))
    val pruned = spark.read.format("btr").load(dir).select("id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("columns=id"), s"scan must prune to id only:\n$plan")
    assert(pruned.agg(sum("id")).head().getLong(0) == (0 until 2000).map(_.toLong).sum)
  }

  test("SQL over the btr source (reference `query` CLI analog)") {
    import spark.implicits._
    val dir = tmp("sql")
    val df = Seq((1, "Julia", 0.123), (2, "Peter", 213.1232), (3, "Jack", 4.20))
      .toDF("id", "name", "score")
    BlockFiles.write(df, dir)
    spark.read.format("btr").load(dir).createOrReplaceTempView("btr_v")
    val r = spark.sql("SELECT * FROM btr_v WHERE id = 3").collect()
    assert(r.length == 1 && r(0).getString(1) == "Jack" && r(0).getDouble(2) == 4.20)
  }

  test("range-partitioned blocks write") {
    import spark.implicits._
    val dir = tmp("range")
    val df = (0 until 3000).map(i => (s"repo${i % 5}", s"path/$i", i)).toDF("repo", "path", "v")
    val m = BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("repo", "path"))
    assert(m.numRows == 3000)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 3000)
    assert(back.select(sum("v")).head().getLong(0) == (0 until 3000).map(_.toLong).sum)
  }
}
