package graft.engine

import graft.codec._
import graft.format.CompressedPart
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Paths

/** Golden tiny-table tests mirroring the reference's fixed 3-row corpus
  * (ids [1,2,3], names [Julia,Peter,Jack], scores [0.123,213.1232,4.20] —
  * /root/reference/src/lib.rs:37-47) and its test patterns: exact-value
  * round-trip (:107-151), per-column typed equality (:390-421), part-wise ≡
  * whole-column decode (:311-388), CSV materialization, SQL filter
  * (`select * from btr where column_0 = 3`, :257-309).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("golden-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val mockIds = Array(1, 2, 3)
  val mockNames = Array("Julia", "Peter", "Jack")
  val mockScores = Array(0.123, 213.1232, 4.20)

  private def tmp(name: String): String = {
    val p = Paths.get("target", "tmp", s"golden_$name")
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (p.toFile.exists()) rm(p.toFile)
    "file:" + p.toAbsolutePath
  }

  test("golden: engine round-trip reproduces exact values") {
    import spark.implicits._
    val dir = tmp("rt")
    val df = mockIds.indices.map(i => (mockIds(i), mockNames(i), mockScores(i)))
      .toDF("id", "name", "score")
    BtrTable.write(df, dir)
    val back = BtrTable.load(spark, dir).orderBy("id").collect()
    assert(back.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(back.map(_.getString(1)).toSeq == Seq("Julia", "Peter", "Jack"))
    assert(back.map(_.getDouble(2)).toSeq == Seq(0.123, 213.1232, 4.20))
  }

  test("golden: SQL filter `where id = 3` returns (3, Jack, 4.20)") {
    import spark.implicits._
    val dir = tmp("sql")
    val df = mockIds.indices.map(i => (mockIds(i), mockNames(i), mockScores(i)))
      .toDF("id", "name", "score")
    BtrTable.write(df, dir)
    BtrTable.load(spark, dir).createOrReplaceTempView("btr")
    val r = spark.sql("SELECT * FROM btr WHERE id = 3").collect()
    assert(r.length == 1)
    assert(r(0).getInt(0) == 3 && r(0).getString(1) == "Jack" && r(0).getDouble(2) == 4.20)
  }

  test("golden: csv -> btr -> csv round-trip with reference null defaults") {
    import spark.implicits._
    val csvIn = tmp("csvin")
    val dir = tmp("csvbtr")
    val csvOut = tmp("csvout")
    Seq("id,name,score", "1,Julia,0.123", "2,,", "3,Jack,4.2")
      .toDF("line").coalesce(1).write.mode("overwrite").text(csvIn)
    val m = BtrCsv.fromCsv(spark, csvIn, dir,
      Seq("id" -> ColType.Integer.toInt, "name" -> ColType.String.toInt,
        "score" -> ColType.Double.toInt))
    assert(m.numRows == 3)
    val back = BtrTable.load(spark, dir).orderBy("id").collect()
    // reference defaults: missing string -> "NULL", missing double -> 0.0
    assert(back(1).getString(1) == "NULL")
    assert(back(1).getDouble(2) == 0.0)
    BtrCsv.toCsv(spark, dir, csvOut)
    val rows = spark.read.option("header", "true").csv(csvOut).orderBy("id").collect()
    assert(rows.length == 3 && rows(2).getString(1) == "Jack")
  }

  test("part-wise decode ≡ whole-column decode (multi-chunk)") {
    import spark.implicits._
    val dir = tmp("parts")
    // blockSize 64 over 1000 rows on exactly 2 partitions => 8 chunks each
    // (explicit repartition: suites share the session, so default
    // parallelism depends on suite order)
    val cfg = BtrConfig(blockSize = 64)
    val df = (0 until 1000).map(i => (i, s"name_${i % 7}", i / 3.0))
      .toDF("id", "name", "score").repartition(2)
    BtrTable.write(df, dir, cfg)
    val parts = BtrTable.parts(spark, dir).collect()
    assert(parts.map(_.chunkIdx).max >= 7, "fixture must span multiple chunks per partition")
    // per column: concat of per-part decodes == whole decoded column (multiset
    // by partition order)
    val byCol = parts.groupBy(_.colName)
    val whole = BtrTable.load(spark, dir).collect()
    byCol.foreach { case (colName, colParts) =>
      val concatLen = colParts.map(_.numRows).sum
      assert(concatLen == 1000, s"$colName parts must cover all rows")
      colParts.foreach { p =>
        val decoded = BtrDecoder.decodePartValues(p)
        val n = decoded match {
          case a: Array[Int]         => a.length
          case a: Array[Double]      => a.length
          case a: Array[Array[Byte]] => a.length
        }
        assert(n == p.numRows, s"$colName part ${p.chunkIdx}: decoded $n != ${p.numRows}")
      }
    }
    // value-level check for the int column: sorted concat == sorted whole
    val intConcat = byCol("id").flatMap(p =>
      BtrDecoder.decodePartValues(p).asInstanceOf[Array[Int]]).sorted
    assert(intConcat.toSeq == whole.map(_.getInt(0)).sorted.toSeq)
  }

  test("zone-map pruned load decodes fewer chunks, same filtered result") {
    import spark.implicits._
    val dir = tmp("prunezm")
    val cfg = BtrConfig(blockSize = 100)
    // range-partitioned by id => chunks have tight id zone maps
    val df = (0 until 2000).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    BtrTable.write(df, dir, cfg)
    val totalChunks = BtrTable.parts(spark, dir)
      .select("partitionId", "chunkIdx").distinct().count()
    val pruned = BtrTable.loadPruned(spark, dir, "id", 100, 199)
    val prunedRows = pruned.count()
    assert(prunedRows < 2000, s"pruning must skip chunks ($prunedRows rows decoded)")
    assert(prunedRows >= 100)
    val got = pruned.filter(col("id").between(100, 199)).orderBy("id")
      .as[(Int, String)].collect()
    assert(got.length == 100 && got.head == ((100, "v100")) && got.last == ((199, "v199")))
    assert(totalChunks >= 20, s"fixture sanity: $totalChunks chunks")
  }

  test("Datablock in-memory API: compress/decompress/compare/stats") {
    val rel = new Relation()
      .addColumnInt("id", Array.tabulate(640)(i => i % 10))
      .addColumnDouble("score", Array.tabulate(640)(i => (i % 100) / 4.0))
      .addColumnString("name", Array.tabulate(640)(i => s"name_${i % 5}"))
    assert(rel.tupleCount == 640)
    val chunks = rel.chunks(256)
    assert(chunks.length == 3)
    chunks.foreach { c =>
      val (buf, stats) = Datablock.compress(c)
      assert(stats.totalDataSize == buf.length)
      assert(stats.compressionRatio > 2.0, s"repetitive chunk should compress >2x, got ${stats.compressionRatio}")
      assert(stats.schemePerColumn.length == 3)
      val back = Datablock.decompress(buf)
      assert(Datablock.compareChunks(c, back), "round-trip must be bit-identical")
      assert(!Datablock.compareChunks(back, rel.chunk(0, 1)))
    }
  }

  test("Datablock seeded-random 640k values (reference random_int_double test shape)") {
    def genData(size: Int, unique: Int, runLength: Int, seed: Long): Array[Int] = {
      val rnd = new scala.util.Random(seed)
      val out = new Array[Int](size)
      var i = 0
      while (i < size) {
        val v = rnd.nextInt(unique)
        var r = 0
        while (r < runLength && i < size) { out(i) = v; i += 1; r += 1 }
      }
      out
    }
    val ints = genData(640000, 4095, 40, 69L)
    val dbls = genData(640000, 4095, 40, 42L).map(_ * 0.5)
    val rel = new Relation().addColumnInt("a", ints).addColumnDouble("b", dbls)
    rel.chunks(65536).foreach { c =>
      val (buf, stats) = Datablock.compress(c)
      val back = Datablock.decompress(buf)
      assert(Datablock.compareChunks(c, back))
      assert(stats.compressionRatio > 4.0,
        s"runlength-40 data must compress >4x, got ${stats.compressionRatio}")
    }
  }
}
