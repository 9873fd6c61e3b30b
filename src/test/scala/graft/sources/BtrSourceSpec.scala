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

  test("filter pushdown: zone maps skip whole chunks; results stay exact") {
    import spark.implicits._
    val dir = tmp("zskip")
    // range layout on id => per-chunk zone maps are tight, a selective
    // range must skip most chunks
    val df = (0 until 8192).map(i => (i, s"payload_$i", i * 1.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val q = spark.read.format("btr").load(dir).where(col("id").between(1000, 1099))
    // the filter reached the scan (visible in the plan description)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("zoneFilters=id:"), s"pushed zone filter must show in scan:\n$plan")
    val rows = q.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1000 to 1099))

    // reader-level evidence: chunks outside the range are skipped unread
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val files = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath.toString).filter(_.contains("part-")).sorted
    var skipped = 0L
    var read = 0L
    files.foreach { f =>
      val r = new BtrPartitionReader(f, conf, Array(0),
        Array(LongZonePred(0, 1000, 1099)))
      while (r.next()) read += 1
      skipped += r.chunksSkipped
      r.close()
    }
    assert(skipped > 20, s"most of the 32 chunks must be skipped, got $skipped")
    assert(read < 8192 && read >= 100, s"surviving rows bounded: $read")
  }

  test("count(*) pushdown reads frame headers only; limit pushdown stops early") {
    import spark.implicits._
    val dir = tmp("countstar")
    val df = (0 until 6000).map(i => (i, s"text payload $i" * 8)).toDF("id", "s")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 512))

    val counted = spark.read.format("btr").load(dir)
    val plan = counted.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("BtrAggScan"), s"count(*) must use the headers-only scan:\n$plan")
    assert(counted.count() == 6000)
    // a filtered count PUSHES too since round-5 (the filter is exact-claimed
    // and enforced by the agg reader three-way per chunk) — and stays exact
    val fplan = counted.where(col("id") > 10).groupBy().count()
      .queryExecution.executedPlan.toString
    assert(fplan.contains("BtrAggScan") && fplan.contains("exactFilters="),
      s"filtered count must push with its filters:\n$fplan")
    assert(counted.where(col("id") > 10).count() == 5989)
    // an unclaimable (expression) filter still falls back to row decoding
    val eplan = counted.where(col("id") % 7 === 0).groupBy().count()
      .queryExecution.executedPlan.toString
    assert(!eplan.contains("BtrAggScan"), s"expression filter must decode rows:\n$eplan")
    assert(counted.where(col("id") % 7 === 0).count() == (0 until 6000).count(_ % 7 == 0))

    val lim = spark.read.format("btr").load(dir).limit(7)
    val lplan = lim.queryExecution.executedPlan.toString
    assert(lplan.contains("limit=7"), s"pushed limit must reach the scan:\n$lplan")
    assert(lim.collect().length == 7)

    // manifest-backed statistics surface to Catalyst (drives join planning)
    val stats = spark.read.format("btr").load(dir).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(6000)), s"rowCount from manifest: $stats")
  }

  test("task-commit protocol: retried/speculative attempts leave one readable copy") {
    import graft.engine.BtrEncoder
    import org.apache.hadoop.fs.Path
    val dir = tmp("commit")
    val blocksDir = s"$dir/blocks"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(blocksDir).getFileSystem(conf)
    fs.mkdirs(new Path(blocksDir))
    // a crashed first attempt leaves a partial temp file behind
    val stale = new Path(blocksDir, ".tmp-part-00000-attempt-1")
    val os = fs.create(stale, true); os.write(Array[Byte](1, 2, 3)); os.close()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType, false)))
    val colTypes = BtrEncoder.validateSchema(schema)
    def rows = (0 until 1000).iterator.map { i =>
      org.apache.spark.sql.catalyst.InternalRow(
        i, org.apache.spark.unsafe.types.UTF8String.fromString(s"val_$i"))
    }
    // retried attempt commits; a later speculative duplicate re-runs the
    // same partition and must not corrupt the committed file
    BlockFiles.writeOneBlockFile(conf, blocksDir, 0, 2L, rows, schema, colTypes, BtrConfig(blockSize = 128))
    BlockFiles.writeOneBlockFile(conf, blocksDir, 0, 3L, rows, schema, colTypes, BtrConfig(blockSize = 128))

    val listed = fs.listStatus(new Path(blocksDir)).map(_.getPath.getName).sorted
    assert(listed.count(_.startsWith("part-")) == 1, s"exactly one committed file: ${listed.mkString(",")}")
    assert(!listed.exists(_.contains("attempt-2")) && !listed.exists(_.contains("attempt-3")),
      s"no attempt temp files left: ${listed.mkString(",")}")
    // the stale crashed-attempt file is invisible to the reader (part-* filter)
    // and the committed file reads back fully
    val m = graft.format.BtrManifest(
      columns = Seq(graft.format.ColumnMeta("id", graft.codec.ColType.Integer),
        graft.format.ColumnMeta("s", graft.codec.ColType.String)),
      numPartitions = 1, blockSize = 128, maxCascadeDepth = 3,
      numRows = 1000, rawBytes = 1, encBytes = 1, completedPartitions = Seq(0))
    graft.engine.BtrTable.writeManifest(spark, dir, m)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 1000)
    assert(back.where("id = 999").head().getString(1) == "val_999")
  }

  test("v1 block frames (no zone maps) stay readable") {
    import org.apache.hadoop.fs.Path
    val dir = tmp("v1compat")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    fs.mkdirs(new Path(s"$dir/blocks"))
    // hand-craft a v1 frame: magic + version=1, one chunk, one int column,
    // NO per-column zone fields
    val blob = graft.codec.IntCodec.encode(Array(7, 8, 9), BtrConfig.default)
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
    i32(BlockFiles.Magic); out.write(1) // version 1
    i32(3); out.write(1) // numRows=3, nCols=1
    out.write(graft.codec.ColType.Integer); i32(blob.length)
    out.write(blob)
    val os = fs.create(new Path(s"$dir/blocks/part-00000"), true)
    os.write(out.toByteArray); os.close()
    val m = graft.format.BtrManifest(
      columns = Seq(graft.format.ColumnMeta("v", graft.codec.ColType.Integer)),
      numPartitions = 1, blockSize = 65536, maxCascadeDepth = 3,
      numRows = 3, rawBytes = 12, encBytes = blob.length, completedPartitions = Seq(0))
    graft.engine.BtrTable.writeManifest(spark, dir, m)
    val back = spark.read.format("btr").load(dir)
    assert(back.collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8, 9))
  }

  test("compressed-frame range exchange: map-side encode + frame shuffle round-trips") {
    import spark.implicits._
    val dir = tmp("cxr")
    val df = (0 until 6000)
      .map(i => (s"repo${i % 7}", s"path/f$i.scala", i, i * 0.25, s"line $i\n" * (1 + i % 4)))
      .toDF("repo", "path", "v", "d", "content").repartition(5)
    val m = BlockFiles.write(df, dir, BtrConfig(blockSize = 256),
      rangeCols = Seq("repo", "path"), compressedExchange = true)
    assert(m.numRows == 6000)
    assert(m.encBytes < m.rawBytes, s"compressed ${m.encBytes} < raw ${m.rawBytes}")
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 6000)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("compressed exchange spreads frames over multiple writers (chunk-quantile bounds)") {
    import spark.implicits._
    val dir = tmp("cxr_spread")
    // 8 sorted-within-partition splits x many chunks: the single-pass bounds
    // sampler must place frames across writers, not funnel them into one
    // (the row-quantile regression sent every partition-min key to writer 0)
    val df = (0 until 8000)
      .map(i => (s"k${"%05d".format(i % 997)}", i, s"body $i"))
      .toDF("key", "v", "content").repartition(8)
    BlockFiles.write(df, dir, BtrConfig(blockSize = 128),
      rangeCols = Seq("key"), compressedExchange = true)
    val files = new java.io.File(new java.net.URI(s"$dir/blocks"))
      .listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length > 2, s"frames funneled into ${files.length} writer(s)")
    val sizes = files.map(_.length())
    assert(sizes.max < sizes.sum, "one writer holds everything")
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 8000)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("binary range partitioner: bounds binary search respects unsigned lexicographic order") {
    val b = Array(Array[Byte](10), Array[Byte](20), Array[Byte](-1, 0)) // -1 = 0xff unsigned
    val p = new BlockFiles.BinaryRangePartitioner(4, b)
    assert(p.getPartition(Array[Byte](0)) == 0)
    assert(p.getPartition(Array[Byte](10)) == 1, "boundary key goes right")
    assert(p.getPartition(Array[Byte](15)) == 1)
    assert(p.getPartition(Array[Byte](20, 5)) == 2)
    assert(p.getPartition(Array[Byte](-2)) == 2, "0xfe sorts below 0xff00 unsigned")
    assert(p.getPartition(Array[Byte](-1, 1)) == 3, "0xff01 above the last bound")
  }

  test("columnar read path: scan reports columnar batches") {
    import spark.implicits._
    val dir = tmp("columnar")
    val df = (0 until 3000).map(i => (i, s"s$i", i * 0.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 512))
    val q = spark.read.format("btr").load(dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"scan must be columnar:\n$plan")
    assert(q.agg(sum("id"), sum("d")).head().getLong(0) == (0 until 3000).map(_.toLong).sum)
    // limit pushdown still honored through the columnar reader
    assert(spark.read.format("btr").load(dir).limit(13).collect().length == 13)
  }

  test("double and string zone maps (v3 frames) skip chunks, results exact") {
    import spark.implicits._
    val dir = tmp("zskip3")
    val df = (0 until 8192).map(i => (i, f"k$i%05d", i * 1.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val qd = spark.read.format("btr").load(dir)
      .where(col("d") >= 1500.0 && col("d") < 1650.0)
    assert(qd.queryExecution.executedPlan.toString.contains("zoneFilters=d:"),
      "double range filter must reach the scan")
    assert(qd.collect().map(_.getInt(0)).sorted.toSeq == (1000 until 1100).toSeq)

    val qs = spark.read.format("btr").load(dir).where(col("s") === "k04321")
    assert(qs.queryExecution.executedPlan.toString.contains("zoneFilters=s:"),
      "string equality filter must reach the scan")
    assert(qs.collect().map(_.getInt(0)).toSeq == Seq(4321))

    // null-safe equality pushes identically (columns are non-null)
    val qn = spark.read.format("btr").load(dir).where(col("s") <=> "k04321")
    assert(qn.queryExecution.executedPlan.toString.contains("zoneFilters=s:"),
      "EqualNullSafe must reach the scan")
    assert(qn.collect().map(_.getInt(0)).toSeq == Seq(4321))

    // reader-level evidence for both predicate kinds
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val files = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath.toString).filter(_.contains("part-")).sorted
    var skippedD = 0L
    var skippedS = 0L
    files.foreach { f =>
      val rd = new BtrPartitionReader(f, conf, Array(0), Array(DoubleZonePred(2, 1500.0, 1649.5)))
      while (rd.next()) ()
      skippedD += rd.chunksSkipped
      rd.close()
      val rs = new BtrPartitionReader(f, conf, Array(0),
        Array(StringZonePred(1, StrOp.EQ, "k04321")))
      while (rs.next()) ()
      skippedS += rs.chunksSkipped
      rs.close()
    }
    assert(skippedD > 20, s"double zones must skip most of the 32 chunks: $skippedD")
    assert(skippedS > 20, s"string zones must skip most of the 32 chunks: $skippedS")
  }

  test("DSv2 write: df.write.format(btr) round-trips; rangeCols clusters via Spark's exchange") {
    import spark.implicits._
    val dir = tmp("dsv2write")
    val df = (0 until 8192).map(i => (i, s"name_${i % 13}", i * 0.5)).toDF("id", "name", "score")
      .repartition(5)
    df.write.format("btr").mode("overwrite")
      .option("rangeCols", "id").option("blockSize", "256")
      .save(dir)
    val m = graft.engine.BtrTable.readManifest(spark, dir)
    assert(m.numRows == 8192)
    assert(m.encBytes < m.rawBytes)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 8192)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)

    // RequiresDistributionAndOrdering did the clustering: id zone maps are
    // tight enough that a selective range skips most chunks
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val files = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath.toString).filter(_.contains("part-")).sorted
    var skipped = 0L
    files.foreach { f =>
      val r = new BtrPartitionReader(f, conf, Array(0), Array(LongZonePred(0, 1000, 1099)))
      while (r.next()) ()
      skipped += r.chunksSkipped
      r.close()
    }
    assert(skipped > 20, s"range-clustered write must give skippable zones: $skipped")

    // append is refused with a clear message; overwrite replaces
    val e = intercept[Exception] {
      df.limit(10).write.format("btr").mode("append").save(dir)
    }
    assert(e.getMessage != null)
    df.limit(100).write.format("btr").mode("overwrite").option("blockSize", "64").save(dir)
    assert(spark.read.format("btr").load(dir).count() == 100)
  }

  test("targetPartitionBytes writer option: needs rangeCols, write still round-trips") {
    import spark.implicits._
    val dir = tmp("advisory")
    val df = (0 until 2000).map(i => (i, s"value_$i")).toDF("id", "s")
    val e = intercept[Exception] {
      df.write.format("btr").mode("overwrite")
        .option("targetPartitionBytes", "1048576").save(dir)
    }
    assert(String.valueOf(e.getMessage).contains("rangeCols"),
      s"clear error expected: ${e.getMessage}")
    df.write.format("btr").mode("overwrite")
      .option("rangeCols", "id").option("targetPartitionBytes", "1048576")
      .save(dir)
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 2000)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("IN-set zone pushdown: chunks missing every set member are skipped") {
    import spark.implicits._
    val dir = tmp("inset")
    val df = (0 until 8192).map(i => (i, f"k$i%05d", i * 1.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val q = spark.read.format("btr").load(dir)
      .where(col("id").isin(105, 3205, 7405))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("zoneFilters=id:"), s"IN filter must reach the scan:\n$plan")
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == Seq(105, 3205, 7405))

    // string IN set through the same path
    val qs = spark.read.format("btr").load(dir).where(col("s").isin("k00105", "k07405"))
    assert(qs.collect().map(_.getInt(0)).sorted.toSeq == Seq(105, 7405))

    // reader-level evidence: only the 3 chunks containing a member decode
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val files = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath.toString).filter(_.contains("part-")).sorted
    var skipped = 0L
    var skippedS = 0L
    files.foreach { f =>
      val r = new BtrPartitionReader(f, conf, Array(0),
        Array(LongInZonePred(0, Seq(105L, 3205L, 7405L))))
      while (r.next()) ()
      skipped += r.chunksSkipped
      r.close()
      val rs = new BtrPartitionReader(f, conf, Array(0),
        Array(StringInZonePred(1, Seq("k00105", "k07405"))))
      while (rs.next()) ()
      skippedS += rs.chunksSkipped
      rs.close()
    }
    assert(skipped >= 29, s"29+ of 32 chunks must be skipped for a 3-member set: $skipped")
    assert(skippedS >= 29, s"string IN must skip too: $skippedS")

    // an infeasible set (non-integral equality over ints) skips everything
    var all = 0L
    files.foreach { f =>
      val r = new BtrPartitionReader(f, conf, Array(0), Array(LongInZonePred(0, Seq.empty)))
      while (r.next()) all += 1
      r.close()
    }
    assert(all == 0, s"empty feasible set must decode nothing: $all")
  }

  test("min/max aggregate pushdown answers from zone headers, falls back per chunk") {
    import spark.implicits._
    val dir = tmp("aggmm")
    val df = (0 until 8192).map(i => (i, f"k$i%05d", i * 1.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val q = spark.read.format("btr").load(dir)
      .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("n"),
        min("s").as("smn"), max("s").as("smx"), min("d").as("dmn"), max("d").as("dmx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BtrAggScan"), s"min/max must use the headers-only scan:\n$plan")
    val r = q.head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 8191 && r.getLong(2) == 8192)
    assert(r.getString(3) == "k00000" && r.getString(4) == "k08191")
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 8191 * 1.5)

    // zone-less chunks (long strings > 64 bytes) force the decode fallback;
    // values must still be exact
    val dir2 = tmp("aggmm_fb")
    val long = (0 until 2000).map(i => (i, f"v$i%05d" + ("x" * 100))).toDF("id", "t")
    BlockFiles.write(long, dir2, BtrConfig(blockSize = 128))
    val r2 = spark.read.format("btr").load(dir2).agg(min("t"), max("t")).head()
    assert(r2.getString(0) == "v00000" + ("x" * 100))
    assert(r2.getString(1) == "v01999" + ("x" * 100))

    // NaN chunks drop their double zones; Spark's ordering (NaN greatest)
    // must survive the fallback
    val dir3 = tmp("aggmm_nan")
    val nan = ((0 until 1000).map(i => (i, i * 0.5)) :+ ((1000, Double.NaN)))
      .toDF("id", "d")
    BlockFiles.write(nan, dir3, BtrConfig(blockSize = 128))
    val r3 = spark.read.format("btr").load(dir3).agg(min("d"), max("d")).head()
    assert(r3.getDouble(0) == 0.0)
    assert(r3.getDouble(1).isNaN, s"NaN is the Spark max: ${r3.getDouble(1)}")
  }

  test("SUM pushdown folds v6 header sums; filtered, NaN, null and pre-v6 fallbacks") {
    import spark.implicits._
    val dir = tmp("aggsum")
    // doubles are multiples of 0.5 with small magnitude: every partial sum
    // is exactly representable, so pushed and unpushed sums are bit-equal
    // regardless of association
    val df = (0 until 8192).map(i => (i, i * 0.5, s"s$i")).toDF("id", "d", "s")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val q = spark.read.format("btr").load(dir)
      .agg(sum("id").as("si"), sum("d").as("sd"), count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BtrAggScan") && plan.contains("sum(id)"),
      s"sum must use the headers-only scan:\n$plan")
    val r = q.head()
    assert(r.getLong(0) == (0 until 8192).map(_.toLong).sum)
    assert(r.getDouble(1) == (0 until 8192).map(_ * 0.5).sum)
    assert(r.getLong(2) == 8192)

    // filtered: fully-covered chunks fold from header sums, boundary chunks
    // decode — same three-way split as filtered COUNT/MIN/MAX
    val qf = spark.read.format("btr").load(dir)
      .where(col("id").between(1000, 4999)).agg(sum("id").as("si"))
    val fplan = qf.queryExecution.executedPlan.toString
    assert(fplan.contains("BtrAggScan"), s"filtered sum must push:\n$fplan")
    assert(qf.head().getLong(0) == (1000 to 4999).map(_.toLong).sum)

    // NaN chunk: its double zone (and sum) is dropped → decode fallback;
    // NaN propagates exactly like Spark's own sum
    val dirN = tmp("aggsum_nan")
    val nan = ((0 until 1000).map(i => (i, i * 0.5)) :+ ((1000, Double.NaN))).toDF("id", "d")
    BlockFiles.write(nan, dirN, BtrConfig(blockSize = 128))
    assert(spark.read.format("btr").load(dirN).agg(sum("d")).head().getDouble(0).isNaN)

    // nulls are ignored; an all-null column sums to SQL NULL
    val dirU = tmp("aggsum_null")
    val nl = (0 until 2000)
      .map(i => (i, if (i % 3 == 0) None else Some(i), Option.empty[Double]))
      .toDF("id", "v", "dn")
    BlockFiles.write(nl, dirU, BtrConfig(blockSize = 256))
    val ru = spark.read.format("btr").load(dirU).agg(sum("v"), sum("dn")).head()
    assert(ru.getLong(0) == (0 until 2000).filter(_ % 3 != 0).map(_.toLong).sum)
    assert(ru.isNullAt(1), "sum of an all-null column is NULL")

    // pre-v6 frames (sum-less kind-1 zones): the reader decodes the column
    // instead — strip the sum from a part so zonePayload emits the legacy
    // kind, then drive BtrAggReader directly against the written file
    val dirV = tmp("aggsum_legacy")
    val conf = spark.sparkContext.hadoopConfiguration
    val vals = Array.tabulate(500)(identity)
    val part = graft.engine.ChunkEncoder.encodeInt(
      0, 0, 0L, 0, "v", vals, 500, BtrConfig.default)
    assert(part.sumLong.contains(vals.map(_.toLong).sum), "encoder must carry the chunk sum")
    val legacy = BlockFiles.frameChunk(Seq(part.copy(sumLong = None)))
    BlockFiles.writeFrames(conf, s"$dirV/blocks", 0, 0L, Iterator(legacy))
    val rd = new BtrAggReader(s"$dirV/blocks/part-00000", conf,
      Seq(SumSpec(0, isDouble = false), CountSpec))
    assert(rd.next())
    assert(rd.get().getLong(0) == vals.map(_.toLong).sum)
    assert(rd.get().getLong(1) == 500)
  }

  test("chunksSkipped surfaces as a DSv2 custom metric") {
    import spark.implicits._
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = tmp("metric")
    val df = (0 until 8192).map(i => (i, s"p$i")).toDF("id", "s")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))
    val q = spark.read.format("btr").load(dir).where(col("id").between(1000, 1099))
    assert(q.collect().length == 100)
    val scan = q.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
    assert(scan.isDefined, "BatchScanExec expected in the executed plan")
    val metric = scan.get.metrics.get("chunksSkipped")
    assert(metric.isDefined, s"custom metric registered: ${scan.get.metrics.keys}")
    // file-level pruning removes most files before any reader runs; the
    // surviving file(s) still skip their out-of-range chunks, observably
    assert(metric.get.value > 0, s"metric must record the skipped chunks: ${metric.get.value}")
  }

  test("corrupt block files fail with file + chunk context, not a bare EOF") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = tmp("corrupt")
    val df = (0 until 2000).map(i => (i, s"payload_$i")).toDF("id", "s")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val orig = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    val bytes = {
      val in = fs.open(orig)
      val b = try in.readAllBytes() finally in.close()
      b
    }

    // truncated mid-frame: error names the file and the chunk
    val tPath = new Path(s"$dir/blocks_trunc")
    fs.mkdirs(tPath)
    val tf = new Path(tPath, "part-00000")
    val os = fs.create(tf, true)
    os.write(bytes, 0, bytes.length - 7)
    os.close()
    val e = intercept[java.io.IOException] {
      val r = new BtrPartitionReader(tf.toString, conf, Array(0), Array.empty)
      try while (r.next()) () finally r.close()
    }
    assert(e.getMessage.contains("part-00000") && e.getMessage.contains("chunk #"),
      s"error must name file and chunk: ${e.getMessage}")

    // bit-flipped magic: refused up front with the file named
    val mf = new Path(tPath, "part-00001")
    val os2 = fs.create(mf, true)
    val flipped = bytes.clone(); flipped(0) = (flipped(0) ^ 0x40).toByte
    os2.write(flipped)
    os2.close()
    val e2 = intercept[java.io.IOException] {
      new BtrPartitionReader(mf.toString, conf, Array(0), Array.empty)
    }
    assert(e2.getMessage.contains("part-00001") && e2.getMessage.contains("not a btr block file"),
      s"magic check must name the file: ${e2.getMessage}")

    // a SILENT bit flip deep inside the file (zone map, meta, or blob) is
    // caught by the v4 CRCs as a named checksum error, never wrong data
    val ff = new Path(tPath, "part-00002")
    val os3 = fs.create(ff, true)
    val flipped2 = bytes.clone()
    flipped2(bytes.length * 3 / 5) = (flipped2(bytes.length * 3 / 5) ^ 0x10).toByte
    os3.write(flipped2)
    os3.close()
    val e3 = intercept[java.io.IOException] {
      val r = new BtrPartitionReader(ff.toString, conf, Array(0, 1), Array.empty)
      try while (r.next()) () finally r.close()
    }
    assert(e3.getMessage.contains("part-00002") &&
      (e3.getMessage.contains("checksum mismatch") || e3.getMessage.contains("corrupt")),
      s"bit flip must surface as a named corruption: ${e3.getMessage}")
  }

  test("corruption property: any single flipped byte yields a named error or untouched data, never silent wrong rows") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = tmp("fuzz")
    val df = (0 until 1500).map(i => (i, s"value_$i", i * 0.25)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    val orig = fs.listStatus(new Path(s"$dir/blocks"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).minBy(_.getName)
    val bytes = { val in = fs.open(orig); try in.readAllBytes() finally in.close() }

    def readAllRows(file: String): Seq[(Int, String, Double)] = {
      val r = new BtrPartitionReader(file, conf, Array(0, 1, 2), Array.empty)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
      try while (r.next()) {
        val row = r.get()
        buf += ((row.getInt(0), row.getUTF8String(1).toString, row.getDouble(2)))
      } finally r.close()
      buf.toSeq
    }
    val clean = readAllRows(orig.toString)
    assert(clean.nonEmpty)

    val rnd = new scala.util.Random(91)
    val fuzzDir = new Path(s"$dir/fuzz")
    fs.mkdirs(fuzzDir)
    var named = 0
    var intact = 0
    for (trial <- 0 until 48) {
      val posn = rnd.nextInt(bytes.length)
      val mutated = bytes.clone()
      mutated(posn) = (mutated(posn) ^ (1 << rnd.nextInt(8))).toByte
      val f = new Path(fuzzDir, f"part-$trial%05d")
      val os = fs.create(f, true)
      os.write(mutated)
      os.close()
      try {
        val got = readAllRows(f.toString)
        // no error -> the flip must not have changed a single value
        // (e.g. it landed in a byte the reader never touches)
        assert(got == clean,
          s"flip at byte $posn produced silently different data (trial $trial)")
        intact += 1
      } catch {
        case e: java.io.IOException =>
          assert(e.getMessage != null && e.getMessage.contains(f"part-$trial%05d"),
            s"error must name the file (trial $trial, byte $posn): ${e.getMessage}")
          named += 1
      }
    }
    // the CRCs make detection the overwhelmingly common outcome
    assert(named > 30, s"most flips must be detected: named=$named intact=$intact")
  }

  test("v3 block frames (typed zones, no CRC) stay readable") {
    import org.apache.hadoop.fs.Path
    val dir = tmp("v3compat")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(s"$dir/blocks").getFileSystem(conf)
    fs.mkdirs(new Path(s"$dir/blocks"))
    // hand-craft a v3 frame: one chunk, one int column with a long zone,
    // NO header/blob CRCs
    val blob = graft.codec.IntCodec.encode(Array(7, 8, 9), BtrConfig.default)
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >>> 32).toInt) }
    i32(BlockFiles.Magic); out.write(3) // version 3
    i32(3); out.write(1) // numRows=3, nCols=1
    out.write(graft.codec.ColType.Integer); i32(blob.length)
    out.write(1); i64(7L); i64(9L) // zoneKind=1 long [7,9]
    out.write(blob)
    val os = fs.create(new Path(s"$dir/blocks/part-00000"), true)
    os.write(out.toByteArray); os.close()
    val m = graft.format.BtrManifest(
      columns = Seq(graft.format.ColumnMeta("v", graft.codec.ColType.Integer)),
      numPartitions = 1, blockSize = 65536, maxCascadeDepth = 3,
      numRows = 3, rawBytes = 12, encBytes = blob.length, completedPartitions = Seq(0))
    graft.engine.BtrTable.writeManifest(spark, dir, m)
    val back = spark.read.format("btr").load(dir)
    assert(back.collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8, 9))
    // the v3 zone still prunes
    assert(back.where(col("v") > 100).collect().isEmpty)
  }

  test("failed overwrite leaves the previous table intact (staged swap)") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = tmp("stagedow")
    val df = (0 until 1000).map(i => (i, s"v$i")).toDF("id", "s")
    df.write.format("btr").mode("overwrite").save(dir)

    val bad = spark.range(1000).as[Long]
      .map { i => if (i == 500L) sys.error("boom mid-write"); (i.toInt, "x") }
      .toDF("id", "s")
    intercept[Exception] {
      bad.write.format("btr").mode("overwrite").save(dir)
    }
    // old table fully readable; staging debris gone
    val back = spark.read.format("btr").load(dir)
    assert(back.count() == 1000)
    assert(back.where("id = 7").head().getString(1) == "v7")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/.staging-blocks")), "staging dir must be cleaned on abort")

    // a successful overwrite still swaps in the new data
    (0 until 50).map(i => (i, "new")).toDF("id", "s")
      .write.format("btr").mode("overwrite").save(dir)
    assert(spark.read.format("btr").load(dir).count() == 50)
    assert(!fs.exists(new Path(s"$dir/.staging-blocks")))
  }

  test("file-level zone index prunes whole block files at planning time") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = tmp("filezones")
    // range exchange on id -> each of the shuffle partitions' files covers a
    // disjoint id range; a selective filter must plan only 1-2 of them
    val df = (0 until 8192).map(i => (i, f"k$i%05d", i * 1.5)).toDF("id", "s", "d")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.format.ZoneIndex.read(conf, dir).exists(_.nonEmpty), "index written by the RDD path")

    val q = spark.read.format("btr").load(dir).where(col("id").between(1000, 1099))
    val plan = q.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"planning-time file count must show in the scan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"a selective range must prune files: ${m.get.matched}")
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == (1000 to 1099))

    // string + IN predicates prune files too
    val qs = spark.read.format("btr").load(dir).where(col("s").isin("k00105", "k00110"))
    val ms = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(qs.queryExecution.executedPlan.toString)
    assert(ms.exists(x => x.group(1).toInt < x.group(2).toInt), s"IN must prune files: $ms")
    assert(qs.collect().map(_.getInt(0)).sorted.toSeq == Seq(105, 110))

    // without the index, same results (chunk-level skip only), full file list
    val fs = new Path(dir).getFileSystem(conf)
    fs.delete(new Path(dir, graft.format.ZoneIndex.FileName), false)
    val q2 = spark.read.format("btr").load(dir).where(col("id").between(1000, 1099))
    val m2 = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(q2.queryExecution.executedPlan.toString)
    assert(m2.exists(x => x.group(1) == x.group(2)), s"no index -> no file pruning: $m2")
    assert(q2.collect().length == 100)
  }

  test("DSv2 write and compressed exchange produce the zone index; overwrite replaces it") {
    import spark.implicits._
    val dir = tmp("filezones_w")
    val conf = spark.sparkContext.hadoopConfiguration
    val df = (0 until 4096).map(i => (i, s"n$i")).toDF("id", "s")
    // pin the writer count (AQE would coalesce this tiny shuffle to one
    // partition = one file, leaving nothing to prune)
    df.write.format("btr").mode("overwrite")
      .option("rangeCols", "id").option("blockSize", "256")
      .option("numPartitions", "8").save(dir)
    val idx = graft.format.ZoneIndex.read(conf, dir)
    assert(idx.exists(_.nonEmpty), "DSv2 writer must publish the index")
    val q = spark.read.format("btr").load(dir).where(col("id") === 777)
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(777))
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(q.queryExecution.executedPlan.toString)
    assert(m.exists(x => x.group(1).toInt < x.group(2).toInt), s"point lookup plans few files: $m")

    // compressed-exchange path folds zones from the shuffled frame bytes
    val dir2 = tmp("filezones_cx")
    BlockFiles.write(df, dir2, BtrConfig(blockSize = 256),
      rangeCols = Seq("id"), compressedExchange = true)
    assert(graft.format.ZoneIndex.read(conf, dir2).exists(_.nonEmpty),
      "compressed exchange must publish the index")
    val q2 = spark.read.format("btr").load(dir2).where(col("id") === 777)
    assert(q2.collect().map(_.getInt(0)).toSeq == Seq(777))

    // overwrite with different data replaces the index (no stale pruning)
    (50000 until 51000).map(i => (i, "x")).toDF("id", "s")
      .write.format("btr").mode("overwrite").option("rangeCols", "id").save(dir)
    assert(spark.read.format("btr").load(dir).where(col("id") === 50123).count() == 1)
    assert(spark.read.format("btr").load(dir).where(col("id") === 777).count() == 0)
  }

  test("ZoneAccumulator fold over frame bytes equals the parts' own zones") {
    // the accumulator re-parses the serialized frame layout; if frameChunk's
    // byte layout ever drifts (as it did v3 -> v4), this pins the parity
    import graft.engine.ChunkEncoder
    import java.nio.charset.StandardCharsets.UTF_8
    val cfg = BtrConfig.default
    def chunk(base: Int) = Seq(
      ChunkEncoder.encodeInt(0, 0, 0L, 0, "i", Array(base, base + 5, base + 9), 3, cfg),
      ChunkEncoder.encodeDouble(0, 0, 0L, 1, "d", Array(base * 1.5, base * 2.5, base * 0.5), 3, cfg),
      ChunkEncoder.encodeString(0, 0, 0L, 2, "s",
        Array(s"a$base".getBytes(UTF_8), s"z$base".getBytes(UTF_8), "m".getBytes(UTF_8)), 3, cfg))
    val acc = new graft.format.ZoneAccumulator
    acc.fold(BlockFiles.frameChunk(chunk(100)).bytes)
    acc.fold(BlockFiles.frameChunk(chunk(40)).bytes)
    val zs = acc.result().get
    assert(zs(0).kind == 1 && zs(0).lmin == 40 && zs(0).lmax == 109, s"int fold: ${zs(0)}")
    assert(zs(1).kind == 2)
    assert(java.lang.Double.longBitsToDouble(zs(1).lmin) == 20.0, "double min 40*0.5")
    assert(java.lang.Double.longBitsToDouble(zs(1).lmax) == 250.0, "double max 100*2.5")
    assert(zs(2).kind == 3)
    assert(new String(zs(2).smin, UTF_8) == "a100" && new String(zs(2).smax, UTF_8) == "z40",
      s"string fold: [${new String(zs(2).smin, UTF_8)}, ${new String(zs(2).smax, UTF_8)}]")
    // a zone-less chunk (long strings) kills only that column
    val longs = Array(("x" * 100).getBytes(UTF_8), ("y" * 100).getBytes(UTF_8))
    val acc2 = new graft.format.ZoneAccumulator
    acc2.fold(BlockFiles.frameChunk(Seq(
      ChunkEncoder.encodeInt(0, 0, 0L, 0, "i", Array(1, 2), 2, cfg),
      ChunkEncoder.encodeString(0, 0, 0L, 1, "t", longs, 2, cfg))).bytes)
    val zs2 = acc2.result().get
    assert(zs2(0).kind == 1 && zs2(1).kind == 0)
  }

  test("zone index binary round-trip") {
    import graft.format._
    val entries = Seq(
      FileZone("part-00000", IndexedSeq(
        ColZone(1, -5L, 4096L),
        ColZone(3, smin = "abc".getBytes("UTF-8"), smax = "zzé".getBytes("UTF-8")),
        ColZone(2, java.lang.Double.doubleToLongBits(-1.5), java.lang.Double.doubleToLongBits(99.25)),
        ColZone(0))),
      FileZone("part-00031", IndexedSeq(ColZone(1, 0L, 7L))))
    val back = ZoneIndex.fromBytes(ZoneIndex.toBytes(entries))
    assert(back.length == 2)
    assert(back(0).file == "part-00000" && back(1).file == "part-00031")
    assert(back(0).cols(0) == entries(0).cols(0).copy())
    assert(new String(back(0).cols(1).smax, "UTF-8") == "zzé")
    assert(back(0).cols(2).lmax == java.lang.Double.doubleToLongBits(99.25))
    assert(back(0).cols(3).kind == 0)
  }

  test("runtime join filtering (DPP analog): broadcast build keys prune files and chunks") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val dir = tmp("runtimef")
    val df = (0 until 8192).map(i => (i, f"k$i%05d")).toDF("id", "s")
    BlockFiles.write(df, dir, BtrConfig(blockSize = 256), rangeCols = Seq("id"))

    val fact = spark.read.format("btr").load(dir)
    // classic DPP shape: the build side is a real source with a selective
    // filter (a LocalRelation would fold the filter away and Spark skips
    // runtime pruning without a selective build-side predicate)
    val dimDir = tmp("runtimef_dim")
    (0 until 100)
      .map(i => (i * 37, if (i == 3 || i == 87) "keep" else s"other$i"))
      .toDF("k", "tag").write.mode("overwrite").parquet(dimDir)
    val dimF = spark.read.parquet(dimDir).where(col("tag") === "keep") // keys 111, 3219
    val q = fact.join(broadcast(dimF), fact("id") === dimF("k"))
    val rows = q.collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(111, 3219))

    def allScans(p: SparkPlan): Seq[BatchScanExec] = {
      val here = p match { case b: BatchScanExec => Seq(b); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      here ++ kids.flatMap(allScans)
    }
    val scans = allScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"btr scan expected:\n${q.queryExecution.executedPlan}")
    val scan = scans.head
    assert(scan.runtimeFilters.nonEmpty,
      s"Spark must inject the runtime filter for the broadcast join:\n${q.queryExecution.executedPlan}")
    // the build keys became zone predicates: only the 2 matching chunks
    // decode, everything else is skipped (or whole files pruned first)
    val out = scan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    assert(out >= 2 && out <= 1024, s"runtime pruning must bound decoded rows: $out of 8192")
    assert(scan.metrics.get("chunksSkipped").exists(_.value >= 0))
  }

  test("runtime predicate translation: IN/= over each column type") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("i", IntegerType, false),
      StructField("d", DoubleType, false),
      StructField("s", StringType, false)))
    // build IN predicates through the public literal factory
    val litI = Expressions.literal(7)
    val litI2 = Expressions.literal(9)
    val pIn = new Predicate("IN", Array(Expressions.column("i"), litI, litI2))
    val z = RuntimePredTranslator.toZone(schema, pIn)
    assert(z.contains(LongInZonePred(0, Seq(7L, 9L))), s"got $z")
    assert(z.get.asInstanceOf[LongInZonePred].skip(10, 20), "7,9 miss [10,20]")
    assert(!z.get.asInstanceOf[LongInZonePred].skip(5, 8), "7 hits [5,8]")

    val pEq = new Predicate("=", Array(Expressions.column("s"), Expressions.literal("abc")))
    val zs = RuntimePredTranslator.toZone(schema, pEq)
    assert(zs.contains(StringInZonePred(2, Seq("abc"))), s"got $zs")

    val pD = new Predicate("IN", Array(Expressions.column("d"), Expressions.literal(1.5)))
    val zd = RuntimePredTranslator.toZone(schema, pD)
    assert(zd.contains(DoubleInZonePred(1, Seq(1.5))), s"got $zd")

    // untranslatable shapes are ignored, not errors
    assert(RuntimePredTranslator.toZone(schema,
      new Predicate(">", Array(Expressions.column("i"), litI))).isEmpty)
    assert(RuntimePredTranslator.toZone(schema,
      new Predicate("IN", Array(Expressions.column("nope"), litI))).isEmpty)

    // a runtime string key with INVALID UTF-8 bytes cannot round-trip
    // through String — the whole predicate must be dropped (pruning with a
    // lossily-transcoded comparand would wrongly skip the matching chunk)
    val badUtf8 = org.apache.spark.unsafe.types.UTF8String.fromBytes(Array(0xC3.toByte))
    val goodUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString("ok")
    assert(RuntimePredTranslator.toZone(schema,
      new Predicate("IN", Array(Expressions.column("s"),
        Expressions.literal(badUtf8), Expressions.literal(goodUtf8)))).isEmpty,
      "invalid-UTF-8 member must drop the whole predicate")
    assert(RuntimePredTranslator.toZone(schema,
      new Predicate("=", Array(Expressions.column("s"), Expressions.literal(goodUtf8))))
      .contains(StringInZonePred(2, Seq("ok"))))

    // oversized-set hull predicate is sound
    val hull = StringHullZonePred(0, "b", "d")
    assert(hull.skip("e".getBytes("UTF-8"), "f".getBytes("UTF-8")), "zone above hull")
    assert(hull.skip("0".getBytes("UTF-8"), "a".getBytes("UTF-8")), "zone below hull")
    assert(!hull.skip("c".getBytes("UTF-8"), "z".getBytes("UTF-8")), "overlap keeps")
  }

  test("min/max pushdown matches Spark's own result bit-for-bit on signed zeros") {
    import spark.implicits._
    // NOTE: Spark normalizes -0.0 to 0.0 at UnsafeRow materialization, so
    // a -0.0 literal never reaches the table through a Spark pipeline; the
    // contract to pin is BIT parity between the zone-answered aggregate and
    // Spark's own aggregation over the identical data. (The encoder still
    // computes total-order extrema so a codec-level -0.0 — reachable via
    // the kernel API — folds exactly.)
    val dir = tmp("signedzero")
    val df = Seq((1, 0.0), (2, -0.0), (3, 1.5), (4, -2.25)).toDF("id", "d")
    BlockFiles.write(df, dir, BtrConfig.default)
    val ours = spark.read.format("btr").load(dir).agg(min("d"), max("d")).head()
    val ref = df.agg(min("d"), max("d")).head()
    assert(java.lang.Double.doubleToRawLongBits(ours.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(ref.getDouble(0)),
      s"min parity: ours=${ours.getDouble(0)} spark=${ref.getDouble(0)}")
    assert(java.lang.Double.doubleToRawLongBits(ours.getDouble(1)) ==
      java.lang.Double.doubleToRawLongBits(ref.getDouble(1)))
    // codec-level: total-order extrema on a chunk that really holds -0.0
    val part = graft.engine.ChunkEncoder.encodeDouble(0, 0, 0L, 0, "d",
      Array(0.0, -0.0, 3.5), 3, BtrConfig.default)
    assert(part.minDouble.exists(m => java.lang.Double.doubleToRawLongBits(m) ==
      java.lang.Double.doubleToRawLongBits(-0.0)), s"zone min: ${part.minDouble}")
    assert(part.maxDouble.contains(3.5))
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
