package graft

import graft.codec._
import graft.engine.BtrTable
import graft.ops.{DedupOps, MultimodalOps, SimilarityOps, StreamingOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.charset.StandardCharsets.UTF_8

/** Driver-checked query surface: one entry per operator (SURVEY §2), each
  * SQL-expressible one paired with a DuckDB oracle in `oracles`.
  *
  * The rt_* queries are the correctness core: they push real data through
  * encode→decode inside mapPartitions and emit the decoded values — the
  * oracle is the identity SELECT, so any codec bit-flip fails the driver's
  * hash compare (the reference's round-trip tests, driver-checked).
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scratch dir for queries that materialize a btr directory mid-query.
    * Configurable (`spark.graft.scratchDir` / SPARK_GRAFT_SCRATCH) because
    * on a real cluster it must be a shared filesystem, not a driver-local
    * path; defaults to ./target/tmp for the local harness.
    */
  private def scratch(s: SparkSession, name: String): String = {
    val base = s.conf.getOption("spark.graft.scratchDir")
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH"))
      .getOrElse("file:" + java.nio.file.Paths.get("target", "tmp").toAbsolutePath)
    s"$base/$name"
  }

  /** Encode-once cache: queries that materialize a btr dir reuse it across
    * runs (one driver round re-runs every query for bench + verify — five
    * full re-encodes of the same projection were pure harness overhead).
    * The manifest is written LAST, so its presence proves a complete write;
    * its row count is checked against the input to catch a stale scratch
    * dir from a different sf, and a build-fingerprint stamp invalidates
    * tables written by a DIFFERENT binary — otherwise a code change to the
    * encode/write paths would leave the correctness gates silently re-using
    * old bytes instead of exercising the new writer (round-3 advice).
    */
  /** Scratch dirs validated (or built) once per JVM: six queries share
    * q_prune_src alone, and each paid the manifest read + input count job
    * again within one bench/verify session. Memoizes only the freshness
    * VERDICT — every query still reads and decodes the bytes; the on-disk
    * stamp/manifest check still guards cross-process reuse.
    */
  private val validatedScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def cachedBtr(s: SparkSession, name: String, input: DataFrame)(
      build: String => Unit): String = {
    val out = scratch(s, name)
    if (validatedScratch.contains(out)) return out
    val fp = graft.engine.BuildFingerprint.value
    val stampPath = new org.apache.hadoop.fs.Path(s"$out/_build_fingerprint")
    val fs = stampPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fresh =
      try {
        BtrTable.readManifest(s, out).numRows == input.count() && {
          val in = fs.open(stampPath)
          val stamp = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          stamp == fp
        }
      } catch { case _: Exception => false }
    if (!fresh) {
      build(out)
      val o = fs.create(stampPath, true)
      try o.write(fp.getBytes("UTF-8")) finally o.close()
    }
    validatedScratch.add(out)
    out
  }

  // ------------------------------------------------------------ round-trips

  private def rtInt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.grouped(65536).flatMap { chunk =>
          val vals = new Array[Int](chunk.size)
          var i = 0
          chunk.foreach { kv => vals(i) = kv._2; i += 1 }
          val dec = IntCodec.decode(IntCodec.encode(vals))
          chunk.iterator.zipWithIndex.map { case ((k, _), j) => (k, dec(j)) }
        }
      }
      .toDF("l_orderkey", "l_linenumber")
  }

  private def rtDouble(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
      .as[(Long, Double)]
      .mapPartitions { it =>
        it.grouped(65536).flatMap { chunk =>
          val vals = new Array[Double](chunk.size)
          var i = 0
          chunk.foreach { kv => vals(i) = kv._2; i += 1 }
          val dec = DoubleCodec.decode(DoubleCodec.encode(vals))
          chunk.iterator.zipWithIndex.map { case ((k, _), j) => (k, dec(j)) }
        }
      }
      .toDF("l_orderkey", "l_extendedprice")
  }

  private def rtStrings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id".cast("int"), $"lang", $"source")
      .as[(Int, String, String)]
      .mapPartitions { it =>
        it.grouped(65536).flatMap { chunk =>
          val langs = chunk.map(_._2.getBytes(UTF_8)).toArray
          val srcs = chunk.map(_._3.getBytes(UTF_8)).toArray
          val dl = StringCodec.decode(StringCodec.encode(langs))
          val ds = StringCodec.decode(StringCodec.encode(srcs))
          chunk.iterator.zipWithIndex.map { case ((k, _, _), j) =>
            (k, new String(dl(j), UTF_8), new String(ds(j), UTF_8))
          }
        }
      }
      .toDF("doc_id", "lang", "source")
  }

  private def rtText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id".cast("int"), $"text")
      .as[(Int, String)]
      .mapPartitions { it =>
        it.grouped(65536).flatMap { chunk =>
          val texts = chunk.map(_._2.getBytes(UTF_8)).toArray
          val dec = StringCodec.decode(StringCodec.encode(texts))
          chunk.iterator.zipWithIndex.map { case ((k, _), j) => (k, new String(dec(j), UTF_8)) }
        }
      }
      .toDF("doc_id", "text")
  }

  /** Full engine path: encode documents into a btr dir (parts parquet +
    * manifest), decode via the groupByKey chunk reassembly, return the
    * decoded table. Oracle = identity SELECT.
    */
  private def rtEngine(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"),
      col("text"), col("lang"), col("source"),
      col("n_chars").cast("int").as("n_chars"))
    val out = cachedBtr(s, s"rt_engine_${math.abs(dir.hashCode)}", docs)(
      BtrTable.write(docs, _, BtrConfig.default, rangeCols = Seq("source", "doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    BtrTable.load(s, out)
  }

  /** Codec-choice/ratio health over the encoded documents table (north
    * rule: metrics persisted per column). Emitted as per-column BOOLEANS
    * with conservative floors so the oracle is a closed-form VALUES table;
    * the raw ratios/schemes stay available via BtrTable.stats (asserted in
    * EngineSpec against FIXTURES.md targets).
    */
  private def encStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"),
      col("text"), col("lang"), col("source"),
      col("n_chars").cast("int").as("n_chars"))
    val out = cachedBtr(s, s"enc_stats_${math.abs(dir.hashCode)}", docs)(
      BtrTable.write(docs, _, BtrConfig.default))
    val floors = Map(
      "doc_id" -> 1.5, "n_chars" -> 1.5, // FOR+bitpack over narrow ranges
      "lang" -> 2.5, "source" -> 2.5,    // low-cardinality dict
      "text" -> 2.0)                     // FSST over prose
    val floorCol = floors.foldLeft(lit(Double.MaxValue)) { case (acc, (name, f)) =>
      when(col("colName") === name, lit(f)).otherwise(acc)
    }
    BtrTable.stats(s, out).select(
      col("colName").as("col_name"),
      (col("ratio") >= floorCol).as("ratio_ok"),
      (col("enc_bytes") < col("raw_bytes")).as("compressed"))
  }

  // ------------------------------------------- Catalyst expression surface

  /** Column-API expressions: chunk ints into arrays, encode→decode→explode.
    * Oracle = identity SELECT, so the expression layer is driver-verified.
    */
  private def rtExprInt(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.BtrFunctions._
    // chunk by orderkey RANGE (~1000 keys per encode chunk), not per-key:
    // per-key grouping made 1.5M four-element arrays — 250x more groups
    // than needed just to exercise the expression. Two collect_lists in one
    // aggregate consume the group's rows in one stream, so ks/xs align.
    t(s, dir, "lineitem")
      .groupBy(floor(col("l_orderkey") / 1000).as("g"))
      .agg(
        collect_list(col("l_orderkey")).as("ks"),
        collect_list(col("l_linenumber")).as("xs"))
      .select(col("ks"), btr_decode_int(btr_encode_int(col("xs"))).as("vs"))
      .select(explode(arrays_zip(col("ks"), col("vs"))).as("z"))
      .select(col("z.ks").as("l_orderkey"), col("z.vs").as("l_linenumber"))
  }

  /** Same through the SQL registration path (reference's `query` CLI analog,
    * /root/reference/src/bin/btr.rs:137-152, with btr functions in scope).
    */
  private def rtExprSql(s: SparkSession, dir: String): DataFrame = {
    graft.expr.BtrFunctions.register(s)
    t(s, dir, "documents").createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT source, explode(btr_decode_string(texts)) AS text FROM
        |  (SELECT source, btr_encode_string(collect_list(text)) AS texts
        |   FROM documents_v GROUP BY source)""".stripMargin)
  }

  // -------------------------------------------------- relational (Catalyst)
  // The reference's SQL surface is DataFusion over the decoded scan
  // (/root/reference/src/datafusion.rs:42-74, query CLI src/bin/btr.rs:137-152);
  // Spark SQL/Catalyst inherits the whole relational algebra. These queries
  // pin that surface against DuckDB.

  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val d182 = DecimalType(18, 2)
    t(s, dir, "lineitem")
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // sums run over DECIMAL (exact, order-independent) then surface as
        // DOUBLE so Spark and DuckDB render identically
        sum(col("l_quantity").cast(d182)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(d182)).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private def qFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") % 100 === 3)
      .select(col("doc_id").cast("int").as("doc_id"), col("lang"), col("n_chars").cast("int").as("n_chars"))

  private def qJoin(s: SparkSession, dir: String): DataFrame = {
    val d182 = DecimalType(18, 2)
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(d182)).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  private def qTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  private def qWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  private def qSetop(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(sup).withColumn("op", lit("intersect"))
      .unionAll(c.except(sup).withColumn("op", lit("except")))
  }

  /** Raw block-file format + DSv2 source: encode documents into blocks,
    * read back via spark.read.format("btr") with column pruning. Oracle =
    * identity SELECT of the pruned columns.
    */
  private def rtSource(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("text"), col("lang"))
    val out = cachedBtr(s, s"rt_source_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out).select("doc_id", "lang")
  }

  /** Zone-map pruned scan + row filter: only chunks whose doc_id min/max
    * intersects [100, 199] are decoded (the data-skipping extension; the
    * reference scan decodes everything). Oracle = plain WHERE.
    */
  private def qPrune(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_${math.abs(dir.hashCode)}", docs)(
      BtrTable.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    BtrTable.loadPruned(s, out, "doc_id", 100, 199)
      .filter(col("doc_id").between(100, 199))
  }

  /** CSV ingest surface end-to-end (the reference's from-csv CLI,
    * /root/reference/src/btrblocks.rs:382-539): documents → CSV files →
    * BtrCsv.fromCsv (schema-typed parse + reference null defaults) →
    * encode → decode. Oracle = identity SELECT. Columns without embedded
    * newlines (the multiline-text CSV case is covered by GoldenSpec).
    */
  private def rtCsv(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"),
      col("n_chars").cast("int").as("n_chars"))
    val base = cachedBtr(s, s"rt_csv_${math.abs(dir.hashCode)}/btr", docs) { btrDir =>
      val csvDir = btrDir.stripSuffix("/btr") + "/csv"
      docs.write.mode("overwrite").option("header", "true").csv(csvDir)
      graft.engine.BtrCsv.fromCsv(s, csvDir, btrDir,
        Seq("doc_id" -> ColType.Integer, "lang" -> ColType.String,
          "source" -> ColType.String, "n_chars" -> ColType.Integer))
    }
    BtrTable.load(s, base)
  }

  /** Filter pushdown INTO the DSv2 source: the range predicate reaches
    * BtrScan (SupportsPushDownFilters), whose reader skips whole chunks by
    * the frame's per-column zone maps without reading their blobs — the
    * reference scan pushes down nothing (/root/reference/src/datafusion.rs:64-73).
    * Oracle = plain WHERE.
    */
  private def qPruneSource(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out).where(col("doc_id").between(100, 199))
  }

  /** DSv2 WRITE path end-to-end: df.write.format("btr") with declarative
    * range clustering (RequiresDistributionAndOrdering — Spark plans the
    * exchange), manifest committed by the driver, read back through the
    * same source. Oracle = identity SELECT.
    */
  private def rtWriteSource(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("n_chars").cast("int").as("n_chars"))
    val out = cachedBtr(s, s"rt_write_src_${math.abs(dir.hashCode)}", docs)(o =>
      docs.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    s.read.format("btr").load(out)
  }

  /** The mount-view surface (reference S7/S8 semantics): encode documents,
    * then read the table back BYTE-WISE through BtrCsvView.read(offset,
    * size) windows (bounded cache, spanning reads) and parse the rendering
    * — any drift in the random-access path breaks the identity oracle.
    */
  private def rtCsvView(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"))
    val out = cachedBtr(s, s"rt_csv_view_${math.abs(dir.hashCode)}", docs)(
      BtrTable.write(docs, _, BtrConfig.default))
    val view = new graft.engine.BtrCsvView(s, out, cacheLimit = 1 << 16)
    // windowed reads (driver-side, bounded): stitch the rendering back
    // from fixed-size chunks rather than one readAll. Accumulate BYTES and
    // decode once — a chunk boundary can split a multi-byte UTF-8 sequence
    val bytes = new java.io.ByteArrayOutputStream()
    var off = 0L
    var chunk = view.read(off, 8192)
    while (chunk.nonEmpty) {
      bytes.write(chunk)
      off += chunk.length
      chunk = view.read(off, 8192)
    }
    val lines = new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toIndexedSeq
    require(lines.head == "doc_id,lang", s"unexpected header ${lines.head}")
    lines.drop(1).filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf(',')
        (l.take(i).toInt, l.drop(i + 1))
      }
      .toDF("doc_id", "lang")
  }

  /** Typed zone-map pushdown INTO the DSv2 source beyond ints: a string
    * equality and a double range reach the scan and skip chunks via the v3
    * frame zones (the reference pushes nothing). Oracle = plain WHERE.
    */
  private def qPruneTyped(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("source"),
      col("n_chars").cast("double").as("n_chars_d"))
    val out = cachedBtr(s, s"q_prune_typed_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("source", "doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where(col("source") === "src3" && col("n_chars_d") >= 200.0)
  }

  /** IN-set pushdown INTO the DSv2 source: `doc_id IN (...)` skips every
    * chunk whose zone misses all set members (round-3 verdict #4 — binary
    * comparisons and EqualTo pushed before; IN decoded everything). Reuses
    * q_prune_source's cached table. Oracle = plain WHERE IN.
    */
  private def qPruneIn(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where(col("doc_id").isin(7, 105, 211, 340, 444))
  }

  /** MIN/MAX/COUNT aggregate pushdown: answered from frame headers + zone
    * maps without decoding blobs (BtrAggScan; per-chunk decode fallback only
    * where a zone is absent). Oracle = the same aggregates over the raw
    * parquet. Aliased identically on both sides for the hash compare.
    */
  private def qAggPush(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out).agg(
      min(col("doc_id")).as("min_doc"),
      max(col("doc_id")).as("max_doc"),
      min(col("lang")).as("min_lang"),
      max(col("lang")).as("max_lang"),
      count(lit(1)).as("n_rows"))
  }

  /** FILTERED aggregate pushdown (round-5): the WHERE is exact-claimed by
    * the source, so Spark pushes COUNT/MIN/MAX below it — the reader folds
    * fully-covered chunks from frame headers + zones alone and decodes only
    * the two boundary chunks (`SELECT count(*) WHERE id BETWEEN …` is the
    * most common operational query at 100 TB). Oracle = the same filtered
    * aggregates over the raw parquet.
    */
  private def qAggFiltered(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where(col("doc_id").between(100, 399))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        min(col("lang")).as("min_lang"),
        max(col("lang")).as("max_lang"))
  }

  /** Compound pushdown (round-5): a same-column OR of disjoint doc_id
    * ranges plus a NOT-rewritten disequality on lang. Both shapes are
    * CLAIMED by the scan (no post-scan Filter): the OR composes two zone
    * ranges — a doc_id-clustered chunk is read only when it intersects
    * EITHER range — and `NOT lang = 'de'` rewrites exactly to
    * `lang < 'de' OR lang > 'de'`. `WHERE ts < old OR ts > recent` /
    * `WHERE lang != 'en'` are everyday 100 TB operational filters that
    * previously read everything. Oracle = the same predicate in DuckDB.
    */
  private def qPruneOr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where((col("doc_id") < 50 || col("doc_id") >= 450) && !(col("lang") === "de"))
  }

  /** Prefix pushdown (round-5): `source LIKE 'src3%'` reaches the scan as
    * StringStartsWith — rows with the prefix lie in [p, succ(p)) under
    * byte order, so source-clustered chunks outside that range skip
    * unread; the claimed predicate also lets the COUNT/MIN/MAX push below
    * the WHERE. The natural shape for `path LIKE 'org/repo/%'` at 100 TB.
    * Oracle = the same LIKE-filtered aggregates in DuckDB.
    */
  private def qPrunePrefix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("source"),
      col("n_chars").cast("double").as("n_chars_d"))
    val out = cachedBtr(s, s"q_prune_typed_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("source", "doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where(col("source").startsWith("src3"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** GROUP BY aggregate pushdown (round-5): the whole
    * `GROUP BY source → count/min/max/sum` folds inside the scan — the
    * grouped reader emits per-group partials and, on this source-clustered
    * table, answers group-constant chunks from frame headers alone (zero
    * blob decode); Spark's final HashAggregate merges partials across
    * files. `SELECT day, count(*), sum(bytes) GROUP BY day` on a
    * day-partitioned 100 TB table is THE operational rollup — header-fold
    * makes it metadata-speed. n_chars_d holds integral values, so its
    * double sum is exact and association-independent. Oracle = the same
    * grouped aggregates in DuckDB.
    */
  private def qAggGroup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("source"),
      col("n_chars").cast("double").as("n_chars_d"))
    val out = cachedBtr(s, s"q_prune_typed_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("source", "doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("n_chars_d")).as("sum_chars"))
  }

  /** DISTINCT pushdown (round-5): `SELECT DISTINCT source` reaches the
    * scan as an empty-aggregate grouping — the grouped reader emits each
    * group once per flush and, on this source-clustered table, answers
    * group-constant chunks from their zone headers WITHOUT decoding a
    * blob. "What partitions/languages/sources exist" over 100 TB becomes
    * a metadata read. Oracle = the same DISTINCT in DuckDB.
    */
  private def qDistinctPush(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("source"),
      col("n_chars").cast("double").as("n_chars_d"))
    val out = cachedBtr(s, s"q_prune_typed_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("source", "doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out).select("source").distinct()
  }

  /** Pushed TopN (round-5, `SupportsPushDownTopN`): `ORDER BY doc_id DESC
    * LIMIT 15` under a claimed filter reaches the scan — each partition
    * keeps a bounded best-n heap and, once full, uses the sort key's chunk
    * zones as a MOVING threshold, skipping whole chunks that cannot beat
    * the kept set (on this doc_id-clustered table a top-k probe reads a
    * handful of chunks, the 100 TB "latest records" shape). Spark's
    * TakeOrderedAndProject merges partitions. doc_id is unique, so the
    * selected row set is deterministic. Oracle = the same ORDER BY/LIMIT.
    */
  private def qTopnPush(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    s.read.format("btr").load(out)
      .where(col("lang") =!= "de")
      .orderBy(col("doc_id").desc)
      .limit(15)
  }

  /** Runtime join filtering through the DSv2 source: the btr fact table is
    * broadcast-joined to a selectively filtered parquet dim — the DPP shape
    * where Spark hands the build keys to the scan (SupportsRuntimeV2
    * Filtering) and files/chunks that cannot match are never read. Oracle =
    * the same join in DuckDB.
    */
  private def qJoinRuntime(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"), col("source"))
    val out = cachedBtr(s, s"q_prune_src_${math.abs(dir.hashCode)}", docs)(
      graft.engine.BlockFiles.write(docs, _, BtrConfig.default, rangeCols = Seq("doc_id"),
        numPartitions = scratchPartitions(s, docs)))
    val fact = s.read.format("btr").load(out)
    val dim = t(s, dir, "documents")
      .select(col("doc_id").cast("int").as("k"), col("source").as("dim_source"))
      .where(col("dim_source") === "src3" && col("k") < 50)
    fact.join(broadcast(dim), fact("doc_id") === dim("k"))
      .select(col("doc_id"), col("lang"), col("dim_source"))
  }

  /** Null-extension round trip (round-5; the reference model is non-null,
    * SURVEY §1.2 — this engine extends it): NULLs injected into all three
    * types, written through the DSv2 path (v5 frames carry per-chunk
    * validity bitmaps; zones cover non-nulls), read back via the source.
    * Oracle = the same CASE projection in DuckDB (identity round trip,
    * null positions included in the hash compare).
    */
  private def rtNulls(s: SparkSession, dir: String): DataFrame = {
    val docs = nullDocs(s, dir)
    val out = cachedBtr(s, s"rt_nulls_${math.abs(dir.hashCode)}", docs)(o =>
      docs.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    s.read.format("btr").load(out)
  }

  /** Byte target for the DSv2 writes' range exchange (AQE advisory,
    * BtrWrite.advisoryPartitionSizeInBytes): writer count follows input
    * size — one ~128 MB writer per block file — instead of inheriting
    * spark.sql.shuffle.partitions, which turned every small scratch table
    * into 32 near-empty block files that every downstream scan then paid
    * per-file costs for. Overridable for clusters via
    * spark.graft.writePartitionBytes.
    */
  private def writePartitionBytes(s: SparkSession): String =
    s.conf.getOption("spark.graft.writePartitionBytes").getOrElse((128L << 20).toString)

  /** Scale-adaptive writer count for the scratch btr tables (guide §6,
    * "aim for output files in the 128 MB - 1 GB range"): one range-exchange
    * partition per `writePartitionBytes` of estimated input, clamped to the
    * session's shuffle width. The former default — shuffle partitions, 32
    * here — turned every sub-MB scratch table into 32 near-empty block
    * files, and every later scan of it into 32+ tasks of pure per-file
    * fixed cost; a 100 TB input still fans out to the full width.
    */
  private def scratchPartitions(s: SparkSession, input: DataFrame): Int = {
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = BigInt(writePartitionBytes(s).toLong)
    val n = ((bytes + target - 1) / target).toInt
    math.max(1, math.min(n, s.sessionState.conf.numShufflePartitions))
  }

  private def nullDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").selectExpr(
      "CAST(doc_id AS INT) AS doc_id",
      "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(n_chars AS INT) END AS n_chars_n",
      "CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(n_chars AS DOUBLE) * 0.5 END AS score_n",
      "CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang_n")

  /** COUNT(col) pushdown (round-5): non-null counts fold from the v5
    * headers' exact per-column null counts — `SELECT count(x)` decodes
    * NOTHING, and under a claimed WHERE only boundary chunks consult the
    * (header-resident) validity bitmap. `count(col)/count(*)` is the
    * canonical completeness probe over a 100 TB ingest. Oracle = the same
    * aggregates in DuckDB.
    */
  private def qAggCount(s: SparkSession, dir: String): DataFrame = {
    val docs = nullDocs(s, dir)
    val out = cachedBtr(s, s"rt_nulls_${math.abs(dir.hashCode)}", docs)(o =>
      docs.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    s.read.format("btr").load(out)
      .where(col("doc_id") < 400)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("n_chars_n")).as("n_chars_nn"),
        count(col("score_n")).as("n_score_nn"),
        count(col("lang_n")).as("n_lang_nn"))
  }

  /** SUM(col) pushdown (round-5, v6 frames): numeric zones carry each
    * chunk's exact NON-NULL sum, so a filtered SUM folds fully-covered
    * chunks from headers alone and decodes only boundary chunks — the
    * byte-volume/records-ingested probe (`SELECT sum(bytes) WHERE day=…`)
    * that runs constantly against a 100 TB ingest. Int sums are exact in
    * i64; the double column is an exact multiple of 0.5, so its sum is
    * association-independent and DuckDB-hash-comparable. Oracle = the same
    * aggregates in DuckDB.
    */
  private def qAggSum(s: SparkSession, dir: String): DataFrame = {
    val docs = nullDocs(s, dir)
    val out = cachedBtr(s, s"rt_nulls_${math.abs(dir.hashCode)}", docs)(o =>
      docs.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    s.read.format("btr").load(out)
      .where(col("doc_id") < 400)
      .agg(
        sum(col("doc_id")).as("sum_doc"),
        sum(col("n_chars_n")).as("sum_chars"),
        sum(col("score_n")).as("sum_score"),
        count(lit(1)).as("n_rows"))
  }

  /** IS NULL pushdown through the DSv2 source: the predicate reaches the
    * scan as a null-statistics zone predicate — null-free FILES drop at
    * planning (v2 zone index carries per-file null totals) and null-free
    * CHUNKS are skipped by their exact frame null counts. Oracle = plain
    * WHERE ... IS NULL.
    */
  private def qPruneNull(s: SparkSession, dir: String): DataFrame = {
    val docs = nullDocs(s, dir)
    val out = cachedBtr(s, s"rt_nulls_${math.abs(dir.hashCode)}", docs)(o =>
      docs.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    s.read.format("btr").load(out)
      .where(col("n_chars_n").isNull && col("doc_id") < 700)
      .select("doc_id", "score_n", "lang_n")
  }

  // -------------------------------------------- training-data pipeline ops

  private def docsWithId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))

  /** First 20 docs duplicated (with a small tail edit) under doc_id+10^6 —
    * a deterministic planted near-dup set so dedup operators always have
    * positives to find on the otherwise-unique sf tables.
    */
  private def withPlantedDups(docs: DataFrame): DataFrame = {
    val planted = docs.filter(col("doc_id") < 20)
      .select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near dup tail")).as("text"))
    docs.unionAll(planted)
  }

  private def textTokens(s: SparkSession, dir: String): DataFrame =
    docsWithId(s, dir).select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.quality(docsWithId(s, dir), "text")
      .select("doc_id", "n_tokens", "letter_ratio", "punct_ratio",
        "stopword_ratio", "mean_token_len")

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    docsWithId(s, dir).select(
      col("doc_id"),
      TextOps.languageId(col("text")).as("lang_pred"))

  /** Rolling-hash fingerprint gate. The 64-bit mix is not cheaply
    * DuckDB-expressible (BIGINT multiply overflows instead of wrapping),
    * so the driver checks the operator's defining PROPERTIES on planted
    * data instead of raw values: identical text under a different id (and
    * computed in a different task) fingerprints identically; text with a
    * DISJOINT 8-gram set (the uppercased rendering — the synthetic corpus
    * is lowercase words with single spaces, so every 8-gram contains a
    * letter and flips under upper()) fingerprints differently. The
    * fingerprint is a min-hash sketch over
    * byte 8-grams, so two different-but-same-vocabulary texts may
    * legitimately share it — a neighbor-doc comparison collided at
    * sf0.001. Exact fingerprint values are pinned in OpsSpec.
    */
  private def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    val fps = withPlantedExact(docsWithId(s, dir))
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"),
        TextOps.fingerprint(upper(col("text"))).as("fp_upper"))
    val orig = fps.filter(col("doc_id") < 20)
    val copies = fps.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("fp").as("fp_copy"))
    orig.join(copies, "doc_id")
      .select(
        col("doc_id"),
        (col("fp") === col("fp_copy")).as("fp_stable"),
        (col("fp") =!= col("fp_upper")).as("fp_distinct"))
  }

  private def textMd5(s: SparkSession, dir: String): DataFrame =
    docsWithId(s, dir).select(col("doc_id"), md5(col("text")).as("fp_md5"))

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    DedupOps.exactDedup(withPlantedDups(docsWithId(s, dir)), "doc_id", "text")

  /** Exact copies planted under doc_id+10^6 (no edit) — the exact-collapse
    * path of the LSH dedups emits these with similarity 1.0 / hamming 0
    * deterministically, making the pair set SQL-expressible.
    */
  private def withPlantedExact(docs: DataFrame): DataFrame =
    docs.unionAll(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

  /** Threshold 0.9: at j >= 0.9 the 16x8 banding's miss probability is
    * (1-0.9^8)^16 ~ 1e-4 per pair and the seeded hashes are deterministic,
    * so the output equals the DuckDB all-pairs exact-jaccard oracle.
    */
  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    DedupOps.minhashPairs(withPlantedDups(docsWithId(s, dir)), "doc_id", "text",
      shingleK = 5, threshold = 0.9)

  /** Exact planted copies restricted to the planted pair set: the
    * exact-collapse stage guarantees (a, a+10^6, hamming 0) for every
    * planted id, so the oracle is closed-form; the banding path still runs
    * over the representatives (organic near-dups are exercised in unit
    * tests, where hamming is computable).
    */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    DedupOps.simhashPairs(withPlantedExact(docsWithId(s, dir)), "doc_id", "text")
      .filter(col("id_a") < 20 && col("id_b") === col("id_a") + 1000000L)

  private def dedupNgram(s: SparkSession, dir: String): DataFrame = {
    val docs = withPlantedDups(docsWithId(s, dir))
    val pairs = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
    DedupOps.ngramJaccard(pairs, docs, "doc_id", "text", shingleK = 3)
  }

  private def embWithPlanted(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    emb.unionAll(emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
  }

  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    DedupOps.embeddingPairs(embWithPlanted(s, dir), "vec_id", "embedding",
      threshold = 0.999)

  private def annBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
  }

  /** Deterministic hit gate for the approximate ANN variants: the corpus
    * carries an exact COPY of every query vector under query_id + 10^6; an
    * identical vector lands in the same LSH bucket / nearest IVF centroid
    * by construction, so the copy MUST appear in the returned top-k with
    * cosine 1.0 — a probe regression (wrong bucket, wrong centroid list)
    * turns rows missing and fails the driver hash. Organic-recall floors
    * are pinned separately in OpsSpec, where brute force is computable.
    */
  private def annPlantedHits(res: DataFrame): DataFrame =
    res.filter(col("corpus_id") === col("query_id") + 1000000L)
      .select(col("query_id"), col("corpus_id"), col("cosine"))

  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = embWithPlanted(s, dir)
    annPlantedHits(
      SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5))
  }

  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = embWithPlanted(s, dir)
    annPlantedHits(
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5))
  }

  private def mmMeta(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))
      .select(
        col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("payload_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))

  private def mmFeatures(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(t(s, dir, "documents")))

  private def streamWindow(s: SparkSession, dir: String): DataFrame =
    StreamingOps.windowedEventCounts(s, dir)

  private def streamSessions(s: SparkSession, dir: String): DataFrame =
    StreamingOps.userSessions(s, dir)

  /** Streaming btr SOURCE (round-5): documents split into two `batch=N`
    * sub-tables through the DSv2 write path (atomic manifest publish),
    * then read back INCREMENTALLY by `spark.readStream.format("btr")`
    * (BtrMicroBatchStream — offsets are the contiguously completed batch
    * prefix) into a memory sink. Oracle = identity: the stream must
    * deliver exactly the table, once.
    */
  private def streamBtrRead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("n_chars").cast("int").as("n_chars"))
    val half = (docs.count() / 2).toInt
    val base = scratch(s, s"stream_btr_src_${math.abs(dir.hashCode)}")
    // the SOURCE is the operator under test; its two pre-split batch
    // sub-tables are setup, cached across runs like every other rt_* input
    val lo = docs.where(col("doc_id") < half)
    val hi = docs.where(col("doc_id") >= half)
    cachedBtr(s, s"stream_btr_src_${math.abs(dir.hashCode)}/batch=0", lo)(o =>
      lo.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    cachedBtr(s, s"stream_btr_src_${math.abs(dir.hashCode)}/batch=1", hi)(o =>
      hi.write.format("btr").mode("overwrite").option("rangeCols", "doc_id")
        .option("targetPartitionBytes", writePartitionBytes(s)).save(o))
    // ephemeral tmpfs checkpoint (deleted on create): fresh offsets, and the
    // fsync'd offset/commit logs stay off the shared virtio /tmp disk
    val ckpt = graft.ops.StreamingOps.ephemeralCheckpoint(
      s, s"stream_btr_ckpt_${math.abs(dir.hashCode)}")
    val qname = s"btr_stream_read_${math.abs(dir.hashCode)}"
    val q = s.readStream.format("btr").load(base)
      .writeStream.outputMode("append").format("memory").queryName(qname)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(qname)
  }

  /** Native streaming SINK loop (round-5): a parquet file stream (forced
    * to multiple micro-batches) lands through `writeStream.format("btr")`
    * — each epoch an atomic-manifest `batch=<id>` sub-table with range
    * clustering planned by Spark — and streams back out through the btr
    * SOURCE into a memory sink. The complete compressed streaming loop
    * (firehose → btr epochs → standing query) with no foreachBatch glue;
    * at 100 TB rates the sink is exactly-once under replay (manifest-
    * gated epochs, rename-if-absent task files). Oracle = identity: every
    * row exactly once.
    */
  private def streamBtrSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"), col("lang"),
      col("n_chars").cast("int").as("n_chars"))
    val base = scratch(s, s"stream_btr_sink_${math.abs(dir.hashCode)}")
    val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$base/btr"), true) // fresh sink epochs (the operator under test)
    // the 2-file parquet SOURCE is setup, not the operator — reuse it across
    // runs like every other cached input (delete+rewrite if incomplete)
    if (!fs.exists(new Path(s"$base/src/_SUCCESS"))) {
      fs.delete(new Path(s"$base/src"), true)
      docs.repartition(2).write.parquet(s"$base/src")
    }
    val sink = s"$base/btr"
    val tag = math.abs(dir.hashCode)
    val qname = s"btr_stream_sink_$tag"
    graft.ops.StreamingOps.withStreamShufflePartitions(s) {
      val wq = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // force >= 2 epochs through the sink
        .parquet(s"$base/src")
        .writeStream.format("btr")
        .option("checkpointLocation",
          graft.ops.StreamingOps.ephemeralCheckpoint(s, s"stream_btr_sink_w_$tag"))
        .option("rangeCols", "doc_id")
        .start(sink)
      try wq.processAllAvailable() finally wq.stop()
      val rq = s.readStream.format("btr").load(sink)
        .writeStream.outputMode("append").format("memory").queryName(qname)
        .option("checkpointLocation",
          graft.ops.StreamingOps.ephemeralCheckpoint(s, s"stream_btr_sink_r_$tag"))
        .start()
      try rq.processAllAvailable() finally rq.stop()
    }
    s.table(qname)
  }

  // ----------------------------------------------------------------- expose

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rt_int" -> (rtInt _),
    "rt_double" -> (rtDouble _),
    "rt_string" -> (rtStrings _),
    "rt_text" -> (rtText _),
    "rt_engine_docs" -> (rtEngine _),
    "enc_stats" -> (encStats _),
    "rt_expr_int" -> (rtExprInt _),
    "rt_expr_sql" -> (rtExprSql _),
    "q1_agg" -> (q1Agg _),
    "q_filter" -> (qFilter _),
    "q_join" -> (qJoin _),
    "q_topk" -> (qTopk _),
    "q_window" -> (qWindow _),
    "q_setop" -> (qSetop _),
    "q_prune" -> (qPrune _),
    "q_prune_source" -> (qPruneSource _),
    "q_prune_typed" -> (qPruneTyped _),
    "q_prune_in" -> (qPruneIn _),
    "q_agg_push" -> (qAggPush _),
    "q_agg_filtered" -> (qAggFiltered _),
    "q_prune_prefix" -> (qPrunePrefix _),
    "q_prune_or" -> (qPruneOr _),
    "q_agg_count" -> (qAggCount _),
    "q_agg_sum" -> (qAggSum _),
    "stream_btr_read" -> (streamBtrRead _),
    "stream_btr_sink" -> (streamBtrSink _),
    "q_topn_push" -> (qTopnPush _),
    "q_agg_group" -> (qAggGroup _),
    "q_distinct_push" -> (qDistinctPush _),
    "q_join_runtime" -> (qJoinRuntime _),
    "rt_csv" -> (rtCsv _),
    "rt_nulls" -> (rtNulls _),
    "q_prune_null" -> (qPruneNull _),
    "rt_source" -> (rtSource _),
    "rt_write_source" -> (rtWriteSource _),
    "rt_csv_view" -> (rtCsvView _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_md5" -> (textMd5 _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_embedding" -> (dedupEmbedding _),
    "ann_brute" -> (annBrute _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "mm_meta" -> (mmMeta _),
    "mm_features" -> (mmFeatures _),
    "stream_window" -> (streamWindow _),
    "stream_sessions" -> (streamSessions _))

  val oracles: Map[String, String] = Map(
    "rt_int" -> "SELECT l_orderkey, l_linenumber FROM lineitem",
    "rt_double" -> "SELECT l_orderkey, l_extendedprice FROM lineitem",
    "rt_string" -> "SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents",
    "rt_text" -> "SELECT CAST(doc_id AS INTEGER) AS doc_id, text FROM documents",
    "rt_engine_docs" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, text, lang, source, " +
        "CAST(n_chars AS INTEGER) AS n_chars FROM documents"),
    "rt_expr_int" -> "SELECT l_orderkey, l_linenumber FROM lineitem",
    "rt_expr_sql" -> "SELECT source, text FROM documents",
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q_filter" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, CAST(n_chars AS INTEGER) AS n_chars " +
        "FROM documents WHERE doc_id % 100 = 3"),
    "q_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    "q_window" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) WHERE rn = 1"),
    "q_setop" ->
      ("SELECT nationkey, 'intersect' AS op FROM " +
        "(SELECT DISTINCT c_nationkey AS nationkey FROM customer " +
        "INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier) " +
        "UNION ALL " +
        "SELECT nationkey, 'except' AS op FROM " +
        "(SELECT DISTINCT c_nationkey AS nationkey FROM customer " +
        "EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier)"),
    "q_prune" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents " +
        "WHERE doc_id BETWEEN 100 AND 199"),
    "q_prune_source" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents " +
        "WHERE doc_id BETWEEN 100 AND 199"),
    "q_prune_typed" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, source, CAST(n_chars AS DOUBLE) AS n_chars_d " +
        "FROM documents WHERE source = 'src3' AND n_chars >= 200"),
    "q_prune_in" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents " +
        "WHERE doc_id IN (7, 105, 211, 340, 444)"),
    "q_agg_push" ->
      ("SELECT CAST(MIN(doc_id) AS INTEGER) AS min_doc, CAST(MAX(doc_id) AS INTEGER) AS max_doc, " +
        "MIN(lang) AS min_lang, MAX(lang) AS max_lang, COUNT(*) AS n_rows FROM documents"),
    "q_agg_filtered" ->
      ("SELECT COUNT(*) AS n_rows, CAST(MIN(doc_id) AS INTEGER) AS min_doc, " +
        "CAST(MAX(doc_id) AS INTEGER) AS max_doc, MIN(lang) AS min_lang, MAX(lang) AS max_lang " +
        "FROM documents WHERE doc_id BETWEEN 100 AND 399"),
    "q_prune_prefix" ->
      ("SELECT COUNT(*) AS n_rows, CAST(MIN(doc_id) AS INTEGER) AS min_doc, " +
        "CAST(MAX(doc_id) AS INTEGER) AS max_doc " +
        "FROM documents WHERE source LIKE 'src3%'"),
    "q_prune_or" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents " +
        "WHERE (doc_id < 50 OR doc_id >= 450) AND NOT (lang = 'de')"),
    "q_topn_push" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source FROM documents " +
        "WHERE NOT (lang = 'de') ORDER BY doc_id DESC LIMIT 15"),
    "q_agg_group" ->
      ("SELECT source, COUNT(*) AS n_rows, CAST(MIN(doc_id) AS INTEGER) AS min_doc, " +
        "CAST(MAX(doc_id) AS INTEGER) AS max_doc, SUM(CAST(n_chars AS DOUBLE)) AS sum_chars " +
        "FROM documents GROUP BY source"),
    "q_distinct_push" -> "SELECT DISTINCT source FROM documents",
    "q_agg_count" ->
      // the CASE bodies mirror the nullDocs projection exactly (not a bare
      // 1) so the oracle stays correct even if source rows ever carry NULLs
      ("SELECT COUNT(*) AS n_rows, " +
        "COUNT(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END) AS n_chars_nn, " +
        "COUNT(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END) AS n_score_nn, " +
        "COUNT(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END) AS n_lang_nn " +
        "FROM documents WHERE doc_id < 400"),
    "q_agg_sum" ->
      // CASE bodies mirror the nullDocs projection; sums CAST to BIGINT to
      // match Spark's sum(int) result type (DuckDB's is HUGEINT)
      ("SELECT CAST(SUM(doc_id) AS BIGINT) AS sum_doc, " +
        "CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS sum_chars, " +
        "SUM(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(n_chars AS DOUBLE) * 0.5 END) AS sum_score, " +
        "COUNT(*) AS n_rows FROM documents WHERE doc_id < 400"),
    "stream_btr_read" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, " +
        "CAST(n_chars AS INTEGER) AS n_chars FROM documents"),
    "stream_btr_sink" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, " +
        "CAST(n_chars AS INTEGER) AS n_chars FROM documents"),
    "q_join_runtime" ->
      ("SELECT CAST(a.doc_id AS INTEGER) AS doc_id, a.lang, b.source AS dim_source " +
        "FROM documents a JOIN documents b ON a.doc_id = b.doc_id " +
        "WHERE b.source = 'src3' AND b.doc_id < 50"),
    // per-column encode health booleans (floors chosen conservatively per
    // scheme family; see encStats) — closed-form truth table
    "enc_stats" ->
      ("SELECT * FROM (VALUES ('doc_id', true, true), ('lang', true, true), " +
        "('n_chars', true, true), ('source', true, true), ('text', true, true)) " +
        "AS t(col_name, ratio_ok, compressed)"),
    // the planted exact copy of each query vector must be returned by the
    // approximate ANN variants (same bucket / same nearest centroid by
    // construction), with cosine exactly 1.0
    "ann_lsh" ->
      ("SELECT CAST(vec_id AS BIGINT) AS query_id, CAST(vec_id + 1000000 AS BIGINT) AS corpus_id, " +
        "1.0 AS cosine FROM embeddings WHERE vec_id < 5"),
    "ann_ivf" ->
      ("SELECT CAST(vec_id AS BIGINT) AS query_id, CAST(vec_id + 1000000 AS BIGINT) AS corpus_id, " +
        "1.0 AS cosine FROM embeddings WHERE vec_id < 5"),
    "rt_nulls" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, " +
        "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(n_chars AS INTEGER) END AS n_chars_n, " +
        "CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(n_chars AS DOUBLE) * 0.5 END AS score_n, " +
        "CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang_n " +
        "FROM documents"),
    "q_prune_null" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, " +
        "CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(n_chars AS DOUBLE) * 0.5 END AS score_n, " +
        "CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang_n " +
        "FROM documents WHERE doc_id % 7 = 0 AND doc_id < 700"),
    "rt_source" ->
      "SELECT CAST(doc_id AS INTEGER) AS doc_id, lang FROM documents",
    "rt_write_source" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, " +
        "CAST(n_chars AS INTEGER) AS n_chars FROM documents"),
    "rt_csv_view" ->
      "SELECT CAST(doc_id AS INTEGER) AS doc_id, lang FROM documents",
    "rt_csv" ->
      ("SELECT CAST(doc_id AS INTEGER) AS doc_id, lang, source, " +
        "CAST(n_chars AS INTEGER) AS n_chars FROM documents"),
    "text_tokens" ->
      ("SELECT CAST(doc_id AS BIGINT) AS doc_id, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents"),
    "text_quality" ->
      ("SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, " +
        "round(CAST(letters AS DOUBLE) / greatest(n, 1), 4) AS letter_ratio, " +
        "round(CAST(punct AS DOUBLE) / greatest(n, 1), 4) AS punct_ratio, " +
        "round(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio, " +
        "round(CAST(nospace AS DOUBLE) / greatest(n_tokens, 1), 4) AS mean_token_len " +
        "FROM (SELECT doc_id, length(text) AS n, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens, " +
        "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters, " +
        "length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS punct, " +
        "length(regexp_replace(text, '\\s', '', 'g')) AS nospace, " +
        "len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), " +
        "w -> w IN ('the','a','an','and','or','of','to','in','is','it','that'," +
        "'for','on','with','as','are','was','at','by','be'))) AS stop_hits " +
        "FROM documents)"),
    "text_md5" ->
      "SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fp_md5 FROM documents",
    "text_fingerprint" ->
      ("SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS fp_stable, true AS fp_distinct " +
        "FROM documents WHERE doc_id < 20"),
    "dedup_exact" ->
      ("SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS n_dupes FROM " +
        "(SELECT doc_id, text FROM documents UNION ALL " +
        " SELECT doc_id + 1000000, text || ' near dup tail' FROM documents WHERE doc_id < 20) " +
        "GROUP BY text"),
    "mm_meta" ->
      ("SELECT CAST(doc_id AS BIGINT) AS media_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes, " +
        "CAST((doc_id % 64) * 16 + 16 AS INT) AS width, " +
        "CAST((doc_id % 48) * 16 + 16 AS INT) AS height " +
        "FROM documents"),
    "stream_window" ->
      ("SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS window_start, " +
        "event_type, COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value " +
        "FROM events GROUP BY 1, 2"),
    "stream_sessions" ->
      ("SELECT user_id, CAST(1 + COALESCE(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sessions, " +
        "COUNT(*) AS n_events FROM " +
        "(SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap FROM events) " +
        "GROUP BY user_id"),
    // langid: non-overlapping marker counts via the replace trick, argmax
    // with first-in-profile-order tie-break (greatest + ordered CASE), und
    // when no marker hits — generated from the same Profiles the operator
    // uses so they cannot drift
    "text_langid" -> {
      val profiles = graft.ops.LanguageIdExpr.Profiles
      val scoreCols = profiles.map { case (lang, markers) =>
        val sum = markers.map { m =>
          val esc = m.replace("'", "''")
          s"(length(p) - length(replace(p, '$esc', ''))) / ${m.length}"
        }.mkString(" + ")
        s"($sum) AS s_$lang"
      }.mkString(", ")
      val g = profiles.map { case (lang, _) => s"s_$lang" }.mkString("greatest(", ", ", ")")
      val cases = profiles.map { case (lang, _) => s"WHEN s_$lang = $g THEN '$lang'" }.mkString(" ")
      s"WITH p0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, ' ' || lower(text) || ' ' AS p FROM documents), " +
        s"s AS (SELECT doc_id, $scoreCols FROM p0) " +
        s"SELECT doc_id, CASE WHEN $g = 0 THEN 'und' $cases END AS lang_pred FROM s"
    },
    // operator contract: exact dups collapse to a min-id representative
    // ((rep, member, 1.0) pairs emitted directly; member near-dup matches
    // are implied via the representative), LSH + exact char-5-gram jaccard
    // between representatives. Oracle mirrors exactly that: dup-group
    // pairs UNION all-representative-pairs with jaccard >= 0.9 (unrounded,
    // like the Spark filter), size-prefiltered by min/max shingle count.
    "dedup_minhash" ->
      ("WITH docs AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 1000000, text || ' near dup tail' FROM documents WHERE doc_id < 20), " +
        "grp AS (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS rep FROM docs), " +
        "dup_pairs AS (SELECT rep AS id_a, doc_id AS id_b, 1.0 AS jaccard FROM grp WHERE doc_id <> rep), " +
        "reps AS (SELECT doc_id, text FROM grp WHERE doc_id = rep), " +
        "sh AS (SELECT doc_id, list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)]) AS s FROM reps), " +
        "sized AS (SELECT doc_id, s, len(s) AS n FROM sh), " +
        "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb " +
        "FROM sized a JOIN sized b ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.9 * greatest(a.n, b.n)), " +
        "j AS (SELECT id_a, id_b, CAST(len(list_intersect(sa, sb)) AS DOUBLE) / " +
        "(len(sa) + len(sb) - len(list_intersect(sa, sb))) AS jraw FROM cand) " +
        "SELECT id_a, id_b, round(jraw, 4) AS jaccard FROM j WHERE jraw >= 0.9 " +
        "UNION ALL SELECT id_a, id_b, jaccard FROM dup_pairs"),
    "dedup_simhash" ->
      ("SELECT CAST(doc_id AS BIGINT) AS id_a, CAST(doc_id + 1000000 AS BIGINT) AS id_b, " +
        "CAST(0 AS INT) AS hamming FROM documents WHERE doc_id < 20"),
    "dedup_embedding" ->
      ("SELECT CAST(vec_id AS BIGINT) AS id_a, CAST(vec_id + 1000000 AS BIGINT) AS id_b, " +
        "1.0 AS cosine FROM embeddings WHERE vec_id < 10"),
    "dedup_ngram" ->
      ("WITH pairs AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, " +
        "text AS ta, text || ' near dup tail' AS tb FROM documents WHERE doc_id < 20), " +
        "sh AS (SELECT id_a, id_b, " +
        "list_distinct([substr(ta, i, 3) for i in range(1, length(ta) - 1)]) AS sa, " +
        "list_distinct([substr(tb, i, 3) for i in range(1, length(tb) - 1)]) AS sb FROM pairs) " +
        "SELECT id_a, id_b, round(CAST(len(list_intersect(sa, sb)) AS DOUBLE) / " +
        "(len(sa) + len(sb) - len(list_intersect(sa, sb))), 4) AS jaccard FROM sh"),
    // exact top-k cosine in DOUBLE math (list_cosine_similarity is float32
    // and diverges in the 4th decimal), sequential list_sum = the Spark
    // accumulator order
    "ann_brute" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings), " +
        "pairs AS (SELECT query_id, corpus_id, " +
        "list_sum([CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) for i in range(1, len(qv) + 1)]) AS dot, " +
        "list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) for i in range(1, len(qv) + 1)]) AS na, " +
        "list_sum([CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) for i in range(1, len(cv) + 1)]) AS nb " +
        "FROM q CROSS JOIN c), " +
        // floor(x*1e4+0.5)/1e4 = SimilarityOps.round4 — identical IEEE ops,
        // and ranking happens on this rounded value on both sides
        "sims AS (SELECT query_id, corpus_id, " +
        "floor((CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END) * 10000 + 0.5) / 10000 AS cosine FROM pairs), " +
        "ranked AS (SELECT query_id, corpus_id, cosine, " +
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS INT) AS rank FROM sims) " +
        "SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, cosine, rank " +
        "FROM ranked WHERE rank <= 5"),
    // StubDecoder pixels: payload byte j appears floor((L-1-j)/P)+1 times
    // (cyclic fill to L = min(width*height, 4096)); text is ASCII so chars
    // are bytes; floor(x*1e4+0.5) rounding matches the operator exactly
    "mm_features" ->
      ("WITH media AS (SELECT CAST(doc_id AS BIGINT) AS media_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "text, length(text) AS p, " +
        "greatest(1, least(CAST((doc_id % 64) * 16 + 16 AS BIGINT) * ((doc_id % 48) * 16 + 16), 4096)) AS l " +
        "FROM documents), " +
        "chars AS (SELECT media_id, kind, p, l, " +
        "unnest([struct_pack(ch := substr(text, CAST(j + 1 AS INT), 1), " +
        "cnt := CASE WHEN j < l THEN (l - 1 - j) // p + 1 ELSE 0 END) for j in range(0, p)]) AS e " +
        "FROM media), " +
        "hist AS (SELECT media_id, kind, p, l, e.ch AS ch, SUM(e.cnt) AS cnt " +
        "FROM chars WHERE e.cnt > 0 GROUP BY media_id, kind, p, l, e.ch), " +
        "agg AS (SELECT media_id, kind, p, l, SUM(ord(ch) * cnt) AS total, " +
        "SUM(- (CAST(cnt AS DOUBLE) / l) * log2(CAST(cnt AS DOUBLE) / l)) AS ent " +
        "FROM hist GROUP BY media_id, kind, p, l) " +
        "SELECT media_id, kind, CAST(p AS BIGINT) AS payload_bytes, " +
        "floor((CAST(total AS DOUBLE) / l) * 10000 + 0.5) / 10000 AS mean_level, " +
        "floor(ent * 10000 + 0.5) / 10000 AS entropy FROM agg"))
}
