package graft

import graft.codec._
import graft.engine.BtrTable
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
    val out = s"file:/root/repo/target/tmp/rt_engine_${math.abs(dir.hashCode)}"
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"),
      col("text"), col("lang"), col("source"),
      col("n_chars").cast("int").as("n_chars"))
    BtrTable.write(docs, out, BtrConfig.default, rangeCols = Seq("source", "doc_id"))
    BtrTable.load(s, out)
  }

  /** Codec-choice/ratio metrics over the encoded documents table (north
    * rule: metrics persisted per column). Not SQL-expressible — rows-only.
    */
  private def encStats(s: SparkSession, dir: String): DataFrame = {
    val out = s"file:/root/repo/target/tmp/enc_stats_${math.abs(dir.hashCode)}"
    val docs = t(s, dir, "documents").select(
      col("doc_id").cast("int").as("doc_id"),
      col("text"), col("lang"), col("source"),
      col("n_chars").cast("int").as("n_chars"))
    BtrTable.write(docs, out, BtrConfig.default)
    BtrTable.stats(s, out).withColumn("schemes", to_json(col("schemes")))
  }

  // ------------------------------------------- Catalyst expression surface

  /** Column-API expressions: chunk ints into arrays, encode→decode→explode.
    * Oracle = identity SELECT, so the expression layer is driver-verified.
    */
  private def rtExprInt(s: SparkSession, dir: String): DataFrame = {
    import graft.expr.BtrFunctions._
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_linenumber")).as("xs"))
      .select(
        col("l_orderkey"),
        explode(btr_decode_int(btr_encode_int(col("xs")))).as("l_linenumber"))
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
    "q_setop" -> (qSetop _))

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
        "EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier)"))
}
