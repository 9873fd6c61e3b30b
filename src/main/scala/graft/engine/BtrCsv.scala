package graft.engine

import graft.codec.{BtrConfig, ColType}
import graft.format.BtrManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ⇄ btr conversion — the reference's primary CLI surface
  * (`from-csv` /root/reference/src/btrblocks.rs:382-539, `to-csv` :543-571,
  * `print-csv` /root/reference/src/bin/btr.rs:216-228). Spark's CSV source/
  * sink does the parsing/formatting; we add the reference's null-default
  * semantics: missing cells become 0 / 0.0 / "NULL"
  * (/root/reference/src/btrblocks.rs:434,:458,:479 — its CSV ingest
  * substitutes those defaults, making columns effectively non-null).
  */
object BtrCsv {

  /** Read CSV with the given (name, colType) schema and encode to a btr
    * directory. Any object-store URL Hadoop supports (the reference's
    * object_store matrix, /root/reference/src/util.rs:60-96, comes free).
    */
  def fromCsv(
      spark: SparkSession,
      csvUrl: String,
      btrDir: String,
      schema: Seq[(String, Int)],
      hasHeaders: Boolean = true,
      cfg: BtrConfig = BtrConfig.default,
      rangeCols: Seq[String] = Nil): BtrManifest = {
    val structType = StructType(schema.map { case (name, t) =>
      StructField(name, t match {
        case ColType.Integer => IntegerType
        case ColType.Double  => DoubleType
        case ColType.String  => StringType
      }, nullable = true)
    })
    val raw = spark.read
      .option("header", hasHeaders.toString)
      .schema(structType)
      .csv(csvUrl)
    // reference null-default semantics
    val intCols = schema.collect { case (n, t) if t == ColType.Integer => n }
    val dblCols = schema.collect { case (n, t) if t == ColType.Double => n }
    val strCols = schema.collect { case (n, t) if t == ColType.String => n }
    val filled = raw
      .na.fill(0, intCols)
      .na.fill(0.0, dblCols)
      .na.fill("NULL", strCols)
    BtrTable.write(filled, btrDir, cfg, rangeCols = rangeCols)
  }

  /** Decode a btr directory and materialize it as CSV (header on). */
  def toCsv(spark: SparkSession, btrDir: String, csvOutDir: String): Unit =
    BtrTable.load(spark, btrDir)
      .write.mode("overwrite").option("header", "true").csv(csvOutDir)

  /** The print-csv row rendering, shared with BtrCsvView (whose byte
    * contract promises exactly this text) so they cannot desynchronize.
    * SQL NULL renders as an empty cell — the reference's CSV extraction
    * does the same (/root/reference/src/util.rs:38-41), and it matches
    * Spark's csv writer default.
    */
  private[engine] def renderRowCsv(row: org.apache.spark.sql.Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append(',')
      val v = row.get(i)
      if (v != null) sb.append(v)
      i += 1
    }
    sb.toString
  }

  /** `print-csv` analog: decoded rows to stdout (driver-side, bounded). */
  def printCsv(spark: SparkSession, btrDir: String, limit: Int = 300000): Unit = {
    val df = BtrTable.load(spark, btrDir).limit(limit)
    println(df.columns.mkString(","))
    df.toLocalIterator().forEachRemaining(row => println(renderRowCsv(row)))
  }
}
