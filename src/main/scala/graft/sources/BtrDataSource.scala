package graft.sources

import graft.codec._
import graft.engine.{BlockFiles, BtrDecoder, BtrTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.graftshim.ConfShim
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{Map => JMap}

/** DataSource V2 connector: `spark.read.format("btr").load(dir)` over the
  * raw block-file layout (BlockFiles). The reference exposes its format as
  * a DataFusion TableProvider with NO pushdown
  * (/root/reference/src/datafusion.rs:42-74, scan :64-73 ignores
  * projection/filters, single partition :88); this connector improves on
  * it three times over: one InputPartition per block file (parallel scan),
  * column pruning that SKIPS pruned columns' bytes entirely (the per-chunk
  * frame stores each column's blob length), range-filter pushdown on int,
  * double AND string columns that skips whole CHUNKS against the frame's
  * per-column zone maps without reading their blobs — and a COLUMNAR read
  * path: decoded chunks are already columnar arrays, so they surface as a
  * ColumnarBatch feeding Spark's vectorized operators with zero per-value
  * boxing.
  */
class BtrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "btr"

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "btr source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val manifest = BtrTable.readManifest(SparkSession.active, dirOf(options))
    StructType(manifest.columns.map(c =>
      StructField(c.name, BtrDecoder.sparkType(c.colType), nullable = false)))
  }

  /** Writes pass the dataframe's schema straight through (no manifest to
    * infer from when creating a new table).
    */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BtrBatchTable(properties.get("path"), schema)
}

class BtrBatchTable(dir: String, schema: StructType)
  extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"btr:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BtrScanBuilder(dir, schema)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.WriteBuilder =
    new BtrWriteBuilder(dir, info)
}

/** Zone predicate on one file column (by file column index): decides from a
  * chunk's zone map [min, max] whether the chunk can be skipped whole.
  */
sealed trait ZonePred extends Serializable { def colIdx: Int }

/** Inclusive [lo, hi] over an int column's long zone. */
case class LongZonePred(colIdx: Int, lo: Long, hi: Long) extends ZonePred {
  def skip(mn: Long, mx: Long): Boolean = mx < lo || mn > hi
}

/** Inclusive [lo, hi] over a double column's zone (zone never covers NaN —
  * the encoder drops the zone when the chunk contains one).
  */
case class DoubleZonePred(colIdx: Int, lo: Double, hi: Double) extends ZonePred {
  def skip(mn: Double, mx: Double): Boolean = mx < lo || mn > hi
}

object StrOp { val GT = 0; val GTE = 1; val LT = 2; val LTE = 3; val EQ = 4 }

/** One comparison against a string column's UTF-8 byte-order zone (Spark's
  * binary collation IS unsigned UTF-8 byte order, so zone compare and row
  * compare agree).
  */
case class StringZonePred(colIdx: Int, op: Int, v: Array[Byte]) extends ZonePred {
  // default case-class toString would print the array's identity hash —
  // nondeterministic plan text; render the comparand itself
  override def toString: String =
    s"StringZonePred($colIdx,$op,${new String(v, java.nio.charset.StandardCharsets.UTF_8)})"
  def skip(mn: Array[Byte], mx: Array[Byte]): Boolean = {
    def cmp(a: Array[Byte], b: Array[Byte]) = java.util.Arrays.compareUnsigned(a, b)
    op match {
      case StrOp.GT  => cmp(mx, v) <= 0
      case StrOp.GTE => cmp(mx, v) < 0
      case StrOp.LT  => cmp(mn, v) >= 0
      case StrOp.LTE => cmp(mn, v) > 0
      case StrOp.EQ  => cmp(v, mn) < 0 || cmp(v, mx) > 0
    }
  }
}

class BtrScanBuilder(dir: String, fullSchema: StructType)
  extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countStar = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve file column order for the positional frame decode
    val wanted = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => wanted.contains(f.name)))
  }

  private def colOf(name: String, dt: DataType): Option[Int] = {
    val i = fullSchema.fieldNames.indexOf(name)
    if (i >= 0 && fullSchema.fields(i).dataType == dt) Some(i) else None
  }

  // fractional comparands need ceil/floor, not longValue truncation:
  // x > 3.5 over ints means x >= 4, x > -3.5 means x >= -3 (longValue-based
  // lo = -3+1 would wrongly skip chunks containing -3)
  private def isIntegral(v: Number): Boolean = v match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer | _: java.lang.Long => true
    case _ => false
  }
  private def lowAbove(v: Number): Long = // smallest int satisfying "x > v"
    if (isIntegral(v)) v.longValue + 1 else math.ceil(v.doubleValue).toLong +
      (if (v.doubleValue == math.floor(v.doubleValue)) 1L else 0L)
  private def lowAtLeast(v: Number): Long = // smallest int satisfying "x >= v"
    if (isIntegral(v)) v.longValue else math.ceil(v.doubleValue).toLong
  private def highBelow(v: Number): Long = // largest int satisfying "x < v"
    if (isIntegral(v)) v.longValue - 1 else math.floor(v.doubleValue).toLong -
      (if (v.doubleValue == math.ceil(v.doubleValue)) 1L else 0L)
  private def highAtMost(v: Number): Long = // largest int satisfying "x <= v"
    if (isIntegral(v)) v.longValue else math.floor(v.doubleValue).toLong

  private def zoneOf(f: Filter): Option[ZonePred] = f match {
    // ---- int columns: inclusive long range with fractional-bound rounding
    case GreaterThan(a, v: Number) if colOf(a, IntegerType).isDefined =>
      colOf(a, IntegerType).map(LongZonePred(_, lowAbove(v), Long.MaxValue))
    case GreaterThanOrEqual(a, v: Number) if colOf(a, IntegerType).isDefined =>
      colOf(a, IntegerType).map(LongZonePred(_, lowAtLeast(v), Long.MaxValue))
    case LessThan(a, v: Number) if colOf(a, IntegerType).isDefined =>
      colOf(a, IntegerType).map(LongZonePred(_, Long.MinValue, highBelow(v)))
    case LessThanOrEqual(a, v: Number) if colOf(a, IntegerType).isDefined =>
      colOf(a, IntegerType).map(LongZonePred(_, Long.MinValue, highAtMost(v)))
    case EqualTo(a, v: Number) if colOf(a, IntegerType).isDefined =>
      // non-integral equality can match no int row: empty range skips all
      colOf(a, IntegerType).map(LongZonePred(_, lowAtLeast(v), highAtMost(v)))
    // ---- double columns: open bounds via IEEE next-up/down (exact)
    case GreaterThan(a, v: Number) if !v.doubleValue.isNaN =>
      colOf(a, DoubleType).map(DoubleZonePred(_, Math.nextUp(v.doubleValue), Double.PositiveInfinity))
    case GreaterThanOrEqual(a, v: Number) if !v.doubleValue.isNaN =>
      colOf(a, DoubleType).map(DoubleZonePred(_, v.doubleValue, Double.PositiveInfinity))
    case LessThan(a, v: Number) if !v.doubleValue.isNaN =>
      colOf(a, DoubleType).map(DoubleZonePred(_, Double.NegativeInfinity, Math.nextDown(v.doubleValue)))
    case LessThanOrEqual(a, v: Number) if !v.doubleValue.isNaN =>
      colOf(a, DoubleType).map(DoubleZonePred(_, Double.NegativeInfinity, v.doubleValue))
    case EqualTo(a, v: Number) if !v.doubleValue.isNaN =>
      colOf(a, DoubleType).map(DoubleZonePred(_, v.doubleValue, v.doubleValue))
    // ---- string columns: op-coded compare over UTF-8 byte order
    case GreaterThan(a, v: String) =>
      colOf(a, StringType).map(StringZonePred(_, StrOp.GT, v.getBytes(UTF_8)))
    case GreaterThanOrEqual(a, v: String) =>
      colOf(a, StringType).map(StringZonePred(_, StrOp.GTE, v.getBytes(UTF_8)))
    case LessThan(a, v: String) =>
      colOf(a, StringType).map(StringZonePred(_, StrOp.LT, v.getBytes(UTF_8)))
    case LessThanOrEqual(a, v: String) =>
      colOf(a, StringType).map(StringZonePred(_, StrOp.LTE, v.getBytes(UTF_8)))
    case EqualTo(a, v: String) =>
      colOf(a, StringType).map(StringZonePred(_, StrOp.EQ, v.getBytes(UTF_8)))
    case _ => None
  }

  /** Keep range filters on int/double/string columns for zone-map chunk
    * skipping. The full filter set is returned unhandled: zone maps only
    * SKIP chunks, Spark still evaluates every predicate on surviving rows.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => zoneOf(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Partial limit pushdown: each partition reader stops after `l` rows
    * (returning false keeps Spark's own global Limit on top).
    */
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  /** COUNT(*) pushdown: row counts live in the chunk frame headers, so a
    * count never has to touch (or decode) a single column blob. Partial
    * pushdown — the scan emits one partial count per block file and Spark
    * sums them. Spark only offers aggregates here when every filter was
    * fully handled at the source; zone filters are reported as unhandled,
    * so a filtered count() automatically falls back to row decoding.
    */
  override def supportCompletePushDown(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty && pushed.isEmpty && limit < 0 &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar])
    if (ok) countStar = true
    ok
  }

  override def build(): Scan =
    if (countStar) new BtrCountScan(dir)
    else new BtrScan(dir, fullSchema, required, pushed.flatMap(zoneOf), limit)
}

object BtrScan {
  def listBlockFiles(dir: String): Array[InputPartition] = {
    val spark = SparkSession.active
    val blocks = new Path(s"$dir/blocks")
    val fs = blocks.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(blocks)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map(st => BtrInputPartition(st.getPath.toString): InputPartition)
  }
}

class BtrScan(
    dir: String,
    fullSchema: StructType,
    required: StructType,
    zones: Array[ZonePred],
    limit: Int = -1)
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BtrScan(dir=$dir, columns=${required.fieldNames.mkString(",")}" +
      (if (zones.isEmpty) "" else s", zoneFilters=${zones.map(z => s"${fullSchema.fieldNames(z.colIdx)}:$z").mkString(";")}") +
      (if (limit >= 0) s", limit=$limit)" else ")")

  /** Decoded-size statistics from the manifest — lets Catalyst see the
    * real (uncompressed) relation size for join planning (e.g. broadcast
    * a small decoded dimension) instead of guessing from file sizes.
    */
  override def estimateStatistics(): Statistics = {
    val m = BtrTable.readManifest(SparkSession.active, dir)
    val frac =
      if (required.isEmpty) 0.05
      else required.fieldNames.length.toDouble / math.max(1, fullSchema.length)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, (m.rawBytes * frac).toLong))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(m.numRows)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = BtrScan.listBlockFiles(dir)

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val confB = ConfShim.broadcast(spark.sparkContext)
    val colIdx = required.fieldNames.map(n => fullSchema.fieldIndex(n))
    BtrReaderFactory(confB, colIdx, zones, limit)
  }
}

/** COUNT(*) scan: one partial-count row per block file, from frame headers
  * only — zero column blobs read or decoded.
  */
class BtrCountScan(dir: String) extends Scan with Batch {
  private val outSchema = StructType(Seq(StructField("count", org.apache.spark.sql.types.LongType, nullable = false)))
  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  override def description(): String = s"BtrCountScan(dir=$dir, headers-only)"
  override def planInputPartitions(): Array[InputPartition] = BtrScan.listBlockFiles(dir)
  override def createReaderFactory(): PartitionReaderFactory = {
    val confB = ConfShim.broadcast(SparkSession.active.sparkContext)
    BtrCountReaderFactory(confB)
  }
}

case class BtrCountReaderFactory(confB: org.apache.spark.broadcast.Broadcast[ConfShim.SerConf])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BtrCountReader(partition.asInstanceOf[BtrInputPartition].file, ConfShim.conf(confB))
}

class BtrCountReader(file: String, conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {
  private var emitted = false
  private val row = new GenericInternalRow(1)

  override def next(): Boolean = {
    if (emitted) return false
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    var total = 0L
    try {
      val hdr = new Array[Byte](5)
      in.readFully(hdr)
      val magic = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
      require(magic == BlockFiles.Magic, s"not a btr block file: $file")
      val version = hdr(4) & 0xff
      require(version >= 1 && version <= BlockFiles.Version,
        s"unsupported btr block version $version: $file") // a silent wrong COUNT would be the worst failure
      var pos = 5L
      val b4 = new Array[Byte](4)
      def i32(): Int = {
        in.readFully(b4); pos += 4
        (b4(0) & 0xff) | ((b4(1) & 0xff) << 8) | ((b4(2) & 0xff) << 16) | ((b4(3) & 0xff) << 24)
      }
      def u8(): Int = { val b = in.read(); pos += 1; b }
      while (pos < fileLen) {
        total += i32() // numRows
        val nCols = u8()
        var blobs = 0L
        var c = 0
        while (c < nCols) {
          u8() // colType
          blobs += i32()
          version match {
            case 1 => ()
            case 2 => in.seek(pos + 17); pos += 17 // hasZone + min + max
            case _ =>
              u8() match {
                case 0     => ()
                case 1 | 2 => in.seek(pos + 16); pos += 16
                case 3 =>
                  val ln = u8(); in.seek(pos + ln); pos += ln
                  val lx = u8(); in.seek(pos + lx); pos += lx
                case k => sys.error(s"bad zoneKind $k in $file")
              }
          }
          c += 1
        }
        in.seek(pos + blobs) // skip ALL column blobs
        pos += blobs
      }
    } finally in.close()
    row.update(0, total)
    emitted = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

case class BtrInputPartition(file: String) extends InputPartition

case class BtrReaderFactory(
    confB: org.apache.spark.broadcast.Broadcast[ConfShim.SerConf],
    requiredIdx: Array[Int],
    zones: Array[ZonePred],
    limit: Int = -1)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BtrPartitionReader(
      partition.asInstanceOf[BtrInputPartition].file, ConfShim.conf(confB),
      requiredIdx, zones, limit)

  /** Decoded chunks are columnar arrays already — hand them to Spark as
    * ColumnarBatches (vectorized operators, zero per-value boxing).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    new BtrColumnarReader(
      partition.asInstanceOf[BtrInputPartition].file, ConfShim.conf(confB),
      requiredIdx, zones, limit)
}

/** Streams one block file chunk-by-chunk (bounded memory — the reference's
  * ChunkedDecompressionStream semantics, pull-based). Pruned columns'
  * blobs are skipped via their frame lengths without decoding; chunks whose
  * zone maps miss every pushed range are skipped whole. Shared by the row
  * and columnar readers.
  */
final class ChunkCursor(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    requiredIdx: Array[Int],
    zones: Array[ZonePred]) {

  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var pos = 0L
  private var version = 1

  /** Chunks skipped via zone maps (observable for tests/metrics). */
  var chunksSkipped: Long = 0L

  /** Decoded required columns of the current chunk (Array[Int] /
    * Array[Double] / DecodedStrings per slot) and its row count.
    */
  var decoded: Array[AnyRef] = _
  var chunkRows = 0

  locally {
    val hdr = new Array[Byte](5)
    in.readFully(hdr)
    val magic = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
    require(magic == BlockFiles.Magic, s"not a btr block file: $file")
    version = hdr(4) & 0xff
    require(version >= 1 && version <= BlockFiles.Version,
      s"unsupported btr block version $version: $file")
    pos = 5
  }

  private val zonesByCol: Map[Int, Array[ZonePred]] = zones.groupBy(_.colIdx)
  // file column index -> output slot (-1 = pruned); O(1) per column instead
  // of requiredIdx.indexOf per chunk
  private val outPos: Array[Int] = {
    val n = if (requiredIdx.isEmpty) 0 else requiredIdx.max + 1
    val a = Array.fill(n)(-1)
    requiredIdx.zipWithIndex.foreach { case (c, o) => a(c) = o }
    a
  }

  private def readI32(): Int = {
    val b = new Array[Byte](4)
    in.readFully(b)
    pos += 4
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }

  private def readI64(): Long =
    (readI32().toLong & 0xffffffffL) | (readI32().toLong << 32)

  private def u8(): Int = { val b = in.read(); pos += 1; b }

  /** Parse one column's zone section; true if its preds reject the chunk. */
  private def zoneRejects(c: Int): Boolean = {
    if (version == 1) return false
    if (version == 2) {
      val hasZone = u8()
      val mn = readI64()
      val mx = readI64()
      return hasZone == 1 && zonesByCol.get(c).exists(_.exists {
        case p: LongZonePred => p.skip(mn, mx)
        case _               => false
      })
    }
    u8() match {
      case 0 => false
      case 1 =>
        val mn = readI64(); val mx = readI64()
        zonesByCol.get(c).exists(_.exists {
          case p: LongZonePred => p.skip(mn, mx)
          case _               => false
        })
      case 2 =>
        val mn = java.lang.Double.longBitsToDouble(readI64())
        val mx = java.lang.Double.longBitsToDouble(readI64())
        zonesByCol.get(c).exists(_.exists {
          case p: DoubleZonePred => p.skip(mn, mx)
          case _                 => false
        })
      case 3 =>
        val mn = new Array[Byte](u8()); in.readFully(mn); pos += mn.length
        val mx = new Array[Byte](u8()); in.readFully(mx); pos += mx.length
        zonesByCol.get(c).exists(_.exists {
          case p: StringZonePred => p.skip(mn, mx)
          case _                 => false
        })
      case k => sys.error(s"bad zoneKind $k in $file")
    }
  }

  /** Advance to the next chunk that survives zone skipping and decode its
    * required columns. False at end of file.
    */
  def nextChunk(): Boolean = {
    while (pos < fileLen) {
      chunkRows = readI32()
      val nCols = u8()
      val types = new Array[Int](nCols)
      val lens = new Array[Int](nCols)
      var skipChunk = false
      var c = 0
      while (c < nCols) {
        types(c) = u8()
        lens(c) = readI32()
        if (zoneRejects(c)) skipChunk = true
        c += 1
      }
      if (skipChunk) {
        var total = 0L
        var k = 0
        while (k < nCols) { total += lens(k); k += 1 }
        in.seek(pos + total)
        pos += total
        chunksSkipped += 1
      } else {
        decoded = new Array[AnyRef](requiredIdx.length)
        c = 0
        while (c < nCols) {
          val out = if (c < outPos.length) outPos(c) else -1
          if (out >= 0) {
            val blob = new Array[Byte](lens(c))
            in.readFully(blob)
            pos += lens(c)
            decoded(out) = types(c) match {
              case t if t == ColType.Integer.toInt => IntCodec.decode(blob)
              case t if t == ColType.Double.toInt  => DoubleCodec.decode(blob)
              case t if t == ColType.String.toInt =>
                StringCodec.decodeSlices(new BufReader(blob)) // arena, no per-string arrays
            }
          } else {
            // pruned column: skip without reading into memory
            in.seek(pos + lens(c))
            pos += lens(c)
          }
          c += 1
        }
        return true
      }
    }
    false
  }

  def close(): Unit = in.close()
}

/** Row-at-a-time reader over the chunk cursor (kept for paths where Spark
  * declines columnar; the columnar reader below is the hot path).
  */
class BtrPartitionReader(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    requiredIdx: Array[Int],
    zones: Array[ZonePred] = Array.empty,
    limit: Int = -1)
  extends PartitionReader[InternalRow] {

  private val cursor = new ChunkCursor(file, conf, requiredIdx, zones)
  private var emittedRows = 0L
  private var rowIdx = 0
  private var chunkRows = 0
  private val row = new GenericInternalRow(requiredIdx.length)

  def chunksSkipped: Long = cursor.chunksSkipped

  override def next(): Boolean = {
    if (limit >= 0 && emittedRows >= limit) return false // pushed (partial) limit
    while (rowIdx >= chunkRows) {
      if (!cursor.nextChunk()) return false
      chunkRows = cursor.chunkRows
      rowIdx = 0
    }
    emittedRows += 1
    val decoded = cursor.decoded
    var o = 0
    while (o < decoded.length) {
      row.update(o, decoded(o) match {
        case a: Array[Int]       => a(rowIdx)
        case a: Array[Double]    => a(rowIdx)
        case d: DecodedStrings   => UTF8String.fromBytes(d.data, d.starts(rowIdx), d.lens(rowIdx))
      })
      o += 1
    }
    rowIdx += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = cursor.close()
}

/** Columnar reader: one ColumnarBatch per decoded chunk, wrapping the
  * decoded arrays directly (no per-value copies or boxing).
  */
class BtrColumnarReader(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    requiredIdx: Array[Int],
    zones: Array[ZonePred] = Array.empty,
    limit: Int = -1)
  extends PartitionReader[ColumnarBatch] {

  private val cursor = new ChunkCursor(file, conf, requiredIdx, zones)
  private var emittedRows = 0L
  private var batch: ColumnarBatch = _

  def chunksSkipped: Long = cursor.chunksSkipped

  override def next(): Boolean = {
    if (limit >= 0 && emittedRows >= limit) return false
    if (!cursor.nextChunk()) return false
    val vectors: Array[ColumnVector] = cursor.decoded.map {
      case a: Array[Int]      => new IntArrayVector(a): ColumnVector
      case a: Array[Double]   => new DoubleArrayVector(a): ColumnVector
      case d: DecodedStrings  => new StringArenaVector(d): ColumnVector
    }
    var n = cursor.chunkRows
    if (limit >= 0 && emittedRows + n > limit) n = (limit - emittedRows).toInt
    emittedRows += n
    batch = new ColumnarBatch(vectors, n)
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = cursor.close()
}
