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
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.graftshim.ConfShim
import org.apache.hadoop.fs.Path
import java.util.{Map => JMap}

/** DataSource V2 connector: `spark.read.format("btr").load(dir)` over the
  * raw block-file layout (BlockFiles). The reference exposes its format as
  * a DataFusion TableProvider with NO pushdown
  * (/root/reference/src/datafusion.rs:42-74, scan :64-73 ignores
  * projection/filters, single partition :88); this connector improves on
  * it twice over: one InputPartition per block file (parallel scan),
  * column pruning that SKIPS pruned columns' bytes entirely (the per-chunk
  * frame stores each column's blob length), and range-filter pushdown that
  * skips whole CHUNKS against the frame's per-column zone maps without
  * reading their blobs.
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

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BtrBatchTable(properties.get("path"), schema)
}

class BtrBatchTable(dir: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"btr:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BtrScanBuilder(dir, schema)
}

/** Inclusive [lo, hi] zone constraint on one column (by file column index). */
case class ZoneRange(colIdx: Int, lo: Long, hi: Long)

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

  private def intCol(name: String): Option[Int] = {
    val i = fullSchema.fieldNames.indexOf(name)
    if (i >= 0 && fullSchema.fields(i).dataType == IntegerType) Some(i) else None
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

  private def rangeOf(f: Filter): Option[ZoneRange] = f match {
    case GreaterThan(a, v: Number)        => intCol(a).map(ZoneRange(_, lowAbove(v), Long.MaxValue))
    case GreaterThanOrEqual(a, v: Number) => intCol(a).map(ZoneRange(_, lowAtLeast(v), Long.MaxValue))
    case LessThan(a, v: Number)           => intCol(a).map(ZoneRange(_, Long.MinValue, highBelow(v)))
    case LessThanOrEqual(a, v: Number)    => intCol(a).map(ZoneRange(_, Long.MinValue, highAtMost(v)))
    case EqualTo(a, v: Number) =>
      // non-integral equality can match no int row: empty range skips all
      intCol(a).map(ZoneRange(_, lowAtLeast(v), highAtMost(v)))
    case _ => None
  }

  /** Keep range filters on int columns for zone-map chunk skipping. The
    * full filter set is returned unhandled: zone maps only SKIP chunks,
    * Spark still evaluates every predicate on the surviving rows.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => rangeOf(f).isDefined)
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
    else new BtrScan(dir, fullSchema, required, pushed.flatMap(rangeOf), limit)
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
    zones: Array[ZoneRange],
    limit: Int = -1)
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BtrScan(dir=$dir, columns=${required.fieldNames.mkString(",")}" +
      (if (zones.isEmpty) "" else s", zoneFilters=${zones.map(z => s"${fullSchema.fieldNames(z.colIdx)}:[${z.lo},${z.hi}]").mkString(";")}") +
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
    val colTypes = fullSchema.fields.map(f =>
      graft.engine.BtrEncoder.supportedType(f.dataType).get)
    BtrReaderFactory(confB, colIdx, colTypes, zones, limit)
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
      require(version == 1 || version == 2,
        s"unsupported btr block version $version: $file") // a silent wrong COUNT would be the worst failure
      var pos = 5L
      val b4 = new Array[Byte](4)
      def i32(): Int = {
        in.readFully(b4); pos += 4
        (b4(0) & 0xff) | ((b4(1) & 0xff) << 8) | ((b4(2) & 0xff) << 16) | ((b4(3) & 0xff) << 24)
      }
      while (pos < fileLen) {
        total += i32() // numRows
        val nCols = { val b = in.read(); pos += 1; b }
        var blobs = 0L
        var c = 0
        while (c < nCols) {
          in.read(); pos += 1 // colType
          blobs += i32()
          if (version >= 2) { in.seek(pos + 17); pos += 17 } // hasZone + min + max
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
    colTypes: Array[Int],
    zones: Array[ZoneRange],
    limit: Int = -1)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BtrPartitionReader(
      partition.asInstanceOf[BtrInputPartition].file, ConfShim.conf(confB),
      requiredIdx, colTypes, zones, limit)
}

/** Streams one block file chunk-by-chunk (bounded memory — the reference's
  * ChunkedDecompressionStream semantics, pull-based). Pruned columns'
  * blobs are skipped via their frame lengths without decoding; chunks whose
  * zone maps miss every pushed range are skipped whole.
  */
class BtrPartitionReader(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    requiredIdx: Array[Int],
    colTypes: Array[Int],
    zones: Array[ZoneRange] = Array.empty,
    limit: Int = -1)
  extends PartitionReader[InternalRow] {

  private var emittedRows = 0L

  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var pos = 0L
  private var version = 1

  /** Chunks skipped via zone maps (observable for tests/metrics). */
  var chunksSkipped: Long = 0L

  locally {
    val hdr = new Array[Byte](5)
    in.readFully(hdr)
    val magic = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
    require(magic == BlockFiles.Magic, s"not a btr block file: $file")
    version = hdr(4) & 0xff
    require(version == 1 || version == 2, s"unsupported btr block version $version: $file")
    pos = 5
  }

  // current chunk decoded columns (only required ones), row cursor
  private var decoded: Array[AnyRef] = _
  private var chunkRows = 0
  private var rowIdx = 0
  private val row = new GenericInternalRow(requiredIdx.length)
  private val zonesByCol: Map[Int, Array[ZoneRange]] = zones.groupBy(_.colIdx)

  private def readI32(): Int = {
    val b = new Array[Byte](4)
    in.readFully(b)
    pos += 4
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }

  private def readI64(): Long =
    (readI32().toLong & 0xffffffffL) | (readI32().toLong << 32)

  private def loadNextChunk(): Boolean = {
    if (pos >= fileLen) return false
    chunkRows = readI32()
    val nCols = { val b = in.read(); pos += 1; b }
    val types = new Array[Int](nCols)
    val lens = new Array[Int](nCols)
    var skipChunk = false
    var c = 0
    while (c < nCols) {
      types(c) = { val b = in.read(); pos += 1; b }
      lens(c) = readI32()
      if (version >= 2) {
        val hasZone = { val b = in.read(); pos += 1; b }
        val mn = readI64()
        val mx = readI64()
        if (hasZone == 1) zonesByCol.get(c).foreach { rs =>
          if (rs.exists(z => mx < z.lo || mn > z.hi)) skipChunk = true
        }
      }
      c += 1
    }
    if (skipChunk) {
      var total = 0L
      var k = 0
      while (k < nCols) { total += lens(k); k += 1 }
      in.seek(pos + total)
      pos += total
      chunksSkipped += 1
      chunkRows = 0
      rowIdx = 0
      decoded = null
      return true // caller loops for the next chunk
    }
    val wanted = requiredIdx.toSet
    decoded = new Array[AnyRef](requiredIdx.length)
    c = 0
    while (c < nCols) {
      if (wanted.contains(c)) {
        val blob = new Array[Byte](lens(c))
        in.readFully(blob)
        pos += lens(c)
        val out = requiredIdx.indexOf(c)
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
    rowIdx = 0
    true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emittedRows >= limit) return false // pushed (partial) limit
    while (rowIdx >= chunkRows || decoded == null) {
      if (!loadNextChunk()) return false
    }
    emittedRows += 1
    var o = 0
    while (o < requiredIdx.length) {
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

  override def close(): Unit = in.close()
}
