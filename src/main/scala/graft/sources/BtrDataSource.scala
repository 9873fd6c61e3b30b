package graft.sources

import graft.codec._
import graft.engine.{BlockFiles, BtrDecoder, BtrTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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
  * it: one InputPartition per block file (parallel scan) and column
  * pruning that SKIPS pruned columns' bytes entirely (the per-chunk frame
  * stores each column's blob length).
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

class BtrScanBuilder(dir: String, fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve file column order for the positional frame decode
    val wanted = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => wanted.contains(f.name)))
  }

  override def build(): Scan = new BtrScan(dir, fullSchema, required)
}

class BtrScan(dir: String, fullSchema: StructType, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BtrScan(dir=$dir, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val blocks = new Path(s"$dir/blocks")
    val fs = blocks.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(blocks)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map(st => BtrInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val confB = ConfShim.broadcast(spark.sparkContext)
    val colIdx = required.fieldNames.map(n => fullSchema.fieldIndex(n))
    val colTypes = fullSchema.fields.map(f =>
      graft.engine.BtrEncoder.supportedType(f.dataType).get)
    BtrReaderFactory(confB, colIdx, colTypes)
  }
}

case class BtrInputPartition(file: String) extends InputPartition

case class BtrReaderFactory(
    confB: org.apache.spark.broadcast.Broadcast[ConfShim.SerConf],
    requiredIdx: Array[Int],
    colTypes: Array[Int])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BtrPartitionReader(
      partition.asInstanceOf[BtrInputPartition].file, ConfShim.conf(confB), requiredIdx, colTypes)
}

/** Streams one block file chunk-by-chunk (bounded memory — the reference's
  * ChunkedDecompressionStream semantics, pull-based). Pruned columns'
  * blobs are skipped via their frame lengths without decoding.
  */
class BtrPartitionReader(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    requiredIdx: Array[Int],
    colTypes: Array[Int])
  extends PartitionReader[InternalRow] {

  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var pos = 0L

  locally {
    val hdr = new Array[Byte](5)
    in.readFully(hdr)
    val magic = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
    require(magic == BlockFiles.Magic, s"not a btr block file: $file")
    pos = 5
  }

  // current chunk decoded columns (only required ones), row cursor
  private var decoded: Array[AnyRef] = _
  private var chunkRows = 0
  private var rowIdx = 0
  private val row = new GenericInternalRow(requiredIdx.length)

  private def readI32(): Int = {
    val b = new Array[Byte](4)
    in.readFully(b)
    pos += 4
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }

  private def loadNextChunk(): Boolean = {
    if (pos >= fileLen) return false
    chunkRows = readI32()
    val nCols = { val b = in.read(); pos += 1; b }
    val types = new Array[Int](nCols)
    val lens = new Array[Int](nCols)
    var c = 0
    while (c < nCols) {
      types(c) = { val b = in.read(); pos += 1; b }
      lens(c) = readI32()
      c += 1
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
          case t if t == ColType.String.toInt  => StringCodec.decode(blob)
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
    while (rowIdx >= chunkRows) {
      if (!loadNextChunk()) return false
    }
    var o = 0
    while (o < requiredIdx.length) {
      row.update(o, decoded(o) match {
        case a: Array[Int]         => a(rowIdx)
        case a: Array[Double]      => a(rowIdx)
        case a: Array[Array[Byte]] => UTF8String.fromBytes(a(rowIdx))
      })
      o += 1
    }
    rowIdx += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}
