package graft.engine

import graft.codec.{BufReader, ColType, DoubleCodec, IntCodec, StringCodec}
import graft.format.{BtrManifest, ColumnMeta, CompressedPart}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8

/** Distributed decode: Dataset[CompressedPart] → DataFrame.
  *
  * The reference decodes per column part (decompress_column_part_*,
  * /root/reference/src/btrblocks.rs:716-730) and zips columns back into
  * row batches in its chunked stream
  * (/root/reference/src/stream/chunked_decompression.rs:103-143). Here the
  * same row-group reassembly is a groupByKey on (partitionId, chunkIdx):
  * one shuffle of *compressed* bytes (≈ratio× smaller than the data), then
  * each task decodes all columns of its chunk and emits rows — bounded
  * memory per task = one chunk, decode parallelism = number of chunks.
  *
  * Column pruning: pass `columns` — the filter on colIdx is pushed into the
  * parquet scan of the parts dataset, so unselected columns' bytes are
  * never read (the reference's scan reads everything:
  * /root/reference/src/datafusion.rs:64-73 ignores projection).
  */
object BtrDecoder {

  def sparkType(colType: Int): DataType = colType match {
    case ColType.Integer => IntegerType
    case ColType.Double  => DoubleType
    case ColType.String  => StringType
  }

  /** Decode whole parts back into typed column values (single part). */
  def decodePartValues(p: CompressedPart): AnyRef = p.colType match {
    case ColType.Integer => IntCodec.decode(new BufReader(p.bytes))
    case ColType.Double  => DoubleCodec.decode(new BufReader(p.bytes))
    case ColType.String  => StringCodec.decode(new BufReader(p.bytes))
  }

  def decode(
      parts: Dataset[CompressedPart],
      columns: Seq[ColumnMeta]): DataFrame = {
    val outSchema = StructType(
      columns.map(c => StructField(c.name, sparkType(c.colType), nullable = false)))
    val wantedNames = columns.map(_.name)
    val spark = parts.sparkSession
    import spark.implicits._
    val nameToOut: Map[String, Int] = wantedNames.zipWithIndex.toMap
    val colTypes = columns.map(_.colType).toArray
    implicit val rowEnc = Encoders.row(outSchema)
    parts
      .filter($"colName".isin(wantedNames: _*))
      .groupByKey(p => (p.partitionId, p.chunkIdx))
      .flatMapGroups { (_, it) =>
        val chunkParts = it.toArray
        val numRows = chunkParts(0).numRows
        val nOut = colTypes.length
        val decodedInts = new Array[Array[Int]](nOut)
        val decodedDbls = new Array[Array[Double]](nOut)
        val decodedStrs = new Array[Array[Array[Byte]]](nOut)
        chunkParts.foreach { p =>
          val o = nameToOut(p.colName)
          p.colType match {
            case ColType.Integer => decodedInts(o) = IntCodec.decode(new BufReader(p.bytes))
            case ColType.Double  => decodedDbls(o) = DoubleCodec.decode(new BufReader(p.bytes))
            case ColType.String  => decodedStrs(o) = StringCodec.decode(new BufReader(p.bytes))
          }
        }
        (0 until numRows).iterator.map { r =>
          val vals = new Array[Any](nOut)
          var c = 0
          while (c < nOut) {
            vals(c) = colTypes(c) match {
              case ColType.Integer => decodedInts(c)(r)
              case ColType.Double  => decodedDbls(c)(r)
              case ColType.String  => new String(decodedStrs(c)(r), UTF_8)
            }
            c += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
  }

  /** Load + decode a btr directory, optionally projecting columns. */
  def load(spark: SparkSession, dir: String, columns: Seq[String] = Nil): DataFrame = {
    val manifest = BtrTable.readManifest(spark, dir)
    val selected =
      if (columns.isEmpty) manifest.columns
      else {
        val byName = manifest.columns.map(c => c.name -> c).toMap
        columns.map(n =>
          byName.getOrElse(n, throw new IllegalArgumentException(s"no column '$n' in $dir")))
      }
    import spark.implicits._
    val parts = spark.read.parquet(s"$dir/parts").as[CompressedPart]
    decode(parts, selected)
  }
}
