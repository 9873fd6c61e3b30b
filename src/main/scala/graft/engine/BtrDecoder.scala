package graft.engine

import graft.codec.{BufReader, ColType, DoubleCodec, IntCodec, StringCodec}
import graft.format.{BtrManifest, ColumnMeta, CompressedPart}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.DataFrameShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed decode: Dataset[CompressedPart] → DataFrame.
  *
  * The reference decodes per column part (decompress_column_part_*,
  * /root/reference/src/btrblocks.rs:716-730) and zips columns back into
  * row batches in its chunked stream
  * (/root/reference/src/stream/chunked_decompression.rs:103-143). Here the
  * same row-group reassembly is a repartition on (partitionId, chunkIdx) +
  * sortWithinPartitions: one shuffle of *compressed* bytes (≈ratio× smaller
  * than the data), then each task streams its chunks in key order, decodes
  * all columns of a chunk and emits rows — bounded memory per task = one
  * chunk, decode parallelism = shuffle partitions.
  *
  * The whole path stays on InternalRow (UTF8String.fromBytes straight from
  * the codec buffers) — decoding through external Rows would re-transcode
  * every string UTF-8→UTF-16→UTF-8, exactly the 2× CPU the encoder's
  * InternalRow ingestion avoids (BtrEncoder.scala).
  *
  * Column pruning: pass `columns` — the filter on colName is pushed into the
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

  /** One decoded chunk streaming its rows into a reused InternalRow.
    * `nullBits(c)` (bit i set = row i NULL) masks the placeholder values
    * the encoder stored at null positions; null slot = no nulls.
    */
  private final class ChunkRows(
      decoded: Array[AnyRef],
      nullBits: Array[Array[Byte]],
      numRows: Int) extends Iterator[InternalRow] {
    private val nOut = decoded.length
    private val row = new GenericInternalRow(nOut)
    private var r = 0
    override def hasNext: Boolean = r < numRows
    override def next(): InternalRow = {
      var c = 0
      while (c < nOut) {
        val nb = nullBits(c)
        if (nb != null && ((nb(r >> 3) >> (r & 7)) & 1) == 1)
          row.update(c, null)
        else
          row.update(c, decoded(c) match {
            case a: Array[Int]                  => a(r)
            case a: Array[Double]               => a(r)
            case d: graft.codec.DecodedStrings  => UTF8String.fromBytes(d.data, d.starts(r), d.lens(r))
          })
        c += 1
      }
      r += 1
      row
    }
  }

  /** Groups key-sorted part rows into chunks, decodes, streams rows. Input
    * row layout (fixed by the select in decode):
    * 0=partitionId 1=chunkIdx 2=colName 3=colType 4=numRows 5=bytes
    * 6=nullCount 7=nullBits.
    */
  private final class DecodeIterator(
      it: Iterator[InternalRow],
      nameToOut: Map[String, Int],
      nOut: Int) extends Iterator[InternalRow] {
    private var current: Iterator[InternalRow] = Iterator.empty
    private var pendingKey = -1L
    private var pendingParts: Array[(Int, Int, Array[Byte], Array[Byte])] = null // (out, type, bytes, nullBits)
    private var pendingRows = 0
    private var pendingCount = 0

    private def stash(r: InternalRow): Unit = {
      val name = r.getUTF8String(2).toString
      val out = nameToOut.getOrElse(name, -1)
      if (out >= 0) {
        val bits = if (r.getInt(6) > 0 && !r.isNullAt(7)) r.getBinary(7) else null
        pendingParts(out) = (out, r.getInt(3), r.getBinary(5), bits)
        pendingCount += 1
      }
      pendingRows = r.getInt(4)
    }

    private def buildChunk(): Iterator[InternalRow] = {
      // completeness fail-fast: a corrupt/partial parts dir surfaces as a
      // clear per-chunk error instead of a null decode downstream
      require(pendingCount == nOut,
        s"chunk (partition ${(pendingKey >> 32).toInt}, chunk ${pendingKey.toInt}) has " +
          s"$pendingCount of $nOut selected column parts — parts dir incomplete or duplicated")
      val decoded = new Array[AnyRef](nOut)
      val nullBits = new Array[Array[Byte]](nOut)
      var i = 0
      while (i < nOut) {
        val p = pendingParts(i)
        require(p != null, s"missing column part $i for chunk key $pendingKey")
        decoded(i) = p._2 match {
          case ColType.Integer => IntCodec.decode(new BufReader(p._3))
          case ColType.Double  => DoubleCodec.decode(new BufReader(p._3))
          case ColType.String  => StringCodec.decodeSlices(new BufReader(p._3))
        }
        nullBits(i) = p._4
        i += 1
      }
      val rows = pendingRows
      pendingParts = null
      pendingCount = 0
      new ChunkRows(decoded, nullBits, rows)
    }

    override def hasNext: Boolean = current.hasNext || pendingParts != null || it.hasNext

    override def next(): InternalRow = {
      while (!current.hasNext) {
        if (pendingParts == null) {
          val r = it.next()
          pendingKey = (r.getInt(0).toLong << 32) | (r.getInt(1).toLong & 0xffffffffL)
          pendingParts = new Array[(Int, Int, Array[Byte], Array[Byte])](nOut)
          stash(r)
        }
        var chunkDone = false
        while (!chunkDone && it.hasNext) {
          val r = it.next()
          val key = (r.getInt(0).toLong << 32) | (r.getInt(1).toLong & 0xffffffffL)
          if (key == pendingKey) stash(r)
          else {
            // sorted input: a new key closes the current chunk
            val finished = buildChunk()
            pendingKey = key
            pendingParts = new Array[(Int, Int, Array[Byte], Array[Byte])](nOut)
            stash(r)
            current = finished
            chunkDone = true
          }
        }
        if (!chunkDone) current = buildChunk() // input exhausted
      }
      current.next()
    }
  }

  /** Scale-adaptive decode parallelism (guide §2): partitions derived from
    * the table's compressed size (one partition per ~`spark.graft.
    * decodePartitionBytes`, default 64 MB), clamped to [1, shuffle
    * partitions]. A 2 MB table no longer fans out into 32 near-empty
    * shuffle partitions (32 tasks + 32 sequential toLocalIterator jobs in
    * the CSV view); a 100 TB table still gets the full configured width.
    */
  def advisoryPartitions(spark: SparkSession, encBytes: Long): Int = {
    val target = spark.conf.getOption("spark.graft.decodePartitionBytes")
      .map(_.toLong).getOrElse(64L << 20)
    val max = spark.sessionState.conf.numShufflePartitions
    math.max(1, math.min(max, ((encBytes + target - 1) / target).toInt))
  }

  def decode(
      parts: Dataset[CompressedPart],
      columns: Seq[ColumnMeta],
      advisory: Int = 0): DataFrame = {
    val outSchema = StructType(
      columns.map(c => StructField(c.name, sparkType(c.colType), nullable = c.nullable)))
    val wantedNames = columns.map(_.name)
    val spark = parts.sparkSession
    val nameToOut: Map[String, Int] = wantedNames.zipWithIndex.toMap
    val nOut = columns.length
    val n = if (advisory > 0) advisory else spark.sessionState.conf.numShufflePartitions
    val slim = parts.toDF()
      .filter(col("colName").isin(wantedNames: _*))
      .select("partitionId", "chunkIdx", "colName", "colType", "numRows", "bytes",
        "nullCount", "nullBits")
      .repartition(n, col("partitionId"), col("chunkIdx"))
      .sortWithinPartitions("partitionId", "chunkIdx")
    val rdd = slim.queryExecution.toRdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else new DecodeIterator(it, nameToOut, nOut)
    }
    DataFrameShim.internalCreateDataFrame(spark, rdd, outSchema)
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
    decode(BtrTable.parts(spark, dir), selected,
      advisoryPartitions(spark, manifest.encBytes))
  }
}
