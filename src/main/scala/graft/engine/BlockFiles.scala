package graft.engine

import graft.codec.BtrConfig
import graft.format.{BtrManifest, ColumnMeta, CompressedPart, FileZone, ZoneAccumulator, ZoneIndex}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.graftshim.ConfShim
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets.UTF_8

/** Raw binary block files — the Spark analog of the reference's on-disk
  * blob layout (`column{i}_part{j}` + `metadata`,
  * /root/reference/src/btrblocks.rs:668-672): each Spark partition writes
  * ONE blob file `blocks/part-NNNNN` holding its chunks, each chunk framed
  * with per-column byte lengths so a reader can skip (prune) columns
  * without decoding them. Schema/stats live in the same JSON manifest.
  *
  * Frame layout per chunk (v5):
  *   [i32 numRows][u8 nCols][i32 headerCrc]
  *   [per col: u8 colType, i32 blobLen, i32 blobCrc, u8 zoneKind,
  *    zone payload, i32 nullCount, validity bitmap (⌈numRows/8⌉ bytes,
  *    present iff nullCount > 0; bit i set = row i NULL)]
  *   [col blobs…]
  * zoneKind: 0 = none; 1 = long [i64 min][i64 max]; 2 = double
  * [f64bits min][f64bits max]; 3 = string [u8 len][bytes][u8 len][bytes]
  * (UTF-8, each ≤ 64 bytes — longer extrema are dropped, not truncated);
  * v6 adds 4 = long [i64 min][i64 max][i64 sum] and 5 = double
  * [f64bits min][f64bits max][f64bits sum] — numeric zones carrying the
  * chunk's exact NON-NULL sum, so SUM(col) folds from headers exactly
  * like MIN/MAX/COUNT (current writers always emit 4/5 for numeric
  * zones; 1/2 remain readable from v3-v5 files).
  * With nulls present, zones cover the NON-NULL values only (null rows
  * store placeholders in the blob and can never satisfy a comparison).
  * The per-column zone maps let a reader skip whole chunks against pushed
  * range filters without touching their blobs — data skipping the
  * reference's scan lacks entirely (/root/reference/src/datafusion.rs:64-73).
  *
  * CHECKSUMS: blobCrc is CRC32C of that column's blob. v5 headerCrc is
  * CRC32C over the WHOLE frame header — numRows, nCols, and the per-column
  * meta section (zones + validity bitmaps) — closing the v4 gap where
  * numRows/nCols were unchecked and a bit flip in numRows could feed a
  * silently wrong COUNT(*) through the header-only aggregate reader
  * (round-4 advice #1; v4's crc starts after its own slot and covers only
  * the meta section). At 100 TB a flipped bit in a zone map would
  * silently SKIP matching chunks and a flipped blob byte would silently
  * corrupt decoded values — the CRCs turn both into a contextual error.
  * A reader verifies exactly what it touches: the header always, each blob
  * only when actually read (pruned/skipped bytes stay unread).
  *
  * v1 (no zones), v2 (int-only zones), v3 (typed zones, no CRC), v4
  * (CRC, no nulls, meta-only headerCrc) and v5 (nulls, no zone sums)
  * frames remain readable. File header: "BTRS" magic + u8 version.
  */
object BlockFiles {
  final val Magic = 0x53525442 // "BTRS" little-endian
  final val Version = 6

  /** One encoded chunk as a self-contained frame plus its stats — the unit
    * that the compressed range exchange shuffles (a frame is ~ratio×
    * smaller than the rows it encodes).
    */
  final case class Frame(bytes: Array[Byte], rawBytes: Long, encBytes: Long, numRows: Int)

  /** One block file's write result: totals plus the file-level zone fold
    * (None when any chunk lacked a zone for every column).
    */
  final case class BlockWriteStat(
      pid: Int, rawBytes: Long, encBytes: Long, numRows: Long,
      zones: Option[IndexedSeq[graft.format.ColZone]])

  /** Serialize one chunk's column parts into a v5 frame (CRC'd, nullable). */
  def frameChunk(chunkParts: Seq[CompressedPart]): Frame = {
    var rawBytes = 0L
    var encBytes = 0L
    var size = 4 + 1 + 4 // numRows, nCols, headerCrc
    val zones = new Array[Array[Byte]](chunkParts.length)
    var i = 0
    chunkParts.foreach { p =>
      zones(i) = zonePayload(p) // includes its leading zoneKind byte
      size += 1 + 4 + 4 + zones(i).length + 4 + p.bytes.length
      if (p.nullCount > 0) size += (p.numRows + 7) >> 3
      rawBytes += p.rawBytes
      encBytes += p.bytes.length
      i += 1
    }
    val out = new Array[Byte](size)
    var o = 0
    def u8(v: Int): Unit = { out(o) = v.toByte; o += 1 }
    def i32(v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
      out(o + 2) = (v >>> 16).toByte; out(o + 3) = (v >>> 24).toByte
      o += 4
    }
    val numRows = chunkParts.head.numRows
    i32(numRows)
    u8(chunkParts.length)
    val crcSlot = o
    i32(0) // headerCrc patched below
    val metaStart = o
    i = 0
    chunkParts.foreach { p =>
      u8(p.colType)
      i32(p.bytes.length)
      val bc = new java.util.zip.CRC32C
      bc.update(p.bytes)
      i32(bc.getValue.toInt)
      val z = zones(i)
      System.arraycopy(z, 0, out, o, z.length)
      o += z.length
      i32(p.nullCount)
      if (p.nullCount > 0) {
        val bm = p.nullBits
        val want = (numRows + 7) >> 3
        require(bm != null && bm.length == want,
          s"column ${p.colName}: nullCount=${p.nullCount} but bitmap is " +
            s"${if (bm == null) "absent" else s"${bm.length} bytes"} (want $want)")
        System.arraycopy(bm, 0, out, o, bm.length)
        o += bm.length
      }
      i += 1
    }
    // v5: headerCrc covers the frame from its first byte — numRows + nCols
    // + the whole meta section (v4 covered only the meta section, leaving
    // the COUNT(*) source unprotected)
    val hc = new java.util.zip.CRC32C
    hc.update(out, 0, 5)
    hc.update(out, metaStart, o - metaStart)
    val hv = hc.getValue.toInt
    out(crcSlot) = hv.toByte
    out(crcSlot + 1) = (hv >>> 8).toByte
    out(crcSlot + 2) = (hv >>> 16).toByte
    out(crcSlot + 3) = (hv >>> 24).toByte
    chunkParts.foreach { p =>
      System.arraycopy(p.bytes, 0, out, o, p.bytes.length)
      o += p.bytes.length
    }
    require(o == size, s"frame size mismatch: wrote $o of $size")
    Frame(out, rawBytes, encBytes, chunkParts.head.numRows)
  }

  /** [u8 zoneKind][payload] for one part (see frame doc above). */
  private def zonePayload(p: CompressedPart): Array[Byte] = {
    def longs(kind: Int, vs: Long*): Array[Byte] = {
      val b = new Array[Byte](1 + 8 * vs.length)
      b(0) = kind.toByte
      var o = 1
      vs.foreach { v0 =>
        var v = v0
        var k = 0
        while (k < 8) { b(o) = v.toByte; v >>>= 8; o += 1; k += 1 }
      }
      b
    }
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    (p.minLong, p.maxLong, p.minDouble, p.maxDouble, p.minStr, p.maxStr) match {
      case (Some(mn), Some(mx), _, _, _, _) =>
        // current encoders always carry the sum alongside a numeric zone;
        // the sum-less kinds stay writable for parts from older tables
        p.sumLong match {
          case Some(sm) => longs(4, mn, mx, sm)
          case None     => longs(1, mn, mx)
        }
      case (_, _, Some(mn), Some(mx), _, _) =>
        p.sumDouble match {
          case Some(sm) => longs(5, bits(mn), bits(mx), bits(sm))
          case None     => longs(2, bits(mn), bits(mx))
        }
      case (_, _, _, _, Some(mn), Some(mx)) =>
        val bn = mn.getBytes(UTF_8)
        val bx = mx.getBytes(UTF_8)
        if (bn.length > 64 || bx.length > 64) Array[Byte](0)
        else {
          val b = new Array[Byte](3 + bn.length + bx.length)
          b(0) = 3
          b(1) = bn.length.toByte
          System.arraycopy(bn, 0, b, 2, bn.length)
          b(2 + bn.length) = bx.length.toByte
          System.arraycopy(bx, 0, b, 3 + bn.length, bx.length)
          b
        }
      case _ => Array[Byte](0)
    }
  }

  /** Encode `df` and write raw block files + manifest to `dir`.
    *
    * `rangeCols` adds an explicit range exchange for locality. Two shapes:
    *  - `compressedExchange = false`: shuffle the RAW rows
    *    (repartitionByRange with a row-varying salt), then encode. Rows of
    *    one key range land in one chunk → tightest zone maps, best ratio.
    *  - `compressedExchange = true`: sort rows WITHIN each input partition,
    *    encode chunks map-side, then range-exchange the COMPRESSED frames
    *    on each chunk's first-row key. At ratio ~4× the shuffle moves ~4×
    *    fewer bytes — the bulk-ingest shape for a 100 TB run, where the
    *    exchange of raw strings (not the encode CPU) is the scaling
    *    bottleneck. Clustering is chunk-granular instead of row-granular.
    */
  def write(
      df: DataFrame,
      dir: String,
      cfg: BtrConfig = BtrConfig.default,
      rangeCols: Seq[String] = Nil,
      compressedExchange: Boolean = false,
      numPartitions: Int = 0): BtrManifest = {
    val spark = df.sparkSession
    val schema = df.schema
    require(schema.length <= 255,
      s"btr block frame stores the column count in one byte — ${schema.length} columns > 255")
    val colTypes = BtrEncoder.validateSchema(schema)
    val confB = ConfShim.broadcast(spark.sparkContext)
    val blocksDir = s"$dir/blocks"
    // clean target (including any stale zone index from a previous table)
    val p = new Path(blocksDir)
    val fs0 = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs0.exists(p)) fs0.delete(p, true)
    val staleIdx = new Path(dir, ZoneIndex.FileName)
    if (fs0.exists(staleIdx)) fs0.delete(staleIdx, false)
    fs0.mkdirs(p)

    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val stats: Array[BlockWriteStat] =
      if (rangeCols.nonEmpty && compressedExchange)
        writeCompressedExchange(df, blocksDir, cfg, rangeCols, n, confB)
      else {
        val prepared =
          if (rangeCols.isEmpty) df
          else {
            // row-varying salt (hash of ALL columns): a hot (repo, path)
            // key's rows spread across partitions instead of serializing
            // one task
            val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(16)))
            salted.repartitionByRange(n, (rangeCols.map(col) :+ col("__salt")): _*).drop("__salt")
          }
        prepared.queryExecution.toRdd.mapPartitions { rows =>
          if (rows.isEmpty) Iterator.empty
          else {
            val tc = TaskContext.get()
            val frames = new BtrEncoder.PartitionEncodeIterator(rows, schema, colTypes, cfg)
              .grouped(schema.length).map(frameChunk)
            Iterator.single(writeFrames(
              ConfShim.conf(confB), blocksDir, tc.partitionId(), tc.taskAttemptId(), frames))
          }
        }.collect()
      }

    // file-level zone index first, manifest (the publish marker) last
    val entries = stats.collect {
      case s if s.numRows > 0 && s.zones.isDefined => FileZone(f"part-${s.pid}%05d", s.zones.get)
    }
    if (entries.nonEmpty)
      ZoneIndex.write(spark.sparkContext.hadoopConfiguration, dir, entries.toSeq)

    val m = BtrManifest(
      columns = schema.fields.zip(colTypes).map { case (f, t) => ColumnMeta(f.name, t, f.nullable) }.toSeq,
      numPartitions = stats.length,
      blockSize = cfg.blockSize,
      maxCascadeDepth = cfg.maxCascadeDepth,
      numRows = stats.map(_.numRows).sum,
      rawBytes = stats.map(_.rawBytes).sum,
      encBytes = stats.map(_.encBytes).sum,
      completedPartitions = Seq(0))
    BtrTable.writeManifest(spark, dir, m)
    m
  }

  /** Map-side encode + compressed range exchange (see write() doc).
    *
    * Each chunk travels as ONE frame record keyed by an order-preserving
    * binary encoding of its first row's `rangeCols` values plus a per-chunk
    * round-robin salt byte (a hot key's chunks spread over 16 writers
    * instead of serializing one). The writer task just concatenates the
    * frames it receives — no re-encode, so the reduce side is pure
    * sequential IO.
    *
    * SINGLE-PASS (round-6, guide §2.4): range bounds come from a cheap
    * up-front stride-sample of ONLY the key columns (a few thousand rows
    * per input split, early-terminated), so the heavy encode runs exactly
    * once and its frames flow straight into the shuffle — the former
    * repartitionByRange needed a persist of every compressed frame
    * (~input/ratio bytes written to and re-read from the block-manager)
    * plus a full sampling pass over the persisted frames, two extra stage
    * barriers whose fixed cost capped 2->8-core scaling at ~0.67
    * (RangeProfile: 3.5 s of non-encode stages at 2 cores, 2.5 s at 8).
    * Bounds quality only affects file-size balance, never correctness:
    * every frame lands in exactly one partition whatever the bounds say.
    */
  private def writeCompressedExchange(
      df: DataFrame,
      blocksDir: String,
      cfg: BtrConfig,
      rangeCols: Seq[String],
      n: Int,
      confB: org.apache.spark.broadcast.Broadcast[ConfShim.SerConf]): Array[BlockWriteStat] = {
    // local sort: clusters each input split's rows by key before chunking,
    // so map-side chunks are key-coherent (ratio and zone quality close to
    // the row exchange) without shuffling a single raw byte
    val prepared = df.sortWithinPartitions(rangeCols.map(col): _*)
    val schema = prepared.schema
    val colTypes = BtrEncoder.validateSchema(schema)
    val keyIdx = rangeCols.map { c =>
      val i = schema.fieldNames.indexOf(c)
      require(i >= 0, s"range column '$c' not in schema")
      i
    }.toArray

    // Writer width stays the configured shuffle width: with chunk-granular
    // frames (~8 MB each here) MORE bins place the frames more evenly —
    // a measured 27-writer variant (one per ~48 MB of input) lost 0.8 s to
    // its straggler tail at 8 cores versus 64 small writers. File sizing
    // for the QUERY scratch tables is handled by the caller's
    // numPartitions; this pipeline's writer files are bulk-ingest output.

    // Bounds sample over the CHUNK-START key distribution, not the row
    // distribution: a frame's shuffle key is its sorted partition's
    // (chunkIdx × blockSize)-th smallest key, so with few chunks per
    // partition every frame key sits at its partition's minimum — row-
    // quantile bounds would send every frame to one writer (measured:
    // 753 MB into a single reduce task). Per input split this job scans
    // ONLY the key columns, keeps a deterministic stride sample, sorts it,
    // and emits the estimated key at each chunk-start quantile position
    // with that chunk's true round-robin salt — reproducing the (key,
    // salt) pairs the encode will emit. Byte-budget-closed chunks
    // (maxChunkBytes) make the estimate coarser; bounds quality only
    // affects file-size balance, never correctness. Every split is scanned:
    // with ~one chunk per split the emitted keys ARE the minimum viable
    // sample (a measured 16-of-96-split stride variant yielded duplicate
    // bounds, piled frames into few writers and lost ~0.8 s to the
    // straggler tail — more than the sampling saved).
    val keyDf = df.selectExpr(rangeCols: _*)
    val kTypes = BtrEncoder.validateSchema(keyDf.schema)
    val kIdx = Array.tabulate(rangeCols.length)(identity)
    val blockRows = cfg.blockSize
    val samples: Array[Array[Byte]] = keyDf.queryExecution.toRdd.mapPartitions { it =>
      val keys = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var stride = 1L
      var i = 0L
      while (it.hasNext) {
        val r = it.next()
        if (i % stride == 0) {
          keys += BtrEncoder.encodeRangeKey(r, kIdx, kTypes)
          if (keys.length >= 2048) { // halve (keeps a stride sample), double stride
            val kept = keys.zipWithIndex.collect { case (k, j) if j % 2 == 0 => k }
            keys.clear(); keys ++= kept
            stride *= 2
          }
        }
        i += 1
      }
      if (keys.isEmpty) Iterator.empty
      else {
        val sorted = keys.toArray.sortWith(java.util.Arrays.compareUnsigned(_, _) < 0)
        val nChunks = math.max(1L, (i + blockRows - 1) / blockRows)
        val emit = math.min(nChunks, 64L).toInt
        Iterator.tabulate(emit) { e =>
          val ci = e.toLong * nChunks / emit
          val pos = math.min(sorted.length - 1,
            (ci * blockRows * sorted.length / math.max(1L, i)).toInt)
          sorted(pos) :+ ((ci % 16).toByte)
        }
      }
    }.collect()
    val extended = samples.sortWith(java.util.Arrays.compareUnsigned(_, _) < 0)
    val bounds: Array[Array[Byte]] =
      if (extended.isEmpty) Array.empty
      else Array.tabulate(n - 1) { j => extended(((j + 1).toLong * extended.length / n).toInt) }
    val partitioner = new BinaryRangePartitioner(n, bounds)

    val keyed = prepared.queryExecution.toRdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val enc = new BtrEncoder.PartitionEncodeIterator(
          rows, schema, colTypes, cfg, keyIdx)
        enc.grouped(schema.length).zipWithIndex.map { case (chunkParts, ci) =>
          val f = frameChunk(chunkParts)
          // key captured from the chunk's FIRST row before its buffers were
          // reused (PartitionEncodeIterator.chunkKey)
          (enc.chunkKey(ci) :+ (ci % 16).toByte, (f.bytes, f.rawBytes, f.encBytes, f.numRows))
        }
      }
    }
    keyed.partitionBy(partitioner).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val tc = TaskContext.get()
        val fs = it.map { case (_, (bytes, raw, enc, rows)) => Frame(bytes, raw, enc, rows) }
        Iterator.single(writeFrames(
          ConfShim.conf(confB), blocksDir, tc.partitionId(), tc.taskAttemptId(), fs))
      }
    }.collect()
  }

  /** Range partitioner over the order-preserving binary keys
    * (BtrEncoder.encodeRangeKey): partition = count of bounds ≤ key under
    * unsigned-lexicographic order, found by binary search.
    */
  final class BinaryRangePartitioner(
      partitions: Int, bounds: Array[Array[Byte]]) extends org.apache.spark.Partitioner {
    require(bounds.length < partitions, s"${bounds.length} bounds for $partitions partitions")
    override def numPartitions: Int = partitions
    override def getPartition(key: Any): Int = {
      val k = key.asInstanceOf[Array[Byte]]
      var lo = 0
      var hi = bounds.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (java.util.Arrays.compareUnsigned(bounds(m), k) <= 0) lo = m + 1 else hi = m
      }
      lo
    }
  }

  /** Encode one partition's rows and write them as one block file (the raw
    * write path, also the unit-test entry for the task-commit semantics).
    */
  def writeOneBlockFile(
      conf: org.apache.hadoop.conf.Configuration,
      blocksDir: String,
      pid: Int,
      attemptId: Long,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      colTypes: Array[Int],
      cfg: BtrConfig): BlockWriteStat = {
    val frames = new BtrEncoder.PartitionEncodeIterator(rows, schema, colTypes, cfg)
      .grouped(schema.length).map(frameChunk)
    writeFrames(conf, blocksDir, pid, attemptId, frames)
  }

  /** One task attempt's block-file write (factored out so the retry
    * semantics are unit-testable without Spark's retry machinery).
    * Returns the stats + folded file-level zones of the bytes THIS attempt
    * encoded; the committed file is whichever attempt renamed first (same
    * deterministic content).
    */
  def writeFrames(
      conf: org.apache.hadoop.conf.Configuration,
      blocksDir: String,
      pid: Int,
      attemptId: Long,
      frames: Iterator[Frame]): BlockWriteStat = {
    val fs = new Path(blocksDir).getFileSystem(conf)
    val finalPath = new Path(blocksDir, f"part-$pid%05d")
    val tmpPath = new Path(blocksDir, f".tmp-part-$pid%05d-attempt-$attemptId")
    val out = fs.create(tmpPath, true)
    var rawBytes = 0L
    var encBytes = 0L
    var numRows = 0L
    val zoneAcc = new ZoneAccumulator
    var committed = false
    try {
      out.write(Array[Byte](
        (Magic & 0xff).toByte, ((Magic >>> 8) & 0xff).toByte,
        ((Magic >>> 16) & 0xff).toByte, ((Magic >>> 24) & 0xff).toByte,
        Version.toByte))
      frames.foreach { f =>
        out.write(f.bytes)
        zoneAcc.fold(f.bytes)
        rawBytes += f.rawBytes
        encBytes += f.encBytes
        numRows += f.numRows
      }
      out.close()
      committed = commitRename(conf, fs, tmpPath, finalPath)
      if (!committed)
        sys.error(s"could not commit $tmpPath -> $finalPath")
    } finally {
      try out.close() catch { case _: java.io.IOException => () }
      if (fs.exists(tmpPath)) fs.delete(tmpPath, false)
    }
    BlockWriteStat(pid, rawBytes, encBytes, numRows, zoneAcc.result())
  }

  /** Commit via rename-if-absent: FileContext's default rename FAILS when
    * the destination exists, so the first attempt wins (atomic on
    * HDFS-like stores, where plain FileSystem.rename-over-existing would
    * let a later speculative attempt replace a committed file). Schemes
    * without an AbstractFileSystem binding fall back to a checked rename;
    * the residual race there is local-FS only, where rename is an atomic
    * in-place replace of one complete valid encode by another and open
    * readers keep their inode. Returns true when a committed file exists
    * (whether from this attempt or an earlier winner).
    */
  def commitRename(
      conf: org.apache.hadoop.conf.Configuration,
      fs: org.apache.hadoop.fs.FileSystem,
      tmpPath: Path,
      finalPath: Path): Boolean =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(finalPath.toUri, conf)
      try { fc.rename(tmpPath, finalPath); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => true // other attempt won
      }
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // check-then-rename fallback: NOT atomic-if-absent. Flag it so a
        // deployment on a scheme lacking a FileContext binding notices
        // it is relying on rename-over-existing atomicity.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"no AbstractFileSystem for ${finalPath.toUri.getScheme}: " +
            "falling back to check-then-rename commit (requires atomic rename semantics)")
        if (fs.exists(finalPath)) true
        else fs.rename(tmpPath, finalPath) || fs.exists(finalPath)
    }
}
