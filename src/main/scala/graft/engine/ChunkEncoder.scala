package graft.engine

import graft.codec._
import graft.format.CompressedPart
import java.nio.charset.StandardCharsets.UTF_8

/** Per-chunk column encoders: one typed column chunk → one CompressedPart.
  * Pure per-task logic (no Spark classes) so it runs identically inside
  * mapPartitions and in unit tests — the Spark analog of the reference's
  * in-memory Datablock compress (/root/reference/src/btrblocks.rs:299-326).
  */
object ChunkEncoder {

  /** Null bookkeeping for one encoded chunk: word bitmap → byte bitmap
    * (bit i set = row i NULL; null when the chunk has no nulls). Nulls
    * store a placeholder in the value blob (0 / 0.0 / "") — cheap under
    * every codec — and are masked back to NULL on decode.
    */
  private def bitmapBytes(nullWords: Array[Long], nullCount: Int, len: Int): Array[Byte] =
    if (nullCount == 0) null
    else {
      val b = new Array[Byte]((len + 7) >> 3)
      var i = 0
      while (i < b.length) {
        b(i) = (nullWords(i >> 3) >>> ((i & 7) << 3)).toByte
        i += 1
      }
      b
    }

  @inline private def isNull(nullWords: Array[Long], i: Int): Boolean =
    nullWords != null && ((nullWords(i >> 6) >>> (i & 63)) & 1L) == 1L

  def encodeInt(
      partitionId: Int, chunkIdx: Int, firstRow: Long,
      colIdx: Int, colName: String,
      v: Array[Int], len: Int, cfg: BtrConfig,
      nullWords: Array[Long] = null, nullCount: Int = 0): CompressedPart = {
    val out = new BufWriter(len * 2 + 64)
    IntCodec.encode(out, v, 0, len, cfg.maxCascadeDepth, cfg)
    val bytes = out.result()
    // zone extrema + sum over NON-NULL values only (null rows hold
    // placeholders); the i64 sum is exact (<= 2^16 rows x 32-bit values)
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var sm = 0L
    var i = 0
    while (i < len) {
      if (!isNull(nullWords, i)) {
        if (v(i) < mn) mn = v(i)
        if (v(i) > mx) mx = v(i)
        sm += v(i)
      }
      i += 1
    }
    val hasRange = nullCount < len && len > 0
    CompressedPart(
      partitionId, chunkIdx, firstRow, len, colIdx, colName, ColType.Integer,
      IntCodec.describe(new BufReader(bytes)), 4L * len, bytes.length, bytes,
      if (hasRange) Some(mn) else None, if (hasRange) Some(mx) else None,
      None, None, None, None,
      nullCount, bitmapBytes(nullWords, nullCount, len),
      sumLong = if (hasRange) Some(sm) else None)
  }

  def encodeDouble(
      partitionId: Int, chunkIdx: Int, firstRow: Long,
      colIdx: Int, colName: String,
      v: Array[Double], len: Int, cfg: BtrConfig,
      nullWords: Array[Long] = null, nullCount: Int = 0): CompressedPart = {
    val out = new BufWriter(len * 4 + 64)
    DoubleCodec.encode(out, v, 0, len, cfg.maxCascadeDepth, cfg)
    val bytes = out.result()
    // total-order extrema (java.lang.Double.compare): IEEE < treats
    // -0.0 == 0.0, which would store a zone min of 0.0 for a chunk holding
    // -0.0 — pruning wouldn't care (they compare equal) but the MIN/MAX
    // aggregate pushdown reads zones as exact under Spark's total order,
    // where -0.0 < 0.0. Non-null values only.
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var sm = 0.0
    var sawNaN = false
    var i = 0
    while (i < len) {
      if (!isNull(nullWords, i)) {
        val x = v(i)
        if (x.isNaN) sawNaN = true
        else {
          if (java.lang.Double.compare(x, mn) < 0) mn = x
          if (java.lang.Double.compare(x, mx) > 0) mx = x
          sm += x
        }
      }
      i += 1
    }
    val hasRange = len > 0 && !sawNaN && nullCount < len && mn <= mx
    CompressedPart(
      partitionId, chunkIdx, firstRow, len, colIdx, colName, ColType.Double,
      DoubleCodec.describe(new BufReader(bytes)), 8L * len, bytes.length, bytes,
      None, None,
      if (hasRange) Some(mn) else None, if (hasRange) Some(mx) else None,
      None, None,
      nullCount, bitmapBytes(nullWords, nullCount, len),
      sumDouble = if (hasRange) Some(sm) else None)
  }

  /** Arena-based string chunk encode (the engine's hot path). */
  def encodeStringSlices(
      partitionId: Int, chunkIdx: Int, firstRow: Long,
      colIdx: Int, colName: String,
      s: StrSlices, cfg: BtrConfig,
      nullWords: Array[Long] = null, nullCount: Int = 0): CompressedPart = {
    val len = s.count
    val raw = s.totalBytes
    val out = new BufWriter(math.min(raw, Int.MaxValue / 2).toInt / 2 + 256)
    StringCodec.encodeSlices(out, s, cfg.maxCascadeDepth, cfg)
    val bytes = out.result()
    var mn = -1
    var mx = -1
    var i = 0
    while (i < len) {
      if (!isNull(nullWords, i)) {
        if (mn < 0 || s.sliceCompare(i, mn) < 0) mn = i
        if (mx < 0 || s.sliceCompare(i, mx) > 0) mx = i
      }
      i += 1
    }
    val (minS, maxS) = coherentPair(
      if (mn >= 0 && s.len(mn) <= 64 && s.len(mx) <= 64)
        (utf8Faithful(s.copy(mn)), utf8Faithful(s.copy(mx)))
      else (None, None))
    CompressedPart(
      partitionId, chunkIdx, firstRow, len, colIdx, colName, ColType.String,
      StringCodec.describeBlock(bytes), raw, bytes.length, bytes,
      None, None, None, None, minS, maxS,
      nullCount, bitmapBytes(nullWords, nullCount, len))
  }

  /** A zone is a PAIR: if either extremum is unfaithful, drop both. Readers
    * already treat a half-null zone conservatively, but persisting (None,
    * Some(max)) was an incoherent zone (round-3 advice).
    */
  private def coherentPair(p: (Option[String], Option[String])): (Option[String], Option[String]) =
    if (p._1.isEmpty || p._2.isEmpty) (None, None) else p

  /** Zone extrema travel as java Strings (parquet/manifest-friendly), but
    * UTF8String values need not be valid UTF-8 — a lossy transcode
    * (invalid sequences → U+FFFD) would store a zone that no longer bounds
    * the column and silently skip matching chunks. Keep the zone only when
    * the bytes round-trip exactly; drop it (conservative: never skip)
    * otherwise.
    */
  private def utf8Faithful(b: Array[Byte]): Option[String] = {
    val s = new String(b, UTF_8)
    if (java.util.Arrays.equals(s.getBytes(UTF_8), b)) Some(s) else None
  }

  def encodeString(
      partitionId: Int, chunkIdx: Int, firstRow: Long,
      colIdx: Int, colName: String,
      v: Array[Array[Byte]], len: Int, cfg: BtrConfig): CompressedPart = {
    var raw = 0L
    var i = 0
    while (i < len) { raw += v(i).length; i += 1 }
    val out = new BufWriter(math.min(raw, Int.MaxValue / 2).toInt / 2 + 256)
    StringCodec.encode(out, v, 0, len, cfg.maxCascadeDepth, cfg)
    val bytes = out.result()
    // zone map only when min/max are short enough to store faithfully
    var mn: Array[Byte] = null
    var mx: Array[Byte] = null
    i = 0
    while (i < len) {
      if (mn == null || java.util.Arrays.compareUnsigned(v(i), mn) < 0) mn = v(i)
      if (mx == null || java.util.Arrays.compareUnsigned(v(i), mx) > 0) mx = v(i)
      i += 1
    }
    val (minS, maxS) = coherentPair(
      if (len > 0 && mn.length <= 64 && mx.length <= 64)
        (utf8Faithful(mn), utf8Faithful(mx))
      else (None, None))
    CompressedPart(
      partitionId, chunkIdx, firstRow, len, colIdx, colName, ColType.String,
      StringCodec.describeBlock(bytes), raw, bytes.length, bytes,
      None, None, None, None, minS, maxS)
  }
}
