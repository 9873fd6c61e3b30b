package graft.sources

import graft.engine.BlockFiles
import org.apache.hadoop.fs.Path

/** Low-level streaming parser for one btr block file: validates the file
  * header, then yields per-chunk frame headers (row count, per-column types,
  * blob lengths, parsed zone maps) with the blobs consumed on demand.
  * Shared by the row/columnar data readers, the COUNT(*) reader, and the
  * min/max aggregate reader.
  *
  * Every read is wrapped with file + offset + chunk context: at 100 TB a
  * truncated or bit-flipped blob must name the bad block, not surface as a
  * bare EOFException from readFully (round-3 verdict #8).
  *
  * Zone kinds (see BlockFiles frame doc): 0 none, 1 long [i64,i64],
  * 2 double [f64bits,f64bits] (stored in the long fields), 3 string
  * [u8 len][bytes] x2, 4/5 the long/double zones plus a trailing exact
  * NON-NULL sum (v6; surfaced as zKind 1/2 + zHasSum/zSumBits). v1 frames
  * have no zones, v2 int-only zones; v5 adds per-column null counts +
  * validity bitmaps and extends the header CRC to cover numRows/nCols
  * (v4's covered only the meta section, so its header-only COUNT(*) path
  * trusts an unchecked numRows — a known, version-frozen limitation;
  * current writers emit v6).
  */
final class FrameReader(file: String, conf: org.apache.hadoop.conf.Configuration) {

  private val path = new Path(file)
  private val fs = path.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var pos = 0L
  private var chunkIndex = -1

  // ---- per-chunk state, valid after nextHeader() returns true
  var numRows = 0
  var nCols = 0
  var colType: Array[Int] = Array.empty
  var blobLen: Array[Int] = Array.empty
  var blobCrc: Array[Int] = Array.empty // v4 only
  var zKind: Array[Int] = Array.empty
  var zLongMin: Array[Long] = Array.empty // long zones; double zones as raw bits
  var zLongMax: Array[Long] = Array.empty
  var zStrMin: Array[Array[Byte]] = Array.empty
  var zStrMax: Array[Array[Byte]] = Array.empty
  // sum extension (v6 zone kinds 4/5): exact per-chunk NON-NULL sum.
  // Long sums directly; double sums as raw f64 bits. zHasSum false for
  // v1-v5 frames and zone-less columns — consumers fall back to decode.
  var zSumBits: Array[Long] = Array.empty
  var zHasSum: Array[Boolean] = Array.empty
  // null extension (v5): per-column null count + validity bitmap (bit i set
  // = row i NULL; null array slot when the column has no nulls). v1-v4
  // frames come from the null-rejecting encoder: always 0 / null.
  var nullCount: Array[Int] = Array.empty
  var nullBits: Array[Array[Byte]] = Array.empty
  private var nextBlob = 0

  /** Where the reader is, for errors and cross-layer context. */
  def where: String = s"$file (chunk #$chunkIndex)"

  /** The CURRENT chunk's zones as a ZoneCtx (valid after nextHeader()) —
    * the dispatch view compound predicates evaluate against.
    */
  val zoneCtx: ZoneCtx = new ZoneCtx {
    def nCols: Int = FrameReader.this.nCols
    def kind(c: Int): Int = zKind(c)
    def lmin(c: Int): Long = zLongMin(c)
    def lmax(c: Int): Long = zLongMax(c)
    def smin(c: Int): Array[Byte] = zStrMin(c)
    def smax(c: Int): Array[Byte] = zStrMax(c)
    def nullCount(c: Int): Long = FrameReader.this.nullCount(c)
    def rows(c: Int): Long = numRows
  }

  private def fail(msg: String, cause: Throwable = null): Nothing =
    throw new java.io.IOException(
      s"corrupt btr block file $file at offset $pos (chunk #$chunkIndex): $msg", cause)

  private def guarded[A](what: String)(f: => A): A =
    try f
    catch {
      case e: java.io.EOFException => fail(s"truncated while reading $what", e)
      case e: IllegalArgumentException => fail(s"$what: ${e.getMessage}", e)
      case e: IndexOutOfBoundsException => fail(s"$what: ${e.getMessage}", e)
    }

  // v4 header checksum: every meta byte read while `crcOn` feeds the CRC
  private val crc = new java.util.zip.CRC32C
  private var crcOn = false

  private def u8(what: String): Int = {
    val b = in.read()
    if (b < 0) fail(s"truncated while reading $what (end of file)")
    pos += 1
    if (crcOn) crc.update(b)
    b
  }

  private val b4 = new Array[Byte](4)
  private def i32(what: String): Int = guarded(what) {
    in.readFully(b4)
    pos += 4
    if (crcOn) crc.update(b4, 0, 4)
    (b4(0) & 0xff) | ((b4(1) & 0xff) << 8) | ((b4(2) & 0xff) << 16) | ((b4(3) & 0xff) << 24)
  }

  private def i64(what: String): Long =
    (i32(what).toLong & 0xffffffffL) | (i32(what).toLong << 32)

  val version: Int = {
    val hdr = new Array[Byte](5)
    guarded("file header")(in.readFully(hdr))
    val magic = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16) | ((hdr(3) & 0xff) << 24)
    if (magic != BlockFiles.Magic) fail(f"not a btr block file (magic 0x$magic%08x)")
    val v = hdr(4) & 0xff
    if (v < 1 || v > BlockFiles.Version) fail(s"unsupported btr block version $v")
    pos = 5
    v
  }

  /** Parse the next chunk's frame header. False at a clean end of file. */
  def nextHeader(): Boolean = {
    if (pos >= fileLen) return false
    chunkIndex += 1
    // v5: the CRC covers the WHOLE header (numRows + nCols + meta) — feed
    // it from the first byte. v4 covered only the meta section.
    if (version >= 5) { crc.reset(); crcOn = true }
    numRows = i32("chunk row count")
    if (numRows <= 0) fail(s"invalid chunk row count $numRows")
    nCols = u8("column count")
    if (nCols == 0) fail("zero columns in chunk")
    crcOn = false // the stored checksum never feeds itself
    val expectedHeaderCrc = if (version >= 4) i32("header checksum") else 0
    if (colType.length < nCols) {
      colType = new Array[Int](nCols)
      blobLen = new Array[Int](nCols)
      blobCrc = new Array[Int](nCols)
      zKind = new Array[Int](nCols)
      zLongMin = new Array[Long](nCols)
      zLongMax = new Array[Long](nCols)
      zStrMin = new Array[Array[Byte]](nCols)
      zStrMax = new Array[Array[Byte]](nCols)
      zSumBits = new Array[Long](nCols)
      zHasSum = new Array[Boolean](nCols)
      nullCount = new Array[Int](nCols)
      nullBits = new Array[Array[Byte]](nCols)
    }
    if (version == 4) crc.reset() // v5's crc already holds numRows+nCols
    if (version >= 4) crcOn = true
    var blobs = 0L
    var c = 0
    while (c < nCols) {
      colType(c) = u8(s"column $c type")
      zHasSum(c) = false // arrays are reused across chunks
      blobLen(c) = i32(s"column $c blob length")
      if (blobLen(c) < 0) fail(s"negative blob length ${blobLen(c)} for column $c")
      if (version >= 4) blobCrc(c) = i32(s"column $c blob checksum")
      blobs += blobLen(c)
      version match {
        case 1 => zKind(c) = 0
        case 2 =>
          val hz = u8(s"column $c zone flag")
          val mn = i64(s"column $c zone min")
          val mx = i64(s"column $c zone max")
          if (hz == 1) { zKind(c) = 1; zLongMin(c) = mn; zLongMax(c) = mx }
          else zKind(c) = 0
        case _ =>
          u8(s"column $c zone kind") match {
            case 0 => zKind(c) = 0
            case k @ (1 | 2) =>
              zKind(c) = k
              zLongMin(c) = i64(s"column $c zone min")
              zLongMax(c) = i64(s"column $c zone max")
            case k @ (4 | 5) =>
              // v6 sum-carrying numeric zone: presents to predicates as the
              // plain long/double kind, the sum rides alongside
              zKind(c) = k - 3
              zLongMin(c) = i64(s"column $c zone min")
              zLongMax(c) = i64(s"column $c zone max")
              zSumBits(c) = i64(s"column $c zone sum")
              zHasSum(c) = true
            case 3 =>
              zKind(c) = 3
              val mn = new Array[Byte](u8(s"column $c zone min length"))
              guarded(s"column $c zone min")(in.readFully(mn)); pos += mn.length
              if (crcOn) crc.update(mn)
              val mx = new Array[Byte](u8(s"column $c zone max length"))
              guarded(s"column $c zone max")(in.readFully(mx)); pos += mx.length
              if (crcOn) crc.update(mx)
              zStrMin(c) = mn
              zStrMax(c) = mx
            case k => fail(s"bad zoneKind $k for column $c")
          }
      }
      if (version >= 5) {
        nullCount(c) = i32(s"column $c null count")
        if (nullCount(c) < 0 || nullCount(c) > numRows)
          fail(s"invalid null count ${nullCount(c)} for column $c ($numRows rows)")
        if (nullCount(c) > 0) {
          val bm = new Array[Byte]((numRows + 7) >> 3)
          guarded(s"column $c validity bitmap")(in.readFully(bm)); pos += bm.length
          if (crcOn) crc.update(bm)
          nullBits(c) = bm
        } else nullBits(c) = null
      } else { nullCount(c) = 0; nullBits(c) = null }
      c += 1
    }
    if (version >= 4) {
      crcOn = false
      if (crc.getValue.toInt != expectedHeaderCrc)
        fail(f"frame header checksum mismatch (stored 0x$expectedHeaderCrc%08x, computed 0x${crc.getValue.toInt}%08x) — corrupt zone maps or column meta")
    }
    // catch truncation before any blob read: the declared blob bytes must
    // fit in the file
    if (pos + blobs > fileLen)
      fail(s"chunk blobs ($blobs bytes) extend past end of file ($fileLen)")
    nextBlob = 0
    true
  }

  /** Read column `c`'s blob; preceding unread blobs are seeked over without
    * touching memory. Columns must be requested in ascending order. v4
    * blobs are checksum-verified — a silent bit flip becomes a named error.
    */
  def readBlob(c: Int): Array[Byte] = {
    require(c >= nextBlob && c < nCols, s"blob $c out of order (next=$nextBlob, nCols=$nCols)")
    var skip = 0L
    var k = nextBlob
    while (k < c) { skip += blobLen(k); k += 1 }
    if (skip > 0) { guarded(s"seek past columns $nextBlob..${c - 1}")(in.seek(pos + skip)); pos += skip }
    val b = new Array[Byte](blobLen(c))
    guarded(s"column $c blob (${blobLen(c)} bytes)")(in.readFully(b))
    pos += blobLen(c)
    nextBlob = c + 1
    if (version >= 4) {
      val bc = new java.util.zip.CRC32C
      bc.update(b)
      if (bc.getValue.toInt != blobCrc(c))
        fail(f"column $c blob checksum mismatch (stored 0x${blobCrc(c)}%08x, computed 0x${bc.getValue.toInt}%08x) — corrupt data")
    }
    b
  }

  /** Skip all remaining unread blobs of the current chunk. */
  def finishChunk(): Unit = {
    var skip = 0L
    var k = nextBlob
    while (k < nCols) { skip += blobLen(k); k += 1 }
    if (skip > 0) { guarded("seek past remaining blobs")(in.seek(pos + skip)); pos += skip }
    nextBlob = nCols
  }

  def close(): Unit = in.close()
}
