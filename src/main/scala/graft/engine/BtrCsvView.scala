package graft.engine

import org.apache.spark.sql.{Row, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Random-access byte view over the CSV rendering of a btr table — the
  * reference's FUSE mount SEMANTICS re-expressed as a plain API instead of
  * an OS mount:
  *
  *  - S8 realtime (`/root/reference/src/mount/realtime_fs.rs:23-177`):
  *    `read(offset, size)` decompresses lazily through the streaming
  *    decode, keeps a bounded byte cache (`cacheLimit`, best-effort — a
  *    single read larger than the limit is still served whole, like the
  *    reference's range logic `:91-168`), and re-initializes the stream on
  *    a backward seek (`:101-112`); `size` is the optional precompute.
  *  - S7 one-shot (`oneshot_fs.rs:19-167`): `readAll()` materializes the
  *    whole rendering at once.
  *
  * Rendering is the `print-csv` text: one header line, comma-joined
  * values, '\n' terminators (btr columns are non-null by model, so no
  * null cases arise; values are NOT quoted — the byte-view contract is
  * positional, and parse-ability is only promised for values free of
  * ','/'\n', like the reference's plain renderer). Row order is the
  * deterministic decode order,
  * pulled ONE Spark partition at a time via toLocalIterator — driver
  * memory stays bounded by (one partition's rows) + cache, never the
  * table.
  */
final class BtrCsvView(spark: SparkSession, dir: String, cacheLimit: Int = 8 << 20) {
  private val df = BtrTable.load(spark, dir)
  private val headerBytes = (df.columns.mkString(",") + "\n").getBytes(UTF_8)

  // cache window: bytes [bufStart, bufStart + bufLen) of the rendering
  private var it: java.util.Iterator[Row] = _
  private var emitted = 0L // bytes rendered so far (== bufStart + bufLen)
  private var bufStart = 0L
  private var buf = new Array[Byte](math.max(cacheLimit, 1 << 16))
  private var bufLen = 0

  private var knownSize = -1L

  private def resetStream(): Unit = {
    it = df.toLocalIterator()
    emitted = 0L
    bufStart = 0L
    bufLen = 0
    append(headerBytes)
  }

  private def append(bytes: Array[Byte]): Unit = {
    if (bufLen + bytes.length > buf.length) {
      val grown = new Array[Byte](math.max(buf.length * 2, bufLen + bytes.length))
      System.arraycopy(buf, 0, grown, 0, bufLen)
      buf = grown
    }
    System.arraycopy(bytes, 0, buf, bufLen, bytes.length)
    bufLen += bytes.length
    emitted += bytes.length
  }

  private def renderRow(row: Row): Array[Byte] =
    (BtrCsv.renderRowCsv(row) + "\n").getBytes(UTF_8)

  /** Drop cache bytes before `keepFrom` once the window exceeds the cache
    * limit (best-effort bound: bytes at/after `keepFrom` are always kept).
    */
  private def evict(keepFrom: Long): Unit = {
    if (bufLen <= cacheLimit) return
    val dropTo = math.min(keepFrom, bufStart + bufLen - cacheLimit)
    val drop = (dropTo - bufStart).toInt
    if (drop > 0) {
      System.arraycopy(buf, drop, buf, 0, bufLen - drop)
      bufStart += drop
      bufLen -= drop
    }
  }

  /** Bytes [offset, offset+len) of the CSV rendering; shorter at EOF. */
  def read(offset: Long, len: Int): Array[Byte] = synchronized {
    require(offset >= 0 && len >= 0, s"bad range ($offset, $len)")
    if (it == null || offset < bufStart) resetStream() // backward seek
    val end = offset + len
    // && short-circuits: hasNext (which can launch the next partition's
    // collect job) is only probed while more bytes are actually needed
    while (emitted < end && it.hasNext) {
      append(renderRow(it.next()))
      evict(offset)
    }
    if (emitted < end && knownSize < 0) knownSize = emitted // loop ended on EOF
    val from = math.max(offset, bufStart)
    val to = math.min(end, bufStart + bufLen)
    if (to <= from) Array.emptyByteArray
    else java.util.Arrays.copyOfRange(buf, (from - bufStart).toInt, (to - bufStart).toInt)
  }

  /** Total rendered size (reference's optional size precompute: one full
    * streaming pass, nothing retained beyond the cache).
    */
  def size: Long = synchronized {
    if (knownSize < 0) {
      if (it == null) resetStream()
      while (it.hasNext) {
        append(renderRow(it.next()))
        evict(Long.MaxValue)
      }
      knownSize = emitted
    }
    knownSize
  }

  /** One-shot materialization (S7): the entire rendering as one array, in
    * a SINGLE decode pass (no eviction — unlike size() + read(0, n), which
    * would drop the prefix during the size drain and replay the stream).
    */
  def readAll(): Array[Byte] = synchronized {
    resetStream()
    while (it.hasNext) {
      append(renderRow(it.next()))
      require(emitted <= Int.MaxValue, s"one-shot view needs the whole rendering in memory")
    }
    knownSize = emitted
    java.util.Arrays.copyOf(buf, bufLen)
  }
}
