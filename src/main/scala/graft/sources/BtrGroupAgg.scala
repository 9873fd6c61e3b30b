package graft.sources

import graft.codec._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String

/** Min/max/sum fold helpers shared by the grouped and ungrouped aggregate
  * readers. Orderings are Spark's SQL semantics: ints as ints, doubles via
  * Double.compare (NaN greatest, -0.0 < 0.0), strings via unsigned UTF-8
  * byte comparison. Fold state slots are AnyRef (java.lang boxes / byte
  * arrays; null = no value yet — surfaces as SQL NULL).
  */
private[sources] object AggFolds {

  def foldLong(acc: Array[AnyRef], s: Int, v: Long, isMin: Boolean): Unit = {
    // int columns: zone longs always fit the column's Int values
    val cur = acc(s).asInstanceOf[java.lang.Integer]
    val vi = v.toInt
    if (cur == null || (if (isMin) vi < cur else vi > cur)) acc(s) = Int.box(vi)
  }

  def foldDouble(acc: Array[AnyRef], s: Int, v: Double, isMin: Boolean): Unit = {
    val cur = acc(s).asInstanceOf[java.lang.Double]
    val c = if (cur == null) 0 else java.lang.Double.compare(v, cur)
    if (cur == null || (if (isMin) c < 0 else c > 0)) acc(s) = Double.box(v)
  }

  def foldBytes(acc: Array[AnyRef], s: Int, v: Array[Byte], isMin: Boolean): Unit = {
    val cur = acc(s).asInstanceOf[Array[Byte]]
    val c = if (cur == null) 0 else java.util.Arrays.compareUnsigned(v, cur)
    if (cur == null || (if (isMin) c < 0 else c > 0)) acc(s) = v
  }

  /** Decode-fallback MIN/MAX fold for chunks without a usable zone (NaN,
    * long-string extrema, pre-v3 files): folds the column's live values.
    */
  def foldDecoded(where: String, acc: Array[AnyRef], s: Int, colType: Int,
      blob: Array[Byte], isMin: Boolean, nullBits: Array[Byte]): Unit = {
    @inline def live(i: Int): Boolean =
      nullBits == null || ((nullBits(i >> 3) >> (i & 7)) & 1) == 0
    colType match {
      case t if t == ColType.Integer.toInt =>
        val a = IntCodec.decode(blob)
        var i = 0
        while (i < a.length) { if (live(i)) foldLong(acc, s, a(i), isMin); i += 1 }
      case t if t == ColType.Double.toInt =>
        val a = DoubleCodec.decode(blob)
        var i = 0
        while (i < a.length) { if (live(i)) foldDouble(acc, s, a(i), isMin); i += 1 }
      case t if t == ColType.String.toInt =>
        val d = StringCodec.decodeSlices(new BufReader(blob))
        var i = 0
        while (i < d.count) { if (live(i)) foldBytes(acc, s, d.copy(i), isMin); i += 1 }
      case t =>
        // pre-CRC (v1-v3) files have no header checksum to catch a flipped
        // type byte — name the block instead of a bare MatchError
        throw new java.io.IOException(
          s"corrupt btr block file $where: unknown column type $t in aggregate fallback")
    }
  }

  /** Decode-fallback SUM fold for chunks without a header sum (pre-v6
    * files, NaN chunks): sums the column's live (non-null) values.
    */
  def sumDecoded(where: String, sumL: Array[Long], sumD: Array[Double], seen: Array[Boolean],
      s: Int, colType: Int, blob: Array[Byte], nullBits: Array[Byte]): Unit = {
    @inline def live(i: Int): Boolean =
      nullBits == null || ((nullBits(i >> 3) >> (i & 7)) & 1) == 0
    colType match {
      case t if t == ColType.Integer.toInt =>
        val a = IntCodec.decode(blob)
        var i = 0
        while (i < a.length) { if (live(i)) { sumL(s) += a(i); seen(s) = true }; i += 1 }
      case t if t == ColType.Double.toInt =>
        val a = DoubleCodec.decode(blob)
        var i = 0
        while (i < a.length) { if (live(i)) { sumD(s) += a(i); seen(s) = true }; i += 1 }
      case t => throw new java.io.IOException(
        s"corrupt btr block file $where: column type $t under SUM pushdown")
    }
  }
}

/** Grouped aggregate pushdown reader (partial): one block file's chunks
  * fold into per-group COUNT/COUNT(col)/MIN/MAX/SUM partials; Spark's
  * final HashAggregate merges partials across files (the scan declares
  * `supportCompletePushDown = false`).
  *
  * The scale shape is `SELECT day, count(*) … GROUP BY day` on a
  * day-clustered 100 TB table: a chunk whose group columns are CONSTANT
  * (zone min == max, or all-NULL) and whose filters all-match folds from
  * headers alone — zero blob decode — exactly like the ungrouped reader.
  * Only chunks spanning a group boundary (or partially matching a filter)
  * decode, and then only the filter+group+agg columns.
  *
  * MEMORY IS BOUNDED: partials accumulate in a combine map that flushes to
  * the output queue when it exceeds [[BtrGroupAggReader.FlushGroups]]
  * entries — high-cardinality grouping degrades to per-chunk partial rows
  * (what Spark's own map-side partial aggregation does under the same
  * pressure), never to an unbounded hash table.
  *
  * Group keys follow Spark's grouping semantics: NULL is a group; double
  * keys normalize -0.0 to 0.0 and all NaNs to one NaN (Spark normalizes
  * floating grouping keys the same way before hashing).
  */
object BtrGroupAggReader {
  final val FlushGroups = 1 << 16
}

class BtrGroupAggReader(
    file: String,
    conf: org.apache.hadoop.conf.Configuration,
    groupIdx: Array[Int],
    specs: Array[AggSpec],
    zones: Array[ZonePred] = Array.empty,
    exact: Array[ExactPred] = Array.empty)
  extends PartitionReader[InternalRow] {

  private val fr = new FrameReader(file, conf)
  private var chunksSkipped = 0L
  private var chunksTotal = 0L
  private var chunksHeaderOnly = 0L
  private var chunksDecoded = 0L

  /** Key = group values in query order (Integer / normalized Double /
    * UTF8String / null); array-content equality.
    */
  private final class GKey(val vs: Array[AnyRef]) {
    override val hashCode: Int = java.util.Arrays.hashCode(vs)
    override def equals(o: Any): Boolean = o match {
      case k: GKey => java.util.Arrays.equals(vs, k.vs)
      case _       => false
    }
  }

  private final class GState {
    var count = 0L
    val cnt = new Array[Long](specs.length)
    val sumL = new Array[Long](specs.length)
    val sumD = new Array[Double](specs.length)
    val sumSeen = new Array[Boolean](specs.length)
    val acc = new Array[AnyRef](specs.length)
  }

  private val groups = new java.util.LinkedHashMap[GKey, GState]()
  private val pending = new java.util.ArrayDeque[InternalRow]()
  private var eof = false
  private var cur: InternalRow = _

  private def state(vs: Array[AnyRef]): GState = {
    val k = new GKey(vs)
    var st = groups.get(k)
    if (st == null) { st = new GState; groups.put(k, st) }
    st
  }

  /** Spark groups all NaNs together and -0.0 with 0.0. */
  @inline private def normD(v: Double): Double =
    if (v == 0.0d) 0.0d else if (java.lang.Double.isNaN(v)) Double.NaN else v

  private def flush(): Unit = {
    val it = groups.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(groupIdx.length + specs.length)
      var g = 0
      while (g < groupIdx.length) { row.update(g, e.getKey.vs(g)); g += 1 }
      val st = e.getValue
      var s = 0
      while (s < specs.length) {
        val v: AnyRef = specs(s) match {
          case CountSpec           => Long.box(st.count)
          case _: CountColSpec     => Long.box(st.cnt(s))
          case SumSpec(_, isDouble) =>
            if (!st.sumSeen(s)) null
            else if (isDouble) Double.box(st.sumD(s))
            else Long.box(st.sumL(s))
          case _: MinMaxSpec => st.acc(s) match {
            case null           => null
            case b: Array[Byte] => UTF8String.fromBytes(b)
            case x              => x
          }
        }
        row.update(groupIdx.length + s, v)
        s += 1
      }
      pending.add(row)
    }
    groups.clear()
  }

  /** The chunk's group key when every group column is provably CONSTANT
    * across it (all-NULL, or null-free with zone min == max); None means
    * the chunk must decode. A double zone with min == max (primitive
    * compare) is one NORMALIZED group even when it spans -0.0/0.0.
    */
  private def constGroupKey(): Option[Array[AnyRef]] = {
    val vs = new Array[AnyRef](groupIdx.length)
    var g = 0
    while (g < groupIdx.length) {
      val c = groupIdx(g)
      if (c >= fr.nCols) return None
      if (fr.nullCount(c) == fr.numRows) vs(g) = null
      else if (fr.nullCount(c) == 0) {
        fr.zKind(c) match {
          case 1 =>
            if (fr.zLongMin(c) != fr.zLongMax(c)) return None
            vs(g) = Int.box(fr.zLongMin(c).toInt)
          case 2 =>
            val mn = java.lang.Double.longBitsToDouble(fr.zLongMin(c))
            val mx = java.lang.Double.longBitsToDouble(fr.zLongMax(c))
            if (!(mn == mx)) return None // NaN never has a zone; -0.0==0.0 is one group
            vs(g) = Double.box(normD(mn))
          case 3 =>
            val mn = fr.zStrMin(c)
            val mx = fr.zStrMax(c)
            if (mn == null || mx == null || !java.util.Arrays.equals(mn, mx)) return None
            vs(g) = UTF8String.fromBytes(mn)
          case _ => return None
        }
      } else return None // mixed null/value: two groups in one chunk
      g += 1
    }
    Some(vs)
  }

  /** Header-only fold of a fully-matching, constant-group chunk — the
    * mirror of the ungrouped reader's all-match branch, into one GState.
    */
  private def foldHeaders(st: GState): Unit = {
    st.count += fr.numRows
    var s = 0
    while (s < specs.length) {
      specs(s) match {
        case MinMaxSpec(c, isMin) if c < fr.nCols =>
          fr.zKind(c) match {
            case 1 => AggFolds.foldLong(st.acc, s, if (isMin) fr.zLongMin(c) else fr.zLongMax(c), isMin)
            case 2 => AggFolds.foldDouble(st.acc, s,
              java.lang.Double.longBitsToDouble(if (isMin) fr.zLongMin(c) else fr.zLongMax(c)), isMin)
            case 3 => AggFolds.foldBytes(st.acc, s, if (isMin) fr.zStrMin(c) else fr.zStrMax(c), isMin)
            case _ => () // no zone: decoded below
          }
        case CountColSpec(c) if c < fr.nCols =>
          st.cnt(s) += fr.numRows - fr.nullCount(c)
        case SumSpec(c, isDouble) if c < fr.nCols && fr.zHasSum(c) =>
          if (isDouble) st.sumD(s) += java.lang.Double.longBitsToDouble(fr.zSumBits(c))
          else st.sumL(s) += fr.zSumBits(c)
          st.sumSeen(s) = true
        case _ => ()
      }
      s += 1
    }
    // decode pass for zone-less agg columns, ascending column order
    // (FrameReader contract); all-NULL columns contribute nothing
    val needCols = specs.indices
      .filter(s => specs(s) match {
        case MinMaxSpec(c, _) => c < fr.nCols && fr.zKind(c) == 0 && fr.nullCount(c) < fr.numRows
        case SumSpec(c, _)    => c < fr.nCols && !fr.zHasSum(c) && fr.nullCount(c) < fr.numRows
        case _                => false
      })
      .sortBy(s => specCol(specs(s)))
    var lastCol = -1
    var blob: Array[Byte] = null
    needCols.foreach { s =>
      val c = specCol(specs(s))
      if (c != lastCol) { blob = fr.readBlob(c); lastCol = c }
      specs(s) match {
        case MinMaxSpec(_, isMin) =>
          AggFolds.foldDecoded(fr.where, st.acc, s, fr.colType(c), blob, isMin, fr.nullBits(c))
        case _: SumSpec =>
          AggFolds.sumDecoded(fr.where, st.sumL, st.sumD, st.sumSeen, s, fr.colType(c), blob, fr.nullBits(c))
        case _ => ()
      }
    }
    if (needCols.isEmpty) chunksHeaderOnly += 1 else chunksDecoded += 1
    fr.finishChunk()
  }

  private def specCol(sp: AggSpec): Int = sp match {
    case MinMaxSpec(c, _) => c
    case SumSpec(c, _)    => c
    case CountColSpec(c)  => c
    case CountSpec        => -1
  }

  /** Row-level path: decode filter (when not all-match) + group + agg
    * columns, route each passing row to its group's state. COUNT(col)
    * never decodes its column — the validity bitmap is header-resident.
    */
  private def decodeRows(evalFilter: Boolean): Unit = {
    chunksDecoded += 1
    val aggCols = specs.collect {
      case MinMaxSpec(c, _) => c
      case SumSpec(c, _)    => c
    }
    val filterCols = if (evalFilter) exact.flatMap(_.cols) else Array.empty[Int]
    val cols = (filterCols ++ groupIdx ++ aggCols).distinct.sorted.filter(_ < fr.nCols)
    val byCol = new Array[AnyRef](fr.nCols)
    cols.foreach { c =>
      val blob = fr.readBlob(c)
      byCol(c) = fr.colType(c) match {
        case t if t == ColType.Integer.toInt => IntCodec.decode(blob)
        case t if t == ColType.Double.toInt  => DoubleCodec.decode(blob)
        case t if t == ColType.String.toInt  => StringCodec.decodeSlices(new BufReader(blob))
        case t => throw new java.io.IOException(
          s"corrupt btr block file ${fr.where}: unknown column type $t in grouped aggregate")
      }
    }
    fr.finishChunk()
    @inline def nullAt(c: Int, i: Int): Boolean = {
      val nb = fr.nullBits(c)
      nb != null && ((nb(i >> 3) >> (i & 7)) & 1) == 1
    }
    val dataByCol: Int => AnyRef = c => byCol(c)
    var i = 0
    while (i < fr.numRows) {
      var ok = true
      if (evalFilter) {
        var p = 0
        while (ok && p < exact.length) {
          val pr = exact(p)
          ok = if (pr.isLeaf) {
            val c = pr.colIdx
            if (nullAt(c, i)) pr.matchesNull else pr.matches(byCol(c), i)
          } else pr.matchesRow(dataByCol, nullAt, i)
          p += 1
        }
      }
      if (ok) {
        val vs = new Array[AnyRef](groupIdx.length)
        var g = 0
        while (g < groupIdx.length) {
          val c = groupIdx(g)
          vs(g) =
            if (nullAt(c, i)) null
            else byCol(c) match {
              case a: Array[Int]     => Int.box(a(i))
              case a: Array[Double]  => Double.box(normD(a(i)))
              case d: DecodedStrings => UTF8String.fromBytes(d.copy(i))
            }
          g += 1
        }
        val st = state(vs)
        st.count += 1
        var s = 0
        while (s < specs.length) {
          specs(s) match {
            case MinMaxSpec(c, isMin) if c < fr.nCols && !nullAt(c, i) =>
              byCol(c) match {
                case a: Array[Int]     => AggFolds.foldLong(st.acc, s, a(i), isMin)
                case a: Array[Double]  => AggFolds.foldDouble(st.acc, s, a(i), isMin)
                case d: DecodedStrings => AggFolds.foldBytes(st.acc, s, d.copy(i), isMin)
              }
            case CountColSpec(c) if c < fr.nCols && !nullAt(c, i) =>
              st.cnt(s) += 1
            case SumSpec(c, _) if c < fr.nCols && !nullAt(c, i) =>
              byCol(c) match {
                case a: Array[Int]    => st.sumL(s) += a(i); st.sumSeen(s) = true
                case a: Array[Double] => st.sumD(s) += a(i); st.sumSeen(s) = true
                case _                => ()
              }
            case _ => ()
          }
          s += 1
        }
      }
      i += 1
    }
  }

  /** Process one chunk into the combine map; false at end of file. */
  private def processChunk(): Boolean = {
    if (!fr.nextHeader()) return false
    chunksTotal += 1
    if (zones.exists(_.rejectsCtx(fr.zoneCtx))) {
      fr.finishChunk()
      chunksSkipped += 1
    } else if (exact.forall(_.allMatchCtx(fr.zoneCtx))) {
      constGroupKey() match {
        case Some(vs) => foldHeaders(state(vs))
        case None     => decodeRows(evalFilter = false)
      }
    } else decodeRows(evalFilter = true)
    true
  }

  override def next(): Boolean = {
    while (pending.isEmpty && !eof) {
      if (!processChunk()) { flush(); eof = true }
      else if (groups.size >= BtrGroupAggReader.FlushGroups) flush()
    }
    cur = pending.poll()
    cur != null
  }

  override def get(): InternalRow = cur

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(ChunksSkippedTaskMetric(chunksSkipped), ChunksTotalTaskMetric(chunksTotal),
      AggChunksHeaderOnlyTaskMetric(chunksHeaderOnly), AggChunksDecodedTaskMetric(chunksDecoded))

  override def close(): Unit = fr.close()
}
