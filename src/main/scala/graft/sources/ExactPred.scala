package graft.sources

import graft.codec.DecodedStrings
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Exactly-evaluable pushed predicates — the source CLAIMS these filters
  * (returns them as handled from pushFilters), so Spark plans NO post-scan
  * Filter. That unlocks aggregate pushdown under a WHERE clause
  * (`SELECT count(*) WHERE id BETWEEN …` — the most common operational
  * query at 100 TB — answered from frame headers for fully-covered
  * chunks), at the price that the readers must now enforce these
  * predicates with Spark's exact row semantics.
  *
  * Three-way chunk classification drives the cost model:
  *  - zone REJECTS (ZonePred)        → chunk skipped unread (existing);
  *  - `allMatch` proves every row satisfies the predicate from the zone +
  *    null statistics alone          → rows emitted with NO per-row eval;
  *  - otherwise (mixed)              → per-row evaluation on the decoded
  *    columns (`matches`/`matchesNull`).
  *
  * Spark semantics implemented exactly:
  *  - NULL never satisfies a comparison / IN; IS NULL / `<=> NULL` do;
  *  - doubles compare with NaN as the GREATEST value, NaN == NaN, and
  *    -0.0 == 0.0 (Spark normalizes -0.0 at UnsafeRow boundaries; values
  *    decoded from btr blobs keep their sign bit, so the evaluator must
  *    normalize);
  *  - strings compare in unsigned UTF-8 byte order (binary collation);
  *  - int-column bounds from fractional comparands use the same
  *    ceil/floor rounding as the zone layer (x > 3.5 ⇔ x >= 4).
  */
sealed trait ExactPred extends Serializable {
  def colIdx: Int
  /** Every column this predicate reads (compounds may span several). */
  def cols: Seq[Int] = Seq(colIdx)
  /** Does a NULL row satisfy this predicate? */
  def matchesNull: Boolean
  /** Non-null row `i` of the decoded column (caller dispatches nulls). */
  def matches(decoded: AnyRef, i: Int): Boolean
  /** Row eval with multi-column access (round-5): `data(c)` = column c's
    * decoded values, `nullAt(c, i)` = is row i NULL at column c. Leaves
    * default to their single column; compounds compose across columns.
    * Readers use the direct matches/matchesNull path for single-column
    * predicates and this for compounds.
    */
  def matchesRow(data: Int => AnyRef, nullAt: (Int, Int) => Boolean, i: Int): Boolean =
    if (nullAt(colIdx, i)) matchesNull else matches(data(colIdx), i)
  /** Leaves support the direct matches/matchesNull fast path; compounds
    * (even same-column ones) must go through matchesRow.
    */
  def isLeaf: Boolean = true
  /** Can the zone + null statistics PROVE every row of the chunk matches?
    * Conservative false. kind/zone args as in ZonePred.rejects.
    */
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean
  /** Ctx-based all-match — THE dispatch the readers use; compounds
    * compose across columns. A column beyond the unit's width proves
    * nothing (conservative false).
    */
  def allMatchCtx(ctx: ZoneCtx): Boolean =
    colIdx < ctx.nCols && allMatch(ctx.kind(colIdx), ctx.lmin(colIdx), ctx.lmax(colIdx),
      ctx.smin(colIdx), ctx.smax(colIdx), ctx.nullCount(colIdx), ctx.rows(colIdx))
}

object ExactPred {
  /** Spark's double ordering: -0.0 == 0.0, NaN greatest, NaN == NaN. */
  @inline def cmpD(a: Double, b: Double): Int =
    java.lang.Double.compare(if (a == 0.0) 0.0 else a, if (b == 0.0) 0.0 else b)
}

/** value ∈ [lo, hi] over an INT column (bounds pre-rounded to ints). */
case class IntCmpPred(colIdx: Int, lo: Long, hi: Long) extends ExactPred {
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val v = decoded.asInstanceOf[Array[Int]](i).toLong
    v >= lo && v <= hi
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    kind == 1 && nullCount == 0 && lmin >= lo && lmax <= hi
}

/** value ∈ [lo, hi] in Spark's double order over a DOUBLE column. An
  * unbounded top is encoded as hi = NaN (the order's maximum), so `x > v`
  * correctly matches NaN rows.
  */
case class DoubleCmpPred(colIdx: Int, lo: Double, hi: Double) extends ExactPred {
  import ExactPred.cmpD
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val v = decoded.asInstanceOf[Array[Double]](i)
    cmpD(v, lo) >= 0 && cmpD(v, hi) <= 0
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    // a chunk containing NaN carries no zone (kind 0) -> never proves here
    kind == 2 && nullCount == 0 &&
      cmpD(java.lang.Double.longBitsToDouble(lmin), lo) >= 0 &&
      cmpD(java.lang.Double.longBitsToDouble(lmax), hi) <= 0
}

/** One string comparison (op ∈ StrOp) over unsigned UTF-8 byte order. */
case class StringCmpPred(colIdx: Int, op: Int, v: String) extends ExactPred {
  @transient private lazy val vb: Array[Byte] =
    v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val d = decoded.asInstanceOf[DecodedStrings]
    val c = java.util.Arrays.compareUnsigned(
      d.data, d.starts(i), d.starts(i) + d.lens(i), vb, 0, vb.length)
    op match {
      case StrOp.GT  => c > 0
      case StrOp.GTE => c >= 0
      case StrOp.LT  => c < 0
      case StrOp.LTE => c <= 0
      case StrOp.EQ  => c == 0
    }
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = {
    if (kind != 3 || nullCount != 0) return false
    def cmp(a: Array[Byte], b: Array[Byte]) = java.util.Arrays.compareUnsigned(a, b)
    op match {
      case StrOp.GT  => cmp(smin, vb) > 0
      case StrOp.GTE => cmp(smin, vb) >= 0
      case StrOp.LT  => cmp(smax, vb) < 0
      case StrOp.LTE => cmp(smax, vb) <= 0
      case StrOp.EQ  => cmp(smin, vb) == 0 && cmp(smax, vb) == 0
    }
  }
}

/** IN over an INT column: sorted feasible members, binary search per row. */
case class IntInPred(colIdx: Int, vs: Seq[Long]) extends ExactPred {
  @transient private lazy val sorted: Array[Long] = vs.distinct.sorted.toArray
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean =
    java.util.Arrays.binarySearch(sorted, decoded.asInstanceOf[Array[Int]](i).toLong) >= 0
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    kind == 1 && nullCount == 0 && lmin == lmax &&
      java.util.Arrays.binarySearch(sorted, lmin) >= 0
}

/** IN over a DOUBLE column: members held as canonical bits of the
  * normalized value (-0.0 → 0.0, NaN → canonical NaN), so NaN ∈ set and
  * -0.0/0.0 behave per Spark equality.
  */
case class DoubleInPred(colIdx: Int, vs: Seq[Double]) extends ExactPred {
  @transient private lazy val bits: Array[Long] = vs
    .map(v => java.lang.Double.doubleToLongBits(if (v == 0.0) 0.0 else v))
    .distinct.sorted.toArray
  private def memberBits(v: Double): Long =
    java.lang.Double.doubleToLongBits(if (v == 0.0) 0.0 else v)
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean =
    java.util.Arrays.binarySearch(bits, memberBits(decoded.asInstanceOf[Array[Double]](i))) >= 0
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    kind == 2 && nullCount == 0 &&
      ExactPred.cmpD(java.lang.Double.longBitsToDouble(lmin),
        java.lang.Double.longBitsToDouble(lmax)) == 0 &&
      java.util.Arrays.binarySearch(bits,
        memberBits(java.lang.Double.longBitsToDouble(lmin))) >= 0
}

/** IN over a STRING column: sorted UTF-8 members, binary search per row. */
case class StringInPred(colIdx: Int, vs: Seq[String]) extends ExactPred {
  @transient private lazy val sorted: Array[Array[Byte]] = vs.distinct.sorted
    .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private def contains(data: Array[Byte], from: Int, to: Int): Boolean = {
    var lo = 0
    var hi = sorted.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.util.Arrays.compareUnsigned(
        sorted(mid), 0, sorted(mid).length, data, from, to)
      if (c == 0) return true
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    false
  }
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val d = decoded.asInstanceOf[DecodedStrings]
    contains(d.data, d.starts(i), d.starts(i) + d.lens(i))
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    kind == 3 && nullCount == 0 &&
      java.util.Arrays.compareUnsigned(smin, smax) == 0 &&
      contains(smin, 0, smin.length)
}

/** `col LIKE 'p%'` — byte-prefix match (Spark's StartsWith is a
  * UTF8String byte-prefix test). allMatch: when the zone's min and max
  * both lie in [p, succ(p)), every value between them does too.
  */
case class StartsWithPred(colIdx: Int, prefix: String) extends ExactPred {
  @transient private lazy val pb: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val succ: Array[Byte] = StringPrefixZonePred.successor(pb)
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val d = decoded.asInstanceOf[DecodedStrings]
    d.lens(i) >= pb.length && java.util.Arrays.equals(
      d.data, d.starts(i), d.starts(i) + pb.length, pb, 0, pb.length)
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean =
    kind == 3 && nullCount == 0 &&
      java.util.Arrays.compareUnsigned(smin, pb) >= 0 &&
      (succ == null || java.util.Arrays.compareUnsigned(smax, succ) < 0)
}

/** `col LIKE '%s'` — byte-suffix match (no zone shape; row eval only). */
case class EndsWithPred(colIdx: Int, suffix: String) extends ExactPred {
  @transient private lazy val sb: Array[Byte] =
    suffix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val d = decoded.asInstanceOf[DecodedStrings]
    val off = d.starts(i) + d.lens(i) - sb.length
    d.lens(i) >= sb.length && java.util.Arrays.equals(
      d.data, off, off + sb.length, sb, 0, sb.length)
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = false
}

/** `col LIKE '%s%'` — byte substring match, same semantics as
  * UTF8String.contains (byte search; no zone shape).
  */
case class ContainsPred(colIdx: Int, needle: String) extends ExactPred {
  @transient private lazy val nb: Array[Byte] =
    needle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = {
    val d = decoded.asInstanceOf[DecodedStrings]
    if (nb.length == 0) return true
    val end = d.starts(i) + d.lens(i) - nb.length
    var o = d.starts(i)
    while (o <= end) {
      if (java.util.Arrays.equals(d.data, o, o + nb.length, nb, 0, nb.length)) return true
      o += 1
    }
    false
  }
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = false
}

/** Disjunction (`f1 OR f2`, round-5), possibly ACROSS columns. Under SQL
  * three-valued logic a row passes a filter iff the predicate evaluates
  * TRUE, and OR is TRUE iff at least one side is TRUE — so
  * pass-composition is plain `||` through matchesRow, each leaf consulting
  * its own column's null state. allMatch: either side proving every row
  * proves the OR. The single-column matches/matchesNull path is never
  * sound for a compound and fails loudly if a dispatch site misses the
  * compound-aware path.
  */
case class OrPred(l: ExactPred, r: ExactPred) extends ExactPred {
  def colIdx: Int = l.colIdx
  override def cols: Seq[Int] = (l.cols ++ r.cols).distinct
  override def isLeaf: Boolean = false
  def matchesNull: Boolean =
    throw new UnsupportedOperationException("compound predicates evaluate via matchesRow")
  def matches(decoded: AnyRef, i: Int): Boolean =
    throw new UnsupportedOperationException("compound predicates evaluate via matchesRow")
  override def matchesRow(data: Int => AnyRef, nullAt: (Int, Int) => Boolean, i: Int): Boolean =
    l.matchesRow(data, nullAt, i) || r.matchesRow(data, nullAt, i)
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = false
  override def allMatchCtx(ctx: ZoneCtx): Boolean =
    l.allMatchCtx(ctx) || r.allMatchCtx(ctx)
}

/** Conjunction (nested inside an OR — Spark splits top-level conjuncts
  * itself), possibly across columns. AND is TRUE iff both sides are TRUE:
  * `&&` through matchesRow; allMatch needs both sides proven.
  */
case class AndPred(l: ExactPred, r: ExactPred) extends ExactPred {
  def colIdx: Int = l.colIdx
  override def cols: Seq[Int] = (l.cols ++ r.cols).distinct
  override def isLeaf: Boolean = false
  def matchesNull: Boolean =
    throw new UnsupportedOperationException("compound predicates evaluate via matchesRow")
  def matches(decoded: AnyRef, i: Int): Boolean =
    throw new UnsupportedOperationException("compound predicates evaluate via matchesRow")
  override def matchesRow(data: Int => AnyRef, nullAt: (Int, Int) => Boolean, i: Int): Boolean =
    l.matchesRow(data, nullAt, i) && r.matchesRow(data, nullAt, i)
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = false
  override def allMatchCtx(ctx: ZoneCtx): Boolean =
    l.allMatchCtx(ctx) && r.allMatchCtx(ctx)
}

/** IS NULL (also `col <=> NULL`). */
case class IsNullPred(colIdx: Int) extends ExactPred {
  def matchesNull = true
  def matches(decoded: AnyRef, i: Int): Boolean = false
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = rows > 0 && nullCount == rows
}

/** IS NOT NULL. */
case class NotNullPred(colIdx: Int) extends ExactPred {
  def matchesNull = false
  def matches(decoded: AnyRef, i: Int): Boolean = true
  def allMatch(kind: Int, lmin: Long, lmax: Long, smin: Array[Byte], smax: Array[Byte],
      nullCount: Long, rows: Long): Boolean = nullCount == 0
}

/** Classifier: Filter → ExactPred for the shapes the readers can enforce
  * exactly. Anything else stays a Spark post-scan filter. Every zone-able
  * shape is also exact-claimable, so claiming never loses zone skipping.
  */
object ExactFilters {

  private def isIntegral(v: Number): Boolean = v match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer | _: java.lang.Long => true
    case _ => false
  }
  // int-bound rounding, identical to the zone layer (BtrScanBuilder)
  private def lowAbove(v: Number): Long =
    if (isIntegral(v)) v.longValue + 1
    else math.ceil(v.doubleValue).toLong +
      (if (v.doubleValue == math.floor(v.doubleValue)) 1L else 0L)
  private def lowAtLeast(v: Number): Long =
    if (isIntegral(v)) v.longValue else math.ceil(v.doubleValue).toLong
  private def highBelow(v: Number): Long =
    if (isIntegral(v)) v.longValue - 1
    else math.floor(v.doubleValue).toLong -
      (if (v.doubleValue == math.ceil(v.doubleValue)) 1L else 0L)
  private def highAtMost(v: Number): Long =
    if (isIntegral(v)) v.longValue else math.floor(v.doubleValue).toLong

  def toExact(schema: StructType, f: Filter): Option[ExactPred] = {
    def colOf(name: String, dt: DataType): Option[Int] = {
      val i = schema.fieldNames.indexOf(name)
      if (i >= 0 && schema.fields(i).dataType == dt) Some(i) else None
    }
    def anyCol(name: String): Option[Int] = {
      val i = schema.fieldNames.indexOf(name)
      if (i >= 0) Some(i) else None
    }
    // a long literal beyond the exact-double range would lose precision in
    // the double comparison path; int columns avoid it by comparing as
    // long, doubles only ever see the literal's own double value
    f match {
      // ---- INT columns
      case GreaterThan(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, lowAbove(v), Long.MaxValue))
      case GreaterThanOrEqual(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, lowAtLeast(v), Long.MaxValue))
      case LessThan(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, Long.MinValue, highBelow(v)))
      case LessThanOrEqual(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, Long.MinValue, highAtMost(v)))
      case EqualTo(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, lowAtLeast(v), highAtMost(v)))
      case EqualNullSafe(a, v: Number) if colOf(a, IntegerType).isDefined =>
        colOf(a, IntegerType).map(IntCmpPred(_, lowAtLeast(v), highAtMost(v)))
      case In(a, values) if values != null && colOf(a, IntegerType).isDefined &&
          values.forall(v => v == null || v.isInstanceOf[Number]) =>
        // feasible = integral members; null / fractional members can never
        // equal an int row (and a null member's three-valued "unknown" is
        // false under a filter)
        val vs = values.toSeq.collect {
          case v: Number if lowAtLeast(v) == highAtMost(v) => lowAtLeast(v)
        }
        colOf(a, IntegerType).map(IntInPred(_, vs))
      // ---- DOUBLE columns (NaN literal allowed: NaN == NaN in Spark)
      case GreaterThan(a, v: Number) if colOf(a, DoubleType).isDefined && !v.doubleValue.isNaN =>
        // nextUp(+Inf) = +Inf would wrongly include +Inf itself; in Spark's
        // order only NaN is > +Inf
        val lo = if (v.doubleValue == Double.PositiveInfinity) Double.NaN
                 else Math.nextUp(v.doubleValue)
        colOf(a, DoubleType).map(DoubleCmpPred(_, lo, Double.NaN))
      case GreaterThanOrEqual(a, v: Number) if colOf(a, DoubleType).isDefined && !v.doubleValue.isNaN =>
        colOf(a, DoubleType).map(DoubleCmpPred(_, v.doubleValue, Double.NaN))
      case LessThan(a, v: Number) if colOf(a, DoubleType).isDefined && !v.doubleValue.isNaN =>
        // nextDown(-Inf) = -Inf would wrongly include -Inf itself; nothing
        // is < -Inf, so use an empty range (lo NaN = order max, hi -Inf)
        val hi = if (v.doubleValue == Double.NegativeInfinity) Double.NegativeInfinity else Math.nextDown(v.doubleValue)
        val lo = if (v.doubleValue == Double.NegativeInfinity) Double.NaN else Double.NegativeInfinity
        colOf(a, DoubleType).map(DoubleCmpPred(_, lo, hi))
      case LessThanOrEqual(a, v: Number) if colOf(a, DoubleType).isDefined && !v.doubleValue.isNaN =>
        colOf(a, DoubleType).map(DoubleCmpPred(_, Double.NegativeInfinity, v.doubleValue))
      case EqualTo(a, v: Number) if colOf(a, DoubleType).isDefined =>
        colOf(a, DoubleType).map(DoubleCmpPred(_, v.doubleValue, v.doubleValue))
      case EqualNullSafe(a, v: Number) if colOf(a, DoubleType).isDefined =>
        colOf(a, DoubleType).map(DoubleCmpPred(_, v.doubleValue, v.doubleValue))
      case In(a, values) if values != null && colOf(a, DoubleType).isDefined &&
          values.forall(v => v == null || v.isInstanceOf[Number]) =>
        val vs = values.toSeq.collect { case v: Number => v.doubleValue }
        colOf(a, DoubleType).map(DoubleInPred(_, vs))
      // ---- STRING columns
      case GreaterThan(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.GT, v))
      case GreaterThanOrEqual(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.GTE, v))
      case LessThan(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.LT, v))
      case LessThanOrEqual(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.LTE, v))
      case EqualTo(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.EQ, v))
      case EqualNullSafe(a, v: String) =>
        colOf(a, StringType).map(StringCmpPred(_, StrOp.EQ, v))
      case In(a, values) if values != null && colOf(a, StringType).isDefined &&
          values.forall(v => v == null || v.isInstanceOf[String]) =>
        val vs = values.toSeq.collect { case v: String => v }
        colOf(a, StringType).map(StringInPred(_, vs))
      // ---- LIKE shapes (byte semantics identical to UTF8String's
      // startsWith/endsWith/contains, which back Spark's operators)
      case StringStartsWith(a, p) if p != null =>
        colOf(a, StringType).map(StartsWithPred(_, p))
      case StringEndsWith(a, s) if s != null =>
        colOf(a, StringType).map(EndsWithPred(_, s))
      case StringContains(a, s) if s != null =>
        colOf(a, StringType).map(ContainsPred(_, s))
      // ---- null checks
      case EqualNullSafe(a, null) => anyCol(a).map(IsNullPred)
      case IsNull(a) => anyCol(a).map(IsNullPred)
      case IsNotNull(a) => anyCol(a).map(NotNullPred)
      // ---- compounds (round-5): claimable when both sides are exactly
      // evaluable — including across columns (matchesRow gives compounds
      // multi-column access). A partially-claimable compound must NOT be
      // claimed — claiming a filter Spark considers handled while
      // enforcing only part of it would drop the rest — so one
      // unclaimable side returns None and Spark keeps its own Filter
      // (zone pruning still applies via the zone layer).
      case Or(f1, f2) =>
        for {
          p1 <- toExact(schema, f1)
          p2 <- toExact(schema, f2)
        } yield OrPred(p1, p2)
      case And(f1, f2) =>
        for {
          p1 <- toExact(schema, f1)
          p2 <- toExact(schema, f2)
        } yield AndPred(p1, p2)
      case Not(g) => NotRewrite(g).flatMap(toExact(schema, _))
      case _ => None
    }
  }
}

/** Exact negation rewrites: `Not(f)` → an equivalent positive Filter,
  * ONLY where the rewrite reproduces Spark's three-valued semantics
  * exactly. A comparison on a NULL input yields NULL, and NOT NULL is
  * still NULL — so the swapped comparison (which also rejects NULL rows)
  * is exact. Shapes whose negation is subtler are deliberately absent and
  * stay Spark post-scan filters:
  *  - `NOT (a <=> v)` with v non-null PASSES null rows (<=> is two-valued);
  *  - `NOT IN (...)` with a null member passes no rows at all;
  *  - NOT over LIKE shapes / nested AND-OR would need three-valued
  *    evaluation through the compound.
  */
object NotRewrite {
  def apply(f: Filter): Option[Filter] = f match {
    case GreaterThan(a, v) => Some(LessThanOrEqual(a, v))
    case GreaterThanOrEqual(a, v) => Some(LessThan(a, v))
    case LessThan(a, v) => Some(GreaterThanOrEqual(a, v))
    case LessThanOrEqual(a, v) => Some(GreaterThan(a, v))
    // x != v over non-null x is exactly (x < v OR x > v) in Spark's total
    // orders (doubles: NaN greatest, NaN == NaN; strings: UTF-8 byte
    // order) — and NULL rows fail both forms
    case EqualTo(a, v) if v != null => Some(Or(LessThan(a, v), GreaterThan(a, v)))
    case EqualNullSafe(a, null) => Some(IsNotNull(a))
    case IsNull(a) => Some(IsNotNull(a))
    case IsNotNull(a) => Some(IsNull(a))
    case Not(g) => Some(g)
    case _ => None
  }
}
