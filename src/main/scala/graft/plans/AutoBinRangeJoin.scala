package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/**
 * Optimizer rule: plan a naive range-join PREDICATE scale-safe.
 *
 * A user writing the natural SQL —
 *
 *   SELECT ... FROM events e JOIN windows w
 *   ON e.ts >= w.w_from AND e.ts < w.w_to
 *
 * — gets a BroadcastNestedLoopJoin (or a cartesian product) from Spark's
 * planner, because the condition has no equi-key: O(|L|·|R|)
 * comparisons, a job at test scale and an outage at 100 TB. The library
 * form (`operators.RangeJoin.binnedRangeJoin`) avoids that by binning,
 * but only helps callers who know to reach for it. This rule gives the
 * SAME rewrite to the declarative form automatically:
 *
 *  - point side gains `_graft_bin = floor(us(ts) / w)`;
 *  - interval side filters `from < to` and EXPLODES to every bin the
 *    interval overlaps (`sequence(floor(us(from)/w),
 *    floor((us(to)-1)/w))`, `to` exclusive);
 *  - the join becomes bin-equality AND the original predicate, which
 *    `ExtractEquiJoinKeys` now plans as a hash/sort-merge join that AQE
 *    can skew-split; a final Project restores the original schema.
 *
 * Each matching (row, interval) pair meets in exactly the row's bin, so
 * the rewrite is row-identical to the nested loop (`RangeJoinSpec`
 * proves the operator form; `AutoBinRangeJoinSpec` proves the rule
 * reproduces the naive join's rows bit-for-bit and kills the BNLJ).
 *
 * Two shapes are recognized, both over TIMESTAMP columns and both
 * requiring the condition to be EXACTLY the two conjuncts:
 *  - point-in-interval: `lo OP ts AND ts OP hi`, OP ∈ {<, <=} in any
 *    combination (>=/>/BETWEEN-style spellings normalize to these) —
 *    point column on one side, both bounds on the other; inclusive
 *    upper bounds extend the bin explosion to `bin(hi)`;
 *  - interval overlap: `aFrom < bTo AND bFrom < aTo` (the half-open
 *    overlap test) — BOTH sides explode, and the pair is kept only in
 *    the bin holding `max(aFrom, bFrom)` (inside both intervals
 *    whenever they overlap), so the output needs no dedup — the
 *    `operators.RangeJoin.intervalOverlapJoin` argument.
 *
 * Any existing equi-conjunct means Spark already plans a hash join —
 * the rule stands down. Semantics are LITERAL-predicate-preserving: a
 * null bound matches nothing in both forms (null bin never
 * equi-matches); point-shape empty/inverted intervals match nothing
 * (the predicate itself is unsatisfiable, and the validity filter only
 * drops rows the predicate already excludes); and overlap-shape
 * degenerate intervals that still satisfy the raw predicate (an empty
 * `[x, x)` strictly inside the other side) are KEPT — which is where
 * this rule deliberately diverges from
 * `RangeJoin.intervalOverlapJoin`'s documented set-overlap contract.
 *
 * Conf: `spark.graft.binRangeJoin.enabled` (default true when the rule
 * is injected), `spark.graft.binRangeJoin.binSeconds` (default 3600 —
 * pick near the typical interval length: smaller bins inflate the
 * explosion, larger ones degrade toward the loop within a bin).
 */
object AutoBinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.binRangeJoin.enabled"
  private val BinSecondsKey = "spark.graft.binRangeJoin.binSeconds"

  /** Comparison normalized to `x < y` / `x <= y`: (x, y, strict). */
  private def cmp(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThan(a, b) => Some((a, b, true))
      case LessThanOrEqual(a, b) => Some((a, b, false))
      case GreaterThan(a, b) => Some((b, a, true))
      case GreaterThanOrEqual(a, b) => Some((b, a, false))
      case _ => None
    }

  /** (point ts, interval from, interval to, upperStrict, pointIsLeft)
    * when the join condition is exactly the two range conjuncts —
    * `lo OP ts AND ts OP hi` with OP ∈ {<, <=} (any operand/conjunct
    * order): the point expression is the one the conjuncts share. */
  private def rangeShape(j: Join): Option[(Expression, Expression,
      Expression, Boolean, Boolean)] = {
    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
    if (conjuncts.length != 2) return None
    (cmp(conjuncts.head), cmp(conjuncts(1))) match {
      case (Some((x1, y1, _)), Some((x2, y2, s2)))
          if y1.semanticEquals(x2) => shape(j, y1, x1, y2, s2)
      case (Some((x1, y1, s1)), Some((x2, y2, _)))
          if y2.semanticEquals(x1) => shape(j, y2, x2, y1, s1)
      case _ => None
    }
  }

  private def shape(j: Join, ts: Expression, lo: Expression, hi: Expression,
      upperStrict: Boolean): Option[(Expression, Expression, Expression,
      Boolean, Boolean)] = {
    if (ts.dataType != TimestampType || lo.dataType != TimestampType ||
      hi.dataType != TimestampType) return None
    val (lOut, rOut) = (j.left.outputSet, j.right.outputSet)
    def onLeft(e: Expression) = e.references.subsetOf(lOut) &&
      e.references.nonEmpty
    def onRight(e: Expression) = e.references.subsetOf(rOut) &&
      e.references.nonEmpty
    if (onLeft(ts) && onRight(lo) && onRight(hi))
      Some((ts, lo, hi, upperStrict, true))
    else if (onRight(ts) && onLeft(lo) && onLeft(hi))
      Some((ts, lo, hi, upperStrict, false))
    else None
  }

  /** floor(us(e) / w) — the identical arithmetic RangeJoin spells with
    * the Column API (long micros → double divide → floor → long). */
  private def binOf(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(UnixMicros(e), DoubleType), Literal(w.toDouble)))

  private def binOfToExclusive(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(Subtract(UnixMicros(e), Literal(1L)), DoubleType),
      Literal(w.toDouble)))

  /** (aFrom, aTo, bFrom, bTo) — left-side bounds then right-side bounds —
    * when the condition is exactly the two overlap conjuncts
    * `aFrom < bTo AND bFrom < aTo` (any operand/conjunct order). */
  private def overlapShape(j: Join): Option[(Expression, Expression,
      Expression, Expression)] = {
    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
    if (conjuncts.length != 2) return None
    def strict(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(a, b) => Some((a, b))       // a < b
      case GreaterThan(b, a) => Some((a, b))    // b > a
      case _ => None
    }
    (strict(conjuncts.head), strict(conjuncts(1))) match {
      case (Some((x1, y1)), Some((x2, y2))) =>
        val all = Seq(x1, y1, x2, y2)
        if (all.exists(_.dataType != TimestampType)) return None
        val (lOut, rOut) = (j.left.outputSet, j.right.outputSet)
        def l(e: Expression) = e.references.nonEmpty &&
          e.references.subsetOf(lOut)
        def r(e: Expression) = e.references.nonEmpty &&
          e.references.subsetOf(rOut)
        // x1 < y1 ∧ x2 < y2 is the overlap iff one conjunct crosses
        // left→right and the other right→left: (aFrom < bTo, bFrom < aTo)
        val m =
          if (l(x1) && r(y1) && r(x2) && l(y2)) Some((x1, y2, x2, y1))
          else if (r(x1) && l(y1) && l(x2) && r(y2)) Some((x2, y1, x1, y2))
          else None
        // degenerate sides (aFrom ≡ aTo) are point shapes, not intervals —
        // rangeShape handles those; Filter(from < to) here would wrongly
        // drop every row
        m.filterNot { case (aF, aT, bF, bT) =>
          aF.semanticEquals(aT) || bF.semanticEquals(bT)
        }
      case _ => None
    }
  }

  /** Interval side exploded to its covered bins. For a strict upper
    * bound (`[lo, hi)`) the last bin is `bin(hi − 1µs)` and `lo >= hi`
    * intervals match nothing; for an inclusive upper (`[lo, hi]`) the
    * last bin is `bin(hi)` and only `lo > hi` is empty. */
  private def explodedBins(side: LogicalPlan, lo: Expression,
      hi: Expression, w: Long, name: String,
      upperStrict: Boolean): (LogicalPlan, Attribute) = {
    // Sequence is TimeZoneAwareExpression: resolved only once a zone is
    // bound (irrelevant for LONG sequences, still required)
    val lastBin = if (upperStrict) binOfToExclusive(hi, w) else binOf(hi, w)
    val gen = Explode(Sequence(binOf(lo, w), lastBin,
      None, Some(conf.sessionLocalTimeZone)))
    val el = gen.elementSchema.head
    val bin = AttributeReference(name, el.dataType, el.nullable)()
    val nonEmpty = if (upperStrict) LessThan(lo, hi)
      else LessThanOrEqual(lo, hi)
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bin),
      child = Filter(nonEmpty, side)), bin)
  }

  /** Overlap-side explosion: `sequence(bin(from), greatest(bin(to−1µs),
    * bin(from)))` — no validity filter, minimum one bin (the from-bin),
    * always ascending so Sequence's default +1 step applies. */
  private def explodedBinsClamped(side: LogicalPlan, lo: Expression,
      hi: Expression, w: Long, name: String): (LogicalPlan, Attribute) = {
    val start = binOf(lo, w)
    val gen = Explode(Sequence(start,
      Greatest(Seq(binOfToExclusive(hi, w), start)),
      None, Some(conf.sessionLocalTimeZone)))
    val el = gen.elementSchema.head
    val bin = AttributeReference(name, el.dataType, el.nullable)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bin), child = side), bin)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    val w = conf.getConfString(BinSecondsKey, "3600").toLong * 1000000L
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) if rangeShape(j).isDefined =>
        val (ts, lo, hi, upperStrict, pointIsLeft) = rangeShape(j).get
        val (point, interval) = if (pointIsLeft) (j.left, j.right)
          else (j.right, j.left)
        val binP = Alias(binOf(ts, w), "_graft_bin_p")()
        val pointProj = Project(point.output :+ binP, point)
        val (intervalGen, binI) = explodedBins(interval, lo, hi, w,
          "_graft_bin_i", upperStrict)
        val newCond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
        val rejoined =
          if (pointIsLeft) j.copy(left = pointProj, right = intervalGen,
            condition = Some(newCond))
          else j.copy(left = intervalGen, right = pointProj,
            condition = Some(newCond))
        Project(j.output, rejoined)

      case j @ Join(_, _, Inner, Some(_), _) if overlapShape(j).isDefined =>
        // interval×interval overlap: explode BOTH sides and keep each
        // pair only in the bin holding m = max(aFrom, bFrom) — exactly
        // once, no dedup. Unlike the library operator (whose CONTRACT is
        // set-overlap: empty/inverted intervals match nothing), a rule
        // rewriting user SQL must preserve the LITERAL predicate, which
        // a degenerate interval can still satisfy (an empty [x, x)
        // strictly inside the other side passes `aFrom < bTo AND bFrom
        // < aTo`). So: no validity filter, and each side's explosion is
        // clamped to cover at least its from-bin. Coverage proof: when
        // the predicate holds, m ≥ aFrom (lower bound ok) and either
        // m = aFrom (the clamp bin) or m = bFrom < aTo ⇒ m ≤ aTo−1µs ⇒
        // bin(m) ≤ bin(aTo−1) — in-range either way; symmetric for b.
        val (aFrom, aTo, bFrom, bTo) = overlapShape(j).get
        val (aGen, binA) = explodedBinsClamped(j.left, aFrom, aTo, w,
          "_graft_bin_a")
        val (bGen, binB) = explodedBinsClamped(j.right, bFrom, bTo, w,
          "_graft_bin_b")
        val anchor = EqualTo(binA,
          Floor(Divide(Cast(Greatest(Seq(UnixMicros(aFrom),
            UnixMicros(bFrom))), DoubleType), Literal(w.toDouble))))
        val newCond = And(EqualTo(binA, binB), And(anchor, j.condition.get))
        Project(j.output,
          j.copy(left = aGen, right = bGen, condition = Some(newCond)))
    }
  }
}
