package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, TimestampType}

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
 * reproduces the naive join's rows bit-for-bit).
 *
 * Two shapes are recognized, both over TIMESTAMP columns and both
 * requiring the condition to be EXACTLY the two conjuncts:
 *  - point-in-interval: `lo OP ts AND ts OP hi`, OP ∈ {<, <=} in any
 *    combination (>=/>/BETWEEN-style spellings normalize to these) —
 *    point column on one side, both bounds on the other; inclusive
 *    upper bounds extend the bin explosion to `bin(hi)`;
 *  - interval overlap: `aFrom OP bTo AND bFrom OP aTo`, OP ∈ {<, <=}
 *    independently per conjunct (half-open, closed, and mixed interval
 *    spellings) — BOTH sides explode, and the pair is kept only in the
 *    bin holding `max(aFrom, bFrom)` (inside both intervals whenever
 *    they overlap), so the output needs no dedup — the
 *    `operators.RangeJoin.intervalOverlapJoin` argument. An inclusive
 *    upper bound on a side extends THAT side's explosion to `bin(to)`
 *    (with `bFrom <= aTo`, the anchor `max` can equal `aTo` exactly).
 *
 * Any existing equi-conjunct means Spark already plans a hash join —
 * the rule stands down. Semantics are LITERAL-predicate-preserving: a
 * null bound matches nothing in both forms (null bin never
 * equi-matches, and the residual filters below drop null counts exactly
 * where the predicate is null); point-shape empty/inverted intervals
 * match nothing (the predicate itself is unsatisfiable, and the
 * validity filter only drops rows the predicate already excludes); and
 * overlap-shape degenerate intervals that still satisfy the raw
 * predicate (an empty `[x, x)` strictly inside the other side) are
 * KEPT — which is where this rule deliberately diverges from
 * `RangeJoin.intervalOverlapJoin`'s documented set-overlap contract.
 *
 * EXPLOSION CAP. An unbounded interval (an SCD2-style open-ended
 * 9999-12-31 upper bound is common in exactly the naive SQL this rule
 * targets) would explode into millions of bins per row — trading a slow
 * BNLJ for an OOM. `spark.graft.binRangeJoin.maxBinsPerRow` (default
 * 4096) bounds the explosion: rows whose bin count fits the cap take
 * the binned equi-join; rows above it take a RESIDUAL branch that keeps
 * the original nested-loop plan, restricted to just those rows, and the
 * two are unioned (three branches for the overlap shape: shortA×shortB
 * binned, longA×all, shortA×longB). The residual join's condition is
 * wrapped in a pass-through marker so this rule — which runs in a
 * fixpoint batch — never re-matches its own output. When no row
 * exceeds the cap (the common case) AQE's empty-relation propagation
 * collapses the residual branch at runtime: the final adaptive plan
 * carries no nested loop, at the cost of one cheap scan of the
 * interval side. A workload whose intervals routinely exceed the cap
 * should raise `binSeconds` toward its typical interval length (or cap
 * open-ended bounds before joining) — the residual keeps it correct
 * and OOM-free either way.
 *
 * Conf: `spark.graft.binRangeJoin.enabled` (default true when the rule
 * is injected), `spark.graft.binRangeJoin.binSeconds` (default 3600 —
 * pick near the typical interval length: smaller bins inflate the
 * explosion, larger ones degrade toward the loop within a bin),
 * `spark.graft.binRangeJoin.maxBinsPerRow` (default 4096). Malformed
 * or non-positive conf values make the rule stand down (plan returned
 * unchanged) — an optimizer rule must never fail the query over a
 * bad setting.
 */
object AutoBinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.binRangeJoin.enabled"
  private val BinSecondsKey = "spark.graft.binRangeJoin.binSeconds"
  private val MaxBinsKey = "spark.graft.binRangeJoin.maxBinsPerRow"

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

  /** Last bin an interval's upper bound reaches: `bin(hi − 1µs)` for a
    * strict (exclusive) upper, `bin(hi)` for an inclusive one. */
  private def lastBin(hi: Expression, w: Long, upperStrict: Boolean)
      : Expression =
    if (upperStrict) binOfToExclusive(hi, w) else binOf(hi, w)

  /** Bins the point-shape explosion emits: lastBin − bin(lo) + 1 (long;
    * ≤ 0 for empty/inverted intervals, null when a bound is null). */
  private def binCount(lo: Expression, hi: Expression, w: Long,
      upperStrict: Boolean): Expression =
    Add(Subtract(lastBin(hi, w, upperStrict), binOf(lo, w)), Literal(1L))

  /** Bins the clamped overlap-shape explosion emits:
    * greatest(lastBin, bin(lo)) − bin(lo) + 1 — minimum 1 (degenerate
    * intervals emit their from-bin), null when a bound is null. */
  private def clampedBinCount(lo: Expression, hi: Expression, w: Long,
      upperStrict: Boolean): Expression = {
    val start = binOf(lo, w)
    Add(Subtract(Greatest(Seq(lastBin(hi, w, upperStrict), start)), start),
      Literal(1L))
  }

  /** (aFrom, aTo, bFrom, bTo, aUpperStrict, bUpperStrict) — left-side
    * bounds, right-side bounds, and the strictness of the conjunct
    * bounding each side's upper endpoint — when the condition is exactly
    * the two overlap conjuncts `aFrom OP bTo AND bFrom OP aTo`, OP ∈
    * {<, <=} independently (any operand/conjunct order). */
  private def overlapShape(j: Join): Option[(Expression, Expression,
      Expression, Expression, Boolean, Boolean)] = {
    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
    if (conjuncts.length != 2) return None
    (cmp(conjuncts.head), cmp(conjuncts(1))) match {
      case (Some((x1, y1, s1)), Some((x2, y2, s2))) =>
        val all = Seq(x1, y1, x2, y2)
        if (all.exists(_.dataType != TimestampType)) return None
        val (lOut, rOut) = (j.left.outputSet, j.right.outputSet)
        def l(e: Expression) = e.references.nonEmpty &&
          e.references.subsetOf(lOut)
        def r(e: Expression) = e.references.nonEmpty &&
          e.references.subsetOf(rOut)
        // x1 OP y1 ∧ x2 OP y2 is the overlap iff one conjunct crosses
        // left→right and the other right→left: (aFrom OP bTo, bFrom OP
        // aTo). The conjunct bounding a side's TO is the one whose
        // strictness decides that side's last bin.
        val m =
          if (l(x1) && r(y1) && r(x2) && l(y2))
            Some((x1, y2, x2, y1, s2, s1)) // c1 bounds bTo, c2 bounds aTo
          else if (r(x1) && l(y1) && l(x2) && r(y2))
            Some((x2, y1, x1, y2, s1, s2)) // c1 bounds aTo, c2 bounds bTo
          else None
        // degenerate sides (aFrom ≡ aTo) are point shapes, not intervals —
        // rangeShape handles those; Filter(from < to) here would wrongly
        // drop every row
        m.filterNot { case (aF, aT, bF, bT, _, _) =>
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
    val gen = Explode(Sequence(binOf(lo, w), lastBin(hi, w, upperStrict),
      None, Some(conf.sessionLocalTimeZone)))
    val el = gen.elementSchema.head
    val bin = AttributeReference(name, el.dataType, el.nullable)()
    val nonEmpty = if (upperStrict) LessThan(lo, hi)
      else LessThanOrEqual(lo, hi)
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bin),
      child = Filter(nonEmpty, side)), bin)
  }

  /** Overlap-side explosion: `sequence(bin(from), greatest(lastBin,
    * bin(from)))` — no validity filter, minimum one bin (the from-bin),
    * always ascending so Sequence's default +1 step applies. */
  private def explodedBinsClamped(side: LogicalPlan, lo: Expression,
      hi: Expression, w: Long, name: String, upperStrict: Boolean)
      : (LogicalPlan, Attribute) = {
    val start = binOf(lo, w)
    val gen = Explode(Sequence(start,
      Greatest(Seq(lastBin(hi, w, upperStrict), start)),
      None, Some(conf.sessionLocalTimeZone)))
    val el = gen.elementSchema.head
    val bin = AttributeReference(name, el.dataType, el.nullable)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bin), child = side), bin)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    // malformed/non-positive conf values: stand down, never fail the query
    val binSecs =
      Try(conf.getConfString(BinSecondsKey, "3600").trim.toLong).getOrElse(-1L)
    val maxBins =
      Try(conf.getConfString(MaxBinsKey, "4096").trim.toLong).getOrElse(-1L)
    if (binSecs <= 0 || maxBins <= 0) return plan
    val w = binSecs * 1000000L
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) if rangeShape(j).isDefined =>
        val (ts, lo, hi, upperStrict, pointIsLeft) = rangeShape(j).get
        val (point, interval) = if (pointIsLeft) (j.left, j.right)
          else (j.right, j.left)
        val binP = Alias(binOf(ts, w), "_graft_bin_p")()
        val pointProj = Project(point.output :+ binP, point)
        val cnt = binCount(lo, hi, w, upperStrict)
        val (intervalGen, binI) = explodedBins(
          Filter(LessThanOrEqual(cnt, Literal(maxBins)), interval),
          lo, hi, w, "_graft_bin_i", upperStrict)
        val newCond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
        val rejoined =
          if (pointIsLeft) j.copy(left = pointProj, right = intervalGen,
            condition = Some(newCond))
          else j.copy(left = intervalGen, right = pointProj,
            condition = Some(newCond))
        // residual: intervals whose explosion would exceed the cap keep
        // the original nested-loop plan restricted to just those rows.
        // The broadcast hint pins the BUILD side to the filtered-long
        // side: over-cap intervals are outliers by construction, and a
        // runtime-empty build side is a materialized stage AQE's
        // empty-relation propagation can SEE — without the hint the
        // planner may build the point side and stream the empty filter,
        // whose emptiness is never observed (branch survives + the big
        // side gets broadcast)
        val longF = Filter(GreaterThan(cnt, Literal(maxBins)), interval)
        val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
        val residual = j.copy(
          left = if (pointIsLeft) j.left else longF,
          right = if (pointIsLeft) longF else j.right,
          condition = Some(GraftNoRewrite(j.condition.get)),
          hint = if (pointIsLeft) JoinHint(None, bcast)
            else JoinHint(bcast, None))
        Union(Seq(Project(j.output, rejoined), Project(j.output, residual)),
          byName = false, allowMissingCol = false)

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
        // m = aFrom (the clamp bin) or m = bFrom, where `bFrom OP aTo`
        // gives bin(m) ≤ bin(aTo−1µs) for strict OP and ≤ bin(aTo) for
        // inclusive OP — each side's last bin per ITS strictness —
        // in-range either way; symmetric for b.
        val (aFrom, aTo, bFrom, bTo, aStrict, bStrict) = overlapShape(j).get
        val cntA = clampedBinCount(aFrom, aTo, w, aStrict)
        val cntB = clampedBinCount(bFrom, bTo, w, bStrict)
        val shortA = LessThanOrEqual(cntA, Literal(maxBins))
        val (aGen, binA) = explodedBinsClamped(Filter(shortA, j.left),
          aFrom, aTo, w, "_graft_bin_a", aStrict)
        val (bGen, binB) = explodedBinsClamped(
          Filter(LessThanOrEqual(cntB, Literal(maxBins)), j.right),
          bFrom, bTo, w, "_graft_bin_b", bStrict)
        val anchor = EqualTo(binA,
          Floor(Divide(Cast(Greatest(Seq(UnixMicros(aFrom),
            UnixMicros(bFrom))), DoubleType), Literal(w.toDouble))))
        val newCond = And(EqualTo(binA, binB), And(anchor, j.condition.get))
        val binned = j.copy(left = aGen, right = bGen,
          condition = Some(newCond))
        // residual branches (disjoint, complete): longA × all, then
        // shortA × longB — nested loops over the over-cap outliers only,
        // each hinted to broadcast its filtered-long side (outliers by
        // construction; empty build stages are AQE-collapsible — see the
        // point-shape residual comment)
        val marked = Some(GraftNoRewrite(j.condition.get))
        val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
        val resA = j.copy(
          left = Filter(GreaterThan(cntA, Literal(maxBins)), j.left),
          condition = marked, hint = JoinHint(bcast, None))
        val resB = j.copy(left = Filter(shortA, j.left),
          right = Filter(GreaterThan(cntB, Literal(maxBins)), j.right),
          condition = marked, hint = JoinHint(None, bcast))
        Union(Seq(Project(j.output, binned), Project(j.output, resA),
          Project(j.output, resB)), byName = false, allowMissingCol = false)
    }
  }
}

/**
 * Pass-through boolean marker: evaluates (and codegens) exactly as its
 * child. `AutoBinRangeJoin` wraps the residual joins' conditions in it so
 * the rule — which runs inside a fixpoint optimizer batch — never
 * re-matches its own output (the residual condition is the ORIGINAL
 * two-conjunct range predicate, which would otherwise re-fire the
 * rewrite forever). No builtin rule simplifies through an expression it
 * doesn't know, so the marker survives the batch; it costs nothing at
 * runtime.
 */
private[plans] case class GraftNoRewrite(child: Expression)
    extends UnaryExpression with Predicate {
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression)
      : GraftNoRewrite = copy(child = newChild)
}
