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
 * Guards: INNER joins whose condition is EXACTLY the two range
 * conjuncts over TIMESTAMP columns, point column on one side and both
 * interval bounds on the other. Any existing equi-conjunct means Spark
 * already plans a hash join — the rule stands down. Null semantics are
 * preserved by construction: a null ts/from/to row matches nothing in
 * both forms (null bin never equi-matches; `from < to` null-drops), and
 * empty/inverted intervals match nothing in both forms.
 *
 * Conf: `spark.graft.binRangeJoin.enabled` (default true when the rule
 * is injected), `spark.graft.binRangeJoin.binSeconds` (default 3600 —
 * pick near the typical interval length: smaller bins inflate the
 * explosion, larger ones degrade toward the loop within a bin).
 */
object AutoBinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.binRangeJoin.enabled"
  private val BinSecondsKey = "spark.graft.binRangeJoin.binSeconds"

  /** (point ts, interval from, interval to, pointIsLeft) when the join
    * condition is exactly the two range conjuncts. */
  private def rangeShape(j: Join): Option[(Expression, Expression,
      Expression, Boolean)] = {
    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
    if (conjuncts.length != 2) return None
    // normalize each conjunct to (point, bound, isLowerBound)
    def norm(e: Expression): Option[(Expression, Expression, Boolean)] =
      e match {
        case GreaterThanOrEqual(ts, lo) => Some((ts, lo, true))  // ts >= lo
        case LessThanOrEqual(lo, ts) => Some((ts, lo, true))     // lo <= ts
        case LessThan(ts, hi) => Some((ts, hi, false))           // ts < hi
        case GreaterThan(hi, ts) => Some((ts, hi, false))        // hi > ts
        case _ => None
      }
    (norm(conjuncts.head), norm(conjuncts(1))) match {
      case (Some((ts1, lo, true)), Some((ts2, hi, false)))
          if ts1.semanticEquals(ts2) => shape(j, ts1, lo, hi)
      case (Some((ts1, hi, false)), Some((ts2, lo, true)))
          if ts1.semanticEquals(ts2) => shape(j, ts1, lo, hi)
      case _ => None
    }
  }

  private def shape(j: Join, ts: Expression, lo: Expression,
      hi: Expression): Option[(Expression, Expression, Expression, Boolean)] = {
    if (ts.dataType != TimestampType || lo.dataType != TimestampType ||
      hi.dataType != TimestampType) return None
    val (lOut, rOut) = (j.left.outputSet, j.right.outputSet)
    def onLeft(e: Expression) = e.references.subsetOf(lOut) &&
      e.references.nonEmpty
    def onRight(e: Expression) = e.references.subsetOf(rOut) &&
      e.references.nonEmpty
    if (onLeft(ts) && onRight(lo) && onRight(hi)) Some((ts, lo, hi, true))
    else if (onRight(ts) && onLeft(lo) && onLeft(hi)) Some((ts, lo, hi, false))
    else None
  }

  /** floor(us(e) / w) — the identical arithmetic RangeJoin spells with
    * the Column API (long micros → double divide → floor → long). */
  private def binOf(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(UnixMicros(e), DoubleType), Literal(w.toDouble)))

  private def binOfToExclusive(e: Expression, w: Long): Expression =
    Floor(Divide(Cast(Subtract(UnixMicros(e), Literal(1L)), DoubleType),
      Literal(w.toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    val w = conf.getConfString(BinSecondsKey, "3600").toLong * 1000000L
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) if rangeShape(j).isDefined =>
        val (ts, lo, hi, pointIsLeft) = rangeShape(j).get
        val (point, interval) = if (pointIsLeft) (j.left, j.right)
          else (j.right, j.left)
        val binP = Alias(binOf(ts, w), "_graft_bin_p")()
        val pointProj = Project(point.output :+ binP, point)
        // Sequence is TimeZoneAwareExpression: resolved only once a zone
        // is bound (irrelevant for LONG sequences, still required)
        val gen = Explode(Sequence(binOf(lo, w), binOfToExclusive(hi, w),
          None, Some(conf.sessionLocalTimeZone)))
        val el = gen.elementSchema.head
        val binI = AttributeReference("_graft_bin_i", el.dataType,
          el.nullable)()
        val intervalGen = Generate(gen, unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binI),
          child = Filter(LessThan(lo, hi), interval))
        val newCond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
        val rejoined =
          if (pointIsLeft) j.copy(left = pointProj, right = intervalGen,
            condition = Some(newCond))
          else j.copy(left = intervalGen, right = pointProj,
            condition = Some(newCond))
        Project(j.output, rejoined)
    }
  }
}
