package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Distribution-drift detection: Population Stability Index between a
 * reference window and a current window of the same column — the
 * model-monitoring generalization of the reference's quality-monitor
 * rollup (`data_contracts.py:216-231` tracks validation pass rates;
 * PSI tracks the DATA moving under a trained model; >0.2 is the
 * conventional "investigate" threshold).
 *
 * Bin edges are ORDER STATISTICS of the reference window (value at rank
 * ceil(n·x/bins) — engine-exact, same discipline as
 * `RobustStats.winsorizedRollup`; interpolated quantiles drift across
 * engines in the last ulp and flip bin membership at the edge). The
 * edge selection sorts the reference window through one global window —
 * correct for monitoring windows, which are bounded by design (a day/week
 * of scores, a sampled baseline); for an unbounded reference switch the
 * edge source to `Sketches.approxQuantiles` (mergeable, no global sort)
 * and keep everything below identical.
 *
 * Proportions floor at `eps` so empty bins contribute a finite penalty
 * (the standard PSI convention) instead of ±∞.
 */
object Drift {

  def psiBins(ref: DataFrame, cur: DataFrame, v: Column,
              bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    // the slim ref values materialize ONCE: edge selection AND the ref
    // binning pass both read them (otherwise an expensive upstream ref
    // pipeline executes twice — the referenceProfile discipline); the
    // per-bin result is tiny, so it checkpoints eagerly and the value
    // frame frees instead of leaking into the session
    val vals = ref.select(v.cast("double").as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val edges = graft.operators.RobustStats.orderStatEdges(vals, col("v"), bins)
    val out = psiFromEdges(vals, cur, v, edges, bins, eps)
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(vals)
    out
  }

  /**
   * The unbounded-reference form: edges from the mergeable
   * Greenwald-Khanna sketch (`percentile_approx`) — one partial-agg pass,
   * NO global sort, so the reference window can be the whole corpus.
   * Edge values are approximate within the sketch's rank accuracy; bin
   * proportions (and so PSI) shift by at most that rank error per edge —
   * immaterial against the 0.1/0.2 decision thresholds. Not
   * oracle-checked (sketch internals are engine-specific); `DriftSpec`
   * gates it against [[psiBins]] instead.
   */
  def psiBinsApprox(ref: DataFrame, cur: DataFrame, v: Column,
                    bins: Int = 10, eps: Double = 1e-6,
                    accuracy: Int = 10000): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    // same materialize-once + free as psiBins
    val vals = ref.select(v.cast("double").as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val edges = graft.operators.Sketches
      .approxQuantiles(vals, Nil, col("v"), probs, accuracy)
      .select(sort_array(col("approx_quantiles")).as("e"))
    val out = psiFromEdges(vals, cur, v, edges, bins, eps)
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(vals)
    out
  }

  /** The reference side of a drift monitor, collected to the driver:
    * (bin edges, per-bin proportions) — `bins`−1 + `bins` doubles, the
    * broadcastable constants a STREAMING monitor scores against
    * ([[graft.streaming.Streams.psiDriftStream]]). Edges are the same
    * order statistics as [[psiBins]]; proportions are the reference's
    * own binning (so a stream identical in distribution to the
    * reference scores PSI ≈ 0). */
  def referenceProfile(ref: DataFrame, v: Column,
                       bins: Int = 10): (Seq[Double], Seq[Double]) = {
    require(bins > 1, "need at least 2 bins")
    // materialize the slim value frame ONCE: both the edge selection and
    // the count pass read it, so an expensive upstream ref pipeline is
    // never re-executed (the orderStatEdges discipline, extended to the
    // second pass); freed after the counts collect
    val vals = ref.select(v.cast("double").as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val n = vals.count()
    // fewer non-null rows than bins → colliding edge ranks → an
    // (edges, props) pair every consumer rejects; a profile that small
    // is not a reference distribution, fail at the source
    require(n >= bins,
      s"reference has $n non-null rows; need at least bins=$bins")
    val edges = graft.operators.RobustStats.orderStatEdges(vals, col("v"), bins)
      .head.getSeq[Double](0)
    val edgeArr = array(edges.map(lit): _*)
    val counts = vals
      .select(size(filter(edgeArr, x => x < col("v"))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(vals)
    val props = (0 until bins).map(b => counts.getOrElse(b, 0L) / n.toDouble)
    (edges, props)
  }

  private def psiFromEdges(refVals: DataFrame, cur: DataFrame, curV: Column,
                           edges: DataFrame, bins: Int, eps: Double): DataFrame = {
    // nulls are excluded from BOTH windows (a null would land in bin 0 —
    // `filter(e, _ < null)` is empty — inflating bin-0 drift); track null
    // RATE drift separately with Contracts' null profiling.
    // refVals arrives pre-projected to a non-null "v" column (the
    // materialize-once frame); cur binds through ITS caller column.
    def binned(df: DataFrame, v: Column): DataFrame =
      df.select(v.cast("double").as("v")).filter(col("v").isNotNull)
        .crossJoin(broadcast(edges))
        .select(size(filter(col("e"), x => x < col("v"))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
    val rb = binned(refVals, col("v")).select(col("bin"), col("c").as("rc"))
    val cb = binned(cur, curV).select(col("bin"), col("c").as("cc"))
    val allBins = refVals.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
    val withTotals = allBins
      .join(rb, Seq("bin"), "left").join(cb, Seq("bin"), "left")
      .select(col("bin"),
        (coalesce(col("rc"), lit(0L)).cast("double") /
          sum(coalesce(col("rc"), lit(0L))).over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))).as("p"),
        (coalesce(col("cc"), lit(0L)).cast("double") /
          sum(coalesce(col("cc"), lit(0L))).over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))).as("q"))
    val pf = greatest(col("p"), lit(eps))
    val qf = greatest(col("q"), lit(eps))
    withTotals.select(col("bin"), col("p").as("p_ref"), col("q").as("p_cur"),
      ((qf - pf) * log(qf / pf)).as("psi_term"))
  }
}
