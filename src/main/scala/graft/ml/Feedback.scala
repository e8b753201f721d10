package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Feedback-loop analytics over prediction/feedback logs — the MLOps
 * surface the reference DECLARES but stubs out (reference:
 * src/ml/feedback_logging.py:458-499 `compute_feedback_metrics` returns
 * a hard-coded zero dict; :416-456 `generate_training_data` returns an
 * empty frame; log schemas at feedback_logging.py:100-150 and
 * src/models/database.py:183-275). This object implements the declared
 * contracts as relational plans.
 *
 * Log schemas (column contracts, enforced by usage):
 *  - predictions: prediction_id, model_version, score, created_at,
 *    plus any feature columns (reference PredictionLog — features ride
 *    as real columns here, not a JSON blob: they feed retraining).
 *  - feedback: prediction_id, feedback_type, created_at, outcome_value
 *    (nullable; revenue when converted) — reference FeedbackLog with
 *    FeedbackType ∈ {viewed, clicked, accepted, rejected, converted,
 *    ignored} (feedback_logging.py:46-53).
 *
 * Scale: every entry point pre-aggregates the feedback log FIRST
 * (partial-agg map-side combine collapses the high-volume event stream
 * to one row per prediction or per prediction-day) and only then joins
 * the prediction log — the join never sees raw feedback volume. The
 * final rollups key on (model_version, window) — tiny cardinality — and
 * the variant comparison joins a one-row broadcast control. Work is one
 * pass over each log; nothing is quadratic, nothing collects.
 */
object Feedback {

  /** FeedbackType → label contribution (reference semantics: an
    * impression is the recommendation being SHOWN — viewed or ignored). */
  val ImpressionTypes: Seq[String] = Seq("viewed", "ignored")

  /**
   * The `compute_feedback_metrics` contract (feedback_logging.py:458-499)
   * as one aggregation pass, per (model_version, day window):
   * impressions / clicks / CTR / accepts / accept rate / conversions /
   * conversion rate / total revenue / avg revenue per conversion. Rates
   * guard zero denominators (0.0, matching the reference's zero dict).
   * Revenue sums ride DECIMAL for cross-engine determinism.
   */
  // ---- shared metric expressions (parity by construction) ----
  // The batch rollup below and the streaming twin
  // (Streams.feedbackMetricsStream) must produce IDENTICAL math —
  // FeedbackStreamSpec proves drain ≡ batch, but the guarantee is
  // maintained structurally by both composing these same expressions,
  // not by keeping two hand-mirrored copies in sync.

  /** Per-row 0/1 counter cells over `feedback_type`. */
  private[graft] def impressionCell: Column =
    when(col("feedback_type").isin(ImpressionTypes: _*), 1L).otherwise(0L)
  private[graft] def typeCell(t: String): Column =
    when(col("feedback_type") === t, 1L).otherwise(0L)
  /** Revenue cell: DECIMAL, conversions only. */
  private[graft] def revenueCell: Column =
    when(col("feedback_type") === "converted",
      coalesce(col("outcome_value"), lit(0.0))).otherwise(0.0)
      .cast("decimal(18,6)")
  private[graft] def guardedRate(n: Column, d: Column): Column =
    round(when(d > 0, n.cast("double") / d).otherwise(0.0), 6)

  /** The 11-column metrics contract over a frame carrying the summed
    * counters (impression_count/click_count/accept_count/
    * conversion_count/rev) — `versionCol`/`dayCol` name the grouping
    * columns of the caller. */
  private[graft] def metricColumns(versionCol: Column,
                                   dayCol: Column): Seq[Column] = Seq(
    versionCol, dayCol,
    col("impression_count"), col("click_count"),
    guardedRate(col("click_count"), col("impression_count")).as("ctr"),
    col("accept_count"),
    guardedRate(col("accept_count"), col("impression_count"))
      .as("accept_rate"),
    col("conversion_count"),
    guardedRate(col("conversion_count"), col("impression_count"))
      .as("conversion_rate"),
    round(col("rev").cast("double"), 2).as("total_revenue"),
    round(when(col("conversion_count") > 0,
      col("rev").cast("double") / col("conversion_count"))
      .otherwise(0.0), 2).as("avg_revenue_per_conversion"))

  def feedbackMetrics(predictions: DataFrame, feedback: DataFrame): DataFrame = {
    val perPredDay = feedback
      .groupBy(col("prediction_id"), to_date(col("created_at")).as("window_day"))
      .agg(
        sum(impressionCell).as("n_impr"),
        sum(typeCell("clicked")).as("n_click"),
        sum(typeCell("accepted")).as("n_accept"),
        sum(typeCell("converted")).as("n_conv"),
        sum(revenueCell).as("revenue"))
    perPredDay
      .join(predictions.select("prediction_id", "model_version"),
        "prediction_id")
      .groupBy("model_version", "window_day")
      .agg(sum("n_impr").as("impression_count"),
        sum("n_click").as("click_count"),
        sum("n_accept").as("accept_count"),
        sum("n_conv").as("conversion_count"),
        sum("revenue").as("rev"))
      .select(metricColumns(col("model_version"), col("window_day")): _*)
  }

  /**
   * The `generate_training_data` contract (feedback_logging.py:416-456):
   * feedback after `cutoff` (asOf − lookback, passed resolved so the
   * operator stays deterministic), positive/negative FeedbackType
   * mapping, one label per prediction, model versions below
   * `minFeedbackCount` labeled examples dropped, prediction features
   * carried through for retraining.
   *
   * Label contract (the reference leaves it unspecified — stub):
   * a prediction with ANY positive feedback labels 1.0 (the strongest
   * signal wins: a rec viewed, clicked and converted is a positive);
   * else any negative feedback labels 0.0; predictions with neither
   * (viewed-only — the reference's "uncertain, use for calibration")
   * are EXCLUDED from the training frame.
   */
  def trainingData(predictions: DataFrame, feedback: DataFrame,
                   cutoff: Column,
                   positiveTypes: Seq[String] = Seq("converted", "accepted"),
                   negativeTypes: Seq[String] = Seq("rejected"),
                   minFeedbackCount: Long = 100L): DataFrame = {
    val labeled = feedback
      .filter(col("created_at") >= cutoff)
      .groupBy("prediction_id")
      .agg(max(when(col("feedback_type").isin(positiveTypes: _*), 1)
          .otherwise(0)).as("has_pos"),
        max(when(col("feedback_type").isin(negativeTypes: _*), 1)
          .otherwise(0)).as("has_neg"))
      .filter(col("has_pos") === 1 || col("has_neg") === 1)
      .select(col("prediction_id"),
        when(col("has_pos") === 1, 1.0).otherwise(0.0).as("label"))
    val frame = predictions.join(labeled, "prediction_id")
    // min-feedback gate: versions with too few labeled examples are not
    // retrainable signal (reference min_feedback_count) — the version
    // list is tiny, so the keep-set joins back as a broadcast
    val keep = frame.groupBy("model_version")
      .agg(count(lit(1)).as("n_labeled"))
      .filter(col("n_labeled") >= minFeedbackCount)
      .select("model_version")
    frame.join(broadcast(keep), "model_version")
  }

  /**
   * A/B variant comparison with a two-proportion z-test against the
   * control variant (the statistical core of the reference's
   * ABTestManager promote/rollback decision, feedback_logging.py:502-595
   * — the reference declares the manager but never computes
   * significance; this is the standard pooled two-proportion test as
   * pure column arithmetic). Success = `successType` feedback; trials =
   * impressions. Output per variant: counts, rates, the control's rate,
   * `z` (positive = variant beats control), and the gate decision:
   * 'control' for the control row, 'promote' when z > zCrit, 'rollback'
   * when z < −zCrit, 'hold' otherwise.
   *
   * The per-variant rollup is a handful of rows; the control's counts
   * re-enter via an UNPARTITIONED window over that tiny frame (single
   * task on |variants| rows) rather than a self-join — a self-join
   * would recompute the whole rollup, i.e. a second full pass over the
   * feedback log. Degenerate cells (zero trials on either side, a
   * missing control variant, or a pooled rate of 0 or 1 → zero
   * variance) define z = 0 — 'hold', never a division blow-up and
   * never a silently-empty result.
   */
  def variantComparison(predictions: DataFrame, feedback: DataFrame,
                        control: String,
                        successType: String = "converted",
                        zCrit: Double = 1.96): DataFrame = {
    val perPred = feedback.groupBy("prediction_id")
      .agg(sum(impressionCell).as("n_impr"),
        sum(typeCell(successType)).as("n_succ"))
    val byVariant = perPred
      .join(predictions.select("prediction_id", "model_version"),
        "prediction_id")
      .groupBy("model_version")
      .agg(sum("n_impr").as("trials"), sum("n_succ").as("successes"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val joined = byVariant
      .withColumn("c_trials",
        max(when(col("model_version") === control, col("trials"))).over(all))
      .withColumn("c_successes",
        max(when(col("model_version") === control, col("successes"))).over(all))
    val p = col("successes").cast("double") / col("trials")
    val pc = col("c_successes").cast("double") / col("c_trials")
    val pool = (col("successes") + col("c_successes")).cast("double") /
      (col("trials") + col("c_trials"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("trials") + lit(1.0) / col("c_trials")))
    val z = when(col("trials") === 0 ||
        coalesce(col("c_trials"), lit(0L)) === 0 ||
        col("model_version") === control, 0.0)
      .otherwise(when(se > 0, (p - pc) / se).otherwise(0.0))
    // guardedRate's d > 0 is null-safe (a missing control → null trials
    // → false → 0.0), so both rates ride the shared helper
    joined.select(col("model_version"), col("trials"), col("successes"),
      guardedRate(col("successes"), col("trials")).as("rate"),
      guardedRate(col("c_successes"), col("c_trials")).as("control_rate"),
      round(z, 6).as("z"),
      when(col("model_version") === control, "control")
        .when(z > zCrit, "promote")
        .when(z < -zCrit, "rollback")
        .otherwise("hold").as("decision"))
  }
}
