package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Pure-column scoring math shared by the MLlib ensemble and the
 * deterministic (model-free) scoring path (reference:
 * src/ml/pipeline.py:269-290 weighted vote, :375-389 consensus
 * confidence; config/ml_config.yaml:4-10 weights).
 *
 * Everything here is a codegen'd Column expression — per-row math that
 * fuses into the surrounding stage, shuffles nothing, and scales linearly
 * with partition count. At 100 TB the score columns are computed inside
 * the same whole-stage-codegen span as the pair join that produced
 * their inputs.
 */
object Scoring {

  /** Reference ensemble weights (ml_config.yaml:4-10): nn .3, xgb .3,
    * rf .2, gbt .2. Keys are model names, order irrelevant. */
  val referenceWeights: Seq[(String, Double)] =
    Seq("nn" -> 0.3, "xgb" -> 0.3, "rf" -> 0.2, "gbt" -> 0.2)

  /** Weighted ensemble vote over per-model P(1) columns
    * (reference: pipeline.py:285-288). Weights are renormalized to sum 1
    * so a subset of models still yields a [0,1] score. */
  def weightedVote(scores: Seq[(Column, Double)]): Column = {
    val total = scores.map(_._2).sum
    scores.map { case (c, w) => c * (w / total) }.reduce(_ + _)
  }

  /** Population standard deviation across N per-row score columns
    * (reference: pipeline.py:380 `np.std` — population, ddof=0; NOT
    * Spark's sample stddev aggregate). Row-wise expression, not a
    * grouped aggregate (SURVEY A12). */
  def consensusStd(scores: Seq[Column]): Column = {
    val n = scores.size
    val mean = scores.reduce(_ + _) / n
    sqrt(scores.map(s => pow(s - mean, 2)).reduce(_ + _) / n)
  }

  /** Confidence bucketing from score + consensus spread
    * (reference: pipeline.py:382-389 F17). */
  def confidenceLevel(score: Column, stdDev: Column): Column =
    when(score > 0.8 && stdDev < 0.1, "Very High")
      .when(score > 0.7 && stdDev < 0.15, "High")
      .when(score > 0.6, "Medium")
      .otherwise("Low")

  /** Score-only confidence variant used by the serving path
    * (reference: api/main.py:610-617). */
  def confidenceLevelScoreOnly(score: Column): Column =
    when(score > 0.8, "High").when(score > 0.6, "Medium").otherwise("Low")

  /** Pair opportunity value: 10% of the mean pair revenue (reference:
    * pipeline.py estimated_value). Single definition — q35's
    * oracle-gated frame and the pipeline runner's digest both read it. */
  def estimatedPairValue(aRevenue: Column, bRevenue: Column): Column =
    round((aRevenue + bRevenue) / 2 * 0.1, 2)

  /** Next-best-action by score band (reference: pipeline.py
    * next_best_action). Same single-definition contract as
    * [[estimatedPairValue]]. */
  def nextBestAction(score: Column): Column =
    when(score > 0.8, "Schedule executive introduction call immediately")
      .when(score > 0.7, "Prepare joint value proposition and reach out")
      .when(score > 0.6, "Add to nurture campaign and monitor engagement")
      .otherwise("Review quarterly for status changes")
}
