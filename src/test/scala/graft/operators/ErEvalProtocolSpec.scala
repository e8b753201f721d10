package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.ErMatcher
import graft.operators.EntityResolution._
import graft.sources.Synthetic

/**
 * Reproduction of the reference ER evaluation protocol
 * (scripts/evaluate_entity_resolution.py:37-160; BASELINE.md "ER
 * evaluation protocol" row): synthetic variant corpus (seed 42, 15%
 * match rate) → rule-based P/R/F1 across thresholds → ML matcher with
 * CV → threshold sweep. The reference publishes the protocol, not the
 * values (computed at runtime) — gates here encode the invariants the
 * protocol is meant to demonstrate.
 */
class ErEvalProtocolSpec extends SparkSpec {

  private val cols = AccountCols()

  /** Labeled pairs hydrated with both sides' features (J5 broadcast
    * lookup shape) + rule score — fixture shared with the metric-golden
    * ledger (MetricsLedger.erScoredPairs; its P/R/F1 values land in
    * metrics_detail.json each bench run, this spec gates the invariants). */
  private lazy val scored: DataFrame =
    graft.evaluate.MetricsLedger.erScoredPairs(spark).cache()

  private def prf(df: DataFrame, threshold: Double): (Double, Double, Double) = {
    val m = confusionMetrics(
      df.withColumn("pred", col("score") >= threshold),
      col("pred"), col("is_match") === 1).head
    (m.getAs[Double]("precision"), m.getAs[Double]("recall"),
      m.getAs[Double]("f1"))
  }

  test("rule-based sweep: precision rises and recall falls with threshold") {
    val sweep = Seq(0.6, 0.7, 0.8, 0.9).map(t => t -> prf(scored, t))
    sweep.foreach { case (t, (p, r, f)) =>
      info(f"threshold $t: P=$p%.3f R=$r%.3f F1=$f%.3f")
    }
    val ps = sweep.map(_._2._1)
    val rs = sweep.map(_._2._2)
    assert(ps == ps.sorted, "precision must be non-decreasing in threshold")
    assert(rs == rs.sorted.reverse, "recall must be non-increasing in threshold")
    // at the reference's default threshold the rule engine must actually
    // separate variants from non-matches on this corpus
    val (_, _, f07) = prf(scored, 0.7)
    assert(f07 > 0.6, s"rule-based F1 at 0.7 = $f07 too weak")
  }

  test("ML matcher: CV F1 gate and comparable quality to rules") {
    val featureCols = pairFeatures.map(_._1)
    val train = scored.filter(col("_idx") % 10 < 7)   // deterministic 70/30
    val test = scored.filter(col("_idx") % 10 >= 7)
    val res = ErMatcher.train(train, featureCols, numFolds = 3,
      numTrees = 30, maxDepth = 8)
    info(f"CV F1 = ${res.cvF1Mean}%.3f on ${res.trainingSamples} pairs " +
      f"(positive rate ${res.positiveRate}%.3f)")
    assert(res.cvF1Mean > 0.8, s"ER CV F1 ${res.cvF1Mean} below gate")
    val mlScored = ErMatcher.score(res.model, test)
    val m = confusionMetrics(
      mlScored.withColumn("pred", col("match_score") >= 0.5),
      col("pred"), col("is_match") === 1).head
    val (pr, rr, fr) = prf(test, 0.7)
    info(f"ML@0.5: P=${m.getAs[Double]("precision")}%.3f " +
      f"R=${m.getAs[Double]("recall")}%.3f F1=${m.getAs[Double]("f1")}%.3f " +
      f"vs rules@0.7 F1=$fr%.3f")
    assert(m.getAs[Double]("f1") >= fr - 0.15,
      "ML matcher must be at least comparable to the rule engine")
  }
}
