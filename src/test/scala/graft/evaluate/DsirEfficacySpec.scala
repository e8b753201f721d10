package graft.evaluate

import graft.SparkSpec

/**
 * DSIR end-to-end efficacy gate (VERDICT r14 #6 — the ablation Xie et
 * al. §5 runs): with a fixed token budget, a quality model trained on
 * the DSIR-selected subset must beat the same model trained on a
 * uniformly-random subset of the same pool, evaluated on held-out
 * TARGET-domain data. The pool's off-domain half carries an INVERTED
 * feature-label relation, so selection quality translates directly
 * into downstream AUC — see `MetricsLedger.dsirEfficacyMetrics` for
 * the planted mechanism and why nothing leaks the label to the
 * selector.
 */
class DsirEfficacySpec extends SparkSpec {

  private lazy val m =
    MetricsLedger.dsirEfficacyMetrics(spark).toMap

  test("DSIR-selected training beats random-selected at equal budget " +
      "on target-domain holdout AUC") {
    val dsir = m("dsir_efficacy_dsir_auc")
    val rand = m("dsir_efficacy_random_auc")
    assert(dsir > rand + 0.05,
      s"DSIR-trained AUC $dsir must beat random-trained $rand by > 0.05")
    assert(dsir > 0.75, s"DSIR-trained model must actually learn: $dsir")
  }

  test("the selector's advantage is real selection, not chance: the " +
      "DSIR draw is dominated by target-like docs") {
    assert(m("dsir_efficacy_select_target_frac") > 0.8,
      s"target-like fraction ${m("dsir_efficacy_select_target_frac")}")
  }
}
