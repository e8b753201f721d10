package graft.operators

import graft.SparkSpec
import graft.evaluate.AnnRecall

/**
 * Measured-recall floors for the ANN family (VERDICT r8 #6): the
 * approximate families trade recall for work by CONTRACT — this spec
 * asserts each family's documented collapse floor over the ONE shared
 * measurement (`evaluate.AnnRecall.measure`, the same computation the
 * bench's MetricsLedger records into `metrics_detail.json` with
 * cross-round move flagging), so a silent recall collapse (broken
 * bucketing, a changed deterministic codebook, an assignment bug that
 * still returns k rows) fails the suite AND trips the ledger.
 * Measured values are recorded in SCALING.md ("ANN measured recall").
 */
class AnnRecallSpec extends SparkSpec {

  private lazy val r = AnnRecall.measure(spark).toMap

  private val floors = Seq(
    ("ann_ivf_recall_at_10", 0.55, "IVF (5 lists, nprobe 2)"),
    ("ann_lsh_recall_at_10", 0.10, "LSH (16 sign buckets, single-probe)"),
    ("ann_pq_recall_at_10", 0.05, "PQ-ADC (m=4, 5 codes/subspace)"),
    ("ann_ivfpq_recall_at_10", 0.03, "IVF-PQ (nprobe 2 of 5 + ADC)"),
    ("ann_ivfpq_residual_recall_at_10", 0.03,
      "residual IVF-PQ (per-list ADC, residual codebook)"))

  floors.foreach { case (key, floor, label) =>
    test(s"$label recall@10 >= $floor floor, measured and ledgered") {
      val v = r(key)
      info(f"$label recall@10 = $v%.3f")
      assert(v >= floor, f"$label recall@10 collapsed: $v%.3f < $floor")
    }
  }

  test("fixture sanity: the protocol measured every family") {
    assert(r.keySet === floors.map(_._1).toSet)
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
  }
}
