package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PSI drift detector: identical windows score ~0, a shifted window
  * crosses the conventional 0.2 investigate threshold, reference deciles
  * are exact. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psi(ref: org.apache.spark.sql.DataFrame,
                  cur: org.apache.spark.sql.DataFrame): Double =
    Drift.psiBins(ref, cur, col("v"))
      .agg(sum("psi_term")).head.getDouble(0)

  test("identical distributions → PSI ≈ 0; shifted distribution → PSI > 0.2") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    assert(psi(ref, ref) < 1e-9)
    // hard shift: current mass sits in the top reference decile
    val shifted = (1 to 1000).map(i => 900.0 + i / 100.0).toDF("v")
    assert(psi(ref, shifted) > 0.2)
  }

  test("reference deciles are exact: each reference bin holds 1/bins of the mass") {
    val ref = (1 to 500).map(_.toDouble).toDF("v")
    val out = Drift.psiBins(ref, ref, col("v")).collect()
    assert(out.length === 10)
    out.foreach(r => assert(math.abs(r.getDouble(1) - 0.1) < 1e-9,
      s"bin ${r.getInt(0)} p_ref=${r.getDouble(1)}"))
  }

  test("approx (sketch-edge) PSI tracks the exact form on smooth data") {
    val ref = (1 to 5000).map(_.toDouble).toDF("v")
    val cur = (1 to 5000).map(i => i * 1.4).toDF("v") // mild scale drift
    val exact = psi(ref, cur)
    val approx = Drift.psiBinsApprox(ref, cur, col("v"))
      .agg(sum("psi_term")).head.getDouble(0)
    assert(math.abs(exact - approx) < 0.02,
      s"exact=$exact approx=$approx must agree within sketch accuracy")
    assert(approx > 0.05, "drift must still register through the sketch path")
  }

  test("null scores are excluded from both windows (no spurious bin-0 drift)") {
    val clean = (1 to 500).map(i => Some(i.toDouble)).toDF("v")
    val dirty = ((1 to 500).map(i => Some(i.toDouble)) ++
      Seq.fill(100)(Option.empty[Double])).toDF("v")
    // identical non-null distribution + nulls on either side → still ~0
    assert(psi(dirty, clean) < 1e-9)
    assert(psi(clean, dirty) < 1e-9)
  }

  test("monitored column need not be named 'v' (both forms)") {
    // regression: psiBinsApprox once hardcoded col("v") for the current
    // frame, so a cur frame without a 'v' column threw (or silently
    // scored the wrong column)
    val ref = (1 to 2000).map(_.toDouble).toDF("score")
    val cur = (1 to 2000).map(i => i * 1.4).toDF("score")
    val exact = Drift.psiBins(ref, cur, col("score"))
      .agg(sum("psi_term")).head.getDouble(0)
    val approx = Drift.psiBinsApprox(ref, cur, col("score"))
      .agg(sum("psi_term")).head.getDouble(0)
    assert(exact > 0.05 && approx > 0.05)
    assert(math.abs(exact - approx) < 0.02)
    // a decoy 'v' column must NOT be the one scored: monitored column
    // is constant → PSI ≈ 0 even though 'v' is wildly drifted
    val curDecoy = (1 to 2000)
      .map(i => (500.0, i * 1000.0)).toDF("score", "v")
    val refC = (1 to 2000).map(_ => 500.0).toDF("score")
    assert(Drift.psiBinsApprox(refC, curDecoy, col("score"))
      .agg(sum("psi_term")).head.getDouble(0) < 1e-6)
  }

  test("empty current bins get the epsilon floor, not infinity") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(1.0, 2.0, 3.0).toDF("v") // all mass in bin 0
    val out = Drift.psiBins(ref, cur, col("v")).collect()
    assert(out.forall(r => !r.getDouble(3).isInfinite && !r.getDouble(3).isNaN))
  }
}
