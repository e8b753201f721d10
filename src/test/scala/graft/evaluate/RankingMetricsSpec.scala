package graft.evaluate

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Hand-computed goldens for the ranking metrics, mirroring the reference
 * formulas at scripts/evaluate.py:73-98 (DCG log2(i+2) discount, IDCG on
 * the full sorted label list, P@k = 0 when n < k).
 */
class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  // 6 candidates, scores descending by id for a fixed ranking:
  // relevances in score order = [1, 0, 1, 1, 0, 0]
  private lazy val df = Seq(
    (1, 0.9, 1), (2, 0.8, 0), (3, 0.7, 1),
    (4, 0.6, 1), (5, 0.4, 0), (6, 0.3, 0)
  ).toDF("id", "score", "label")

  private def log2d(x: Double) = math.log(x) / math.log(2)

  test("precision/recall/ndcg/coverage match hand computation") {
    val m = RankingMetrics.evaluate(df, col("score"), col("label"),
      tieBreak = Seq(col("id")), ks = Seq(5, 10)).head

    // P@5 = (1+0+1+1+0)/5 = 0.6 ; P@10 = 0 (only 6 rows)
    assert(math.abs(m.getAs[Double]("precision_at_5") - 0.6) < 1e-9)
    assert(m.getAs[Double]("precision_at_10") == 0.0)
    // R@5 = 3/3 = 1.0
    assert(math.abs(m.getAs[Double]("recall_at_5") - 1.0) < 1e-9)
    // DCG@5 = 1/log2(2) + 1/log2(4) + 1/log2(5); IDCG@5 = 1/log2(2)+1/log2(3)+1/log2(4)
    val dcg = 1 / log2d(2) + 1 / log2d(4) + 1 / log2d(5)
    val idcg = 1 / log2d(2) + 1 / log2d(3) + 1 / log2d(4)
    assert(math.abs(m.getAs[Double]("ndcg_at_5") - dcg / idcg) < 1e-9)
    // coverage = 4/6 scores > 0.5
    assert(math.abs(m.getAs[Double]("coverage") - 4.0 / 6) < 1e-9)
    assert(m.getAs[Long]("total_recommendations") == 6L)
    assert(m.getAs[Long]("relevant_items") == 3L)
  }

  test("perGroupNdcg: hand computation per group; no-relevant group NULL; " +
      "single-group value equals the global evaluate") {
    val grouped = Seq(
      // group A == the fixture above → same ndcg@5 as global evaluate
      ("A", 1, 0.9, 1), ("A", 2, 0.8, 0), ("A", 3, 0.7, 1),
      ("A", 4, 0.6, 1), ("A", 5, 0.4, 0), ("A", 6, 0.3, 0),
      // group B: relevant item ranked 2nd of 2 → ndcg = (1/log2 3)/(1/log2 2)
      ("B", 7, 0.9, 0), ("B", 8, 0.8, 1),
      // group C: nothing relevant → NULL, not 0
      ("C", 9, 0.9, 0), ("C", 10, 0.1, 0)
    ).toDF("g", "id", "score", "label")
    val out = RankingMetrics.perGroupNdcg(grouped, col("g"), col("score"),
        col("label"), 5, Seq(col("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val dcg = 1 / log2d(2) + 1 / log2d(4) + 1 / log2d(5)
    val idcg = 1 / log2d(2) + 1 / log2d(3) + 1 / log2d(4)
    assert(out("A")._1 === 6L && out("A")._2 === 3L)
    assert(math.abs(out("A")._3.get - dcg / idcg) < 1e-9)
    val globalA = RankingMetrics.evaluate(df, col("score"), col("label"),
      tieBreak = Seq(col("id")), ks = Seq(5)).head.getAs[Double]("ndcg_at_5")
    assert(math.abs(out("A")._3.get - globalA) < 1e-9)
    assert(math.abs(out("B")._3.get - log2d(2) / log2d(3)) < 1e-9)
    assert(out("C")._3 === None)
  }

  test("empty-relevant edge: recall and ndcg are 0, not NaN") {
    val none = df.withColumn("label", lit(0))
    val m = RankingMetrics.evaluate(none, col("score"), col("label"),
      tieBreak = Seq(col("id")), ks = Seq(5)).head
    assert(m.getAs[Double]("recall_at_5") == 0.0)
    assert(m.getAs[Double]("ndcg_at_5") == 0.0)
  }

  test("evaluateAtScale (window-free) equals evaluate on every metric, " +
      "including the n<k and empty-relevant edges, with no WindowExec") {
    // parity on the standard fixture, the short-list edge (n < k → P@k
    // = 0), and the no-relevant edge (recall/ndcg = 0)
    for (frame <- Seq(df, df.limit(3), df.withColumn("label", lit(0)))) {
      val a = RankingMetrics.evaluate(frame, col("score"), col("label"),
        tieBreak = Seq(col("id")), ks = Seq(5, 10)).head
      val b = RankingMetrics.evaluateAtScale(frame, col("score"),
        col("label"), tieBreak = Seq(col("id")), ks = Seq(5, 10)).head
      for (f <- a.schema.fieldNames) {
        val (x, y) = (a.getAs[Any](f), b.getAs[Any](f))
        (x, y) match {
          case (xd: Double, yd: Double) =>
            assert(math.abs(xd - yd) < 1e-12, s"$f: $xd vs $yd")
          case _ => assert(x == y, s"$f: $x vs $y")
        }
      }
    }
    // scale shape, on a frame big enough that the limit survives
    // (EliminateLimits drops it when maxRows ≤ k, hiding the TakeOrdered
    // on tiny fixtures): bounded top-k selection, and the full relation
    // is never range-sorted — the only window runs over the ≤ max(ks)
    // limited rows
    val big = spark.range(100).select(col("id").cast("int").as("id"),
      (col("id") % 97 / 97.0).as("score"), (col("id") % 3 === 0).cast("int").as("label"))
    val plan = RankingMetrics.evaluateAtScale(big, col("score"), col("label"),
        tieBreak = Seq(col("id")), ks = Seq(5, 10))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"bounded top-k missing:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"full relation must never be globally sorted:\n$plan")
  }

  test("auc uses midranks over tied scores (Mann-Whitney/sklearn): a " +
      "pos/neg tie counts half, not a positive win") {
    // untied sanity: perfect separation = 1.0, inverted = 0.0
    val sep = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    assert(RankingMetrics.auc(sep, col("score"), col("label")) == 1.0)
    // all scores identical, one pos one neg → AUC exactly 0.5
    // (label-ascending tie-break would have scored this 1.0)
    val tied = Seq((0.5, 1), (0.5, 0)).toDF("score", "label")
    assert(RankingMetrics.auc(tied, col("score"), col("label")) == 0.5)
    // mixed: scores [.9(+), .5(+), .5(-), .5(-), .1(-)]
    // pairs: (.9 vs 3 negs)=3 wins; (.5+ vs two .5-)=2 halves; (.5+ vs .1)=1
    // AUC = (3 + 1 + 1) / (2*3) = 5/6
    val mixed = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.5, 0), (0.1, 0))
      .toDF("score", "label")
    assert(math.abs(RankingMetrics.auc(mixed, col("score"), col("label"))
      - 5.0 / 6.0) < 1e-12)
  }

  test("baselines: popularity sigmoid and similarity min-max") {
    val b = df.select(col("id"), (col("id") * 1.0).as("f0"),
      (col("id") * 2.0).as("f1"))
    val sim = RankingMetrics.withSimilarityScore(b, Seq(col("f0"), col("f1")))
      .orderBy("id").select("score").as[Double].collect()
    // feature sums 3,6,9,12,15,18 → min-max ≈ 0 .. 1
    assert(math.abs(sim.head - 0.0) < 1e-6 && math.abs(sim.last - 1.0) < 1e-6)
    val pop = b.select(RankingMetrics.popularityScore(col("f0")))
      .orderBy(col("f0")).as[Double].head()
    assert(math.abs(pop - 1.0 / (1 + math.exp(-1.0))) < 1e-9)
  }
}
