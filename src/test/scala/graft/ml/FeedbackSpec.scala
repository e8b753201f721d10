package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Operator-level gates for the feedback-loop analytics (q149/q150/q152
 * gate the math against DuckDB on the derived logs; these tests pin the
 * CONTRACT edges on hand-built frames: rate guards, label precedence,
 * lookback cutoff, min-feedback gate, z-test decisions) plus the
 * retrain stage: the q150-shaped training frame actually feeds
 * Ensemble.fit — the `generate_training_data` → retrain loop closed.
 */
class FeedbackSpec extends SparkSpec {
  import spark.implicits._

  private def preds(rows: (String, String, Double)*) =
    rows.toDF("prediction_id", "model_version", "score")

  private def fb(rows: (String, String, Long, Option[Double])*) =
    rows.toDF("prediction_id", "feedback_type", "t", "outcome_value")
      .select(col("prediction_id"), col("feedback_type"),
        timestamp_seconds(col("t")).as("created_at"), col("outcome_value"))

  test("feedbackMetrics: counts, guarded rates, revenue only from " +
      "conversions") {
    val p = preds(("p1", "v1", 0.9), ("p2", "v1", 0.8), ("p3", "v2", 0.7))
    val f = fb(
      ("p1", "viewed", 1000, None), ("p1", "clicked", 1001, None),
      ("p1", "converted", 1002, Some(100.0)),
      ("p2", "viewed", 1003, None), ("p2", "rejected", 1004, Some(999.0)),
      ("p3", "clicked", 1005, None)) // v2: click with NO impression
    val m = Feedback.feedbackMetrics(p, f).collect()
      .map(r => r.getAs[String]("model_version") -> r).toMap
    val v1 = m("v1")
    assert(v1.getAs[Long]("impression_count") === 2L)
    assert(v1.getAs[Long]("click_count") === 1L)
    assert(v1.getAs[Double]("ctr") === 0.5)
    assert(v1.getAs[Long]("conversion_count") === 1L)
    assert(v1.getAs[Double]("conversion_rate") === 0.5)
    // rejected's outcome_value must NOT count as revenue
    assert(v1.getAs[Double]("total_revenue") === 100.0)
    assert(v1.getAs[Double]("avg_revenue_per_conversion") === 100.0)
    // zero impressions → all rates 0.0, not a division blow-up
    val v2 = m("v2")
    assert(v2.getAs[Long]("impression_count") === 0L)
    assert(v2.getAs[Double]("ctr") === 0.0)
    assert(v2.getAs[Double]("conversion_rate") === 0.0)
  }

  test("trainingData: positive beats negative, viewed-only excluded, " +
      "lookback cutoff applies, min-feedback gate drops thin versions") {
    val p = preds(("p1", "v1", 0.9), ("p2", "v1", 0.8), ("p3", "v1", 0.7),
      ("p4", "v2", 0.6))
    val f = fb(
      ("p1", "rejected", 2000, None), ("p1", "converted", 2001, None), // pos wins
      ("p2", "rejected", 2002, None),                                  // negative
      ("p3", "viewed", 2003, None),                                    // excluded
      ("p4", "accepted", 500, None))   // v2's only signal: BEFORE cutoff
    val td = Feedback.trainingData(p, f,
      cutoff = timestamp_seconds(lit(1000)), minFeedbackCount = 1L)
    val byId = td.collect()
      .map(r => r.getAs[String]("prediction_id") -> r.getAs[Double]("label"))
      .toMap
    assert(byId === Map("p1" -> 1.0, "p2" -> 0.0))
    // min-feedback gate: v1 has 2 labeled examples, raising the bar to 3
    // empties the frame
    assert(Feedback.trainingData(p, f,
      cutoff = timestamp_seconds(lit(1000)), minFeedbackCount = 3L)
      .count() === 0L)
  }

  test("variantComparison: clear winner promotes, clear loser rolls " +
      "back, control is control, z antisymmetric-ish") {
    // 1000 impressions per variant; conversions 300 (control) / 400 / 150
    def mk(version: String, conv: Int): Seq[(String, String, Long, Option[Double])] = {
      val id = s"p_$version"
      (0 until 1000).map(i => (s"${id}_$i", "viewed", 1000L + i, None)) ++
        (0 until conv).map(i => (s"${id}_$i", "converted", 3000L + i, None))
    }
    val allFb = fb((mk("v1", 300) ++ mk("v2", 400) ++ mk("v3", 150)): _*)
    val allPreds = (0 until 1000).flatMap(i => Seq(
      (s"p_v1_$i", "v1", 0.5), (s"p_v2_$i", "v2", 0.5), (s"p_v3_$i", "v3", 0.5)))
      .toDF("prediction_id", "model_version", "score")
    val out = Feedback.variantComparison(allPreds, allFb, control = "v1")
      .collect().map(r => r.getAs[String]("model_version") ->
        (r.getAs[Double]("z"), r.getAs[String]("decision"))).toMap
    assert(out("v1")._2 === "control" && out("v1")._1 === 0.0)
    assert(out("v2")._2 === "promote" && out("v2")._1 > 1.96)
    assert(out("v3")._2 === "rollback" && out("v3")._1 < -1.96)
    // 40% vs 30% on n=1000 each: z ≈ 4.7; sanity-bound the magnitude
    assert(out("v2")._1 > 3.0 && out("v2")._1 < 7.0)
  }

  test("retrain stage: the q150-shaped training frame feeds " +
      "Ensemble.fit and the retrained model scores it") {
    // labels correlated with features so the retrained model learns
    val n = 400
    val frame = spark.range(n).select(
      col("id"),
      concat(lit("p"), col("id")).as("prediction_id"),
      when(col("id") % 2 === 0, "v1").otherwise("v2").as("model_version"),
      (col("id") % 17 / 17.0).as("score"),
      (col("id") % 23 / 23.0).as("f0"),
      (col("id") % 29 / 29.0).as("f1"))
      .withColumn("fbt",
        when(col("score") * 0.6 + col("f0") * 0.4 +
          pmod(hash(col("id"), lit(7)), lit(100)) / 1000.0 > 0.5,
          "converted").otherwise("rejected"))
      .drop("id")
    val predsF = frame.drop("fbt")
    val fbF = frame.select(col("prediction_id"), col("fbt").as("feedback_type"),
      timestamp_seconds(lit(5000)).as("created_at"),
      lit(null).cast("double").as("outcome_value"))
    val td = Feedback.trainingData(predsF, fbF,
      cutoff = timestamp_seconds(lit(0)), minFeedbackCount = 10L)
      .withColumn("label", col("label").cast("int"))
    assert(td.count() === n)
    val ens = new Ensemble(Seq("score", "f0", "f1"),
      numTrees = 10, rfDepth = 4, xgbIter = 5, gbtIter = 5, mlpIter = 15)
    val (tr, va) = ens.split(td)
    val scored = ens.fit(tr).scoreAll(va)
    val agree = scored
      .withColumn("pred", (col("score") >= 0.5).cast("int"))
      .filter(col("pred") === col("label")).count().toDouble / va.count()
    assert(agree > 0.7, s"retrained accuracy $agree below gate")

    // the SAME frame also retrains the ER matcher (balanced weights +
    // 5-fold CV), closing the other half of the reference's
    // generate_training_data consumers
    val cv = ErMatcher.train(td.withColumnRenamed("label", "is_match"),
      Seq("score", "f0", "f1"), numFolds = 3, numTrees = 10, maxDepth = 4)
    assert(cv.trainingSamples === n)
    assert(cv.cvF1Mean > 0.6, s"ER retrain CV F1 ${cv.cvF1Mean} below gate")
  }
}
