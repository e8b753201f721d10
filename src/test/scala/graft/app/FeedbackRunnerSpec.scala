package graft.app

import graft.SparkSpec
import graft.ml.Registry
import org.apache.spark.sql.functions._

/**
 * The closed MLOps loop end-to-end: a winning challenger is promoted
 * (incumbent archived), a losing one triggers rollback-to-control, a
 * flat race holds; the retrained candidate lands in the registry at
 * staging either way; every stage artifact exists on disk.
 */
class FeedbackRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-fbrun").toString

  /** control at `convA`/1000 conversions, challenger at `convB`/1000;
    * labels correlate with the features so the retrain stage learns. */
  private def logs(convA: Int, convB: Int) = {
    def mk(version: String, conv: Int) = {
      val viewed = (0 until 1000).map(i =>
        (s"p_${version}_$i", "viewed", 1000L + i, None: Option[Double]))
      val convs = (0 until conv).map(i =>
        (s"p_${version}_$i", "converted", 3000L + i, Some(10.0)))
      val rejs = (conv until 1000).map(i =>
        (s"p_${version}_$i", "rejected", 3000L + i, None: Option[Double]))
      viewed ++ convs ++ rejs
    }
    val fb = (mk("a", convA) ++ mk("b", convB))
      .toDF("prediction_id", "feedback_type", "t", "outcome_value")
      .select(col("prediction_id"), col("feedback_type"),
        timestamp_seconds(col("t")).as("created_at"), col("outcome_value"))
    val preds = (0 until 1000).flatMap(i => Seq(
      (s"p_a_$i", "vA", i), (s"p_b_$i", "vB", i)))
      .toDF("prediction_id", "model_version", "i")
      .select(col("prediction_id"), col("model_version"),
        (col("i") % 17 / 17.0).as("score"),
        (col("i") % 23 / 23.0).as("f0"),
        (col("i") % 29 / 29.0).as("f1"))
      .drop("i")
    (preds, fb)
  }

  private def seededRegistry(dir: String): Unit = {
    Registry.register(spark, dir, "vA", "artA", stage = "production")
    Registry.register(spark, dir, "vB", "artB", stage = "staging")
  }

  private def runWith(convA: Int, convB: Int) = {
    val out = freshDir(); val reg = s"$out/registry"
    seededRegistry(reg)
    val (preds, fb) = logs(convA, convB)
    val report = FeedbackRunner.run(spark, preds, fb, out, reg,
      control = "vA", challenger = "vB", candidateVersion = "vC",
      featureCols = Seq("score", "f0", "f1"),
      cutoff = timestamp_seconds(lit(0)), minFeedbackCount = 10L,
      numTrees = 5, treeDepth = 3, iters = 3)
    (report, out, reg)
  }

  test("winning challenger: promote transition, candidate staged, all " +
      "stage artifacts written") {
    val (report, out, reg) = runWith(convA = 300, convB = 400)
    assert(report.status === "success")
    assert(report.decision === "promote")
    assert(report.production === Some("vB"))
    val m = Registry.read(spark, reg)
    assert(m("vA").stage === "archived")
    assert(m("vC") === Registry.Entry("vC", "staging", s"$out/model"))
    assert(report.candidate === Some("vC"))
    Seq("metrics", "compare", "training", "sync_log").foreach { s0 =>
      assert(spark.read.parquet(s"$out/$s0").count() > 0, s"artifact $s0")
    }
    // the saved candidate reloads and scores
    val model = graft.ml.EnsembleModel.load(s"$out/model")
    val scored = model.scoreAll(spark.read.parquet(s"$out/training"))
    assert(scored.filter(col("score").between(0, 1)).count() === scored.count())
  }

  test("losing challenger: rollback re-promotes control; candidate " +
      "still staged for the next cycle") {
    val (report, _, reg) = runWith(convA = 400, convB = 150)
    assert(report.decision === "rollback")
    assert(report.production === Some("vA"))
    assert(Registry.read(spark, reg)("vB").stage === "staging")
    assert(report.candidate === Some("vC"))
  }

  test("unseeded registry: the gate FAILS into the sync-log instead of " +
      "aborting the run; later stages and the report still complete") {
    val out = freshDir(); val reg = s"$out/registry" // never seeded
    val (preds, fb) = logs(convA = 300, convB = 400)  // promote decision
    val report = FeedbackRunner.run(spark, preds, fb, out, reg,
      control = "vA", challenger = "vB", candidateVersion = "vC",
      featureCols = Seq("score", "f0", "f1"),
      cutoff = timestamp_seconds(lit(0)), minFeedbackCount = 10L,
      numTrees = 5, treeDepth = 3, iters = 3)
    val gate = report.results.find(_.stage == "gate").get
    assert(gate.status === "failed" && gate.error.contains("vB"))
    assert(report.decision === "promote")
    // the run went on: training + retrain + candidate registration
    assert(report.results.map(_.stage).contains("retrain"))
    assert(report.candidate === Some("vC"))
    assert(spark.read.parquet(s"$out/sync_log").count() > 0)
  }

  test("flat race: hold — registry untouched except the staged candidate") {
    val (report, _, reg) = runWith(convA = 300, convB = 305)
    assert(report.decision === "hold")
    assert(report.production === Some("vA"))
    val m = Registry.read(spark, reg)
    assert(m("vB").stage === "staging" && m("vC").stage === "staging")
  }
}
