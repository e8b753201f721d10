package graft.app

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Ensemble, Feedback, Registry}

/**
 * The closed feedback loop as one production composition (the
 * [[CurationRunner]] pattern applied to the MLOps surface): the
 * reference DECLARES this cycle across FeedbackLogger →
 * TrainingDataGenerator → ABTestManager (feedback_logging.py:193-595)
 * but stubs every analytical step; here each step is the real operator,
 * every stage writes its artifact (parquet is the interface between
 * stages), and a sync-log records per-stage outcomes.
 *
 * One run =
 *  1. `metrics`  — [[Feedback.feedbackMetrics]] rollup → the
 *     observability artifact a dashboard reads (q149's frame).
 *  2. `compare`  — [[Feedback.variantComparison]] of the RUNNING
 *     control vs challenger (q152's z-test) → the gate decision.
 *  3. gate       — decision applied to the registry: `promote` moves
 *     the challenger to production (incumbent archived in the same
 *     transition), `rollback` re-promotes the control, `hold` changes
 *     nothing. The manifest transition IS the deployment action.
 *  4. `training` — [[Feedback.trainingData]] pooled labeled frame
 *     (q150's shape) → the retraining artifact.
 *  5. `retrain`  — [[Ensemble]] fit on that frame, saved under
 *     `outDir/model`, registered at stage `staging` as the NEXT cycle's
 *     challenger candidate.
 *
 * Scale: stages 1/2/4 are the audited one-pass plans (feedback
 * pre-aggregated before any join); stage 5's input is the gated
 * training frame — bounded by feedback volume, not impression volume.
 * Nothing here re-reads raw logs twice except through the stored
 * artifacts, and the registry transition is a metadata rename.
 */
object FeedbackRunner {

  import PipelineRunner.StageResult

  final case class FeedbackReport(results: Seq[StageResult],
                                  decision: String,
                                  production: Option[String],
                                  candidate: Option[String]) {
    def status: String =
      if (results.exists(_.status == "failed")) "failed" else "success"
  }

  /**
   * `predictions`/`feedback` follow the [[Feedback]] log schemas; the
   * prediction log's `model_version` holds the RUNNING variants
   * (control + challenger among them). `candidateVersion` names the
   * retrained model this run registers for the next cycle.
   */
  def run(spark: SparkSession, predictions: DataFrame, feedback: DataFrame,
          outDir: String, registryDir: String,
          control: String, challenger: String, candidateVersion: String,
          featureCols: Seq[String], cutoff: Column,
          minFeedbackCount: Long = 100L,
          numTrees: Int = 20, treeDepth: Int = 6, iters: Int = 10): FeedbackReport = {
    val results = scala.collection.mutable.ListBuffer[StageResult]()
    def stage(name: String)(body: => DataFrame): Option[DataFrame] = {
      val t0 = System.currentTimeMillis()
      try {
        body.write.mode("overwrite").parquet(s"$outDir/$name")
        val stored = spark.read.parquet(s"$outDir/$name")
        results += StageResult(name, "success", stored.count(), t0,
          System.currentTimeMillis())
        Some(stored)
      } catch {
        case e: Exception =>
          results += StageResult(name, "failed", 0, t0,
            System.currentTimeMillis(), String.valueOf(e.getMessage))
          None
      }
    }

    stage("metrics") {
      Feedback.feedbackMetrics(predictions, feedback)
    }

    val compared = stage("compare") {
      Feedback.variantComparison(predictions, feedback, control)
    }

    // the gate: apply the challenger's decision as a manifest
    // transition. Guarded like every other stage — an unknown version
    // in the registry (e.g. an unseeded first cycle) must surface as a
    // failed 'gate' row in the sync-log, not abort the run after the
    // metrics artifact was already written
    val decision = compared
      .flatMap(_.filter(col("model_version") === challenger)
        .select("decision").collect().headOption.map(_.getString(0)))
      .getOrElse("hold")
    locally {
      val t0 = System.currentTimeMillis()
      if (compared.isEmpty)
        // the 'hold' here is a FALLBACK, not an evaluated decision — a
        // gate row claiming success would misrepresent that the
        // challenger was never actually compared
        results += StageResult("gate", "skipped", 0, t0,
          System.currentTimeMillis(), "compare stage failed")
      else try {
        decision match {
          case "promote" => Registry.promote(spark, registryDir, challenger)
          case "rollback" => Registry.rollback(spark, registryDir, control)
          case _ => ()
        }
        results += StageResult("gate", "success", 1L, t0,
          System.currentTimeMillis())
      } catch {
        case e: Exception =>
          results += StageResult("gate", "failed", 0, t0,
            System.currentTimeMillis(), String.valueOf(e.getMessage))
      }
    }

    val training = stage("training") {
      Feedback.trainingData(predictions, feedback, cutoff,
          minFeedbackCount = minFeedbackCount)
        .withColumn("label", col("label").cast("int"))
    }

    // every outcome of the retrain stage is a VISIBLE sync-log row:
    // skipped (no features / upstream training failed), success, failed
    if (featureCols.isEmpty)
      results += StageResult("retrain", "skipped", 0,
        System.currentTimeMillis(), System.currentTimeMillis(),
        "no featureCols configured")
    else if (training.isEmpty)
      results += StageResult("retrain", "skipped", 0,
        System.currentTimeMillis(), System.currentTimeMillis(),
        "training stage failed")
    else training.foreach { td =>
      val t0 = System.currentTimeMillis()
      try {
        val ens = new Ensemble(featureCols, numTrees = numTrees,
          rfDepth = treeDepth, xgbIter = iters, gbtIter = iters,
          mlpIter = iters)
        val (tr, _) = ens.split(td)
        ens.fit(tr).save(s"$outDir/model")
        Registry.register(spark, registryDir, candidateVersion,
          s"$outDir/model", stage = "staging")
        results += StageResult("retrain", "success", tr.count(), t0,
          System.currentTimeMillis())
      } catch {
        case e: Exception =>
          results += StageResult("retrain", "failed", 0, t0,
            System.currentTimeMillis(), String.valueOf(e.getMessage))
      }
    }

    val report = FeedbackReport(results.toSeq, decision,
      Registry.read(spark, registryDir).production.map(_.version),
      results.find(_.stage == "retrain").filter(_.status == "success")
        .map(_ => candidateVersion))
    import spark.implicits._
    report.results.toDF().write.mode("overwrite")
      .parquet(s"$outDir/sync_log")
    report
  }
}
