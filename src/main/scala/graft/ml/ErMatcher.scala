package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ML entity-resolution matcher (reference: src/ml/entity_resolution.py
 * train_ml_model :500-552 — RandomForest 100/d10, class_weight='balanced',
 * 5-fold CV scored on F1).
 *
 * sklearn's class_weight='balanced' (w_c = n / (k * n_c)) maps to MLlib's
 * per-row `weightCol`; CV uses MLlib CrossValidator with an F1 evaluator.
 *
 * Scale notes (100 TB): the training set is labeled pairs — thousands of
 * rows, not the raw pair space — so CV's 5× refit cost is bounded. The
 * scoring path (`score`) is the heavy one: it transforms the blocked
 * candidate-pair frame (EntityResolution.blockedPairs output), executor-
 * local per row, no shuffle beyond the blocking join that made the input.
 */
object ErMatcher {

  final case class CvResult(model: org.apache.spark.ml.tuning.CrossValidatorModel,
                            cvF1Mean: Double, trainingSamples: Long,
                            positiveRate: Double)

  /** Balanced class weights, sklearn formula: n_samples/(n_classes*count_c). */
  def withBalancedWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count()
      .collect().map(r => r.getAs[Any](0).toString.toDouble -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val k = counts.size
    val wExpr = counts.foldLeft(lit(1.0)) { case (acc, (cls, cnt)) =>
      when(col(labelCol).cast("double") === cls, n / (k * cnt)).otherwise(acc)
    }
    df.withColumn("class_weight", wExpr)
  }

  /** Train with 5-fold CV on F1 (reference: entity_resolution.py:530-545). */
  def train(pairs: DataFrame, featureCols: Seq[String],
            labelCol: String = "is_match", numFolds: Int = 5,
            numTrees: Int = 100, maxDepth: Int = 10,
            seed: Long = 42L): CvResult = {
    val weighted = withBalancedWeights(
      pairs.withColumn("label", col(labelCol).cast("double")), "label")
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .setLabelCol("label").setFeaturesCol("features")
      .setWeightCol("class_weight")
    val pipe = new Pipeline().setStages(Array(assembler, rf))
    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("f1")
    val cv = new CrossValidator().setEstimator(pipe).setEvaluator(evaluator)
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(numFolds).setSeed(seed)
    val model = cv.fit(weighted)
    val n = weighted.count()
    val pos = weighted.agg(avg(col("label"))).head.getDouble(0)
    CvResult(model, model.avgMetrics.head, n, pos)
  }

  /** Match-probability scoring of candidate pairs. */
  def score(model: org.apache.spark.ml.Transformer, pairs: DataFrame): DataFrame =
    model.transform(pairs)
      .withColumn("match_score", vector_to_array(col("probability"))(1))
      .drop("features", "rawPrediction", "probability", "prediction")
}
