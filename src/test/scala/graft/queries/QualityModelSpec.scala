package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {

  test("frozen fixture reproduces byte-for-byte from a refit") {
    val refit = QualityModelQueries.fit(spark, "/root/testdata/sf0.01")
    assert(refit.toJson == QualityModelQueries.modelJson,
      "frozen quality-model fixture has drifted from the code that claims to produce it")
  }

  test("frozen q193 scoring fixture reproduces byte-for-byte from a refit") {
    val refit = graft.tools.FitFixtures.fitBoost(spark, "/root/testdata/sf0.01")
    assert(refit.toJson == BoostQueries.modelJson,
      "frozen q193 boost fixture has drifted from the code that claims to produce it")
  }

  test("the keep cut sits in a structural gap of the model's margin range") {
    // enumerate every leaf combination: no achievable margin may come
    // near KeepMargin, so the boolean is stable under any input and SF
    val m = QualityModelQueries.model
    def leaves(n: graft.ml.NewtonBoost.Node): Seq[Double] = n match {
      case graft.ml.NewtonBoost.Leaf(w) => Seq(w)
      case s: graft.ml.NewtonBoost.Split => leaves(s.left) ++ leaves(s.right)
    }
    val margins = m.trees.map(leaves).foldLeft(Seq(0.0)) { (acc, ls) =>
      for (a <- acc; l <- ls) yield a + l * m.learningRate
    }
    val nearest = margins.map(x => math.abs(x - QualityModelQueries.KeepMargin)).min
    assert(nearest > 0.01, s"a reachable margin is within $nearest of the keep cut")
  }

  test("keep enriches the target class above its prior") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val scored = QualityModelQueries.features(docs)
      .withColumn("_mr", QualityModelQueries.model.margin)
      .withColumn("keep", col("_mr") >= QualityModelQueries.KeepMargin)
    val r = scored.agg(
      avg((col("source") === "src0").cast("double")).as("prior"),
      avg(when(col("keep"), (col("source") === "src0").cast("double"))).as("prec"),
      sum(col("keep").cast("long")).as("kept")).head()
    assert(r.getLong(2) > 0, "keep gate selected nothing")
    assert(r.getDouble(1) > r.getDouble(0),
      s"precision ${r.getDouble(1)} not above prior ${r.getDouble(0)}")
  }
}
