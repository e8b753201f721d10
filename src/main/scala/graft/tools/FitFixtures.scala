package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ml.NewtonBoost
import graft.queries.QualityModelQueries

/**
 * Regenerates the frozen NewtonBoost fixtures embedded in the query
 * registry, so "trained once, frozen as JSON" stays a reproducible
 * claim rather than an artifact of a lost session:
 *
 *   tools/run.sh graft.tools.FitFixtures [sfDir]
 *
 * prints the quality-classifier model JSON
 * ([[graft.queries.QualityModelQueries.modelJson]]) refit from the
 * named testdata dir (default sf0.01 — the dir the frozen fixture was
 * trained on). NewtonBoost fits are bit-deterministic for a fixed
 * input (partition-invariant histogram sums, NewtonBoostSpec), so the
 * printed JSON must equal the frozen literal byte for byte;
 * QualityModelSpec enforces exactly that on every test run.
 */
object FitFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-fit-fixtures")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = QualityModelQueries.fit(spark, dir)
    println(m.toJson)
    spark.stop()
  }

  /** Shared by the main above and QualityModelSpec. */
  def fitQuality(spark: SparkSession, dir: String): NewtonBoost.Model =
    QualityModelQueries.fit(spark, dir)
}
