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
 * prints the quality-classifier and q193 scoring model JSONs
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
    println("quality=" + QualityModelQueries.fit(spark, dir).toJson)
    println("boost=" + fitBoost(spark, dir).toJson)
    spark.stop()
  }

  /** Refit of the q193 scoring fixture
    * ([[graft.queries.BoostQueries.modelJson]]): 4 trees, depth 3,
    * lr 0.3, 16 hist bins on lineitem, label = (l_returnflag = 'R'). */
  def fitBoost(spark: SparkSession, dir: String): NewtonBoost.Model = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"),
        col("l_discount").cast("double").as("l_discount"),
        col("l_tax").cast("double").as("l_tax"),
        (col("l_returnflag") === "R").cast("int").as("label"))
    NewtonBoost.fit(li,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "label",
      NewtonBoost.Params(rounds = 4, maxDepth = 3, learningRate = 0.3,
        maxBins = 16))
  }
}
