package graft.evaluate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Poisson-bootstrap gates: inverse-CDF constants, weight distribution
 * vs the Poisson(1) pmf, bit-exact partition invariance, and CI sanity
 * against the analytic standard error.
 */
class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  test("cdf constants are the cumulative Poisson(1) probabilities") {
    val e = math.exp(-1.0)
    assert(math.abs(Bootstrap.cdf.head - e) < 1e-15)
    assert(Bootstrap.cdf.zip(Bootstrap.cdf.tail).forall { case (a, b) => a < b })
    // ~1e-5 of draws fall beyond cdf(7) and take the capped weight 8;
    // the distortion vs true Poisson is only P(X > 8) ≈ 1.1e-6
    assert(Bootstrap.cdf.last > 1 - 2e-5 && Bootstrap.cdf.last < 1)
  }

  test("poissonWeight distribution tracks the Poisson(1) pmf") {
    val n = 20000
    val freq = (1 to n).toDF("k")
      .select(Bootstrap.poissonWeight(col("k"), lit(0)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble / n).toMap
    val e = math.exp(-1.0)
    assert(math.abs(freq(0) - e) < 0.01)       // P(0) = 0.3679
    assert(math.abs(freq(1) - e) < 0.01)       // P(1) = 0.3679
    assert(math.abs(freq(2) - e / 2) < 0.01)   // P(2) = 0.1839
    assert(freq.getOrElse(5, 0.0) < 0.01)
    // mean weight ~ 1: the resample size concentrates at n
    val mean = freq.map { case (k, f) => k * f }.sum
    assert(math.abs(mean - 1.0) < 0.02)
  }

  test("meanCI: point estimate exact, interval ordered and bracketing") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 2000L).map(i => (i, "g", 10.0 + rnd.nextGaussian()))
    val df = rows.toDF("id", "grp", "v").repartition(5)
    val out = Bootstrap.meanCI(df, col("id"), col("v"), Seq("grp"),
      replicas = 200, alpha = 0.05).collect().head
    val exact = rows.map(_._3).sum / rows.size
    val mean = out.getAs[Double]("mean")
    val (lo, hi) = (out.getAs[Double]("ci_lo"), out.getAs[Double]("ci_hi"))
    assert(out.getAs[Long]("n") === 2000L)
    assert(math.abs(mean - exact) < 1e-9)
    assert(lo < mean && mean < hi)
    // analytic 95% half-width = 1.96·sd/√n ≈ 0.044; bootstrap should
    // land within a factor of 2 either side
    val sd = math.sqrt(rows.map(r => math.pow(r._3 - exact, 2)).sum / rows.size)
    val half = 1.96 * sd / math.sqrt(rows.size.toDouble)
    assert((hi - lo) / 2 > half / 2 && (hi - lo) / 2 < half * 2)
  }

  test("meanCI is bit-exact partition-invariant") {
    val rows = (1L to 500L).map(i => (i, s"g${i % 3}", (i % 17).toDouble))
    def run(p: Int) = Bootstrap.meanCI(rows.toDF("id", "grp", "v").repartition(p),
        col("id"), col("v"), Seq("grp"), replicas = 50)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(run(1) === run(8))
  }
}
