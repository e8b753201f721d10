package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy gates for the sketch operators vs exact answers. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(50000).toDF("id")
    .withColumn("grp", col("id") % 4)
    .withColumn("v", pmod(hash(col("id")), lit(10000)))

  test("approx_count_distinct within rsd of exact") {
    val exact = df.groupBy("grp").agg(count_distinct(col("v")).as("exact"))
    val approx = Sketches.approxDistinct(df, Seq(col("grp")), col("v"))
    val joined = exact.join(approx, "grp")
      .select(col("exact").cast("double"), col("approx_distinct").cast("double"))
      .as[(Double, Double)].collect()
    joined.foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.15, s"approx $a vs exact $e")
    }
  }

  test("approx quantiles within tolerance of exact percentiles") {
    val approx = Sketches.approxQuantiles(df, Seq(col("grp")), col("v"),
        Seq(0.5, 0.9)).select(col("grp"), col("approx_quantiles"))
      .as[(Long, Seq[Long])].collect().toMap
    val exact = df.groupBy("grp")
      .agg(expr("percentile(v, array(0.5, 0.9))").as("q"))
      .as[(Long, Seq[Double])].collect().toMap
    exact.foreach { case (g, qs) =>
      qs.zip(approx(g)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= 0.02 * 10000, s"grp $g: approx $a vs exact $e")
      }
    }
  }

  test("sketch merges are partition-invariant (same estimate any layout)") {
    val a = Sketches.approxDistinct(df, Seq(col("grp")), col("v"))
      .as[(Long, Long)].collect().toMap
    val b = Sketches.approxDistinct(df.repartition(17), Seq(col("grp")), col("v"))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
