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

  // ---------------- KMV / bottom-k theta sketches ----------------

  /** 4 groups × ~2.5k distinct string keys each, with cross-group overlap
    * (keys are drawn from a shared 6k-id pool) — big enough that k=64
    * sketches run the estimator path, small enough for exact checks. */
  private lazy val kmvDf = spark.range(40000).toDF("id")
    .withColumn("grp", col("id") % 4)
    .withColumn("key",
      concat(lit("k"), pmod(hash(col("id") * 7), lit(6000)).cast("string")))

  private val kmvK = 64

  test("bottomK equals the composed distinct + sort + truncate form") {
    val fast = kmvDf.groupBy("grp")
      .agg(Sketches.bottomK(Sketches.kmvHash60(col("key")), kmvK).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val composed = kmvDf
      .select(col("grp"), Sketches.kmvHash60(col("key")).as("hv")).distinct()
      .groupBy("grp")
      .agg(slice(sort_array(collect_set(col("hv"))), 1, kmvK).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast === composed)
    fast.values.foreach(sk => assert(sk == sk.sorted && sk.size == kmvK))
  }

  test("bottomK is partition-invariant and exact (full array) below k") {
    val small = kmvDf.filter(col("id") < 100) // ~100 distinct keys > k? no: 100 ids → ≤100 keys
    val a = small.groupBy("grp")
      .agg(Sketches.bottomK(Sketches.kmvHash60(col("key")), 1000).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val b = small.repartition(13).groupBy("grp")
      .agg(Sketches.bottomK(Sketches.kmvHash60(col("key")), 1000).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(a === b)
    // below k the sketch IS the sorted distinct hash domain
    val exact = small
      .select(col("grp"), Sketches.kmvHash60(col("key")).as("hv")).distinct()
      .groupBy("grp").agg(sort_array(collect_set(col("hv"))).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(a === exact)
  }

  test("kmvMerge of per-part sketches equals the direct whole-data sketch" +
    " (exact merge property)") {
    val parts = Sketches.kmvSketch(
      kmvDf.withColumn("part", col("id") % 7), Seq("grp", "part"),
      col("key"), kmvK)
    val merged = Sketches.kmvMerge(parts, Seq("grp"), kmvK)
      .as[(Long, Seq[Long])].collect().toMap
    val direct = Sketches.kmvSketch(kmvDf, Seq("grp"), col("key"), kmvK)
      .as[(Long, Seq[Long])].collect().toMap
    assert(merged === direct)
  }

  test("kmvEstimate within ~3/sqrt(k) of exact distinct counts") {
    val est = Sketches.kmvSketch(kmvDf, Seq("grp"), col("key"), kmvK)
      .select(col("grp"), Sketches.kmvEstimate(col("sk"), kmvK).as("e"))
      .as[(Long, Double)].collect().toMap
    val exact = kmvDf.groupBy("grp").agg(count_distinct(col("key")).as("n"))
      .as[(Long, Long)].collect().toMap
    val tol = 3.0 / math.sqrt(kmvK) // ~0.375
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < tol,
        s"grp $g: est ${est(g)} vs exact $n")
    }
  }

  test("kmvOverlapPairs estimates pairwise intersections; exact when both" +
    " sketches hold their whole domains") {
    val sk = Sketches.kmvSketch(kmvDf, Seq("grp"), col("key"), kmvK)
      .withColumnRenamed("grp", "g")
    val est = Sketches.kmvOverlapPairs(sk, "g", kmvK)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(est.size == 6) // 4 choose 2, zero-pairs included
    val exact = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield {
      val ka = kmvDf.filter(col("grp") === a).select("key").distinct()
      val kb = kmvDf.filter(col("grp") === b).select("key").distinct()
      (a, b) -> ka.intersect(kb).count().toDouble
    }).toMap
    exact.foreach { case (p, n) =>
      // intersection estimates compound two sketch errors; gate loosely
      assert(math.abs(est(p) - n) / math.max(n, 1.0) < 0.75,
        s"pair $p: est ${est(p)} vs exact $n")
    }
    // the exact-regime twin: sketches strictly larger than the domains
    val wide = Sketches.kmvSketch(kmvDf, Seq("grp"), col("key"), 10000)
      .withColumnRenamed("grp", "g")
    val ex = Sketches.kmvOverlapPairs(wide, "g", 10000)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    exact.foreach { case (p, n) => assert(ex(p) === n) }
  }

  // ---------------- mergeable histograms ----------------

  test("histogram partials merge to the direct histogram; quantile " +
    "read-out within one bin width of exact") {
    val data = df.withColumn("part", col("id") % 9)
      .withColumn("x", col("v").cast("double"))
    val parts = Sketches.histogramSketch(data, Seq("grp", "part"), col("x"),
      lo = 0.0, hi = 10000.0, bins = 500)
    val merged = Sketches.histogramMerge(parts, Seq("grp"))
    val direct = Sketches.histogramSketch(data, Seq("grp"), col("x"),
      lo = 0.0, hi = 10000.0, bins = 500)
    assert(merged.select("grp", "bin", "cnt").as[(Long, Long, Long)]
      .collect().toSet ===
      direct.select("grp", "bin", "cnt").as[(Long, Long, Long)]
        .collect().toSet)
    val q = Sketches.histogramQuantiles(merged, Seq("grp"),
        Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 10000.0, bins = 500)
      .as[(Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = data.groupBy("grp")
      .agg(expr("percentile(x, array(0.5, 0.9, 0.99))").as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val binWidth = 10000.0 / 500
    exact.foreach { case (g, es) =>
      Seq(0.5, 0.9, 0.99).zip(es).foreach { case (p, e) =>
        assert(math.abs(q((g, p)) - e) <= binWidth + 1e-9,
          s"grp $g p$p: est ${q((g, p))} vs exact $e")
      }
    }
  }

  // ---------------- count-min frequency sketches ----------------

  test("cmsSketch: partial frames merge to the direct sketch; estimates " +
    "never undercount, are exact for isolated buckets, and obey the " +
    "2N/w overcount bound across all probes") {
    val d = 4; val w = 128
    // zipfian-ish: key frequency ∝ repetition via modular squish
    val data = spark.range(20000).toDF("id")
      .withColumn("part", col("id") % 7)
      .withColumn("key",
        concat(lit("t"), pmod(col("id") * col("id") + col("id"), lit(400))
          .cast("string")))
    val parts = Sketches.cmsSketch(data, Seq("part"), col("key"), d, w)
    val merged = Sketches.cmsMerge(parts, Seq.empty)
    val direct = Sketches.cmsSketch(data, Seq.empty, col("key"), d, w)
    assert(merged.as[(Int, Long, Long)].collect().toSet ===
      direct.as[(Int, Long, Long)].collect().toSet,
      "additive merge must equal the single-pass sketch")
    val exact = data.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.cmsEstimate(direct, Seq.empty,
        data.select(col("key").as("v")), d, w)
      .as[(String, Long)].collect().toMap
    val n = 20000L
    exact.foreach { case (k, cnt) =>
      assert(est(k) >= cnt, s"$k undercounted: ${est(k)} < $cnt")
      assert(est(k) - cnt <= 2 * n / w,
        s"$k overcount ${est(k) - cnt} breaks the 2N/w bound")
    }
    // a probe value never inserted reads a small overcount, never null
    val cold = Sketches.cmsEstimate(direct, Seq.empty,
        Seq("never-seen-token").toDF("v"), d, w)
      .as[(String, Long)].collect().toMap
    assert(cold("never-seen-token") >= 0L &&
      cold("never-seen-token") <= 2 * n / w)
  }

  test("cmsEstimate with group columns: per-group scaffold yields an " +
    "estimate row for every (group, probe), zero where a group never " +
    "saw a bucket") {
    val d = 2; val w = 64
    val data = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("grp", "key")
    val sk = Sketches.cmsSketch(data, Seq("grp"), col("key"), d, w)
    val est = Sketches.cmsEstimate(sk, Seq("grp"),
        Seq("x", "z").toDF("v"), d, w)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est(("a", "x")) >= 2L)
    assert(est(("b", "z")) >= 1L)
    // b never saw x's buckets (w=64, 3 distinct keys — collisions would
    // only RAISE these, so assert the definitely-absent floor)
    assert(est.size === 4, "2 groups x 2 probes")
    assert(est(("b", "x")) <= est(("a", "x")))
  }

  // ---------------- DataSketches HLL production twin ----------------

  test("hllSketch: parquet-roundtripped per-part sketches merge to the " +
    "direct single-pass estimate; estimate within rsd of exact") {
    val data = kmvDf.withColumn("part", col("id") % 5)
    val parts = Sketches.hllSketch(data, Seq("grp", "part"), col("key"))
    val dir = java.nio.file.Files.createTempDirectory("hll-sk").toString
    parts.write.mode("overwrite").parquet(dir)
    val merged = Sketches.hllMerge(spark.read.parquet(dir), Seq("grp"))
      .as[(Long, Long)].collect().toMap
    val direct = Sketches.hllSketch(data, Seq("grp"), col("key"))
      .select(col("grp"), hll_sketch_estimate(col("hll")).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(merged === direct) // same-lgK union is register-wise max
    val exact = data.groupBy("grp").agg(count_distinct(col("key")).as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g).toDouble - n) / n < 0.05,
        s"grp $g: hll ${merged(g)} vs exact $n")
    }
  }

  test("cmsInnerProduct: collision-free width reads the EXACT join size; " +
      "narrow width only ever overcounts; disjoint keys read zero") {
    val a = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq("k3"))
      .toDF("v")
    val b = (Seq.fill(4)("k1") ++ Seq.fill(5)("k2") ++ Seq.fill(7)("zz"))
      .toDF("v")
    // exact |A join B| = 3*4 + 2*5 = 22
    def est(width: Int): Long = {
      val sa = Sketches.cmsSketch(a, Seq.empty, col("v"), 4, width)
      val sb = Sketches.cmsSketch(b, Seq.empty, col("v"), 4, width)
      Sketches.cmsInnerProduct(sa, sb, 4).head()
        .getDecimal(0).longValueExact()
    }
    assert(est(1 << 16) === 22L, "wide sketch must be collision-exact")
    assert(est(2) >= 22L, "narrow sketch may only overcount")
    // disjoint key sets: wide sketch reads 0 (absent depth rows count
    // as 0 via the scaffold, not vanish from the min)
    val c = Seq("other1", "other2").toDF("v")
    val sa = Sketches.cmsSketch(a, Seq.empty, col("v"), 4, 1 << 16)
    val sc = Sketches.cmsSketch(c, Seq.empty, col("v"), 4, 1 << 16)
    assert(Sketches.cmsInnerProduct(sa, sc, 4).head()
      .getDecimal(0).longValueExact() === 0L)
  }
}
