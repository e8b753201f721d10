package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 512
  private val target = Seq(
    (1L, "alpha beta gamma alpha beta"),
    (2L, "beta gamma alpha gamma"),
    (3L, "alpha alpha beta gamma")).toDF("doc_id", "text")
  // raw pool: 10/11 look like the target vocabulary, 20/21 do not
  private val raw = Seq(
    (10L, "alpha beta gamma beta"),
    (11L, "gamma alpha beta alpha"),
    (20L, "zeta eta theta iota"),
    (21L, "kappa lambda mu nu")).toDF("doc_id", "text")

  private def ratio = Dsir.logRatio(
    Dsir.bucketCounts(target, col("text"), B),
    Dsir.bucketCounts(raw, col("text"), B), B)

  test("target-like raw docs get strictly higher importance weights") {
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Set(10L, 11L, 20L, 21L).subsetOf(w.keySet))
    val likeMin = math.min(w(10L), w(11L))
    val unlikeMax = math.max(w(20L), w(21L))
    assert(likeMin > unlikeMax,
      s"target-like min $likeMin should exceed off-domain max $unlikeMax")
  }

  test("ratio table covers the full bucket domain with finite values") {
    val r = ratio.agg(count(lit(1)), min("logr"), max("logr")).head()
    assert(r.getLong(0) == B)
    assert(!r.getDouble(1).isInfinite && !r.getDouble(2).isInfinite)
  }

  test("bucket-count artifacts merge by union+sum (shard ≡ global)") {
    val all = target.unionByName(raw)
    val global = Dsir.bucketCounts(all, col("text"), B)
    val merged = Dsir.bucketCounts(target, col("text"), B)
      .unionByName(Dsir.bucketCounts(raw, col("text"), B))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    assert(global.exceptAll(merged).isEmpty && merged.exceptAll(global).isEmpty)
  }

  test("weights and Gumbel selection are partition-invariant") {
    val w1 = Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
    val w13 = Dsir.importanceWeights(raw.repartition(13), col("doc_id"),
      col("text"), ratio, B)
    val s1 = Dsir.gumbelTopK(w1, col("id"), col("log_w"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val s13 = Dsir.gumbelTopK(w13.repartition(7), col("id"), col("log_w"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(s1.toSeq == s13.toSeq)
  }

  test("gumbelTopK with k = n returns every doc, ranked by key") {
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
    val out = Dsir.gumbelTopK(w, col("id"), col("log_w"), 100).collect()
    assert(out.length == 4)
    assert(out.map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3, 4)))
    val keys = out.sortBy(_.getInt(0)).map(_.getDouble(3))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
  }

  test("an overwhelming weight is always selected (w-proportional draw)") {
    // Gumbel noise is bounded in practice by the md5 grid: u ∈
    // [5e-7, 1-5e-7] → g ∈ (−2.67, 14.5); a 100-nat weight gap cannot
    // be overcome, so doc 10 must appear in any top-1 draw.
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
      .withColumn("log_w",
        when(col("id") === 10L, lit(100.0)).otherwise(col("log_w") - 100.0))
    val top = Dsir.gumbelTopK(w, col("id"), col("log_w"), 1).collect()
    assert(top.head.getLong(1) == 10L)
  }
}
