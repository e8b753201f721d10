package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.sources.Tables

/**
 * Measured-recall ledger for the ANN family (VERDICT r8 #6): IVF, LSH
 * and PQ trade recall for work by CONTRACT — this spec measures
 * recall@10 against the exact top-10 at the correctness-gate SF
 * (sf0.01: 500×64 vectors, 10 seeded queries) and asserts each family's
 * documented floor, so a silent recall collapse (broken bucketing, a
 * changed deterministic codebook, an assignment bug that still returns
 * k rows) fails the suite instead of shipping. Measured values are
 * recorded in SCALING.md ("ANN measured recall").
 *
 * Protocol: 10 query vectors (vec_id % 50 == 7), self-matches excluded,
 * ground truth = brute-force cosine top-10 (L2 top-10 for PQ, the
 * metric PQ approximates); recall@10 = |ANN∩truth| / (10·queries).
 * Everything is batched: one crossJoin against the 10 broadcast queries
 * replaces 10 per-query jobs.
 */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val NQueries = 10
  private val K = 10

  private lazy val e: DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"),
        VectorFunctions.unit(col("embedding")).as("u"))
      .filter(col("u").isNotNull)
      .cache()

  private lazy val queries: DataFrame =
    e.filter(col("id") % 50 === 7)
      .select(col("id").as("qid"), col("embedding").as("qv"),
        col("u").as("qu"))

  // (x-y)² widened BEFORE subtraction — the q85 discipline
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), _ + _)

  /** All (query, candidate) pairs with cosine and L2 — the truth basis. */
  private lazy val pairs: DataFrame =
    e.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.dot(col("u"), col("qu")).as("cos"),
        l2sq(col("embedding"), col("qv")).as("l2"))
      .cache()

  private lazy val cosTruth: DataFrame = TopK.topKPerGroup(pairs,
    Seq(col("qid")), Seq(col("cos").desc, col("id").asc), K)
    .select("qid", "id").cache()

  private lazy val l2Truth: DataFrame = TopK.topKPerGroup(pairs,
    Seq(col("qid")), Seq(col("l2").asc, col("id").asc), K)
    .select("qid", "id").cache()

  private def recall(ann: DataFrame, truth: DataFrame): Double =
    truth.join(ann.select("qid", "id"), Seq("qid", "id")).count()
      .toDouble / (K * NQueries)

  test(s"fixture sanity: $NQueries queries, full truth sets") {
    assert(queries.count() === NQueries)
    assert(cosTruth.count() === K.toLong * NQueries)
  }

  test("IVF (modulus 100, nprobe 2) recall@10 >= 0.55 floor, measured " +
      "and recorded in SCALING.md") {
    // the q73/q132 build discipline: deterministic modulus-sampled
    // centroids, max-cosine assignment, nprobe lists probed per query
    val cents = SimilaritySearch.ivfCentroids(
      Tables.load(spark, dir, "embeddings"), col("vec_id"),
      col("embedding"), 100)
    val assign = SimilaritySearch.ivfAssign(
        Tables.load(spark, dir, "embeddings"), col("vec_id"),
        col("embedding"), 100)
      .select(col("id"), col("cid"))
    val qc = queries.crossJoin(broadcast(cents))
      .select(col("qid"),
        VectorFunctions.dot(col("qu"), col("cu")).as("qcos"), col("cid"))
    val probed = TopK.topKPerGroup(qc, Seq(col("qid")),
      Seq(col("qcos").desc, col("cid").asc), 2).select("qid", "cid")
    val cand = probed.join(assign, "cid").select("qid", "id")
    val ivfTop = TopK.topKPerGroup(
      cand.join(pairs, Seq("qid", "id")),
      Seq(col("qid")), Seq(col("cos").desc, col("id").asc), K)
    val r = recall(ivfTop, cosTruth)
    info(f"IVF recall@10 = $r%.3f (5 lists, nprobe 2)")
    assert(r >= 0.55, f"IVF recall@10 collapsed: $r%.3f < 0.55")
  }

  test("LSH (4 hyperplanes, single-probe) recall@10 >= 0.10 floor, " +
      "measured and recorded in SCALING.md") {
    // the q50 bucketing: 16 sign-pattern buckets, query probes only its
    // own bucket — the documented cheap/low-recall end of the family
    // (multi-probe and more planes trade back up; see SCALING.md)
    val bucketed = e.withColumn("b",
      SimilaritySearch.lshBucket(col("u"), dims = 64, planes = 4))
    val qb = queries.withColumn("qb",
      SimilaritySearch.lshBucket(col("qu"), dims = 64, planes = 4))
    val cand = bucketed.join(broadcast(qb), col("b") === col("qb"))
      .filter(col("id") =!= col("qid")).select("qid", "id")
    val lshTop = TopK.topKPerGroup(
      cand.join(pairs, Seq("qid", "id")),
      Seq(col("qid")), Seq(col("cos").desc, col("id").asc), K)
    val r = recall(lshTop, cosTruth)
    info(f"LSH recall@10 = $r%.3f (16 buckets, single-probe)")
    assert(r >= 0.10, f"LSH recall@10 collapsed: $r%.3f < 0.10")
  }

  test("IVF-PQ (5 lists, nprobe 2, m=4 codes) recall@10 vs exact L2 " +
      ">= 0.03 floor, measured and recorded in SCALING.md") {
    // the q141 composition batched over the 10 queries: IVF restricts
    // candidates to each query's 2 probed lists, PQ-ADC scores only
    // those members — recall is bounded by BOTH approximations
    // (~membership 0.6 × ADC ranking), the cost/recall trade the
    // family exists for
    val embsRaw = Tables.load(spark, dir, "embeddings")
    val cents = SimilaritySearch.ivfCentroids(embsRaw, col("vec_id"),
      col("embedding"), 100)
    val assign = SimilaritySearch.ivfAssign(embsRaw, col("vec_id"),
      col("embedding"), 100).select("id", "cid")
    val qc = queries.crossJoin(broadcast(cents))
      .select(col("qid"),
        VectorFunctions.dot(col("qu"), col("cu")).as("qcos"), col("cid"))
    val probed = TopK.topKPerGroup(qc, Seq(col("qid")),
      Seq(col("qcos").desc, col("cid").asc), 2).select("qid", "cid")
    val members = probed.join(assign, "cid").select("qid", "id")
    val cb = embsRaw.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("ccid"), col("embedding").as("cv"))
    def subv(v: Column): Column = slice(v, col("s") * 16 + 1, lit(16))
    val codes = TopK.topKPerGroup(
      e.select(col("id"), col("embedding"),
          explode(sequence(lit(0), lit(3))).as("s"))
        .crossJoin(broadcast(cb))
        .select(col("id"), col("s"), col("ccid"),
          l2sq(subv(col("embedding")), subv(col("cv"))).as("d")),
      Seq(col("id"), col("s")), Seq(col("d").asc, col("ccid").asc), 1)
      .select("id", "s", "ccid")
    val dq = queries
      .select(col("qid"), col("qv"), explode(sequence(lit(0), lit(3))).as("s"))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("s"), col("ccid"),
        l2sq(subv(col("qv")), subv(col("cv"))).as("dq"))
    val adc = members.join(codes, "id")
      .join(broadcast(dq), Seq("qid", "s", "ccid"))
      .groupBy("qid", "id").agg(sum("dq").as("adc"))
      .filter(col("id") =!= col("qid"))
    val top = TopK.topKPerGroup(adc, Seq(col("qid")),
      Seq(col("adc").asc, col("id").asc), K)
    val r = recall(top, l2Truth)
    info(f"IVF-PQ recall@10 = $r%.3f (nprobe 2 of 5, m=4)")
    assert(r >= 0.03, f"IVF-PQ recall@10 collapsed: $r%.3f < 0.03")
  }

  test("residual IVF-PQ (5 lists, nprobe 2, m=4 residual codes) " +
      "recall@10 vs exact L2 >= 0.03 floor, measured and recorded in " +
      "SCALING.md") {
    // the q144 shape batched: codes describe v − centroid(v) against a
    // residual-space codebook; each (query, probed list) carries its
    // own query residual. With modulus-sampled (untrained) codebooks
    // this measures comparable to the raw encode — the shape is what a
    // trained k-means codebook plugs into (SCALING.md).
    val embsRaw = Tables.load(spark, dir, "embeddings")
    val rawCents = embsRaw.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvr"))
    val assign = SimilaritySearch.ivfAssign(embsRaw, col("vec_id"),
      col("embedding"), 100).select("id", "cid")
    val resid = embsRaw.select(col("vec_id").as("id"), col("embedding"))
      .join(assign, "id")
      .join(broadcast(rawCents), "cid")
      .select(col("id"), col("cid"),
        zip_with(col("embedding"), col("cvr"),
          (x, y) => x.cast("double") - y.cast("double")).as("r"))
    val cb = resid.filter(col("id") % 100 === 0)
      .select(col("id").as("ccid"), col("r").as("cr"))
    def subv(v: Column): Column = slice(v, col("s") * 16 + 1, lit(16))
    val codes = TopK.topKPerGroup(
      resid.select(col("id"), col("cid"), col("r"),
          explode(sequence(lit(0), lit(3))).as("s"))
        .crossJoin(broadcast(cb))
        .select(col("id"), col("cid"), col("s"), col("ccid"),
          l2sq(subv(col("r")), subv(col("cr"))).as("d")),
      Seq(col("id"), col("s")), Seq(col("d").asc, col("ccid").asc), 1)
      .select("id", "cid", "s", "ccid")
    val qcents = queries.crossJoin(broadcast(
        SimilaritySearch.ivfCentroids(embsRaw, col("vec_id"),
          col("embedding"), 100)))
      .select(col("qid"),
        VectorFunctions.dot(col("qu"), col("cu")).as("qcos"), col("cid"))
    val probed = TopK.topKPerGroup(qcents, Seq(col("qid")),
      Seq(col("qcos").desc, col("cid").asc), 2).select("qid", "cid")
    val qres = probed.join(broadcast(rawCents), "cid")
      .join(queries.select("qid", "qv"), "qid")
      .select(col("qid"), col("cid"),
        zip_with(col("qv"), col("cvr"),
          (x, y) => x.cast("double") - y.cast("double")).as("qr"))
    val dq = qres
      .select(col("qid"), col("cid"), col("qr"),
        explode(sequence(lit(0), lit(3))).as("s"))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("cid"), col("s"), col("ccid"),
        l2sq(subv(col("qr")), subv(col("cr"))).as("dq"))
    val adc = codes.join(broadcast(dq), Seq("cid", "s", "ccid"))
      .groupBy("qid", "id").agg(sum("dq").as("adc"))
      .filter(col("id") =!= col("qid"))
    val top = TopK.topKPerGroup(adc, Seq(col("qid")),
      Seq(col("adc").asc, col("id").asc), K)
    val r = recall(top, l2Truth)
    info(f"residual IVF-PQ recall@10 = $r%.3f (nprobe 2 of 5, m=4)")
    assert(r >= 0.03, f"residual IVF-PQ recall@10 collapsed: $r%.3f < 0.03")
  }

  test("PQ-ADC (m=4, 16-dim subspaces, 5 codes) recall@10 vs exact L2 " +
      ">= 0.05 floor, measured and recorded in SCALING.md") {
    // the q85 encode: per-subspace L2 argmin against the broadcast
    // modulus-sampled codebook; ADC = table lookup of query→centroid
    // subspace distances. 64× compression; recall bounded by the coarse
    // 5-entry codebook — the point of the floor is catching a BROKEN
    // encode (recall ≈ random = K/N = 0.02), not certifying quality.
    val cent = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    def subv(v: Column): Column = slice(v, col("s") * 16 + 1, lit(16))
    val codes = TopK.topKPerGroup(
      e.select(col("id"), col("embedding"),
          explode(sequence(lit(0), lit(3))).as("s"))
        .crossJoin(broadcast(cent))
        .select(col("id"), col("s"), col("cid"),
          l2sq(subv(col("embedding")), subv(col("cv"))).as("d")),
      Seq(col("id"), col("s")), Seq(col("d").asc, col("cid").asc), 1)
      .select("id", "s", "cid")
    val dq = queries
      .select(col("qid"), col("qv"), explode(sequence(lit(0), lit(3))).as("s"))
      .crossJoin(broadcast(cent))
      .select(col("qid"), col("s"), col("cid"),
        l2sq(subv(col("qv")), subv(col("cv"))).as("dq"))
    val adc = codes.join(broadcast(dq), Seq("s", "cid"))
      .groupBy("qid", "id").agg(sum("dq").as("adc"))
      .filter(col("id") =!= col("qid"))
    val pqTop = TopK.topKPerGroup(adc, Seq(col("qid")),
      Seq(col("adc").asc, col("id").asc), K)
    val r = recall(pqTop, l2Truth)
    info(f"PQ-ADC recall@10 = $r%.3f (m=4, 5 codes/subspace)")
    assert(r >= 0.05, f"PQ-ADC recall@10 collapsed: $r%.3f < 0.05")
  }
}
