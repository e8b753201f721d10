package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * Approximate/exact nearest-neighbor search over an embedding column
 * (beyond-reference LLM-pipeline operator — SURVEY §7.5; the reference's
 * similarity baseline scripts/evaluate.py:277-292 is the toy version).
 *
 * Scale notes (100 TB):
 *  - bruteForceTopK is a full scan + TakeOrderedAndProject: each partition
 *    keeps k rows, the driver merges — optimal for one-off queries, O(N·D)
 *    compute fanned across executors, no shuffle.
 *  - lshBuckets pre-partitions vectors into 2^planes hyperplane-sign
 *    buckets; repeated queries probe only matching buckets (bucket column
 *    → partition/Z-order key in storage). Planes are md5-derived ±1
 *    weights — deterministic, engine-portable, no stored model.
 *  - knnWithinBlock is the blocked all-pairs variant for "find each item's
 *    neighbors" jobs: quadratic ONLY within blocks — block first (LSH
 *    bucket, label, partition date), never all-pairs the corpus.
 */
object SimilaritySearch {

  /** Exact top-k by cosine against one query vector (literal). */
  def bruteForceTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      embs.select(idCol.as("id"), cosine(vecCol, q).as("cosine"))
        .filter(col("cosine").isNotNull),
      Seq(col("cosine").desc, col("id").asc), k)
  }

  /** Deterministic ±1 hyperplane weight for (plane, dim): parity of the
    * first md5 hex digit of "p:d". Portable to any md5-capable engine. */
  private def planeWeight(p: Int, d: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) % 2 == 0) 1 else -1
  }

  /** Column expression: LSH bucket id ∈ [0, 2^planes) from hyperplane
    * signs. Weights are baked as literals (planes × dims known at plan
    * time) so the whole thing codegens into the scan. */
  def lshBucket(vecCol: Column, dims: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = (0 until dims).map { d =>
        element_at(vecCol, d + 1).cast("double") * planeWeight(p, d)
      }.reduce(_ + _)
      when(dot > 0, 1 << p).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Assign every vector its LSH bucket. */
  def lshBuckets(embs: DataFrame, idCol: Column, vecCol: Column,
                 dims: Int, planes: Int = 8): DataFrame =
    embs.select(idCol.as("id"), vecCol.as("v"),
      lshBucket(vecCol, dims, planes).as("bucket"))

  /** ANN top-k: score only vectors in the query's bucket (single-probe;
    * multi-probe = union over neighbor buckets). */
  def lshTopK(embs: DataFrame, idCol: Column, vecCol: Column,
              query: Seq[Double], dims: Int, planes: Int, k: Int): DataFrame = {
    val qBucket = {
      var b = 0
      for (p <- 0 until planes) {
        val dot = (0 until dims).map(d => query(d) * planeWeight(p, d)).sum
        if (dot > 0) b |= (1 << p)
      }
      b
    }
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      embs.filter(lshBucket(vecCol, dims, planes) === qBucket)
        .select(idCol.as("id"), cosine(vecCol, q).as("cosine"))
        .filter(col("cosine").isNotNull),
      Seq(col("cosine").desc, col("id").asc), k)
  }

  /** For each item: top-k nearest neighbors within its block (blocked
    * all-pairs + per-item window). */
  def knnWithinBlock(embs: DataFrame, idCol: Column, vecCol: Column,
                     blockCol: Column, k: Int): DataFrame = {
    // per-row unit normalization below the join (VectorFunctions.unit
    // scaladoc) — per-pair cosine = one dot pass
    val e = embs.select(idCol.as("id"), blockCol.as("block"),
        graft.functions.VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    val pairs = e.as("x").join(e.as("y"),
        col("x.block") === col("y.block") && col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("neighbor"),
        graft.functions.VectorFunctions.dot(col("x.u"), col("y.u")).as("cosine"))
    TopK.topKPerGroup(pairs, Seq(col("id")),
      Seq(col("cosine").desc, col("neighbor").asc), k, "nn_rank")
  }
}
