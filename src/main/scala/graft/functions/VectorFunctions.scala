package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector column functions for similarity search
 * (beyond-reference: LLM-pipeline operators over
 * `embeddings.parquet` — `embedding: array<float>`).
 *
 * The hot kernel (`dot`, and `norm` = `sqrt(dot(a,a))`) is the native
 * codegen expression [[ArrayDot]] — a tight primitive loop inside
 * whole-stage codegen. Accumulation is in DOUBLE regardless of input
 * element type, in element order, so results are stable across engines and
 * partitionings (and bit-identical to the zip_with/aggregate formulation
 * these were first validated with).
 *
 * Scale note: brute-force cosine over N rows × D dims is O(N·D) per query —
 * fine fanned out over executors for one-off queries; for repeated queries
 * use SimilaritySearch.lsh* which buckets candidates first.
 */
object VectorFunctions {

  import org.apache.spark.sql.graftshim.GraftShim

  /** Σ aᵢ·bᵢ in double precision (codegen expression — see ArrayDot). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(ArrayDot(GraftShim.expr(a), GraftShim.expr(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero norms (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  /** v/‖v‖ as a double array; null for null/zero-norm input (or a null
    * element). For PAIRWISE ops, normalize each side BELOW the pair
    * join — cosine then degenerates to a single dot pass per pair
    * instead of dot + two norms (paid O(pairs) instead of O(rows)).
    * Native kernel ([[graft.functions.ArrayUnit]]): the transform-HOF
    * form re-evaluated the captured norm PER ELEMENT (O(D²)/row). */
  def unit(a: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.ArrayUnit(
        org.apache.spark.sql.graftshim.GraftShim.expr(a)))

  /** Squared euclidean distance (codegen expression — see
    * [[ArraySqDist]]). Bit-identical to the zip_with/aggregate HOF form
    * it replaces (same element order, same left-fold double
    * accumulation; KernelPropertiesSpec pins it) — the HOF was the r17
    * profile's hottest interpreted expression (~50 CPU-s per PQ encode
    * pass at sf0.1). */
  def sqDist(a: Column, b: Column): Column =
    GraftShim.column(ArraySqDist(GraftShim.expr(a), GraftShim.expr(b)))

  /** Flattened outer product a·bᵀ, row-major (codegen expression — see
    * [[ArrayOuterFlat]]) — the OPQ Procrustes scatter kernel.
    * Bit-identical to `flatten(transform(a, h => transform(b, x =>
    * h*x)))` (ArrayOuterFlatSpec pins it), including the HOF's one
    * asymmetric null edge: an EMPTY `a` yields an empty array even when
    * `b` is null, because the inner lambda is never evaluated — hence
    * the size guard in front of the null-propagating kernel. */
  def outerFlat(a: Column, b: Column): Column =
    when(size(a) === 0, array().cast("array<double>"))
      .otherwise(GraftShim.column(
        ArrayOuterFlat(GraftShim.expr(a), GraftShim.expr(b))))
}
