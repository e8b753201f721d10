package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch

/** q122 float-stability margins: the exact-hash oracle gate for
  * q122_semantic_dedup is sound only because the testdata keeps every
  * UNROUNDED double comparison far from its knife edge (DocQueries q122
  * scaladoc). Two margins over the embeddings table:
  *
  *  - `minArgmaxGap`: smallest top-2 centroid-cosine gap over all
  *    vectors — an IVF assignment flips engines only inside this gap;
  *  - `minThresholdDist`: smallest |cosine − 0.30| over within-list
  *    pairs — a pair's keep/drop decision flips only inside this.
  *
  * Engine fp divergence for a 64-dim double dot is ~1e-12; [[assert]]
  * demands both margins exceed [[Bound]] (1e-9, three orders above)
  * and is invoked by Verify whenever q122 is verified, so a regenerated
  * embeddings table that lands near the knife edge fails the round
  * LOUDLY instead of silently hash-mismatching. */
object Q122Margin {

  /** Minimum tolerable margin: 1e-9 — ~1000× the measured worst-case
    * engine divergence, ~1000× under the smallest margin any testdata
    * generation has produced (6.3e-6, r7 probe). */
  val Bound = 1e-9

  /** (minArgmaxGap, minThresholdDist) for the embeddings table in `dir`,
    * replaying exactly q122's assignment (argmax cosine, lowest-cid
    * tiebreak) and its 0.30 threshold. */
  def margins(spark: SparkSession, dir: String): (Double, Double) = {
    val embs = graft.sources.Tables.load(spark, dir, "embeddings")
    val cents = SimilaritySearch.ivfCentroids(
      embs, col("vec_id"), col("embedding"), 100)
    val e = embs.select(col("vec_id").as("id"),
        VectorFunctions.unit(col("embedding")).as("u"))
      .filter(col("u").isNotNull)
    val cos = e.join(broadcast(cents))
      .select(col("id"), col("cid"),
        VectorFunctions.dot(col("u"), col("cu")).as("cos"))
    val top2 = cos.withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") <= 2)
      .groupBy("id").agg((max(when(col("rk") === 1, col("cos"))) -
        max(when(col("rk") === 2, col("cos")))).as("gap"))
    val minGap = headDoubleOrInf(top2.agg(min("gap")))
    val assigned = cos
      .withColumn("m",
        max(struct(col("cos"), -col("cid"))).over(Window.partitionBy(col("id"))))
      .filter(col("cos") === col("m.cos") && col("cid") === -col("m.col2"))
    val pairs = assigned.as("x").join(assigned.as("y"),
      col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
    val pairCos = pairs
      .join(e.select(col("id").as("xid"), col("u").as("xu")),
        col("x.id") === col("xid"))
      .join(e.select(col("id").as("yid"), col("u").as("yu")),
        col("y.id") === col("yid"))
      .select(VectorFunctions.dot(col("xu"), col("yu")).as("pc"))
    val minThr = headDoubleOrInf(pairCos.agg(min(abs(col("pc") - 0.30))))
    (minGap, minThr)
  }

  /** A null min means the frame underneath was EMPTY (no vectors, or no
    * two vectors share a list ⇒ no pairs): there is no comparison that
    * could sit near a knife edge, so the margin is vacuously infinite —
    * the guard passes instead of dying on a NullPointerException. */
  private[queries] def headDoubleOrInf(agg: org.apache.spark.sql.DataFrame): Double = {
    val row = agg.head
    if (row.isNullAt(0)) Double.PositiveInfinity else row.getDouble(0)
  }

  /** Throws (→ the caller's per-query failure path) if either margin is
    * inside [[Bound]] — the oracle gate would then be numerically
    * unsound for this testdata generation. */
  def assertSound(spark: SparkSession, dir: String): Unit = {
    val (gap, thr) = margins(spark, dir)
    require(gap > Bound && thr > Bound,
      f"q122 float-margin guard: minArgmaxGap=$gap%.3e " +
        f"minThresholdDist=$thr%.3e (bound ${Bound}%.0e) — the embeddings " +
        "table sits on a knife edge; the exact-hash oracle gate is unsound " +
        "for this data. Regenerate testdata or widen the documented margin.")
  }
}
