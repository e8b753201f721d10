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
 * Scale notes (100 TB): [[evaluate]]'s global rank window is a single
 * total ordering — the faithful mirror of the reference harness
 * (evaluate.py sorts the whole candidate list), fine for evaluation sets
 * (≤ millions of candidate pairs after top-k pruning) but deliberately
 * NOT for full-corpus ranking. RECORDED DECISION (r7): q56 stays on
 * [[evaluate]] because the reference's consumers only ever rank eval
 * sets (pipeline.py:320-321 feeds ranked top-N); [[evaluateAtScale]] is
 * the window-free variant for when the candidate list itself is huge —
 * numerically equal metrics from one bounded TakeOrdered + one
 * distributed aggregate (RankingMetricsSpec proves parity).
 */
object RankingMetrics {

  /**
   * Per-group NDCG@k — the per-query granularity real eval reports
   * aggregate over (a single global NDCG hides which segments the
   * ranker fails; per-group rows feed means, CIs, and slice audits):
   * (grp, n, n_rel, ndcg), ndcg NULL when the group has no relevant
   * item (nothing to rank, not a zero). `label` must be 0/1.
   *
   * One Exchange on the group key; both rank windows (actual order,
   * ideal label-sorted order) share it; one aggregate. Scale: group
   * cardinality bounds every frame after the windows.
   */
  def perGroupNdcg(df: DataFrame, groupCol: Column, score: Column,
                   label: Column, k: Int,
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    val base = df.select(groupCol.as("grp") +: score.as("_s") +:
      label.cast("double").as("_rel") +:
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"_t$i") }: _*)
    val tb = tieBreak.indices.map(i => col(s"_t$i").asc)
    val wPos = Window.partitionBy(col("grp"))
      .orderBy(col("_s").desc +: tb: _*)
    val wIdeal = Window.partitionBy(col("grp"))
      .orderBy(col("_rel").desc +: tb: _*)
    base
      .withColumn("_pos", row_number().over(wPos))
      .withColumn("_ipos", row_number().over(wIdeal))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("_rel")).cast("long").as("n_rel"),
        sum(when(col("_pos") <= k, col("_rel") / log2(col("_pos") + 1))
          .otherwise(0.0)).as("_dcg"),
        sum(when(col("_ipos") <= k, col("_rel") / log2(col("_ipos") + 1))
          .otherwise(0.0)).as("_idcg"))
      .select(col("grp"), col("n"), col("n_rel"),
        (col("_dcg") / when(col("_idcg") === 0.0, lit(null))
          .otherwise(col("_idcg"))).as("ndcg"))
  }

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

  /**
   * [[evaluate]] without any window — the 100 TB shape. Three facts make
   * the global ordering unnecessary:
   *  - the DCG/P@k/R@k numerators only touch positions ≤ max(ks), so a
   *    bounded `TopK.globalTopK` (TakeOrderedAndProject: each partition
   *    keeps max(ks) rows, the driver merges — no shuffle of the full
   *    relation, no WindowExec) supplies every positional term;
   *  - the full-set terms (count, total relevant, coverage) are one
   *    plain distributed aggregate;
   *  - labels are 0/1, so the ideal ordering is all-ones-first and
   *    IDCG@k collapses to the closed form Σ_{i=1..min(k,R)}
   *    1/log2(i+1), a function of the relevant-count R alone — no
   *    second ordering at all.
   * The only WindowExec left is `globalTopK`'s rank over the ≤ max(ks)
   * limited rows — bounded work at any corpus size; the full relation is
   * never range-sorted or single-partitioned. Metrics equal
   * [[evaluate]]'s to fp-summation order (RankingMetricsSpec asserts
   * 1e-12 agreement). As with [[evaluate]], supply `tieBreak` to make
   * the score order total, or the boundary of the top-k set is
   * nondeterministic.
   */
  def evaluateAtScale(df: DataFrame, score: Column, label: Column,
                      tieBreak: Seq[Column] = Nil,
                      ks: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    val maxK = ks.max
    val sel = df.select(Seq(score.as("_score"),
      label.cast("double").as("rel"),
      (score > 0.5).cast("double").as("covered")) ++
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"_tb$i") }: _*)
    val stats = sel.agg(count(lit(1)).as("_n"),
      sum(col("rel")).as("_r"), avg(col("covered")).as("_cov"))
    val order = col("_score").desc +:
      tieBreak.indices.map(i => col(s"_tb$i").asc)
    val top = graft.operators.TopK.globalTopK(sel, order, maxK,
      rankCol = "pos")
    val posSums: Seq[Column] = ks.flatMap { k =>
      Seq(sum(when(col("pos") <= k, col("rel")).otherwise(lit(0.0)))
          .as(s"_ts$k"),
        sum(when(col("pos") <= k, col("rel") / log2(col("pos") + 1))
          .otherwise(lit(0.0))).as(s"_dcg$k"))
    }
    val joined = top.agg(posSums.head, posSums.tail: _*)
      .crossJoin(broadcast(stats))
    val metricCols: Seq[Column] = ks.flatMap { k =>
      // IDCG closed form; sequence guard — R = 0 would make it descending
      val idcg = when(col("_r") > 0,
        aggregate(sequence(lit(1), least(lit(k), col("_r")).cast("int")),
          lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
        .otherwise(lit(0.0))
      Seq(
        when(col("_n") >= k, col(s"_ts$k") / k).otherwise(lit(0.0))
          .as(s"precision_at_$k"),
        when(col("_r") > 0, col(s"_ts$k") / col("_r")).otherwise(lit(0.0))
          .as(s"recall_at_$k"),
        when(idcg > 0, col(s"_dcg$k") / idcg).otherwise(lit(0.0))
          .as(s"ndcg_at_$k"))
    } ++ Seq(
      col("_cov").as("coverage"),
      col("_n").as("total_recommendations"),
      col("_r").cast("long").as("relevant_items"))
    joined.select(metricCols: _*)
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

  /** AUC via the Mann-Whitney rank-sum with MIDRANKS over tied scores
    * (the sklearn/Mann-Whitney definition: a pos/neg tie counts 0.5,
    * not a full positive win — material when the scorer emits few
    * distinct margins, e.g. a small frozen tree model). Tied scores
    * share rank mean(first..last) via one groupBy on the score value.
    * The global row_number window means ONE ordered pass over the
    * scored frame — an eval-protocol-scale helper (holdout sets), not
    * a corpus sweep; at 100 TB bucket the scores and trapezoid the
    * per-bucket TP/FP counts instead. */
  def auc(scored: DataFrame, score: Column, label: Column): Double = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(score)
    val ranked = scored
      .withColumn("_s", score.cast("double"))
      .withColumn("_r", row_number().over(w))
      .withColumn("_pos", label.cast("int"))
    // midrank per score group: (min rank + max rank) / 2
    val mid = ranked.groupBy(col("_s"))
      .agg(((min(col("_r")) + max(col("_r"))) / 2.0).as("_mr"),
        sum(col("_pos")).as("_gp"), count(lit(1)).as("_gn"))
    val agg = mid.agg(
      sum(col("_mr") * col("_gp")).as("rankSum"),
      sum(col("_gp")).as("nPos"), sum(col("_gn")).as("n")).head
    // fail LOUDLY on degenerate eval slices: an empty frame NPEs on the
    // null sum and a single-class frame divides to NaN/Infinity — both
    // would otherwise propagate silently into quality reports
    require(!agg.isNullAt(1) && !agg.isNullAt(2),
      "auc: empty scored frame")
    val nPos = agg.getLong(1).toDouble
    val nNeg = agg.getLong(2) - nPos
    require(nPos > 0 && nNeg > 0,
      s"auc undefined on a single-class frame (nPos=$nPos, nNeg=$nNeg)")
    (agg.getDouble(0) - nPos * (nPos + 1) / 2) / (nPos * nNeg)
  }
}
