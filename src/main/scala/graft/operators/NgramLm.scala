package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-trained bigram language model + per-document negative
 * log-likelihood scoring — the CCNet-style perplexity quality filter
 * (Wenzek et al. 2020 §3.3: score every document under a reference LM,
 * gate on the per-token score) with the n-gram LM itself trained
 * in-engine instead of imported.
 *
 * Model = two additive count artifacts (parquet-storable, mergeable by
 * `union → groupBy → sum` — the Sketches-family discipline):
 *  - unigrams (token, cnt): ONE hash-aggregate over the token stream,
 *  - bigrams (t1, t2, cnt): ONE hash-aggregate over adjacent pairs.
 * Both are map-side-combined; the corpus is scanned once per artifact
 * and the shuffle carries only the (vocab-sized) count frames. At
 * 100 TB the artifacts are built once per corpus snapshot and reused by
 * every scoring run.
 *
 * Scoring (add-k smoothing, Chen & Goodman 1999 §2.3):
 *   P(w₁)      = (c(w₁) + k) / (N + kV)
 *   P(wᵢ|wᵢ₋₁) = (c(wᵢ₋₁wᵢ) + k) / (c(wᵢ₋₁) + kV)
 * avg_nll(doc) = −(ln P(w₁) + Σᵢ ln P(wᵢ|wᵢ₋₁)) / n — nats per token,
 * the monotone equivalent of perplexity (ppl = e^avg_nll; the filter
 * thresholds avg_nll directly and never pays the extra transcendental).
 * V = |vocab|, N = Σ cnt are read off the unigram artifact (two scalar
 * aggregates — bounded driver traffic, a model parameter not data).
 *
 * Plan shape: adjacent-pair explode (scan-local) → LEFT join bigram
 * artifact on (prev, cur) + LEFT join unigram artifact on prev (unseen
 * events coalesce to 0 → the k/(·+kV) smoothed floor), first tokens
 * (one row per doc) LEFT join unigrams on cur, union, ONE doc-key
 * aggregate. AQE broadcasts the artifacts while they fit (they do at
 * test SF); at web-corpus vocab (~10⁸ bigrams) both joins degrade
 * gracefully to shuffle-hash on the pair/token key.
 *
 * Engine-portable determinism: each per-position ln term is a row-local
 * double (replayable in any engine), but a double SUM is
 * partition-order dependent — terms are cast to DECIMAL(38,18) and
 * summed exactly (the GraphRank/q125 discipline), so the per-doc score
 * is bit-stable under any partitioning and replays exactly in the
 * DuckDB oracle (q168/q169).
 *
 * Tokenization: lowercase whitespace words, the engine-wide convention
 * ([[graft.functions.TextFunctions.wordNgrams]], [[Bpe.wordCounts]]).
 */
object NgramLm {

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** (token, cnt) unigram artifact — one corpus scan, one hash-agg. */
  def unigramCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(toks(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** (t1, t2, cnt) bigram artifact — one corpus scan, one hash-agg over
    * the scan-local adjacent-pair explode. */
  def bigramCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(toks(text).as("_w"))
      .select(explode(arrays_zip(
        slice(col("_w"), lit(1), greatest(size(col("_w")) - 1, lit(0))),
        slice(col("_w"), lit(2), greatest(size(col("_w")) - 1, lit(0)))))
        .as("p"))
      .select(col("p.0").as("t1"), col("p.1").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))

  /**
   * Per-document add-k bigram NLL: (id, n_tokens, avg_nll) — avg_nll
   * NULL for token-less documents (nothing to score, not a zero).
   * `uni`/`bi` are the artifacts above (or any merged rollup of them).
   */
  def scoreNll(docs: DataFrame, id: Column, text: Column,
               uni: DataFrame, bi: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val consts = uni.agg(count(lit(1)).cast("double"),
      coalesce(sum("cnt"), lit(0L)).cast("double")).head()
    val v = consts.getDouble(0)
    val n = consts.getDouble(1)

    val base = docs.select(id.as("_id"), toks(text).as("_w"))
      .select(col("_id"), col("_w"), size(col("_w")).as("_n"))
    val pairs = base
      .select(col("_id"), explode(arrays_zip(
        slice(col("_w"), lit(1), greatest(col("_n") - 1, lit(0))),
        slice(col("_w"), lit(2), greatest(col("_n") - 1, lit(0))))).as("p"))
      .select(col("_id"), col("p.0").as("_prev"), col("p.1").as("_cur"))
    val pairTerms = pairs
      .join(bi.select(col("t1").as("_bt1"), col("t2").as("_bt2"),
          col("cnt").as("_cb")),
        col("_prev") === col("_bt1") && col("_cur") === col("_bt2"), "left")
      .join(uni.select(col("token").as("_ut"), col("cnt").as("_cp")),
        col("_prev") === col("_ut"), "left")
      .select(col("_id"),
        log((coalesce(col("_cb"), lit(0L)) + k) /
            (coalesce(col("_cp"), lit(0L)) + k * v)).as("_term"))
    val firstTerms = base.filter(col("_n") >= 1)
      .select(col("_id"), element_at(col("_w"), 1).as("_cur"))
      .join(uni.select(col("token").as("_ut"), col("cnt").as("_cc")),
        col("_cur") === col("_ut"), "left")
      .select(col("_id"),
        log((coalesce(col("_cc"), lit(0L)) + k) / (n + k * v)).as("_term"))

    val scored = pairTerms.union(firstTerms)
      .groupBy("_id")
      .agg(sum(col("_term").cast("decimal(38,18)")).as("_s"))
    base.select(col("_id"), col("_n"))
      .join(scored, Seq("_id"), "left")
      .select(col("_id").as("id"), col("_n").as("n_tokens"),
        (-col("_s").cast("double") / col("_n")).as("avg_nll"))
  }
}
