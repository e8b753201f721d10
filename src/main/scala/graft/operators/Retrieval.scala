package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Retrieval scoring over a document corpus (beyond-reference LLM-pipeline
 * operator — SURVEY §7.5; nearest reference analogue: the similarity
 * baseline `scripts/evaluate.py:277-292`).
 *
 * BM25 (Robertson-Walker-Jones Okapi family, with the Lucene idf variant
 * `ln((N - df + 0.5)/(df + 0.5) + 1)` which keeps idf positive) for a
 * FIXED query term set — the corpus-side shape of retrieval: score every
 * document against one query, take the top k. The per-query cost at 100 TB
 * is one scan + one scalar broadcast:
 *
 *  - per-doc term frequencies are scan-local (`size(filter(words, ...))`
 *    per term — no explode, no shuffle);
 *  - N / avgdl / per-term df reduce to ONE global aggregate row that is
 *    `broadcast()` back (a scalar dim, not a shuffle);
 *  - the term-score sum is written in fixed term order so double addition
 *    is deterministic and engine-portable (the DuckDB oracle spells the
 *    identical parenthesization — same floats bit-for-bit).
 */
object Retrieval {

  /**
   * BM25 scores: docs(idCol, textCol) × query terms → (id, bm25) for every
   * document (callers top-k / threshold downstream). Terms are matched on
   * lowercased whitespace tokens.
   */
  /**
   * Reciprocal Rank Fusion (Cormack et al. 2009, "Reciprocal rank
   * fusion outperforms Condorcet..."): fuse N ranked lists by
   * Σ 1/(k + rank) — the standard hybrid-retrieval merge (lexical BM25
   * ⊕ dense ANN), rank-based so incomparable score scales fuse without
   * calibration. Inputs are (id, rank) frames; ids absent from a list
   * contribute nothing (top-N-truncated lists, the production shape).
   *
   * One union + one id-key aggregate; engine-portable EXACTLY (the
   * fused score is a sum of ≤N reciprocals of small ints — identical
   * doubles in any engine given identical ranks).
   */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    lists.map(_.select(col("id"), col("rank")))
      .reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(lit(1.0) / (col("rank") + k)).as("rrf"))
  }

  def bm25(docs: DataFrame, idCol: Column, textCol: Column,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toks = graft.functions.TextAnalysis.words(textCol)
    // tokens are lowercased by words(); lowercase the terms too or an
    // uppercase query term would silently score 0 everywhere
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t.toLowerCase)).cast("long").as(s"_tf$i")
    }
    val withDl = docs.select(idCol.as("id") +:
      size(toks).cast("long").as("_dl") +: tfCols: _*)
    val statAggs = count(lit(1)).cast("double").as("_n") +:
      avg(col("_dl")).as("_avgdl") +:
      terms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).cast("double").as(s"_df$i"))
    val stats = withDl.agg(statAggs.head, statAggs.tail: _*)
    val scored = withDl.crossJoin(broadcast(stats))
    val termScores: Seq[Column] = terms.indices.map { i =>
      val idf = log((col("_n") - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5) + 1.0)
      idf * (col(s"_tf$i") * (k1 + 1.0)) /
        (col(s"_tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    }
    scored.select(col("id"), termScores.reduce(_ + _).as("bm25"))
  }

  /**
   * Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001
   * §2.2) — the standard LM alternative to [[bm25]]:
   * score(d) = Σ_t ln((tf_t + μ·ctf_t/|C|) / (|d| + μ)). Same plan shape
   * as bm25: per-doc tfs and length are scan-local, the corpus stats
   * (total tokens, per-term collection frequencies) are ONE aggregate
   * broadcast back as a 1-row frame, and scoring is pure column
   * arithmetic — one scan + one broadcast, no per-term shuffles.
   *
   * A term with zero collection frequency scores ln(0) = -Infinity
   * (standard QL; the smoothing mass is proportional to ctf) — filter
   * out-of-vocabulary terms upstream if that is not wanted.
   */
  def queryLikelihood(docs: DataFrame, idCol: Column, textCol: Column,
                      terms: Seq[String], mu: Double = 300.0): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(mu > 0, s"Dirichlet mu must be positive (got $mu)")
    val toks = graft.functions.TextAnalysis.words(textCol)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t.toLowerCase)).cast("long").as(s"_tf$i")
    }
    val withDl = docs.select(idCol.as("id") +:
      size(toks).cast("long").as("_dl") +: tfCols: _*)
    val statAggs = sum(col("_dl")).cast("double").as("_ctot") +:
      terms.indices.map(i => sum(col(s"_tf$i")).cast("double").as(s"_ctf$i"))
    val stats = withDl.agg(statAggs.head, statAggs.tail: _*)
    val scored = withDl.crossJoin(broadcast(stats))
    val termScores: Seq[Column] = terms.indices.map { i =>
      log((col(s"_tf$i") + lit(mu) * col(s"_ctf$i") / col("_ctot")) /
        (col("_dl") + lit(mu)))
    }
    scored.select(col("id"), termScores.reduce(_ + _).as("ql"))
  }

  /**
   * Corpus-statistics quality score: mean unigram log-probability per
   * document — the LM-filtering primitive (docs of improbable tokens are
   * OCR noise, lists, boilerplate; Gopher/CCNet-style pipelines cut on
   * exactly this signal, usually from a small LM — a self-trained
   * unigram model is its degenerate, shuffle-friendly form).
   * score(doc) = (1/|doc|) Σ_tokens ln(ctf(t) / N_tokens); every token
   * seen in the corpus has ctf ≥ 1, so no smoothing term is needed when
   * scoring the corpus against itself.
   *
   * Returns (id, n_tokens, avg_logprob). Scale shape: corpus term
   * frequencies via partial-agg groupBy (the q74/df discipline — map-side
   * combine on hot terms, AQE-splittable join, never a count() window);
   * the token→ctf join re-shuffles by term; the per-doc rollup sums the
   * ln values AS DECIMAL(28,18) — double addition is order-dependent
   * across partitions, and this sum feeds an exact cross-engine compare
   * (the money-sum discipline, graft-wide); the decimal is emitted back
   * as double for the division.
   */
  def unigramLogProb(docs: DataFrame, idCol: Column,
                     textCol: Column): DataFrame = {
    val toks = docs.select(idCol.as("id"),
      explode(filter(split(lower(textCol), "\\s+"),
        t => length(t) > 0)).as("term"))
    val ctf = toks.groupBy("term").agg(count(lit(1)).as("ctf"))
    val nTok = toks.agg(count(lit(1)).cast("double").as("n_tok"))
    toks.join(ctf, "term").crossJoin(broadcast(nTok))
      .select(col("id"),
        log(col("ctf") / col("n_tok")).cast("decimal(28,18)").as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp")).cast("double") / count(lit(1)))
          .as("avg_logprob"))
  }
}
