package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.GraftShim
import graft.functions.Md5Prefix32

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"):
 * select raw-corpus documents that look like a TARGET domain by
 * (1) featurizing every document as a bag of HASHED n-grams,
 * (2) fitting two bucket-level unigram models — target p and raw q —
 * as additive count artifacts, and (3) weighting each raw document by
 * its log importance ratio log w(x) = Σ_grams [ln p(b) − ln q(b)],
 * then (4) sampling k documents WITHOUT replacement with probability
 * ∝ w(x) via the Gumbel top-k trick (Kool et al. 2019: the k largest
 * log w + Gumbel(0,1) draws are exactly a w-weighted sample without
 * replacement).
 *
 * This is the domain-targeting counterpart of the perplexity filter
 * ([[NgramLm]]): NgramLm gates on "is this fluent under the corpus's
 * own LM"; DSIR gates on "does this look like the target domain
 * relative to the raw pool" — the GPT-3/PaLM-style quality-classifier
 * pipeline stage, expressed with hashed-n-gram generative models
 * instead of a discriminative classifier.
 *
 * Scale shape (the 100 TB pitch):
 *  - Featurization is scan-local: tokenize → adjacent-bigram zip →
 *    hash into `numBuckets` buckets inside codegen ([[Md5Prefix32]]),
 *    no shuffle until the count aggregate.
 *  - The two models are (bucket, cnt) frames of AT MOST `numBuckets`
 *    rows — additive, parquet-storable, mergeable by union→sum (the
 *    Sketches/NgramLm artifact discipline); fitting is one map-side-
 *    combined hash aggregate per corpus, and the ratio table is a
 *    BROADCAST join on the scoring side (a few thousand rows no
 *    matter how big the corpus).
 *  - Scoring is explode → broadcast-join → one per-doc hash aggregate;
 *    selection is a global top-k (TakeOrdered: per-partition heaps +
 *    one k-row merge, never a full sort).
 *
 * Determinism: per-bucket log-ratios are row-local doubles replayable
 * in any engine; the per-doc sum is DECIMAL(38,18)-exact (partition-
 * and engine-order invariant, the NgramLm/q125 discipline); Gumbel
 * noise derives from md5 of the doc key ([[Sampling.hashUniform]]
 * family), so the selected set is a pure function of (corpus, salt) —
 * stable under repartitioning and replayable in the DuckDB oracle
 * (q194/q195).
 *
 * Tokenization: lowercase whitespace words (the engine-wide
 * convention); grams = unigrams ++ adjacent bigrams ("t1 t2"), the
 * paper's feature set.
 */
object Dsir {

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** md5 bucket of a gram: Md5Prefix32("dsir:"||gram) % numBuckets —
    * DuckDB replays it as
    * CAST(('0x'||substring(md5('dsir:'||g),1,8)) AS UBIGINT) % B. */
  def bucketOf(gram: Column, numBuckets: Int): Column =
    pmod(GraftShim.column(Md5Prefix32(
      GraftShim.expr(concat(lit("dsir:"), gram)))), lit(numBuckets.toLong))

  /** Unigram ++ adjacent-bigram gram array for a text column — the ONE
    * gram definition both the batch pass and the streaming ingest twin
    * ([[graft.streaming.Streams.dsirScoreIngest]]) evaluate, so their
    * feature streams agree by construction. */
  def grams(text: Column): Column = {
    val w = toks(text)
    val bigrams = zip_with(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    concat(w, bigrams)
  }

  /** One row per gram OCCURRENCE: (id, bucket). Unigrams ++ adjacent
    * bigrams, hashed. Scan-local — the only shuffle downstream is the
    * consumer's aggregate. */
  def docBuckets(docs: DataFrame, id: Column, text: Column,
                 numBuckets: Int): DataFrame =
    docs.select(id.as("id"), explode(grams(text)).as("gram"))
      .select(col("id"), bucketOf(col("gram"), numBuckets).as("bucket"))

  /** (bucket, cnt) hashed-gram model artifact for one corpus — additive
    * and mergeable (union → groupBy → sum), one map-side-combined
    * aggregate over the scan. */
  def bucketCounts(docs: DataFrame, text: Column, numBuckets: Int): DataFrame =
    docBuckets(docs, lit(0L), text, numBuckets)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /**
   * Per-bucket log importance ratio over the FULL bucket domain
   * [0, numBuckets): logr(b) = [ln(tc+k) − ln(Tn+kB)] − [ln(rc+k) −
   * ln(Rn+kB)] with add-k smoothing (so buckets unseen in either model
   * still get a finite ratio, and the scoring join never needs a
   * default). `target`/`raw` are [[bucketCounts]] artifacts (or merged
   * rollups). Output: (bucket, logr) — numBuckets rows, broadcast-sized
   * by construction.
   */
  def logRatio(target: DataFrame, raw: DataFrame, numBuckets: Int,
               k: Double = 0.5): DataFrame = {
    require(numBuckets > 0 && k > 0, "need numBuckets > 0 and k > 0")
    val kb = k * numBuckets
    val spark = target.sparkSession
    val domain = spark.range(numBuckets).select(col("id").as("bucket"))
    val tot = target.agg(coalesce(sum("cnt"), lit(0L)).cast("double").as("_tn"))
      .crossJoin(raw.agg(coalesce(sum("cnt"), lit(0L)).cast("double").as("_rn")))
    domain
      .join(target.select(col("bucket"), col("cnt").as("_tc")), Seq("bucket"), "left")
      .join(raw.select(col("bucket"), col("cnt").as("_rc")), Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        ((log(coalesce(col("_tc"), lit(0L)).cast("double") + lit(k)) -
          log(col("_tn") + lit(kb))) -
         (log(coalesce(col("_rc"), lit(0L)).cast("double") + lit(k)) -
          log(col("_rn") + lit(kb)))).as("logr"))
  }

  /**
   * Per-document log importance weight: (id, n_grams, log_w) — the
   * DECIMAL(38,18)-exact sum of the per-occurrence bucket log-ratios
   * (order-invariant, engine-portable). Documents with zero grams are
   * absent (nothing to weigh). `ratio` is [[logRatio]]'s output; it is
   * broadcast — the scoring pass is explode → broadcast hash join →
   * one per-doc aggregate, no corpus-sized shuffle beyond the doc key.
   */
  def importanceWeights(docs: DataFrame, id: Column, text: Column,
                        ratio: DataFrame, numBuckets: Int): DataFrame =
    docBuckets(docs, id, text, numBuckets)
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(col("logr").cast("decimal(38,18)")).cast("double").as("log_w"))

  /** Gumbel(0,1) from the doc key: −ln(−ln(u)) with u = (md5₃₂(salt:key)
    * mod 1e6 + 0.5)/1e6 ∈ (0,1) — the +0.5 keeps u off both endpoints,
    * and the key is replayable anywhere md5 exists. */
  def gumbel(key: Column, salt: String): Column = {
    val u = (pmod(GraftShim.column(Md5Prefix32(
      GraftShim.expr(concat(lit(s"$salt:"), key.cast("string"))))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    -log(-log(u))
  }

  /**
   * Gumbel top-k: the k rows maximizing log_w + Gumbel(0,1) are a
   * probability-∝-w sample WITHOUT replacement (Kool et al. 2019).
   * Returns (sel_rank, id, log_w, key). The global top-k compiles to
   * TakeOrderedAndProject (per-partition heaps, one k-row merge) —
   * never a global sort; the rank window runs on k rows post-limit.
   */
  def gumbelTopK(weights: DataFrame, id: Column, logW: Column, k: Int,
                 salt: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    val keyed = weights.select(id.as("id"), logW.as("log_w"),
      (logW + gumbel(id, salt)).as("key"))
      .orderBy(col("key").desc, col("id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key").desc, col("id").asc)
    keyed.withColumn("sel_rank", row_number().over(w))
      .select(col("sel_rank"), col("id"), col("log_w"), col("key"))
  }
}
