package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Corpus, Resample, Retrieval, Sampling, TopK}
import graft.sources.Tables

/**
 * Corpus-preparation queries (q93-q98): benchmark decontamination, BM25
 * retrieval scoring, time-series gap-fill, sequence packing, fixed-k eval
 * holdout, and context-window chunking — the remaining LLM-training-data
 * operators on top of the dedup/similarity/quality family in
 * [[DocQueries]]. Every query has a value-exact DuckDB oracle.
 */
object CorpusQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  /** BM25 query terms — fixed, in score-sum order (determinism contract of
    * Retrieval.bm25; the oracle adds the same three terms in the same
    * order). */
  private val Bm25Terms = Seq("spark", "vector", "stream")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q131_span_dedup" -> ((s, dir) => {
      // C4-style repeated-span excision over 10-word tiles: every
      // complete tile seen earlier in the corpus (lowest doc_id, then
      // tile index) is excised; docs are rebuilt from surviving tiles +
      // the always-kept partial tail. rebuilt_md5 stands in for the
      // rewritten text. The near-dup mass in the synthetic corpus makes
      // this bite: near-twins lose their shared tiles to the earliest
      // copy. Oracle replays the tiling, the md5 group key, and the
      // first-wins window verbatim.
      Corpus.spanDedup(t(s, dir, "documents"), col("doc_id"), col("text"),
          spanWords = 10)
        .select(col("id").as("doc_id"), col("n_tiles"), col("n_kept"),
          col("n_dropped"), col("rebuilt_md5"))
        .orderBy("doc_id")
    }),

    "q172_corpus_datasheet" -> ((s, dir) => {
      // the corpus datasheet (Gebru et al. 2021 "Datasheets for
      // Datasets" §3.2 composition questions, as ONE queryable frame):
      // global size/dup/vocabulary stats from a single multi-agg pass
      // (two count-distincts → one Expand over one scan), plus the
      // per-language composition rows from one grouped pass. Long
      // (metric, value) shape so downstream release gates diff two
      // datasheets with a join, not a schema migration.
      // zero driver reads (VERDICT r15 #8): the one-row global agg is
      // materialized ONCE (localCheckpoint — both the datasheet rows
      // and the per-language denominator read it) and stays a frame —
      // the metric rows derive via explode(map), the denominator rides
      // a broadcast crossJoin
      val docs = t(s, dir, "documents")
        .withColumn("_toks", size(filter(split(lower(col("text")), "\\s+"),
          x => length(x) > 0)).cast("long"))
      val gAgg = docs.agg(
        count(lit(1)).cast("double").as("n_docs"),
        sum(col("_toks")).cast("double").as("n_tokens"),
        countDistinct(col("text")).cast("double").as("n_distinct_texts"),
        countDistinct(col("source")).cast("double").as("n_sources"))
        .localCheckpoint()
      val global = gAgg.select(explode(map(
        lit("n_docs"), col("n_docs"),
        lit("n_tokens"), col("n_tokens"),
        lit("n_sources"), col("n_sources"),
        lit("exact_dup_frac"),
        (col("n_docs") - col("n_distinct_texts")) / col("n_docs"),
        lit("mean_doc_tokens"), col("n_tokens") / col("n_docs")))
        .as(Seq("metric", "value")))
      val langs = docs.groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(gAgg.select(col("n_docs"))))
        .select(concat(lit("lang_frac:"), col("lang")).as("metric"),
          (col("n") / col("n_docs")).as("value"))
      global.unionByName(langs)
        .select(col("metric"), round(col("value"), 6).as("value"))
        .orderBy("metric")
    }),

    "q170_sliding_span_dedup" -> ((s, dir) => {
      // ExactSubstr-style stride-1 repeated-span excision (Lee et al.
      // 2021): every 4-token window repeated anywhere in the corpus at
      // ANY alignment loses all but its globally-first occurrence —
      // the tile-boundary-blind upgrade of q131 (a repeat straddling a
      // 10-word tile edge is invisible there, excised here). W=4 bites
      // broadly on this corpus (~47% of docs hold a repeated window)
      // without reducing it to stubs. Oracle replays the window
      // hashing, first-wins ranking, coverage explode and indexed
      // rebuild verbatim.
      Corpus.slidingSpanDedup(t(s, dir, "documents"), col("doc_id"),
          col("text"), spanWords = 4)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_kept"),
          col("rebuilt_md5"))
        .orderBy("doc_id")
    }),

    "q155_boilerplate" -> ((s, dir) => {
      // CCNet/C4-style boilerplate excision: any 10-word tile whose
      // DOCUMENT frequency reaches 3 is template text, and ALL its
      // occurrences are removed (the complement of q131's first-wins —
      // dedup keeps one copy of content; boilerplate is noise in every
      // copy). Same tiling, same rebuild splice, same output shape;
      // only the keep rule differs. The synthetic near-dup families
      // make it bite: a tile shared by a 3+-doc family vanishes from
      // the whole family, including the earliest copy q131 would keep.
      Corpus.removeBoilerplate(t(s, dir, "documents"), col("doc_id"),
          col("text"), spanWords = 10, minDf = 3)
        .select(col("id").as("doc_id"), col("n_tiles"), col("n_kept"),
          col("n_dropped"), col("rebuilt_md5"))
        .orderBy("doc_id")
    }),

    "q157_boilerplate_artifact" -> ((s, dir) => {
      // q155 through the materialize-once artifact path (the q130
      // pattern): the template-tile key set is built ONCE
      // (Corpus.boilerplateTiles), written to parquet, read back, and
      // the excision runs as a LEFT ANTI join against the STORED keys
      // (Corpus.removeBoilerplateAgainst). Applied to the corpus the
      // artifact was built from with the same spanWords/minDf, the
      // output is row-identical to q155's inline df-window form — the
      // oracle below IS q155's oracle. Production shape: build the
      // artifact per corpus version, fan out (batch excision here,
      // Streams.boilerplateIngest at the crawl-ingest edge).
      val docs = t(s, dir, "documents")
      val out = "/tmp/graft_artifacts_q157"
      Corpus.boilerplateTiles(docs, col("doc_id"), col("text"),
          spanWords = 10, minDf = 3)
        .write.mode("overwrite").parquet(out)
      Corpus.removeBoilerplateAgainst(docs, s.read.parquet(out),
          col("doc_id"), col("text"), spanWords = 10)
        .select(col("id").as("doc_id"), col("n_tiles"), col("n_kept"),
          col("n_dropped"), col("rebuilt_md5"))
        .orderBy("doc_id")
    }),

    "q93_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: train docs (source != src0) sharing any
      // word 5-gram with the benchmark set (source = src0). 5-grams: chance
      // collisions ~vanish, planted near-dups always hit.
      val docs = t(s, dir, "documents")
      Corpus.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          col("doc_id"), col("text"), n = 5)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_shared"),
          round(col("contamination"), 6).as("contamination"))
        .orderBy("doc_id")
    }),

    "q133_decontaminate_bloom" -> ((s, dir) => {
      // q93's semantics through the Bloom-prefilter scale path: a sketch
      // over the bench grams prunes corpus grams scan-locally
      // (BloomFilterMightContain codegen), the exact join confirms the
      // survivors — bit-identical output by the no-false-negatives
      // contract, so the SAME oracle SQL gates both plans
      // (Corpus.decontaminateBloom scaladoc).
      val docs = t(s, dir, "documents")
      Corpus.decontaminateBloom(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          col("doc_id"), col("text"), n = 5)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_shared"),
          round(col("contamination"), 6).as("contamination"))
        .orderBy("doc_id")
    }),

    "q153_semantic_decontaminate" -> ((s, dir) => {
      // embedding-space benchmark decontamination — the paraphrase-proof
      // complement of q93/q133's n-gram paths (Corpus.decontaminateSemantic
      // scaladoc): bench = vec_id % 10 == 0, corpus = the rest, IVF
      // centroids = every 20th id (⊂ bench), nprobe 2, threshold 0.40.
      // Float stability: the gate decisions (bench argmax, probe-rank
      // boundary, 0.40 threshold) compare unrounded double cosines per
      // engine — guarded by Q153Margin (the q122 discipline): measured
      // min margins this round ≥ 1.1e-5 across all three SFs vs ~1e-12
      // worst-case engine divergence. The maxListSize cap (a second
      // recall trade, see the operator scaladoc) is NON-BINDING at
      // every test SF: bench lists hold ~2 vectors (50/25 at sf0.01,
      // 200/100 at sf0.1), so capped ≡ uncapped and the oracle's
      // uncapped SQL gates the same result. The vec_id%10 bench /
      // vec_id%20 centroid scheme guarantees non-empty centroids (every
      // 20-divisible id is 10-divisible), so the operator's
      // empty-centroid guard cannot fire here.
      val e = t(s, dir, "embeddings")
      Corpus.decontaminateSemantic(
          e.filter(pmod(col("vec_id"), lit(10)) =!= 0),
          e.filter(pmod(col("vec_id"), lit(10)) === 0),
          col("vec_id"), col("embedding"), modulus = 20,
          nprobe = 2, threshold = 0.40)
        .select(col("id"), col("bench_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("id", "bench_id")
    }),

    "q94_bm25" -> ((s, dir) => {
      // Okapi BM25 (Lucene idf) for a fixed 3-term query, top-20 docs.
      // Scan-local tfs + one broadcast stats row (Retrieval scaladoc).
      val scored = Retrieval.bm25(t(s, dir, "documents"),
        col("doc_id"), col("text"), Bm25Terms)
      TopK.globalTopK(scored, Seq(col("bm25").desc, col("id").asc), 20)
        .select(col("id").as("doc_id"), round(col("bm25"), 6).as("bm25"),
          col("rank"))
        .orderBy("rank")
    }),

    "q191_ql_retrieval" -> ((s, dir) => {
      // Dirichlet query-likelihood (Zhai & Lafferty 2001) for the same
      // fixed 3-term query as q94 — the language-model ranker beside
      // BM25. Same plan envelope: scan-local tfs/length, ONE broadcast
      // corpus-stats row, pure column arithmetic, top-15 out.
      val scored = Retrieval.queryLikelihood(t(s, dir, "documents"),
        col("doc_id"), col("text"), Bm25Terms, mu = 300.0)
      TopK.globalTopK(scored, Seq(col("ql").desc, col("id").asc), 15)
        .select(col("id").as("doc_id"), round(col("ql"), 6).as("ql"),
          col("rank"))
        .orderBy("rank")
    }),

    "q179_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 top-50 (lexical) ⊕ cosine-vs-vec0 top-50
      // (dense; doc_id ≡ vec_id in the testdata) fused by reciprocal
      // rank (k=60, the canonical constant), top-20 out. The fused
      // score is engine-exact given the two rank lists — the oracle
      // replays both rankers and the fusion.
      val docs = t(s, dir, "documents")
      val lex = TopK.globalTopK(
        Retrieval.bm25(docs, col("doc_id"), col("text"), Bm25Terms),
        Seq(col("bm25").desc, col("id").asc), 50).select("id", "rank")
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble)
      val dense = graft.operators.SimilaritySearch
        .bruteForceTopK(e, col("vec_id"), col("embedding"), qv, 50)
        .select("id", "rank")
      TopK.globalTopK(Retrieval.rrfFuse(Seq(lex, dense), 60),
          Seq(col("rrf").desc, col("id").asc), 20)
        .select(col("id").as("doc_id"), round(col("rrf"), 6).as("rrf"),
          col("rank"))
        .orderBy("rank")
    }),

    "q125_unigram_logprob" -> ((s, dir) => {
      // LM-quality filtering signal: mean unigram log-prob per doc from
      // the corpus's own token statistics (Retrieval.unigramLogProb
      // scaladoc — the ln sum rides DECIMAL(28,18) for order-invariance)
      Retrieval.unigramLogProb(Tables.loadSpread(s, dir, "documents"),
          col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    }),

    "q95_gap_fill" -> ((s, dir) => {
      // daily calendar scaffold + forward fill per customer (bounded to 50
      // keys: the scaffold is Σ per-key span-days — the operator's cost
      // model, not the comparer's)
      Resample.gapFillDaily(
          t(s, dir, "orders").filter(col("o_custkey") < 50),
          col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .select(col("key").as("custkey"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("day_total"), 2).as("day_total"),
          round(col("filled"), 2).as("filled"))
        .orderBy("custkey", "day")
    }),

    "q96_pack_sequences" -> ((s, dir) => {
      // concat-then-chunk sequence packing, capacity 256 tokens, packed
      // per source shard in doc_id order (Corpus.packSequences scaladoc)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      Corpus.packSequences(docs, col("doc_id"), col("source"),
          col("n_tok"), capacity = 256)
        .select(col("id").as("doc_id"), col("shard").as("source"),
          col("n_tok"), col("pack_first"), col("pack_last"),
          col("pack_offset"))
        .orderBy("source", "doc_id")
    }),

    "q97_eval_holdout" -> ((s, dir) => {
      // exact-k eval holdout: 5 docs per language by deterministic md5
      // rank (partition-invariant, replayable — Sampling scaladoc)
      Sampling.fixedKPerStratum(t(s, dir, "documents"),
          col("doc_id"), col("lang"), k = 5)
        .select(col("doc_id"), col("lang"), col("rn"))
        .orderBy("lang", "rn")
    }),

    "q99_winsorize" -> ((s, dir) => {
      // robust per-group scaling: order-statistic thresholds (engine-exact,
      // no quantile interpolation), clip, decimal rollup (RobustStats
      // scaladoc). giantGroups: 5 order priorities — at 100 TB each group
      // outgrows one task's sort, so the declared query runs the
      // range-partitioned selection path end-to-end (row-identical to the
      // window path, RobustStatsGiantSpec).
      graft.operators.RobustStats.winsorizedRollup(
          t(s, dir, "orders"),
          col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"),
          giantGroups = true)
        .select(col("grp"), col("n"),
          round(col("p_lo"), 2).as("p05"), round(col("p_hi"), 2).as("p95"),
          col("sum_clipped"), col("n_low"), col("n_high"))
        .orderBy("grp")
    }),

    "q123_mad_anomalies" -> ((s, dir) => {
      // robust anomaly gate per event type: |v − median| > 3·MAD with
      // both medians as exact rank-selected order statistics — no
      // quantile interpolation, no 1.4826 fractional consistency
      // constant (RobustStats.madAnomalies scaladoc). giantGroups: 5
      // event types over the fact table is exactly the few-giant-groups
      // regime (the r7 structural finding), so the declared query runs
      // the range-partitioned selection path, not the 5-task window.
      graft.operators.RobustStats.madAnomalies(
          t(s, dir, "events"),
          col("event_type"), col("value"), col("event_id"), k = 3,
          giantGroups = true)
        .select(col("grp").as("event_type"), col("n"),
          round(col("median"), 6).as("median"),
          round(col("mad"), 6).as("mad"), col("n_anomalies"))
        .orderBy("event_type")
    }),

    "q100_epoch_shuffle" -> ((s, dir) => {
      // reproducible training-order permutation: md5 shard + in-shard rank
      // (Sampling.epochShuffle scaladoc); salt picks the epoch
      Sampling.epochShuffle(t(s, dir, "documents").select("doc_id"),
          col("doc_id"), nShards = 8, salt = "epoch7")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    }),

    "q110_basket_pairs" -> ((s, dir) => {
      // market-basket co-occurrence: part pairs bought in the same order,
      // top-20. Pair generation is quadratic in basket size, so baskets
      // above 20 distinct parts are dropped BEFORE the self-join (the
      // LSH-bucket-cap discipline — one mega-basket at corpus scale emits
      // O(n²) pairs; production co-occurrence miners cap or sample it).
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val szW = org.apache.spark.sql.expressions.Window.partitionBy(col("ok"))
      val bb = b.withColumn("_n", count(lit(1)).over(szW))
        .filter(col("_n") <= 20).drop("_n")
      val pairs = bb.as("x").join(bb.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a_part"), col("y.pk").as("b_part"))
        .agg(count(lit(1)).as("n_orders"))
      TopK.globalTopK(pairs,
          Seq(col("n_orders").desc, col("a_part").asc, col("b_part").asc), 20)
        .orderBy("rank")
    }),

    "q109_rfm" -> ((s, dir) => {
      // RFM segmentation with scale-sound quintiles: boundaries are
      // order statistics of each dimension, broadcast back; scoring is
      // scan-local (RobustStats.orderStatEdges scaladoc — never a
      // global ntile window). Recency inverts (recent = 5).
      import graft.operators.RobustStats
      // localCheckpoint: the per-customer rollup feeds SEVEN consumers
      // (3 × orderStatEdges' count/sort/pick actions + the final scoring
      // scan) — materialize it once instead of re-aggregating orders
      // per action
      val rfm = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          datediff(lit("2001-09-01").cast("date"), to_date(max(col("o_orderdate"))))
            .as("recency"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("monetary"))
        .localCheckpoint()
      val re = RobustStats.orderStatEdges(rfm, col("recency"), 5)
        .select(col("e").as("re"))
      val fe = RobustStats.orderStatEdges(rfm, col("frequency"), 5)
        .select(col("e").as("fe"))
      val me = RobustStats.orderStatEdges(rfm, col("monetary"), 5)
        .select(col("e").as("me"))
      def score(e: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        lit(1) + size(filter(e, x => x < v.cast("double")))
      rfm.crossJoin(broadcast(re)).crossJoin(broadcast(fe)).crossJoin(broadcast(me))
        .select(col("custkey"),
          (lit(6) - score(col("re"), col("recency"))).as("r_score"),
          score(col("fe"), col("frequency")).as("f_score"),
          score(col("me"), col("monetary")).as("m_score"))
        .orderBy("custkey")
    }),

    "q108_dau_wau" -> ((s, dir) => {
      // sliding-distinct engagement: WAU via the explode-into-window
      // formulation — each (user, active-day) pair contributes to the 7
      // target days it covers, then one distinct count per day. The
      // sliding-window-distinct every naive plan does with a per-day
      // self-join or a giant collect_set window; explode keeps it two
      // hash aggregations at any scale (output rows = 7 × active pairs).
      val ad = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ad.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ad.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      val span = ad.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      dau.join(wau, "day").crossJoin(broadcast(span))
        .filter(col("day").between(col("d0"), col("d1")))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("day")
    }),

    "q106_temperature_mix" -> ((s, dir) => {
      // temperature (alpha=0.5) language-mixture resampling to half the
      // corpus: low-resource languages keep a higher rate
      // (Sampling.temperatureMixture scaladoc)
      Sampling.temperatureMixture(t(s, dir, "documents"),
          col("doc_id"), col("lang"), alpha = 0.5, targetFraction = 0.5)
        .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
        .orderBy("doc_id")
    }),

    "q140_token_budget_mix" -> ((s, dir) => {
      // token-budget data mixing — the quota step that assembles a
      // training mix from per-domain TOKEN budgets (not doc counts):
      // every source contributes docs in its deterministic md5-shuffle
      // order until 800 tokens are filled; src0 (the benchmark source,
      // q93's held-out set) gets budget 0 and contributes nothing.
      // Equal budgets flatten the source imbalance the way published
      // mixes pin per-domain token shares. One per-source window; keep
      // decisions are a pure function of the salt (replayable anywhere).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Sampling.tokenBudgetFill(docs, col("doc_id"), col("source"),
          col("n_tokens"),
          when(col("source") === "src0", lit(0L)).otherwise(lit(800L)))
        .select(col("doc_id"), col("source"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          col("pos"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    "q138_cluster_balanced_sample" -> ((s, dir) => {
      // semantic diversity rebalance — q106's temperature mixture with
      // the stratum coming from the EMBEDDING space instead of a label
      // column: each doc joins its vector (doc_id ≡ vec_id), the IVF
      // coarse quantizer assigns it a semantic cluster (q72 kernel,
      // modulus 100 → 5 clusters), and alpha=0.5 temperature rates flatten
      // the cluster mix toward uniform at half the corpus — the
      // "cluster-then-rebalance" curation step (D4/SemDeDup-style) that
      // keeps a scrape's dominant topic from swamping the training mix.
      // One broadcast assignment + one tiny rate frame; the corpus scan
      // stays single-pass. Keep decisions are md5-hash (replayable on
      // any engine/partitioning).
      import graft.operators.SimilaritySearch
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val assign = SimilaritySearch.ivfAssign(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), modulus = 100)
        .select(col("id").as("doc_id"), col("cid"))
      Sampling.temperatureMixture(docs.join(assign, "doc_id"),
          col("doc_id"), col("cid"), alpha = 0.5, targetFraction = 0.5,
          salt = "cbal")
        .select(col("doc_id"), col("lang"), col("cid"),
          round(col("rate"), 6).as("rate"))
        .orderBy("doc_id")
    }),

    "q105_attribution" -> ((s, dir) => {
      // last-touch attribution: each purchase's value is credited to the
      // channel (props k % 5) of the user's latest click within 24h;
      // no qualifying click → 'direct'. As-of machinery (q69) + JSON
      // parse + decimal rollup in one composition.
      import graft.operators.AsOfJoin
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = AsOfJoin.latestPerKeyTs(
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"),
              concat(lit("ch"),
                pmod(get_json_object(col("props"), "$.k").cast("long"), lit(5L)))
                .as("channel")),
          col("user_id"), col("ts"), col("event_id"))
        .select("user_id", "ts", "channel")
      AsOfJoin.asOf(purchases, clicks, "user_id", "ts", Seq("channel"),
          toleranceSeconds = Some(86400L))
        .select(coalesce(col("asof_channel"), lit("direct")).as("channel"),
          col("value"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("channel")
    }),

    "q103_funnel" -> ((s, dir) => {
      // ordered conversion funnel view→click→purchase, 24h per step
      // (EventAnalytics.funnel scaladoc: chained windows, one Exchange)
      graft.operators.EventAnalytics.funnel(
          t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
          Seq("view", "click", "purchase"))
        .orderBy("stage")
    }),

    "q104_retention" -> ((s, dir) => {
      // purchase-anchored daily retention cohorts, offsets 0..14
      graft.operators.EventAnalytics.retentionCohorts(
          t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
          anchorType = "purchase", maxOffset = 14)
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("offset"), col("active_users"))
        .orderBy("cohort", "offset")
    }),

    "q119_weekly_retention" -> ((s, dir) => {
      // the week-grain path of the same operator (offset = floor(days/7))
      // — view-anchored, 8 weekly offsets
      graft.operators.EventAnalytics.retentionCohorts(
          t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
          anchorType = "view", maxOffset = 8, grain = "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("offset"), col("active_users"))
        .orderBy("cohort", "offset")
    }),

    "q102_psi_drift" -> ((s, dir) => {
      // PSI drift between pre/post-1998 order values; decile edges are
      // reference-window order statistics (Drift scaladoc)
      val orders = t(s, dir, "orders")
      graft.quality.Drift.psiBins(
          orders.filter(col("o_orderdate") < "1998-01-01"),
          orders.filter(col("o_orderdate") >= "1998-01-01"),
          col("o_totalprice"))
        .select(col("bin"), round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("psi_term"), 6).as("psi_term"))
        .orderBy("bin")
    }),

    "q135_psi_windows" -> ((s, dir) => {
      // the drift MONITOR shape, oracle-gated end-to-end: reference
      // profile (order-stat decile edges + proportions) from the 'view'
      // events, then PSI per 1-day event-time window over ALL events —
      // the exact expression Streams.psiDriftStream runs on a stream
      // (StreamsSpec proves stream ≡ batch form; this query proves the
      // math against DuckDB). The per-window psi is an ORDERED bin fold
      // on both sides (left-to-right b=0..9) so the float sum associates
      // identically.
      val ev = t(s, dir, "events")
      val (edges, pRef) = graft.quality.Drift.referenceProfile(
        ev.filter(col("event_type") === "view"), col("value"), bins = 10)
      graft.streaming.Streams.psiDriftStream(ev, col("value"), edges, pRef,
          windowLength = "1 day")
        .select(col("window_start"), col("n"), round(col("psi"), 6).as("psi"))
        .orderBy("window_start")
    }),

    "q101_repetition" -> ((s, dir) => {
      // Gopher-style repetition filters: duplicate-word fraction +
      // top-bigram occurrence share (Corpus.repetitionSignals scaladoc)
      Corpus.repetitionSignals(t(s, dir, "documents"),
          col("doc_id"), col("text"), minWords = 5)
        .select(col("id").as("doc_id"), col("n_words"),
          round(col("dup_word_frac"), 6).as("dup_word_frac"),
          round(col("rep2_frac"), 6).as("rep2_frac"),
          (round(col("dup_word_frac"), 6) < 0.8 &&
            round(col("rep2_frac"), 6) < 0.1).as("keep"))
        .orderBy("doc_id")
    }),

    "q98_chunk_docs" -> ((s, dir) => {
      // 120-char context chunks with 20-char overlap; fingerprint per
      // chunk (scan-local row generation — Corpus.chunkChars scaladoc)
      Corpus.chunkChars(t(s, dir, "documents"), col("doc_id"), col("text"),
          size = 120, overlap = 20)
        .select(col("id").as("doc_id"), col("chunk_id"),
          length(col("chunk")).as("chunk_len"),
          md5(col("chunk").cast("binary")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    }),

    "q183_curriculum_phases" -> ((s, dir) => {
      // curriculum schedule (easy->hard training order): per SOURCE,
      // rank docs by quality score (q52's formula) and cut into 4
      // integer-exact phases ((rn-1)*4 div n — replayable, unlike
      // ntile's remainder spread); emit the per-(source, phase)
      // schedule card a training loader consumes. Windows key on
      // source — shuffle-parallel, never a global single-task sort
      // (the mixture is built per-source anyway, the q140 discipline).
      val w = org.apache.spark.sql.expressions.Window
      val base = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      base
        .withColumn("rn", row_number().over(
          w.partitionBy("source").orderBy(col("q").desc, col("doc_id").asc)))
        .withColumn("n", count(lit(1)).over(w.partitionBy("source")))
        .withColumn("phase",
          (expr("(CAST(rn AS BIGINT) - 1) * 4 div n") + 1).cast("int"))
        .groupBy("source", "phase")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          round(min("q"), 6).as("min_q"), round(max("q"), 6).as("max_q"))
        .orderBy("source", "phase")
    }),

    "q186_zipf_fit" -> ((s, dir) => {
      // Zipf's-law fit of the token frequency distribution — the
      // corpus-health diagnostic (a slope far from -1 on the log-log
      // rank/frequency line flags template-dominated or truncated
      // corpora before training does): OLS over the top-100 tokens,
      // ln terms quantized DECIMAL(38,18) before summing so the fit is
      // bit-stable under any partitioning (the q125/q169 discipline).
      // One corpus scan into a 100-row frame; everything after is
      // constant-size.
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token").asc)
      val cnts = t(s, dir, "documents")
        .select(explode(filter(split(lower(col("text")), "\\s+"),
          x => length(x) > 0)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val top = cnts.orderBy(col("cnt").desc, col("token").asc).limit(100)
        .withColumn("rnk", row_number().over(w))
      val xy = top.select(
        log(col("rnk").cast("double")).cast("decimal(38,18)").as("x"),
        log(col("cnt").cast("double")).cast("decimal(38,18)").as("y"),
        (log(col("rnk").cast("double")) * log(col("cnt").cast("double")))
          .cast("decimal(38,18)").as("xy"),
        (log(col("rnk").cast("double")) * log(col("rnk").cast("double")))
          .cast("decimal(38,18)").as("x2"))
      xy.agg(count(lit(1)).as("_nl"),
          sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
          sum("xy").cast("double").as("sxy"),
          sum("x2").cast("double").as("sx2"))
        .select(col("_nl").as("n_points"),
          round((col("_nl").cast("double") * col("sxy") - col("sx") * col("sy")) /
            (col("_nl").cast("double") * col("sx2") - col("sx") * col("sx")), 6)
            .as("slope"),
          round((col("sy") -
            (col("_nl").cast("double") * col("sxy") - col("sx") * col("sy")) /
            (col("_nl").cast("double") * col("sx2") - col("sx") * col("sx")) *
            col("sx")) / col("_nl").cast("double"), 6).as("intercept"))
    })
  )

  /** The q155 keep rule + rebuild as DuckDB SQL — ONE definition shared
    * by q155 (inline df windows) and q157 (stored-artifact anti join),
    * which must gate against identical semantics by construction. */
  private lazy val boilerplateSql: String =
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(string_split(text, ' ')) // 10 AS n_tiles
        |  FROM documents),
        |tiles AS (SELECT doc_id, s['idx'] AS idx, s['tile'] AS tile
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, n_tiles + 1),
        |      i -> {'idx': i - 1,
        |            'tile': array_to_string(w[(i-1)*10+1 : (i-1)*10+10], ' ')})) AS s
        |    FROM base WHERE n_tiles > 0)),
        |flagged AS (SELECT doc_id, idx, tile,
        |    count(DISTINCT doc_id) OVER (PARTITION BY md5(tile)) AS tdf
        |  FROM tiles),
        |kept AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tile, ' ' ORDER BY idx) AS body
        |  FROM flagged WHERE tdf < 3 GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n_tiles AS BIGINT) AS n_tiles,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(b.n_tiles - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dropped,
        |  md5(trim(COALESCE(k.body, '') || ' ' ||
        |    COALESCE(array_to_string(w[b.n_tiles*10+1 : b.n_words], ' '),
        |      ''))) AS rebuilt_md5
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q153_semantic_decontaminate" ->
      """WITH b AS (SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id % 10 <> 0),
        |cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |ba AS (SELECT bench_id, bv, cid,
        |    row_number() OVER (PARTITION BY bench_id
        |      ORDER BY list_cosine_similarity(bv, cv) DESC, cid ASC) AS rn
        |  FROM b, cents),
        |blists AS (SELECT bench_id, bv, cid FROM ba WHERE rn = 1),
        |cp AS (SELECT id, v, cid,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY list_cosine_similarity(v, cv) DESC, cid ASC) AS rn
        |  FROM c, cents),
        |probes AS (SELECT id, v, cid FROM cp WHERE rn <= 2)
        |SELECT p.id, l.bench_id,
        |  round(list_cosine_similarity(p.v, l.bv), 6) AS cosine
        |FROM probes p JOIN blists l ON p.cid = l.cid
        |WHERE list_cosine_similarity(p.v, l.bv) >= 0.40
        |ORDER BY id, bench_id""".stripMargin,

    "q131_span_dedup" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(string_split(text, ' ')) // 10 AS n_tiles
        |  FROM documents),
        |tiles AS (SELECT doc_id, s['idx'] AS idx, s['tile'] AS tile
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, n_tiles + 1),
        |      i -> {'idx': i - 1,
        |            'tile': array_to_string(w[(i-1)*10+1 : (i-1)*10+10], ' ')})) AS s
        |    FROM base WHERE n_tiles > 0)),
        |flagged AS (SELECT doc_id, idx, tile,
        |    row_number() OVER (PARTITION BY md5(tile)
        |      ORDER BY doc_id, idx) AS rn
        |  FROM tiles),
        |kept AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tile, ' ' ORDER BY idx) AS body
        |  FROM flagged WHERE rn = 1 GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n_tiles AS BIGINT) AS n_tiles,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(b.n_tiles - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dropped,
        |  md5(trim(COALESCE(k.body, '') || ' ' ||
        |    COALESCE(array_to_string(w[b.n_tiles*10+1 : b.n_words], ' '),
        |      ''))) AS rebuilt_md5
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "q172_corpus_datasheet" ->
      raw"""WITH d AS (SELECT text, lang, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS BIGINT) AS toks
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(toks) AS DOUBLE) AS n_tokens,
        |    CAST(count(DISTINCT text) AS DOUBLE) AS n_distinct,
        |    CAST(count(DISTINCT source) AS DOUBLE) AS n_sources
        |  FROM d),
        |rows_ AS (
        |  SELECT 'n_docs' AS metric, n_docs AS value FROM g
        |  UNION ALL SELECT 'n_tokens', n_tokens FROM g
        |  UNION ALL SELECT 'n_sources', n_sources FROM g
        |  UNION ALL SELECT 'exact_dup_frac', (n_docs - n_distinct) / n_docs FROM g
        |  UNION ALL SELECT 'mean_doc_tokens', n_tokens / n_docs FROM g
        |  UNION ALL SELECT 'lang_frac:' || lang,
        |    count(*) / (SELECT n_docs FROM g) FROM d GROUP BY lang)
        |SELECT metric, round(value, 6) AS value
        |FROM rows_ ORDER BY metric""".stripMargin,

    "q170_sliding_span_dedup" ->
      raw"""WITH toksl AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (SELECT doc_id, i, md5(array_to_string(w[i:i+3], ' ')) AS g
        |  FROM (SELECT doc_id, w,
        |      unnest(range(1, greatest(len(w) - 3, 0) + 1)) AS i
        |    FROM toksl)),
        |dup AS (SELECT doc_id, i FROM (
        |    SELECT doc_id, i, row_number() OVER (PARTITION BY g
        |      ORDER BY doc_id, i) AS rn FROM g) WHERE rn > 1),
        |cov AS (SELECT doc_id, list(DISTINCT p) AS ps FROM (
        |    SELECT doc_id, unnest(range(i, i + 4)) AS p FROM dup)
        |  GROUP BY 1),
        |fin AS (SELECT t.doc_id, len(t.w) AS n_tokens,
        |    CASE WHEN c.ps IS NULL THEN t.w
        |      ELSE list_transform(list_filter(range(1, len(t.w) + 1),
        |        p -> NOT list_contains(c.ps, p)), p -> t.w[p]) END AS kept
        |  FROM toksl t LEFT JOIN cov c USING (doc_id))
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  md5(coalesce(array_to_string(kept, ' '), '')) AS rebuilt_md5
        |FROM fin ORDER BY doc_id""".stripMargin,

    // q131's tiling + rebuild verbatim; only the keep rule changes —
    // a tile survives iff its distinct-doc frequency stays under 3
    "q155_boilerplate" -> boilerplateSql,

    // q157 runs the stored-artifact anti-join plan against the SAME SQL
    // value: same corpus, same spanWords/minDf, so the stored key set
    // reproduces the inline df-window keep rule row-for-row — one
    // definition, the two gates cannot drift
    "q157_boilerplate_artifact" -> boilerplateSql,

    // q133 runs the Bloom-prefiltered plan against the SAME exact SQL:
    // the sketch phase only prunes, the exact join restores equality
    "q133_decontaminate_bloom" ->
      """WITH toks AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |grams AS (SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(w)-4, 0)+1),
        |      i -> CAST(CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 8))
        |        AS UBIGINT) AS BIGINT))) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(g) AS h FROM grams WHERE source = 'src0'),
        |train AS (SELECT doc_id, len(g) AS n_grams, unnest(g) AS h
        |  FROM grams WHERE source <> 'src0')
        |SELECT t.doc_id, CAST(any_value(t.n_grams) AS INTEGER) AS n_grams,
        |  count(*) AS n_shared,
        |  round(CAST(count(*) AS DOUBLE) / any_value(t.n_grams), 6) AS contamination
        |FROM train t JOIN bench b ON t.h = b.h
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q93_decontaminate" ->
      """WITH toks AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |grams AS (SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(w)-4, 0)+1),
        |      i -> CAST(CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 8))
        |        AS UBIGINT) AS BIGINT))) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(g) AS h FROM grams WHERE source = 'src0'),
        |train AS (SELECT doc_id, len(g) AS n_grams, unnest(g) AS h
        |  FROM grams WHERE source <> 'src0')
        |SELECT t.doc_id, CAST(any_value(t.n_grams) AS INTEGER) AS n_grams,
        |  count(*) AS n_shared,
        |  round(CAST(count(*) AS DOUBLE) / any_value(t.n_grams), 6) AS contamination
        |FROM train t JOIN bench b ON t.h = b.h
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q179_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, x -> x = 'spark'))  AS tf0,
        |    len(list_filter(w, x -> x = 'vector')) AS tf1,
        |    len(list_filter(w, x -> x = 'stream')) AS tf2
        |  FROM toks),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |  FROM tf),
        |s AS (SELECT doc_id,
        |    ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0)
        |      * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0)
        |      * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0)
        |      * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
        |  FROM tf, g),
        |lex AS (SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM s QUALIFY rank <= 50),
        |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |dsc AS (SELECT vec_id AS id,
        |    list_cosine_similarity(embedding::DOUBLE[], qe) AS cosine
        |  FROM embeddings, qv),
        |dn AS (SELECT id,
        |    row_number() OVER (ORDER BY cosine DESC, id) AS rank
        |  FROM dsc QUALIFY rank <= 50),
        |u AS (SELECT id, rank FROM lex UNION ALL SELECT id, rank FROM dn),
        |f AS (SELECT id, sum(1.0 / (rank + 60)) AS rrf FROM u GROUP BY 1)
        |SELECT id AS doc_id, round(rrf, 6) AS rrf,
        |  CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INTEGER) AS rank
        |FROM f QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    "q94_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, x -> x = 'spark'))  AS tf0,
        |    len(list_filter(w, x -> x = 'vector')) AS tf1,
        |    len(list_filter(w, x -> x = 'stream')) AS tf2
        |  FROM toks),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |  FROM tf),
        |s AS (SELECT doc_id,
        |    ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0)
        |      * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0)
        |      * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0)
        |      * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
        |  FROM tf, g)
        |SELECT doc_id, round(score, 6) AS bm25,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        |FROM s QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    "q191_ql_retrieval" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, x -> x = 'spark'))  AS tf0,
        |    len(list_filter(w, x -> x = 'vector')) AS tf1,
        |    len(list_filter(w, x -> x = 'stream')) AS tf2
        |  FROM toks),
        |g AS (SELECT CAST(sum(dl) AS DOUBLE) AS ctot,
        |    CAST(sum(tf0) AS DOUBLE) AS ctf0,
        |    CAST(sum(tf1) AS DOUBLE) AS ctf1,
        |    CAST(sum(tf2) AS DOUBLE) AS ctf2
        |  FROM tf),
        |s AS (SELECT doc_id,
        |    ln((tf0 + 300.0 * ctf0 / ctot) / (dl + 300.0))
        |  + ln((tf1 + 300.0 * ctf1 / ctot) / (dl + 300.0))
        |  + ln((tf2 + 300.0 * ctf2 / ctot) / (dl + 300.0)) AS score
        |  FROM tf, g)
        |SELECT doc_id, round(score, 6) AS ql,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        |FROM s QUALIFY rank <= 15 ORDER BY rank""".stripMargin,

    "q125_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents),
        |ctf AS (SELECT term, count(*) AS ctf FROM toks GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM toks),
        |lp AS (SELECT t.doc_id,
        |    CAST(ln(ctf.ctf / n.n_tok) AS DECIMAL(28,18)) AS lp
        |  FROM toks t JOIN ctf USING (term), n)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q95_gap_fill" ->
      """WITH o AS (SELECT * FROM orders WHERE o_custkey < 50),
        |daily AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM o GROUP BY 1, 2),
        |span AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS d0,
        |    max(CAST(o_orderdate AS DATE)) AS d1 FROM o GROUP BY 1),
        |cal AS (SELECT o_custkey,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span)
        |SELECT c.o_custkey AS custkey, strftime(c.day, '%Y-%m-%d') AS day,
        |  round(coalesce(d.total, 0.0), 2) AS day_total,
        |  round(last_value(d.total IGNORE NULLS) OVER (PARTITION BY c.o_custkey
        |    ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled
        |FROM cal c LEFT JOIN daily d ON d.o_custkey = c.o_custkey AND d.day = c.day
        |ORDER BY custkey, day""".stripMargin,

    "q96_pack_sequences" ->
      """WITH toks AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |cum AS (SELECT doc_id, source, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM toks WHERE n_tok > 0)
        |SELECT doc_id, source, n_tok,
        |  CAST(prior // 256 AS BIGINT) AS pack_first,
        |  CAST((prior + n_tok - 1) // 256 AS BIGINT) AS pack_last,
        |  CAST(prior % 256 AS BIGINT) AS pack_offset
        |FROM cum ORDER BY source, doc_id""".stripMargin,

    "q97_eval_holdout" ->
      """WITH r AS (SELECT doc_id, lang,
        |    md5('evalk:' || CAST(doc_id AS VARCHAR)) AS rk FROM documents)
        |SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY rk, doc_id) AS INTEGER) AS rn
        |FROM r QUALIFY rn <= 5 ORDER BY lang, rn""".stripMargin,

    "q99_winsorize" ->
      """WITH r AS (SELECT o_orderpriority AS grp, o_totalprice AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |th AS (SELECT grp,
        |    min(CASE WHEN rn = greatest(CAST(ceil(0.05 * n) AS BIGINT), 1) THEN v END) AS p_lo,
        |    min(CASE WHEN rn = greatest(CAST(ceil(0.95 * n) AS BIGINT), 1) THEN v END) AS p_hi
        |  FROM r GROUP BY grp)
        |SELECT r.grp, count(*) AS n,
        |  round(min(th.p_lo), 2) AS p05, round(min(th.p_hi), 2) AS p95,
        |  CAST(sum(CAST(least(greatest(r.v, th.p_lo), th.p_hi)
        |    AS DECIMAL(18,2))) AS DOUBLE) AS sum_clipped,
        |  CAST(sum(CASE WHEN r.v < th.p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN r.v > th.p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM r JOIN th ON r.grp = th.grp
        |GROUP BY r.grp ORDER BY r.grp""".stripMargin,

    "q123_mad_anomalies" ->
      """WITH base AS (SELECT event_type AS grp, value AS v, event_id AS tb
        |  FROM events WHERE value IS NOT NULL),
        |ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY grp ORDER BY v, tb) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS n FROM base),
        |med AS (SELECT grp,
        |    min(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
        |  FROM ranked GROUP BY 1),
        |dev AS (SELECT r.grp, r.n, abs(r.v - m.med) AS d, m.med
        |  FROM ranked r JOIN med m USING (grp)),
        |rankedd AS (SELECT *,
        |    row_number() OVER (PARTITION BY grp ORDER BY d) AS rnd FROM dev),
        |mad AS (SELECT grp,
        |    min(CASE WHEN rnd = (n + 1) // 2 THEN d END) AS mad
        |  FROM rankedd GROUP BY 1)
        |SELECT d.grp AS event_type, count(*) AS n,
        |  round(min(d.med), 6) AS median, round(min(ma.mad), 6) AS mad,
        |  CAST(sum(CASE WHEN d.d > 3 * ma.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies
        |FROM dev d JOIN mad ma USING (grp)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q100_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |    md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents),
        |s AS (SELECT doc_id, hx,
        |    CAST(CAST(('0x' || substring(hx, 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS INTEGER) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    "q110_basket_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sz AS (SELECT ok, count(*) AS n FROM b GROUP BY 1),
        |bb AS (SELECT b.ok, b.pk FROM b JOIN sz ON b.ok = sz.ok WHERE sz.n <= 20),
        |pairs AS (SELECT x.pk AS a_part, y.pk AS b_part FROM bb x JOIN bb y
        |  ON x.ok = y.ok AND x.pk < y.pk)
        |SELECT a_part, b_part, count(*) AS n_orders,
        |  CAST(row_number() OVER (ORDER BY count(*) DESC, a_part, b_part)
        |    AS INTEGER) AS rank
        |FROM pairs GROUP BY 1, 2
        |QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    "q109_rfm" -> {
      val edge = (sel: String) =>
        s"""SELECT list(v ORDER BY v) AS e FROM (
           |    SELECT v, row_number() OVER (ORDER BY v) AS rn,
           |      count(*) OVER () AS n FROM (SELECT $sel AS v FROM rfm))
           |  WHERE rn IN (SELECT CAST(ceil(n * x / 5.0) AS BIGINT)
           |    FROM (SELECT DISTINCT count(*) AS n FROM rfm), range(1, 5) t(x))""".stripMargin
      s"""WITH rfm AS (SELECT o_custkey AS custkey,
        |    datediff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS recency,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |e AS (SELECT
        |    (${edge("CAST(recency AS DOUBLE)")}) AS re,
        |    (${edge("CAST(frequency AS DOUBLE)")}) AS fe,
        |    (${edge("monetary")}) AS me)
        |SELECT custkey,
        |  CAST(6 - (1 + len(list_filter(re, x -> x < CAST(recency AS DOUBLE))))
        |    AS INTEGER) AS r_score,
        |  CAST(1 + len(list_filter(fe, x -> x < CAST(frequency AS DOUBLE)))
        |    AS INTEGER) AS f_score,
        |  CAST(1 + len(list_filter(me, x -> x < monetary)) AS INTEGER) AS m_score
        |FROM rfm, e ORDER BY custkey""".stripMargin
    },

    "q108_dau_wau" ->
      """WITH ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ad GROUP BY 1),
        |contrib AS (SELECT user_id, unnest(generate_series(day,
        |    day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS wday FROM ad),
        |wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau FROM contrib
        |  GROUP BY 1),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ad)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.day, span
        |WHERE d.day BETWEEN d0 AND d1
        |ORDER BY day""".stripMargin,

    "q106_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS total, sum(pow(n, 0.5)) AS zsum FROM n),
        |rates AS (SELECT lang,
        |    least(1.0, (total * 0.5) * (pow(n, 0.5) / zsum) / n) AS r
        |  FROM n, tot)
        |SELECT d.doc_id, d.lang, round(r.r, 6) AS rate
        |FROM documents d JOIN rates r ON d.lang IS NOT DISTINCT FROM r.lang
        |WHERE CAST(('0x' || substring(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        |    AS UBIGINT) % 1000000 / 1000000.0 < r.r
        |ORDER BY d.doc_id""".stripMargin,

    // q53's token expression + the q100 md5-order window, quota'd by a
    // per-source CASE budget
    "q140_token_budget_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))
        |      AS n_tokens,
        |    md5('tbf:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(row_number() OVER w AS INTEGER) AS pos,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hx, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM d
        |  WINDOW w AS (PARTITION BY source ORDER BY hx, doc_id))
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  pos, cum_tokens
        |FROM c
        |WHERE cum_tokens <= (CASE WHEN source = 'src0' THEN 0 ELSE 800 END)
        |ORDER BY doc_id""".stripMargin,

    // q72's assignment CTE feeding q106's temperature-rate CTEs — the
    // semantic-stratum variant of the language mixture
    "q138_cluster_balanced_sample" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 100 = 0),
        |assigned AS (SELECT e.vec_id AS doc_id, c.cid FROM e, c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid ASC) = 1),
        |n AS (SELECT cid, count(*) AS n FROM assigned GROUP BY 1),
        |tot AS (SELECT sum(n) AS total, sum(pow(n, 0.5)) AS zsum FROM n),
        |rates AS (SELECT cid,
        |    least(1.0, (total * 0.5) * (pow(n, 0.5) / zsum) / n) AS r
        |  FROM n, tot)
        |SELECT a.doc_id, d.lang, a.cid, round(r.r, 6) AS rate
        |FROM assigned a
        |JOIN documents d ON d.doc_id = a.doc_id
        |JOIN rates r ON a.cid = r.cid
        |WHERE CAST(('0x' || substring(md5('cbal:' || CAST(a.doc_id AS VARCHAR)), 1, 8))
        |    AS UBIGINT) % 1000000 / 1000000.0 < r.r
        |ORDER BY a.doc_id""".stripMargin,

    "q105_attribution" ->
      """WITH c0 AS (SELECT user_id, ts,
        |    -- ((k % 5) + 5) % 5 = Spark's pmod: DuckDB's % is
        |    -- sign-preserving, so a negative k would diverge otherwise
        |    'ch' || CAST(((CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      % 5) + 5) % 5 AS VARCHAR) AS channel,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, channel FROM c0 WHERE rn = 1),
        |p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |att AS (SELECT p.value,
        |    CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 86400 SECOND
        |      THEN c.channel ELSE 'direct' END AS channel
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT channel, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM att GROUP BY 1 ORDER BY 1""".stripMargin,

    "q103_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t0
        |    AND e.ts <= v.t0 + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t1
        |    AND e.ts <= c.t1 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT 'stage1_view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT 'stage2_click', count(*) FROM c
        |UNION ALL SELECT 'stage3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,

    "q104_retention" ->
      """WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |first AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM a GROUP BY 1),
        |act AS (SELECT DISTINCT a.user_id, f.cohort,
        |    CAST(datediff('day', f.cohort, CAST(a.ts AS DATE)) AS INTEGER) AS "offset"
        |  FROM a JOIN first f ON a.user_id = f.user_id
        |  WHERE datediff('day', f.cohort, CAST(a.ts AS DATE)) <= 14)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, "offset",
        |  count(*) AS active_users
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q119_weekly_retention" ->
      """WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |first AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM a GROUP BY 1),
        |act AS (SELECT DISTINCT a.user_id, f.cohort,
        |    CAST(datediff('day', f.cohort, CAST(a.ts AS DATE)) // 7 AS INTEGER)
        |      AS "offset"
        |  FROM a JOIN first f ON a.user_id = f.user_id
        |  WHERE datediff('day', f.cohort, CAST(a.ts AS DATE)) // 7 <= 8)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, "offset",
        |  count(*) AS active_users
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q102_psi_drift" ->
      """WITH ref AS (SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |cur AS (SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |    count(*) OVER () AS n FROM ref),
        |edges AS (SELECT list(v ORDER BY v) AS e FROM r WHERE rn IN (
        |  SELECT CAST(ceil(n * x / 10.0) AS BIGINT)
        |  FROM (SELECT DISTINCT n FROM r), range(1, 10) t(x))),
        |rb AS (SELECT CAST(len(list_filter(e, x -> x < v)) AS INTEGER) AS bin,
        |    count(*) AS c FROM ref, edges GROUP BY 1),
        |cb AS (SELECT CAST(len(list_filter(e, x -> x < v)) AS INTEGER) AS bin,
        |    count(*) AS c FROM cur, edges GROUP BY 1),
        |tot AS (SELECT (SELECT sum(c) FROM rb) AS rn, (SELECT sum(c) FROM cb) AS cn),
        |bins AS (SELECT b.bin,
        |    CAST(coalesce(rb.c, 0) AS DOUBLE) / rn AS p,
        |    CAST(coalesce(cb.c, 0) AS DOUBLE) / cn AS q
        |  FROM (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS bin) b
        |  LEFT JOIN rb ON rb.bin = b.bin LEFT JOIN cb ON cb.bin = b.bin, tot)
        |SELECT bin, round(p, 6) AS p_ref, round(q, 6) AS p_cur,
        |  round((greatest(q, 1e-6) - greatest(p, 1e-6))
        |    * ln(greatest(q, 1e-6) / greatest(p, 1e-6)), 6) AS psi_term
        |FROM bins ORDER BY bin""".stripMargin,

    "q135_psi_windows" ->
      """WITH ref AS (SELECT value AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |    count(*) OVER () AS n FROM ref),
        |edges AS (SELECT list(v ORDER BY v) AS e FROM r WHERE rn IN (
        |  SELECT CAST(ceil(n * x / 10.0) AS BIGINT)
        |  FROM (SELECT DISTINCT n FROM r), range(1, 10) t(x))),
        |pr AS (SELECT CAST(len(list_filter(e, x -> x < v)) AS INTEGER) AS bin,
        |    count(*) AS c FROM ref, edges GROUP BY 1),
        |prn AS (SELECT sum(c) AS n FROM pr),
        |cur AS (SELECT date_trunc('day', ts) AS w, value AS v FROM events
        |  WHERE value IS NOT NULL),
        |cb AS (SELECT w, CAST(len(list_filter(e, x -> x < v)) AS INTEGER) AS bin,
        |    count(*) AS c FROM cur, edges GROUP BY 1, 2),
        |wn AS (SELECT w, sum(c) AS n FROM cb GROUP BY 1),
        |terms AS (SELECT wn.w, wn.n, b.bin,
        |    greatest(CAST(coalesce(cb.c, 0) AS DOUBLE) / wn.n, 1e-6) AS q,
        |    greatest(CAST(coalesce(pr.c, 0) AS DOUBLE)
        |      / (SELECT n FROM prn), 1e-6) AS p
        |  FROM wn CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS bin) b
        |  LEFT JOIN cb ON cb.w = wn.w AND cb.bin = b.bin
        |  LEFT JOIN pr ON pr.bin = b.bin)
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(any_value(n) AS BIGINT) AS n,
        |  round(list_sum(list((q - p) * ln(q / p) ORDER BY bin)), 6) AS psi
        |FROM terms GROUP BY w ORDER BY window_start""".stripMargin,

    "q101_repetition" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_words,
        |    round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
        |      AS dup_word_frac
        |  FROM w WHERE len(toks) >= 5),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks)-1, 0)+1),
        |    i -> CAST(CAST(('0x' || substring(md5(array_to_string(toks[i:i+1], ' ')), 1, 8))
        |      AS UBIGINT) AS BIGINT))) AS h
        |  FROM w WHERE len(toks) >= 5),
        |bc AS (SELECT doc_id, h, count(*) AS c FROM bi GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |    round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS rep2_frac FROM bc GROUP BY 1)
        |SELECT b.doc_id, b.n_words, b.dup_word_frac, r.rep2_frac,
        |  (b.dup_word_frac < 0.8 AND r.rep2_frac < 0.1) AS keep
        |FROM base b JOIN rep r ON b.doc_id = r.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q98_chunk_docs" ->
      """WITH c AS (SELECT doc_id, text,
        |    unnest(range(0, CAST(greatest(ceil((len(text) - 20) / 100.0), 1) AS BIGINT)))
        |      AS chunk_id
        |  FROM documents WHERE len(text) > 0)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |  CAST(len(substr(text, CAST(chunk_id*100 + 1 AS BIGINT), 120)) AS INTEGER)
        |    AS chunk_len,
        |  md5(substr(text, CAST(chunk_id*100 + 1 AS BIGINT), 120)) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q183_curriculum_phases" ->
      """WITH d AS (SELECT doc_id, source, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, source,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))
        |    AS BIGINT) AS nt,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS letters,
        |  CAST(len(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE) AS punct,
        |  CASE WHEN len(toks)=0 THEN 0.0
        |    ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)/len(toks) END AS meanlen,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['the','and','of','to','a','in','is','that','for','it'], t))) AS DOUBLE)/len(toks) END AS stopr
        |  FROM d),
        |sc AS (SELECT doc_id, source, nt,
        |  least(chars/500.0, 1.0)*0.25 +
        |  (CASE WHEN chars=0 THEN 0.0 ELSE letters/chars END)*0.25 +
        |  (1.0 - CASE WHEN chars=0 THEN 1.0 ELSE punct/chars END)*0.20 +
        |  (CASE WHEN meanlen >= 3.0 AND meanlen <= 10.0 THEN 1.0 ELSE 0.0 END)*0.15 +
        |  least(stopr/0.3, 1.0)*0.15 AS q
        |  FROM m),
        |ranked AS (SELECT source, q, nt,
        |    row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM sc)
        |SELECT source, CAST((rn - 1) * 4 // n + 1 AS INTEGER) AS phase,
        |  count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  round(min(q), 6) AS min_q, round(max(q), 6) AS max_q
        |FROM ranked GROUP BY 1, 2 ORDER BY source, phase""".stripMargin,

    "q186_zipf_fit" ->
      """WITH tok AS (SELECT
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS token
        |  FROM documents),
        |cnts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |top AS (SELECT token, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, token ASC) AS rnk
        |  FROM cnts ORDER BY cnt DESC, token ASC LIMIT 100),
        |xy AS (SELECT
        |    CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(38,18)) AS x,
        |    CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(38,18)) AS y,
        |    CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
        |      AS DECIMAL(38,18)) AS xy,
        |    CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))
        |      AS DECIMAL(38,18)) AS x2
        |  FROM top),
        |ag AS (SELECT count(*) AS nl, CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(xy) AS DOUBLE) AS sxy,
        |    CAST(sum(x2) AS DOUBLE) AS sx2
        |  FROM xy)
        |SELECT CAST(nl AS BIGINT) AS n_points,
        |  round((CAST(nl AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(nl AS DOUBLE) * sx2 - sx * sx), 6) AS slope,
        |  round((sy - (CAST(nl AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(nl AS DOUBLE) * sx2 - sx * sx) * sx) /
        |    CAST(nl AS DOUBLE), 6) AS intercept
        |FROM ag""".stripMargin
  )
}
