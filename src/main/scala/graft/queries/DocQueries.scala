package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextFunctions, VectorFunctions}
import graft.operators.{Dedup, GraphRank, SimilaritySearch, TopK}
import graft.sources.Tables

/**
 * LLM-data-pipeline operator queries (SURVEY §7.5 north star): dedup
 * (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
 * similarity search (brute-force + LSH-bucketed), and text analysis
 * (language-ID / quality / token counts / fingerprint) over the
 * `documents` and `embeddings` tables.
 *
 * Every hash in these operators is md5-over-strings with lexicographic
 * minima precisely so the DuckDB oracles can replicate signatures
 * bit-for-bit — the LSH band keys, simhash bit sums, and hyperplane signs
 * below are the same numbers in both engines.
 */
object DocQueries {

  // loadSpread: single-row-group testdata parquet is unsplittable — without
  // the spread every md5/regex-heavy doc pipeline here runs its scan stage
  // on ONE core (Tables.loadSpread scaladoc)
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  // ---- shared SQL fragments (DuckDB) ----

  /** words(text): lowercased whitespace tokens, empties dropped. */
  private val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** q181/q190 shared taxonomy — ONE source of truth for both query
    * paths and both oracle VALUES clauses (the kernel gate must test
    * the same semantics as the join gate by construction). */
  private val keywordDict: Seq[(String, String)] = Seq(
    ("hash join", "joins"), ("merge join", "joins"),
    ("sort merge", "joins"),
    ("table scan", "scans"), ("full scan", "scans"),
    ("index scan", "scans"),
    ("slow query", "perf"), ("slow", "perf"), ("fast", "perf"))

  private def keywordValuesSql: String = keywordDict
    .map { case (p, c) => s"('$p','$c')" }.mkString(", ")

  /** The single oracle gating BOTH tagging paths (q181 join form, q190
    * PhraseHits kernel form) — dict VALUES interpolated from
    * [[keywordDict]], so query and oracle cannot drift apart. */
  private lazy val keywordTagsOracle: String =
    s"""WITH d AS (SELECT doc_id, ${toksSql} AS w FROM documents),
      |g AS (SELECT doc_id, gram FROM (
      |    SELECT doc_id, unnest(list_distinct(w)) AS gram FROM d
      |    UNION ALL
      |    SELECT doc_id, unnest(list_distinct(list_transform(
      |      range(1, greatest(len(w)-1, 0)+1),
      |      i -> array_to_string(w[i:i+1], ' ')))) AS gram FROM d)),
      |dict(phrase, category) AS (VALUES $keywordValuesSql),
      |hits AS (SELECT g.doc_id, dict.category, count(*) AS c
      |  FROM g JOIN dict ON g.gram = dict.phrase GROUP BY 1, 2),
      |per AS (SELECT doc_id, sum(c) AS n_hits,
      |    array_to_string(list_sort(list(DISTINCT category)), ',')
      |      AS categories
      |  FROM hits GROUP BY 1)
      |SELECT d2.doc_id, CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
      |  coalesce(p.categories, '') AS categories
      |FROM documents d2 LEFT JOIN per p USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** distinct char-5 shingles of lower(text). */
  private val shinglesSql =
    """list_distinct(list_transform(range(1, greatest(len(lower(text))-4, 1)+1),
      | i -> substr(lower(text), i, 5)))""".stripMargin

  /** 16-bit simhash over `toks` (expects CTE alias exposing `toks`). */
  private def simhash16Sql: String = {
    val bitTerms = (0 until 16).map { j =>
      val d = j / 4 + 1
      val p = 1 << (j % 4)
      s"""(CASE WHEN coalesce(list_sum(list_transform(toks,
         | t -> CASE WHEN ((strpos('0123456789abcdef', substr(md5(t), $d, 1))-1) // $p) % 2 = 1
         |   THEN 1 ELSE -1 END)), 0) > 0 THEN ${1 << j} ELSE 0 END)""".stripMargin
    }
    bitTerms.mkString("(", " + ", ")")
  }

  /** LSH bucket id from hyperplane signs, weights baked as literals —
    * identical numbers to SimilaritySearch.lshBucket(planes=4, dims=64). */
  private def lshBucketSql(planes: Int, dims: Int): String = {
    val planeTerms = (0 until planes).map { p =>
      val dot = (0 until dims).map { d =>
        val w = lshPlaneWeight(p, d)
        s"CAST(embedding[${d + 1}] AS DOUBLE)*($w)"
      }.mkString(" + ")
      s"(CASE WHEN ($dot) > 0 THEN ${1 << p} ELSE 0 END)"
    }
    planeTerms.mkString("(", " + ", ")")
  }

  /** Mirror of SimilaritySearch.planeWeight (md5 first-nibble parity). */
  private def lshPlaneWeight(p: Int, d: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) % 2 == 0) 1 else -1
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup ----
    "q40_dedup_first_order" -> ((s, dir) => {
      // exact dedup by key keeping deterministic min tiebreak (CDC-style)
      Dedup.exactDedup(t(s, dir, "orders"), col("o_custkey"),
          struct(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_order"))
        .orderBy("o_custkey")
    }),

    "q41_dup_groups" -> ((s, dir) => {
      // exact duplicate groups by value (hash-groupBy dedup census)
      Dedup.exactDupGroups(t(s, dir, "part"), col("p_name"))
        .orderBy("dup_key")
    }),

    // ---- MinHash + LSH ----
    "q42_minhash_sig" -> ((s, dir) => {
      // engine-portable MinHash signatures: md5-base-hash each shingle
      // once, affine-permute mod p (Dedup.minhashSignatures scaladoc)
      Dedup.minhashSignatures(t(s, dir, "documents"),
          col("doc_id"), col("text"), shingleSize = 5, numHashes = 8)
        .select(col("id").as("doc_id"),
          array_join(transform(col("sig"), x => x.cast("string")), ",").as("sig"))
        .orderBy("doc_id")
    }),

    "q43_minhash_neardups" -> ((s, dir) => {
      // banded LSH candidate pairs + exact-Jaccard verify
      Dedup.minhashNearDups(t(s, dir, "documents"), col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    "q75_dup_clusters" -> ((s, dir) => {
      // end-to-end near-dup clustering: LSH candidate pairs (q43's exact
      // pipeline) → connected components (iterative min-label, converges
      // in O(cluster diameter) rounds — near-cliques: 2-3) → cluster-size
      // census. Oracle unrolls the same min-label propagation as six
      // MATERIALIZED recursive steps.
      val edges = Dedup.minhashNearDups(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      Dedup.connectedComponents(edges, maxIter = 20)
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .orderBy("component")
    }),

    "q156_dup_pagerank" -> ((s, dir) => {
      // graph centrality over the near-dup candidate graph: 3 damped
      // power-iteration rounds rank TEMPLATE HUBS — a doc wired to many
      // near-copies or bridging copy-clusters scores far above a
      // single-pair leaf (GraphRank.pageRank scaladoc). The curation
      // triage signal per-pair Jaccard can't see. Edges = q43's LSH
      // pipeline; the oracle replays the same three rounds over the
      // shared sym CTE, contributions summed as DECIMAL(38,18) so the
      // neighbor-sum is partition-order-invariant in both engines.
      val edges = Dedup.minhashNearDups(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      GraphRank.pageRank(edges, iterations = 3, damping = 0.85)
        .select(col("id").as("doc_id"), col("deg"),
          round(col("pagerank"), 6).as("pagerank"))
        .orderBy("doc_id")
    }),

    "q127_deduped_corpus" -> ((s, dir) => {
      // the MATERIALIZATION q107 stops short of: the deduplicated corpus
      // itself — every unclustered doc ('singleton', left-anti against
      // the CC labels) plus the canonical per near-dup cluster
      // ('canonical', q107's longest-text pick). This is the frame a
      // training run actually reads after dedup; count = |corpus| −
      // (clustered − clusters).
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      val labels = Dedup.connectedComponents(edges, maxIter = 20)
      val canon = TopK.topKPerGroup(
          labels.join(docs.select(col("doc_id").as("id"), col("n_chars")),
            "id"),
          Seq(col("component")),
          Seq(col("n_chars").desc, col("id").asc), 1)
        .select(col("id").as("doc_id"), lit("canonical").as("kept_reason"))
      docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id").select("doc_id"),
          Seq("doc_id"), "left_anti")
        .withColumn("kept_reason", lit("singleton"))
        .unionByName(canon)
        .orderBy("doc_id")
    }),

    "q130_artifact_corpus" -> ((s, dir) => {
      // the materialize-once production shape (Dedup.nearDupArtifacts
      // scaladoc): ONE LSH+CC pass yields signatures/edges/labels, all
      // three written to parquet; the deduped corpus is then built from
      // the STORED labels table read back from disk — same rows as q127,
      // which derives them inline. A real pipeline runs the artifact
      // build once per corpus version and every consumer (this corpus
      // materialization, the census, the leakage-safe split, nightly
      // incremental ingests) reads the stored frames.
      val docs = t(s, dir, "documents")
      val arts = Dedup.nearDupArtifacts(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25,
        maxBucketSize = 100, maxIter = 20)
      val out = "/tmp/graft_artifacts_q130"
      arts.signatures.write.mode("overwrite").parquet(s"$out/signatures")
      arts.edges.write.mode("overwrite").parquet(s"$out/edges")
      arts.labels.write.mode("overwrite").parquet(s"$out/labels")
      val labels = s.read.parquet(s"$out/labels")
      val canon = TopK.topKPerGroup(
          labels.join(docs.select(col("doc_id").as("id"), col("n_chars")),
            "id"),
          Seq(col("component")),
          Seq(col("n_chars").desc, col("id").asc), 1)
        .select(col("id").as("doc_id"), lit("canonical").as("kept_reason"))
      docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id").select("doc_id"),
          Seq("doc_id"), "left_anti")
        .withColumn("kept_reason", lit("singleton"))
        .unionByName(canon)
        .orderBy("doc_id")
    }),

    "q124_leakage_safe_split" -> ((s, dir) => {
      // near-dup-cluster-aware train/eval split: the component id (not
      // the doc id) is hashed, so a doc and its near-twin always share a
      // split — the eval-contamination guard per-doc hashing lacks
      // (Sampling.leakageSafeSplit scaladoc). Edges = q43's LSH pipeline;
      // oracle reuses q75's materialized CC CTE + the md5-uniform split.
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      graft.operators.Sampling.leakageSafeSplit(docs, col("doc_id"), edges,
          evalFraction = 0.1, salt = "split42")
        .select(col("id").as("doc_id"), col("component"), col("split"))
        .orderBy("doc_id")
    }),

    "q107_canonical_docs" -> ((s, dir) => {
      // dedup MATERIALIZATION: per near-dup cluster keep the canonical
      // doc (longest text, doc_id tiebreak) — the step that turns q75's
      // census into the deduplicated corpus. Labels frame is (id,
      // component) pairs; the canonical pick is one top-1-per-group
      // window over the cluster partitioning.
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      val labels = Dedup.connectedComponents(edges, maxIter = 20)
      val labeled = labels.join(
        docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      val sized = labeled.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
      TopK.topKPerGroup(sized, Seq(col("component")),
          Seq(col("n_chars").desc, col("id").asc), 1)
        .select(col("component"), col("id").as("canonical_id"),
          col("cluster_size"))
        .orderBy("component")
    }),

    // ---- SimHash ----
    "q44_simhash_fp" -> ((s, dir) => {
      // explode+agg form: md5 once per token inside codegen, partial-agg
      // bit sums (Dedup.simhashByDoc scaladoc) — same fp values as the
      // expression form, ~bits× less hashing
      Dedup.simhashByDoc(t(s, dir, "documents"), col("doc_id"),
          TextAnalysis.words(col("text")), 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "q45_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashNearDups(t(s, dir, "documents"), col("doc_id"),
          TextAnalysis.words(col("text")),
          struct(col("lang"), col("source")), bits = 16, maxDist = 6)
        .orderBy("a_id", "b_id")
    }),

    // ---- n-gram Jaccard ----
    "q46_ngram_jaccard" -> ((s, dir) => {
      // maxDf=100: a stop-phrase gram with df=d contributes d²/2 pairs to
      // the postings self-join, so the cap bounds the quadratic hot-gram
      // blowup at corpus scale. It is 20x the largest per-block df observed
      // in the testdata (5 at sf0.1), so the result — and the exact DuckDB
      // oracle — are unchanged here; DedupSpec proves the binding-cap
      // semantics on a constructed hot gram.
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"),
          col("text"), struct(col("lang"), col("source")), n = 3,
          threshold = 0.05, maxDf = Some(100))
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    "q115_incremental_dedup" -> ((s, dir) => {
      // delta dedup: the odd-id half is "tonight's batch", the even-id
      // half the standing (already-deduped) corpus — batch docs match
      // against corpus + earlier batch, corpus-vs-corpus pairs are never
      // generated (Dedup.incrementalNearDups scaladoc: bucket work scales
      // with the delta, not the corpus)
      val docs = t(s, dir, "documents")
      Dedup.incrementalNearDups(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select(col("a_id"), col("a_side"), col("b_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // ---- embedding cosine ----
    "q47_cosine_neardups" -> ((s, dir) => {
      Dedup.cosineNearDups(t(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), col("label"), threshold = 0.30)
        .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("a_id", "b_id")
    }),

    "q122_semantic_dedup" -> ((s, dir) => {
      // label-free semantic dedup: IVF-blocked cosine pairs — q47's
      // shape without its blocking column. Assignment replayed by the
      // oracle exactly as q72 (argmax cosine, lowest-cid tiebreak); the
      // maxListSize cap is non-binding at every test SF (lists ≈ 100)
      // so the capped result equals the oracle's uncapped SQL.
      // Float stability: both gate decisions (centroid argmax, 0.30
      // threshold) compare UNROUNDED double cosines computed by
      // different arithmetic per engine — safe because the testdata
      // keeps a wide margin from every knife edge (ProbeQ122, measured
      // this round: min top-2 argmax gap 6.3e-6 / min |cos-0.30|
      // 7.4e-6 across sf0.001/0.01/0.1, vs ~1e-12 worst-case engine
      // divergence for a 64-dim double dot). Rounding before the
      // compare would only MOVE the knife edge (the rounding boundary
      // becomes the new tie point), so the margin measurement is the
      // sound guard; re-run the probe if the embeddings tables change.
      Dedup.ivfCosineNearDups(t(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), modulus = 100, threshold = 0.30)
        .select(col("a_id"), col("b_id"), col("cid"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("a_id", "b_id")
    }),

    "q48_cosine_topk" -> ((s, dir) => {
      // brute-force ANN baseline: top-20 by cosine against vec_id=0
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble)
      SimilaritySearch.bruteForceTopK(e, col("vec_id"), col("embedding"), q, 20)
        .select(col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("rank")
    }),

    "q49_knn_block" -> ((s, dir) => {
      // each vector's top-3 neighbors within its label block
      SimilaritySearch.knnWithinBlock(t(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), col("label"), 3)
        .select(col("id"), col("neighbor"),
          round(col("cosine"), 6).as("cosine"), col("nn_rank"))
        .orderBy("id", "nn_rank")
    }),

    "q174_hard_negatives" -> ((s, dir) => {
      // DPR-style hard-negative mining: for each of the first 20
      // vectors (the "query batch"), the top-4 most-similar vectors of
      // a DIFFERENT label — boundary-adjacent negatives, the upgrade
      // over q92's random draws. Query batch broadcasts onto one
      // corpus scan; oracle replays the cross-label ranking exactly.
      val e = t(s, dir, "embeddings")
      SimilaritySearch.hardNegatives(e, col("vec_id"), col("embedding"),
          col("label"),
          e.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
          col("label"), k = 4)
        .select(col("q_id"), col("neg_id"),
          round(col("cosine"), 6).as("cosine"), col("neg_rank"))
        .orderBy("q_id", "neg_rank")
    }),

    "q50_lsh_buckets" -> ((s, dir) => {
      // hyperplane LSH bucket histogram (the ANN scale path's partitioning)
      SimilaritySearch.lshBuckets(t(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), dims = 64, planes = 4)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // ---- text analysis ----
    "q51_language_id" -> ((s, dir) => {
      // corpus-scale shape: explode + one agg (TextAnalysis.languageIdByDoc
      // scaladoc); same math as the expression form
      TextAnalysis.languageIdByDoc(t(s, dir, "documents"),
          col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "q52_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")
    }),

    "q53_token_counts" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    "q117_corpus_census" -> ((s, dir) => {
      // corpus report card: the first rollup a curation run produces —
      // per-(lang, source) doc counts, token volume, mean length,
      // short-doc share. One partial-agg pass; every output is exact in
      // double (integer partial sums < 2^53, one division) so no
      // rounding is needed for oracle parity.
      t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          avg(col("n_chars").cast("double")).as("avg_chars"),
          avg((col("n_chars") < 100).cast("double")).as("short_share"))
        .orderBy("lang", "source")
    }),

    "q54_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.contentFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    "q84_corpus_clean" -> ((s, dir) => {
      // the training-data curation funnel as ONE query: token-length
      // quality gates → prefix-fingerprint dedup (md5 of the first 8
      // lowercase tokens — catches the near-dup family sharing a prefix)
      // → per-source audit of every drop reason. One scan, one window,
      // one aggregation; each doc gets exactly one fate so the audit
      // columns always sum to n_docs.
      import org.apache.spark.sql.expressions.Window
      val toks = size(split(trim(col("text")), "\\s+"))
      val fp = md5(array_join(
        slice(split(lower(trim(col("text"))), "\\s+"), 1, 8), " ")
        .cast("binary"))
      val flagged = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          toks.as("n_tokens"), fp.as("fp"))
        .withColumn("q", when(col("n_tokens") < 25, "short")
          .when(col("n_tokens") > 80, "long").otherwise("pass"))
      val firstOfFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      flagged
        .withColumn("fate",
          when(col("q") =!= "pass", col("q"))
            .when(row_number().over(firstOfFp) > 1, "dup")
            .otherwise("kept"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("fate") === "short").cast("long")).as("drop_short"),
          sum((col("fate") === "long").cast("long")).as("drop_long"),
          sum((col("fate") === "dup").cast("long")).as("drop_dup"),
          sum((col("fate") === "kept").cast("long")).as("kept"),
          round(avg(when(col("fate") === "kept", col("n_tokens"))), 4)
            .as("avg_tokens_kept"))
        .orderBy("source")
    }),

    "q181_keyword_tags" -> ((s, dir) => {
      // taxonomy/blocklist tagging (the Dolma attribute discipline:
      // compute WHICH rules hit, filter policies compose downstream):
      // a broadcast phrase dictionary (uni+bigrams) probed by
      // scan-local gram generation — the only Exchange carries matched
      // rows, so shuffle is proportional to hits, never to tokens.
      import s.implicits._
      val dict = keywordDict.toDF("phrase", "category")
      val docs = t(s, dir, "documents")
      val tags = graft.operators.Tagging.tagPhrases(
          docs, col("doc_id"), col("text"), dict, maxPhraseLen = 2)
        .groupBy("id")
        .agg(sum("n_phrases").as("n_hits"),
          array_join(array_sort(collect_set("category")), ",")
            .as("categories"))
      docs.select(col("doc_id"))
        .join(tags, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("categories"), lit("")).as("categories"))
        .orderBy("doc_id")
    }),

    "q190_keyword_tags_kernel" -> ((s, dir) => {
      // q181's EXACT semantics through the PhraseHits codegen kernel
      // (tagPhrasesKernel): the dictionary is a plan constant, the
      // corpus never materializes its gram stream, and the SAME DuckDB
      // oracle gates both paths — the kernel is driver-verified, not
      // just spec-pinned.
      val docs = t(s, dir, "documents")
      val tags = graft.operators.Tagging.tagPhrasesKernel(
          docs, col("doc_id"), col("text"), keywordDict, maxPhraseLen = 2)
        .groupBy("id")
        .agg(sum("n_phrases").as("n_hits"),
          array_join(array_sort(collect_set("category")), ",")
            .as("categories"))
      docs.select(col("doc_id"))
        .join(tags, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("categories"), lit("")).as("categories"))
        .orderBy("doc_id")
    }),

    "q185_lsh_operating_curve" -> ((s, dir) => {
      // the dedup-tuning instrument: precision/recall of LSH candidate
      // generation vs exact-Jaccard ground truth, per banding config,
      // from ONE shared signature pass. Runs on the doc_id % 10 SAMPLE
      // by contract (ground truth is all-pairs — tuning instrumentation,
      // never the production dedup path; the cap is the query's own
      // filter, not a silent one). bands=8 (rows 2) trades precision
      // for recall; bands=4 (rows 4) the reverse — the curve is what
      // justifies a config before a 100 TB run commits to it.
      Dedup.lshOperatingCurve(
          t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
          col("doc_id"), col("text"), shingleSize = 5, numHashes = 16,
          bandsConfigs = Seq(8, 4), threshold = 0.25)
        .orderBy("bands")
    }),

    "q187_containment_pairs" -> ((s, dir) => {
      // asymmetric near-dup detection: containment |A∩B|/min(|A|,|B|)
      // catches quotes/inclusions that Jaccard provably misses (full
      // containment in a 4x-larger doc is J <= 0.25 but C = 1 — Broder
      // 1997 defines both for this reason). Same capped LSH candidate
      // envelope as q43; exact verify WITHOUT the jaccard-estimating
      // signature prune, which would drop exactly the
      // high-containment/low-jaccard pairs this exists to find.
      Dedup.containmentPairs(t(s, dir, "documents"), col("doc_id"),
          col("text"), shingleSize = 5, numHashes = 16, bands = 8,
          minContainment = 0.5, maxBucketSize = 100)
        .select(col("a_id"), col("b_id"),
          round(col("containment"), 6).as("containment"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    })
  )

  /** Shared oracle CTE chain: q43's LSH edge pipeline + 12 unrolled
    * min-label propagation rounds ending in `l12(id, component)`.
    * MATERIALIZED is load-bearing: DuckDB inlines multiply-referenced
    * CTEs by default, re-evaluating the whole LSH pipeline per round
    * (measured 132s → 1.1s at sf0.01). Fixpoint-stable: Spark iterates
    * (or union-finds) to convergence, the oracle always runs 12 rounds;
    * both sit at the same fixpoint (the min label reaches every node by
    * round 8 at sf0.01; rounds 8-20 all give the same census). */
  /** [[dupClustersCte]] parameterized by the input relation — the
    * funnel oracle (q202) replays the SAME LSH+CC chain over an
    * upstream stage CTE instead of the raw table. */
  private[queries] def dupClustersCteFrom(rel: String): String = {
    val step = (k: Int) =>
      s"""l${k + 1} AS MATERIALIZED (SELECT l.id,
         |  least(l.component, coalesce(min(n.component), l.component)) AS component
         |  FROM l$k l LEFT JOIN sym ON sym.src = l.id
         |  LEFT JOIN l$k n ON n.id = sym.dst
         |  GROUP BY l.id, l.component)""".stripMargin
    s"""${lshSymCteFrom(rel)},
      |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS component FROM sym),
      |${(0 until 12).map(step).mkString(",\n")}""".stripMargin
  }

  private lazy val dupClustersCte: String = dupClustersCteFrom("documents")

  /** The edge half of [[dupClustersCte]]: q43's LSH pipeline ending in
    * the symmetrized `sym(src, dst)` edge list — shared by the CC label
    * rounds above and q156's PageRank rounds. */
  private[queries] def lshSymCteFrom(rel: String): String =
    s"""d AS (SELECT doc_id, $shinglesSql AS sh FROM $rel WHERE len(text) > 0),
      |hh AS MATERIALIZED (SELECT doc_id, list_transform(sh,
      |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
      |  FROM d),
      |s AS MATERIALIZED (SELECT doc_id, list_transform(range(0, 16),
      |  i -> list_min(list_transform(hs,
      |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))) AS sig
      |  FROM hh),
      |bands0 AS (SELECT doc_id, b,
      |  md5(array_to_string(sig[(2*b+1):(2*b+2)], '|')) AS key
      |  FROM s, range(0, 8) t(b)),
      |bands AS (SELECT * FROM (SELECT doc_id, b, key,
      |  count(*) OVER (PARTITION BY b, key) AS sz FROM bands0)
      |  WHERE sz <= 100),
      |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
      |    AND x.doc_id < y.doc_id),
      |est AS (SELECT a_id, b_id FROM cand
      |  JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id
      |  WHERE len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i]))
      |    / 16.0 >= 0.25 - 1.0/16),
      |hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hh),
      |j AS (SELECT a_id, b_id,
      |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
      |  FROM est JOIN hset a ON a.doc_id = a_id JOIN hset b ON b.doc_id = b_id),
      |edges AS MATERIALIZED (SELECT a_id, b_id FROM j WHERE jaccard >= 0.25),
      |sym AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM edges
      |  UNION ALL SELECT b_id, a_id FROM edges)""".stripMargin

  private lazy val lshSymCte: String = lshSymCteFrom("documents")

  val oracleSql: Map[String, String] = Map(
    "q40_dedup_first_order" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_order
        |FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey) = 1 ORDER BY o_custkey""".stripMargin,

    "q41_dup_groups" ->
      """SELECT p_name AS dup_key, count(*) AS n FROM part
        |GROUP BY p_name HAVING count(*) > 1 ORDER BY dup_key""".stripMargin,

    "q42_minhash_sig" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS sh FROM documents
        |  WHERE len(text) > 0),
        |h AS (SELECT doc_id, list_transform(sh,
        |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
        |  FROM d)
        |SELECT doc_id, array_to_string(list_transform(range(0, 8),
        |  i -> list_min(list_transform(hs,
        |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))), ',') AS sig
        |FROM h ORDER BY doc_id""".stripMargin,

    "q43_minhash_neardups" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE len(text) > 0),
        |hh AS (SELECT doc_id, list_transform(sh,
        |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
        |  FROM d),
        |s AS (SELECT doc_id, list_transform(range(0, 16),
        |  i -> list_min(list_transform(hs,
        |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))) AS sig
        |  FROM hh),
        |bands0 AS (SELECT doc_id, b,
        |  md5(array_to_string(sig[(2*b+1):(2*b+2)], '|')) AS key
        |  FROM s, range(0, 8) t(b)),
        |bands AS (SELECT * FROM (SELECT doc_id, b, key,
        |  count(*) OVER (PARTITION BY b, key) AS sz FROM bands0)
        |  WHERE sz <= 100),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
        |    AND x.doc_id < y.doc_id),
        |est AS (SELECT a_id, b_id FROM cand
        |  JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id
        |  WHERE len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i]))
        |    / 16.0 >= 0.25 - 1.0/16),
        |hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hh),
        |j AS (SELECT a_id, b_id,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
        |  FROM est JOIN hset a ON a.doc_id = a_id JOIN hset b ON b.doc_id = b_id)
        |SELECT a_id, b_id, round(jaccard, 6) AS jaccard FROM j
        |WHERE jaccard >= 0.25 ORDER BY a_id, b_id""".stripMargin,

    // same minhash/band CTEs as q43; only the candidate pair space
    // changes — y is batch-only (odd ids), x is corpus (even, any order)
    // or an earlier batch doc (odd, x < y)
    "q115_incremental_dedup" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE len(text) > 0),
        |hh AS (SELECT doc_id, list_transform(sh,
        |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
        |  FROM d),
        |s AS (SELECT doc_id, list_transform(range(0, 16),
        |  i -> list_min(list_transform(hs,
        |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))) AS sig
        |  FROM hh),
        |bands0 AS (SELECT doc_id, b,
        |  md5(array_to_string(sig[(2*b+1):(2*b+2)], '|')) AS key
        |  FROM s, range(0, 8) t(b)),
        |bands AS (SELECT * FROM (SELECT doc_id, b, key,
        |  count(*) OVER (PARTITION BY b, key) AS sz FROM bands0)
        |  WHERE sz <= 100),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id,
        |    CASE WHEN x.doc_id % 2 = 0 THEN 'corpus' ELSE 'batch' END AS a_side,
        |    y.doc_id AS b_id
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
        |    AND y.doc_id % 2 = 1
        |    AND (x.doc_id % 2 = 0 OR x.doc_id < y.doc_id)),
        |est AS (SELECT a_id, a_side, b_id FROM cand
        |  JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id
        |  WHERE len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i]))
        |    / 16.0 >= 0.25 - 1.0/16),
        |hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hh),
        |j AS (SELECT a_id, a_side, b_id,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
        |  FROM est JOIN hset a ON a.doc_id = a_id JOIN hset b ON b.doc_id = b_id)
        |SELECT a_id, a_side, b_id, round(jaccard, 6) AS jaccard FROM j
        |WHERE jaccard >= 0.25 ORDER BY a_id, b_id""".stripMargin,

    "q75_dup_clusters" ->
      s"""WITH $dupClustersCte
        |SELECT component, count(*) AS cluster_size FROM l12
        |GROUP BY component ORDER BY component""".stripMargin,

    // 3 unrolled damped power-iteration rounds over the shared sym CTE;
    // contributions r/deg are doubles (bit-identical both engines),
    // summed as DECIMAL(38,18) (order-invariant), and the damped update
    // is replayed as the same double expression 1.0 - 0.85 + 0.85 * s
    "q156_dup_pagerank" -> {
      val round_ = (k: Int) =>
        s"""r${k + 1} AS MATERIALIZED (SELECT sd.dst AS id,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) +
           |    CAST(0.85 AS DOUBLE) *
           |    CAST(sum(CAST(r.rank / sd.deg AS DECIMAL(38,18))) AS DOUBLE)
           |    AS rank
           |  FROM sd JOIN r$k r ON r.id = sd.src GROUP BY sd.dst)""".stripMargin
      s"""WITH $lshSymCte,
        |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym GROUP BY src),
        |sd AS MATERIALIZED (SELECT s2.src, s2.dst, d.deg
        |  FROM sym s2 JOIN deg d USING (src)),
        |r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) AS rank FROM deg),
        |${(0 until 3).map(round_).mkString(",\n")}
        |SELECT d.src AS doc_id, d.deg, round(r.rank, 6) AS pagerank
        |FROM r3 r JOIN deg d ON d.src = r.id ORDER BY doc_id""".stripMargin
    },

    "q127_deduped_corpus" ->
      s"""WITH $dupClustersCte,
        |canon AS (SELECT d.doc_id FROM l12 l JOIN documents d ON d.doc_id = l.id
        |  QUALIFY row_number() OVER (PARTITION BY l.component
        |    ORDER BY d.n_chars DESC, d.doc_id) = 1)
        |SELECT d.doc_id, 'singleton' AS kept_reason
        |FROM documents d LEFT JOIN l12 l ON l.id = d.doc_id
        |WHERE l.id IS NULL
        |UNION ALL
        |SELECT doc_id, 'canonical' AS kept_reason FROM canon
        |ORDER BY doc_id""".stripMargin,

    // same oracle text as q127: the artifact path must reproduce the
    // inline path row-for-row (stored labels ≡ recomputed labels)
    "q130_artifact_corpus" ->
      s"""WITH $dupClustersCte,
        |canon AS (SELECT d.doc_id FROM l12 l JOIN documents d ON d.doc_id = l.id
        |  QUALIFY row_number() OVER (PARTITION BY l.component
        |    ORDER BY d.n_chars DESC, d.doc_id) = 1)
        |SELECT d.doc_id, 'singleton' AS kept_reason
        |FROM documents d LEFT JOIN l12 l ON l.id = d.doc_id
        |WHERE l.id IS NULL
        |UNION ALL
        |SELECT doc_id, 'canonical' AS kept_reason FROM canon
        |ORDER BY doc_id""".stripMargin,

    "q124_leakage_safe_split" ->
      s"""WITH $dupClustersCte,
        |comp AS (SELECT d.doc_id, coalesce(l.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN l12 l ON l.id = d.doc_id)
        |SELECT doc_id, component,
        |  CASE WHEN CAST(('0x' || substring(md5('split42:' || component), 1, 8))
        |      AS UBIGINT) % 1000000 / 1000000.0 < 0.1
        |    THEN 'eval' ELSE 'train' END AS split
        |FROM comp ORDER BY doc_id""".stripMargin,

    "q107_canonical_docs" ->
      s"""WITH $dupClustersCte
        |SELECT l.component, d.doc_id AS canonical_id,
        |  CAST(count(*) OVER (PARTITION BY l.component) AS BIGINT) AS cluster_size
        |FROM l12 l JOIN documents d ON d.doc_id = l.id
        |QUALIFY row_number() OVER (PARTITION BY l.component
        |  ORDER BY d.n_chars DESC, d.doc_id) = 1
        |ORDER BY component""".stripMargin,

    "q44_simhash_fp" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents)
        |SELECT doc_id, $simhash16Sql AS fp FROM d ORDER BY doc_id""".stripMargin,

    "q45_simhash_pairs" ->
      s"""WITH d AS (SELECT doc_id, lang, source, $toksSql AS toks FROM documents),
        |f AS (SELECT doc_id, lang, source, $simhash16Sql AS fp FROM d)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |  bit_count(xor(x.fp, y.fp)) AS hamming
        |FROM f x JOIN f y ON x.lang = y.lang AND x.source = y.source
        |  AND x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.fp, y.fp)) <= 6 ORDER BY a_id, b_id""".stripMargin,

    // postings-intersection form mirroring the operator EXACTLY,
    // including the maxDf=100 cap: grams above the per-block document
    // frequency cap are dropped from the intersection while set sizes
    // stay exact — so the oracle stays truthful even if future testdata
    // grows a binding hot gram (today's max per-block df is 5)
    "q46_ngram_jaccard" ->
      """WITH d0 AS (SELECT doc_id, lang, source,
        |  list_distinct(list_transform(
        |    range(1, greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) - 2, 0) + 1),
        |    i -> array_to_string(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)[i:i+2], ' '))) AS ngs
        |  FROM documents),
        |d AS (SELECT doc_id, lang, source,
        |  list_distinct(list_transform(ngs,
        |    x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT))) AS ng
        |  FROM d0),
        |p AS (SELECT doc_id, lang, source, h FROM d, UNNEST(ng) AS t(h)),
        |dfs AS (SELECT lang, source, h, count(*) AS df FROM p GROUP BY 1, 2, 3),
        |kept AS (SELECT p.doc_id, p.lang, p.source, p.h
        |  FROM p JOIN dfs USING (lang, source, h) WHERE df <= 100),
        |sz AS (SELECT doc_id, len(ng) AS sz FROM d),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |  FROM kept a JOIN kept b ON a.lang = b.lang AND a.source = b.source
        |    AND a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = a_id
        |  JOIN sz sb ON sb.doc_id = b_id
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05
        |ORDER BY a_id, b_id""".stripMargin,

    "q47_cosine_neardups" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.label = b.label
        |  AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.30
        |ORDER BY a_id, b_id""".stripMargin,

    "q122_semantic_dedup" ->
      """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (SELECT e.vec_id AS id, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
        |        c.cid ASC) AS rn
        |  FROM embeddings e, c),
        |assigned AS (SELECT s.id, s.cid, e.embedding::DOUBLE[] AS v
        |  FROM scored s JOIN embeddings e ON s.id = e.vec_id WHERE s.rn = 1)
        |SELECT a.id AS a_id, b.id AS b_id, a.cid,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.id < b.id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.30
        |ORDER BY a_id, b_id""".stripMargin,

    "q48_cosine_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (SELECT vec_id AS id,
        |  list_cosine_similarity(embedding::DOUBLE[], qe) AS cosine FROM embeddings, q)
        |SELECT id, round(cosine, 6) AS cosine,
        |  CAST(row_number() OVER (ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
        |FROM scored QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    "q49_knn_block" ->
      """WITH p AS (SELECT a.vec_id AS id, b.vec_id AS neighbor,
        |  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.label = b.label
        |  AND a.vec_id <> b.vec_id)
        |SELECT id, neighbor, round(cosine, 6) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY id ORDER BY cosine DESC, neighbor ASC)
        |    AS INTEGER) AS nn_rank
        |FROM p QUALIFY nn_rank <= 3 ORDER BY id, nn_rank""".stripMargin,

    "q174_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe, label AS ql
        |  FROM embeddings WHERE vec_id < 20),
        |p AS (SELECT q.q_id, e.vec_id AS neg_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS cosine
        |  FROM embeddings e, q WHERE e.label <> q.ql)
        |SELECT q_id, neg_id, round(cosine, 6) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, neg_id ASC) AS INTEGER) AS neg_rank
        |FROM p QUALIFY neg_rank <= 4 ORDER BY q_id, neg_rank""".stripMargin,

    "q50_lsh_buckets" ->
      s"""SELECT ${lshBucketSql(4, 64)} AS bucket, count(*) AS n
        |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q51_language_id" ->
      """WITH d AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |r AS (SELECT doc_id, text,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['der','die','das','und','ist','von','nicht','mit','ein','zu'], t))) AS DOUBLE)/len(toks) END AS r_de,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['the','and','of','to','a','in','is','that','for','it'], t))) AS DOUBLE)/len(toks) END AS r_en,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['el','la','de','los','las','y','es','en','un','una'], t))) AS DOUBLE)/len(toks) END AS r_es,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['le','la','les','et','de','est','un','une','dans','pour'], t))) AS DOUBLE)/len(toks) END AS r_fr
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0
        |         AND len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) * 2 > len(text)
        |    THEN 'zh'
        |    WHEN greatest(r_de, r_en, r_es, r_fr) = 0 THEN 'und'
        |    WHEN r_de = greatest(r_de, r_en, r_es, r_fr) THEN 'de'
        |    WHEN r_en = greatest(r_de, r_en, r_es, r_fr) THEN 'en'
        |    WHEN r_es = greatest(r_de, r_en, r_es, r_fr) THEN 'es'
        |    ELSE 'fr' END AS lang_pred
        |FROM r ORDER BY doc_id""".stripMargin,

    "q52_quality_score" ->
      """WITH d AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS letters,
        |  CAST(len(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE) AS punct,
        |  CASE WHEN len(toks)=0 THEN 0.0
        |    ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)/len(toks) END AS meanlen,
        |  CASE WHEN len(toks)=0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(
        |    ['the','and','of','to','a','in','is','that','for','it'], t))) AS DOUBLE)/len(toks) END AS stopr
        |  FROM d)
        |SELECT doc_id, round(
        |  least(chars/500.0, 1.0)*0.25 +
        |  (CASE WHEN chars=0 THEN 0.0 ELSE letters/chars END)*0.25 +
        |  (1.0 - CASE WHEN chars=0 THEN 1.0 ELSE punct/chars END)*0.20 +
        |  (CASE WHEN meanlen >= 3.0 AND meanlen <= 10.0 THEN 1.0 ELSE 0.0 END)*0.15 +
        |  least(stopr/0.3, 1.0)*0.15, 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "q53_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER)
        |    AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS INTEGER) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q117_corpus_census" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0))) AS BIGINT) AS n_tokens,
        |  avg(CAST(n_chars AS DOUBLE)) AS avg_chars,
        |  avg(CASE WHEN n_chars < 100 THEN CAST(1.0 AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END) AS short_share
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q54_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q84_corpus_clean" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    md5(array_to_string(
        |      string_split_regex(lower(trim(text)), '\s+')[1:8], ' ')) AS fp
        |  FROM documents),
        |flagged AS (
        |  SELECT doc_id, source, n_tokens, fp,
        |    CASE WHEN n_tokens < 25 THEN 'short'
        |         WHEN n_tokens > 80 THEN 'long'
        |         ELSE 'pass' END AS q
        |  FROM toks),
        |fated AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN q <> 'pass' THEN q
        |         WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1
        |           THEN 'dup' ELSE 'kept' END AS fate
        |  FROM flagged)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN fate = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS drop_short,
        |  CAST(sum(CASE WHEN fate = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS drop_long,
        |  CAST(sum(CASE WHEN fate = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS drop_dup,
        |  CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |  round(avg(CASE WHEN fate = 'kept' THEN n_tokens END), 4) AS avg_tokens_kept
        |FROM fated GROUP BY source ORDER BY source""".stripMargin,

    "q185_lsh_operating_curve" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS sh FROM documents
        |  WHERE len(text) > 0 AND doc_id % 10 = 0),
        |hh AS (SELECT doc_id, list_transform(sh,
        |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
        |  FROM d),
        |s AS (SELECT doc_id, list_transform(range(0, 16),
        |  i -> list_min(list_transform(hs,
        |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))) AS sig
        |  FROM hh),
        |b8 AS (SELECT doc_id, b,
        |  md5(array_to_string(sig[(2*b+1):(2*b+2)], '|')) AS key
        |  FROM s, range(0, 8) t(b)),
        |b4 AS (SELECT doc_id, b,
        |  md5(array_to_string(sig[(4*b+1):(4*b+4)], '|')) AS key
        |  FROM s, range(0, 4) t(b)),
        |c8 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM b8 x JOIN b8 y ON x.b = y.b AND x.key = y.key
        |    AND x.doc_id < y.doc_id),
        |c4 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM b4 x JOIN b4 y ON x.b = y.b AND x.key = y.key
        |    AND x.doc_id < y.doc_id),
        |hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hh),
        |truth AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    (CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a.hs, b.hs))) >= 0.25) AS is_dup
        |  FROM hset a JOIN hset b ON a.doc_id < b.doc_id),
        |tot AS (SELECT sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_true
        |  FROM truth),
        |cfg AS (
        |  SELECT 8 AS bands, count(*) AS n_candidates,
        |    sum(CASE WHEN t.is_dup THEN 1 ELSE 0 END) AS tp
        |  FROM c8 JOIN truth t USING (a_id, b_id)
        |  UNION ALL
        |  SELECT 4 AS bands, count(*) AS n_candidates,
        |    sum(CASE WHEN t.is_dup THEN 1 ELSE 0 END) AS tp
        |  FROM c4 JOIN truth t USING (a_id, b_id))
        |SELECT bands, CAST(n_candidates AS BIGINT) AS n_candidates,
        |  CAST(tot.n_true AS BIGINT) AS n_true_pairs,
        |  CAST(coalesce(tp, 0) AS BIGINT) AS true_positives,
        |  round(CAST(tp AS DOUBLE) / n_candidates, 6) AS precision,
        |  round(CAST(tp AS DOUBLE) / tot.n_true, 6) AS recall
        |FROM cfg, tot ORDER BY bands""".stripMargin,

    "q187_containment_pairs" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE len(text) > 0),
        |hh AS (SELECT doc_id, list_transform(sh,
        |  x -> CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS UBIGINT) AS BIGINT)) AS hs
        |  FROM d),
        |s AS (SELECT doc_id, list_transform(range(0, 16),
        |  i -> list_min(list_transform(hs,
        |    h -> (h * (2*i+1) + (i*2654435761) % 4294967311) % 4294967311))) AS sig
        |  FROM hh),
        |bands0 AS (SELECT doc_id, b,
        |  md5(array_to_string(sig[(2*b+1):(2*b+2)], '|')) AS key
        |  FROM s, range(0, 8) t(b)),
        |bands AS (SELECT * FROM (SELECT doc_id, b, key,
        |  count(*) OVER (PARTITION BY b, key) AS sz FROM bands0)
        |  WHERE sz <= 100),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
        |    AND x.doc_id < y.doc_id),
        |hset AS (SELECT doc_id, list_distinct(hs) AS hs FROM hh),
        |v AS (SELECT a_id, b_id,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    least(len(a.hs), len(b.hs)) AS containment,
        |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
        |  FROM cand JOIN hset a ON a.doc_id = a_id
        |  JOIN hset b ON b.doc_id = b_id)
        |SELECT a_id, b_id, round(containment, 6) AS containment,
        |  round(jaccard, 6) AS jaccard
        |FROM v WHERE containment >= 0.5 ORDER BY a_id, b_id""".stripMargin,

    "q181_keyword_tags" -> keywordTagsOracle,

    // q190 gates the PhraseHits kernel path against the SAME semantics —
    // literally the same oracle string (one definition above)
    "q190_keyword_tags_kernel" -> keywordTagsOracle
  )
}
