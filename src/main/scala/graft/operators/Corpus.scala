package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.GraftShim
import graft.functions.WordNgramHashes

/**
 * Corpus-preparation operators for training-data pipelines
 * (beyond-reference LLM-pipeline generalization — SURVEY §7.5; nearest
 * reference analogues: token machinery `entity_resolution.py:100-106`,
 * the candidate-cap/threshold curation discipline `pipeline.py:335-353`).
 *
 * All three operators are shaped for the 100 TB regime:
 *  - [[decontaminate]]: the benchmark side is tiny BY NATURE (eval sets are
 *    thousands of docs, the corpus is billions) → its distinct gram set is
 *    broadcast; the corpus side stays scan-local until one final groupBy.
 *  - [[packSequences]]: packing state is a per-shard prefix sum — a window
 *    partitioned by the shard column, never a global single-partition sort.
 *  - [[chunkChars]]: pure scan-local row generation (explode of an index
 *    sequence); output row count is bounded by text length / step.
 */
object Corpus {

  /**
   * Benchmark decontamination: flag training documents that share at least
   * one word n-gram with any benchmark document (the standard "n-gram
   * overlap" decontamination used for pretraining corpora vs eval
   * benchmarks; n = 5..13 in published pipelines — chance n-gram collisions
   * vanish above n≈4 while true copies always hit).
   *
   * Returns (id, n_grams, n_shared, contamination) for contaminated train
   * docs only (n_shared ≥ 1).
   *
   * Plan shape: per-doc DISTINCT gram hashes are computed scan-local
   * (array_distinct over one codegen'd [[WordNgramHashes]] pass — no
   * per-doc shuffle to dedup grams), the benchmark gram set is
   * `broadcast()`, and the only shuffle is the final per-doc hit count.
   * Gram hashes are md5-prefix longs — the DuckDB oracle replays them
   * bit-for-bit.
   */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: Column, textCol: Column, n: Int = 5): DataFrame = {
    val benchGrams = decontaminateBenchGrams(bench, textCol, n)
    val trainGrams = train.select(idCol.as("id"), docGrams(textCol, n).as("g"))
    trainGrams
      .select(col("id"), size(col("g")).as("n_grams"), explode(col("g")).as("h"))
      .join(broadcast(benchGrams), "h")
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id"), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }

  /**
   * Repetition-quality signals (the Gopher/C4 repetition filter family —
   * repeated content is the strongest single predictor of low-value
   * pretraining text):
   *  - `dup_word_frac`: 1 − |distinct words| / |words| (scan-local);
   *  - `rep2_frac`: occurrence share of the most frequent word bigram —
   *    a run-length fold over the SORTED bigram-hash array (mode of a
   *    sorted multiset = longest equal run), entirely scan-local: O(w)
   *    per doc, ZERO shuffles at any corpus size (the explode +
   *    groupBy(doc, gram) formulation shuffles ~|words| rows per doc
   *    whose keys are mostly unique, so partial aggregation combines
   *    nothing). Hash counts equal string counts and the oracle hashes
   *    the same way. Measured at sf0.1 (ProbeQ101, hot JVM): 0.35s
   *    scan-local vs 0.92s explode+groupBy — and the gap widens with
   *    corpus size since only one of them shuffles.
   * Docs with fewer than `minWords` words are dropped (the signals are
   * meaningless on fragments; callers gate short docs separately).
   */
  def repetitionSignals(docs: DataFrame, idCol: Column, textCol: Column,
                        minWords: Int = 5): DataFrame = {
    val w = graft.functions.TextAnalysis.words(textCol)
    val grams = sort_array(GraftShim.column(WordNgramHashes(
      GraftShim.expr(lower(textCol)), 2)))
    // (prev, run, best) fold; prev starts at an impossible hash value
    // (gram hashes are uint32-range, Long.MinValue can't collide)
    val maxRun = aggregate(grams,
      struct(lit(Long.MinValue).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // bigram count = |words| - 1 (WordNgramHashes tokenizes identically
    // to words(); re-invoking the kernel just for its size would hash
    // every bigram twice per scan)
    docs.select(idCol.as("id"), w.as("w"), maxRun.as("_mr"))
      .filter(size(col("w")) >= minWords)
      .withColumn("_ng", size(col("w")) - 1)
      .select(col("id"), size(col("w")).as("n_words"),
        (lit(1.0) - size(array_distinct(col("w"))).cast("double") /
          size(col("w"))).as("dup_word_frac"),
        (col("_mr").cast("double") / col("_ng")).as("rep2_frac"))
  }

  /** Distinct gram hashes of one doc, scan-local. */
  private def docGrams(textCol: Column, n: Int): Column =
    array_distinct(GraftShim.column(WordNgramHashes(
      GraftShim.expr(lower(textCol)), n)))

  /** The benchmark's distinct gram-hash set (`h: long`) — build once,
    * broadcast against the corpus (batch: [[decontaminate]]; streaming:
    * `Streams.decontaminateStream`). */
  def decontaminateBenchGrams(bench: DataFrame, textCol: Column,
                              n: Int = 5): DataFrame =
    bench.select(explode(docGrams(textCol, n)).as("h")).distinct()

  /**
   * Bloom-prefiltered decontamination: EXACTLY the [[decontaminate]]
   * result (flagged docs, counts, ratios — bit-identical; the q93 oracle
   * gates both), via a two-phase plan that survives a benchmark-gram set
   * too large to hash-join comfortably:
   *
   *  1. a Bloom filter over the bench gram hashes (~1.2 bytes/gram at
   *     1% FPP vs tens of bytes/entry for a broadcast hash relation —
   *     the sketch stays shippable one to two orders of magnitude beyond
   *     where the join relation stops being) prunes corpus grams
   *     SCAN-LOCALLY with Spark's own `BloomFilterMightContain` codegen
   *     predicate (the expression behind AQE's injected runtime filters);
   *  2. the survivors — true hits + an FPP sliver of the corpus — flow
   *     into the same exact equi-join as [[decontaminate]], which
   *     removes every false positive. No false negatives exist by the
   *     Bloom contract, so phase 2 restores exactness.
   *
   * The join side is NOT broadcast-hinted here: the point of the sketch
   * is that the exact join's probe input is already tiny, so the planner
   * (AQE) picks broadcast vs shuffle from the real post-filter size.
   */
  def decontaminateBloom(train: DataFrame, bench: DataFrame,
                         idCol: Column, textCol: Column, n: Int = 5,
                         fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val benchGrams = decontaminateBenchGrams(bench, textCol, n)
      .localCheckpoint() // feeds the sketch build AND the exact join
    val nBench = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter(col("h"), nBench, fpp)
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      bf.writeTo(baos)
      baos.toByteArray
    }
    val mightContain = GraftShim.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftShim.expr(lit(bytes)), GraftShim.expr(col("h"))))
    val trainGrams = train.select(idCol.as("id"), docGrams(textCol, n).as("g"))
    trainGrams
      .select(col("id"), size(col("g")).as("n_grams"), explode(col("g")).as("h"))
      .filter(mightContain)
      .join(benchGrams, "h")
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id"), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }

  /**
   * SEMANTIC benchmark decontamination — the embedding-space complement
   * of the n-gram paths ([[decontaminate]] exact, [[decontaminateBloom]]
   * two-phase): a paraphrased or reformatted benchmark item shares no
   * 5-gram with its contaminated twin but sits next to it in embedding
   * space, so production decontamination reports run BOTH families.
   * Returns the contamination audit frame (corpus id, bench id, cosine)
   * for every corpus vector within `threshold` cosine of a benchmark
   * vector; callers anti-join the distinct ids to drop.
   *
   * Shape = IVF cross-set probe (the q122/q132 kernels turned
   * corpus-vs-bench): deterministic coarse centroids from the BENCH set
   * (every `modulus`-th id — bench ids must make this non-empty),
   * broadcast; bench vectors assign to their top-1 list (argmax partial
   * agg, one shuffle row per vector) with `maxListSize` capping
   * degenerate lists BEFORE the join; corpus vectors probe their
   * `nprobe` nearest lists. Pair work ≈ |corpus| × nprobe ×
   * |bench|/K — never |corpus| × |bench|. Recall is approximate from
   * TWO sources (the LSH-banding contract): a contaminated pair whose
   * bench list is outside the corpus vector's nprobe probes is missed
   * (raise `nprobe` to trade cost for recall), and every pair in a
   * bench list larger than `maxListSize` is dropped (size the cap so
   * it never binds on real benchmark sets — eval sets are thousands of
   * docs, so the default never engages in practice).
   */
  def decontaminateSemantic(corpus: DataFrame, bench: DataFrame,
                            idCol: Column, vecCol: Column, modulus: Int,
                            nprobe: Int = 2, threshold: Double = 0.40,
                            maxListSize: Int = DefaultSemanticListCap): DataFrame = {
    import graft.functions.VectorFunctions
    import graft.operators.SimilaritySearch
    val cents = SimilaritySearch.ivfCentroids(bench, idCol, vecCol, modulus)
    // a contamination-safety operator must not silently report "clean"
    // because the id scheme produced zero centroids (no bench id
    // divisible by modulus → every join empty → empty audit). Eager
    // check — the centroid set is tiny by construction.
    require(!cents.isEmpty,
      s"decontaminateSemantic: no bench id is divisible by $modulus — " +
        "zero centroids would silently report the corpus clean; pick a " +
        "modulus compatible with the bench id scheme")
    val capped = semanticBenchLists(cents, bench, idCol, vecCol, maxListSize)
    // corpus probes its nprobe nearest bench lists
    val c = corpus.select(idCol.as("id"), VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    val probes = c.join(broadcast(cents))
      .select(col("id"), col("u"), col("cid"),
        VectorFunctions.dot(col("u"), col("cu")).as("ccos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("rn") <= nprobe)
      .select("id", "u", "cid")
    probes.join(capped, "cid")
      .select(col("id"), col("bench_id"),
        VectorFunctions.dot(col("u"), col("bu")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** One source of truth for the semantic-decontamination list cap —
    * both the artifact builder and the batch audit default to it, so a
    * stored artifact and an inline audit can never silently cap at
    * different sizes. */
  val DefaultSemanticListCap = 100000

  /** The bench-list artifact behind [[decontaminateSemantic]]:
    * (bench_id, cid, bu) — each benchmark vector's top-1 centroid list
    * plus its unit vector, degenerate lists capped. Built once per
    * benchmark version and stored (the nearDupArtifacts/ivfIndex
    * materialize-once pattern); the batch operator builds it inline,
    * `Streams.semanticDecontaminateStream` consumes it as a static
    * table for ingest-time gating. The cap is a recall trade (see
    * [[decontaminateSemantic]]).
    *
    * Kernel sharing: assignment + cap are the q122 kernels
    * (`SimilaritySearch.assignWithVector` / `capLists`).
    */
  def semanticBenchLists(cents: DataFrame, bench: DataFrame, idCol: Column,
                         vecCol: Column,
                         maxListSize: Int = DefaultSemanticListCap): DataFrame =
    SimilaritySearch.capLists(
      SimilaritySearch.assignWithVector(cents, bench, idCol, vecCol)
        .withColumnRenamed("id", "bench_id")
        .withColumnRenamed("u", "bu"),
      maxListSize)

  /**
   * Sequence packing (concat-then-chunk): documents are concatenated in
   * (shard, id) order into a contiguous token stream and cut into packs of
   * `capacity` tokens — the standard pretraining batch-packing layout
   * (docs may straddle a pack boundary; `pack_first`/`pack_last` give the
   * span, `pack_offset` the position within the first pack).
   *
   * The packing state is a prefix sum over a window PARTITIONED BY the
   * shard column: each shard packs independently, so the operator scales
   * horizontally — a global packing order would serialize the corpus
   * through one partition. Deterministic: ordering is (shard, id), no RNG.
   */
  def packSequences(docs: DataFrame, idCol: Column, shardCol: Column,
                    nTokCol: Column, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(idCol.as("id"), shardCol.as("shard"), nTokCol.as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("_prior", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("id"), col("shard"), col("n_tok"),
        floor(col("_prior") / capacity).as("pack_first"),
        floor((col("_prior") + col("n_tok") - 1) / capacity).as("pack_last"),
        pmod(col("_prior"), lit(capacity.toLong)).as("pack_offset"))
  }

  /**
   * Fixed-size character chunking with overlap (context-window
   * preparation): text is cut into `size`-char chunks every
   * `size - overlap` chars; the last chunk may be short. Returns
   * (id, chunk_id, chunk) rows. Scan-local — the chunk index sequence is
   * generated per row and substr'd inside codegen; no shuffle at any scale.
   */
  def chunkChars(docs: DataFrame, idCol: Column, textCol: Column,
                 size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val step = size - overlap
    val nChunks = greatest(ceil((length(textCol) - overlap) /
      lit(step.toDouble)), lit(1.0)).cast("int")
    docs
      .filter(length(textCol) > 0)
      .select(idCol.as("id"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"),
        textCol.as("_t"))
      .select(col("id"), col("chunk_id"),
        col("_t").substr(col("chunk_id") * step + 1, lit(size)).as("chunk"))
  }

  /**
   * C4-style repeated-span excision (the C4 rule: "we discard all but
   * one of any three-sentence span occurring more than once in the
   * data set" — Raffel et al. 2020 §2.2; span = fixed `spanWords`-word
   * tile here because the corpus is unpunctuated word streams). Unlike
   * the minhash/ngram families, which FLAG whole near-dup documents,
   * this REWRITES document content: every complete tile that already
   * appeared earlier in the corpus (first occurrence = lowest
   * (doc id, tile index)) is excised, and the doc is rebuilt from its
   * surviving tiles plus the always-kept partial tail.
   *
   * Returns (id, n_tiles, n_kept, n_dropped, rebuilt_md5) — the md5 of
   * the rebuilt text stands in for the text itself so downstream
   * row-compare gates stay small; callers wanting the rewritten corpus
   * take `rebuilt` before the final select (see `rebuiltCol`).
   *
   * Plan shape (100 TB): tiling is scan-local (one split + slice
   * generation per doc). Global first-wins REQUIRES one corpus-wide
   * Exchange keyed on tile content — that shuffle is the algorithm's
   * floor, and it carries (id, idx, tile) exactly once; a pre-agg
   * would combine almost nothing (most tiles are unique — the q101
   * bigram-mode lesson). One window over the md5 key decides winners,
   * then one per-doc Exchange rebuilds. Two shuffles total, both key
   * changes. The md5 group key also makes the decision portable: the
   * DuckDB oracle replays it bit-for-bit.
   */
  def spanDedup(docs: DataFrame, idCol: Column, textCol: Column,
                spanWords: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (base, tiles) = tileDocs(docs, idCol, textCol, spanWords)
    val kept = tiles
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("tile"))).orderBy(col("id"), col("idx"))))
      .filter(col("rn") === 1)
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tile")))),
          s => s("tile")), " ").as("body"))
    spliceRebuilt(base, kept, spanWords)
  }

  /**
   * Sliding-window repeated-span excision — the alignment-free upgrade
   * of [[spanDedup]] (ExactSubstr-style: Lee et al. 2021 "Deduplicating
   * Training Data Makes Language Models Better" §3.1 remove-all-but-one
   * of any ≥N-token repeated span, realized over STRIDE-1 token windows
   * instead of a suffix array). Fixed tiles miss any repeat that
   * straddles a tile boundary or starts off-phase; stride-1 windows
   * catch every repeated `spanWords`-token span at ANY alignment.
   *
   * Pinned semantics: each distinct window value's globally-first
   * occurrence (lowest (id, position) — id must be orderable) is
   * canonical; every token covered by any NON-canonical occurrence is
   * excised; the doc is rebuilt from surviving tokens in order. A
   * periodic self-overlapping run ("a a a a", W=2) keeps only its first
   * token — duplicate windows overlap the canonical one, and coverage
   * excision is deliberately aggressive there (the run IS repetition).
   * Docs shorter than `spanWords` are never touched.
   *
   * Returns (id, n_tokens, n_kept, rebuilt_md5).
   *
   * Plan shape (100 TB): window hashing is scan-local (n windows per
   * n-token doc — stride 1 costs ×1 rows vs tiles, not ×W: one row per
   * position either way, each carrying a 32-char md5 instead of a
   * W-word string). ONE corpus-wide Exchange on the window hash decides
   * winners; the duplicate-coverage explode is bounded by duplicate
   * mass × W, collapses to a per-doc position set (one doc-key
   * Exchange over the DUPLICATED docs only), and joins back onto the
   * base scan (AQE broadcasts while the hit set is small); the rebuild
   * is a scan-local indexed filter — the clean corpus never
   * re-shuffles its tokens.
   */
  def slidingSpanDedup(docs: DataFrame, idCol: Column, textCol: Column,
                       spanWords: Int = 8): DataFrame = {
    require(spanWords >= 2, s"spanWords must be >= 2 (got $spanWords)")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(idCol.as("id"),
        filter(split(lower(textCol), "\\s+"), t => length(t) > 0).as("_w"))
      .select(col("id"), col("_w"), size(col("_w")).as("_n"))
    val grams = base.filter(col("_n") >= spanWords)
      .select(col("id"), col("_w"),
        explode(sequence(lit(1), col("_n") - (spanWords - 1))).as("_i"))
      .select(col("id"), col("_i"),
        md5(concat_ws(" ", slice(col("_w"), col("_i"), lit(spanWords))))
          .as("_g"))
    val dupCover = grams
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g")).orderBy(col("id"), col("_i"))))
      .filter(col("_rn") > 1)
      .select(col("id"),
        explode(sequence(col("_i"), col("_i") + (spanWords - 1))).as("_p"))
      .groupBy("id").agg(collect_set(col("_p")).as("_cov"))
    base.join(dupCover, Seq("id"), "left")
      .withColumn("_kept", when(col("_cov").isNull, col("_w"))
        .otherwise(filter(col("_w"),
          (_, i) => not(array_contains(col("_cov"), i + lit(1))))))
      .select(col("id"), col("_n").as("n_tokens"),
        size(col("_kept")).as("n_kept"),
        md5(array_join(col("_kept"), " ")).as("rebuilt_md5"))
  }

  /**
   * Boilerplate excision — the CCNet/C4 LINE-level frequency rule
   * (Wenzek et al. 2020 §3.1 deduplicate-then-filter; the "remove any
   * line repeated across documents" pass every web-corpus pipeline
   * runs before quality filtering), tile-shaped here because the
   * corpus is unpunctuated word streams (the [[spanDedup]] convention;
   * real newline corpora pass their lines through the same kernel by
   * pre-splitting). A tile whose DOCUMENT frequency — distinct docs
   * containing it — reaches `minDf` is template text (nav bars,
   * footers, cookie banners, license headers), and ALL its occurrences
   * are removed. The complement of [[spanDedup]]'s first-wins: dedup
   * keeps one copy of repeated *content*; boilerplate is noise in
   * every copy, including the first. Within-doc repetition alone never
   * triggers it (df counts distinct docs) — that signal belongs to
   * [[repetitionSignals]].
   *
   * Returns the [[spanDedup]] shape: (id, n_tiles, n_kept, n_dropped,
   * rebuilt_md5), the always-kept partial tail spliced back.
   *
   * Plan shape (100 TB): tiling scan-local; ONE corpus-wide Exchange
   * on the md5 tile key carrying (id, idx, tile) exactly once — df is
   * two window functions over that single partitioning (dense_rank by
   * id, then its max over the frame: equal ids tie on rank, so the max
   * IS the distinct-doc count — no second shuffle, no groupBy+join-back
   * re-exchange); then one per-doc Exchange rebuilds. Two shuffles
   * total, the same floor as [[spanDedup]].
   */
  def removeBoilerplate(docs: DataFrame, idCol: Column, textCol: Column,
                        spanWords: Int = 10, minDf: Int = 3): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (got $minDf): df >= 1 holds " +
      "for every tile, so a lower gate would excise the whole corpus")
    import org.apache.spark.sql.expressions.Window
    val (base, tiles) = tileDocs(docs, idCol, textCol, spanWords)
    // the key is materialized as a column so BOTH window specs partition
    // on the same attribute — inline md5(tile) in each spec gets
    // extracted to two distinct projections and the planner inserts a
    // second full Exchange between the windows
    val byKey = Window.partitionBy(col("_k"))
    val kept = tiles
      .withColumn("_k", md5(col("tile")))
      .withColumn("_dr", dense_rank().over(byKey.orderBy(col("id"))))
      .withColumn("df", max(col("_dr")).over(byKey))
      .filter(col("df") < minDf)
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tile")))),
          s => s("tile")), " ").as("body"))
    spliceRebuilt(base, kept, spanWords)
  }

  /**
   * The boilerplate-tile artifact behind [[removeBoilerplate]] — the
   * materialize-once pattern (nearDupArtifacts / ivfIndex /
   * semanticBenchLists): (k: md5 tile key, df: distinct-doc frequency)
   * for every tile at or over `minDf`, built once per corpus version
   * and stored; [[removeBoilerplateAgainst]] excises any corpus against
   * the stored set, and `Streams.boilerplateIngest` gates ARRIVING docs
   * with it (the production crawl-ingest shape — df comes from the
   * standing corpus, new docs never wait for a global recount). df is
   * carried for the audit; membership is the gate.
   */
  def boilerplateTiles(docs: DataFrame, idCol: Column, textCol: Column,
                       spanWords: Int = 10, minDf: Int = 3): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (got $minDf): df >= 1 holds " +
      "for every tile, so a lower gate would flag the whole corpus")
    val (_, tiles) = tileDocs(docs, idCol, textCol, spanWords)
    tiles.groupBy(md5(col("tile")).as("k"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
  }

  /**
   * [[removeBoilerplate]] against a PREBUILT (typically parquet-read)
   * tile-key set: same tiling, same splice, the keep rule is a LEFT
   * ANTI join on the md5 key instead of the inline df windows. Applied
   * to the corpus the artifact was built from (same `spanWords` and
   * `minDf`), the output is row-identical to the inline operator
   * (q157 gates it against q155's oracle through a parquet roundtrip).
   * The anti join shuffles tiles by key only when the key set outgrows
   * broadcast — AQE decides from the artifact's real size.
   */
  def removeBoilerplateAgainst(docs: DataFrame, tileKeys: DataFrame,
                               idCol: Column, textCol: Column,
                               spanWords: Int = 10): DataFrame = {
    val (base, tiles) = tileDocs(docs, idCol, textCol, spanWords)
    val kept = tiles
      .withColumn("_k", md5(col("tile")))
      .join(tileKeys.select(col("k").as("_k")), Seq("_k"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tile")))),
          s => s("tile")), " ").as("body"))
    spliceRebuilt(base, kept, spanWords)
  }

  /** The tiling EXPRESSIONS over a pre-split `ws` word-array column —
    * THE one definition of the tile arithmetic. The streaming twins
    * ([[graft.streaming.Streams.spanDedupIngest]] /
    * `boilerplateIngest`) build their row-parity-pinned plans from
    * these same expressions, so an edit to the tokenizer split, the
    * tile slice, or the tail rule changes batch and stream together. */
  private[graft] def tileCount(ws: Column, spanWords: Int): Column =
    (size(ws).cast("long") / spanWords).cast("long")

  /** The complete `spanWords`-word tiles, in document order (empty
    * array for a doc shorter than one tile). */
  private[graft] def tileArray(ws: Column, spanWords: Int): Column = {
    val w = lit(spanWords)
    when(tileCount(ws, spanWords) > 0, transform(
      sequence(lit(0), (tileCount(ws, spanWords) - 1).cast("int")),
      i => concat_ws(" ", slice(ws, i * w + 1, w))))
      .otherwise(array().cast("array<string>"))
  }

  /** The always-kept partial tail after the last complete tile. */
  private[graft] def tailText(ws: Column, spanWords: Int): Column =
    concat_ws(" ",
      slice(ws, (tileCount(ws, spanWords) * spanWords + 1).cast("int"),
        (size(ws).cast("long") - tileCount(ws, spanWords) * spanWords)
          .cast("int")))

  /** Shared tiling kernel of [[spanDedup]] / [[removeBoilerplate]]:
    * scan-local split into complete `spanWords`-word tiles plus the
    * always-kept partial tail. Returns (base with tail_txt, exploded
    * (id, idx, tile) rows). */
  private def tileDocs(docs: DataFrame, idCol: Column, textCol: Column,
                       spanWords: Int): (DataFrame, DataFrame) = {
    val base = docs
      .select(idCol.as("id"), split(textCol, " ").as("ws"))
      .withColumn("n_tiles", tileCount(col("ws"), spanWords))
      // the trailing partial tile never enters the excision decision
      .withColumn("tail_txt", tailText(col("ws"), spanWords))
    val tiles = base
      .filter(col("n_tiles") > 0)
      .select(col("id"), posexplode(tileArray(col("ws"), spanWords)))
      .toDF("id", "idx", "tile")
    (base, tiles)
  }

  /** Shared rebuild tail: per-doc surviving-tile body + partial tail →
    * (id, n_tiles, n_kept, n_dropped, rebuilt_md5, rebuilt_text). The
    * md5 is the oracle-compared fingerprint (q131/q155/q157 project it);
    * rebuilt_text carries the actual rewritten doc for pipeline
    * consumers (the CurationRunner boilerplate stage) — same expression
    * under the hash, so the two can never diverge. */
  private def spliceRebuilt(base: DataFrame, kept: DataFrame,
                            spanWords: Int): DataFrame =
    base
      .join(kept, Seq("id"), "left")
      .withColumn("rebuilt_text", trim(concat_ws(" ",
        coalesce(col("body"), lit("")), col("tail_txt"))))
      .select(col("id"), col("n_tiles"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tiles") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        md5(col("rebuilt_text")).as("rebuilt_md5"),
        col("rebuilt_text"))
}
