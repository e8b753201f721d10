package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Deduplication operators for large-scale document corpora
 * (beyond-reference: the LLM-data-pipeline generalization the reference's
 * ER blocking+similarity machinery points at — SURVEY §7.5; reference
 * analogues: blocking entity_resolution.py:287-294, Jaccard :157-164).
 *
 * Hashing discipline: every hash is md5 over explicit string material and
 * minima are taken LEXICOGRAPHICALLY on the hex strings. That keeps
 * signatures engine-portable (any engine with md5 reproduces them
 * bit-for-bit — the DuckDB oracles do) and avoids engine-specific integer
 * hash functions. md5-as-string costs ~2× an int hash; swap
 * `xxhash64` in `hashStr` for a faster non-portable variant.
 *
 * Scale notes (100 TB):
 *  - exact dedup = one shuffle on the key; with pre-bucketed storage on the
 *    key it's shuffle-free.
 *  - MinHash/LSH: signature computation is embarrassingly parallel
 *    (scan-local). The band-bucket join shuffles `bands × N` rows of
 *    (band_key, id) — pairs only materialize within buckets, which is the
 *    whole point; a hot bucket (all-identical boilerplate docs) is the skew
 *    risk → cap bucket size (`maxBucketSize`) like production dedup
 *    pipelines do, dropping degenerate buckets to a side channel.
 *  - SimHash: fingerprint is scan-local; near-dup candidates via banding on
 *    fingerprint segments (exact-match join), then Hamming verify.
 */
object Dedup {

  private def hashStr(c: Column): Column = md5(c)

  // ---------------- exact ----------------

  /** Exact dedup on a key expression: keeps the row with the smallest
    * tiebreaker per key (deterministic, unlike dropDuplicates which keeps
    * an arbitrary first). One shuffle. */
  def exactDedup(df: DataFrame, key: Column, tiebreak: Column): DataFrame =
    TopK.topKPerGroup(df, Seq(key), Seq(tiebreak.asc), 1).drop("rn")

  /** Groups of exact duplicates (size > 1) by key expression. */
  def exactDupGroups(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("dup_key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  // ---------------- MinHash + LSH ----------------

  /** Prime just above 2^32 — the modulus of the affine permutation family.
    * All affine math stays < 2^41, far from long overflow (overflow
    * semantics differ between engines; staying exact keeps the DuckDB
    * oracle bit-identical). */
  val MinhashPrime = 4294967311L

  /** Base hash of one shingle: first 8 hex chars of md5 as a uint32-range
    * long. Each shingle is hashed ONCE; every permutation derives from
    * the integer (hashing per permutation × shingle would cost
    * numHashes× more scan time for nothing). */
  def shingleHash(shingle: Column): Column =
    conv(substring(hashStr(shingle), 1, 8), 16, 10).cast("long")

  /** Affine permutation i of a base hash: h → (h·(2i+1) + b_i) mod p.
    * Factors stay < 2^41 — exact in long arithmetic on every engine. */
  def permute(h: Column, i: Int): Column =
    pmod(h * (2L * i + 1) + (i * 2654435761L) % MinhashPrime,
      lit(MinhashPrime))

  /**
   * MinHash signatures as a DataFrame: docs(idCol, textCol) →
   * (id, sig array<long> of length numHashes).
   *
   * Plan shape — explode shingles → shingleHash → numHashes min-aggregates
   * → array. Catalyst's partial aggregation makes the mins SCAN-LOCAL
   * (map-side combine); the shuffle carries numHashes longs per doc, not
   * shingles, not text. This deliberately avoids nested array lambdas:
   * CollapseProject inlines single-use projections, re-evaluating the
   * per-shingle md5 once per permutation — the agg form pins the
   * evaluate-once structure and stays inside whole-stage codegen.
   * Duplicate shingles need no dedup (min over multiset = min over set).
   */
  def minhashSignatures(docs: DataFrame, idCol: Column, textCol: Column,
                        shingleSize: Int, numHashes: Int): DataFrame = {
    val exploded = docs
      .select(idCol.as("id"),
        explode(TextFunctions.charShingles(lower(textCol), shingleSize)).as("s"))
      .select(col("id"), shingleHash(col("s")).as("h"))
    val aggs = (0 until numHashes).map(i => min(permute(col("h"), i)).as(s"_m$i"))
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH band keys: signature split into `bands` bands of
    * `numHashes/bands` rows; band key = md5 of the concatenated band slice.
    * Returns array<struct<band:int, key:string>> for exploding. */
  def lshBandKeys(signature: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        hashStr(array_join(
          transform(slice(signature, b * rows + 1, lit(rows)),
            x => x.cast("string")), "|")).as("key")))
  }

  /**
   * Near-duplicate candidate pairs via MinHash LSH over a document frame:
   * docs(idCol, textCol) → (a_id, b_id, jaccard) for verified pairs with
   * shingle-set Jaccard ≥ `threshold`.
   *
   * Plan shape: scan-local shingling+signature → explode bands (bands×N
   * rows) → self-join on (band, key) → distinct pairs → broadcast-free
   * verify join back to shingle sets → exact Jaccard filter.
   *
   * `maxBucketSize` drops degenerate buckets BEFORE pair generation —
   * the self-join emits O(sz²) pairs per bucket, so one boilerplate
   * bucket of 1k docs costs 500k verifications; measured at sf0.1 this
   * cap is the difference between ~5s and ~8min. Dropped buckets are the
   * all-near-identical template clusters; exact dedup (exactDupGroups)
   * catches their identical cores, and production pipelines route them
   * to a side channel rather than pairwise-verify them.
   */
  def minhashNearDups(docs: DataFrame, idCol: Column, textCol: Column,
                      shingleSize: Int = 5, numHashes: Int = 16,
                      bands: Int = 4, threshold: Double = 0.5,
                      maxBucketSize: Int = 100): DataFrame = {
    // hashed shingle sets: verify runs on array<long>, not strings — long
    // equality is ~3× cheaper inside array_intersect, and the 32-bit hash
    // space makes per-doc collisions (~300 items) a ≤1e-5 event computed
    // IDENTICALLY by the oracle (md5-derived, engine-portable)
    // Both frames feed 2 joins each; without persist Spark recomputes the
    // full shingle+md5 scan per join use (different join keys → no
    // exchange reuse). MEMORY_AND_DISK: signatures are numHashes longs
    // and hashes ~|text| longs per doc — far smaller than re-scanning.
    val hashed = docs.select(idCol.as("id"),
        array_distinct(transform(
          TextFunctions.charShingles(lower(textCol), shingleSize),
          s => shingleHash(s))).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sz", size(col("hs")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignatures(docs, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandedAll = sig.select(col("id"),
        explode(lshBandKeys(col("sig"), numHashes, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // skew guard: drop buckets larger than the cap (window count over the
    // bucket key — one shuffle, reused by the join's partitioning)
    val bucketN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key"))
    val banded = bandedAll
      .withColumn("_sz", count(lit(1)).over(bucketN))
      .filter(col("_sz") <= maxBucketSize)
      .drop("_sz")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
    // two-phase verify: (1) signature-agreement estimate — numHashes long
    // compares, prunes the bulk of band-collision noise before touching
    // shingle sets; (2) exact Jaccard on the hashed sets. The estimate
    // gate (est ≥ threshold − 1/numHashes) makes recall approximate at
    // the margin — inherent to LSH, and bit-reproduced by the oracle.
    val sigEst = aggregate(
      zip_with(col("a_sig"), col("b_sig"),
        (x, y) => (x === y).cast("int")),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes
    val estGate = threshold - 1.0 / numHashes
    val withSigs = cand
      .join(sig.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sig.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("_est", sigEst)
      .filter(col("_est") >= estGate)
      .select("a_id", "b_id")
    val withSets = withSigs
      .join(hashed.select(col("id").as("a_id"), col("hs").as("a_hs"),
        col("sz").as("a_sz")), "a_id")
      .join(hashed.select(col("id").as("b_id"), col("hs").as("b_hs"),
        col("sz").as("b_sz")), "b_id")
    // one set pass per pair: |∪| = |a|+|b|−|∩| (sets are distinct), no
    // second array_union walk
    val inter = size(array_intersect(col("a_hs"), col("b_hs"))).cast("double")
    val result = withSets.select(col("a_id"), col("b_id"),
        (inter / (col("a_sz") + col("b_sz") - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // Materialize the (corpus-tiny) result eagerly, then release the
    // persisted intermediates — otherwise every call leaks two cached
    // frames into the session for its remaining lifetime.
    val out = result.localCheckpoint(true)
    hashed.unpersist()
    sig.unpersist()
    out
  }

  // ---------------- SimHash ----------------

  /**
   * SimHash fingerprint over a token array, `bits` wide (≤ 32 keeps int
   * math portable; the hot path at 64 bits would use two 32-bit halves).
   * Bit j = sign of Σ_tokens (bit j of md5(token) ? +1 : -1).
   * Nibble extraction is arithmetic on hex chars — portable to any engine
   * with md5 + string ops (the DuckDB oracle reproduces it exactly).
   */
  def simhash(tokens: Column, bits: Int = 32): Column = {
    require(bits % 4 == 0 && bits <= 32, "bits must be a multiple of 4, ≤ 32")
    val hexDigits = bits / 4
    // per token: first `hexDigits` chars of md5 (one shared subexpression;
    // codegen's subexpression elimination keeps md5 evaluated once/token)
    val hashes = transform(tokens, t => substring(hashStr(t), 1, hexDigits))
    val bitCols = (0 until bits).map { j =>
      val d = j / 4 + 1                // 1-based hex digit index
      val bit = j % 4
      val s = aggregate(hashes, lit(0), (acc, h) => {
        val nibble = locate_digit(substring(h, d, 1))
        acc + when(shiftright(nibble, bit) % 2 === 1, 1).otherwise(-1)
      })
      when(s > 0, lit(1 << j)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** hex char → 0..15 (portable: position arithmetic, no conv()). */
  private def locate_digit(ch: Column): Column =
    when(ch.rlike("[0-9]"), ch.cast("int"))
      .otherwise(ascii(ch) - ascii(lit("a")) + 10)

  /**
   * SimHash fingerprints as a DataFrame: docs(idCol, tokensCol) → (id, fp).
   * Same numbers as [[simhash]], different plan shape: explode tokens →
   * md5 ONCE per token → int nibble math → `bits` partial-agg sign sums.
   *
   * The column-expression form costs `bits` interpreted aggregate() lambdas
   * per row, each re-hashing every token (HOFs don't participate in
   * codegen and allocate per element); this form hashes each token once
   * inside whole-stage codegen and the aggregation is map-side partial —
   * the shuffle carries `bits` ints per doc. Same explode+agg restructuring
   * that took minhashSignatures 100s → 8.6s at sf0.1.
   *
   * explode_outer keeps empty-token docs (all-zero sums → fp 0, matching
   * the expression form's coalesce(...,0) semantics).
   */
  def simhashByDoc(docs: DataFrame, idCol: Column, tokensCol: Column,
                   bits: Int = 32,
                   extra: Seq[(String, Column)] = Nil): DataFrame = {
    require(bits % 4 == 0 && bits <= 32, "bits must be a multiple of 4, ≤ 32")
    val hexDigits = bits / 4
    // v = first `hexDigits` hex chars of md5(token) as an integer; the
    // expression form's hex-digit d (1-based from the LEFT), bit b nibble
    // test becomes (v >> (4*(hexDigits-d) + b)) & 1
    val e = docs
      .select(Seq(idCol.as("id"), explode_outer(tokensCol).as("t")) ++
        extra.map { case (n, c) => c.as(n) }: _*)
      .withColumn("v",
        conv(substring(hashStr(col("t")), 1, hexDigits), 16, 10).cast("long"))
    val sums = (0 until bits).map { j =>
      val shift = 4 * (hexDigits - 1 - j / 4) + (j % 4)
      sum(when(col("v").isNull, 0)
        .when(shiftright(col("v"), shift) % 2 === 1, 1)
        .otherwise(-1)).as(s"_s$j")
    }
    val aggCols = extra.map { case (n, _) => first(col(n)).as(n) } ++ sums
    e.groupBy("id").agg(aggCols.head, aggCols.tail: _*)
      .select(Seq(col("id")) ++ extra.map { case (n, _) => col(n) } :+
        (0 until bits).map(j =>
          when(col(s"_s$j") > 0, lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _).as("fp"): _*)
  }

  /** Hamming distance between two int fingerprints. */
  def hammingDist(a: Column, b: Column, bits: Int = 32): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup pairs within a blocking key: fingerprint both sides,
    * pair within block, keep Hamming ≤ maxDist. Fingerprints are computed
    * ONCE and materialized (corpus-tiny: id, block, int) — the self-join
    * otherwise re-runs the full tokenize+hash scan per side. */
  def simhashNearDups(docs: DataFrame, idCol: Column, tokensCol: Column,
                      blockCol: Column, bits: Int = 32,
                      maxDist: Int = 3): DataFrame = {
    val fp = simhashByDoc(docs, idCol, tokensCol, bits,
        extra = Seq("block" -> blockCol))
      .localCheckpoint(true)
    fp.as("x").join(fp.as("y"),
        col("x.block") === col("y.block") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        hammingDist(col("x.fp"), col("y.fp"), bits).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  // ---------------- n-gram Jaccard ----------------

  /** Word n-gram Jaccard near-dup pairs within a blocking key — EXACT
    * (identical results to brute-force all-pairs) via an inverted-index
    * (sparse) similarity join rather than an O(block²) scan:
    *
    *   explode (id, ngram-hash) postings → self-join on (block, hash) →
    *   |∩| = count per (a,b) → join back per-doc set sizes →
    *   J = |∩| / (|a|+|b|−|∩|).
    *
    * Pairs sharing zero n-grams never materialize (J=0 < threshold, so
    * dropping them is exact for threshold > 0) — the work is
    * Σ_ngram df² over document frequencies instead of Σ_block |block|²,
    * which on natural text is orders of magnitude smaller (measured at
    * sf0.1: 293k posting-pairs vs 625k+ full pairs each needing a
    * 250-element set intersect; 21s → <2s). At 100 TB the df² term is the
    * skew risk — a boilerplate phrase appearing in 10⁶ docs would alone
    * emit 10¹² pairs — so `maxDf` drops n-grams above a document-frequency
    * cap (stop-phrases carry ~no Jaccard signal; production ppjoin-family
    * systems do the same). Default None = exact.
    *
    * n-grams are md5-hashed to longs below the explode (portable; the
    * DuckDB oracle reproduces the hashes bit-for-bit). */
  def ngramJaccardPairs(docs: DataFrame, idCol: Column, textCol: Column,
                        blockCol: Column, n: Int = 3,
                        threshold: Double = 0.3,
                        maxDf: Option[Int] = None): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (zero-overlap-drop soundness)")
    // postings built WITHOUT array lambdas: posexplode evaluates the
    // tokenizer ONCE per doc (Generate is an optimizer barrier), n-grams
    // form via lead() windows over token position — a slice lambda would
    // re-run the regex split per n-gram index (measured: that inlining is
    // O(words²) splits/doc and was 90% of this operator's runtime)
    val toks = docs.select(idCol.as("id"), blockCol.as("block"),
      posexplode(filter(split(lower(textCol), "\\s+"),
        t => length(t) > 0)).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val grams = (1 until n).foldLeft(toks) { (df, i) =>
      df.withColumn(s"_t$i", lead(col("tok"), i).over(w))
    }
    val gramStr = concat_ws(" ", col("tok") +: (1 until n).map(i => col(s"_t$i")): _*)
    val postings = grams.filter(col(s"_t${n - 1}").isNotNull)
      .select(col("id"), col("block"), shingleHash(gramStr).as("h"))
      .distinct()
    val sizes = postings.groupBy("id").agg(count(lit(1)).as("sz"))
    val filtered = maxDf match {
      case Some(cap) =>
        val dfW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("block"), col("h"))
        postings.withColumn("_df", count(lit(1)).over(dfW))
          .filter(col("_df") <= cap).drop("_df")
      case None => postings
    }
    val inter = filtered.as("x").join(filtered.as("y"),
        col("x.block") === col("y.block") && col("x.h") === col("y.h") &&
          col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------- embedding cosine ----------------

  /** Embedding-cosine near-dup pairs within a blocking key (brute force
    * within block; for unblocked corpora use SimilaritySearch.lshBuckets
    * as the pre-filter). */
  def cosineNearDups(embs: DataFrame, idCol: Column, vecCol: Column,
                     blockCol: Column, threshold: Double = 0.95): DataFrame = {
    import graft.functions.VectorFunctions
    // unit-normalize per ROW (below the join); per-pair cosine is then one
    // dot pass — see VectorFunctions.unit scaladoc
    val e = embs.select(idCol.as("id"), blockCol.as("block"),
        VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    e.as("x").join(e.as("y"),
        col("x.block") === col("y.block") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        VectorFunctions.dot(col("x.u"), col("y.u")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---------------- connected components (dup groups) ----------------

  /**
   * Connected components over an undirected edge list (a_id, b_id) →
   * (id, component) where component = min reachable id. Iterative
   * small-label propagation: each round joins current labels across edges
   * and keeps the min; converges in O(diameter) rounds (dup clusters are
   * near-cliques → 2-3 rounds). `maxIter` bounds runaway chains; each
   * round is one shuffle. At 100 TB checkpoint every few rounds to cut
   * lineage (done here via localCheckpoint).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val sym = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val viaEdges = sym
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"))
      val next = labels.select(col("id"), col("component")).union(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), Seq("id"))
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      iter += 1
    }
    labels
  }
}
