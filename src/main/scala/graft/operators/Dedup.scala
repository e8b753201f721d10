package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Deduplication operators for large-scale document corpora
 * (beyond-reference: the LLM-data-pipeline generalization the reference's
 * ER blocking+similarity machinery points at — SURVEY §7.5; reference
 * analogues: blocking entity_resolution.py:287-294, Jaccard :157-164).
 * Algorithms are the published classics: MinHash resemblance sketching
 * (Broder, 1997), banded LSH (Indyk-Motwani family), SimHash random
 * hyperplane rounding (Charikar, 2002), prefix/df-capped set-similarity
 * joins (the ppjoin family of Chaudhuri/Xiao et al.).
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

  import graft.functions.{Md5Prefix32, ShingleHashes, SortedIntersectCount, WordNgramHashes}
  import org.apache.spark.sql.graftshim.GraftShim

  /** Multiset of Md5Prefix32 hashes of every `n`-char shingle of
    * lower(text), as ONE codegen expression (see [[ShingleHashes]]) —
    * value-identical to hashing charShingles' output, duplicates kept
    * (downstream min/collect_set are duplicate-insensitive). */
  def shingleHashes(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashes(GraftShim.expr(lower(text)), n))

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
    * numHashes× more scan time for nothing). Computed by the native
    * [[graft.functions.Md5Prefix32]] expression — digest → long directly,
    * bit-identical to `conv(substring(md5(s),1,8),16,10)` (which the DuckDB
    * oracles still spell), ~3× cheaper on the shingle scan. */
  def shingleHash(shingle: Column): Column =
    GraftShim.column(Md5Prefix32(GraftShim.expr(shingle)))

  /** Affine permutation i of a base hash: h → (h·(2i+1) + b_i) mod p.
    * Factors stay < 2^41 — exact in long arithmetic on every engine. */
  def permute(h: Column, i: Int): Column =
    pmod(h * (2L * i + 1) + (i * 2654435761L) % MinhashPrime,
      lit(MinhashPrime))

  /**
   * MinHash signatures as a DataFrame: docs(idCol, textCol) →
   * (id, sig array<long> of length numHashes).
   *
   * Plan shape — ONE scan-local codegen expression
   * ([[graft.functions.MinhashSignature]]): hash every shingle once,
   * fold the numHashes affine minima in place. No explode, no
   * aggregation, NO SHUFFLE — the operator is a projection over the scan
   * (two earlier shapes: nested array lambdas re-evaluated md5 per
   * permutation under CollapseProject; explode + min-aggregates fixed
   * that but paid a groupBy shuffle to reassemble per-doc rows).
   * Null text → no row (explode-form contract). Values are bit-identical
   * to both earlier forms and the DuckDB oracles.
   */
  def minhashSignatures(docs: DataFrame, idCol: Column, textCol: Column,
                        shingleSize: Int, numHashes: Int): DataFrame =
    docs
      // empty text hashes to ONE shingle (of ""), which would make all
      // empty docs mutual near-dups; every oracle filters len(text) > 0
      .filter(length(textCol) > 0)
      .select(idCol.as("id"),
        GraftShim.column(graft.functions.MinhashSignature(
          GraftShim.expr(lower(textCol)), shingleSize, numHashes)).as("sig"))
      .filter(col("sig").isNotNull)

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
    val (result, docState) = minhashNearDupsStages(docs, idCol, textCol,
      shingleSize, numHashes, bands, threshold, maxBucketSize)
    // Materialize the (corpus-tiny) result eagerly, then release the
    // persisted intermediate — otherwise every call leaks a cached frame
    // into the session for its remaining lifetime.
    val out = result.localCheckpoint(true)
    docState.unpersist()
    out
  }

  /** The un-materialized LSH pipeline: (result, persisted docState).
    * [[minhashNearDups]] checkpoints the result and releases the cache;
    * `graft.Plans` explains the result directly — the pipeline plan a
    * post-checkpoint `.explain` hides behind an RDD scan. Callers other
    * than `minhashNearDups` must unpersist docState themselves. */
  private[graft] def minhashNearDupsStages(
      docs: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int, numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int): (DataFrame, DataFrame) = {
    // persist: docState feeds banding + 2 est-joins + 2 verify-joins;
    // without it Spark re-runs the scan per use (different join keys → no
    // exchange reuse). MEMORY_AND_DISK: ~|text| longs + numHashes longs
    // per doc — far smaller than re-scanning.
    val docState = minhashDocState(docs, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (nearDupPairsFromState(docState, numHashes, bands, threshold,
      maxBucketSize), docState)
  }

  /** The band → bucket-cap → candidate-pair → two-phase-verify pipeline
    * over an already-materialized per-doc state frame (the output of
    * [[minhashStateTable]]). The caller owns the state frame's lifecycle
    * (persist/checkpoint) — it is consumed by the banding pass plus four
    * verify joins. */
  private[graft] def nearDupPairsFromState(docState: DataFrame,
      numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int): DataFrame =
    verifyPairs(candidatePairsFromState(docState, numHashes, bands,
      maxBucketSize), docState, numHashes, threshold)

  /** The capped-band candidate envelope shared by [[minhashNearDups]]
    * and [[containmentPairs]]: band the state, self-join within
    * (band, key) buckets, a < b, distinct — ONE definition so the two
    * operators' candidate semantics cannot drift. */
  private def candidatePairsFromState(docState: DataFrame, numHashes: Int,
      bands: Int, maxBucketSize: Int): DataFrame = {
    val banded = cappedBands(docState, numHashes, bands, maxBucketSize)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
  }

  /**
   * Asymmetric near-duplicate detection: CONTAINMENT
   * C(A,B) = |A∩B| / min(|A|,|B|) catches subset relations — quotes,
   * doc-inside-doc inclusions, boilerplate-wrapped copies — that
   * symmetric Jaccard provably misses (a doc fully contained in one 4×
   * its size has J ≤ 0.25 but C = 1; Broder 1997 defines both for
   * exactly this reason). Candidates come from the SAME capped LSH
   * bands as [[minhashNearDups]]; verification is the exact merge-walk
   * intersect with NO signature-agreement prune — that gate estimates
   * JACCARD and would drop exactly the high-containment/low-jaccard
   * pairs this operator exists to surface. Returns
   * (a_id, b_id, containment, jaccard) for containment ≥ minContainment.
   *
   * Same scale envelope as the near-dup pipeline: one scan into doc
   * state, capped band self-join, verification only on candidates.
   * LSH recall for contained-but-dissimilar pairs is inherently lower
   * than for near-dups (the contained doc's minima are a subset draw) —
   * the operating point is tunable with more bands, measurable with a
   * q185-style harness swapped to containment ground truth.
   */
  def containmentPairs(docs: DataFrame, idCol: Column, textCol: Column,
                       shingleSize: Int = 5, numHashes: Int = 16,
                       bands: Int = 8, minContainment: Double = 0.5,
                       maxBucketSize: Int = 100): DataFrame = {
    // persist-use-free, the minhashNearDups discipline: an eager
    // localCheckpoint here would pin the corpus-sized state frame for
    // the session's lifetime (the result below references it lazily)
    val docState = minhashDocState(docs, idCol, textCol, shingleSize,
      numHashes).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = candidatePairsFromState(docState, numHashes, bands,
      maxBucketSize)
    val withSets = cand
      .join(docState.select(col("id").as("a_id"), col("hs").as("a_hs"),
        col("sz").as("a_sz")), "a_id")
      .join(docState.select(col("id").as("b_id"), col("hs").as("b_hs"),
        col("sz").as("b_sz")), "b_id")
    val inter = GraftShim.column(SortedIntersectCount(
      GraftShim.expr(col("a_hs")), GraftShim.expr(col("b_hs")))).cast("double")
    val out = withSets
      .withColumn("_i", inter)
      .select(col("a_id"), col("b_id"),
        (col("_i") / least(col("a_sz"), col("b_sz"))).as("containment"),
        (col("_i") / (col("a_sz") + col("b_sz") - col("_i"))).as("jaccard"))
      .filter(col("containment") >= minContainment)
      .localCheckpoint(true)
    docState.unpersist()
    out
  }

  /** The three materialize-once dedup artifacts, each already
    * materialized (checkpointed) and parquet-writable. */
  final case class NearDupArtifacts(signatures: DataFrame, edges: DataFrame,
                                    labels: DataFrame)

  /**
   * Materialize-once near-dup artifacts: ONE pass over the corpus text
   * produces the per-doc signature table, the verified near-dup edge
   * list (a_id, b_id, jaccard), and the connected-component labels
   * (id, component) — each checkpointed, parquet-writable, and derived
   * from its predecessor WITHOUT re-reading the text.
   *
   * This is the production shape for a corpus that feeds many dedup
   * consumers: the declared q43/q75/q107/q115/q122/q124/q127 family is
   * deliberately per-query standalone (each re-runs the LSH pipeline so
   * the driver can gate it in isolation), but a real 100 TB pipeline
   * computes signatures/edges/labels ONCE per corpus build, writes all
   * three, and fans out — canonical pick, census, leakage-safe split,
   * and every nightly [[incrementalNearDupsFromState]] ingest read the
   * stored frames (pay for the delta, not the corpus). q130 drives
   * exactly that: labels written to parquet, read back, and consumed by
   * the q127 corpus materialization.
   */
  def nearDupArtifacts(docs: DataFrame, idCol: Column, textCol: Column,
                       shingleSize: Int = 5, numHashes: Int = 16,
                       bands: Int = 4, threshold: Double = 0.5,
                       maxBucketSize: Int = 100,
                       maxIter: Int = 10): NearDupArtifacts =
    nearDupArtifactsFromState(
      minhashStateTable(docs, idCol, textCol, shingleSize, numHashes)
        .localCheckpoint(true),
      numHashes, bands, threshold, maxBucketSize, maxIter)

  /** [[nearDupArtifacts]] with the signature table supplied (typically
    * read back from parquet — the corpus text is never re-hashed).
    * `signatures` must already be materialized (checkpointed or a stored
    * table); it is returned unchanged as the first artifact. */
  def nearDupArtifactsFromState(signatures: DataFrame, numHashes: Int = 16,
                                bands: Int = 4, threshold: Double = 0.5,
                                maxBucketSize: Int = 100,
                                maxIter: Int = 10): NearDupArtifacts = {
    val edges = nearDupPairsFromState(signatures, numHashes, bands,
      threshold, maxBucketSize).localCheckpoint(true)
    val labels = connectedComponents(edges.select(col("a_id"), col("b_id")),
      maxIter)
    NearDupArtifacts(signatures, edges, labels)
  }

  /** Per-doc minhash state (id [+ extras], hs, sz, sig): ONE scan-local
    * expression builds everything per doc (MinhashDocState) — each
    * shingle hashed once, the sorted distinct hash set (verify input)
    * and the numHashes signature minima folded in the same pass; a pure
    * projection over the scan, NO shuffle. Two earlier shapes at sf0.1:
    * corpus scanned+hashed twice through an interpreted transform()
    * lambda + array_intersect verify (11.9s + 5.9s + 16.1s of a 23.5s
    * total); then explode + collect_set + min-aggregates, which fixed
    * the interpretation but shuffled every per-doc hash set through a
    * groupBy just to reassemble rows that were never split (5.1s).
    * The 32-bit hash space makes per-doc collisions (~300 items) a
    * ≤1e-5 event computed IDENTICALLY by the oracle (md5, portable). */
  private def minhashDocState(docs: DataFrame, idCol: Column, textCol: Column,
                              shingleSize: Int, numHashes: Int,
                              extra: Seq[(String, Column)] = Nil): DataFrame =
    docs
      // same empty-text exclusion as minhashSignatures (oracle parity)
      .filter(length(textCol) > 0)
      .select(Seq(idCol.as("id")) ++
        extra.map { case (n, c) => c.as(n) } :+
        GraftShim.column(graft.functions.MinhashDocState(
          GraftShim.expr(lower(textCol)), shingleSize, numHashes)).as("st"): _*)
      .filter(col("st").isNotNull)
      .select(Seq(col("id")) ++ extra.map { case (n, _) => col(n) } ++
        Seq(col("st.hs").as("hs"), col("st.sz").as("sz"),
          col("st.sig").as("sig")): _*)

  /** Banded (id [, carry], band, key) rows with the bucket-size skew cap
    * applied: the pair join emits O(sz²) rows per bucket, so one
    * boilerplate bucket of 1k docs costs 500k verifications; measured at
    * sf0.1 the cap is the difference between ~5s and ~8min. The window
    * count costs one shuffle, reused by the join's partitioning. */
  private def cappedBands(docState: DataFrame, numHashes: Int, bands: Int,
                          maxBucketSize: Int,
                          carry: Seq[String] = Nil): DataFrame = {
    val banded = docState
      .select(Seq(col("id")) ++ carry.map(col) :+
        explode(lshBandKeys(col("sig"), numHashes, bands)).as("bk"): _*)
      .select(Seq(col("id")) ++ carry.map(col) ++
        Seq(col("bk.band").as("band"), col("bk.key").as("key")): _*)
    val bucketN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key"))
    banded
      .withColumn("_sz", count(lit(1)).over(bucketN))
      .filter(col("_sz") <= maxBucketSize)
      .drop("_sz")
  }

  /** Two-phase verify of candidate (a_id, b_id [, carry]) pairs:
    * (1) signature-agreement estimate — numHashes long compares
    * (PositionalEqCount, codegen) — prunes the bulk of band-collision
    * noise before touching shingle sets; the gate
    * (est ≥ threshold − 1/numHashes) makes recall approximate at the
    * margin, inherent to LSH and bit-reproduced by the oracle;
    * (2) exact Jaccard via one merge walk per pair (sets pre-sorted;
    * |∪| = |a|+|b|−|∩|, no second walk — same count as
    * size(array_intersect(..))). Keeps pairs with jaccard ≥ threshold. */
  private def verifyPairs(cand: DataFrame, docState: DataFrame,
                          numHashes: Int, threshold: Double,
                          carry: Seq[String] = Nil): DataFrame = {
    val sigEst = GraftShim.column(graft.functions.PositionalEqCount(
      GraftShim.expr(col("a_sig")), GraftShim.expr(col("b_sig"))))
      .cast("double") / numHashes
    val estGate = threshold - 1.0 / numHashes
    val withSigs = cand
      .join(docState.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(docState.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("_est", sigEst)
      .filter(col("_est") >= estGate)
      .select("a_id", ("b_id" +: carry): _*)
    val withSets = withSigs
      .join(docState.select(col("id").as("a_id"), col("hs").as("a_hs"),
        col("sz").as("a_sz")), "a_id")
      .join(docState.select(col("id").as("b_id"), col("hs").as("b_hs"),
        col("sz").as("b_sz")), "b_id")
    val inter = GraftShim.column(SortedIntersectCount(
      GraftShim.expr(col("a_hs")), GraftShim.expr(col("b_hs")))).cast("double")
    withSets.select(Seq(col("a_id")) ++ carry.map(col) ++
        Seq(col("b_id"),
          (inter / (col("a_sz") + col("b_sz") - inter)).as("jaccard")): _*)
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Incremental (delta) near-dup detection: match a NEW batch of
   * documents against the standing corpus and against itself, never
   * corpus-vs-corpus — the production dedup shape at 100 TB, where the
   * corpus was already deduplicated in earlier runs and re-pairing it
   * with itself would redo the full quadratic work on every ingest.
   *
   * Returns (a_id, a_side, b_id, jaccard) with `b_id` always the batch
   * document and `a_id` its existing near-duplicate: a corpus doc
   * (`a_side` = 'corpus', any id order) or an earlier batch doc
   * (`a_side` = 'batch', a_id < b_id). Dropping every `b_id` in the
   * result (or linking it to a_id's cluster) keeps the corpus dedup
   * invariant after the merge. Ids must be disjoint across sides.
   *
   * Plan shape: both sides build signatures scan-locally; at production
   * scale use [[incrementalNearDupsFromState]] with a persisted
   * [[minhashStateTable]] so the corpus side reads stored signatures
   * instead of re-hashing text. Banding/bucket-cap run over the union so
   * cap semantics
   * match [[minhashNearDups]]; the pair join keys one side to
   * batch-only bands, so bucket work is proportional to the DELTA, not
   * the corpus.
   */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame,
                          idCol: Column, textCol: Column,
                          shingleSize: Int = 5, numHashes: Int = 16,
                          bands: Int = 4, threshold: Double = 0.5,
                          maxBucketSize: Int = 100): DataFrame =
    incrementalNearDupsFromState(
      minhashStateTable(corpus, idCol, textCol, shingleSize, numHashes),
      batch, idCol, textCol, shingleSize, numHashes, bands, threshold,
      maxBucketSize)

  /**
   * The per-doc minhash state frame (id, hs, sz, sig) in persistable
   * form — the "stored signature table" of the incremental-dedup
   * production shape. Write this once per corpus build (it is a pure
   * scan-local projection: one pass over the text, no shuffle) and feed
   * it back through [[incrementalNearDupsFromState]] on every ingest, so
   * nightly runs never re-shingle the 100 TB corpus. Columns are plain
   * arrays/ints: parquet-roundtrip-safe (proven by `DedupSpec`).
   * `shingleSize`/`numHashes` are baked into the rows — the reader must
   * pass the same values or the band keys won't align.
   */
  def minhashStateTable(docs: DataFrame, idCol: Column, textCol: Column,
                        shingleSize: Int = 5, numHashes: Int = 16): DataFrame =
    minhashDocState(docs, idCol, textCol, shingleSize, numHashes)

  /**
   * LSH parameter tuning harness: for each banding configuration over
   * ONE shared signature pass, the candidate-pair precision/recall
   * against exact-Jaccard ground truth at `threshold` — the operating
   * curve a dedup owner reads before committing (bands, rows) at
   * corpus scale. Output: (bands, n_candidates, n_true_pairs,
   * true_positives, precision, recall), one row per configuration.
   *
   * Ground truth is ALL-PAIRS exact Jaccard — by contract this runs on
   * a SAMPLE (the q185 query caps at doc_id % 10 = 0 and says so);
   * the harness is tuning instrumentation, never the production dedup
   * path. Signatures and hash sets are computed once (one scan, one
   * checkpoint) and every configuration re-bands the same state —
   * adding a configuration costs one k-scale band self-join, not a
   * corpus re-hash.
   */
  def lshOperatingCurve(docs: DataFrame, idCol: Column, textCol: Column,
                        shingleSize: Int = 5, numHashes: Int = 16,
                        bandsConfigs: Seq[Int] = Seq(8, 4),
                        threshold: Double = 0.25,
                        maxDocs: Long = 100000L): DataFrame = {
    require(bandsConfigs.nonEmpty, "need at least one bands configuration")
    val st = minhashDocState(docs, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // enforce the sample-only contract — ground truth below is ALL-PAIRS
    // exact Jaccard; an unsampled corpus would silently go O(n^2). The
    // count is over the already-checkpointed state frame (no re-scan).
    val nDocs = st.count()
    require(nDocs <= maxDocs,
      s"lshOperatingCurve is tuning instrumentation over a SAMPLE: got " +
        s"$nDocs docs > maxDocs=$maxDocs (all-pairs ground truth is " +
        s"quadratic). Sample the corpus first, or raise maxDocs knowingly.")
    val a = st.select(col("id").as("a_id"), col("hs").as("a_hs"),
      col("sz").as("a_sz"))
    val b = st.select(col("id").as("b_id"), col("hs").as("b_hs"),
      col("sz").as("b_sz"))
    val inter = GraftShim.column(SortedIntersectCount(
      GraftShim.expr(col("a_hs")), GraftShim.expr(col("b_hs")))).cast("double")
    // persisted, not checkpointed: this is the O(n^2) all-pairs frame,
    // the largest intermediate in the file — it must be releasable once
    // the per-config aggregate below has materialized
    val truth = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (inter / (col("a_sz") + col("b_sz") - inter) >= threshold)
          .as("is_dup"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perConfig = bandsConfigs.map { bands =>
      val bk = st.select(col("id"),
        explode(lshBandKeys(col("sig"), numHashes, bands)).as("bk"))
      bk.as("x")
        .join(bk.as("y"),
          col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
        .join(truth, Seq("a_id", "b_id"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(col("is_dup").cast("long")), lit(0L))
            .as("true_positives"))
        .withColumn("bands", lit(bands))
    }.reduce(_ unionByName _)
    val totals = truth.agg(
      coalesce(sum(col("is_dup").cast("long")), lit(0L)).as("n_true_pairs"))
    // the tiny per-config result materializes eagerly; both heavyweight
    // inputs release (the file's free() discipline — a leaked all-pairs
    // frame is exactly the "contiguous bench regression cluster" shape)
    val out = perConfig.crossJoin(broadcast(totals))
      .select(col("bands"), col("n_candidates"), col("n_true_pairs"),
        col("true_positives"),
        round(col("true_positives") / col("n_candidates"), 6)
          .as("precision"),
        round(col("true_positives") / col("n_true_pairs"), 6).as("recall"))
      .localCheckpoint(true)
    st.unpersist()
    truth.unpersist()
    out
  }

  /**
   * [[incrementalNearDups]] with the corpus side supplied as a stored
   * signature table (the output of [[minhashStateTable]], typically read
   * back from parquet) instead of raw text — the corpus text is never
   * re-hashed. Semantics and output are identical to
   * [[incrementalNearDups]] on the original corpus frame.
   */
  def incrementalNearDupsFromState(corpusState: DataFrame, batch: DataFrame,
                                   idCol: Column, textCol: Column,
                                   shingleSize: Int = 5, numHashes: Int = 16,
                                   bands: Int = 4, threshold: Double = 0.5,
                                   maxBucketSize: Int = 100): DataFrame = {
    val (result, docState) = incrementalNearDupsStages(corpusState, batch,
      idCol, textCol, shingleSize, numHashes, bands, threshold, maxBucketSize)
    val out = result.localCheckpoint(true)
    docState.unpersist()
    out
  }

  /** Un-materialized incremental pipeline: (result, persisted docState) —
    * same split as [[minhashNearDupsStages]], for plan inspection. */
  private[graft] def incrementalNearDupsStages(
      corpusState: DataFrame, batch: DataFrame, idCol: Column,
      textCol: Column, shingleSize: Int, numHashes: Int, bands: Int,
      threshold: Double, maxBucketSize: Int): (DataFrame, DataFrame) = {
    val corpusSide = corpusState.select(col("id"), col("hs"), col("sz"),
      col("sig")).withColumn("side", lit("corpus"))
    val batchSide = minhashDocState(batch, idCol, textCol, shingleSize,
      numHashes, extra = Seq("side" -> lit("batch")))
    val docState = corpusSide.unionByName(batchSide)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = cappedBands(docState, numHashes, bands, maxBucketSize,
      carry = Seq("side"))
    // the incremental pair space: y is batch-only; x is a corpus doc
    // (any id order) or an earlier batch doc (x.id < y.id) — never
    // corpus-vs-corpus
    val bandedBatch = banded.filter(col("side") === "batch")
    val cand = banded.as("x").join(bandedBatch.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          (col("x.side") === "corpus" || col("x.id") < col("y.id")))
      .select(col("x.id").as("a_id"), col("x.side").as("a_side"),
        col("y.id").as("b_id")).distinct()
    (verifyPairs(cand, docState.drop("side"), numHashes, threshold,
      carry = Seq("a_side")), docState)
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
      .select(Seq(idCol.as("id"), explode_outer(tokensCol).as("t"),
        // distinguishes explode_outer's synthetic empty-doc row (must
        // contribute 0, matching the expression form's empty aggregate)
        // from a GENUINE null element (which the expression form scores
        // -1 per bit via its otherwise branch) — without this the two
        // forms disagree on any doc whose token array contains nulls
        (tokensCol.isNull || size(tokensCol) <= 0).as("_empty")) ++
        extra.map { case (n, c) => c.as(n) }: _*)
      .withColumn("v",
        conv(substring(hashStr(col("t")), 1, hexDigits), 16, 10).cast("long"))
    val sums = (0 until bits).map { j =>
      val shift = 4 * (hexDigits - 1 - j / 4) + (j % 4)
      sum(when(col("_empty"), 0)
        .when(col("v").isNull, -1)
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

  /** Hamming distance between two fingerprints over the low `bits`
    * bits (bits=32 = the full int width — the mask the signature always
    * advertised but previously ignored). */
  def hammingDist(a: Column, b: Column, bits: Int = 32): Column = {
    require(bits >= 1 && bits <= 32, "bits must be in [1, 32]")
    val mask = if (bits == 32) -1 else (1 << bits) - 1
    bit_count(a.bitwiseXOR(b).bitwiseAND(lit(mask))).cast("int")
  }

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
    // materialize the (corpus-tiny) pair result, then release the
    // fingerprint checkpoint — returning the lazy join would pin fp for
    // the rest of the session (the checkpoint-hygiene rule every operator
    // in this file follows)
    val out = fp.as("x").join(fp.as("y"),
        col("x.block") === col("y.block") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        hammingDist(col("x.fp"), col("y.fp"), bits).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .localCheckpoint(true)
    free(fp)
    out
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
    // postings as ONE scan-local codegen expression (WordNgramHashes):
    // hash every space-joined n-gram of the whitespace tokens directly from
    // the text. Two earlier shapes both lost: a slice() lambda re-ran the
    // regex split per n-gram index (O(words²) splits/doc), and the
    // posexplode + lead()-window form paid a full per-doc window SHUFFLE
    // just to line up adjacent tokens. Gram hashes are bit-identical to
    // hashing concat_ws(' ', tok_i..tok_{i+n-1}) — the oracle's spelling.
    val postings = docs.select(idCol.as("id"), blockCol.as("block"),
        explode(GraftShim.column(WordNgramHashes(
          GraftShim.expr(lower(textCol)), n))).as("h"))
      .distinct()
    val filtered = maxDf match {
      case Some(cap) =>
        val dfW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("block"), col("h"))
        postings.withColumn("_df", count(lit(1)).over(dfW))
          .filter(col("_df") <= cap).drop("_df")
      case None => postings
    }
    // sizes from the SAME capped postings the intersection sees: a
    // dropped hot gram is nonexistent on BOTH sides of J (the ppjoin
    // convention). Sizing from uncapped postings would deflate J for
    // every doc carrying boilerplate grams and silently drop pairs
    // whose capped-consistent Jaccard clears the threshold.
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("sz"))
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

  /**
   * Semantic (embedding) near-dup pairs WITHOUT a label column:
   * IVF-blocked cosine dedup. [[cosineNearDups]] needs a natural
   * blocking key; when none exists, assign every vector to its
   * max-cosine coarse centroid ([[SimilaritySearch.ivfCentroids]] —
   * deterministic, no trained model) and pair only within a list.
   * Recall is approximate at list boundaries (a near-dup pair split
   * across two lists is missed) — the same contract as LSH banding;
   * raise K-per-vector by lowering `modulus` to trade cost for recall.
   *
   * Scale shape: centroids broadcast (K ≈ √N), argmax assignment is a
   * partial agg carrying the unit vector once, `maxListSize` drops
   * degenerate lists BEFORE the quadratic pair join (cap semantics as
   * [[minhashNearDups]]'s `maxBucketSize`), pair dot runs inside
   * codegen. List sizes ~N/K ⇒ pair work ~N²/K, never N².
   */
  def ivfCosineNearDups(embs: DataFrame, idCol: Column, vecCol: Column,
                        modulus: Int, threshold: Double = 0.9,
                        maxListSize: Int = 10000): DataFrame = {
    import graft.functions.VectorFunctions
    val cents = SimilaritySearch.ivfCentroids(embs, idCol, vecCol, modulus)
    // shared kernel (SimilaritySearch.assignWithVector): argmax with
    // lowest-cid tiebreak, unit vector riding the same aggregate
    val assigned = SimilaritySearch.assignWithVector(cents, embs, idCol, vecCol)
    val capped = SimilaritySearch.capLists(assigned, maxListSize)
    capped.as("x").join(capped.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.cid").as("cid"),
        VectorFunctions.dot(col("x.u"), col("y.u")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---------------- connected components (dup groups) ----------------

  /**
   * Connected components over an undirected edge list (a_id, b_id) →
   * (id, component) where component = min reachable id. Iterative
   * min-label propagation WITH POINTER JUMPING: each round takes the min
   * over (own label, neighbors' labels, label-of-own-label). The jump
   * term doubles the effective propagation distance per round, so
   * convergence is O(log diameter) shuffles instead of O(diameter) —
   * measured on the sf0.1 near-dup graph (diameter ~8): 8 rounds → 4,
   * and each round is one fewer driver action than before. The fixpoint
   * is identical (min over the reachable set either way). `maxIter`
   * bounds runaway chains. At 100 TB: localCheckpoint per round (done
   * here) cuts lineage; labels frames are (id, component) pairs only.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 10,
                          driverEdgeCap: Long = 1L << 20): DataFrame = {
    // The engine-wide AQE minPartitionSize=16k exists for CPU-heavy
    // small-byte stages (Tables.tune scaladoc); label propagation is the
    // opposite profile — trivial CPU over tiny frames, where 32-way
    // shuffles are pure task-scheduling overhead per round. Scope a
    // coarser coalesce target to THIS loop's actions (checkpoint/count
    // run eagerly inside it), restoring the session value after.
    val session = edges.sparkSession
    val confKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val oldMin = session.conf.getOption(confKey)
    session.conf.set(confKey, "8m")
    try connectedComponentsImpl(edges, maxIter, driverEdgeCap)
    finally oldMin match {
      case Some(v) => session.conf.set(confKey, v)
      case None => session.conf.unset(confKey)
    }
  }

  /**
   * Two-phase CC: one distributed contraction, then a driver union-find
   * on the residual COMPONENT graph when it is small enough (the
   * two-phase finish of the MapReduce-CC literature — Kiveris et al.'s
   * "Connected Components in MapReduce and Beyond" alternate rounds
   * until small, then finish centrally).
   *
   * Phase 1 (distributed): seed labels with min(self, neighbors) — one
   * groupBy — then contract each edge (u,v) to (comp(u), comp(v)). On
   * near-dup graphs (clique-heavy: LSH components are mutual-similarity
   * clusters) the seeded init already collapses each clique to its min,
   * so the residual holds only inter-label links: orders of magnitude
   * smaller than the input (measured at sf0.1: 22650 edges → <2k
   * residual pairs).
   *
   * Phase 2: if the residual fits `driverEdgeCap` (default 2^20 pairs),
   * finish with union-find (min-id representative — the same fixpoint
   * the iterative loop reaches) and broadcast the root mapping back.
   * The pairs stream to the driver partition-at-a-time
   * (toLocalIterator), so peak driver heap is the union-find map over
   * touched labels (boxed key/value entries: ~100 MB worst case at the
   * cap, typically far less — residuals measured ≪ cap) plus ONE
   * partition of rows, never a full cap-sized Row array. Otherwise fall
   * back to the pointer-jumping loop, whose O(log diameter) rounds are
   * the 100 TB-safe path. The driver never sees node-level data — only
   * label-level pairs, bounded by the cap.
   */
  /** Symmetrized edge list (src, dst) — both directions of every edge. */
  private[graft] def ccSym(e0: DataFrame): DataFrame =
    e0.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(e0.select(col("b_id").as("src"), col("a_id").as("dst")))

  /** Seeded label init: component₀ = min(self, neighbors) — one groupBy,
    * a full propagation round ahead of a `distinct()` init. */
  private[graft] def ccSeed(sym: DataFrame): DataFrame = sym
    .groupBy(col("src").as("id"))
    .agg(min(col("dst")).as("_mn"))
    .select(col("id"), least(col("id"), col("_mn")).as("component"))

  /** Residual COMPONENT graph: edges whose endpoints got different seed
    * labels, contracted to (label_a, label_b) pairs — the inter-clique
    * links phase 2 must still merge. */
  private[graft] def ccResidual(sym: DataFrame, labels0: DataFrame): DataFrame =
    sym
      .join(labels0.select(col("id").as("src"), col("component").as("ca")), "src")
      .join(labels0.select(col("id").as("dst"), col("component").as("cb")), "dst")
      .filter(col("ca") =!= col("cb"))
      .select(col("ca"), col("cb")).distinct()

  /** Free the blocks behind an eager localCheckpoint intermediate — see
    * [[GraftShim.freeLocalCheckpoint]]. Every checkpoint in the CC family
    * is released the moment its successor is materialized; without this a
    * long-lived session accumulates one pinned RDD per intermediate per
    * dedup run (memory pressure for whatever runs next — observed as a
    * contiguous bench regression cluster downstream of the CC queries). */
  private def free(df: DataFrame): Unit = GraftShim.freeLocalCheckpoint(df)

  private def connectedComponentsImpl(edges: DataFrame, maxIter: Int,
                                      driverEdgeCap: Long): DataFrame = {
    val e0 = edges.select(col("a_id"), col("b_id")).localCheckpoint()
    if (driverEdgeCap <= 0) return connectedComponentsLoop(e0, maxIter)
    // sym is NOT checkpointed: it is two trivial projections of the
    // already-checkpointed e0, so its two consumers (labels0, residual)
    // re-derive it for free — a checkpoint here would pay a full extra
    // materialization pass to save nothing
    val sym = ccSym(e0)
    val labels0 = ccSeed(sym).localCheckpoint()
    val residual = ccResidual(sym, labels0).localCheckpoint()
    // labels0 and residual are materialized — nothing references the raw
    // edge checkpoint anymore (except a fallback loop, which re-reads it
    // before any free happens there)
    if (residual.count() > driverEdgeCap) {
      val out = connectedComponentsLoop(e0, maxIter)
      free(labels0); free(residual)
      return out
    }
    free(e0)
    // driver union-find with min-id representatives over label pairs
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    val ord: Ordering[Any] =
      Ordering.comparatorToOrdering(new java.util.Comparator[Any] {
        def compare(a: Any, b: Any): Int =
          a.asInstanceOf[Comparable[Any]].compareTo(b)
      })
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    residual.toLocalIterator().forEachRemaining { row =>
      val (ra, rb) = (find(row.get(0)), find(row.get(1)))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val mapping = parent.keys.map(k => (k, find(k))).filter(p => p._1 != p._2).toSeq
    if (mapping.isEmpty) { free(residual); return labels0 }
    val spark = edges.sparkSession
    val compType = labels0.schema("component").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("component", compType),
      org.apache.spark.sql.types.StructField("_root", compType)))
    val mapDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        mapping.map(p => org.apache.spark.sql.Row(p._1, p._2)), 1), schema)
    // materialize the final (id, component) frame — tiny — so labels0
    // and residual can be released now instead of riding the session
    val out = labels0.join(broadcast(mapDf), Seq("component"), "left")
      .select(col("id"), coalesce(col("_root"), col("component")).as("component"))
      .localCheckpoint(true)
    free(labels0); free(residual)
    out
  }

  /** The pointer-jumping fallback. `e0` must already be the materialized
    * (localCheckpointed) (a_id, b_id) edge frame — the caller pays that
    * once so a fallback never re-runs the upstream (e.g. full-LSH)
    * pipeline; this loop frees it as soon as `sym` supersedes it. */
  private def connectedComponentsLoop(e0: DataFrame, maxIter: Int): DataFrame = {
    val sym = ccSym(e0).localCheckpoint()
    free(e0) // sym is materialized; the raw edge frame is done
    // seeded init: same single groupBy a distinct() init would cost, one
    // propagation round ahead
    var ckpt = ccSeed(sym).localCheckpoint()
    var labels = ckpt
    val idType = e0.schema("a_id").dataType
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // self rows carry the old label so the convergence check is a
      // filter over the SAME materialized frame — one heavy action per
      // round, not a second join+count
      val viaSelf = labels.select(col("id"), col("component"),
        col("component").as("_old"))
      val viaEdges = sym
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"),
          lit(null).cast(idType).as("_old"))
      // pointer jump: my label's current label
      val viaJump = labels.as("l")
        .join(labels.select(col("id").as("c2"), col("component").as("cc")),
          col("l.component") === col("c2"))
        .select(col("l.id").as("id"), col("cc").as("component"),
          lit(null).cast(idType).as("_old"))
      val next = viaSelf.union(viaEdges).union(viaJump)
        .groupBy("id").agg(min("component").as("component"),
          max("_old").as("_old"))
        .localCheckpoint()
      changed = next.filter(col("component") < col("_old")).count()
      free(ckpt) // superseded round — next is materialized
      ckpt = next
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    free(sym)
    labels
  }
}
