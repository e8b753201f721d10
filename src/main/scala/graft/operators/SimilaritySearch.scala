package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * Approximate/exact nearest-neighbor search over an embedding column
 * (beyond-reference LLM-pipeline operator — SURVEY §7.5; the reference's
 * similarity baseline scripts/evaluate.py:277-292 is the toy version).
 *
 * Scale notes (100 TB):
 *  - bruteForceTopK is a full scan + TakeOrderedAndProject: each partition
 *    keeps k rows, the driver merges — optimal for one-off queries, O(N·D)
 *    compute fanned across executors, no shuffle.
 *  - lshBuckets pre-partitions vectors into 2^planes hyperplane-sign
 *    buckets; repeated queries probe only matching buckets (bucket column
 *    → partition/Z-order key in storage). Planes are md5-derived ±1
 *    weights — deterministic, engine-portable, no stored model.
 *  - knnWithinBlock is the blocked all-pairs variant for "find each item's
 *    neighbors" jobs: quadratic ONLY within blocks — block first (LSH
 *    bucket, label, partition date), never all-pairs the corpus.
 */
object SimilaritySearch {

  /** Exact top-k by cosine against one query vector (literal). */
  def bruteForceTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      embs.select(idCol.as("id"), cosine(vecCol, q).as("cosine"))
        .filter(col("cosine").isNotNull),
      Seq(col("cosine").desc, col("id").asc), k)
  }

  /**
   * Hard-negative mining for contrastive/retrieval training — the
   * in-batch-random upgrade every dual-encoder pipeline runs
   * (Karpukhin et al. 2020, DPR §4.2: negatives NEAR the decision
   * boundary train far better than random draws, which q92 provides):
   * for each query vector, the `k` most-cosine-similar corpus vectors
   * whose `label` DIFFERS from the query's own.
   *
   * Returns (q_id, neg_id, cosine, neg_rank).
   *
   * Plan (mining-batch shape): the query batch broadcasts onto ONE
   * corpus scan — a |Q|·N pair projection with the cosine inside
   * whole-stage codegen — then a per-query top-k window. Brute force
   * is the right tool while |Q| is a training batch (hundreds); for
   * corpus-scale Q, mine through the stored IVF index instead
   * (q141/q143: probe lists bound the pair space per query).
   */
  def hardNegatives(corpus: DataFrame, idCol: Column, vecCol: Column,
                    labelCol: Column, queries: DataFrame, qId: Column,
                    qVec: Column, qLabel: Column, k: Int): DataFrame = {
    val q = broadcast(queries.select(qId.as("q_id"), qVec.as("_qv"),
      qLabel.as("_ql")))
    val pairs = corpus
      .select(idCol.as("neg_id"), vecCol.as("_v"), labelCol.as("_l"))
      .crossJoin(q)
      .filter(col("_l") =!= col("_ql"))
      .select(col("q_id"), col("neg_id"),
        graft.functions.VectorFunctions.cosine(col("_v"), col("_qv"))
          .as("cosine"))
      .filter(col("cosine").isNotNull)
    TopK.topKPerGroup(pairs, Seq(col("q_id")),
        Seq(col("cosine").desc, col("neg_id").asc), k, rankCol = "neg_rank")
      .select(col("q_id"), col("neg_id"), col("cosine"), col("neg_rank"))
  }

  /** Deterministic ±1 hyperplane weight for (plane, dim): parity of the
    * first md5 hex digit of "p:d". Portable to any md5-capable engine. */
  private def planeWeight(p: Int, d: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) % 2 == 0) 1 else -1
  }

  /** Column expression: LSH bucket id ∈ [0, 2^planes) from hyperplane
    * signs. Weights are baked as literals (planes × dims known at plan
    * time) so the whole thing codegens into the scan. */
  def lshBucket(vecCol: Column, dims: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = (0 until dims).map { d =>
        element_at(vecCol, d + 1).cast("double") * planeWeight(p, d)
      }.reduce(_ + _)
      when(dot > 0, 1 << p).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Assign every vector its LSH bucket. */
  def lshBuckets(embs: DataFrame, idCol: Column, vecCol: Column,
                 dims: Int, planes: Int = 8): DataFrame =
    embs.select(idCol.as("id"), vecCol.as("v"),
      lshBucket(vecCol, dims, planes).as("bucket"))

  /** ANN top-k: score only vectors in the query's bucket (single-probe;
    * multi-probe = union over neighbor buckets). */
  def lshTopK(embs: DataFrame, idCol: Column, vecCol: Column,
              query: Seq[Double], dims: Int, planes: Int, k: Int): DataFrame = {
    val qBucket = {
      var b = 0
      for (p <- 0 until planes) {
        val dot = (0 until dims).map(d => query(d) * planeWeight(p, d)).sum
        if (dot > 0) b |= (1 << p)
      }
      b
    }
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      embs.filter(lshBucket(vecCol, dims, planes) === qBucket)
        .select(idCol.as("id"), cosine(vecCol, q).as("cosine"))
        .filter(col("cosine").isNotNull),
      Seq(col("cosine").desc, col("id").asc), k)
  }

  // ---------------- IVF (inverted-file) coarse index ----------------

  /** Deterministic IVF coarse centroids: every `modulus`-th id,
    * unit-normalized → (cid, cu). Hash-free and engine-portable (no
    * trained model to ship); K scales with corpus size. At 100 TB the
    * centroid set stays driver-broadcastable (K ≈ √N « N). */
  def ivfCentroids(embs: DataFrame, idCol: Column, vecCol: Column,
                   modulus: Int): DataFrame =
    embs.filter(pmod(idCol, lit(modulus)) === 0)
      .select(idCol.as("cid"), graft.functions.VectorFunctions.unit(vecCol).as("cu"))
      .filter(col("cu").isNotNull)

  /**
   * IVF assignment: every vector → its max-cosine centroid.
   * (id, cid, cosine). Broadcast nested-loop against the (small) centroid
   * set, then an ARGMAX as a partial aggregation — max(struct(cos, -cid))
   * gives deterministic ties (lowest cid) and map-side combine, so the
   * shuffle carries one row per vector, not per (vector × centroid).
   * This is the IVF build step; the assignment column is the storage
   * partition key for repeated-query serving (probe nprobe lists only).
   */
  def ivfAssign(embs: DataFrame, idCol: Column, vecCol: Column,
                modulus: Int): DataFrame =
    assignAgainst(ivfCentroids(embs, idCol, vecCol, modulus),
      embs, idCol, vecCol)

  /** Max-cosine assignment of `embs` against an EXPLICIT centroid table
    * (cid, cu) — the shared kernel of the inline build ([[ivfAssign]]),
    * the delta append ([[ivfAppend]]), and the streaming maintenance
    * sink (`Streams.ivfAppendBatchWriter`). Broadcast NL join + argmax
    * partial agg: the shuffle carries one row per vector. */
  def assignAgainst(cents: DataFrame, embs: DataFrame,
                    idCol: Column, vecCol: Column): DataFrame = {
    val e = embs.select(idCol.as("id"),
        graft.functions.VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    e.join(broadcast(cents))
      .select(col("id"),
        struct(graft.functions.VectorFunctions.dot(col("u"), col("cu")).as("cos"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("id").agg(max(col("sc")).as("m"))
      .select(col("id"), (-col("m.ncid")).as("cid"), col("m.cos").as("cosine"))
  }

  /** The argmax-assignment kernel CARRYING the unit vector — the shared
    * form behind `Dedup.ivfCosineNearDups` and
    * `Corpus.decontaminateSemantic`, which need the unit vector
    * downstream for pair dots (it rides the same aggregate via
    * first(u), u being functionally dependent on id — one shuffle row
    * per vector instead of a re-join). (id, cid, u); same deterministic
    * lowest-cid tiebreak as [[assignAgainst]]. */
  private[operators] def assignWithVector(cents: DataFrame, embs: DataFrame,
                                          idCol: Column,
                                          vecCol: Column): DataFrame = {
    import graft.functions.VectorFunctions
    val e = embs.select(idCol.as("id"), VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    e.join(broadcast(cents))
      .select(col("id"), col("u"),
        struct(VectorFunctions.dot(col("u"), col("cu")).as("cos"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("id")
      .agg(max(col("sc")).as("m"), first(col("u")).as("u"))
      .select(col("id"), (-col("m.ncid")).as("cid"), col("u"))
  }

  /** Drop every member of a list larger than `maxListSize` BEFORE a
    * quadratic pair join (cap semantics as `minhashNearDups`'s
    * maxBucketSize) — shared by the same two call sites. NOTE this is a
    * RECALL trade: dropped lists' pairs are silently lost; callers
    * document cap non-bindingness at their gate SFs. */
  private[operators] def capLists(assigned: DataFrame,
                                  maxListSize: Int): DataFrame =
    assigned.withColumn("_sz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cid"))))
      .filter(col("_sz") <= maxListSize).drop("_sz")

  /**
   * Incremental IVF maintenance — the ANN twin of incremental dedup
   * (`Dedup.incrementalNearDupsFromState`): a vector delta joins a
   * STORED index by assigning only the NEW vectors against the stored
   * centroid table (held FIXED — the standard IVF maintenance contract;
   * re-training centroids is a deliberate full [[ivfIndex]] rebuild per
   * corpus version) and unioning the delta assignments onto the stored
   * assignment table. Work ∝ |delta|: the corpus is never re-read, never
   * re-assigned. When the fixed centroid set equals what a full rebuild
   * would derive, the appended index is bit-identical to the rebuild
   * (spec-gated; q134 drives it end-to-end against the q73 oracle).
   * At 100 TB the delta assignments land as new files in the
   * cid-partitioned assignment table — an append, not a rewrite.
   */
  def ivfAppend(index: IvfIndex, newEmbs: DataFrame, idCol: Column,
                vecCol: Column): IvfIndex =
    IvfIndex(index.centroids,
      index.assignments.unionByName(
        assignAgainst(index.centroids, newEmbs, idCol, vecCol)))

  /** The materialize-once IVF index artifacts: the broadcastable
    * centroid table (cid, cu — unit vectors) and the per-vector
    * assignment (id, cid, cosine), both parquet-writable. */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /**
   * IVF index build, the production shape for repeated-query serving
   * (the `Dedup.nearDupArtifacts` pattern for the ANN family): compute
   * centroids + assignments ONCE per corpus version, write both, and
   * have every search read the stored frames via [[ivfTopKFromIndex]] —
   * at 100 TB the assignment pass (the only full-corpus work) never
   * re-runs per query, and the stored assignment column is the storage
   * partition key that lets unprobed lists go entirely unread. q132
   * drives the parquet roundtrip against q73's inline-build oracle.
   */
  def ivfIndex(embs: DataFrame, idCol: Column, vecCol: Column,
               modulus: Int): IvfIndex =
    IvfIndex(ivfCentroids(embs, idCol, vecCol, modulus),
      ivfAssign(embs, idCol, vecCol, modulus))

  /** [[ivfTopK]] against a prebuilt (typically parquet-read) index:
    * probe the `nprobe` nearest centroid lists, score only their
    * members. No full-corpus pass — one broadcast of the probed cids,
    * one scan of the probed lists. */
  /** The query's `nprobe` nearest centroid lists — one tiny top-k over
    * the centroid table, shared by every IVF-family search. */
  private def probedCids(centroids: DataFrame, query: Seq[Double],
                         nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      centroids.select(col("cid"),
        graft.functions.VectorFunctions.dot(col("cu"), q).as("ccos")),
      Seq(col("ccos").desc, col("cid").asc), nprobe).select("cid")
  }

  def ivfTopKFromIndex(embs: DataFrame, idCol: Column, vecCol: Column,
                       index: IvfIndex, query: Seq[Double],
                       nprobe: Int, k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val probed = probedCids(index.centroids, query, nprobe)
    // members of the probed lists can be a large fraction of N — plain
    // equi-join (AQE broadcasts it when small); only `probed` (nprobe
    // rows) is hint-broadcast
    val members = index.assignments.join(broadcast(probed), "cid").select("id")
    val scored = embs.select(idCol.as("id"), cosine(vecCol, q).as("cosine"))
      .join(members, "id")
      .filter(col("cosine").isNotNull)
    TopK.globalTopK(scored, Seq(col("cosine").desc, col("id").asc), k)
  }

  /**
   * IVF search: score ONLY vectors whose centroid is among the query's
   * `nprobe` nearest centroids — the classic recall/cost dial. One
   * broadcast (probed cids), one scan of the probed lists; with
   * assignment as the storage partition key the unprobed lists are never
   * read (partition pruning). Builds the index inline — repeated-query
   * serving uses [[ivfIndex]] + [[ivfTopKFromIndex]] instead.
   */
  def ivfTopK(embs: DataFrame, idCol: Column, vecCol: Column,
              query: Seq[Double], modulus: Int, nprobe: Int, k: Int): DataFrame =
    ivfTopKFromIndex(embs, idCol, vecCol,
      ivfIndex(embs, idCol, vecCol, modulus), query, nprobe, k)

  // ---------------- IVF-PQ (probe lists + ADC within lists) ----------------

  /** PQ codebook: every `modulus`-th vector held RAW (L2 code space, the
    * q85 convention) as (cid, cv). Deterministic and engine-portable —
    * no trained k-means model to ship; k = N/modulus sub-centroids per
    * subspace (every codebook vector serves all m subspaces). */
  def pqCodebook(embs: DataFrame, idCol: Column, vecCol: Column,
                 modulus: Int): DataFrame =
    embs.filter(pmod(idCol, lit(modulus)) === 0)
      .select(idCol.as("cid"), vecCol.as("cv"))

  /** Squared L2 between subspace `s` (0-based, `subDim` wide) of two
    * vectors. (x−y)·(x−y) with each element widened to double BEFORE the
    * subtraction — float−float stays float32 and drifts off a double
    * oracle; multiplication (not pow) is bit-identical across engines. */
  private def subL2Sq(a: Column, b: Column, s: Column, subDim: Int): Column =
    graft.functions.VectorFunctions.sqDist(
      slice(a, s * subDim + 1, lit(subDim)),
      slice(b, s * subDim + 1, lit(subDim)))

  /**
   * PQ encoding: each vector → m one-byte-ish codes, one per `subDim`-wide
   * subspace — the per-subspace L2 argmin over the BROADCAST codebook.
   * Encoding is scan-local (broadcast NL + argmax partial agg: the
   * shuffle carries one row per (vector, subspace), never per candidate
   * centroid — the q72 assignAgainst discipline, improving on a window
   * rank). Ties break to the lowest cid via max(struct(−d, −cid)).
   * Returns (id, s, cid).
   */
  def pqCodes(embs: DataFrame, idCol: Column, vecCol: Column,
              codebook: DataFrame, m: Int, subDim: Int): DataFrame = {
    val e = embs.select(idCol.as("id"), vecCol.as("v"),
      explode(sequence(lit(0), lit(m - 1))).as("s"))
    e.join(broadcast(codebook))
      .select(col("id"), col("s"),
        struct((-subL2Sq(col("v"), col("cv"), col("s"), subDim)).as("nd"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("id", "s").agg(max(col("sc")).as("mx"))
      .select(col("id"), col("s"), (-col("mx.ncid")).as("cid"))
  }

  /**
   * IVF-PQ search — the production ANN composition (Jégou et al., PAMI
   * 2011; the FAISS `IndexIVFPQ` shape): the coarse quantizer picks the
   * query's `nprobe` nearest inverted lists, and ONLY their members are
   * scored, by asymmetric distance computation over PQ codes — a
   * per-subspace table lookup of precomputed query→sub-centroid
   * distances, no float math per candidate.
   *
   * Metric contract (matches the repo's gate families so the q73 + q85
   * oracles compose verbatim): coarse probing in cosine space over unit
   * vectors ([[ivfAssign]]); ADC in raw L2 within the probed lists
   * ([[pqCodes]]). On a unit-normalized corpus the two orders coincide
   * (L2² = 2 − 2·cos on the sphere); on raw corpora the coarse step is
   * the standard spherical-IVF variant.
   *
   * Scale: centroids and codebook broadcast (K, k ≪ N); the corpus scan
   * touches only probed-list members — with the assignment column as the
   * storage partition key the unprobed lists are never read; the ADC
   * join is against an m×k BROADCAST lookup table; the final top-k is a
   * TakeOrderedAndProject. Candidate memory is m bytes/vector, the
   * 64×-compression contract that makes billion-scale serving fit RAM.
   */
  /** The shared ADC tail of both IVF-PQ paths: codes (id, s, cid) +
    * codebook + query → per-candidate table-lookup distance, top-k.
    * The lookup table is m×k BROADCAST rows (query→sub-centroid
    * distance per (s, cid)); the total is the fixed-order
    * d0+d1+…+d(m−1) sum (not sum()) — bit-identical across engines. */
  private def adcTopK(codes: DataFrame, codebook: DataFrame,
                      query: Seq[Double], m: Int, subDim: Int,
                      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qd = codebook
      .select(col("cid"), col("cv"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s"), col("cid"),
        subL2Sq(q, col("cv"), col("s"), subDim).as("dq"))
    val aggs = (0 until m).map(i =>
        max(when(col("s") === i, col("cid"))).as(s"c$i")) ++
      (0 until m).map(i =>
        max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = codes.join(broadcast(qd), Seq("s", "cid"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val total = (0 until m).map(i => col(s"d$i")).reduce(_ + _)
    TopK.globalTopK(
        adc.select(col("id") +: (0 until m).map(i => col(s"c$i")) :+
          round(total, 6).as("adc_dist") :+ total.as("_t"): _*),
        Seq(col("_t").asc, col("id").asc), k)
      .drop("_t")
  }

  def ivfPqTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                query: Seq[Double], ivfModulus: Int, nprobe: Int,
                pqModulus: Int, m: Int, subDim: Int, k: Int): DataFrame = {
    val index = ivfIndex(embs, idCol, vecCol, ivfModulus)
    val probed = probedCids(index.centroids, query, nprobe)
    val members = index.assignments.join(broadcast(probed), "cid").select("id")
    val cand = embs.select(idCol.as("id"), vecCol.as("v")).join(members, "id")
    val codebook = pqCodebook(embs, idCol, vecCol, pqModulus)
    val codes = pqCodes(cand, col("id"), col("v"), codebook, m, subDim)
    adcTopK(codes, codebook, query, m, subDim, k)
  }

  /**
   * Residual-encoded IVF-PQ — the faithful `IndexIVFPQ` shape (Jégou
   * et al. 2011 §III): PQ encodes the RESIDUAL `v − centroid(v)`, not
   * the raw vector, so the codebook spends its codes on the
   * within-list displacement (small, centered) instead of re-describing
   * the coarse position the IVF assignment already captured — the
   * standard recall win over raw-vector PQ at the same code budget.
   * The codebook itself lives in residual space (deterministic: the
   * residuals of every `pqModulus`-th vector — the q72 discipline).
   * ADC becomes per-list: each probed list gets its own query residual
   * `q − centroid(list)` and its own m×k lookup table (nprobe·m·k
   * broadcast rows); a candidate's distance sums its own list's table
   * entries. Membership restriction falls out of the inner join on the
   * list id. Same scale contract as [[ivfPqTopK]]: broadcast kernels,
   * partial-agg argmins, TakeOrdered top-k, m bytes/vector candidate
   * memory.
   */
  def ivfPqResidualTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                        query: Seq[Double], ivfModulus: Int, nprobe: Int,
                        pqModulus: Int, m: Int, subDim: Int,
                        k: Int): DataFrame = {
    val rawCents = embs.filter(pmod(idCol, lit(ivfModulus)) === 0)
      .select(idCol.as("cid"), vecCol.as("cvr"))
    val assign = ivfAssign(embs, idCol, vecCol, ivfModulus)
      .select("id", "cid")
    // residual = v − centroid, every element widened to double BEFORE
    // the subtraction (the q85 float discipline)
    val resid = embs.select(idCol.as("id"), vecCol.as("v"))
      .join(assign, "id")
      .join(broadcast(rawCents), "cid")
      .select(col("id"), col("cid"),
        zip_with(col("v"), col("cvr"),
          (x, y) => x.cast("double") - y.cast("double")).as("r"))
    val codebook = resid.filter(pmod(col("id"), lit(pqModulus)) === 0)
      .select(col("id").as("ccid"), col("r").as("cr"))
    val probed = probedCids(ivfCentroids(embs, idCol, vecCol, ivfModulus),
      query, nprobe)
    // encode ONLY probed-list members (codebook still derives from the
    // full corpus): non-probed codes could never survive the per-list
    // ADC join below, so restricting first is output-identical and cuts
    // the per-query encode from O(N) to O(|probed members|) — the same
    // contract as ivfPqTopK's `cand`
    val codes = resid.join(broadcast(probed), "cid")
      .select(col("id"), col("cid"), col("r"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .join(broadcast(codebook))
      .select(col("id"), col("cid"), col("s"),
        struct((-subL2Sq(col("r"), col("cr"), col("s"), subDim)).as("nd"),
          (-col("ccid")).as("ncid")).as("sc"))
      .groupBy("id", "cid", "s").agg(max(col("sc")).as("mx"))
      .select(col("id"), col("cid"), col("s"), (-col("mx.ncid")).as("ccid"))
    val q = array(query.map(lit): _*)
    // per-probed-list query residual → per-list ADC lookup table
    val qres = rawCents.join(broadcast(probed), "cid")
      .select(col("cid"),
        zip_with(q, col("cvr"), (x, y) => x - y.cast("double")).as("qr"))
    val qd = qres.crossJoin(broadcast(codebook))
      .select(col("cid"), col("ccid"), col("qr"), col("cr"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("cid"), col("s"), col("ccid"),
        subL2Sq(col("qr"), col("cr"), col("s"), subDim).as("dq"))
    val aggs = max(col("cid")).as("list_cid") +:
      (0 until m).map(i => max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = codes.join(broadcast(qd), Seq("cid", "s", "ccid"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val total = (0 until m).map(i => col(s"d$i")).reduce(_ + _)
    TopK.globalTopK(
        adc.select(col("id"), col("list_cid"),
          round(total, 6).as("adc_dist"), total.as("_t")),
        Seq(col("_t").asc, col("id").asc), k)
      .drop("_t")
  }

  /** The materialize-once IVF-PQ serving artifacts: the IVF index
    * (centroids + assignments) plus the PQ codebook and the per-vector
    * code table (id, s, cid) — everything a search needs WITHOUT the
    * raw vectors. All four frames parquet-writable; at 100 TB the code
    * table is m bytes of payload per vector (the 64×-compression
    * contract) and is stored partitioned by the assignment cid so a
    * probe reads only its lists' codes. */
  final case class IvfPqIndex(ivf: IvfIndex, codebook: DataFrame,
                              codes: DataFrame)

  /** Build the IVF-PQ artifacts once per corpus version: IVF build +
    * codebook + full-corpus PQ encode (the only whole-corpus passes;
    * every subsequent search reads the stored frames via
    * [[ivfPqTopKFromIndex]]). A vector delta appends via the same
    * kernels: `assignAgainst` for the delta's lists, [[pqCodes]] for
    * the delta's codes — both against the STORED centroid/codebook
    * tables, work ∝ delta (the q134 discipline). */
  def ivfPqIndex(embs: DataFrame, idCol: Column, vecCol: Column,
                 ivfModulus: Int, pqModulus: Int, m: Int,
                 subDim: Int): IvfPqIndex = {
    val cb = pqCodebook(embs, idCol, vecCol, pqModulus)
    IvfPqIndex(ivfIndex(embs, idCol, vecCol, ivfModulus), cb,
      pqCodes(embs, idCol, vecCol, cb, m, subDim))
  }

  /**
   * [[ivfPqTopK]] against a prebuilt (typically parquet-read) index:
   * the query needs ONLY the stored frames — probed cids from the
   * centroid table, members from the assignment table, candidate
   * distances from the stored CODES joined to the m×k broadcast ADC
   * lookup. The raw embedding table is never touched: this is the
   * RAM-resident serving shape (codes ≈ m bytes/vector) that makes
   * billion-scale ANN fit a small cluster.
   */
  def ivfPqTopKFromIndex(index: IvfPqIndex, query: Seq[Double],
                         nprobe: Int, m: Int, subDim: Int,
                         k: Int): DataFrame = {
    val probed = probedCids(index.ivf.centroids, query, nprobe)
    val members = index.ivf.assignments.join(broadcast(probed), "cid")
      .select("id")
    adcTopK(index.codes.join(members, "id"), index.codebook, query, m,
      subDim, k)
  }

  /**
   * Exact re-ranking of an approximate shortlist — the two-stage serving
   * composition every production ANN system runs (the FAISS
   * `IndexRefineFlat` shape): a cheap approximate stage (ADC over PQ
   * codes, an LSH probe, an IVF scan) produces `R ≥ k` candidate ids,
   * and ONLY those R rows' raw vectors are fetched and scored by true
   * cosine; the final top-k ranks by the exact score. PQ quantization
   * error perturbs ordering near the boundary — re-ranking a modest
   * shortlist (R ≈ 2–10×k) restores exact-metric ordering within the
   * shortlist at a cost independent of corpus size.
   *
   * `shortlist` is any frame with an `id` column (typically
   * [[ivfPqTopK]]/[[ivfPqTopKFromIndex]] output). Scale shape: the
   * shortlist is R rows — BROADCAST onto the embedding table, so the
   * raw-vector fetch is a storage-pruned point read when `id` is the
   * table's sort/bucket key (the q143 layout note), never a full scan
   * shuffle; the exact scoring is R cosines; the top-k is a
   * TakeOrderedAndProject. The raw vectors live only in this final
   * R-row stage — the corpus-wide scan stays on m-byte codes.
   */
  def refineTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                 shortlist: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      embs.select(idCol.as("id"), vecCol.as("v"))
        // SEMI, not inner: the contract admits any id-bearing frame, and
        // a caller shortlist with duplicate ids must not duplicate
        // scored rows (ADVICE r11)
        .join(broadcast(shortlist.select("id")), Seq("id"), "left_semi")
        .select(col("id"), cosine(col("v"), q).as("cosine"))
        .filter(col("cosine").isNotNull),
      Seq(col("cosine").desc, col("id").asc), k)
  }

  /**
   * The DEFAULT two-stage serving entry over a stored index (verdict
   * r11 #4; FAISS `IndexRefineFlat` over `IndexIVFPQ`): the ADC pass
   * over stored codes produces an R = `refineFactor`·k shortlist, and
   * [[refineTopK]] re-scores ONLY those R raw vectors by exact cosine
   * — so the stored-index path returns exact-metric-ordered results at
   * a refine cost independent of corpus size. `embs` is the raw-vector
   * table the refine stage point-reads (id as sort/bucket key per the
   * q143 layout note); the corpus-wide scan stays on m-byte codes.
   */
  def ivfPqTopKRefinedFromIndex(index: IvfPqIndex, embs: DataFrame,
                                idCol: Column, vecCol: Column,
                                query: Seq[Double], nprobe: Int, m: Int,
                                subDim: Int, k: Int,
                                refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1 (got $refineFactor)")
    refineTopK(embs, idCol, vecCol,
      ivfPqTopKFromIndex(index, query, nprobe, m, subDim, refineFactor * k),
      query, k)
  }

  /** For each item: top-k nearest neighbors within its block (blocked
    * all-pairs + per-item window). */
  def knnWithinBlock(embs: DataFrame, idCol: Column, vecCol: Column,
                     blockCol: Column, k: Int): DataFrame = {
    // per-row unit normalization below the join (VectorFunctions.unit
    // scaladoc) — per-pair cosine = one dot pass
    val e = embs.select(idCol.as("id"), blockCol.as("block"),
        graft.functions.VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    val pairs = e.as("x").join(e.as("y"),
        col("x.block") === col("y.block") && col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("neighbor"),
        graft.functions.VectorFunctions.dot(col("x.u"), col("y.u")).as("cosine"))
    TopK.topKPerGroup(pairs, Seq(col("id")),
      Seq(col("cosine").desc, col("neighbor").asc), k, "nn_rank")
  }

  // ---------------- Trained quantizers (seeded MLlib k-means) ----------------
  // The modulus-sampled quantizers above are deterministic, engine-portable
  // correctness twins (their oracles replay them verbatim in SQL). These are
  // the PRODUCTION quantizers: k-means|| centroids/codebooks, which is what
  // sets measured recall (r11 ledger: modulus IVF-PQ recall@10 = 0.11 with
  // the residual variant BELOW flat PQ — the codebook, not the algorithm,
  // was the binding constraint). Seeded + canonicalized layout, so the
  // trained frames are reproducible goldens; spec-gated recall floors live
  // in AnnRecallSpec, measured values in metrics_detail.json.

  /** Canonical layout before any MLlib fit: k-means|| is seeded, but its
    * init sampling walks partitions, so the SAME rows in a different
    * layout train different centroids. Hash-mod repartition on the id +
    * in-partition sort makes the fit a function of (data, seed) alone —
    * the MetricsLedger.canon discipline, applied where the model is
    * built so every caller (bench local[32], specs local[4], a real
    * cluster) gets the same centers. */
  private def canonForFit(df: DataFrame, key: Column): DataFrame =
    // the fixed 4-way layout presumes a BOUNDED training frame: callers
    // bound it with `trainFrac` (hash-sampled) before the fit — at
    // 100 TB pass trainFrac so the sample, not the corpus, lands here
    df.repartition(4, key).sortWithinPartitions(key)

  // maxIter/initMode exist for INSTRUMENT callers (q210 trains 24
  // codebooks in one query — at a bounded 2k-row sample, k-means|| init
  // + 20 Lloyd rounds is pure scheduler overhead: the job COUNT, not
  // the row count, is the cost); every index-build path keeps the
  // defaults, so existing goldens are untouched

  /** Row bound for the driver-local k-means replay
    * ([[org.apache.spark.mllib.clustering.GraftLocalKMeans]] — the r18
    * fix for the trained-ANN job storm: each MLlib fit over the bounded
    * `trainFrac` sample ran ~12 Spark jobs of pure scheduler overhead).
    * Training samples are ≤2048 rows by the 100 TB build contract;
    * 65536 (32 MB of doubles at d=64) keeps comfortable driver headroom
    * while any caller feeding an unbounded frame stays distributed.
    * Env-overridable for A/B; 0 disables the local path entirely.
    * Centers are bit-identical to the distributed fit (LocalKMeansSpec
    * pins doubleToRawLongBits equality on every trained config). */
  private val LocalKMeansMaxRows: Long =
    sys.env.get("SPARK_GRAFT_LOCAL_KMEANS_MAX").map(_.toLong)
      .getOrElse(65536L)

  /** Partition-structured collect of a vector column — the exact rows,
    * partition split and in-partition order the distributed MLlib fit
    * would see from the same frame (both are narrow projections of the
    * canonForFit exchange), so the local replay trains on identical
    * input. ONE job. */
  private def collectVectorParts(df: DataFrame, featCol: String)
      : Array[Array[org.apache.spark.mllib.linalg.Vector]] =
    df.select(featCol).rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(r => org.apache.spark.mllib.linalg.Vectors.fromML(
          r.getAs[org.apache.spark.ml.linalg.Vector](0))).toArray))
      }
      .collect().sortBy(_._1).map(_._2)

  private def fitKMeansDistributed(train: DataFrame, featCol: String, k: Int,
                                   seed: Long, maxIter: Int,
                                   initMode: String): Array[Array[Double]] =
    new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setInitMode(initMode).setMaxIter(maxIter)
      .setTol(1e-6).setFeaturesCol(featCol)
      .fit(train)
      .clusterCenters.map(_.toArray)

  private def fitKMeans(train: DataFrame, featCol: String, k: Int,
                        seed: Long, maxIter: Int = 20,
                        initMode: String = "k-means||"): Array[Array[Double]] =
    if (LocalKMeansMaxRows > 0 && train.count() <= LocalKMeansMaxRows)
      org.apache.spark.mllib.clustering.GraftLocalKMeans.fit(
        collectVectorParts(train, featCol), k, maxIter, 1e-6, seed, initMode)
    else
      fitKMeansDistributed(train, featCol, k, seed, maxIter, initMode)

  /**
   * TRAINED IVF coarse centroids — seeded spherical k-means over unit
   * vectors (cluster means re-normalized to the sphere), drop-in for
   * [[ivfCentroids]]: returns (cid: 0..k−1 dense, cu unit). Training
   * runs on a deterministic md5-hash sample (`trainFrac`) — the 100 TB
   * path trains on a bounded sample and assigns at full scale, exactly
   * the FAISS practice; the sample is layout- and engine-stable because
   * membership is a pure hash of the id. Empty clusters (possible under
   * k-means||) are dropped, so callers must treat k as an upper bound.
   */
  def ivfCentroidsKMeans(embs: DataFrame, idCol: Column, vecCol: Column,
                         k: Int, seed: Long = 42L,
                         trainFrac: Double = 1.0): DataFrame = {
    val spark = embs.sparkSession
    val e = embs.select(idCol.as("id"),
        graft.functions.VectorFunctions.unit(vecCol).as("u"))
      .filter(col("u").isNotNull)
    val train = if (trainFrac >= 1.0) e
      else e.filter(Sampling.hashUniform(col("id"), "ivf-km") < trainFrac)
    val centers = fitKMeans(
      canonForFit(train, col("id"))
        .withColumn("f", org.apache.spark.ml.functions.array_to_vector(col("u")))
        .select("id", "f"),
      "f", k, seed)
    import spark.implicits._
    centers.toSeq.zipWithIndex.flatMap { case (c, i) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) None else Some((i.toLong, c.map(_ / n).toSeq))
    }.toDF("cid", "cu")
  }

  /** TRAINED IVF coarse centroids in RAW L2 space — (cid, cvr), the
    * coarse quantizer of the faithful `IndexIVFPQ` (assignment and
    * probing by min L2, residuals against the raw center). Same seeded
    * sample-train discipline as [[ivfCentroidsKMeans]]. */
  def ivfCentroidsKMeansL2(embs: DataFrame, idCol: Column, vecCol: Column,
                           k: Int, seed: Long = 42L,
                           trainFrac: Double = 1.0): DataFrame = {
    val spark = embs.sparkSession
    // null vectors would crash the MLlib fit (the cosine twin filters
    // via unit()-null); drop them here the same way
    val e = embs.select(idCol.as("id"),
      vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val train = if (trainFrac >= 1.0) e
      else e.filter(Sampling.hashUniform(col("id"), "ivf-km-l2") < trainFrac)
    val centers = fitKMeans(
      canonForFit(train, col("id"))
        .withColumn("f", org.apache.spark.ml.functions.array_to_vector(col("v")))
        .select("id", "f"),
      "f", k, seed)
    import spark.implicits._
    centers.toSeq.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cid", "cvr")
  }

  /** Min-L2 assignment against an explicit RAW centroid table
    * (cid, cvr) — the L2 twin of [[assignAgainst]]: broadcast NL join +
    * argmin partial agg, shuffle carries one row per vector. Returns
    * (id, cid, l2sq). */
  def assignAgainstL2(cents: DataFrame, embs: DataFrame,
                      idCol: Column, vecCol: Column): DataFrame =
    embs.select(idCol.as("id"), vecCol.as("v"))
      .join(broadcast(cents))
      .select(col("id"),
        struct((-graft.functions.VectorFunctions.sqDist(col("v"), col("cvr"))).as("nd"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("id").agg(max(col("sc")).as("m"))
      .select(col("id"), (-col("m.ncid")).as("cid"), (-col("m.nd")).as("l2sq"))

  /**
   * Top-A min-L2 "spilled" assignment — multi-assignment, the standard
   * coverage fix for an inverted file (Lv et al. 2007's multi-probe is
   * the query-side dual; FAISS ships the storage-side form as
   * IndexIVF spilling): each vector is stored in its A nearest lists
   * instead of exactly one. A probe of `nprobe` lists then finds a
   * vector if ANY of its A home lists is probed, so probed-list
   * coverage — the measured 0.81 recall@10 ceiling of the
   * single-assignment trained family (SCALING.md §7j) — rises at the
   * cost of A× assignment/code storage and A× list length (scan cost
   * per probed list). Net: coverage per scanned candidate IMPROVES
   * when the fixture's lists are coarse relative to the true-neighbor
   * radius, which is exactly the regime the 0.81 ceiling diagnosed.
   *
   * Same broadcast-NL + bounded per-id top-A plan as
   * [[assignAgainstL2]] (the shuffle carries A rows per vector);
   * `arank` (1..A) records the home-list rank so a consumer can
   * reconstruct the A=1 assignment by filtering. Deterministic
   * lowest-cid tiebreak.
   */
  def assignAgainstL2TopA(cents: DataFrame, embs: DataFrame,
                          idCol: Column, vecCol: Column,
                          a: Int): DataFrame = {
    require(a >= 1, s"multi-assignment width must be >= 1 (got $a)")
    val scored = embs.select(idCol.as("id"),
        vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .join(broadcast(cents))
      .select(col("id"), col("cid"),
        graft.functions.VectorFunctions.sqDist(col("v"), col("cvr")).as("l2sq"))
    TopK.topKPerGroup(scored, Seq(col("id")),
        Seq(col("l2sq").asc, col("cid").asc), a, rankCol = "arank")
      .select(col("id"), col("cid"), col("arank"))
  }

  /** The query's `nprobe` nearest RAW-centroid lists by L2 — the L2
    * twin of `probedCids`. */
  private def probedCidsL2(cents: DataFrame, query: Seq[Double],
                           nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    TopK.globalTopK(
      cents.select(col("cid"),
        graft.functions.VectorFunctions.sqDist(q, col("cvr")).as("cd")),
      Seq(col("cd").asc, col("cid").asc), nprobe).select("cid")
  }

  /**
   * TRAINED per-subspace PQ codebook — the faithful PQ of Jégou et al.
   * 2011 §II: an INDEPENDENT seeded k-means per `subDim`-wide subspace
   * (seed offset by the subspace index), so each of the m code bytes
   * spends its k codes on its own subspace's distribution instead of
   * sharing one full-vector codebook across all subspaces (the modulus
   * [[pqCodebook]] shortcut — why its measured recall floors at 0.07).
   * Returns (s, cid, cvs): subspace, code id 0..k−1, sub-centroid.
   * `vecs` is any (id, v) frame — raw vectors for flat PQ, residuals
   * for the residual variant. m driver-side fits over the hash-sampled
   * training set; at 100 TB each fit sees the bounded sample only.
   */
  def pqCodebookSubKMeans(vecs: DataFrame, idCol: Column, vecCol: Column,
                          m: Int, subDim: Int, k: Int, seed: Long = 42L,
                          trainFrac: Double = 1.0, maxIter: Int = 20,
                          initMode: String = "k-means||"): DataFrame = {
    val spark = vecs.sparkSession
    val e = vecs.select(idCol.as("id"),
      vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull) // null vector = no trainable features
    val train = (if (trainFrac >= 1.0) e
      else e.filter(Sampling.hashUniform(col("id"), "pq-km") < trainFrac))
    val canon = canonForFit(train, col("id"))
    // r18: at a bounded sample (the trainFrac contract) the m fits run
    // entirely on the driver from ONE partition-structured collect —
    // slice(v, s·subDim+1, subDim) + array_to_vector is replayed as a
    // local copyOfRange over the same rows in the same order, so every
    // subspace fit sees bit-identical input to the distributed form.
    // TWO Spark jobs (count + collect) replace m × (count + init +
    // Lloyd-rounds) — the q210/q204/q211/q214 job storm (452 jobs for
    // q210) was ~60% k-means scheduler overhead over ≤2048 rows.
    val rows: Seq[(Int, Long, Seq[Double])] =
      if (LocalKMeansMaxRows > 0 && canon.count() <= LocalKMeansMaxRows) {
        val parts: Array[Array[Array[Double]]] = canon.select("v").rdd
          .mapPartitionsWithIndex { (i, it) =>
            Iterator((i, it.map(_.getSeq[Double](0).toArray).toArray))
          }
          .collect().sortBy(_._1).map(_._2)
        (0 until m).flatMap { s =>
          val sliced = parts.map(_.map(v =>
            org.apache.spark.mllib.linalg.Vectors.dense(
              java.util.Arrays.copyOfRange(v, s * subDim, s * subDim + subDim))
              : org.apache.spark.mllib.linalg.Vector))
          org.apache.spark.mllib.clustering.GraftLocalKMeans
            .fit(sliced, k, maxIter, 1e-6, seed + s, initMode)
            .zipWithIndex.map { case (c, i) => (s, i.toLong, c.toSeq) }
        }
      } else {
        // distributed path (unbounded caller): the m fits are
        // independent seeded jobs over the same 4-partition cached
        // sample — submit them CONCURRENTLY (the CrossValidator-
        // parallelism mechanism; results are per-fit deterministic,
        // assembled in subspace order). canon materializes once up
        // front so the concurrent fits race on a warm cache.
        val cached = canon.cache()
        try {
          cached.count()
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.Duration
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(m, 8))
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try Await.result(Future.sequence((0 until m).map { s => Future {
              fitKMeansDistributed(
                cached.withColumn("f",
                    org.apache.spark.ml.functions.array_to_vector(
                      slice(col("v"), s * subDim + 1, subDim)))
                  .select("id", "f"),
                "f", k, seed + s, maxIter, initMode)
                .zipWithIndex.map { case (c, i) => (s, i.toLong, c.toSeq) }
            } }), Duration.Inf).flatten
          finally pool.shutdown()
        }
        finally cached.unpersist()
      }
    import spark.implicits._
    rows.toDF("s", "cid", "cvs")
  }

  /** PQ encoding against a PER-SUBSPACE codebook (s, cid, cvs) — the
    * [[pqCodes]] kernel with the broadcast join keyed by subspace.
    * Returns (id, s, cid). */
  def pqCodesSub(vecs: DataFrame, idCol: Column, vecCol: Column,
                 codebookSub: DataFrame, m: Int, subDim: Int): DataFrame =
    vecs.select(idCol.as("id"), vecCol.as("v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .join(broadcast(codebookSub), Seq("s"))
      .select(col("id"), col("s"),
        struct((-graft.functions.VectorFunctions.sqDist(
            slice(col("v"), col("s") * subDim + 1, lit(subDim)), col("cvs"))).as("nd"),
          (-col("cid")).as("ncid")).as("sc"))
      .groupBy("id", "s").agg(max(col("sc")).as("mx"))
      .select(col("id"), col("s"), (-col("mx.ncid")).as("cid"))

  /** ADC tail against a per-subspace codebook: the [[adcTopK]] m×k
    * broadcast-lookup shape, with the query table built from (s, cid,
    * cvs) directly. */
  private def adcTopKSub(codes: DataFrame, codebookSub: DataFrame,
                         query: Seq[Double], m: Int, subDim: Int,
                         k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qd = codebookSub.select(col("s"), col("cid"),
      graft.functions.VectorFunctions.sqDist(
        slice(q, col("s") * subDim + 1, lit(subDim)), col("cvs")).as("dq"))
    val aggs = (0 until m).map(i =>
        max(when(col("s") === i, col("cid"))).as(s"c$i")) ++
      (0 until m).map(i =>
        max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = codes.join(broadcast(qd), Seq("s", "cid"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val total = (0 until m).map(i => col(s"d$i")).reduce(_ + _)
    TopK.globalTopK(
        adc.select(col("id") +: (0 until m).map(i => col(s"c$i")) :+
          round(total, 6).as("adc_dist") :+ total.as("_t"): _*),
        Seq(col("_t").asc, col("id").asc), k)
      .drop("_t")
  }

  /**
   * TRAINED IVF-PQ search, flat codes: L2 k-means coarse quantizer
   * (probe `nprobe` min-L2 lists) + per-subspace trained codebook over
   * RAW vectors, ADC within probed lists. Same plan shape and scale
   * contract as [[ivfPqTopK]] (broadcast kernels, partial-agg argmins,
   * m bytes/vector candidate memory) — only the quantizer quality
   * changes. `kIvf`/`kSub` are the centroid/code budgets.
   */
  def ivfPqTopKTrained(embs: DataFrame, idCol: Column, vecCol: Column,
                       query: Seq[Double], kIvf: Int, nprobe: Int,
                       kSub: Int, m: Int, subDim: Int, k: Int,
                       seed: Long = 42L,
                       trainFrac: Double = 1.0): DataFrame = {
    val cents = ivfCentroidsKMeansL2(embs, idCol, vecCol, kIvf, seed,
      trainFrac)
    val assign = assignAgainstL2(cents, embs, idCol, vecCol).select("id", "cid")
    val probed = probedCidsL2(cents, query, nprobe)
    val members = assign.join(broadcast(probed), "cid").select("id")
    val cand = embs.select(idCol.as("id"), vecCol.as("v")).join(members, "id")
    val cb = pqCodebookSubKMeans(embs, idCol, vecCol, m, subDim, kSub, seed,
      trainFrac)
    adcTopKSub(pqCodesSub(cand, col("id"), col("v"), cb, m, subDim),
      cb, query, m, subDim, k)
  }

  /**
   * TRAINED residual IVF-PQ — the faithful `IndexIVFPQ` (Jégou et al.
   * 2011 §III) with both quantizers k-means-trained: codes encode the
   * residual `v − center(v)` against the L2 coarse centers, the
   * per-subspace codebook is trained ON the residuals (small, centered
   * — where the trained-codebook win is largest), and ADC is per-list
   * (each probed list gets its own query residual and its own m×k
   * table; nprobe·m·k broadcast rows). With the r11 modulus codebook
   * the residual variant measured BELOW flat PQ (0.05 vs 0.07
   * recall@10) — the training, not the residual algebra, is what this
   * variant buys. Encode restricted to probed-list members, the
   * [[ivfPqResidualTopK]] contract.
   */
  def ivfPqResidualTopKTrained(embs: DataFrame, idCol: Column,
                               vecCol: Column, query: Seq[Double],
                               kIvf: Int, nprobe: Int, kSub: Int, m: Int,
                               subDim: Int, k: Int,
                               seed: Long = 42L,
                               trainFrac: Double = 1.0): DataFrame = {
    val cents = ivfCentroidsKMeansL2(embs, idCol, vecCol, kIvf, seed,
      trainFrac)
    val assign = assignAgainstL2(cents, embs, idCol, vecCol).select("id", "cid")
    val resid = embs.select(idCol.as("id"), vecCol.as("v"))
      .join(assign, "id")
      .join(broadcast(cents), "cid")
      .select(col("id"), col("cid"),
        zip_with(col("v"), col("cvr"),
          (x, y) => x.cast("double") - y.cast("double")).as("r"))
    val cb = pqCodebookSubKMeans(resid, col("id"), col("r"), m, subDim,
      kSub, seed, trainFrac)
    val probed = probedCidsL2(cents, query, nprobe)
    val probedResid = resid.join(broadcast(probed), "cid")
    val codes = pqCodesSub(probedResid, col("id"), col("r"), cb, m, subDim)
      .withColumnRenamed("cid", "code")
      .join(probedResid.select(col("id"), col("cid")), "id")
    val q = array(query.map(lit): _*)
    // per-probed-list query residual → per-list ADC lookup table
    val qres = cents.join(broadcast(probed), "cid")
      .select(col("cid"),
        zip_with(q, col("cvr"), (x, y) => x - y.cast("double")).as("qr"))
    adcResidualTail(codes, qres, cb, m, subDim, k)
  }

  /** The materialize-once artifacts of the TRAINED IVF-PQ family —
    * the production index a corpus version ships: L2 k-means coarse
    * centers (cid, cvr), full-corpus assignments (id, cid), the
    * per-subspace trained codebook (s, cid, cvs) and the per-vector
    * code table (id, s, cid). All parquet-writable; the same storage
    * contract as [[IvfPqIndex]] (codes partitioned by the assignment
    * cid so a probe reads only its lists). */
  final case class IvfPqTrainedIndex(centroids: DataFrame,
                                     assignments: DataFrame,
                                     codebook: DataFrame, codes: DataFrame)

  /** Build the trained index once per corpus version (the only passes
    * that touch every vector: one assignment, one encode; the k-means
    * fits see the `trainFrac` hash-sample only). Deltas append via
    * [[assignAgainstL2]] + [[pqCodesSub]] against the STORED
    * centroid/codebook frames, work ∝ delta — the q134 discipline. */
  def ivfPqIndexTrained(embs: DataFrame, idCol: Column, vecCol: Column,
                        kIvf: Int, kSub: Int, m: Int, subDim: Int,
                        seed: Long = 42L,
                        trainFrac: Double = 1.0): IvfPqTrainedIndex = {
    val cents = ivfCentroidsKMeansL2(embs, idCol, vecCol, kIvf, seed,
      trainFrac)
    val cb = pqCodebookSubKMeans(embs, idCol, vecCol, m, subDim, kSub,
      seed, trainFrac)
    IvfPqTrainedIndex(cents,
      assignAgainstL2(cents, embs, idCol, vecCol).select("id", "cid"),
      cb, pqCodesSub(embs, idCol, vecCol, cb, m, subDim))
  }

  /** [[ivfPqTopKTrained]] against a prebuilt (typically parquet-read)
    * trained index: probed lists from the stored centers, candidates
    * from the stored assignments, ADC over the stored codes — the raw
    * vectors are never touched. Output ≡ the inline build (codes are
    * per-vector facts independent of probing; spec-pinned). */
  def ivfPqTopKTrainedFromIndex(index: IvfPqTrainedIndex,
                                query: Seq[Double], nprobe: Int, m: Int,
                                subDim: Int, k: Int): DataFrame = {
    val probed = probedCidsL2(index.centroids, query, nprobe)
    val members = index.assignments.join(broadcast(probed), "cid")
      .select("id")
    adcTopKSub(index.codes.join(members, "id"), index.codebook, query, m,
      subDim, k)
  }

  /** The trained serving entry end-to-end: stored-index ADC shortlist
    * (R = refineFactor·k) + exact cosine re-rank — [[ivfPqTopKRefinedFromIndex]]
    * for the trained family. Measured at the gate fixture: recall@10
    * rises from 0.56 (raw ADC) to 0.81, the probed-list coverage
    * ceiling (`AnnRecallSpec`'s refined row). */
  def ivfPqTopKTrainedRefinedFromIndex(index: IvfPqTrainedIndex,
                                       embs: DataFrame, idCol: Column,
                                       vecCol: Column, query: Seq[Double],
                                       nprobe: Int, m: Int, subDim: Int,
                                       k: Int,
                                       refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1 (got $refineFactor)")
    refineTopK(embs, idCol, vecCol,
      ivfPqTopKTrainedFromIndex(index, query, nprobe, m, subDim,
        refineFactor * k),
      query, k)
  }

  /**
   * Trained IVF-PQ index with SPILLED (top-A multi-) assignment — the
   * round-16 answer to the measured 0.81 probed-list-coverage ceiling
   * (SCALING.md §7j): same artifacts as [[ivfPqIndexTrained]] except
   * the assignment table stores each vector under its A nearest lists
   * ([[assignAgainstL2TopA]]; `arank` kept so A=1 is recoverable by
   * filter). Codes stay one row per (vector, subspace) — only the
   * assignment table grows A×. Measured on the gate fixture (kIvf=100,
   * A=2 vs the single-assign kIvf=25/nprobe=10 point): refined
   * recall@10 0.94 @ scan 0.539 (nprobe 18, rf 3) and 0.91 @ 0.465
   * (nprobe 14) vs 0.81 @ 0.544 — better on both axes, pinned by
   * `AnnRecallSpec` floors and the `ann_curve_spill_*` ledger rows.
   */
  def ivfPqIndexTrainedSpilled(embs: DataFrame, idCol: Column,
                               vecCol: Column, kIvf: Int, a: Int,
                               kSub: Int, m: Int, subDim: Int,
                               seed: Long = 42L,
                               trainFrac: Double = 1.0): IvfPqTrainedIndex = {
    val cents = ivfCentroidsKMeansL2(embs, idCol, vecCol, kIvf, seed,
      trainFrac)
    val cb = pqCodebookSubKMeans(embs, idCol, vecCol, m, subDim, kSub,
      seed, trainFrac)
    IvfPqTrainedIndex(cents,
      assignAgainstL2TopA(cents, embs, idCol, vecCol, a),
      cb, pqCodesSub(embs, idCol, vecCol, cb, m, subDim))
  }

  /** Delta append against a STORED spilled trained index — the q134
    * incremental-maintenance discipline for this family: assign (top-A)
    * and PQ-encode ONLY the new vectors against the stored
    * centroids/codebook (work ∝ delta; the corpus is never re-read or
    * re-encoded). Returns the delta's (assignments, codes) to land as
    * new generations (the idempotentBatchWriter batch_id layout);
    * because assignments and codes are per-vector pure functions of the
    * stored quantizers, base ∪ delta ≡ the full one-shot build
    * (`SpilledServingSpec` pins it). */
  def ivfPqAppendTrainedSpilled(index: IvfPqTrainedIndex,
                                delta: DataFrame, idCol: Column,
                                vecCol: Column, a: Int, m: Int,
                                subDim: Int): (DataFrame, DataFrame) =
    (assignAgainstL2TopA(index.centroids, delta, idCol, vecCol, a),
      pqCodesSub(delta, idCol, vecCol, index.codebook, m, subDim))

  /** Two-stage serving over a SPILLED trained index: probed lists →
    * member ids DEDUPED (a vector whose multiple home lists are all
    * probed must contribute one candidate, not A) → ADC shortlist of
    * R = `refineFactor`·k over stored codes → exact-cosine re-rank.
    * The distinct is one extra Exchange on the candidate id set —
    * bounded by the scanned fraction, never the corpus. */
  def ivfPqTopKTrainedSpilledRefinedFromIndex(index: IvfPqTrainedIndex,
                                              embs: DataFrame, idCol: Column,
                                              vecCol: Column,
                                              query: Seq[Double], nprobe: Int,
                                              m: Int, subDim: Int, k: Int,
                                              refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1 (got $refineFactor)")
    val probed = probedCidsL2(index.centroids, query, nprobe)
    val members = index.assignments.join(broadcast(probed), "cid")
      .select("id").distinct()
    refineTopK(embs, idCol, vecCol,
      adcTopKSub(index.codes.join(members, "id"), index.codebook, query,
        m, subDim, refineFactor * k),
      query, k)
  }

  /**
   * OPQ — Optimized Product Quantization (Ge et al. 2013, the
   * non-parametric alternation): learn an orthogonal rotation R so the
   * PQ subspace split falls along directions the codebooks can spend
   * their budget on, instead of whatever basis the embeddings arrived
   * in. Alternation per iteration: (1) train per-subspace codebooks on
   * the rotated sample, (2) encode + reconstruct x̂ (in rotated space),
   * (3) solve the orthogonal Procrustes problem min_R ‖R·x − x̂‖_F —
   * R = U·Vᵀ from the SVD of M = Σ x̂·xᵀ. The rotation composes with
   * everything downstream unchanged: rotate vectors and query, then
   * flat trained PQ / ADC exactly as [[pqCodesSub]]/[[adcTopKSub]].
   *
   * Scale shape: training runs on the `trainFrac` hash-sample (the
   * k-means discipline); the d×d scatter M is ONE aggregation pass
   * (outer-product explode → per-cell sum — d² cells, never row data,
   * to the driver) and the SVD is a driver-side d×d breeze call
   * (64×64 here — microseconds). Applying R at encode/search time is
   * a per-row d² matvec — the same order as the PQ encode argmin
   * itself (m·k·subDim), and a once-per-corpus-version index pass.
   *
   * Returns (R rows as a Seq[Seq[Double]] — R(i) is output-dim i's
   * weight row — and the codebook trained on the FINAL rotation).
   */
  def opqTrain(embs: DataFrame, idCol: Column, vecCol: Column,
               m: Int, subDim: Int, kSub: Int, iters: Int = 3,
               seed: Long = 42L, trainFrac: Double = 1.0,
               fitMaxIter: Int = 20, fitInitMode: String = "k-means||")
      : (Seq[Seq[Double]], DataFrame) = {
    val (r, cb, _) = opqTrainWithFlat(embs, idCol, vecCol, m, subDim,
      kSub, iters, seed, trainFrac, fitMaxIter, fitInitMode)
    (r, cb)
  }

  /** [[opqTrain]] exposing the FIRST alternation's codebook as well:
    * iteration 0 rotates by the identity, so its codebook IS the flat
    * per-subspace PQ codebook trained on the SAME sample with the SAME
    * trainer — the comparison baseline (q210) at zero extra fits. */
  def opqTrainWithFlat(embs: DataFrame, idCol: Column, vecCol: Column,
                       m: Int, subDim: Int, kSub: Int, iters: Int = 3,
                       seed: Long = 42L, trainFrac: Double = 1.0,
                       fitMaxIter: Int = 20,
                       fitInitMode: String = "k-means||")
      : (Seq[Seq[Double]], DataFrame, DataFrame) = {
    require(iters >= 1, s"need at least one alternation (got $iters)")
    val d = m * subDim
    val spark = embs.sparkSession
    val e = embs.select(idCol.as("id"),
        vecCol.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val train = (if (trainFrac >= 1.0) e
      else e.filter(Sampling.hashUniform(col("id"), "opq") < trainFrac))
      .localCheckpoint()
    var r: Seq[Seq[Double]] =
      Seq.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var cb: DataFrame = null
    var cbFlat: DataFrame = null
    var it = 0
    while (it < iters) {
      val rot = train.select(col("id"), rotated(col("v"), r, d).as("v"))
        .localCheckpoint()
      cb = pqCodebookSubKMeans(rot, col("id"), col("v"), m, subDim, kSub,
        seed, maxIter = fitMaxIter, initMode = fitInitMode)
      if (it == 0) cbFlat = cb
      // last iteration: codebooks already match the final R — skip the
      // Procrustes update they would feed
      if (it < iters - 1) {
        val codes = pqCodesSub(rot, col("id"), col("v"), cb, m, subDim)
        // x̂ assembled in subspace order from the code's sub-centroids
        val xhat = codes.join(broadcast(cb), Seq("s", "cid"))
          .groupBy("id")
          .agg(flatten(array_sort(collect_list(struct(col("s"),
            col("cvs")))).getField("cvs")).as("xhat"))
        // scatter M = Σ x̂·xᵀ — d² cells via outer-product explode +
        // per-cell partial sums; only the d² aggregates reach the driver.
        // The outer product is the codegen ArrayOuterFlat kernel: same
        // row-major products bit-for-bit as the nested transform HOF it
        // replaces (4096 interpreted multiplies/row at d=64), so the
        // explode positions and the per-cell sums are unchanged
        val cells = train.join(xhat, "id")
          .select(posexplode(graft.functions.VectorFunctions.outerFlat(
            col("xhat"), col("v"))))
          .groupBy("pos").agg(sum("col").as("c"))
          .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
        val mMat = breeze.linalg.DenseMatrix.tabulate(d, d)(
          (i, j) => cells.getOrElse(i * d + j, 0.0))
        val svd = breeze.linalg.svd(mMat)
        val rNew = svd.U * svd.Vt
        r = Seq.tabulate(d, d)((i, j) => rNew(i, j))
      }
      // the fits and the scatter collect both ran eagerly above, and the
      // returned codebook is a local row set — the rotated frame's
      // blocks free on EVERY path (a per-iteration leak would pin
      // iters × sample in the block manager)
      org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(rot)
      it += 1
    }
    org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(train)
    (r, cb, cbFlat)
  }

  /** R·v as a column expression — the codegen [[graft.functions.ArrayMatVec]]
    * kernel (bit-identical to the nested transform/zip_with/aggregate
    * HOF form it replaces; ArrayMatVecSpec pins it — the HOF interpreted
    * ~3d² lambda frames per row, a dominant slice of q210's task time).
    * O(d²)/row — the once-per-corpus-version index-build pass, same
    * order as the PQ encode argmin itself. The coalesce preserves the
    * HOF's null-input result (an array of d null elements). */
  def rotated(vecCol: Column, r: Seq[Seq[Double]], d: Int): Column = {
    require(r.length == d, s"rotation is ${r.length}x?, expected $d")
    coalesce(
      org.apache.spark.sql.graftshim.GraftShim.column(
        graft.functions.ArrayMatVec(
          org.apache.spark.sql.graftshim.GraftShim.expr(vecCol), r)),
      array_repeat(lit(null).cast("double"), d))
  }

  /**
   * 1-bit binary quantization: sign bits packed into 64-bit words —
   * the memory-bound scale path PAST int8 (q76) and PQ (8 B/vector):
   * a 64-d float32 vector becomes ONE long (256× smaller), and
   * distance is xor+popcount — no float math, no lookup table, the
   * cheapest candidate-generation scan there is (the standard
   * binary-embedding serving trick; re-rank survivors by exact metric
   * exactly like [[refineTopK]]). Bit i of word w = (v[w·64+i] > 0) —
   * the zero-threshold sign code, reproducible on any engine.
   */
  def binarySignCode(vecCol: Column, dims: Int): Column = {
    require(dims >= 1, s"dims must be positive (got $dims)")
    val words = (dims + 63) / 64
    array((0 until words).map { w =>
      val lo = w * 64
      val hi = math.min(dims, lo + 64)
      (lo until hi).map(i =>
        when(element_at(vecCol, i + 1).cast("double") > 0,
          lit(1L << (i - lo))).otherwise(lit(0L)))
        .reduce(_ + _)
    }: _*)
  }

  /** Hamming distance between two packed code arrays: per-word
    * xor+popcount, summed in word order — the codegen
    * [[graft.functions.ArrayHammingSum]] kernel (exact integer math;
    * replaces the interpreted zip_with/aggregate HOF: at 100 TB this is
    * THE stage-0 expression, evaluated once per corpus vector per
    * query). */
  def hammingDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.ArrayHammingSum(
        org.apache.spark.sql.graftshim.GraftShim.expr(a),
        org.apache.spark.sql.graftshim.GraftShim.expr(b)))

  /** The driver-side twin of [[binarySignCode]] for a literal query
    * vector. */
  def binarySignCodeLocal(v: Seq[Double], dims: Int): Seq[Long] = {
    require(v.length == dims, s"query has ${v.length} dims, expected $dims")
    val words = (dims + 63) / 64
    (0 until words).map { w =>
      val lo = w * 64
      val hi = math.min(dims, lo + 64)
      (lo until hi).foldLeft(0L)((acc, i) =>
        if (v(i) > 0) acc | (1L << (i - lo)) else acc)
    }
  }

  /** Binary-code top-k: one packed-code projection + xor/popcount scan
    * + TakeOrdered — no shuffle of anything but k rows. Returns
    * (id, hamming, rank). */
  def binaryHammingTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                        query: Seq[Double], dims: Int, k: Int): DataFrame = {
    val qCode = array(binarySignCodeLocal(query, dims).map(lit): _*)
    TopK.globalTopK(
      embs.select(idCol.as("id"),
        hammingDistance(binarySignCode(vecCol, dims), qCode).as("hamming")),
      Seq(col("hamming").asc, col("id").asc), k)
  }

  /** The binary serving composition: xor/popcount shortlist of
    * R = `refineFactor`·k (the 256×-compressed scan), exact-cosine
    * re-rank of only those R raw vectors ([[refineTopK]]) — the
    * standard two-stage binary-embedding retrieval. */
  def binaryRefinedTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                        query: Seq[Double], dims: Int, k: Int,
                        refineFactor: Int = 10): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1 (got $refineFactor)")
    refineTopK(embs, idCol, vecCol,
      binaryHammingTopK(embs, idCol, vecCol, query, dims,
        refineFactor * k),
      query, k)
  }

  /**
   * FAISS `remove_ids` for the STORED index — the right-to-erasure
   * path for serving artifacts ([[graft.app.CurationRunner]]'s
   * physical-erasure contract applied to the index a corpus version
   * ships): delete the subject vectors' rows from every id-keyed
   * artifact under `indexDir` via the file-targeted
   * [[graft.sources.Layout.deleteWhere]] rewrite — untouched files
   * keep their bytes, and min/max pruning decides which files are
   * read at all, so at 100 TB with id-sorted codes the rewrite
   * touches O(subjects) files, never the corpus. Centroids and
   * codebooks are TRAINED PARAMETERS, not rows about a subject: they
   * keep their values (retrain at the next corpus version when the
   * parameters themselves must forget — the same boundary as the
   * erase() aggregated-derivatives note). Post-erasure serving is
   * EXACT: assignment and encode are per-vector facts, so the erased
   * store is row-identical to an index built over the complement
   * corpus with the same parameters, and no erased id can be returned
   * by any probe (spec-pinned; oracle-gated as q215).
   *
   * `frames` names the id-keyed artifacts to rewrite. A frame absent
   * under `indexDir` is skipped only when `optional` names it — a
   * missing REQUIRED frame is an error, because silently skipping
   * `assignments` would report an erasure that never happened.
   * Returns rows deleted per frame rewritten.
   */
  def eraseFromStoredIndex(spark: SparkSession, indexDir: String,
                           ids: Seq[Long],
                           frames: Seq[String] =
                             Seq("assignments", "codes", "binary"),
                           optional: Set[String] = Set("binary"))
      : Map[String, Long] = {
    require(ids.nonEmpty, "no subject ids to erase")
    val conf = spark.sessionState.newHadoopConf()
    frames.flatMap { name =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$name")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) {
        require(optional.contains(name),
          s"stored index at $indexDir has no '$name' frame — refusing " +
            "to report an erasure that did not touch a required artifact")
        None
      } else
        Some(name -> graft.sources.Layout.deleteWhere(spark, p.toString,
          col("id").isin(ids: _*)).rowsDeleted)
    }.toMap
  }

  /**
   * The THREE-stage binary serving composition whose operating curve
   * q211 measures (0.95 recall@10 at a 0.30 ADC-scan; (bp40, rf5)
   * reaches 0.98 at 0.40): stage-0 ranks EVERY corpus vector by
   * xor/popcount over packed sign codes (8 B/vector — 1/32 of the raw
   * float32 bytes) and keeps `candidates`; stage-1 re-ranks only those
   * candidates by trained-PQ ADC against `codebookSub` (codes are
   * computed here from the shortlist's raw vectors — a production
   * deployment point-reads stored codes, the q143 layout note);
   * stage-2 re-scores the `refineFactor`·k ADC survivors by exact
   * cosine ([[refineTopK]]). No stage has a coverage ceiling — every
   * vector is a stage-0 candidate — which is why the measured curve
   * dominates the probed-IVF curve on both axes (q211 vs q204).
   */
  def binaryAdcRefinedTopK(embs: DataFrame, idCol: Column, vecCol: Column,
                           codebookSub: DataFrame, m: Int, subDim: Int,
                           query: Seq[Double], dims: Int, k: Int,
                           candidates: Int, refineFactor: Int = 3)
      : DataFrame = {
    require(candidates >= 1, s"candidates must be >= 1 (got $candidates)")
    require(refineFactor >= 1,
      s"refineFactor must be >= 1 (got $refineFactor)")
    val ev = embs.select(idCol.as("id"),
      vecCol.cast("array<double>").as("v"))
    val short0 = binaryHammingTopK(ev, col("id"), col("v"), query, dims,
      candidates)
    val shortVecs = ev.join(broadcast(short0.select("id")), Seq("id"),
      "left_semi")
    val codes = pqCodesSub(shortVecs, col("id"), col("v"), codebookSub,
      m, subDim).withColumnRenamed("cid", "code")
    val qLit = array(query.map(lit): _*)
    val qd = codebookSub.select(col("s"), col("cid").as("code"),
      graft.functions.VectorFunctions.sqDist(
        slice(qLit, col("s") * subDim + 1, lit(subDim)),
        col("cvs")).as("dq"))
    val dCols = (0 until m).map(i =>
      max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = codes.join(broadcast(qd), Seq("s", "code"))
      .groupBy("id").agg(dCols.head, dCols.tail: _*)
      .withColumn("adcd",
        (0 until m).map(i => col(s"d$i")).reduce(_ + _))
    val adcShort = TopK.globalTopK(adc.select(col("id"), col("adcd")),
      Seq(col("adcd").asc, col("id").asc), refineFactor * k)
    refineTopK(ev, col("id"), col("v"), adcShort, query, k)
  }

  /** Per-list ADC tail shared by the trained residual path: join codes
    * (id, s, cid ← code, cid list) to per-(list, s, code) query-residual
    * distances, fixed-order sum, top-k. */
  private def adcResidualTail(codes: DataFrame, qres: DataFrame,
                              codebookSub: DataFrame, m: Int, subDim: Int,
                              k: Int): DataFrame = {
    val qd = qres
      .crossJoin(broadcast(codebookSub.withColumnRenamed("cid", "code")))
      .select(col("cid"), col("s"), col("code"),
        graft.functions.VectorFunctions.sqDist(
          slice(col("qr"), col("s") * subDim + 1, lit(subDim)),
          col("cvs")).as("dq"))
    val aggs = max(col("cid")).as("list_cid") +:
      (0 until m).map(i => max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = codes
      .join(broadcast(qd), Seq("cid", "s", "code"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val total = (0 until m).map(i => col(s"d$i")).reduce(_ + _)
    TopK.globalTopK(
        adc.select(col("id"), col("list_cid"),
          round(total, 6).as("adc_dist"), total.as("_t")),
        Seq(col("_t").asc, col("id").asc), k)
      .drop("_t")
  }
}
