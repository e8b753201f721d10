package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.GraftShim

/**
 * Deterministic hash-based sampling for training-data splits.
 *
 * `df.sample()` / `rand(seed)` are PARTITIONING-DEPENDENT in Spark
 * (per-partition RNG streams): a repartition, AQE re-plan, or file-split
 * change silently changes which rows are sampled — unacceptable for
 * train/test splits that must be stable across reruns and engines.
 * Key-hash sampling fixes the decision to the ROW (md5 of salt+key →
 * uniform in [0,1)), so samples are reproducible anywhere md5 exists,
 * membership is stable under any re-partitioning, and train/test
 * assignment can be re-derived years later from the key alone.
 * (Same discipline as the reference's seeded splits —
 * scripts/evaluate.py:295-320 — made partition-invariant; SURVEY §7.4.3.)
 */
object Sampling {

  /** Uniform [0,1) from a key: (Md5Prefix32("salt:"||key) % 1e6) / 1e6.
    * Engine-portable: DuckDB spells the identical value as
    * CAST(('0x'||substring(md5('salt:'||key),1,8)) AS UBIGINT)%1000000/1e6. */
  def hashUniform(key: Column, salt: String): Column =
    pmod(GraftShim.column(graft.functions.Md5Prefix32(
      GraftShim.expr(concat(lit(s"$salt:"), key.cast("string"))))),
      lit(1000000L)).cast("double") / 1e6

  /** Bernoulli sample: keep rows with hashUniform < fraction. */
  def sample(df: DataFrame, key: Column, fraction: Double,
             salt: String = "sample"): DataFrame =
    df.filter(hashUniform(key, salt) < fraction)

  /** Stratified sample: per-stratum fraction (default for strata not in
    * the map). One scan, no shuffle — the fraction lookup is a literal
    * map, the keep decision is row-local. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       fractions: Map[String, Double], default: Double,
                       salt: String = "sample"): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(strata === s, lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(key, salt) < frac)
  }

  /** Importance (weighted) sample: keep each row with probability
    * proportional to `weight` (clamped to [0,1] after `scale`) — the
    * quality-weighted downsampling step of training-data curation (keep
    * high-quality documents with higher probability). Same hash-uniform
    * determinism as [[sample]]: membership is a pure function of the key,
    * stable under repartitioning and replayable cross-engine. */
  def sampleByWeight(df: DataFrame, key: Column, weight: Column,
                     scale: Double = 1.0, salt: String = "wsample"): DataFrame =
    // NULL weight = weight 0 (dropped) — spelled out because least()
    // SKIPS null operands, so the bare form would keep an un-scored row
    // with probability 1, the opposite of any sane missing-score policy
    df.filter(hashUniform(key, salt) <
      least(coalesce(weight, lit(0.0)) * scale, lit(1.0)))

  /** Deterministic fixed-k sample per stratum: the k rows with the
    * smallest md5(salt:key) per stratum (ties broken by key) — an exact-k
    * "reservoir" that is partition-invariant and replayable, where the
    * rate-based [[stratifiedSample]] only hits k in expectation. The shape
    * of held-out eval-set selection (exactly k docs per language/source).
    * One shuffle (the per-stratum window); per-stratum state is one
    * row_number counter. Returns the input plus `rn` ∈ [1, k]. */
  def fixedKPerStratum(df: DataFrame, key: Column, stratum: Column,
                       k: Int, salt: String = "evalk"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(md5(concat(lit(s"$salt:"), key.cast("string")).cast("binary")), key)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Temperature-based mixture resampling (the multilingual/multi-source
    * data-mixing rule of the mC4/XLM-R lineage): stratum i is kept with
    * rate ∝ n_i^alpha / n_i, so alpha=1 preserves the natural mix,
    * alpha→0 flattens toward uniform, and 0<alpha<1 upweights
    * low-resource strata. `targetFraction` scales the expected kept
    * share of the corpus; rates clamp at 1 (no upsampling — repeat-epoch
    * the small strata instead). Rates come from ONE tiny groupBy
    * broadcast back; keep decisions are hashUniform — partition-
    * invariant, replayable, engine-portable like every sampler here. */
  def temperatureMixture(df: DataFrame, key: Column, stratum: Column,
                         alpha: Double, targetFraction: Double,
                         salt: String = "tmix"): DataFrame = {
    require(alpha > 0 && targetFraction > 0, "alpha and targetFraction must be > 0")
    val n = df.groupBy(stratum.as("_st")).agg(count(lit(1)).as("_n"))
    val tot = n.agg(sum(col("_n")).as("_total"),
      sum(pow(col("_n"), alpha)).as("_zsum"))
    val rates = n.crossJoin(broadcast(tot))
      .select(col("_st"),
        least(lit(1.0), (col("_total") * targetFraction) *
          (pow(col("_n"), alpha) / col("_zsum")) / col("_n")).as("_rate"))
    // NULL-SAFE join: a null stratum is a legitimate group of its own
    // (the groupBy above already counts it) — plain equality would drop
    // every null-stratum row AND leave their mass in _total/_zsum, so
    // the realized kept share would undershoot targetFraction
    df.join(broadcast(rates), stratum <=> col("_st"))
      .filter(hashUniform(key, salt) < col("_rate"))
      .withColumn("rate", col("_rate"))
      .drop("_st", "_rate")
  }

  /** Deterministic epoch shuffle: a reproducible global permutation for
    * training-data ordering, as (shard, pos) — shard = hash % nShards,
    * pos = rank of the md5 hex within the shard. Changing the salt (e.g.
    * "epoch7") re-permutes; the same salt replays the identical order on
    * any engine/partitioning. Per-shard windows keep the sort parallel —
    * there is never a global single-partition sort; consumers read shards
    * in index order, rows in pos order. */
  def epochShuffle(df: DataFrame, key: Column, nShards: Int,
                   salt: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val hx = md5(concat(lit(s"$salt:"), key.cast("string")).cast("binary"))
    val shard = pmod(GraftShim.column(graft.functions.Md5Prefix32(
      GraftShim.expr(concat(lit(s"$salt:"), key.cast("string"))))),
      lit(nShards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_hx"), key)
    df.withColumn("_hx", hx).withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("_hx")
  }

  /** Token-budget quota fill — the data-mixing step of a training run:
    * each stratum (source/domain/language) contributes documents, in a
    * deterministic per-stratum md5 shuffle order, until its TOKEN budget
    * is exhausted (cumulative inclusive count ≤ budget; the first
    * overflowing doc and everything after it are dropped — prefix
    * semantics, so the kept set is a stable function of the salt, never
    * of partitioning). `budget` is a Column over the stratum (a literal,
    * a when-chain of per-domain weights, or a joined-in rate table).
    * Emits `pos` (1-based quota order) and `cum_tokens`.
    *
    * One per-stratum window (shuffle on the stratum key). At 100 TB,
    * pre-prune each stratum to ~budget/avg_tokens × safety rows by hash
    * rank before this window so the sort never touches the long tail of
    * a giant domain — the quota only ever consumes a prefix.
    *
    * Rows with a NEGATIVE token count (corrupt upstream) are dropped
    * before the window: a negative value would pull the cumulative sum
    * back under budget and re-admit rows AFTER an overflow, breaking
    * both the prefix invariant and parity with the streaming twin
    * (`Streams.tokenBudgetAdmit`, which closes a stratum permanently).
    * Zero-token rows are admitted free — consistent in both twins. */
  def tokenBudgetFill(df: DataFrame, key: Column, stratum: Column,
                      tokens: Column, budget: Column,
                      salt: String = "tbf"): DataFrame = {
    val hx = md5(concat(lit(s"$salt:"), key.cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(col("_hx"), key)
    df.filter(tokens >= 0)
      .withColumn("_hx", hx)
      .withColumn("pos", row_number().over(w))
      .withColumn("cum_tokens", sum(tokens.cast("long")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
      .drop("_hx")
  }

  /** Deterministic k-way split: returns `splitCol` ∈ [0, k) from the key
    * hash (e.g. k=10 → stable 10-fold CV folds). */
  def foldAssignment(key: Column, k: Int, salt: String = "fold"): Column =
    pmod(GraftShim.column(graft.functions.Md5Prefix32(
      GraftShim.expr(concat(lit(s"$salt:"), key.cast("string"))))), lit(k.toLong))
      .cast("int")

  /** Leakage-safe train/eval split: near-duplicate documents land in the
    * SAME split — a per-doc hash split puts a doc's near-twin in train
    * while the doc sits in eval, silently contaminating every metric
    * computed on it. Docs linked by `edges` (any near-dup pipeline:
    * minhash, simhash, embedding cosine) share a connected component;
    * singletons are their own; the split decision hashes the COMPONENT
    * id, so all members inherit one verdict. Output: (id, component,
    * split ∈ {train, eval}).
    *
    * Partition-invariant and replayable like every Sampling decision —
    * and stable under corpus growth ONLY as clusters don't merge (two
    * clusters joined by a new bridging doc re-hash under the merged
    * component's min-id; re-split after ingest, or run delta dedup and
    * pin affected clusters). Scale: CC runs on the corpus-tiny edge
    * list; labels join back by id (hash join, component dim is small). */
  def leakageSafeSplit(docs: DataFrame, idCol: Column, edges: DataFrame,
                       evalFraction: Double = 0.1,
                       salt: String = "split"): DataFrame = {
    require(evalFraction > 0 && evalFraction < 1, "need 0 < evalFraction < 1")
    val labels = Dedup.connectedComponents(edges, maxIter = 20)
    docs.select(idCol.as("id"))
      .join(labels, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
      .withColumn("split",
        when(hashUniform(col("component"), salt) < evalFraction, "eval")
          .otherwise("train"))
  }
}
