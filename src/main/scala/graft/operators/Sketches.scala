package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

import graft.functions.BottomKDistinct

/**
 * Sketch-based approximate analytics — the 100 TB path for cardinality,
 * overlap and quantile questions where exactness costs a full shuffle of
 * the distinct domain:
 *
 *  - `approxDistinct`: HyperLogLog++ via `approx_count_distinct` — fixed
 *    ~kilobytes of state per group regardless of cardinality, vs
 *    `count_distinct`'s shuffle of every distinct value. `rsd` dials
 *    sketch size against error. Accuracy-gated in `SketchesSpec` (the
 *    estimate is implementation-specific, so no SQL oracle).
 *  - `approxQuantiles`: Greenwald-Khanna via `percentile_approx` —
 *    mergeable bounded-size summaries, vs exact percentile's per-group
 *    sort of all values.
 *  - the KMV (k-minimum-values / bottom-k theta) sketch family below:
 *    ENGINE-PORTABLE sketches built on the md5-prefix hash every oracle
 *    in this engine replays, so sketch CONTENT, merged rollups, distinct
 *    estimates and pairwise-overlap estimates are all deterministic and
 *    hash-exact against the DuckDB oracle (q160–q162) — the
 *    correctness-twin discipline the IVF family uses (deterministic path
 *    oracle-gated; `hllSketch` below is the binary production twin).
 *  - `histogramSketch`: fixed-bin mergeable histograms whose quantile
 *    read-out is deterministic interpolation (q163) — per-partition /
 *    per-day partials add up by construction, so a 100 TB percentile
 *    dashboard maintains B rows per (group, day) and never re-sorts raw
 *    data.
 *  - `hllSketch`/`hllMerge`: Apache DataSketches HLL binaries via
 *    `hll_sketch_agg`/`hll_union_agg` — the compact production artifact
 *    (fixed ~KB per group at ANY cardinality, vs KMV's k·8 bytes but
 *    engine-pinned estimate). Spec-gated: stored-merged ≡ direct, and
 *    accuracy vs exact.
 *
 * All of these are MERGEABLE sketches (partial aggregation works;
 * accuracy is partition-independent), which is the property that makes
 * them safe at any scale: sketch once per shard/day at the data, merge
 * k-row artifacts at query time.
 */
object Sketches {

  /** Per-group approximate distinct count of `value`. */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], value: Column,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(value, rsd).as("approx_distinct"))

  /** Per-group approximate quantiles of `value` at `probs`. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[Column], value: Column,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(value,
        array(probs.map(lit): _*), lit(accuracy)).as("approx_quantiles"))

  // ---------------- KMV / bottom-k theta sketches ----------------

  /** The hash space size: 16^15 = 2^60 (exact as a double — a power of
    * two — so `hv / KmvSpace` is pure exponent arithmetic and both
    * engines produce the identical uniform u ∈ [0,1)). */
  val KmvSpace: Double = 1152921504606846976.0

  /** 60-bit engine-portable uniform hash: first 15 hex chars of md5 as a
    * long — DuckDB replays it as
    * `CAST(CAST(('0x' || substring(md5(v),1,15)) AS UBIGINT) AS BIGINT)`.
    * 60 bits keeps birthday collisions negligible to ~2^30 distinct
    * values (the 32-bit prefix the dedup family uses would start
    * under-estimating in the billions). Callers hash STRINGS; cast
    * numeric keys to string first so both engines render identically. */
  def kmvHash60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** The bounded bottom-k-distinct aggregate as a Column (usable in any
    * `agg`); see [[graft.functions.BottomKDistinct]]. */
  def bottomK(c: Column, k: Int): Column =
    GraftShim.column(BottomKDistinct(GraftShim.expr(c), k)
      .toAggregateExpression())

  /** Per-group KMV sketch of `value`: (groupCols..., sk array<long>
    * ascending, ≤ k). ONE shuffle of ≤k-long partial buffers per group —
    * the distinct domain itself never moves ([[graft.functions.BottomKDistinct]]).
    * The sketch frame is the storable artifact: k·8 bytes per group,
    * parquet-writable, re-mergeable via [[kmvMerge]]. */
  def kmvSketch(df: DataFrame, group: Seq[String], value: Column,
                k: Int): DataFrame =
    df.groupBy(group.map(col): _*).agg(bottomK(kmvHash60(value), k).as("sk"))

  /** Merge partial sketches (built with the SAME k) to coarser groups:
    * bottom-k of the union of per-part bottom-k's ≡ bottom-k of the
    * union of the parts' domains — exact, not approximate, merging
    * (`SketchesSpec` asserts equality with the direct build). Input rows
    * carry `sk`; output is one merged `sk` per `group`. */
  def kmvMerge(sketches: DataFrame, group: Seq[String], k: Int): DataFrame =
    sketches.select(group.map(col) :+ explode(col("sk")).as("hv"): _*)
      .groupBy(group.map(col): _*).agg(bottomK(col("hv"), k).as("sk"))

  /** Distinct-count estimate from a sketch column: exact `|sk|` while the
    * group's domain fits in the sketch, else the KMV estimator
    * (k-1)/u_k with u_k = kth-smallest hash normalized to [0,1)
    * (Bar-Yossef et al. 2002; relative error ~1/√k). */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(sk, k).cast("double") / lit(KmvSpace)))

  /** The inclusion threshold θ of a sketch: u_k when the sketch is full,
    * else 1.0 (the sketch then IS the whole domain). */
  private def theta(sk: Column, k: Int): Column =
    when(size(sk) === k,
      element_at(sk, k).cast("double") / lit(KmvSpace)).otherwise(lit(1.0))

  /**
   * All-pairs distinct-INTERSECTION estimates between the group sketches
   * of one sketch frame (single `key` column + `sk`): for a pair (a, b),
   * θ = min(θ_a, θ_b), and |A ∩ B| ≈ |{h ∈ sk_a ∩ sk_b : h/2^60 < θ}| / θ
   * (the theta-sketch intersection; exact when both sketches hold their
   * whole domains). Returns every unordered pair `key_a < key_b` with
   * (n_common, est_overlap) — zero-overlap pairs included.
   *
   * This is the 100 TB shape for "how much do my N corpus shards
   * overlap": N·(N-1)/2 intersections over ≤k-row frames (here a
   * self-equi-join on hv + one tiny agg) instead of N² joins over the
   * full element domain. At any scale every frame in this plan is
   * O(groups · k).
   */
  def kmvOverlapPairs(sketches: DataFrame, key: String, k: Int): DataFrame = {
    val withTheta = sketches
      .withColumn("theta", theta(col("sk"), k))
    val ex = withTheta
      .select(col(key).as("k_"), col("theta"), explode(col("sk")).as("hv"))
    val a = ex.select(col("k_").as("key_a"), col("theta").as("theta_a"),
      col("hv"))
    val b = ex.select(col("k_").as("key_b"), col("theta").as("theta_b"),
      col("hv"))
    val common = a.join(b, "hv")
      .filter(col("key_a") < col("key_b"))
      .withColumn("th", least(col("theta_a"), col("theta_b")))
      .filter(col("hv").cast("double") / lit(KmvSpace) < col("th"))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n_common"), min(col("th")).as("th"))
    val keys = withTheta.select(col(key).as("k_"), col("theta"))
    val pairs = keys.select(col("k_").as("key_a"), col("theta").as("theta_a"))
      .join(broadcast(keys.select(col("k_").as("key_b"),
          col("theta").as("theta_b"))),
        col("key_a") < col("key_b"))
    pairs.join(common, Seq("key_a", "key_b"), "left")
      .select(col("key_a"), col("key_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          coalesce(col("th"), least(col("theta_a"), col("theta_b"))))
          .as("est_overlap"))
  }

  // ---------------- mergeable fixed-bin histograms ----------------

  /** Per-group equi-width histogram over [lo, hi): (groupCols..., bin,
    * cnt) for the NON-EMPTY bins (values clamped into range; rows where
    * `value` is null are skipped). Counts are exact and additive — the
    * partial frames of any finer grouping (per day, per shard, per
    * partition) sum to the coarser histogram, so the raw data is scanned
    * once ever. */
  /** The clamped bin index of `value` for a [lo, hi) fixed-bin histogram
    * — ONE definition shared by the batch sketch and the streaming twin
    * (`Streams.histIngest`), so their cells agree by construction. */
  private[graft] def histBin(value: Column, lo: Double, hi: Double,
                             bins: Int): Column = {
    val width = (hi - lo) / bins
    least(greatest(floor((value - lit(lo)) / lit(width)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
  }

  def histogramSketch(df: DataFrame, group: Seq[String], value: Column,
                      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"need bins >= 1 and hi > lo")
    val bin = histBin(value, lo, hi, bins)
    df.filter(value.isNotNull)
      .groupBy(group.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum partial histograms (same lo/hi/bins) to coarser groups — the
    * merge is plain addition over at most `bins` rows per group. */
  def histogramMerge(parts: DataFrame, group: Seq[String]): DataFrame =
    parts.groupBy(group.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile read-out of a histogram frame: for each prob p, the first
    * bin whose cumulative count reaches p·N, linearly interpolated within
    * the bin — deterministic arithmetic over ≤bins rows per group (the
    * DuckDB oracle replays it exactly; error ≤ one bin width). Output:
    * (groupCols..., p, est). */
  def histogramQuantiles(hist: DataFrame, group: Seq[String],
                         probs: Seq[Double], lo: Double, hi: Double,
                         bins: Int): DataFrame = {
    val width = (hi - lo) / bins
    val g = group.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("bin").asc)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(g: _*)))
    val withP = cum.crossJoin(broadcast(spark_probs(probs)))
    val hit = withP
      .filter(col("cum") >= col("p") * col("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(g :+ col("p"): _*).orderBy(col("bin").asc)))
      .filter(col("rn") === 1)
    hit.select(g ++ Seq(col("p"),
      (lit(lo) + col("bin") * lit(width) + lit(width) *
        (col("p") * col("n") - (col("cum") - col("cnt"))) / col("cnt"))
        .as("est")): _*)
  }

  /** The probs literal as a one-column frame (explode of a literal array
    * — k-scale, no data shuffle). */
  private def spark_probs(probs: Seq[Double]) = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    probs.toDF("p")
  }

  // ---------------- count-min frequency sketches ----------------

  /** The d per-row bucket indices of `value` for a depth-d width-w CMS:
    * row r hashes `"r|value"` through the engine-portable 60-bit hash
    * and takes it mod w — the salt-by-row-index construction every
    * oracle can replay verbatim. */
  private[graft] def cmsBuckets(value: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      pmod(kmvHash60(concat_ws("|", lit(r.toString), value)),
        lit(width.toLong))): _*)

  /**
   * Per-group count-min sketch of `value` frequencies: (groupCols...,
   * r int, bucket long, cnt long) — the NON-EMPTY cells of a depth×width
   * counter matrix. Build is one hash-aggregate whose map side combines
   * each scan partition down to ≤ depth·width cells per group, so the
   * shuffle moves O(groups · d · w) rows — the value domain itself never
   * moves (same discipline as [[kmvSketch]]; this is the FREQUENCY
   * complement of that cardinality sketch). Cells are additive, so
   * partial frames (per day, per shard) [[cmsMerge]] to coarser groups
   * by plain summation and the raw data is scanned once ever.
   *
   * Deterministic (salted md5 hashing, exact counts) — point estimates
   * replay exactly in the DuckDB oracle (q164). Estimate error is the
   * classic CMS bound: overcount ≤ 2N/w with probability 1 − (1/2)^d;
   * never an undercount.
   */
  def cmsSketch(df: DataFrame, group: Seq[String], value: Column,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1")
    df.filter(value.isNotNull)
      .select(group.map(col) :+
        posexplode(cmsBuckets(value, depth, width)): _*)
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "bucket")
      .groupBy(group.map(col) :+ col("r") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum partial CMS frames (same depth/width/salts) to coarser groups —
    * plain addition over ≤ d·w cells per group. */
  def cmsMerge(parts: DataFrame, group: Seq[String]): DataFrame =
    parts.groupBy(group.map(col) :+ col("r") :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /**
   * Equi-join SIZE estimate from two CMS sketches (AMS/CM inner
   * product, Cormode & Muthukrishnan 2005 §4.2): for each depth row r,
   * Σ_b cntA[r,b]·cntB[r,b] upper-bounds Σ_v fA(v)·fB(v) = |A ⋈ B| on
   * the sketched key (hash collisions only ADD cross terms); the
   * estimate is the MIN over the d rows. This is the planner statistic
   * that prices a join from two d·w-cell artifacts without touching
   * either table — at 100 TB each side's sketch is built once at
   * ingest (or maintained by `Streams.cmsIngest`) and every join-order
   * question afterwards is a d·w-row frame join.
   *
   * Inputs are ungrouped sketch frames (r, bucket, cnt) with the SAME
   * depth/width/salts. Output: one row, (est_join_size). Never an
   * undercount; deterministic, so the oracle replays it exactly.
   */
  def cmsInnerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    // products and their sum ride DECIMAL, not Long: at ~1e12 rows per
    // side a bucket product is ~4e18 and the row sum exceeds
    // Long.MaxValue — a silent wrap would UNDERCOUNT, the one error
    // direction the estimator contract rules out (the oracle's HUGEINT
    // stays exact, so a wrap is also a cross-engine divergence)
    val rp = a.select(col("r"), col("bucket"),
        col("cnt").cast("decimal(19,0)").as("ca"))
      .join(b.select(col("r"), col("bucket"),
          col("cnt").cast("decimal(19,0)").as("cb")),
        Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("rp"))
    // scaffold ALL d rows: a row with zero common buckets proves the
    // join empty (any shared key would populate every row) — its 0 must
    // win the min, not vanish from it
    a.sparkSession.range(depth).select(col("id").cast("int").as("r"))
      .join(rp, Seq("r"), "left")
      .agg(min(coalesce(col("rp"), lit(0L).cast("decimal(38,0)")))
        .as("est_join_size"))
  }

  /**
   * Point-frequency read-out: for each probe value (single-column
   * `probes` frame, column `v`, distinct'd here), est = min over the d
   * rows of the matching bucket's count (0 when a bucket is empty — the
   * value definitely never occurred). Output: (groupCols..., v, est).
   *
   * The probe side is d rows per probe value — broadcast onto the
   * sketch cells as an equi-join on (r, bucket), then a min-agg per
   * (group, v): every frame after the sketch build is probe-scale or
   * d·w-scale, never data-scale.
   */
  def cmsEstimate(sketch: DataFrame, group: Seq[String], probes: DataFrame,
                  depth: Int, width: Int): DataFrame = {
    val pv = probes.select(col("v")).distinct()
      .select(col("v"), posexplode(cmsBuckets(col("v"), depth, width)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "bucket")
    val cells = sketch.join(broadcast(pv), Seq("r", "bucket"))
    val scaffold =
      if (group.isEmpty) pv
      else sketch.select(group.map(col): _*).distinct().crossJoin(broadcast(pv))
    scaffold.join(cells, group :+ "v" :+ "r" :+ "bucket", "left")
      .groupBy((group :+ "v").map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---------------- DataSketches HLL production twin ----------------

  /** Per-group Apache DataSketches HLL_4 sketch of `value` as a BINARY
    * column — the compact production cardinality artifact (~2^lgK
    * 4-bit registers per group at ANY cardinality; KMV above is the
    * oracle-gated correctness twin). Parquet-storable; merge with
    * [[hllMerge]]. */
  def hllSketch(df: DataFrame, group: Seq[String], value: Column,
                lgK: Int = 12): DataFrame =
    df.groupBy(group.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Union stored HLL sketches to coarser groups and read the distinct
    * estimate: (groupCols..., est_distinct). Union of per-part sketches
    * with the same lgK is register-wise max — the merged estimate equals
    * the direct single-pass estimate (`SketchesSpec` asserts it). */
  def hllMerge(sketches: DataFrame, group: Seq[String]): DataFrame =
    sketches.groupBy(group.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as("est_distinct"))
}
