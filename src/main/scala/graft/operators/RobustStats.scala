package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Robust per-group feature scaling: winsorization (percentile clipping) —
 * the outlier-clamping step feature pipelines run before normalization
 * (reference analogue: the log1p/ratio feature hygiene `pipeline.py:70-89`;
 * beyond-reference — SURVEY §7.5).
 *
 * Thresholds are ORDER STATISTICS (the value at rank ceil(p·n), a real
 * element of the group), not interpolated quantiles: interpolation
 * arithmetic differs across engines in the last ulp, which flips
 * clip-boundary comparisons; rank selection is exactly reproducible
 * anywhere (the DuckDB oracle replays it row-for-row).
 *
 * Scale shape: one hash Exchange on the group key feeds both windows
 * (rank + group size); the threshold table is one row per group —
 * broadcast back; the clipped rollup reuses the same grouping. Nothing
 * shuffles twice. In the default window path groups are the parallelism
 * unit; pass `giantGroups = true` when a single group can exceed one
 * executor's sort budget (e.g. 5 event types over a 100 TB fact table) —
 * [[rankedByGroup]] then switches to a range-partitioned selection where
 * a giant group spans many partitions, each sorting its value slice in
 * parallel.
 */
object RobustStats {

  /** Per-group rank frame: (grp, v, tb) → + `rn` (1-based row_number
    * ordered by (v, tb) within grp) and `n` (group size), nulls in `v`
    * excluded. `tb` must make the order total within a group or `rn` is
    * only value-deterministic (rank SELECTION of a value at a fixed rank
    * is tie-invariant either way). Two physically different, row-identical
    * paths (spec-gated):
    *
    * - window (default): one hash Exchange on grp, each group ranked in
    *   ONE task — right when groups are plentiful relative to cores.
    * - range (`giantGroups = true`): global range-partitioned sort on
    *   (grp, v, tb) — the TeraSort shape, a giant group spans MANY
    *   partitions sorting in parallel — then zipWithIndex (one
    *   lightweight partition-size job against the checkpointed sort) and
    *   per-group start offsets broadcast back: rn = gi − g0 + 1. No
    *   single task ever holds a whole group. The returned frame is
    *   checkpoint-BACKED (one stored copy — the inner sort checkpoint is
    *   freed once the output is materialized): multi-consumer callers
    *   get materialize-once for free and must NOT re-checkpoint it. The
    *   output blocks are freed by the harness per query (Bench/Verify
    *   clearPinned), the repo-wide localCheckpoint convention.
    */
  def rankedByGroup(df: DataFrame, grp: Column, v: Column, tb: Column,
                    giantGroups: Boolean = false): DataFrame = {
    val slim = df.select(grp.as("grp"), v.as("v"), tb.as("tb"))
      .filter(col("v").isNotNull)
    if (!giantGroups) {
      val byGrp = Window.partitionBy(col("grp"))
      slim
        .withColumn("rn",
          row_number().over(byGrp.orderBy(col("v"), col("tb"))).cast("long"))
        .withColumn("n", count(lit(1)).over(byGrp))
    } else {
      val spark = df.sparkSession
      val sorted = slim
        .repartitionByRange(col("grp"), col("v"), col("tb"))
        .sortWithinPartitions("grp", "v", "tb")
        .localCheckpoint()
      val schema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
          "gi", org.apache.spark.sql.types.LongType, nullable = false))
      val withIdx = spark.createDataFrame(
        sorted.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }, schema)
      // one row per group — broadcastable by the operator's contract
      // (a group count small enough to window over is small enough to
      // broadcast; giant GROUPS, not many groups, is this path's regime)
      val starts = withIdx.groupBy("grp")
        .agg(min(col("gi")).as("g0"), count(lit(1)).as("n"))
      // materialize the FINAL frame and free the inner sort checkpoint:
      // one stored copy, and multi-consumer callers get materialize-once
      // without re-checkpointing (the giant branch's output is already
      // checkpoint-backed — callers must not wrap it again)
      val out = withIdx.join(broadcast(starts), "grp")
        .select(col("grp"), col("v"), col("tb"),
          (col("gi") - col("g0") + lit(1L)).as("rn"), col("n"))
        .localCheckpoint()
      org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(sorted)
      out
    }
  }

  /** The k-1 order-statistic boundaries that split `v` into k equal-rank
    * parts (value at rank ceil(n·x/k), x = 1..k-1), as a ONE-ROW frame
    * with a sorted `e: array<double>` — broadcast it and score rows
    * scan-locally with `1 + size(filter(e, _ < v))`. The engine-exact
    * quantile-bucketing primitive behind RFM scores (q109) and the PSI
    * drift bins (`quality.Drift`), and a substitute for any "global
    * ntile" need.
    *
    * Selection is EXACT and DISTRIBUTED: a range-partitioned sort (the
    * TeraSort shape — every partition sorts its value range in parallel)
    * + zipWithIndex (one lightweight partition-size job) + a filter on
    * the k-1 target ranks. An ntile/row_number window with no partition
    * key would instead serialize the whole input through ONE task —
    * fine at spec scale, a stall at 100 TB. The value column is
    * localCheckpointed first: the selection runs THREE actions (count,
    * zipWithIndex's partition-size job, collect), and without the
    * checkpoint each would re-execute the CALLER's upstream pipeline
    * (Drift.psiBins passes arbitrary frames in). Collects only k-1
    * doubles. The value at a given rank is tie-order independent, so
    * the result is identical to the window form row-for-row (the
    * DuckDB oracle replays it). Null values are EXCLUDED before
    * ranking — they would occupy the low ranks and silently shift
    * every edge. */
  def orderStatEdges(df: DataFrame, v: Column, k: Int): DataFrame = {
    require(k > 1, "need at least 2 parts")
    val vals = df.select(v.cast("double").as("v")).filter(col("v").isNotNull)
      .localCheckpoint()
    val n = vals.count()
    // same rank arithmetic as the SQL oracle: ceil(n·x/k) in double math
    val targets = (1 until k)
      .map(x => math.ceil((n * x).toDouble / k.toDouble).toLong).toSet
    val edges = vals.sort("v").select("v").rdd.map(_.getDouble(0))
      .zipWithIndex()
      .filter { case (_, i) => targets.contains(i + 1) } // rank is 1-based
      .map(_._1).collect().sorted
    // the k-1 doubles are on the driver — release the checkpoint blocks
    // now instead of pinning them for the session's lifetime
    org.apache.spark.sql.graftshim.GraftShim.freeLocalCheckpoint(vals)
    val spark = df.sparkSession
    import spark.implicits._
    Seq(Tuple1(edges.toSeq)).toDF("e")
  }

  /**
   * Per-group winsorized rollup: thresholds at ranks ceil(pLo·n) /
   * ceil(pHi·n), values clipped into [p_lo, p_hi], summed as
   * decimal(18,2) (order-independent — the q71 lesson). Returns
   * (grp, n, p_lo, p_hi, sum_clipped, n_low, n_high). Null values are
   * EXCLUDED up front (they would occupy the low ranks, null the
   * thresholds, and null-poison the clip counts); `n` counts non-null
   * rows only.
   *
   * `tiebreak` must make the rank order total (equal values, e.g. 2dp
   * money, are common) — without it the selected threshold is still
   * deterministic but clip counts at the boundary could differ between
   * engines.
   */
  def winsorizedRollup(df: DataFrame, grp: Column, v: Column, tiebreak: Column,
                       pLo: Double = 0.05, pHi: Double = 0.95,
                       giantGroups: Boolean = false): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "need 0 < pLo < pHi < 1")
    // materialized once: the rank frame feeds the threshold agg AND the
    // clipped rollup — without the checkpoint each consumer re-executes
    // the scan + rank (harness frees the blocks per query). The giant
    // branch already returns a checkpoint-backed frame — don't store a
    // second copy.
    val rf = rankedByGroup(df, grp, v, tiebreak, giantGroups)
    val ranked = if (giantGroups) rf else rf.localCheckpoint()
    val kLo = greatest(ceil(lit(pLo) * col("n")).cast("long"), lit(1L))
    val kHi = greatest(ceil(lit(pHi) * col("n")).cast("long"), lit(1L))
    val th = ranked.groupBy("grp").agg(
      min(when(col("rn") === kLo, col("v"))).as("p_lo"),
      min(when(col("rn") === kHi, col("v"))).as("p_hi"),
      min(col("n")).as("n"))
    val clipped = least(greatest(col("v"), col("p_lo")), col("p_hi"))
    ranked.join(broadcast(th.drop("n")), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        min(col("p_lo")).as("p_lo"), min(col("p_hi")).as("p_hi"),
        sum(clipped.cast("decimal(18,2)")).cast("double").as("sum_clipped"),
        sum((col("v") < col("p_lo")).cast("long")).as("n_low"),
        sum((col("v") > col("p_hi")).cast("long")).as("n_high"))
  }

  /** Per-group robust anomaly gate: rows with |v − median| > k·MAD
    * (median absolute deviation), rolled up per group as (n, median,
    * mad, n_anomalies). The mean/σ z-score breaks down exactly when
    * anomalies are present (outliers inflate σ and mask themselves);
    * median and MAD have 50% breakdown. `k` stays an INTEGER multiple —
    * the textbook 1.4826·MAD σ-consistency constant is a fractional
    * literal whose decimal-vs-double representation differs across
    * engines (graft-wide oracle rule), and a threshold gate doesn't need
    * σ units.
    *
    * Both medians are EXACT lower-median order statistics selected by
    * rank (winsorizedRollup discipline — no interpolation arithmetic to
    * diverge in the last ulp). Scale shape: the rank frame is
    * materialized ONCE (localCheckpoint — it feeds the median agg, the
    * deviation join, the MAD rank, and the final rollup; without it each
    * consumer re-executes the scan + rank window, the r7 four-scan
    * plan); the broadcast median/MAD joins add no Exchange. Groups are
    * the parallelism unit in the default window path — pass
    * `giantGroups = true` for the range-partitioned selection
    * ([[rankedByGroup]]) when a group can outgrow one task's sort. */
  def madAnomalies(df: DataFrame, grp: Column, v: Column, tiebreak: Column,
                   k: Int = 3, giantGroups: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lowerMed = floor((col("n") + 1) / lit(2)).cast("long")
    // giant branch output is already checkpoint-backed (see winsorize)
    val rf = rankedByGroup(df, grp, v, tiebreak, giantGroups)
    val ranked = if (giantGroups) rf else rf.localCheckpoint()
    val med = ranked.groupBy("grp")
      .agg(min(when(col("rn") === lowerMed, col("v"))).as("med"))
    val dev = ranked.join(broadcast(med), "grp")
      .withColumn("d", abs(col("v") - col("med")))
    // second rank round, over deviations: same helper, same path choice
    // (v is the deviation here, so the agg's col("v") IS d at rank)
    val mad = rankedByGroup(dev, col("grp"), col("d"), col("tb"), giantGroups)
      .groupBy("grp")
      .agg(min(when(col("rn") === lowerMed, col("v"))).as("mad"))
    dev.join(broadcast(mad), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("median"),
        min(col("mad")).as("mad"),
        sum((col("d") > lit(k) * col("mad")).cast("long")).as("n_anomalies"))
  }
}
