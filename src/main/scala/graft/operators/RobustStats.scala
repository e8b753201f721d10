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
 * shuffles twice. Groups are the parallelism unit; a single giant group
 * degenerates to one partition's sort — winsorize within sensible strata.
 */
object RobustStats {

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
                       pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "need 0 < pLo < pHi < 1")
    val byGrp = Window.partitionBy(col("grp"))
    val ranked = df.select(grp.as("grp"), v.as("v"), tiebreak.as("tb"))
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(byGrp.orderBy(col("v"), col("tb"))))
      .withColumn("n", count(lit(1)).over(byGrp))
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
    * diverge in the last ulp). Scale shape: one hash Exchange on the
    * group key feeds both rank windows and both rollups (the broadcast
    * median/MAD joins preserve partitioning); groups are the
    * parallelism unit, as with winsorize. */
  def madAnomalies(df: DataFrame, grp: Column, v: Column, tiebreak: Column,
                   k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val byGrp = Window.partitionBy(col("grp"))
    val lowerMed = floor((col("n") + 1) / lit(2)).cast("long")
    val ranked = df.select(grp.as("grp"), v.as("v"), tiebreak.as("tb"))
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(byGrp.orderBy(col("v"), col("tb"))))
      .withColumn("n", count(lit(1)).over(byGrp))
    val med = ranked.groupBy("grp")
      .agg(min(when(col("rn") === lowerMed, col("v"))).as("med"))
    val dev = ranked.join(broadcast(med), "grp")
      .withColumn("d", abs(col("v") - col("med")))
    val mad = dev
      .withColumn("rnd", row_number().over(byGrp.orderBy(col("d"), col("tb"))))
      .groupBy("grp")
      .agg(min(when(col("rnd") === lowerMed, col("d"))).as("mad"))
    dev.join(broadcast(mad), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("median"),
        min(col("mad")).as("mad"),
        sum((col("d") > lit(k) * col("mad")).cast("long")).as("n_anomalies"))
  }
}
