package graft.evaluate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/**
 * Poisson-bootstrap confidence intervals — uncertainty for metrics on
 * data too large to resample (Chamandy et al. 2012, "Estimating
 * Uncertainty for Massive Data Streams", Google TR; the standard
 * at-scale replacement for the classical bootstrap): instead of
 * materializing B resamples of N rows, each row gets a Poisson(1)
 * replicate WEIGHT per bootstrap replica (for large N, multinomial
 * resampling ≡ independent Poisson(1) counts), so all B replica
 * metrics come out of ONE aggregation pass over the data.
 *
 * Determinism (the engine-wide Sampling discipline): the Poisson draw
 * for (row, replica) is the inverse CDF applied to an md5-derived
 * uniform — partition-invariant, replayable in any engine with md5.
 * Replicas are drawn 4 per digest (`md5(salt:key#block)` sliced into
 * four 8-hex-char lanes): the digest is the scan's dominant cost
 * (measured ~4× everything else), and one 128-bit md5 holds four
 * independent 32-bit uniforms. The inverse CDF is a fixed
 * when-chain over the cumulative Poisson(1) probabilities embedded as
 * double literals (Double.toString round-trips exactly), capped at 8:
 * the ~1e-5 of draws past cdf(7) all take weight 8, distorting the true
 * Poisson by only P[X > 8] ≈ 1.1e-6 — the hash's own resolution. The
 * cap is part of the pinned semantics, not an approximation knob.
 *
 * Plan shape (100 TB): the ×B replica explode is scan-local and feeds
 * straight into a hash aggregate with map-side combine — the shuffle
 * carries B rows per group, never B×N. Replica means use
 * DECIMAL(38,12)-exact term sums (order-invariant); the interval is an
 * exact order statistic over the ≤B replica means (rank selection, no
 * interpolation — engines disagree on interpolated percentiles).
 */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at k = 0..7 (weight k is assigned when
    * u < cdf(k) first succeeds, else 8). Public so oracle SQL can embed
    * the EXACT same doubles (Double.toString round-trips). */
  val cdf: Seq[Double] = {
    val invFact = (0 to 7).scanLeft(1.0) { case (acc, k) => acc / (k + 1) }
      .init // 1/k! for k = 0..7
    invFact.scanLeft(0.0)((acc, pk) => acc + pk * math.exp(-1.0)).tail
  }

  /** Inverse Poisson(1) CDF over an already-computed uniform. Callers
    * MUST materialize `u` as its own column first: the when-chain
    * references it 8 times, and an inlined md5 chain would be
    * re-evaluated per branch (8× the scan cost — measured). */
  def poissonWeightFromUniform(u: Column): Column =
    cdf.zipWithIndex.foldRight(lit(8): Column) { case ((c, k), acc) =>
      when(u < lit(c), lit(k)).otherwise(acc)
    }

  /** Deterministic Poisson(1) weight for (key, replica) as one
    * expression — spec/convenience form; hot paths go through
    * [[poissonWeightFromUniform]] on a materialized uniform column. */
  def poissonWeight(key: Column, replica: Column,
                    salt: String = "bs"): Column =
    poissonWeightFromUniform(Sampling.hashUniform(
      concat(key.cast("string"), lit("#"), replica.cast("string")), salt))

  /**
   * Per-group mean with a (1−alpha) percentile-bootstrap CI:
   * (groupBy…, n, mean, ci_lo, ci_hi). `replicas` = B; lo/hi are the
   * ceil(B'·α/2)-th and ceil(B'·(1−α/2))-th smallest replica means
   * (ties broken by replica id), B' = replicas with nonzero total
   * weight — degenerate replicas are vanishingly rare above ~100 rows
   * per group but pinned out anyway.
   */
  def meanCI(df: DataFrame, key: Column, value: Column,
             groupBy: Seq[String], replicas: Int = 200,
             alpha: Double = 0.05, salt: String = "bs"): DataFrame = {
    require(replicas >= 2 && alpha > 0 && alpha < 1)
    val g = groupBy.map(col)
    // mean over the NON-NULL values: sum() skips nulls but count(*)
    // would count them, silently deflating the point mean and every
    // replica mean toward 0 (null-as-zero) — the one null policy no
    // caller ever wants from a "mean"
    val base = df.select(g :+ key.as("_k") :+ value.as("_v"): _*)
      .filter(col("_v").isNotNull)

    val point = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("_v").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("mean"))

    // one md5 yields FOUR 32-bit uniforms (8 hex chars each) — the
    // hash is the scan's dominant cost (measured 4×), so replicas are
    // drawn in blocks of 4 lanes per digest; the oracle slices the
    // same digest at the same offsets
    val blocks = (replicas + 3) / 4
    // the ×B explode multiplies whatever parallelism the scan came with
    // — a small input (one split) would run the whole replica pipeline
    // on one core; spread it on the row key first (one tiny shuffle of
    // the ORIGINAL rows, never the replicas)
    val reps = base.repartition(col("_k"))
      .select(col("_k") +: col("_v") +: g :+
        explode(sequence(lit(0), lit(blocks - 1))).as("_bk"): _*)
      .withColumn("_lanes", org.apache.spark.sql.graftshim.GraftShim.column(
        graft.functions.Md5Lanes4(
          org.apache.spark.sql.graftshim.GraftShim.expr(
            concat(lit(s"$salt:"), col("_k").cast("string"), lit("#"),
              col("_bk").cast("string"))))))
      .select(col("_v") +: col("_bk") +: g :+
        posexplode(col("_lanes")): _*)
      .withColumn("_r", col("_bk") * 4 + col("pos"))
      .filter(col("_r") < replicas)
      .withColumn("_u", pmod(col("col"), lit(1000000L)).cast("double") / 1e6)
      .withColumn("_w", poissonWeightFromUniform(col("_u")))
      .groupBy(g :+ col("_r"): _*)
      .agg(sum(col("_w")).as("_wn"),
        sum((col("_w") * col("_v")).cast("decimal(38,12)")).as("_ws"))
      .filter(col("_wn") > 0)
      .withColumn("_m", col("_ws").cast("double") / col("_wn"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val ranked = reps
      .withColumn("_rk", row_number().over(w.orderBy(col("_m"), col("_r"))))
      .withColumn("_b", count(lit(1)).over(w))
    val ci = ranked
      .groupBy(g: _*)
      .agg(
        max(when(col("_rk") ===
          ceil(col("_b") * (alpha / 2)).cast("int"), col("_m"))).as("ci_lo"),
        max(when(col("_rk") ===
          ceil(col("_b") * (1 - alpha / 2)).cast("int"), col("_m"))).as("ci_hi"))

    point.join(ci, groupBy, "left")
  }
}
