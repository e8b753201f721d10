package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate analytics — the 100 TB path for cardinality
 * and quantile questions where exactness costs a full shuffle of the
 * distinct domain:
 *
 *  - `approxDistinct`: HyperLogLog++ via `approx_count_distinct` — fixed
 *    ~kilobytes of state per group regardless of cardinality, vs
 *    `count_distinct`'s shuffle of every distinct value. `rsd` dials
 *    sketch size against error.
 *  - `approxQuantiles`: Greenwald-Khanna via `percentile_approx` —
 *    mergeable bounded-size summaries, vs exact percentile's per-group
 *    sort of all values.
 *
 * Both are MERGEABLE sketches (partial aggregation works; accuracy is
 * partition-independent), which is the property that makes them safe at
 * any scale. Not oracle-checked (approximate by construction,
 * implementation-specific estimates); `SketchesSpec` gates accuracy
 * against exact answers on seeded data instead.
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
}
