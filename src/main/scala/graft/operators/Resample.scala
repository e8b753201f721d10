package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Time-series resampling: daily calendar scaffold + forward fill — the
 * gap-filling step feature pipelines need before rolling windows or
 * as-of training labels (missing days would silently shrink window
 * denominators). Reference analogue: the daily-trend rollups
 * `dashboard.py:71-79` / `api/main.py:750-761`, which skip empty days;
 * this operator materializes them.
 *
 * Scale shape: the scaffold is generated per key from that key's own
 * [min, max] span (`sequence()` + explode — scan-local row generation, no
 * driver loop), so total rows are Σ_key span_days, not |keys| × global
 * span. The forward-fill window and the daily aggregate both partition by
 * the key — at 1000 executors every key's calendar builds and fills
 * independently. Keys with multi-year spans are the skew risk; they emit
 * O(span) rows, which is the operator's contract (a per-key span cap is
 * the caller's curation decision).
 */
object Resample {

  /**
   * Daily gap-fill: one row per (key, day) for every day in the key's
   * observed [min(ts), max(ts)] span, with
   *  - `day_total`: that day's Σ value (0.0 on gap days), and
   *  - `filled`: the most recent non-gap day's total (forward fill; never
   *    null — day 1 of each key's span is observed by construction).
   *
   * `value` is summed as decimal(18,2): double partial-agg order diverges
   * between engines at rounding boundaries (the q71 lesson — ADVICE r3);
   * 2dp money casts exactly and decimal addition is order-independent.
   */
  def gapFillDaily(df: DataFrame, key: Column, ts: Column,
                   value: Column): DataFrame = {
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg(sum(value.cast("decimal(18,2)")).cast("double").as("total"))
    val span = df.groupBy(key.as("key"))
      .agg(to_date(min(ts)).as("d0"), to_date(max(ts)).as("d1"))
    val cal = span.select(col("key"),
      explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("total"), lit(0.0)).as("day_total"),
        last(col("total"), ignoreNulls = true).over(w).as("filled"))
  }
}
