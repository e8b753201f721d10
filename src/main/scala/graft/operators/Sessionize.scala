package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: split each key's event stream into sessions
 * wherever the inter-event gap exceeds `gapSeconds` — the standard
 * clickstream/training-log primitive (the streaming twin is
 * `session_window`; this is the batch/backfill shape).
 *
 * Plan: one window per key ordered by (ts, tiebreak) → lag gap → boundary
 * flag → running sum = session ordinal; then a groupBy (key, session)
 * rollup. Two shuffles total (window + agg), both on the key — no
 * self-join, no range explosion. At 100 TB partition the input by
 * key-date in storage and the window sort is within-partition only.
 */
object Sessionize {

  /** Per-event session ordinal (1-based) added as `session`. `tiebreak`
    * makes equal-ts ordering deterministic. */
  def withSessionIds(events: DataFrame, key: Column, ts: Column,
                     tiebreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.asc, tiebreak.asc)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session rollup: (key, session, start, end, n_events, agg columns). */
  def sessions(events: DataFrame, key: Column, ts: Column, tiebreak: Column,
               gapSeconds: Long, aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(ts).as("session_start"),
      max(ts).as("session_end"),
      count(lit(1)).as("n_events"))
    withSessionIds(events, key, ts, tiebreak, gapSeconds)
      .groupBy(key.as("key"), col("session"))
      .agg((base ++ aggs).head, (base ++ aggs).tail: _*)
  }
}
