package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel ordering/window semantics and cohort-offset algebra on
  * hand-computed mini-frames (q103/q104 pin exact values vs DuckDB). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, ty) => (u, Timestamp.valueOf(t), ty) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: order matters, windows bound each step, first events chain") {
    val events = ev(
      // u1 converts fully in order
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2 clicks BEFORE viewing — click must not count
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      // u3 clicks too late (outside the 24h step window)
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-03 10:00:00", "click"),
      // u4 purchases before clicking — purchase must not count
      (4L, "2024-01-01 10:00:00", "view"),
      (4L, "2024-01-01 10:30:00", "purchase"),
      (4L, "2024-01-01 11:00:00", "click"))
    val out = EventAnalytics.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("stage1_view") === 4L)
    assert(out("stage2_click") === 2L)     // u1 and u4
    assert(out("stage3_purchase") === 1L)  // only u1 (u4's purchase precedes click)
  }

  test("funnel: empty input yields 0 users per stage, never null") {
    val out = EventAnalytics.funnel(ev(), col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    // a global agg over zero users sums to null without the coalesce —
    // the count(*) oracle (and any Long-reading caller) expects 0
    assert(out === Map("stage1_view" -> 0L, "stage2_click" -> 0L,
      "stage3_purchase" -> 0L))
  }

  test("retentionCohorts: cohort anchored on first event of type, offsets distinct per day") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "purchase"),
      (1L, "2024-01-01 18:00:00", "purchase"), // same day → one cell
      (1L, "2024-01-03 10:00:00", "purchase"),
      (2L, "2024-01-02 10:00:00", "purchase"),
      (2L, "2024-01-02 11:00:00", "view"))     // non-anchor type ignored
    val out = EventAnalytics.retentionCohorts(events, col("user_id"),
        col("ts"), col("event_type"), "purchase", maxOffset = 14)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L))
  }
}
