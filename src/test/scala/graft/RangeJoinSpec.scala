package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join == naive inequality join (row-identical), for any
  * bin width; and the plan is a real equi-join, not a nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // events across three hours, including exact boundary hits
  private lazy val left = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (2L, ts("2024-01-01 00:30:00"), 20.0),
    (3L, ts("2024-01-01 01:00:00"), 30.0), // == w1.from (inclusive)
    (4L, ts("2024-01-01 01:59:59.999999"), 40.0),
    (5L, ts("2024-01-01 02:00:00"), 50.0), // == w1.to (exclusive)
    (6L, ts("2024-01-01 02:45:00"), 60.0)
  ).toDF("id", "ts", "v")

  // overlapping windows, a zero-length window, an inverted one
  private lazy val intervals = Seq(
    ("w1", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
    ("w2", ts("2024-01-01 00:15:00"), ts("2024-01-01 02:30:00")),
    ("w3", ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00")), // empty
    ("w4", ts("2024-01-01 03:00:00"), ts("2024-01-01 01:00:00"))  // inverted
  ).toDF("wid", "from_ts", "to_ts")

  private def naive: DataFrame =
    left.crossJoin(intervals)
      .filter(col("ts") >= col("from_ts") && col("ts") < col("to_ts"))

  private def sortedRows(df: DataFrame) =
    df.select("id", "wid").orderBy("id", "wid").collect().toSeq

  test("binned join is row-identical to the naive inequality join") {
    val got = RangeJoin.binnedRangeJoin(
      left, "ts", intervals, "from_ts", "to_ts", binSeconds = 3600)
    assert(sortedRows(got) === sortedRows(naive))
    // boundary semantics: id=3 in w1 (from inclusive), id=5 not (to
    // exclusive); empty + inverted windows match nothing
    val w1 = got.filter($"wid" === "w1").select("id").as[Long].collect().sorted
    assert(w1.toSeq === Seq(3L, 4L))
    assert(got.filter($"wid".isin("w3", "w4")).isEmpty)
  }

  test("result is bin-width invariant (no dup across spanned bins)") {
    val expected = sortedRows(naive)
    for (w <- Seq(60L, 1800L, 86400L)) {
      val got = RangeJoin.binnedRangeJoin(
        left, "ts", intervals, "from_ts", "to_ts", binSeconds = w)
      assert(sortedRows(got) === expected, s"binSeconds=$w")
    }
  }

  test("plan is an equi-join on the bin, never a nested loop") {
    val p = RangeJoin.binnedRangeJoin(
      left, "ts", intervals, "from_ts", "to_ts", binSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "must not plan a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "must not nested-loop")
  }

  // interval×interval overlap: deterministic pseudo-random intervals with
  // duplicates, touching endpoints, containment, and inverted spans
  private lazy val ivA = (0 until 40).map { i =>
    val f = (i * 7919) % 10000
    (i.toLong, new Timestamp(1700000000000L + f * 1000L),
      new Timestamp(1700000000000L + (f + 300 + (i * 131) % 5000) * 1000L))
  }.toDF("a_id", "a_from", "a_to")
    .union(Seq((0L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")),
      (99L, ts("2024-01-01 02:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("a_id", "a_from", "a_to")) // empty + inverted: match nothing
  private lazy val ivB = (0 until 40).map { i =>
    val f = (i * 6271) % 10000
    (i.toLong + 1000L, new Timestamp(1700000000000L + f * 1000L),
      new Timestamp(1700000000000L + (f + 200 + (i * 523) % 7000) * 1000L))
  }.toDF("b_id", "b_from", "b_to")

  private def naiveOverlap: DataFrame =
    ivA.crossJoin(ivB)
      .filter(col("a_from") < col("b_to") && col("b_from") < col("a_to"))

  private def overlapRows(df: DataFrame) =
    df.select("a_id", "b_id").orderBy("a_id", "b_id").collect().toSeq

  test("interval overlap join is row-identical to the naive theta join, " +
      "for any bin width (exactly-once, no dedup pass)") {
    val expected = overlapRows(naiveOverlap)
    assert(expected.nonEmpty)
    for (w <- Seq(60L, 600L, 3600L, 86400L)) {
      val got = RangeJoin.intervalOverlapJoin(
        ivA, "a_from", "a_to", ivB, "b_from", "b_to", binSeconds = w)
      assert(overlapRows(got) === expected, s"binSeconds=$w")
    }
  }

  test("touching intervals do not overlap (half-open); containment does") {
    val a = Seq((1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("a_id", "a_from", "a_to")
    val b = Seq(
      (10L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00")), // touches
      (11L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")), // touches
      (12L, ts("2024-01-01 01:15:00"), ts("2024-01-01 01:30:00")), // inside
      (13L, ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00"))  // covers
    ).toDF("b_id", "b_from", "b_to")
    val got = RangeJoin.intervalOverlapJoin(
        a, "a_from", "a_to", b, "b_from", "b_to", binSeconds = 1800)
      .select("b_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(12L, 13L))
  }

  test("overlap plan is an equi-join on the bin, never a nested loop") {
    val p = RangeJoin.intervalOverlapJoin(
      ivA, "a_from", "a_to", ivB, "b_from", "b_to", binSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "must not plan a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "must not nested-loop")
  }
}
