package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropsCases, SparkSpec}

/** Property invariant for the incremental SCD2 merge: for ANY keyed
  * event set and ANY watermark split, merge(build(≤hwm), >hwm) must be
  * row-identical to build(all) — the q139 gate generalized beyond its
  * one fixture. Small state spaces (few keys, few states, coarse
  * timestamps) force the interesting collisions: same-state runs
  * crossing the watermark, keys entirely before/after it, duplicate
  * timestamps decided by the event-id tiebreak. */
class Scd2PropsSpec extends SparkSpec with PropsCases {

  private lazy val s = spark
  import s.implicits._

  test("merge(hist ≤ hwm, delta > hwm) == build(all) for random event sets " +
      "and random watermarks") {
    val caseGen = for {
      nEv <- Gen.choose(20, 80)
      rows <- Gen.listOfN(nEv, for {
        u <- Gen.choose(1L, 6L)
        t <- Gen.choose(0L, 50L)
        st <- Gen.oneOf("a", "b", "c")
      } yield (u, t, st))
      hwm <- Gen.choose(-1L, 51L) // includes empty-history and empty-delta
    } yield (rows, hwm)
    cases(caseGen, 8).foreach { case (rows, hwm) =>
      // unique event ids as the tiebreak; duplicate (u, t) kept on purpose
      val ev = rows.zipWithIndex
        .map { case ((u, t, st), i) => (u, t, i.toLong, st) }
        .toDF("user", "t", "eid", "state")
        .select(col("user"), timestamp_seconds(col("t")).as("ts"),
          col("eid"), col("state"))
      def rowSet(df: org.apache.spark.sql.DataFrame) = df
        .select("key", "state", "valid_from", "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.getTimestamp(2)).map(_.getTime),
          Option(r.getTimestamp(3)).map(_.getTime), r.getBoolean(4)))
        .toSet
      val full = Scd2.build(ev, col("user"), col("ts"), col("eid"),
        col("state"))
      val hist = Scd2.build(ev.filter(col("t") <= hwm), col("user"),
        col("ts"), col("eid"), col("state"))
      val merged = Scd2.merge(hist, ev.filter(col("t") > hwm), col("user"),
        col("ts"), col("eid"), col("state"))
      assert(rowSet(merged) === rowSet(full),
        s"merge != rebuild at hwm=$hwm over ${rows.size} events")
    }
  }
}
