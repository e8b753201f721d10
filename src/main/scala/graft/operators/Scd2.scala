package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCD2 (slowly-changing-dimension type 2) history: compress a keyed
 * event stream to its change points and derive validity intervals
 * [valid_from, valid_to); the open interval (valid_to null) is the
 * current state. [[build]] is the full-rebuild shape q86 gates;
 * [[merge]] is the INCREMENTAL upsert — the nightly-batch production
 * shape: a delta of new events is folded into a stored history without
 * re-reading the closed intervals, and the result is row-identical to a
 * full rebuild (q139 gates merged == rebuilt against the q86 oracle).
 *
 * Scale (100 TB): merge work ∝ |delta| + |touched keys|. The untouched
 * keys pass through as a LEFT ANTI join (with the history stored
 * key-partitioned this is a partition-preserving scan, and a
 * partition-overwrite writer rewrites only touched partitions); the
 * touched keys' closed intervals pass through unchanged; only the open
 * interval per touched key (one row) joins the delta in the window
 * recompute. All joins and both windows share the key, so AQE plans
 * them over one Exchange family — the history fact table is never
 * globally re-sorted.
 *
 * Contract: the delta is strictly later than the history (every delta
 * event ts > every stored event ts for that key — the append-only
 * watermark discipline of `Tables.hwmRead`). Late data behind the
 * watermark needs a rebuild of the affected keys ([[build]] on their
 * full event set); [[merge]] does not silently reorder history.
 */
object Scd2 {

  /** Canonical internal frame: (key, ts, tb, state). */
  private def canon(events: DataFrame, key: Column, ts: Column,
                    tiebreak: Column, state: Column): DataFrame =
    events.select(key.as("key"), ts.as("ts"),
      tiebreak.cast("long").as("tb"), state.as("state"))

  private def intervalsFromCanon(c: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("key")).orderBy(col("ts"), col("tb"))
    c.withColumn("_prev", lag(col("state"), 1).over(byKey))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byKey))
      .select(col("key"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Full SCD2 build: change-point compression + lead() validity
    * intervals, both windows on one key-partitioned Exchange (q86). */
  def build(events: DataFrame, key: Column, ts: Column, tiebreak: Column,
            state: Column): DataFrame =
    intervalsFromCanon(canon(events, key, ts, tiebreak, state))

  /**
   * Incremental merge of a strictly-later event delta into a stored
   * history (schema = [[build]] output). Three disjoint slices:
   *  - keys with no delta events: history rows pass through (anti join);
   *  - touched keys' CLOSED intervals: pass through (immutable — the
   *    delta is later than everything in them);
   *  - touched keys' OPEN interval: re-enters the change-point window as
   *    a seed row (its state at its original valid_from) unioned with
   *    the key's delta events, so a delta event repeating the current
   *    state is correctly NOT a change, the first real change closes the
   *    open interval at its ts, and keys new in the delta (no seed)
   *    build from scratch.
   *
   * `validate = true` checks the strictly-later contract to the
   * tightest bound the STORED history retains: one small job over the
   * delta (work ∝ |delta| — the delta joins the one-open-row-per-key
   * slice of history, never the closed intervals) asserts every delta
   * event's ts is strictly after its key's open-interval valid_from,
   * failing loudly with the violating keys. This is best-effort by
   * information-theoretic necessity, not implementation choice: a
   * same-state repeat event AFTER the last change point is compressed
   * away by the SCD2 build, so a late event landing between that
   * change point and the compressed-away repeat is indistinguishable
   * from a conforming one given only the stored intervals (and would
   * still corrupt merged == rebuilt). Exact enforcement needs the true
   * per-key event high-watermark, which lives at the ingest boundary —
   * the `Tables.hwmRead` discipline — not in the history table; gate
   * there for exactness. Off by default to keep merge a pure
   * transformation (no eager job at call time).
   */
  def merge(history: DataFrame, delta: DataFrame, key: Column, ts: Column,
            tiebreak: Column, state: Column,
            validate: Boolean = false): DataFrame = {
    val d = canon(delta, key, ts, tiebreak, state)
    if (validate) {
      val openFrom = history.filter(col("is_current"))
        .select(col("key"), col("valid_from"))
      val bad = d.join(openFrom, Seq("key"))
        .filter(col("ts") <= col("valid_from"))
        .select(col("key")).distinct().limit(20)
        .collect().map(_.get(0)).toSeq
      require(bad.isEmpty,
        s"Scd2.merge: delta violates the strictly-later contract for " +
          s"key(s) ${bad.mkString(", ")} — event ts <= the key's open " +
          "interval valid_from. Late data needs a rebuild of those keys.")
    }
    val touched = d.select(col("key")).distinct()
    val untouched = history.join(touched, Seq("key"), "left_anti")
    val touchedHist = history.join(touched, Seq("key"))
    val closed = touchedHist.filter(!col("is_current"))
      .select("key", "state", "valid_from", "valid_to", "is_current")
    // seed tb = Long.MinValue: the open interval's start precedes every
    // delta event by the strictly-later contract, so the tiebreak never
    // decides against a real event — it only pins determinism
    val seeds = touchedHist.filter(col("is_current"))
      .select(col("key"), col("valid_from").as("ts"),
        lit(Long.MinValue).as("tb"), col("state"))
    // closed intervals end at the NEXT change's ts; recomputing the open
    // slice cannot move any closed boundary, so `closed` unioned with
    // the re-windowed (seed ∪ delta) intervals tiles the key's timeline
    // exactly as a full rebuild does
    untouched.unionByName(closed)
      .unionByName(intervalsFromCanon(seeds.unionByName(d)))
  }
}
