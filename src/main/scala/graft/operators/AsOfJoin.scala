package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for each left row, the most recent right
 * row with the same key and `right.ts <= left.ts` — the feature-store /
 * training-data primitive that prevents label leakage (features "as of"
 * the example's event time, never after).
 *
 * Spark-first shape: UNION + WINDOW, not a range join. Tag both sides,
 * union, then one window per key ordered by (ts, side, tiebreak) carrying
 * `last(payload, ignoreNulls)` forward; left rows read the running value.
 * Cost is one shuffle on the key + a sort — O((L+R) log) per key — where
 * a naive `left.ts >= right.ts` theta-join materializes O(L·R) pairs per
 * key before aggregation (quadratic in the hot keys, exactly what kills
 * at 100 TB). This is the standard scalable as-of plan; Flink/Kafka
 * temporal joins and kdb aj are the same algorithm.
 *
 * Right side must be unique per (key, ts) — pre-dedup with
 * [[latestPerKeyTs]] for deterministic semantics (ties on ts would
 * otherwise make "the" most recent row ambiguous). Inclusive: a right
 * row at exactly left.ts matches (side ordering puts right before left).
 */
object AsOfJoin {

  /** Deterministic right-side prep: one row per (key, ts), keeping the
    * row with the greatest tiebreak (e.g. event id). */
  def latestPerKeyTs(right: DataFrame, key: Column, ts: Column,
                     tiebreak: Column): DataFrame =
    TopK.topKPerGroup(right, Seq(key, ts), Seq(tiebreak.desc), 1).drop("rn")

  /**
   * @param left      probe side; all its columns are preserved
   * @param right     build side, unique per (key, ts)
   * @param key       join key column name present on BOTH sides
   * @param ts        event-time column name present on BOTH sides
   * @param payload   right columns to carry (emitted as `asof_<name>`,
   *                  null when no right row precedes the left row)
   * @param toleranceSeconds  optional max staleness: a right row older
   *                  than `left.ts - tolerance` does NOT match (payloads
   *                  null) — the kdb `aj`/Flink temporal-join dial that
   *                  keeps ancient state from leaking into features
   */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String],
           toleranceSeconds: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    // The whole right row is carried as ONE struct (right ts + payload
    // fields) under a single last(_, ignoreNulls=true): right rows are
    // always non-null at the struct level, so a right row whose payload
    // value is NULL correctly yields NULL (per-column carries would leak
    // an older row's non-null value), and the emitted payload always
    // comes from the same row whose ts the tolerance check judges.
    val rtsField = "_rts"
    val carryTag = "_r__asof_carry"
    val carryType = StructType(
      StructField(rtsField, right.schema(ts).dataType) +:
        payload.map(p => right.schema(p).copy(name = p)))
    // harmonized union schema: left cols ++ carry struct (null on left) ++ side
    val lTagged = left
      .select(leftCols.map(col) ++
        Seq(lit(null).cast(carryType).as(carryTag), lit(1).as("_side")): _*)
    val rTagged = right
      .select(Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(col(ts).as(rtsField) +: payload.map(col): _*)
            .cast(carryType).as(carryTag),
          lit(0).as("_side")): _*)
      .select((leftCols.map(col) ++ Seq(col(carryTag), col("_side"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(leftCols.map(col) ++
        Seq(last(col(carryTag), ignoreNulls = true).over(w).as(carryTag),
          col("_side")): _*)
      .filter(col("_side") === 1)
    val fresh = toleranceSeconds match {
      case None => col(carryTag).isNotNull
      case Some(tol) =>
        // stale match → null payloads (row survives; the match doesn't)
        col(carryTag).isNotNull &&
          unix_micros(col(ts)) - unix_micros(col(carryTag)(rtsField)) <=
            tol * 1000000L
    }
    carried
      .select(leftCols.map(col) ++ payload.map(p =>
        when(fresh, col(carryTag)(p)).as(s"asof_$p")): _*)
  }

  /**
   * Forward as-of join: for each left row, the EARLIEST right row with
   * the same key and `right.ts >= left.ts` — the outcome-attribution
   * direction ("first purchase after this touch", "next failure after
   * this deploy"), where [[asOf]] is the feature direction ("state as
   * of this event"). Same union+window plan, mirrored: the running
   * carry is `first(_, ignoreNulls)` over the FORWARD frame, ties at
   * equal ts sort the right row after the left so the match is
   * inclusive, and `toleranceSeconds` bounds the lookahead horizon
   * (a right row later than `left.ts + tolerance` does not match).
   * Emits payloads as `next_<name>`. Right side unique per (key, ts) —
   * prep with [[latestPerKeyTs]].
   */
  def asOfNext(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val rtsField = "_rts"
    val carryTag = "_r__asofnext_carry"
    val carryType = StructType(
      StructField(rtsField, right.schema(ts).dataType) +:
        payload.map(p => right.schema(p).copy(name = p)))
    val lTagged = left
      .select(leftCols.map(col) ++
        Seq(lit(null).cast(carryType).as(carryTag), lit(0).as("_side")): _*)
    val rTagged = right
      .select(Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(col(ts).as(rtsField) +: payload.map(col): _*)
            .cast(carryType).as(carryTag),
          lit(1).as("_side")): _*)
      .select((leftCols.map(col) ++ Seq(col(carryTag), col("_side"))): _*)
    // forward frame: [current row, end); right rows at the same ts sort
    // AFTER the left row (side 0 < 1) so an exactly-simultaneous right
    // row is inside the frame — inclusive, mirroring asOf
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = lTagged.unionByName(rTagged)
      .select(leftCols.map(col) ++
        Seq(first(col(carryTag), ignoreNulls = true).over(w).as(carryTag),
          col("_side")): _*)
      .filter(col("_side") === 0)
    val fresh = toleranceSeconds match {
      case None => col(carryTag).isNotNull
      case Some(tol) =>
        col(carryTag).isNotNull &&
          unix_micros(col(carryTag)(rtsField)) - unix_micros(col(ts)) <=
            tol * 1000000L
    }
    carried
      .select(leftCols.map(col) ++ payload.map(p =>
        when(fresh, col(carryTag)(p)).as(s"next_$p")): _*)
  }
}
