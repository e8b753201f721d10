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
    val leftCols = left.columns
    // right event time rides along as an internal payload: it drives the
    // tolerance check and is dropped at the end
    val rightTsTag = "_r__asof_ts"
    // harmonized union schema: left cols ++ payload (null on left) ++ side
    val lTagged = left
      .select(leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_r_$p")) ++
        Seq(lit(null).cast(right.schema(ts).dataType).as(rightTsTag),
          lit(1).as("_side")): _*)
    val rTagged = right
      .select(Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_r_$p")) ++
        Seq(col(ts).as(rightTsTag), lit(0).as("_side")): _*)
      .select((leftCols.map(col) ++ payload.map(p => col(s"_r_$p")) ++
        Seq(col(rightTsTag), col("_side"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(leftCols.map(col) ++ payload.map(p =>
        last(col(s"_r_$p"), ignoreNulls = true).over(w).as(s"asof_$p")) ++
        Seq(last(col(rightTsTag), ignoreNulls = true).over(w).as(rightTsTag),
          col("_side")): _*)
    val matched = carried.filter(col("_side") === 1)
    val out = toleranceSeconds match {
      case None => matched
      case Some(tol) =>
        // stale match → null payloads (row survives; the match doesn't)
        val fresh = col(rightTsTag).isNotNull &&
          unix_micros(col(ts)) - unix_micros(col(rightTsTag)) <= tol * 1000000L
        payload.foldLeft(matched) { (df, p) =>
          df.withColumn(s"asof_$p", when(fresh, col(s"asof_$p")))
        }
    }
    out.drop("_side", rightTsTag)
  }
}
