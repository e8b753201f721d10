package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Binned range join: interval-containment join (`left.ts ∈ [from, to)`)
 * with NO equi-key. Spark plans the naive inequality-only join as a
 * BroadcastNestedLoopJoin (small build side) or a cartesian product —
 * O(|L|·|R|) comparisons, which at 100 TB is the difference between a
 * job and an outage. Binning converts it into a plain hash equi-join:
 *
 *  - every left row gets exactly ONE bin: `floor(us(ts) / binWidth)`;
 *  - every interval explodes to ALL bins it overlaps
 *    (`sequence(floor(us(from)/w), floor((us(to)-1)/w))`, `to` exclusive);
 *  - equi-join on the bin, then re-check the exact containment predicate.
 *
 * Each matching (row, interval) pair meets in exactly one bin — the
 * row's — so the output needs no dedup pass and is row-identical to the
 * naive join (`RangeJoinSpec` asserts this, and that the plan carries a
 * real equi-join, not a nested loop). Comparisons drop from |L|·|R| to
 * |L| · (avg intervals overlapping a bin), and the join shuffles/
 * broadcasts like any other equi-join — AQE can skew-split a hot bin.
 *
 * Pick `binSeconds` near the typical interval length: much smaller bins
 * inflate the interval explosion (≈ len/width + 1 copies); much larger
 * bins degrade toward the nested loop within each bin pair.
 *
 * Reference has no range-join surface (SURVEY §2.3 "notably absent");
 * this is the beyond-reference scale path for event-to-window
 * attribution (campaign/incident/maintenance windows).
 */
object RangeJoin {

  /** Inner join of `left` rows to `intervals` rows whose
    * `[fromCol, toCol)` contains `left.tsCol`. Column sets must be
    * disjoint. Timestamps compare at microsecond precision. Empty or
    * inverted intervals (`from >= to`) match nothing, as in the naive
    * formulation. */
  def binnedRangeJoin(left: DataFrame, tsCol: String,
                      intervals: DataFrame, fromCol: String, toCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val w = lit(binSeconds * 1000000L)
    val l = left.withColumn("_bin", floor(unix_micros(col(tsCol)) / w))
    val iv = intervals
      .filter(col(fromCol) < col(toCol))
      .withColumn("_bin", explode(sequence(
        floor(unix_micros(col(fromCol)) / w),
        floor((unix_micros(col(toCol)) - lit(1L)) / w))))
    l.join(iv, Seq("_bin"))
      .filter(col(tsCol) >= col(fromCol) && col(tsCol) < col(toCol))
      .drop("_bin")
  }

  /** Inner join of interval pairs that OVERLAP: `[aFrom, aTo)` and
    * `[bFrom, bTo)` with `aFrom < bTo && bFrom < aTo` — the general
    * interval×interval case [[binnedRangeJoin]]'s point-in-interval
    * shape can't express (campaign×incident, maintenance×shipment,
    * session×outage attribution).
    *
    * Both sides explode into the bins they cover, equi-join on the bin,
    * re-check exact overlap — and keep each pair only in the ONE bin
    * containing `max(aFrom, bFrom)`. For an overlapping pair that bin
    * is covered by both sides (`max(from) < min(to)` ⇒ it lies inside
    * both intervals), so the output is exactly the naive theta join
    * with NO dedup pass — `distinct()` here would shuffle the full
    * result and change multiplicity semantics for duplicate input rows.
    * Comparisons drop from |A|·|B| to bin-local products; the join
    * shuffles like any equi-join (AQE skew-split applies). Column sets
    * must be disjoint; empty/inverted intervals match nothing. */
  def intervalOverlapJoin(a: DataFrame, aFromCol: String, aToCol: String,
                          b: DataFrame, bFromCol: String, bToCol: String,
                          binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val w = lit(binSeconds * 1000000L)
    def binned(df: DataFrame, fromCol: String, toCol: String): DataFrame =
      df.filter(col(fromCol) < col(toCol))
        .withColumn("_bin", explode(sequence(
          floor(unix_micros(col(fromCol)) / w),
          floor((unix_micros(col(toCol)) - lit(1L)) / w))))
    binned(a, aFromCol, aToCol).join(binned(b, bFromCol, bToCol), Seq("_bin"))
      .filter(col(aFromCol) < col(bToCol) && col(bFromCol) < col(aToCol))
      .filter(col("_bin") === floor(greatest(
        unix_micros(col(aFromCol)), unix_micros(col(bFromCol))) / w))
      .drop("_bin")
  }
}
