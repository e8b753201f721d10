package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Privacy-preserving export operators: k-anonymity suppression and
 * quasi-identifier generalization (Sweeney 2002) — the release gate a
 * training-data or analytics export runs before rows leave the
 * governed store. Complements the PII-pattern redaction family (q79),
 * which masks VALUES; this bounds RE-IDENTIFICATION: no released row's
 * quasi-identifier combination may be shared by fewer than k rows.
 *
 * Scale (100 TB): suppression is one partial-agg groupBy over the
 * quasi columns (the group frame is |distinct combinations| rows —
 * small after generalization) joined back on the same keys; never a
 * window over the fact table, so the fact side is one shuffle on the
 * quasi key and the map-side combine carries one row per combination
 * per partition. Generalization is scan-local column arithmetic.
 */
object Privacy {

  /** Numeric generalization: half-open value band [n·width, (n+1)·width)
    * rendered as "lo-hi" — coarsens a high-cardinality quasi-identifier
    * (salary, account balance, age) so groups can reach size k. */
  def bandLabel(c: Column, width: Long): Column = {
    val lo = floor(c.cast("double") / width).cast("long") * width
    concat(lo.cast("string"), lit("-"), (lo + width).cast("string"))
  }

  /**
   * k-anonymity suppression: keep only rows whose quasi-identifier
   * combination is shared by ≥ k rows; emit `group_size` as the
   * released anonymity evidence. Rows in smaller groups are SUPPRESSED
   * (dropped) — generalize more coarsely ([[bandLabel]]) when the
   * suppression rate is unacceptable.
   */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(quasi.nonEmpty,
      "kAnonymize needs at least one quasi-identifier column (an empty " +
        "list would silently degrade the release gate to a global count)")
    // the audit frame IS the suppression gate's input — one counting
    // semantics for both (a future approximate/weighted count changes
    // the gate and the reviewer report together)
    val counts = kAnonymityProfile(df, quasi, k)
      .filter(col("released")).drop("released")
    // NULL-SAFE join: a null quasi value is a legitimate group of its
    // own (groupBy already counts it as one) — a plain equi-join would
    // silently suppress every null-keyed row regardless of group size,
    // which is a correctness hole in a release gate, not anonymity
    val renamed = quasi.foldLeft(counts)((d, c) =>
      d.withColumnRenamed(c, s"_q_$c"))
    val cond = quasi.map(c => df(c) <=> renamed(s"_q_$c")).reduce(_ && _)
    df.join(renamed, cond).drop(quasi.map(c => s"_q_$c"): _*)
  }

  /** Per-combination suppression audit: group size and whether the
    * group survives at `k` — the report a release reviewer reads
    * (suppressed mass, not suppressed rows). */
  def kAnonymityProfile(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("released", col("group_size") >= k)
}
