package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Consistent-hash A/B traffic router (reference:
 * src/ml/feedback_logging.py:546-571 — md5(session) as a 128-bit int,
 * bucket = (hash % 1000)/1000, walk the sorted cumulative allocation).
 *
 * Bit-exact with the reference: Python takes the FULL 128-bit digest mod
 * 1000; we compute it from the two unsigned 64-bit halves as
 * (hi % 1000 * 616 + lo % 1000) % 1000, since 2^64 ≡ 616 (mod 1000).
 * Pure column expressions (md5/conv/decimal arithmetic) — the router is
 * a codegen'd projection, usable in a scoring pipeline at any scale, and
 * the same expression is SQL-expressible for the DuckDB oracle.
 */
object AbRouter {

  /** Bucket id in [0, 1000). */
  def bucket(sessionId: Column): Column = {
    val hex = md5(sessionId)
    val hi = conv(substring(hex, 1, 16), 16, 10).cast(DecimalType(38, 0))
    val lo = conv(substring(hex, 17, 16), 16, 10).cast(DecimalType(38, 0))
    pmod(pmod(hi, lit(1000)) * 616 + pmod(lo, lit(1000)), lit(1000))
      .cast("long")
  }

  /** Variant assignment from a traffic allocation (version → share).
    * Matches the reference walk: versions sorted, first whose cumulative
    * share exceeds the bucket fraction; falls through to the last
    * version when shares sum < 1 (reference :566-571). */
  def assignVariant(sessionId: Column, allocation: Seq[(String, Double)]): Column = {
    require(allocation.nonEmpty, "allocation must not be empty")
    val sorted = allocation.sortBy(_._1)
    val frac = bucket(sessionId) / 1000.0
    val cums = sorted.scanLeft(0.0)(_ + _._2).tail
    sorted.zip(cums).foldRight(lit(sorted.last._1): Column) {
      case (((version, _), cum), fallback) =>
        when(frac < cum, version).otherwise(fallback)
    }
  }
}
