package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * EXACT top-k most-frequent values in two scans with a BOUNDED shuffle —
 * the heavy-hitter plan for domains too large to groupBy outright.
 *
 * The naive `groupBy(key).count.orderBy.limit(k)` shuffles one row per
 * DISTINCT key; at 100 TB with a high-cardinality key (user id, URL,
 * n-gram) that intermediate dwarfs the answer. Instead:
 *
 *  1. Candidate pass: per-partition Misra-Gries summaries of `capacity`
 *     counters (mapPartitions, O(capacity) memory, amortized O(1) per
 *     row). A key absent from a partition's summary has fewer than
 *     n_p/capacity occurrences there, so a key absent from EVERY summary
 *     has global count < n/capacity — the union of summary keys is a
 *     superset of every key with count ≥ n/capacity. The union is at
 *     most partitions × capacity rows: the only shuffle of pass 1.
 *  2. Recount pass: broadcast the candidate set, semi-join the raw rows,
 *     exact groupBy count of candidates only, deterministic top-k
 *     (count desc, key asc).
 *
 * The result is EXACT — partition-invariant despite the partition-
 * dependent candidate set — whenever the k-th returned count exceeds
 * n/capacity (any key the summaries missed is strictly smaller than
 * everything returned, ties included). `HeavyHittersSpec` asserts
 * equality with the full groupBy across repartitionings at a capacity
 * small enough to force evictions; q90's oracle is the full groupBy
 * in DuckDB. Null keys are excluded (a null "value" is not a value).
 *
 * Reference counterpart: `value_counts()`-style rollups
 * (`dashboard.py:182`) — exact but materializing every distinct key;
 * this is the beyond-reference scale path.
 */
object HeavyHitters {

  /** Exact (count desc, key asc) top-k of `df`'s `key` column.
    * `capacity` bounds pass-1 memory per partition and sets the
    * exactness certificate threshold n/capacity. */
  def topKFrequent(df: DataFrame, key: String, k: Int,
                   capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity > 0, s"k=$k, capacity=$capacity must be > 0")
    val spark = df.sparkSession
    import spark.implicits._

    val keyed = df.filter(col(key).isNotNull)
    val candidates = keyed.select(col(key).cast("string")).as[String]
      .mapPartitions(misraGriesKeys(_, capacity)).toDF("_hh_key")
      .distinct()

    keyed
      .join(broadcast(candidates), col(key).cast("string") === col("_hh_key"))
      .groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
  }

  /** One Misra-Gries update step on a mutable counter map: increment if
    * tracked, insert if below capacity, else decrement-all (evicting
    * zeros). Amortized O(1)/row — each eviction step burns `capacity`+1
    * count mass and mass only enters one unit per row. Shared by the
    * batch candidate pass here and the streaming twin
    * ([[graft.streaming.Streams.heavyHittersStream]]). */
  private[graft] def misraGriesStep(counters: mutable.HashMap[String, Long],
                                    v: String, capacity: Int): Unit =
    counters.get(v) match {
      case Some(c) => counters.update(v, c + 1)
      case None if counters.size < capacity => counters.update(v, 1L)
      case None =>
        val survivors = counters.toList // snapshot: no mutation mid-iteration
        counters.clear()
        survivors.foreach { case (kk, c) =>
          if (c > 1L) counters.update(kk, c - 1)
        }
    }

  /** Misra-Gries summary of one partition: the surviving counter keys. */
  private def misraGriesKeys(rows: Iterator[String],
                             capacity: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    rows.foreach(misraGriesStep(counters, _, capacity))
    counters.keysIterator
  }
}
