package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table storage for co-located joins (SURVEY §4 physical knobs;
 * the "pre-partitioning/bucketing" leg of the scale design).
 *
 * Writing both sides of a hot join bucketed (and sorted) by the join key
 * lets Spark plan a sort-merge join with ZERO Exchange — at 100 TB the
 * shuffle of a fact-fact join is usually the single largest cost in the
 * pipeline, and bucketing moves it from every-query to write-once.
 * `BucketingSpec` asserts the no-Exchange plan property.
 *
 * Usage notes at scale:
 *  - bucket count ≈ target parallelism at the LARGEST consumer (both
 *    sides must agree for co-location; plan bucket counts centrally);
 *  - also `sortBy` the key so the SMJ skips its sort;
 *  - bucketed writes require `saveAsTable` (metastore-backed; a local
 *    warehouse dir suffices in tests and on ephemeral clusters).
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned as an
    * exchange-free sort-merge join. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
