package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet table access for the engine.
 *
 * Mirrors the reference's connector layer (reference:
 * src/connectors/base.py:108-133 `extract_all`, salesforce.py:308-343
 * SOQL scan) re-expressed as declarative parquet scans: projection and
 * predicates are applied by the caller on the returned DataFrame and
 * Catalyst pushes them into the parquet reader (PushedFilters /
 * ReadSchema), which is the Spark-native equivalent of the reference
 * building SOQL WHERE/field-list strings by hand.
 *
 * Scale note: at 100 TB each table is a partitioned parquet dataset; a
 * directory of files reads identically (`spark.read.parquet(dir)`), and
 * nothing here assumes single-file inputs.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table. `dir` is an sf directory like /root/testdata/sf0.01.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for — read it as a nanos long (legacy conf) and floor-convert
    * to microsecond TimestampType (`div 1000` stays in exact integer math;
    * a double cast would lose precision above 2^53 ns). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view so `spark.sql` works (reference:
    * dashboard.py:53-80 SQL-over-tables pattern). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /**
   * Metadata stamp applied to every extract (reference: base.py:151-156
   * appends _org_id/_org_name/_extracted_at to each entity DataFrame).
   * `extractedAt` is a parameter rather than current_timestamp() so runs
   * are replayable/hash-stable (SURVEY §7.4.3).
   */
  def stampMetadata(df: DataFrame, orgId: String, orgName: String,
                    extractedAt: java.sql.Timestamp): DataFrame =
    df.withColumn("_org_id", lit(orgId))
      .withColumn("_org_name", lit(orgName))
      .withColumn("_extracted_at", lit(extractedAt))

  /**
   * High-water-mark incremental read (reference: data_contracts.py:235-275
   * builds `LastModifiedDate > {watermark}` SOQL fragments). As a parquet
   * predicate this prunes row groups via min/max stats — at 100 TB with
   * date-partitioned layout it also prunes whole partitions.
   */
  def hwmRead(df: DataFrame, tsCol: String, watermark: java.sql.Timestamp): DataFrame =
    df.filter(col(tsCol) > lit(watermark))

  /**
   * Multi-org union (reference: orchestrator.py:183-201 asyncio.gather over
   * orgs). In Spark the per-org frames are unioned and the org id is just a
   * column — parallelism comes from partitions, not tasks-per-org.
   */
  def unionOrgs(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}
