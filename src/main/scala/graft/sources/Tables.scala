package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (no native Spark type — read as a nanos long under the
    * legacy conf and floor-convert in exact integer math) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) in others (read as
    * TIMESTAMP_NTZ). [[normalizeEventTs]] folds both to microsecond
    * TimestampType so every downstream operator sees one event-time type. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Fold whichever physical `ts` the events parquet carries to
    * microsecond TimestampType: nanos-as-long gets `div 1000` (integer
    * math — a double cast loses precision above 2^53 ns), TIMESTAMP_NTZ
    * gets a wall-clock-preserving cast (sessions here pin UTC), and
    * TimestampType passes through. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Engine tuning applied to whatever session runs the queries (runtime
    * SQL confs — safe to set repeatedly; load() is the chokepoint every
    * query passes through, so driver-owned sessions get it too).
    *
    * minPartitionSize: AQE's partition coalescing targets BYTES, but this
    * engine's hot stages are CPU-bound joins whose inputs are tiny and
    * whose outputs fan out 100× (blocked ER: 2 MB of accounts → 600k
    * pairs × Jaro-Winkler/Levenshtein). With the 1 MB default AQE folds
    * those stages to 1-2 tasks and the similarity kernels serialize on
    * one core — measured at sf0.1 this single conf took the full ER
    * resolve from 8.5s to 2.0s on 32 cores. 16 KB still merges empty/
    * near-empty partitions while preserving the configured parallelism
    * for compute-heavy small-byte stages. */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
    // normalizeEventTs's NTZ→timestamp cast is instant-correct only under
    // a UTC session zone; every in-repo entrypoint pins it, but external
    // driver-owned sessions pass through here too — enforce at the
    // chokepoint so a non-UTC host JVM can't silently shift event times
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Scan + spread: `load` followed by a round-robin repartition to the
    * session's default parallelism.
    *
    * The testdata tables are single-file, SINGLE-ROW-GROUP parquet — Spark
    * cannot split them, so every scan stage runs as ONE task and any
    * per-row-heavy pipeline (regex normalize, md5 shingling, similarity
    * kernels) serializes on one core no matter how many are available.
    * One tiny shuffle (these tables are KBs–MBs) buys full-cluster
    * parallelism for the compute above it; Catalyst still pushes filters
    * and column pruning THROUGH the repartition into the scan.
    *
    * At 100 TB tables are many-file datasets and scans parallelize
    * naturally — use plain `load` there; this helper is the standard move
    * for a small hot table feeding expensive per-row work (same idiom as
    * spreading a single gzip'd input). */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

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
    stampMetadata(df, orgId, orgName, lit(extractedAt))

  /** Column overload — pass `lit("...").cast("timestamp")` to parse the
    * stamp in the SESSION timezone (a java.sql.Timestamp parses in the
    * JVM default TZ, which shifts the rendered stamp on non-UTC hosts). */
  def stampMetadata(df: DataFrame, orgId: String, orgName: String,
                    extractedAt: Column): DataFrame =
    df.withColumn("_org_id", lit(orgId))
      .withColumn("_org_name", lit(orgName))
      .withColumn("_extracted_at", extractedAt)

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
