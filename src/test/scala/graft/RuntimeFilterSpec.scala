package graft

import org.apache.spark.sql.functions._

/**
 * Runtime row-level join pruning (Spark's runtime Bloom filter, SPARK-32268
 * family): when a selective dimension filter exists, the optimizer can
 * inject a Bloom filter built from the dim side into the fact scan, so
 * fact rows that cannot join are dropped AT THE SCAN — at 100 TB this is
 * the difference between shuffling the whole fact table and shuffling the
 * ~join-surviving fraction. The engine relies on the built-in rewrite
 * rather than hand-rolled semi-join reductions; this spec proves the
 * rewrite fires on our star-join shape once the size thresholds are met
 * (testdata is far below the production defaults, so the thresholds are
 * floored for the assertion — the SHAPE is what's size-invariant).
 */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact-side plan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the non-broadcast join path: broadcast joins don't need the
      // runtime filter (the hash set itself prunes)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(sum("o_totalprice").as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("might_contain"),
        s"runtime bloom filter must be injected into the fact side:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
