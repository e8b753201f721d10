package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Two-pass heavy hitters == full groupBy top-k, partition-invariant,
  * at a capacity small enough to force Misra-Gries evictions. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: key i appears ~ N/i times → clear hitters + a long tail
  private lazy val skewed = spark.range(1, 200)
    .select(explode(sequence(lit(1), (lit(400) / col("id")).cast("int")))
      .as("rep"), col("id"))
    .select(concat(lit("k"), col("id")).as("key"))

  private def exact(k: Int) =
    skewed.groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc).limit(k)
      .collect().toSeq

  test("equals the full groupBy top-k under forced evictions") {
    // n ≈ 400·H(199) ≈ 2350; capacity 64 → certificate n/cap ≈ 37:
    // the top-5 counts (400, 200, 133, 100, 80) all clear it
    val got = HeavyHitters.topKFrequent(skewed, "key", k = 5, capacity = 64)
    assert(got.collect().toSeq === exact(5))
  }

  test("result is partition-invariant") {
    val expected = exact(5)
    for (parts <- Seq(1, 3, 16)) {
      val got = HeavyHitters.topKFrequent(
        skewed.repartition(parts), "key", k = 5, capacity = 64)
      assert(got.collect().toSeq === expected, s"parts=$parts")
    }
  }

  test("null keys are excluded, k > distinct returns all") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None)
      .toDF("key")
    val got = HeavyHitters.topKFrequent(df, "key", k = 10, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }

  test("candidate shuffle is bounded: no full-domain aggregation before the join") {
    // the pass-1 aggregate runs on ≤ partitions×capacity candidate rows;
    // assert the plan joins a broadcast candidate set (the recount side
    // never shuffles the raw domain)
    val p = HeavyHitters.topKFrequent(skewed, "key", 5, 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "candidates must broadcast")
  }
}
