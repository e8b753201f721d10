package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression gates for the r7 judge findings — each of these
  * queries had a scale-killing physical plan that was fixed in r8; these
  * specs pin the FIXED shape so a refactor can't silently revert it:
  *
  *  - q82 compiled k count_distincts into Expand×(k+1) + SortAggregate
  *    (6× row-blowup sort-shuffle) → now two hash-agg passes, no Expand;
  *  - q78 used the buffering PercentileDisc aggregate (whole group's
  *    value→count map in one aggregation buffer) → now rank selection;
  *  - q123 re-executed the events scan + rank window per consumer
  *    (4 parquet scans) → now one scan into a checkpointed rank frame.
  *
  * Gates read the EXECUTED plan of the declared query on sf0.001 — the
  * same builders the driver runs, not test doubles. q123's builder
  * eagerly materializes its checkpoints at construction time; its gate
  * therefore counts scans in the post-checkpoint plan (the parquet scan
  * ran inside the materialized stage, exactly once by the q78/q99/q123
  * giant-path construction).
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q82: no Expand — the multi-distinct blowup stays dead") {
    val plan = executedPlan("q82_column_profile")
    // the r7 defect was Expand×(k+1): every row replicated per distinct
    // column, then sort-aggregated on a (k+1)-part KEY. The remaining
    // SortAggregate(key=[]) on pass 1 is benign — a GLOBAL agg whose
    // string min/max buffers just aren't hash-buffer types; no grouping
    // key, no row blowup, one row out per partition.
    assert(!plan.contains("Expand"), "Expand×(k+1) multi-distinct is back")
    assert(!"SortAggregate\\(key=\\[[^\\]]".r.findFirstIn(plan).isDefined,
      "a KEYED sort aggregate appeared — the profile shuffle is sorting rows again")
  }

  test("q78: no buffering percentile aggregate — rank selection only") {
    val plan = executedPlan("q78_percentiles")
    assert(!plan.toLowerCase.contains("percentile"),
      "the PercentileDisc buffering aggregate is back")
  }

  test("q123: at most one parquet scan in the final plan (rank frame " +
      "materialized once, consumers read the checkpoint)") {
    val plan = executedPlan("q123_mad_anomalies")
    val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).size
    assert(scans <= 1, s"q123 re-grew to $scans parquet scans (r7: 4)")
  }

  test("q133: the Bloom prefilter predicate sits in the plan ahead of the " +
      "exact join") {
    val plan = executedPlan("q133_decontaminate_bloom")
    assert(plan.contains("might_contain"),
      "bloom scan-local prune missing — q133 degenerated to the q93 plan")
  }

  test("q159: the salt really spreads the hot ER block — salt columns in " +
      "the join key and the 8x b-side explode in the plan") {
    val plan = executedPlan("q159_er_salted_skew")
    // SaltedJoin.joinOn: a-side salted on its id, b-side exploded 8x;
    // both must survive into the executed plan or the query silently
    // degenerated to the unsalted single-reducer join
    assert(plan.contains("_salt_big") && plan.contains("_salt_rep"),
      "salt columns missing from the q159 plan — the join is unsalted")
    assert(plan.contains("Generate explode"),
      "b-side salt explode missing — replication collapsed")
    // the skewed fixture really is skewed: the hot block holds ~20% of
    // the frame (the premise the salt exists for)
    val acc = graft.queries.ErQueries.skewedAccountsForSpec(spark, dir)
    val blocks = graft.operators.EntityResolution
      .prepSide(acc, graft.operators.EntityResolution.AccountCols(), "a")
      .groupBy("a_block").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = blocks.values.sum.toDouble
    val hot = blocks.filter(_._1.startsWith("cus")).values.sum
    assert(hot / total > 0.15 && hot / total < 0.25,
      s"hot-block share ${hot / total} drifted off the ~20% design")
    // and the hot mass is ONE block, not ~20% smeared across many: the
    // fixture's nations all share the "nat" country prefix, so the
    // unmutated names' full key collapses to a single "cus_nat" block —
    // the premise that makes the salt worth demonstrating
    val single = blocks.maxBy(_._2)
    assert(single._1.startsWith("cus") &&
      single._2.toDouble / total > 0.15,
      s"hot mass not concentrated in one block: $single of $total")
  }
}
