package graft

/**
 * Physical-plan regression gates: the scale properties SCALING.md claims
 * (pushdown, broadcast selection, shared Exchanges, no global windows in
 * hot paths) asserted against the live optimizer, so a refactor that
 * silently loses one fails CI rather than the 1000-executor cluster.
 * Plan SHAPES are SF-invariant — sf0.001 inputs drive the same choices.
 */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter is pushed to the parquet scan, schema is pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "shipdate predicate must reach the reader")
    assert(!p.contains("l_orderkey"),
      "untouched columns must not survive into the scan schema")
  }

  test("q28: dimension lookup is a broadcast hash join") {
    val p = plan("q28_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), "small dim must broadcast")
    assert(!p.contains("SortMergeJoin"), "lookup must not shuffle the fact side")
  }

  test("q86: both SCD2 windows share one hash Exchange") {
    val p = plan("q86_scd2_intervals")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1,
      s"change-point + interval windows must reuse one user-partitioned " +
        s"Exchange, found $hashExchanges")
  }

  test("q74: per-term df is aggregated, never a global window") {
    val p = plan("q74_tfidf")
    // exactly ONE window (the per-doc top-k); df must be a groupBy, not a
    // second window over term
    val windows = "Window ".r.findAllIn(p).length
    assert(windows === 1, s"expected only the top-k window, found $windows")
    assert(p.contains("HashAggregate"), "df path must partial-aggregate")
  }

  test("q87: incremental merge reuses partial aggregates (no extra scan of history)") {
    val p = plan("q87_incremental_rollup")
    // two branch scans (old + delta) then a single merge agg — the plan
    // must not re-read events a third time
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 2, s"expected old+delta scans only, found $scans")
  }

  test("q85: PQ codebook and ADC table are broadcast, vectors are not shuffled pre-encode") {
    val p = plan("q85_pq_adc_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "codebook must broadcast")
  }

  test("q93: benchmark gram set broadcasts; the corpus side never sort-merges") {
    val p = plan("q93_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "eval-set grams are tiny by nature and must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not shuffle for the gram probe")
  }

  test("q94: BM25 stats are one broadcast scalar row, tfs stay scan-local") {
    val p = plan("q94_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the N/avgdl/df stats row must broadcast back")
    assert(!"Exchange hashpartitioning".r.findAllIn(p).exists(_ => true),
      "per-doc tf computation must not shuffle (scan-local size(filter(...)))")
  }

  test("q96: packing is per-shard (no single-partition global window)") {
    val p = plan("q96_pack_sequences")
    assert(p.contains("Exchange hashpartitioning"),
      "the prefix-sum window must partition by shard")
    assert(!p.contains("Exchange SinglePartition"),
      "packing must never serialize through one partition")
  }

  test("q103: all funnel stages chain over ONE user-hash Exchange") {
    val p = plan("q103_funnel")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1,
      s"stage windows + per-user collapse must share one user Exchange, " +
        s"found $hashExchanges")
  }

  test("q98: chunking is pure scan-local row generation (no hash shuffle)") {
    val p = plan("q98_chunk_docs")
    // allowed: the loadSpread round-robin (testdata is single-row-group)
    // and the final presentation ORDER BY; never a hash shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      "chunk generation must not hash-shuffle")
    assert(!p.contains("Exchange SinglePartition"),
      "chunk generation must not serialize through one partition")
  }

  test("q117: corpus census is one partial-agg pass, no window, no join") {
    val p = plan("q117_corpus_census")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "census aggregates must combine map-side")
    assert(!p.contains("Window"), "census must not use a window")
    assert(!p.contains("Join"), "census must not join")
  }

  test("q111/q113: stamped extract and org union are narrow (no hash " +
      "shuffle before the presentation sort)") {
    for (q <- Seq("q111_stamped_extract", "q113_union_orgs")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q: stamping/union must not hash-shuffle")
      assert(!p.contains("Window"), s"$q: no window expected")
    }
  }
}
