package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for a representative query set —
  * the `.explain("formatted")` review loop (PushedFilters, ReadSchema,
  * broadcast selection, WholeStageCodegen spans). Usage:
  *   tools/run.sh graft.Plans [sfDir] > PLANS.md */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq(
      "q01_pricing_summary",   // scan + partial agg: pushdown + pruning
      "q04_join_fk_rollup",    // star join: broadcast + SMJ selection
      "q09_topk_per_group",    // window top-k
      "q28_broadcast_lookup",  // explicit broadcast hash join
      "q35_recommendations",   // candidate pairs + features + rank
      "q43_minhash_neardups",  // dedup: scan-local doc state/band join/merge-walk verify
      "q56_ranking_metrics",   // global windows + single-row agg
      "q69_asof_join",         // as-of: union + keyed window, no range join
      "q72_ivf_assign",        // IVF: broadcast NL join + argmax partial agg
      "q84_corpus_clean",      // curation funnel: one scan/window/agg
      "q85_pq_adc_topk",       // PQ: broadcast codebook encode + ADC lookup
      "q86_scd2_intervals",    // SCD2: two windows, one shared Exchange
      "q87_incremental_rollup",// old ⊕ delta algebraic merge, two scans
      "q89_range_join_windows",// binned range join: equi-join, no NL
      "q93_decontaminate",     // bench grams broadcast, corpus never SMJs
      "q94_bm25",              // scan-local tfs + one broadcast stats row
      "q96_pack_sequences",    // per-shard prefix-sum window
      "q98_chunk_docs",        // scan-local row generation, no hash shuffle
      "q103_funnel")           // chained stage windows, one user Exchange
    println("# PLANS -- formatted physical plans of representative queries\n")
    println(s"Generated against `$sfDir` (plan shapes are SF-invariant).\n")
    picks.foreach { name =>
      println(s"## $name\n")
      println("```")
      val df = SparkEntry.queries(name)(spark, sfDir)
      // queryExecution.explainString avoids stdout interleaving
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```\n")
    }
    println("## entry (flagship)\n")
    println("```")
    println(SparkEntry.entry(spark).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("```")
    spark.stop()
  }
}
