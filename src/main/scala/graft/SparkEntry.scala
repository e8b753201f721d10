package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TopK
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   *
   * The SURVEY §7.2 minimum end-to-end slice re-expressed over the testdata:
   * two "orgs" (customers split by custkey parity) → top-100 by account
   * balance per org (candidate cap, reference: pipeline.py:335-336) →
   * blocked pair join within nation (reference: entity_resolution.py:287-294)
   * → pair-feature columns → rule score → ranked recommendations
   * (reference: pipeline.py:300-371).
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("_org_id", when(col("c_custkey") % 2 === 0, "org_a").otherwise("org_b"))
    // candidate cap: top-100 per org by balance (A2/W3)
    val top = TopK.topKPerGroup(cust, Seq(col("_org_id")),
      Seq(col("c_acctbal").desc, col("c_custkey").asc), 100)
    val a = top.filter(col("_org_id") === "org_a").select(
      col("c_custkey").as("a_key"), col("c_name").as("a_name"),
      col("c_acctbal").as("a_bal"), col("c_mktsegment").as("a_seg"),
      col("c_nationkey").as("a_nation"))
    val b = top.filter(col("_org_id") === "org_b").select(
      col("c_custkey").as("b_key"), col("c_name").as("b_name"),
      col("c_acctbal").as("b_bal"), col("c_mktsegment").as("b_seg"),
      col("c_nationkey").as("b_nation"))
    // blocked pair join (J3) + pair features (F14) + rule score (F16)
    val pairs = a.join(b, col("a_nation") === col("b_nation"))
    val sizeCompat = lit(1.0) / (lit(1.0) +
      abs(log(greatest(col("a_bal"), lit(1.0)) / greatest(col("b_bal"), lit(1.0)))))
    val segMatch = (col("a_seg") === col("b_seg")).cast("double")
    val nameSim = TextFunctions.jaroWinkler(col("a_name"), col("b_name"))
    val score = segMatch * 0.4 + sizeCompat * 0.4 + nameSim * 0.2
    val scored = pairs.select(col("a_key"), col("b_key"),
      round(score, 6).as("score"),
      when(segMatch === 1.0, "Industry Expansion").otherwise("Market Development")
        .as("recommendation_type"))
      .filter(col("score") > 0.5)
    TopK.globalTopK(scored, Seq(col("score").desc, col("a_key").asc, col("b_key").asc), 100)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.ErQueries.queries ++
      graft.queries.DocQueries.queries ++
      graft.queries.MlQueries.queries ++
      graft.queries.ServeQueries.queries ++
      graft.queries.MediaQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.BpeQueries.queries ++
      graft.queries.LmQueries.queries ++
      graft.queries.BoostQueries.queries ++
      graft.queries.DsirQueries.queries ++
      graft.queries.QualityModelQueries.queries ++
      graft.queries.FunnelQueries.queries ++
      graft.queries.AnnCurveQueries.queries ++
      graft.queries.AnnServingQueries.queries

  /** Per-query soundness preconditions the correctness harness runs
    * before verifying the named query — a registry, so Verify stays
    * query-agnostic. A precondition that throws fails THAT query's
    * verify loudly (no parquet written → driver records err). Currently:
    * q122's exact-hash oracle gate is numerically sound only while the
    * embeddings table keeps its measured float margins ([[graft.queries.Q122Margin]]). */
  def verifyPreconditions: Map[String, (SparkSession, String) => Unit] =
    Map(
      "q122_semantic_dedup" ->
        ((s, dir) => graft.queries.Q122Margin.assertSound(s, dir)),
      "q153_semantic_decontaminate" ->
        ((s, dir) => graft.queries.Q153Margin.assertSound(s, dir)),
      "q151_point_upsert" ->
        ((s, dir) => graft.queries.OpsQueries.assertUpsertKeysSound(s, dir)),
      // q36/q147 share one rule score; its 0.75 threshold and 0.02-band
      // floors get the same knife-edge guard
      "q36_er_confusion" ->
        ((s, dir) => graft.queries.ErQueries.assertScoreMarginsSound(s, dir)),
      "q147_score_calibration" ->
        ((s, dir) => graft.queries.ErQueries.assertScoreMarginsSound(s, dir)),
      // q200/q201: the DuckDB replay's byte map is space-only; exact iff
      // the corpus is printable ASCII + space (the kernel maps all 256)
      "q200_bpe_byte_train" ->
        ((s, dir) => graft.queries.BpeQueries.assertByteLevelOracleSound(s, dir)),
      "q201_bpe_byte_fertility" ->
        ((s, dir) => graft.queries.BpeQueries.assertByteLevelOracleSound(s, dir)),
      // q203: Spark drops null/zero-norm embeddings, the oracle keeps
      // raw vectors — parity holds only while none exist
      "q203_ann_operating_curve" ->
        ((s, dir) => graft.queries.AnnCurveQueries.assertEmbeddingsSound(s, dir)),
      "q204_ann_spilled_curve" ->
        ((s, dir) => graft.queries.AnnCurveQueries.assertEmbeddingsSound(s, dir)),
      "q210_opq_adc_recall" ->
        ((s, dir) => graft.queries.AnnCurveQueries.assertEmbeddingsSound(s, dir)),
      "q211_ann_twostage_curve" ->
        ((s, dir) => graft.queries.AnnCurveQueries.assertEmbeddingsSound(s, dir)),
      "q214_binary_adc_serving" ->
        ((s, dir) => graft.queries.AnnCurveQueries.assertEmbeddingsSound(s, dir)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.ErQueries.oracleSql ++
      graft.queries.DocQueries.oracleSql ++
      graft.queries.MlQueries.oracleSql ++
      graft.queries.ServeQueries.oracleSql ++
      graft.queries.MediaQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.CorpusQueries.oracleSql ++
      graft.queries.OpsQueries.oracleSql ++
      graft.queries.SketchQueries.oracleSql ++
      graft.queries.BpeQueries.oracleSql ++
      graft.queries.LmQueries.oracleSql ++
      graft.queries.BoostQueries.oracleSql ++
      graft.queries.DsirQueries.oracleSql ++
      graft.queries.QualityModelQueries.oracleSql ++
      graft.queries.FunnelQueries.oracleSql ++
      graft.queries.AnnCurveQueries.oracleSql ++
      graft.queries.AnnServingQueries.oracleSql
}
