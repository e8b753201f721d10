package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.evaluate.RankingMetrics
import graft.ml.Scoring
import graft.sources.Tables

/**
 * Oracle-checked queries for the scoring/evaluation math (SURVEY §2
 * M7/A12/F17 ensemble vote + confidence; A13 ranking metrics; F23
 * baselines). Model TRAINING is gated by seeded-metric ScalaTest specs
 * (EnsembleSpec), not DuckDB — per SURVEY §5; these queries make every
 * deterministic part of the scoring path hash-checkable by deriving
 * pseudo model scores from `orders` with plain modular arithmetic that
 * both engines evaluate identically (no murmur hash, no RNG).
 */
object MlQueries {

  /** Deterministic per-model pseudo-scores on orders. Distinct prime
    * moduli give 4 de-correlated [0,1] streams. */
  private def pseudoScored(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_totalprice"),
      col("o_orderstatus"),
      (col("o_orderkey") % 97 / 96.0).as("score_nn"),
      (col("o_orderkey") % 89 / 88.0).as("score_xgb"),
      (col("o_orderkey") % 83 / 82.0).as("score_rf"),
      (col("o_orderkey") % 79 / 78.0).as("score_gbt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q171_bootstrap_ci" -> ((s, dir) => {
      // Poisson-bootstrap 95% CI on mean event value per type
      // (graft.evaluate.Bootstrap): B=200 replicas from ONE aggregation
      // pass — deterministic md5-derived Poisson(1) weights, decimal-
      // exact replica sums, exact order-statistic interval. The oracle
      // replays hash, inverse-CDF when-chain, and rank selection
      // verbatim.
      graft.evaluate.Bootstrap.meanCI(
          Tables.load(s, dir, "events").filter(col("value").isNotNull),
          col("event_id"), col("value"), Seq("event_type"),
          replicas = 200, alpha = 0.05)
        .select(col("event_type"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"), round(col("ci_hi"), 6).as("ci_hi"))
        .orderBy("event_type")
    }),

    "q177_per_group_ndcg" -> ((s, dir) => {
      // q56's global NDCG at per-customer granularity — the slice frame
      // real eval reports aggregate over (a single global number hides
      // WHICH segments the ranker fails). NULL ndcg = no relevant item
      // in the group, not a zero.
      val scored = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_orderkey") % 1000 / 1000.0).as("score"),
          (col("o_orderstatus") === "F").cast("int").as("label"))
      graft.evaluate.RankingMetrics.perGroupNdcg(scored, col("o_custkey"),
          col("score"), col("label"), 5, Seq(col("o_orderkey")))
        .select(col("grp").as("o_custkey"), col("n"), col("n_rel"),
          round(col("ndcg"), 6).as("ndcg_5"))
        .orderBy("o_custkey")
    }),

    "q178_metric_ci" -> ((s, dir) => {
      // the q177 slice frame under the q171 uncertainty machinery: a
      // 95% Poisson-bootstrap CI on mean per-customer NDCG@5 — the
      // "is ranker A really better than B" number, from ONE aggregation
      // pass over the per-group metric frame.
      val scored = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_orderkey") % 1000 / 1000.0).as("score"),
          (col("o_orderstatus") === "F").cast("int").as("label"))
      val per = graft.evaluate.RankingMetrics.perGroupNdcg(scored,
          col("o_custkey"), col("score"), col("label"), 5,
          Seq(col("o_orderkey")))
        .filter(col("ndcg").isNotNull)
        .withColumn("scope", lit("all"))
      graft.evaluate.Bootstrap.meanCI(per, col("grp"), col("ndcg"),
          Seq("scope"), replicas = 200, alpha = 0.05)
        .select(col("scope"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"))
    }),

    "q55_ensemble_vote" -> ((s, dir) => {
      // weighted vote + population-std consensus + confidence bucket
      // (reference: pipeline.py:285-288, 375-389)
      val scores = Seq("nn" -> 0.3, "xgb" -> 0.3, "rf" -> 0.2, "gbt" -> 0.2)
        .map { case (n, w) => (col(s"score_$n"), w) }
      pseudoScored(s, dir)
        .withColumn("score", Scoring.weightedVote(scores))
        .withColumn("score_std", Scoring.consensusStd(scores.map(_._1)))
        .withColumn("confidence",
          Scoring.confidenceLevel(col("score"), col("score_std")))
        .select(col("o_orderkey"), round(col("score"), 6).as("score"),
          round(col("score_std"), 6).as("score_std"), col("confidence"))
        .orderBy("o_orderkey")
    }),

    "q56_ranking_metrics" -> ((s, dir) => {
      // P@K / R@K / NDCG@K / coverage over a deterministically scored,
      // binary-labeled candidate list (reference: evaluate.py:73-98,207-254)
      val scored = pseudoScored(s, dir)
        .withColumn("score", col("o_orderkey") % 1000 / 1000.0)
        .withColumn("label", (col("o_orderstatus") === "F").cast("int"))
      val m = RankingMetrics.evaluate(scored, col("score"), col("label"),
        tieBreak = Seq(col("o_orderkey")))
      m.select(
        round(col("precision_at_5"), 6).as("precision_at_5"),
        round(col("precision_at_10"), 6).as("precision_at_10"),
        round(col("precision_at_20"), 6).as("precision_at_20"),
        round(col("recall_at_5"), 6).as("recall_at_5"),
        round(col("recall_at_10"), 6).as("recall_at_10"),
        round(col("recall_at_20"), 6).as("recall_at_20"),
        round(col("ndcg_at_5"), 6).as("ndcg_at_5"),
        round(col("ndcg_at_10"), 6).as("ndcg_at_10"),
        round(col("ndcg_at_20"), 6).as("ndcg_at_20"),
        round(col("coverage"), 6).as("coverage"),
        col("total_recommendations"), col("relevant_items"))
    }),

    "q66_summarize" -> ((s, dir) => {
      // extractive summarizer stub + null/empty semantics (reference:
      // summarizer.py:7-33 F24) over documents text
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.Summarize.summarize(col("text"), 2).as("summary"))
        .orderBy("doc_id")
    }),

    "q148_lexrank_summary" -> ((s, dir) => {
      // REAL extractive summarization (Summarize.lexRankTiles scaladoc):
      // degree-centrality LexRank over 10-word tiles, keep the 2 most
      // central re-joined in original order — the model-free upgrade
      // over q66's first-N stub (which it degenerates to exactly when a
      // doc has no similarity signal). Centrality sums ride
      // DECIMAL(28,18); ties break to the earliest tile.
      graft.functions.Summarize.lexRankTiles(
          Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
          spanWords = 10, k = 2)
        .select(col("id").as("doc_id"), col("n_tiles"), col("picked"),
          col("summary_md5"), col("top_centrality"))
        .orderBy("doc_id")
    }),

    "q67_ab_router" -> ((s, dir) => {
      // consistent-hash A/B assignment, bit-exact 128-bit md5 mod 1000
      // (reference: feedback_logging.py:546-571 M12/F22)
      val session = concat(lit("sess-"), col("o_orderkey").cast("string"))
      // loadSpread: 150k md5-per-row over an unsplittable single-row-group
      // file would otherwise hash on one core (Tables.loadSpread scaladoc)
      Tables.loadSpread(s, dir, "orders").select(
        col("o_orderkey"),
        graft.ml.AbRouter.bucket(session).as("bucket"),
        graft.ml.AbRouter.assignVariant(session,
          Seq("v1" -> 0.5, "v2" -> 0.3, "v3" -> 0.2)).as("variant"))
        .orderBy("o_orderkey")
    }),

    "q57_baseline_scores" -> ((s, dir) => {
      // popularity (sigmoid of first feature), similarity (min-max feature
      // sum), deterministic LCG pseudo-random (reference: evaluate.py:267-292;
      // RNG replaced by replayable arithmetic — SURVEY §7.4.3)
      val base = Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_totalprice") / 100000.0).as("f0"),
        (col("o_orderkey") % 13 / 13.0).as("f1"))
      val withSim = RankingMetrics.withSimilarityScore(
        base, Seq(col("f0"), col("f1")), "similarity_score")
      withSim.select(
        col("o_orderkey"),
        round(RankingMetrics.popularityScore(col("f0")), 6).as("popularity_score"),
        round(col("similarity_score"), 6).as("similarity_score"),
        round(col("o_orderkey") * 48271 % 999983 / 999983.0, 6).as("random_score"))
        .orderBy("o_orderkey")
    }),

    "q149_feedback_metrics" -> ((s, dir) => {
      // the compute_feedback_metrics contract (reference:
      // feedback_logging.py:458-499 — a STUB there returning zeros; here
      // the real rollup): impressions/CTR/accepts/conversions/revenue
      // per (model_version, day window) over the derived logs
      val (preds, fb) = feedbackLogs(s, dir)
      graft.ml.Feedback.feedbackMetrics(preds, fb)
        // DATE → string at the gate boundary (the q11 day-column parity
        // convention; DuckDB DATE surfaces as datetime64 in the compare)
        .withColumn("window_day", col("window_day").cast("string"))
        .orderBy("model_version", "window_day")
    }),

    "q150_feedback_training" -> ((s, dir) => {
      // the generate_training_data contract (reference:
      // feedback_logging.py:416-456, also a stub): lookback cutoff,
      // positive/negative FeedbackType mapping, one label per
      // prediction, min-feedback gate per model version, prediction
      // features carried for retraining (EnsembleRetrainSpec feeds this
      // frame to Ensemble.train)
      val (preds, fb) = feedbackLogs(s, dir)
      graft.ml.Feedback.trainingData(preds, fb,
          cutoff = to_timestamp(lit("2024-01-10 00:00:00")),
          minFeedbackCount = 50L)
        .select("prediction_id", "model_version", "label", "score", "f0", "f1")
        .orderBy("prediction_id")
    }),

    "q152_variant_compare" -> ((s, dir) => {
      // per-variant conversion comparison + pooled two-proportion z-test
      // against control v1 — the significance math the reference's
      // ABTestManager promote/rollback decision needs but never computes
      // (feedback_logging.py:502-595); RegistrySpec gates the manifest
      // transition the decision drives
      val (preds, fb) = feedbackLogs(s, dir)
      graft.ml.Feedback.variantComparison(preds, fb, control = "v1")
        .orderBy("model_version")
    })
  )

  /**
   * Deterministic prediction/feedback logs derived from the events
   * table — the PredictionLog/FeedbackLog schemas
   * (feedback_logging.py:100-150) instantiated so both engines can
   * replay them: one prediction per (user, day) with the q67
   * consistent-hash variant per user session, and each event mapped
   * onto the FeedbackType enum (view→viewed, click→clicked,
   * signup→accepted, purchase→converted with its value as revenue,
   * error→rejected — a total mapping, synthetic but fixed).
   */
  private def feedbackLogs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val fb = ev.select(
      concat(lit("pred_u"), col("user_id"), lit("_d"),
        to_date(col("ts")).cast("string")).as("prediction_id"),
      col("user_id"),
      when(col("event_type") === "view", "viewed")
        .when(col("event_type") === "click", "clicked")
        .when(col("event_type") === "signup", "accepted")
        .when(col("event_type") === "purchase", "converted")
        .otherwise("rejected").as("feedback_type"),
      col("ts").as("created_at"),
      when(col("event_type") === "purchase", col("value"))
        .as("outcome_value"))
    val preds = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .select(
        concat(lit("pred_u"), col("user_id"), lit("_d"),
          col("d").cast("string")).as("prediction_id"),
        graft.ml.AbRouter.assignVariant(
          concat(lit("sess-u"), col("user_id").cast("string")),
          Seq("v1" -> 0.5, "v2" -> 0.3, "v3" -> 0.2)).as("model_version"),
        round((col("user_id") * 37 + dayofmonth(col("d"))) % 100 / 100.0, 6)
          .as("score"),
        round(col("user_id") % 13 / 13.0, 6).as("f0"),
        round(col("user_id") % 7 / 7.0, 6).as("f1"))
    (preds, fb)
  }

  private val pseudoSql =
    """scored AS (SELECT o_orderkey, o_totalprice, o_orderstatus,
      |  (o_orderkey % 97) / 96.0 AS score_nn,
      |  (o_orderkey % 89) / 88.0 AS score_xgb,
      |  (o_orderkey % 83) / 82.0 AS score_rf,
      |  (o_orderkey % 79) / 78.0 AS score_gbt
      | FROM orders)""".stripMargin

  /** DuckDB replay of [[feedbackLogs]]: the q67 128-bit-md5 variant walk
    * per user session + the FeedbackType event mapping. */
  private val feedbackLogSql =
    """h AS (SELECT user_id,
      |  md5('sess-u' || CAST(user_id AS VARCHAR)) AS hex
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |vr AS (SELECT user_id,
      |  ((CAST(('0x' || substring(hex, 1, 16)) AS UBIGINT) % 1000 * 616
      |   + CAST(('0x' || substring(hex, 17, 16)) AS UBIGINT) % 1000) % 1000)
      |    /1000.0 AS frac FROM h),
      |va AS (SELECT user_id, CASE WHEN frac < 0.5 THEN 'v1'
      |   WHEN frac < 0.8 THEN 'v2' ELSE 'v3' END AS model_version FROM vr),
      |fb AS (SELECT 'pred_u' || CAST(user_id AS VARCHAR) ||
      |    '_d' || CAST(CAST(ts AS DATE) AS VARCHAR) AS prediction_id,
      |  user_id, ts AS created_at,
      |  CASE event_type WHEN 'view' THEN 'viewed'
      |    WHEN 'click' THEN 'clicked' WHEN 'signup' THEN 'accepted'
      |    WHEN 'purchase' THEN 'converted' ELSE 'rejected' END AS feedback_type,
      |  CASE WHEN event_type = 'purchase' THEN value END AS outcome_value
      |  FROM events)""".stripMargin

  /** Poisson(1) inverse-CDF CASE chain over the hash uniform — the
    * byte-identical doubles the Spark when-chain compares against. */
  private def poissonCase(u: String): String =
    graft.evaluate.Bootstrap.cdf.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Per-customer NDCG@5 over the q56 deterministic fixture — shared by
    * q177 (the slice frame) and q178 (its bootstrap CI). */
  private val perNdcgCtes =
    """WITH s AS (SELECT o_custkey AS grp, o_orderkey,
      |    (o_orderkey % 1000) / 1000.0 AS score,
      |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS rel
      |  FROM orders),
      |r AS (SELECT grp, rel,
      |    row_number() OVER (PARTITION BY grp
      |      ORDER BY score DESC, o_orderkey) AS pos,
      |    row_number() OVER (PARTITION BY grp
      |      ORDER BY rel DESC, o_orderkey) AS ipos FROM s),
      |per AS (SELECT grp, count(*) AS n, sum(rel) AS n_rel,
      |    sum(CASE WHEN pos <= 5 THEN rel / log2(pos + 1) ELSE 0 END) /
      |      nullif(sum(CASE WHEN ipos <= 5
      |        THEN rel / log2(ipos + 1) ELSE 0 END), 0) AS ndcg
      |  FROM r GROUP BY grp)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q177_per_group_ndcg" -> (perNdcgCtes + """
      |SELECT grp AS o_custkey, n, CAST(n_rel AS BIGINT) AS n_rel,
      |  round(ndcg, 6) AS ndcg_5
      |FROM per ORDER BY o_custkey""".stripMargin),

    "q178_metric_ci" -> (perNdcgCtes + s""",
      |v AS (SELECT grp, ndcg AS value FROM per WHERE ndcg IS NOT NULL),
      |point AS (SELECT count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mean
      |  FROM v),
      |drawn AS (SELECT value, bk * 4 + j AS r,
      |    ${poissonCase("(CAST(('0x' || substring(md5('bs:' || " +
      "CAST(grp AS VARCHAR) || '#' || CAST(bk AS VARCHAR)), " +
      "1 + j * 8, 8)) AS UBIGINT) % 1000000) / 1e6")} AS w
      |  FROM v, (SELECT unnest(range(0, 50)) AS bk),
      |    (SELECT unnest(range(0, 4)) AS j)),
      |reps AS (SELECT r, sum(w) AS wn,
      |    sum(CAST(w * value AS DECIMAL(38,12))) AS ws
      |  FROM drawn GROUP BY 1 HAVING sum(w) > 0),
      |m AS (SELECT r, CAST(ws AS DOUBLE) / wn AS m FROM reps),
      |rk AS (SELECT m,
      |    row_number() OVER (ORDER BY m, r) AS rk,
      |    count(*) OVER () AS b2 FROM m),
      |ci AS (SELECT
      |    max(CASE WHEN rk = CAST(ceil(b2 * ${(0.05 / 2).toString})
      |      AS INTEGER) THEN m END) AS ci_lo,
      |    max(CASE WHEN rk = CAST(ceil(b2 * ${(1 - 0.05 / 2).toString})
      |      AS INTEGER) THEN m END) AS ci_hi
      |  FROM rk)
      |SELECT 'all' AS scope, p.n, round(p.mean, 6) AS mean,
      |  round(c.ci_lo, 6) AS ci_lo, round(c.ci_hi, 6) AS ci_hi
      |FROM point p CROSS JOIN ci c""".stripMargin),

    "q171_bootstrap_ci" -> s"""
      |WITH b AS (SELECT event_type, event_id, value FROM events
      |  WHERE value IS NOT NULL),
      |point AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mean
      |  FROM b GROUP BY 1),
      |drawn AS (SELECT event_type, value, bk * 4 + j AS r,
      |    ${poissonCase("(CAST(('0x' || substring(md5('bs:' || " +
      "CAST(event_id AS VARCHAR) || '#' || CAST(bk AS VARCHAR)), " +
      "1 + j * 8, 8)) AS UBIGINT) % 1000000) / 1e6")} AS w
      |  FROM b, (SELECT unnest(range(0, 50)) AS bk),
      |    (SELECT unnest(range(0, 4)) AS j)),
      |reps AS (SELECT event_type, r, sum(w) AS wn,
      |    sum(CAST(w * value AS DECIMAL(38,12))) AS ws
      |  FROM drawn GROUP BY 1, 2 HAVING sum(w) > 0),
      |m AS (SELECT event_type, r, CAST(ws AS DOUBLE) / wn AS m FROM reps),
      |rk AS (SELECT event_type, m,
      |    row_number() OVER (PARTITION BY event_type ORDER BY m, r) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS b2 FROM m),
      |ci AS (SELECT event_type,
      |    max(CASE WHEN rk = CAST(ceil(b2 * ${(0.05 / 2).toString})
      |      AS INTEGER) THEN m END) AS ci_lo,
      |    max(CASE WHEN rk = CAST(ceil(b2 * ${(1 - 0.05 / 2).toString})
      |      AS INTEGER) THEN m END) AS ci_hi
      |  FROM rk GROUP BY 1)
      |SELECT p.event_type, p.n, round(p.mean, 6) AS mean,
      |  round(c.ci_lo, 6) AS ci_lo, round(c.ci_hi, 6) AS ci_hi
      |FROM point p LEFT JOIN ci c USING (event_type) ORDER BY 1""".stripMargin,

    "q55_ensemble_vote" ->
      s"""WITH $pseudoSql,
        |v AS (SELECT o_orderkey,
        |  0.3*score_nn + 0.3*score_xgb + 0.2*score_rf + 0.2*score_gbt AS score,
        |  sqrt(((score_nn - m)*(score_nn - m) + (score_xgb - m)*(score_xgb - m)
        |      + (score_rf - m)*(score_rf - m) + (score_gbt - m)*(score_gbt - m)) / 4.0)
        |    AS score_std
        |  FROM (SELECT *,
        |    (score_nn + score_xgb + score_rf + score_gbt)/4.0 AS m FROM scored))
        |SELECT o_orderkey, round(score, 6) AS score,
        |  round(score_std, 6) AS score_std,
        |  CASE WHEN score > 0.8 AND score_std < 0.1 THEN 'Very High'
        |       WHEN score > 0.7 AND score_std < 0.15 THEN 'High'
        |       WHEN score > 0.6 THEN 'Medium'
        |       ELSE 'Low' END AS confidence
        |FROM v ORDER BY o_orderkey""".stripMargin,

    "q56_ranking_metrics" ->
      """WITH s AS (SELECT o_orderkey, (o_orderkey % 1000)/1000.0 AS score,
        |  CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS rel FROM orders),
        |r AS (SELECT rel, score,
        |  row_number() OVER (ORDER BY score DESC, o_orderkey) AS pos,
        |  row_number() OVER (ORDER BY rel DESC) AS ideal_pos FROM s)
        |SELECT
        |  round(CASE WHEN count(*) >= 5 THEN sum(CASE WHEN pos <= 5 THEN rel ELSE 0 END)/5 ELSE 0 END, 6) AS precision_at_5,
        |  round(CASE WHEN count(*) >= 10 THEN sum(CASE WHEN pos <= 10 THEN rel ELSE 0 END)/10 ELSE 0 END, 6) AS precision_at_10,
        |  round(CASE WHEN count(*) >= 20 THEN sum(CASE WHEN pos <= 20 THEN rel ELSE 0 END)/20 ELSE 0 END, 6) AS precision_at_20,
        |  round(CASE WHEN sum(rel) > 0 THEN sum(CASE WHEN pos <= 5 THEN rel ELSE 0 END)/sum(rel) ELSE 0 END, 6) AS recall_at_5,
        |  round(CASE WHEN sum(rel) > 0 THEN sum(CASE WHEN pos <= 10 THEN rel ELSE 0 END)/sum(rel) ELSE 0 END, 6) AS recall_at_10,
        |  round(CASE WHEN sum(rel) > 0 THEN sum(CASE WHEN pos <= 20 THEN rel ELSE 0 END)/sum(rel) ELSE 0 END, 6) AS recall_at_20,
        |  round(sum(CASE WHEN pos <= 5 THEN rel/log2(pos+1) ELSE 0 END)
        |      / nullif(sum(CASE WHEN ideal_pos <= 5 THEN rel/log2(ideal_pos+1) ELSE 0 END), 0), 6) AS ndcg_at_5,
        |  round(sum(CASE WHEN pos <= 10 THEN rel/log2(pos+1) ELSE 0 END)
        |      / nullif(sum(CASE WHEN ideal_pos <= 10 THEN rel/log2(ideal_pos+1) ELSE 0 END), 0), 6) AS ndcg_at_10,
        |  round(sum(CASE WHEN pos <= 20 THEN rel/log2(pos+1) ELSE 0 END)
        |      / nullif(sum(CASE WHEN ideal_pos <= 20 THEN rel/log2(ideal_pos+1) ELSE 0 END), 0), 6) AS ndcg_at_20,
        |  round(avg(CASE WHEN score > 0.5 THEN 1.0 ELSE 0.0 END), 6) AS coverage,
        |  count(*) AS total_recommendations,
        |  CAST(sum(rel) AS BIGINT) AS relevant_items
        |FROM r""".stripMargin,

    "q66_summarize" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL OR len(text) = 0 THEN ''
        |    ELSE array_to_string(list_slice(string_split(text, '. '), 1, 2), '. ')
        |  END AS summary
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q148_lexrank_summary" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |t0 AS (SELECT doc_id, CAST(ceil(len(ws) / 10.0) AS BIGINT) AS n_tiles,
        |    ws FROM d),
        |tiles0 AS (SELECT doc_id, n_tiles,
        |    unnest(range(0, n_tiles)) AS idx, ws FROM t0),
        |tiles AS (SELECT doc_id, n_tiles, idx,
        |    array_to_string(ws[idx*10+1 : idx*10+10], ' ') AS tile,
        |    list_distinct(ws[idx*10+1 : idx*10+10]) AS toks
        |  FROM tiles0
        |  WHERE len(array_to_string(ws[idx*10+1 : idx*10+10], ' ')) > 0),
        |pairs AS (SELECT x.doc_id, x.idx AS ia, y.idx AS ib,
        |    CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
        |      len(list_distinct(list_concat(x.toks, y.toks))) AS j
        |  FROM tiles x JOIN tiles y
        |    ON x.doc_id = y.doc_id AND x.idx < y.idx),
        |ends AS (SELECT doc_id, ia AS idx, j FROM pairs
        |  UNION ALL SELECT doc_id, ib AS idx, j FROM pairs),
        |cent AS (SELECT doc_id, idx,
        |    sum(CAST(j AS DECIMAL(28,18))) AS c
        |  FROM ends GROUP BY 1, 2),
        |ranked AS (SELECT t.doc_id, t.n_tiles, t.idx, t.tile,
        |    coalesce(c.c, CAST(0 AS DECIMAL(28,18))) AS c,
        |    row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY coalesce(c.c, CAST(0 AS DECIMAL(28,18))) DESC,
        |        t.idx ASC) AS rk
        |  FROM tiles t LEFT JOIN cent c
        |    ON c.doc_id = t.doc_id AND c.idx = t.idx)
        |SELECT doc_id, max(n_tiles) AS n_tiles,
        |  array_to_string(list(CAST(idx AS VARCHAR) ORDER BY idx), ',')
        |    AS picked,
        |  md5(array_to_string(list(tile ORDER BY idx), ' ')) AS summary_md5,
        |  round(CAST(max(c) AS DOUBLE), 6) AS top_centrality
        |FROM ranked WHERE rk <= 2
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q67_ab_router" ->
      """WITH h AS (SELECT o_orderkey,
        |  md5('sess-' || CAST(o_orderkey AS VARCHAR)) AS hex FROM orders),
        |b AS (SELECT o_orderkey,
        |  (CAST(('0x' || substring(hex, 1, 16)) AS UBIGINT) % 1000 * 616
        |   + CAST(('0x' || substring(hex, 17, 16)) AS UBIGINT) % 1000) % 1000
        |    AS bucket FROM h)
        |SELECT o_orderkey, CAST(bucket AS BIGINT) AS bucket,
        |  CASE WHEN bucket/1000.0 < 0.5 THEN 'v1'
        |       WHEN bucket/1000.0 < 0.8 THEN 'v2'
        |       ELSE 'v3' END AS variant
        |FROM b ORDER BY o_orderkey""".stripMargin,

    "q57_baseline_scores" ->
      """WITH b AS (SELECT o_orderkey, o_totalprice/100000.0 AS f0,
        |  (o_orderkey % 13)/13.0 AS f1 FROM orders),
        |mm AS (SELECT min(f0+f1) AS lo, max(f0+f1) AS hi FROM b)
        |SELECT o_orderkey,
        |  round(1.0/(1.0 + exp(-f0)), 6) AS popularity_score,
        |  round((f0 + f1 - lo)/(hi - lo + 1e-8), 6) AS similarity_score,
        |  round((o_orderkey * 48271 % 999983)/999983.0, 6) AS random_score
        |FROM b, mm ORDER BY o_orderkey""".stripMargin,

    "q149_feedback_metrics" ->
      s"""WITH $feedbackLogSql,
        |m AS (SELECT va.model_version,
        |  strftime(fb.created_at, '%Y-%m-%d') AS window_day,
        |  sum(CASE WHEN feedback_type IN ('viewed','ignored') THEN 1 ELSE 0 END) AS impression_count,
        |  sum(CASE WHEN feedback_type = 'clicked' THEN 1 ELSE 0 END) AS click_count,
        |  sum(CASE WHEN feedback_type = 'accepted' THEN 1 ELSE 0 END) AS accept_count,
        |  sum(CASE WHEN feedback_type = 'converted' THEN 1 ELSE 0 END) AS conversion_count,
        |  sum(CAST(CASE WHEN feedback_type = 'converted'
        |    THEN COALESCE(outcome_value, 0) ELSE 0 END AS DECIMAL(18,6))) AS rev
        |  FROM fb JOIN va ON fb.user_id = va.user_id
        |  GROUP BY 1, 2)
        |SELECT model_version, window_day,
        |  CAST(impression_count AS BIGINT) AS impression_count,
        |  CAST(click_count AS BIGINT) AS click_count,
        |  round(CASE WHEN impression_count > 0
        |    THEN CAST(click_count AS DOUBLE)/impression_count ELSE 0.0 END, 6) AS ctr,
        |  CAST(accept_count AS BIGINT) AS accept_count,
        |  round(CASE WHEN impression_count > 0
        |    THEN CAST(accept_count AS DOUBLE)/impression_count ELSE 0.0 END, 6) AS accept_rate,
        |  CAST(conversion_count AS BIGINT) AS conversion_count,
        |  round(CASE WHEN impression_count > 0
        |    THEN CAST(conversion_count AS DOUBLE)/impression_count ELSE 0.0 END, 6) AS conversion_rate,
        |  round(CAST(rev AS DOUBLE), 2) AS total_revenue,
        |  round(CASE WHEN conversion_count > 0
        |    THEN CAST(rev AS DOUBLE)/conversion_count ELSE 0.0 END, 2) AS avg_revenue_per_conversion
        |FROM m ORDER BY model_version, window_day""".stripMargin,

    "q150_feedback_training" ->
      s"""WITH $feedbackLogSql,
        |preds AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |p2 AS (SELECT 'pred_u' || CAST(preds.user_id AS VARCHAR) || '_d'
        |    || CAST(d AS VARCHAR) AS prediction_id,
        |  va.model_version,
        |  round(((preds.user_id * 37 + EXTRACT(DAY FROM d)) % 100) / 100.0, 6) AS score,
        |  round((preds.user_id % 13) / 13.0, 6) AS f0,
        |  round((preds.user_id % 7) / 7.0, 6) AS f1
        |  FROM preds JOIN va ON preds.user_id = va.user_id),
        |lab AS (SELECT prediction_id,
        |  max(CASE WHEN feedback_type IN ('converted','accepted') THEN 1 ELSE 0 END) AS has_pos,
        |  max(CASE WHEN feedback_type = 'rejected' THEN 1 ELSE 0 END) AS has_neg
        |  FROM fb WHERE created_at >= TIMESTAMP '2024-01-10 00:00:00'
        |  GROUP BY 1),
        |lab2 AS (SELECT prediction_id,
        |  CASE WHEN has_pos = 1 THEN 1.0 ELSE 0.0 END AS label
        |  FROM lab WHERE has_pos = 1 OR has_neg = 1),
        |frame AS (SELECT p2.prediction_id, p2.model_version, lab2.label,
        |    p2.score, p2.f0, p2.f1
        |  FROM p2 JOIN lab2 ON p2.prediction_id = lab2.prediction_id),
        |keep AS (SELECT model_version FROM frame
        |  GROUP BY 1 HAVING count(*) >= 50)
        |SELECT frame.prediction_id, frame.model_version, frame.label,
        |  frame.score, frame.f0, frame.f1
        |FROM frame JOIN keep ON frame.model_version = keep.model_version
        |ORDER BY frame.prediction_id""".stripMargin,

    "q152_variant_compare" ->
      s"""WITH $feedbackLogSql,
        |pp AS (SELECT va.model_version,
        |  sum(CASE WHEN feedback_type IN ('viewed','ignored') THEN 1 ELSE 0 END) AS trials,
        |  sum(CASE WHEN feedback_type = 'converted' THEN 1 ELSE 0 END) AS successes
        |  FROM fb JOIN va ON fb.user_id = va.user_id GROUP BY 1),
        |w AS (SELECT model_version, trials, successes,
        |    max(CASE WHEN model_version = 'v1' THEN trials END) OVER ()
        |      AS c_trials,
        |    max(CASE WHEN model_version = 'v1' THEN successes END) OVER ()
        |      AS c_successes
        |  FROM pp),
        |j AS (SELECT model_version, trials, successes,
        |    c_trials, c_successes,
        |    CAST(successes AS DOUBLE)/trials AS p,
        |    CAST(c_successes AS DOUBLE)/c_trials AS pc,
        |    CAST(successes + c_successes AS DOUBLE)
        |      /(trials + c_trials) AS pool
        |  FROM w),
        |k AS (SELECT *, sqrt(pool*(1.0 - pool)
        |    *(1.0/trials + 1.0/c_trials)) AS se FROM j),
        |zt AS (SELECT *, CASE WHEN trials = 0 OR COALESCE(c_trials, 0) = 0
        |      OR model_version = 'v1' THEN 0.0
        |    WHEN se > 0 THEN (p - pc)/se ELSE 0.0 END AS zv FROM k)
        |SELECT model_version, CAST(trials AS BIGINT) AS trials,
        |  CAST(successes AS BIGINT) AS successes,
        |  round(CASE WHEN trials > 0 THEN p ELSE 0.0 END, 6) AS rate,
        |  round(CASE WHEN COALESCE(c_trials, 0) > 0 THEN pc ELSE 0.0 END, 6) AS control_rate,
        |  round(zv, 6) AS z,
        |  CASE WHEN model_version = 'v1' THEN 'control'
        |       WHEN zv > 1.96 THEN 'promote'
        |       WHEN zv < -1.96 THEN 'rollback'
        |       ELSE 'hold' END AS decision
        |FROM zt ORDER BY model_version""".stripMargin
  )

}
