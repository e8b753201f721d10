package graft.evaluate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Ensemble, ErMatcher}
import graft.operators.EntityResolution
import graft.sources.Synthetic

/**
 * Metric-golden ledger (VERDICT r8 #5): the seeded ML quality metrics the
 * eval-protocol specs assert as INEQUALITIES (ensemble beats the three
 * baselines — `EvalProtocolSpec`; ER rule/ML P/R/F1 — `ErEvalProtocolSpec`)
 * are measured here as VALUES and written to `metrics_detail.json` next to
 * `bench_detail.json`, with the same cross-round move-flagging the bench
 * artifact applies to query times — so ML drift (a changed default, an
 * MLlib behavior shift, a broken feature) is caught in-round by the
 * artifact diff, not rounds later by a spec finally crossing its
 * inequality gate.
 *
 * Everything here is SEED-DETERMINISTIC by construction (md5-hash
 * uniforms, deterministic splits, fixed-seed MLlib trainers at fixed
 * partitioning), so a changed value means changed code, not noise — the
 * flag threshold (max(0.02, 15%) absolute move) allows only float-order
 * jitter from partition layout.
 *
 * Fixture builders are shared with the specs (single source of truth for
 * the protocol; the specs add their assertion gates on top).
 */
object MetricsLedger {

  /** The five signal-bearing pair features of the reference eval protocol
    * (scripts/evaluate.py — the label's own generative features). */
  val featureCols: Seq[String] = Seq("industry_match", "size_ratio",
    "geo_match", "type_match", "rev_sum")

  def withPairFeatures(cands: DataFrame): DataFrame = cands
    .withColumn("industry_match",
      (col("a1_industry") === col("a2_industry")).cast("double"))
    .withColumn("size_ratio",
      least(col("a1_emp"), col("a2_emp")) /
        greatest(col("a1_emp"), col("a2_emp")))
    .withColumn("geo_match",
      (col("a1_country") === col("a2_country")).cast("double"))
    .withColumn("type_match",
      (col("a1_type") === "Customer" && col("a2_type") === "Customer")
        .cast("double"))
    .withColumn("rev_sum",
      log1p(col("a1_revenue")) + log1p(col("a2_revenue")))

  /** Canonical physical layout: explicit hash partitioning on a UNIQUE
    * key + in-partition sort. MLlib trainers (tree feature-subset draws,
    * MLP optimizer) are partition-LAYOUT sensitive, and fixture frames
    * inherit their layout from the session's parallelism — without this
    * the same seed yields different metric values at local[4] (specs)
    * vs local[32] (bench), and the cross-round ledger flags phantom
    * moves. Hash-mod partitioning + unique-key sort is invariant to the
    * upstream layout (unlike repartitionByRange, whose sampled
    * boundaries are not). */
  private def canon(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(4, keys: _*).sortWithinPartitions(keys: _*)

  /** Deterministic 70/30 split keyed on the pair (evaluate.py:310-312),
    * both halves in canonical layout. */
  def split(feats: DataFrame): (DataFrame, DataFrame) = {
    val u = Synthetic.u(
      concat_ws("|", col("account1_id"), col("account2_id")), 99)
    val c = canon(feats, col("account1_id"), col("account2_id"))
    (c.filter(u < 0.7), c.filter(u >= 0.7))
  }

  /** Ordering-gate fixture, trained once: 300 accounts, probScale 3.0,
    * seeded split + canonical layout, the four-model ensemble fit.
    * Returns (fitted model, cached test frame, unpersist thunk). Shared
    * by the metric ledger AND the recommendation-list golden
    * (`EnsembleGoldenSpec`) so both gate the SAME fit protocol. */
  def orderingFixture(spark: SparkSession)
      : (graft.ml.EnsembleModel, DataFrame, () => Unit) = {
    val accts = Synthetic.accounts(spark, 300).cache()
    val cands = Synthetic.labeledCandidates(accts, window = 30,
      probScale = 3.0).cache()
    val (train, test) = split(withPairFeatures(cands))
    val testC = test.cache()
    val ens = new Ensemble(featureCols,
      numTrees = 20, rfDepth = 6, xgbIter = 10, gbtIter = 10, mlpIter = 15)
    val model = ens.fit(train)
    (model, testC,
      () => { accts.unpersist(); cands.unpersist(); testC.unpersist(); () })
  }

  /** The served recommendation list as an artifact: top-k test pairs by
    * (ensemble score desc, ids) — the end-to-end "did the model change"
    * golden (VERDICT r13 #2). Deterministic at fixed seed + canonical
    * layout; `EnsembleGoldenSpec` diffs it against the committed file
    * and proves weight sensitivity on the same fit. */
  def topPairs(model: graft.ml.EnsembleModel, test: DataFrame,
               k: Int): Seq[(String, String)] =
    model.scoreAll(test)
      .orderBy(col("score").desc, col("account1_id"), col("account2_id"))
      .select(col("account1_id").cast("string"),
        col("account2_id").cast("string"))
      .limit(k).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Ordering-gate protocol (EvalProtocolSpec test 1): 300 accounts,
    * probScale 3.0, NDCG@50 for the ensemble and the three baselines. */
  def orderingGateMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val (model, testC, cleanup) = orderingFixture(spark)
    val scored = model.scoreAll(testC).cache()
    def ndcg50(df: DataFrame, score: String): Double =
      RankingMetrics.evaluate(df, col(score), col("label"),
          tieBreak = Seq(col("account1_id"), col("account2_id")),
          ks = Seq(50))
        .head.getAs[Double]("ndcg_at_50")
    val out = Seq(
      "ensemble_ndcg_at_50" -> ndcg50(scored, "score"),
      "random_ndcg_at_50" -> ndcg50(
        testC.withColumn("r", RankingMetrics.hashRandomScore(
          concat_ws("|", col("account1_id"), col("account2_id")))), "r"),
      "popularity_ndcg_at_50" -> ndcg50(
        testC.withColumn("p",
          RankingMetrics.popularityScore(col("rev_sum"))), "p"),
      "similarity_ndcg_at_50" -> ndcg50(
        RankingMetrics.withSimilarityScore(
          testC, featureCols.map(col), "s"), "s"))
    cleanup(); scored.unpersist()
    out
  }

  /** Reference-config protocol (EvalProtocolSpec test 2): 500 accounts,
    * probScale 1.0, P/R/NDCG at 10 and 100 + coverage + base rate. */
  def referenceConfigMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val accts = Synthetic.accounts(spark, 500).cache()
    val cands = Synthetic.labeledCandidates(accts, window = 50,
      probScale = 1.0).cache()
    val (train, test) = split(withPairFeatures(cands))
    val testC = test.cache()
    val ens = new Ensemble(featureCols,
      numTrees = 50, rfDepth = 8, xgbIter = 20, gbtIter = 20, mlpIter = 25)
    val scored = ens.fit(train).scoreAll(testC).cache()
    val row = RankingMetrics.evaluate(scored, col("score"), col("label"),
      tieBreak = Seq(col("account1_id"), col("account2_id")),
      ks = Seq(10, 100)).head
    val nTest = testC.count()
    val out = Seq(
      "ref_precision_at_10" -> row.getAs[Double]("precision_at_10"),
      "ref_recall_at_10" -> row.getAs[Double]("recall_at_10"),
      "ref_ndcg_at_10" -> row.getAs[Double]("ndcg_at_10"),
      "ref_coverage" -> row.getAs[Double]("coverage"),
      "ref_precision_at_100" -> row.getAs[Double]("precision_at_100"),
      "ref_recall_at_100" -> row.getAs[Double]("recall_at_100"),
      "ref_ndcg_at_100" -> row.getAs[Double]("ndcg_at_100"),
      "ref_base_rate" ->
        row.getAs[Long]("relevant_items").toDouble / nTest)
    accts.unpersist(); cands.unpersist(); testC.unpersist()
    scored.unpersist()
    out
  }

  /** ER protocol (ErEvalProtocolSpec): seeded variant corpus → hydrated
    * rule-scored pairs (shared with the spec's fixture). */
  def erScoredPairs(spark: SparkSession): DataFrame = {
    val cols = EntityResolution.AccountCols()
    val (a1, a2, pairs) = Synthetic.erTestData(spark, 200, matchRate = 0.15)
    val a = EntityResolution.prepSide(a1, cols, "a")
      .withColumnRenamed("a_id", "account1_id")
    val b = EntityResolution.prepSide(a2, cols, "b")
      .withColumnRenamed("b_id", "account2_id")
    val hydrated = pairs
      .join(broadcast(a), "account1_id")
      .join(broadcast(b), "account2_id")
    canon(
      EntityResolution.pairFeatures.foldLeft(hydrated) {
        case (df, (n, c)) => df.withColumn(n, c)
      }.withColumn("score", EntityResolution.ruleScore()),
      col("_idx"))
  }

  /** ER metrics: rule-based P/R/F1 at the reference's 0.7 threshold, ML
    * matcher CV F1 and holdout F1 at 0.5. */
  def erMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val scored = erScoredPairs(spark).cache()
    val rule = EntityResolution.confusionMetrics(
      scored.withColumn("pred", col("score") >= 0.7),
      col("pred"), col("is_match") === 1).head
    val train = scored.filter(col("_idx") % 10 < 7)
    val test = scored.filter(col("_idx") % 10 >= 7)
    val res = ErMatcher.train(train, EntityResolution.pairFeatures.map(_._1),
      numFolds = 3, numTrees = 30, maxDepth = 8)
    val ml = EntityResolution.confusionMetrics(
      ErMatcher.score(res.model, test)
        .withColumn("pred", col("match_score") >= 0.5),
      col("pred"), col("is_match") === 1).head
    val out = Seq(
      "er_rule_precision_at_07" -> rule.getAs[Double]("precision"),
      "er_rule_recall_at_07" -> rule.getAs[Double]("recall"),
      "er_rule_f1_at_07" -> rule.getAs[Double]("f1"),
      "er_ml_cv_f1" -> res.cvF1Mean,
      "er_ml_holdout_f1_at_05" -> ml.getAs[Double]("f1"))
    scored.unpersist()
    out
  }

  /** Salted-vs-unsalted ER wall-time on the q159 planted-skew frame
    * (VERDICT r13 #5): the salt's effect as a MEASURED ledger row, not
    * an assertion. Both variants run the identical resolve over the
    * identical frame (q159's one hot default-key block holding ~20% of
    * rows), noop-materialized, best of 2 to damp JIT order effects;
    * `er_salt_speedup_x` = unsalted / salted wall-time. NOTE: these are
    * wall-clock rows in a seeded-metric ledger — cross-round moves here
    * are adjudicated like bench timing flags, not like metric drift.
    * Local-mode caveat recorded in SCALING.md: AQE skew splitting and a
    * 32-thread shared heap damp the hot-task effect that dominates on a
    * real cluster, so the ratio here is a floor on the cluster benefit.
    * Skipped (empty) when the SF dir is absent. */
  def skewEvidence(spark: SparkSession): Seq[(String, Double)] = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (!new java.io.File(s"$dir/customer.parquet").exists()) return Nil
    val cols = EntityResolution.AccountCols()
    def run(salt: Int): Double = {
      val acc = graft.queries.ErQueries.skewedAccountsForSpec(spark, dir)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        EntityResolution.resolve(
            acc.filter(col("Id") % 2 === 0), acc.filter(col("Id") % 2 === 1),
            cols, EntityResolution.Config(matchThreshold = 0.85), salt = salt)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // interleave-free fixed order, salted first: if JIT warmup leaks
    // across variants it favors the UNSALTED run, biasing the ratio down
    val salted = run(8)
    val unsalted = run(1)
    Seq("er_skew_salted_sec" -> salted,
      "er_skew_unsalted_sec" -> unsalted,
      "er_salt_speedup_x" -> unsalted / salted)
  }

  /** NewtonBoost drift fingerprint: a lean second-order-booster fit on
    * the ordering fixture's generator (COVERAGE M4's in-engine XGBoost
    * semantics). Both rows are EXACT — the model is bit-deterministic
    * under any partition layout (decimal histograms, NewtonBoostSpec) —
    * so any move here is a real behavior change (a Spark `percentile`
    * shift, a split-search edit), not jitter. `mean_margin` fingerprints
    * the additive model itself; `auc` reads its holdout ordering. */
  def newtonBoostMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val accts = Synthetic.accounts(spark, 300).cache()
    val cands = Synthetic.labeledCandidates(accts, window = 30,
      probScale = 3.0).cache()
    val (train, test) = split(withPairFeatures(cands))
    val testC = test.cache()
    val m = graft.ml.NewtonBoost.fit(train, featureCols, "label",
      graft.ml.NewtonBoost.Params(rounds = 12, maxDepth = 3,
        learningRate = 0.3, maxBins = 16))
    val scored = testC.select(col("label"), m.score.as("score"),
      m.margin.as("margin")).cache()
    // the substitute it replaced in the M4 slot (r15): same budget
    // GBTClassifier, same canonical-layout fixture — the ledger keeps
    // the NewtonBoost-vs-GBT ordering measured, not asserted
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(12).setMaxDepth(3).setStepSize(0.3).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
    val gbtScored = new org.apache.spark.ml.Pipeline()
      .setStages(Array(assembler, gbt)).fit(train).transform(testC)
      .withColumn("score",
        org.apache.spark.ml.functions.vector_to_array(col("probability"))(1))
      .select(col("label"), col("score")).cache()
    val out = Seq(
      "xgb_newton_auc" ->
        RankingMetrics.auc(scored, col("score"), col("label")),
      "xgb_gbt_auc" ->
        RankingMetrics.auc(gbtScored, col("score"), col("label")),
      "xgb_newton_mean_margin" ->
        scored.agg(avg(col("margin").cast("decimal(38,18)"))
          .cast("double")).head.getDouble(0))
    accts.unpersist(); cands.unpersist(); testC.unpersist()
    scored.unpersist(); gbtScored.unpersist()
    out
  }

  /** DSIR selection efficacy on a planted two-domain corpus: 50
    * target-sample docs + a 400-doc pool (200 sharing the target's
    * content vocabulary, 200 off-domain; all share function words, the
    * realistic confounder). Measures (a) the mean log-weight gap
    * between the two pool classes (decimal-exact means) and (b) the
    * fraction of the Gumbel top-200 draw that is target-like. Fully
    * seed-deterministic (md5 picks, md5 Gumbel), so these are metric
    * rows, not wall-clock rows — a move means changed code. */
  def dsirMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val B = 1024
    val vocabT = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val vocabO = Seq("omega", "psi", "chi", "phi", "upsilon", "tau")
    val shared = Seq("the", "data", "row", "table", "value", "scan")
    def text(domainVocab: Seq[String], salt: Int): Column =
      concat_ws(" ", (0 until 12).map(j =>
        if (j % 2 == 0) Synthetic.pick(col("id"), salt * 100 + j, domainVocab)
        else Synthetic.pick(col("id"), salt * 100 + j, shared)): _*)
    val base = spark.range(450)
    val target = base.filter(col("id") < 50)
      .select(col("id").as("doc_id"), text(vocabT, 1).as("text"))
    val pool = base.filter(col("id") >= 50 && col("id") < 250)
      .select(col("id").as("doc_id"), text(vocabT, 2).as("text"),
        lit(1).as("is_like"))
      .unionByName(base.filter(col("id") >= 250)
        .select(col("id").as("doc_id"), text(vocabO, 3).as("text"),
          lit(0).as("is_like")))
      .cache()
    val ratio = graft.operators.Dsir.logRatio(
      graft.operators.Dsir.bucketCounts(target, col("text"), B),
      graft.operators.Dsir.bucketCounts(
        pool.select("doc_id", "text"), col("text"), B), B)
    val w = graft.operators.Dsir.importanceWeights(pool, col("doc_id"),
        col("text"), ratio, B)
      .join(pool.select(col("doc_id").as("id"), col("is_like")), "id")
      .cache()
    val means = w.groupBy("is_like")
      .agg((sum(col("log_w").cast("decimal(38,18)")).cast("double") /
        count(lit(1))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val prec = graft.operators.Dsir.gumbelTopK(w, col("id"),
        col("log_w"), 200)
      .join(w.select(col("id"), col("is_like")), "id")
      .agg((sum("is_like").cast("double") / count(lit(1))))
      .head.getDouble(0)
    val out = Seq(
      "dsir_weight_separation" -> (means(1) - means(0)),
      "dsir_select_precision_at200" -> prec)
    pool.unpersist(); w.unpersist()
    out
  }

  /** DSIR end-to-end EFFICACY (the ablation Xie et al. §5 actually
    * runs, VERDICT r14 #6): train the q196-config quality model on a
    * DSIR-selected vs a uniformly-random-selected subset of the SAME
    * pool at the SAME budget (150 docs × fixed 12 tokens each — equal
    * token budget by construction) and compare downstream holdout AUC
    * on TARGET-domain data.
    *
    * Planted mechanism: the task label is carried by stop_ratio (y=1 →
    * 6/12 stopwords, y=0 → 2/12) in the TARGET domain and INVERTED in
    * the off domain — training on off-domain rows actively mis-teaches
    * the downstream model, the realistic failure mode domain-mismatched
    * pretraining data causes. DSIR sees only vocabulary (content words
    * differ per domain; stopwords are shared across domains like real
    * function words), so its selection advantage is honest: nothing
    * leaks the label to the selector. The random baseline is the
    * Gumbel top-k at CONSTANT weight (uniform, same tie-break
    * machinery) — the two arms differ in the weights alone.
    *
    * Seed-deterministic end to end (md5 text/labels/draws,
    * partition-invariant NewtonBoost), so these are metric rows: a move
    * means changed code. `DsirEfficacySpec` gates the ordering. */
  def dsirEfficacyMetrics(spark: SparkSession): Seq[(String, Double)] = {
    val B = 1024
    val vocabT = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val vocabO = Seq("omega", "psi", "chi", "phi", "upsilon", "tau")
    val stops = Seq("the", "and", "of", "to", "a", "in")
    // 12 words; stop positions carry the label: 6 stops when hi, 2 when lo
    def text(domainVocab: Seq[String], hiStops: Column, salt: Int): Column =
      concat_ws(" ", (0 until 12).map { j =>
        val isStop =
          when(hiStops, lit(j % 2 == 0)).otherwise(lit(j == 0 || j == 6))
        when(isStop, Synthetic.pick(col("id"), salt * 100 + j, stops))
          .otherwise(Synthetic.pick(col("id"), salt * 100 + j, domainVocab))
      }: _*)
    def labeled(ids: DataFrame, domainVocab: Seq[String], inverted: Boolean,
                salt: Int): DataFrame = {
      val y = (Synthetic.u(col("id"), salt = salt) < 0.5).cast("int")
      val hi = if (inverted) y === 0 else y === 1
      ids.select(col("id").as("doc_id"), lit("pool").as("source"),
        text(domainVocab, hi, salt).as("text"), y.as("label"))
    }
    val base = spark.range(1400).toDF()
    // unlabeled target sample for the selector (its own id range + salt)
    val targetSample = base.filter(col("id") < 60)
      .select(col("id").as("doc_id"), text(vocabT,
        Synthetic.u(col("id"), salt = 7) < 0.5, 1).as("text"))
    // pool: 300 target-like + 300 off-domain (inverted feature-label)
    val pool = labeled(base.filter(col("id") >= 100 && col("id") < 400),
        vocabT, inverted = false, salt = 2)
      .unionByName(labeled(base.filter(col("id") >= 400 && col("id") < 700),
        vocabO, inverted = true, salt = 3))
      .cache()
    // held-out target-domain eval set, disjoint ids
    val eval = labeled(base.filter(col("id") >= 700 && col("id") < 1100),
      vocabT, inverted = false, salt = 4).cache()

    val ratio = graft.operators.Dsir.logRatio(
      graft.operators.Dsir.bucketCounts(targetSample, col("text"), B),
      graft.operators.Dsir.bucketCounts(
        pool.select("doc_id", "text"), col("text"), B), B)
    val w = graft.operators.Dsir.importanceWeights(pool, col("doc_id"),
      col("text"), ratio, B).cache()
    val budget = 150
    def subset(sel: DataFrame): DataFrame =
      pool.join(sel.select(col("id").as("doc_id")), "doc_id")
    val dsirSel = subset(graft.operators.Dsir.gumbelTopK(
      w, col("id"), col("log_w"), budget))
    val randSel = subset(graft.operators.Dsir.gumbelTopK(
      w.withColumn("_u0", lit(0.0)), col("id"), col("_u0"), budget))

    def holdoutAuc(train: DataFrame): Double = {
      val feats = graft.queries.QualityModelQueries.features(train)
        .join(train.select(col("doc_id"), col("label")), "doc_id")
      val m = graft.ml.NewtonBoost.fit(canon(feats, col("doc_id")),
        graft.queries.QualityModelQueries.featureCols, "label",
        graft.ml.NewtonBoost.Params(rounds = 4, maxDepth = 3,
          learningRate = 0.3, maxBins = 16))
      val scored = graft.queries.QualityModelQueries.features(eval)
        .join(eval.select(col("doc_id"), col("label")), "doc_id")
        .select(col("label"), m.score.as("score"))
      RankingMetrics.auc(scored, col("score"), col("label"))
    }
    val out = Seq(
      "dsir_efficacy_dsir_auc" -> holdoutAuc(dsirSel),
      "dsir_efficacy_random_auc" -> holdoutAuc(randSel),
      "dsir_efficacy_select_target_frac" ->
        // the SAME deterministic draw as dsirSel — reuse it, don't
        // re-run the global top-k + pool join
        dsirSel.agg(avg((col("doc_id") < 400).cast("double")))
          .head.getDouble(0))
    pool.unpersist(); eval.unpersist(); w.unpersist()
    out
  }

  /** The streaming-p95 substitution bound (VERDICT r16 #5): max
    * relative divergence of `percentile_approx` (the streaming twin's
    * mergeable sketch, at its shipped accuracy) vs the batch exact-rank
    * p95, on the adversarial heavy-tail fixture — the documented
    * substitution carries a measured number, spec-floored in
    * `OpsP95DivergenceSpec`. */
  def opsP95Metrics(spark: SparkSession): Seq[(String, Double)] = {
    val rows = graft.serve.OpsMetrics.p95ApproxDivergence(spark).collect()
    Seq(
      "ops_p95_approx_rel_err" -> rows.map(_.getAs[Double]("rel_err")).max,
      "ops_p95_exact_ms" -> rows.map(_.getAs[Double]("p95_exact")).max)
  }

  def computeAll(spark: SparkSession): Seq[(String, Double)] =
    orderingGateMetrics(spark) ++ referenceConfigMetrics(spark) ++
      erMetrics(spark) ++ newtonBoostMetrics(spark) ++
      AnnRecall.measure(spark) ++ AnnRecall.operatingCurve(spark) ++
      AnnRecall.opqGate(spark) ++ AnnRecall.twoStageCurve(spark) ++
      opsP95Metrics(spark) ++
      skewEvidence(spark) ++
      dsirMetrics(spark) ++ dsirEfficacyMetrics(spark)

  /** Wall-clock rows (the skew-evidence timings) are measurements of
    * the HOST, not of seeded model output — run-to-run noise there is
    * bench-flag territory (BENCH_METHOD.md), not metric drift; flagging
    * them here would emit phantom moves every round. */
  private def isWallClock(key: String): Boolean =
    key.endsWith("_sec") || key.endsWith("_speedup_x")

  /** A move is flagged when it exceeds max(0.02 absolute, 15% of prev) —
    * wide enough for partition-layout float jitter, tight enough that a
    * changed trainer default or broken feature trips it. Wall-clock
    * rows are recorded but never flagged. */
  def flagged(now: Seq[(String, Double)], prev: Map[String, Double])
      : Seq[(String, Double, Double)] =
    now.collect {
      case (k, v) if !isWallClock(k) && prev.contains(k) &&
          math.abs(v - prev(k)) > math.max(0.02, 0.15 * math.abs(prev(k))) =>
        (k, prev(k), v)
    }

  /** Compute the suite, diff against the committed previous ledger, write
    * the new ledger. Returns the flagged moves. */
  def writeLedger(spark: SparkSession,
                  path: String = "metrics_detail.json")
      : Seq[(String, Double, Double)] = {
    val prev: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)))
        "\"([a-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val now = computeAll(spark)
    val moves = flagged(now, prev)
    moves.foreach { case (k, p, v) =>
      System.err.println(f"[metrics] MOVE $k prev=$p%.4f now=$v%.4f")
    }
    // Locale.ROOT, never the f-interpolator: a comma-decimal default
    // locale (de_DE) would write 0,712345 — invalid JSON AND invisible
    // to the prev-parse regex, silently disarming the move gate
    def d6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val metricsJson = now
      .map { case (k, v) => s""""$k":${d6(v)}""" }.mkString("{", ",", "}")
    val movesJson = moves
      .map { case (k, p, v) =>
        s""""$k":{"prev":${d6(p)},"now":${d6(v)}}""" }
      .mkString("{", ",", "}")
    val w = new java.io.PrintWriter(path)
    try w.println(
      s"""{"metrics":$metricsJson,"moves_vs_prev":$movesJson}""")
    finally w.close()
    moves
  }

  /** Standalone runner: tools/run.sh graft.evaluate.MetricsLedger [cpus]
    * (the optional cpus arg exists to PROVE layout-invariance: the
    * ledger values must match between local[4] and local[32]). */
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    writeLedger(spark)
    spark.stop()
  }
}
