package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.NewtonBoost
import graft.sources.Tables

/**
 * Discriminative model-based quality filter (q196) — the fastText/
 * logistic-classifier pipeline stage of the GPT-3/LLaMA lineage (Brown
 * et al. 2020 Appendix A: train a classifier to separate a trusted
 * target corpus from the raw pool, keep raw documents the classifier
 * scores target-like), realized with the in-engine second-order
 * booster ([[graft.ml.NewtonBoost]]) over four scan-local text
 * features. The generative counterpart is DSIR (q194/q195): same
 * target-vs-raw framing, hashed-n-gram LM ratio instead of a trained
 * discriminator — shipping both is exactly the ablation the curation
 * literature runs.
 *
 * Features are cheap, row-local, and engine-portable (the q52/q175
 * expression conventions): whitespace token count, mean word length,
 * stopword ratio, duplicate-word fraction. The model is a frozen
 * fixture trained in-engine on sf0.01 (label: source = 'src0', the
 * target-domain convention shared with q93/q133/q194) and embedded in
 * the plan as pure codegen CASE expressions — scoring is one
 * projection fused into the scan, no shuffle, no broadcast: the 100 TB
 * filter shape. `graft.tools.FitFixtures` regenerates the JSON;
 * QualityModelSpec asserts the refit matches the frozen literal byte
 * for byte (NewtonBoost fits are partition-invariant), so the fixture
 * can never silently drift from the code that claims to produce it.
 *
 * Oracle parity: features are identical double arithmetic both sides;
 * the margin SQL is compiled from the same JSON node for node
 * ([[NewtonBoost.Model.marginSql]], the q193 discipline); floats round
 * to 6dp; `keep` thresholds the UNROUNDED margin identically on both
 * sides at [[KeepMargin]] — the fixture's margins take 8 distinct
 * values on this corpus and the cut sits in a 0.12-wide gap between
 * clusters (−1.1876 vs −1.3097), far beyond float-noise scale.
 */
object QualityModelQueries {

  /** Must match the q52 oracle's stopword list verbatim. */
  private val Stopwords =
    Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it")

  val featureCols: Seq[String] =
    Seq("n_tokens_d", "mean_len", "stop_ratio", "dup_frac")

  /** Keep cut on the raw margin: the class is rare (~5% prior), so the
    * useful gate is "enriched well above prior", not score ≥ 0.5 —
    * keeps the top margin clusters (the docs the trees actively pushed
    * target-ward). */
  val KeepMargin: Double = -1.25

  private def toksC: Column =
    filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)

  /** (doc_id, source, n_tokens_d, mean_len, stop_ratio, dup_frac) —
    * one codegen projection over the scan; zero-token docs get 0.0
    * ratios (mirrored in the oracle's CASE guards). */
  def features(docs: DataFrame): DataFrame = {
    val n = size(col("_w"))
    docs.select(col("doc_id"), col("source"), toksC.as("_w"))
      .select(col("doc_id"), col("source"),
        n.cast("double").as("n_tokens_d"),
        when(n === 0, lit(0.0)).otherwise(
          aggregate(transform(col("_w"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).cast("double") / n).as("mean_len"),
        when(n === 0, lit(0.0)).otherwise(
          size(filter(col("_w"), t => t.isin(Stopwords: _*))).cast("double") / n)
          .as("stop_ratio"),
        when(n === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(col("_w"))).cast("double") / n)
          .as("dup_frac"))
  }

  /** Refit the fixture: 4 rounds, depth 3, lr 0.3, 16 hist bins on the
    * named dir's documents, label = (source = 'src0'). Deterministic —
    * rerunning reproduces [[modelJson]] exactly. */
  def fit(s: SparkSession, dir: String): NewtonBoost.Model = {
    val f = features(Tables.load(s, dir, "documents"))
      .withColumn("label", (col("source") === "src0").cast("int"))
    NewtonBoost.fit(f, featureCols, "label",
      NewtonBoost.Params(rounds = 4, maxDepth = 3, learningRate = 0.3,
        maxBins = 16))
  }

  /** Frozen fixture — regenerate with `tools/run.sh graft.tools.FitFixtures`. */
  val modelJson: String =
    """{"features":["n_tokens_d","mean_len","stop_ratio","dup_frac"],"lr":0.3,"base":0.5,"trees":[{"w":-1.7857142857142858},{"w":-1.358885247480313},{"f":1,"b":13,"t":4.729518581081081,"dl":true,"v":-1.1302048679665857,"l":{"w":-1.1717972791367766},"r":{"f":2,"b":1,"t":0.022222222222222223,"dl":true,"v":-0.7772571592396708,"l":{"w":-1.142934868748517},"r":{"f":0,"b":6,"t":48.0,"dl":true,"v":-0.46413772024622435,"l":{"w":-0.6378060315891196},"r":{"w":-0.11437773619456018}}}},{"f":1,"b":13,"t":4.729518581081081,"dl":true,"v":-0.9756353460949838,"l":{"w":-1.0161094418382506},"r":{"f":0,"b":3,"t":32.0,"dl":true,"v":-0.6554593002720045,"l":{"w":-1.0242765540173846},"r":{"f":3,"b":4,"t":0.4358974358974359,"dl":true,"v":-0.37409436444255384,"l":{"w":0.32877107012568113},"r":{"w":-0.5834219053480925}}}}]}"""

  def model: NewtonBoost.Model = NewtonBoost.fromJson(modelJson)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q196_quality_model" -> ((s, dir) => {
      // frozen-classifier scoring of every document: features + margin
      // + score in ONE whole-stage-codegen projection over the scan
      val m = model
      features(Tables.loadSpread(s, dir, "documents"))
        .withColumn("_mr", m.margin)
        .select(col("doc_id"),
          round(col("n_tokens_d"), 6).as("n_tokens_d"),
          round(col("mean_len"), 6).as("mean_len"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(col("dup_frac"), 6).as("dup_frac"),
          round(col("_mr"), 6).as("margin"),
          round(lit(1.0) / (lit(1.0) + exp(-col("_mr"))), 6).as("score"),
          (col("_mr") >= KeepMargin).as("keep"))
        .orderBy("doc_id")
    }))

  /** The four feature expressions as DuckDB SQL over a `toks` list
    * column — shared with the q199 oracle so the two replays can never
    * diverge. */
  lazy val featureSql: String = {
    val stops = Stopwords.map(s => s"'$s'").mkString(", ")
    raw"""CAST(len(toks) AS DOUBLE) AS n_tokens_d,
       |    CASE WHEN len(toks) = 0 THEN 0.0E0
       |      ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks)
       |      END AS mean_len,
       |    CASE WHEN len(toks) = 0 THEN 0.0E0
       |      ELSE CAST(len(list_filter(toks, t -> list_contains([$stops], t))) AS DOUBLE) / len(toks)
       |      END AS stop_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0E0
       |      ELSE 1.0E0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |      END AS dup_frac""".stripMargin
  }

  lazy val oracleSql: Map[String, String] = {
    val m = model
    // the ONE tunable cut, emitted as a DOUBLE literal (E0 appended
    // unless toString already carries an exponent) — retuning
    // KeepMargin can never desynchronize the oracle from the Spark gate
    val keepLit = {
      val t = KeepMargin.toString
      if (t.contains("E") || t.contains("e")) t else t + "E0"
    }
    Map(
      "q196_quality_model" ->
        raw"""WITH d AS (SELECT doc_id,
           |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
           |  FROM documents),
           |f AS (SELECT doc_id,
           |    $featureSql
           |  FROM d),
           |s AS (SELECT doc_id, n_tokens_d, mean_len, stop_ratio, dup_frac,
           |    ${m.marginSql} AS _mr
           |  FROM f)
           |SELECT doc_id,
           |  round(n_tokens_d, 6) AS n_tokens_d, round(mean_len, 6) AS mean_len,
           |  round(stop_ratio, 6) AS stop_ratio, round(dup_frac, 6) AS dup_frac,
           |  round(_mr, 6) AS margin,
           |  round((1.0E0 / (1.0E0 + exp(-_mr))), 6) AS score,
           |  _mr >= $keepLit AS keep
           |FROM s ORDER BY doc_id""".stripMargin)
  }
}
