package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Candidates, EntityResolution, Features}
import graft.operators.EntityResolution.AccountCols
import graft.sources.Tables

/**
 * Entity-resolution / feature-engineering / candidate-generation queries
 * (SURVEY §2 J1-J3, F9-F20, A14) over the testdata, exercised on an
 * "accounts" view derived deterministically from `customer` ⋈ `nation`
 * (same derivation written in both engines, so oracles stay exact):
 *
 *   website   = 'www.corp' || (c_custkey % 50) || '.com'
 *   employees = (c_custkey % 7) * 150     (zeros exercise the 0.5 default)
 *   created   = DATE '1992-01-01' + (c_custkey % 2000) days
 *   last_act  = NULL when c_custkey % 11 = 0 else created + (c_custkey % 300)
 *   revenue   = greatest(c_acctbal, 0) * 1000
 *   asOf      = DATE '1998-12-01' (frozen, never now() — SURVEY §7.4.3)
 *
 * Jaro-Winkler-bearing outputs ARE oracle-checked, but NOT via DuckDB's
 * builtins: jaro_similarity counts matches differently from the reference
 * algorithm on ~4% of real pairs and jaro_winkler_similarity gates the
 * prefix boost on jaro > 0.7 where the reference boosts unconditionally
 * (both verified empirically). Instead [[jwOracleCte]] implements the
 * reference matching loop exactly as a recursive CTE (bit mask per side,
 * greedy window match, transpositions over matched chars) — fuzz-verified
 * bit-identical to JaroWinkler.compute on 17k adversarial random pairs and
 * on every distinct pair the blocked join produces at sf0.1. Fractional SQL
 * literals are CAST to DOUBLE: DuckDB parses `0.1` as DECIMAL and
 * `3 * 0.1` in decimal is exactly 0.3, one ulp off Scala's
 * `3 * 0.1 = 0.30000000000000004`.
 */
object ErQueries {

  /** The shared accounts view (Spark side). loadSpread: the customer file
    * is one unsplittable row group — without it prepSide's normalize and
    * every downstream similarity kernel scan-stage runs on one core. */
  def accounts(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.loadSpread(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation")
    val created = date_add(lit("1992-01-01").cast("date"),
      (col("c_custkey") % 2000).cast("int"))
    cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .select(
        col("c_custkey").as("Id"),
        col("c_name").as("Name"),
        concat(lit("www.corp"), (col("c_custkey") % 50).cast("string"), lit(".com"))
          .as("Website"),
        col("n_name").as("BillingCountry"),
        col("c_mktsegment").as("Industry"),
        ((col("c_custkey") % 7) * 150.0).as("NumberOfEmployees"),
        created.as("CreatedDate"),
        when(col("c_custkey") % 11 === 0, lit(null).cast("date"))
          .otherwise(date_add(created, (col("c_custkey") % 300).cast("int")))
          .as("LastActivityDate"),
        (greatest(col("c_acctbal"), lit(0.0)) * 1000).as("AnnualRevenue"),
        col("n_regionkey").as("_region"))
  }

  private val cols = AccountCols()
  private val asOf = lit("1998-12-01").cast("timestamp")

  /** Blocked a/b pair space over parity-split orgs, with ER prep columns.
    * Blocks on FULL country: the testdata's synthetic names all normalize to
    * the same 3-char prefix ("cus") and nations to "nat", so the reference's
    * 3+3 key degenerates to one hot block (= accidental cross join). The
    * 3+3 key itself is oracle-covered by q17. */
  /** Multi-attribute block: country AND employee-size bucket (width 300).
    * Single-key country blocks are hot (600+ rows/side at sf0.1 → 90k+
    * pairs each); the size bucket is the coarse-to-fine second key that
    * production ER uses to split hot blocks (EntityResolution scaladoc
    * scale note) — true matches rarely differ by a full size bucket. */
  private val blockCond =
    col("a_country") === col("b_country") &&
      floor(col("a_employees") / 300) === floor(col("b_employees") / 300)

  private def blockedPairs(s: SparkSession, dir: String): DataFrame = {
    val acc = accounts(s, dir)
    val a = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 0), cols, "a")
    val b = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 1), cols, "b")
    EntityResolution.candidatePairs(a, b, blockOn = Some(blockCond))
  }

  /** q159's deterministically SKEWED account frame: the unmutated
    * synthetic names all normalize to the "cus" 3-char prefix, so rows
    * left unmutated (Id % 5 == 0, ~20%) form ONE hot default-key
    * block; the rest get one of eight distinct word prefixes and
    * spread. Thinned 3x (Id % 3 == 0) so the oracle's recursive JW
    * CTE stays at q32 cost at the gate SF. */
  private val spreadWords = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel")
  private def skewedAccounts(s: SparkSession, dir: String): DataFrame =
    accounts(s, dir)
      .filter(col("Id") % 3 === 0)
      .withColumn("Name",
        when(col("Id") % 5 === 0, col("Name"))
          .otherwise(concat(
            element_at(array(spreadWords.map(lit): _*),
              (pmod(col("Id"), lit(8)) + 1).cast("int")),
            lit(" "), col("Name"))))

  /** Spec access to the q159 fixture (PlanShapeSpec's skew-share gate). */
  def skewedAccountsForSpec(s: SparkSession, dir: String): DataFrame =
    skewedAccounts(s, dir)

  /** The JW-free rule score q36 thresholds and q147 calibrates — ONE
    * definition so the threshold and its calibration can never drift
    * apart. (The oracle-side twin is [[ruleFeatSql]].) */
  private def ruleScore: Column = {
    val feats = EntityResolution.pairFeatures.toMap
    feats("domain_exact_match") * 0.4 +
      greatest(feats("name_jaccard"), feats("name_levenshtein")) * 0.4 +
      (feats("same_country") * 0.4 + feats("same_industry") * 0.3 +
        feats("size_ratio") * 0.3) * 0.2
  }

  /** The synthetic match label shared by q36 and q147. */
  private def ruleLabel: Column = {
    val feats = EntityResolution.pairFeatures.toMap
    feats("same_industry") === 1.0 && feats("size_ratio") > 0.5
  }

  /** DuckDB twin of the rule-score inputs: the toks/f feature CTEs both
    * q36 and q147 prepend (expects `acc`/`pairs` in scope; yields
    * f(de, jac, lev, scn, si, sr)). */
  private val ruleFeatSql =
    """toks AS (SELECT p.*,
      |  list_distinct(list_filter(string_split(a_norm, ' '), x -> len(x) > 2)) AS a_toks,
      |  list_distinct(list_filter(string_split(b_norm, ' '), x -> len(x) > 2)) AS b_toks
      |  FROM pairs p),
      |f AS (SELECT
      |  CASE WHEN a_dom = b_dom THEN 1.0 ELSE 0.0 END AS de,
      |  CASE WHEN len(a_toks)=0 OR len(b_toks)=0 THEN 0.0
      |    ELSE CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE) /
      |      len(list_distinct(list_concat(a_toks, b_toks))) END AS jac,
      |  CASE WHEN len(a_norm)=0 OR len(b_norm)=0 THEN 0.0
      |    ELSE 1.0 - levenshtein(a_norm, b_norm) /
      |      CAST(greatest(len(a_norm), len(b_norm)) AS DOUBLE) END AS lev,
      |  CASE WHEN a_country = b_country AND a_country <> '' THEN 1.0 ELSE 0.0 END AS scn,
      |  CASE WHEN a_industry = b_industry AND a_industry <> '' THEN 1.0 ELSE 0.0 END AS si,
      |  CASE WHEN a_emp > 0 AND b_emp > 0
      |    THEN least(a_emp, b_emp) / greatest(a_emp, b_emp) ELSE 0.5 END AS sr
      |  FROM toks)""".stripMargin

  /** DuckDB twin of [[ruleScore]]/[[ruleLabel]] over `f`. Every literal
    * is CAST to DOUBLE (the file convention): the f-columns are already
    * DOUBLE so each product would promote anyway, but the casts make
    * the both-engines-double-from-the-first-op property explicit — it
    * is what lets the margin guard treat an exactly-on-edge score as
    * sound (identical doubles, identical op order, identical floor). */
  private val ruleScoreSql =
    "(de*CAST(0.4 AS DOUBLE) + greatest(jac, lev)*CAST(0.4 AS DOUBLE) + " +
      "(scn*CAST(0.4 AS DOUBLE) + si*CAST(0.3 AS DOUBLE) + " +
      "sr*CAST(0.3 AS DOUBLE))*CAST(0.2 AS DOUBLE))"
  private val ruleLabelSql = "(si = 1.0 AND sr > 0.5)"

  /** Float-stability guard for the rule-score gates (the Q122Margin
    * discipline): q36's 0.75 threshold and q147's 0.02-band floors are
    * exact-hash-sound only while every score keeps clear of its knife
    * edge. Both margins are measured on the SCORE scale (the band
    * distance divides the ×50 back out) against the same 1e-9 bound —
    * ~10⁶× the worst engine divergence for this fixed-order formula.
    *
    * A score EXACTLY on an edge (distance bitwise 0.0) is SOUND, not a
    * knife edge: it arises from structurally-exact 0/1 feature combos
    * (a perfect-match pair scores exactly 1.0), both engines compute
    * the identical double from identical inputs and op order, and
    * floor/compare agree on the exact value — only a score NEAR but
    * not on an edge can land on different sides across engines (the
    * oracle's [[ruleScoreSql]] is explicitly all-double so this premise
    * is structural, not incidental). Invoked by Verify before EACH of
    * the two queries — deliberately unmemoized, so a table regenerated
    * under the same path between runs is re-checked; the duplicate
    * blocked-pair scan costs ~a second at the gate SF, the staleness
    * hole it would open is the exact failure mode the guard exists
    * for. */
  def assertScoreMarginsSound(s: SparkSession, dir: String): Unit = {
    val scores = blockedPairs(s, dir).select(ruleScore.as("score"))
    val bandDist = abs(col("score") * 50 - round(col("score") * 50, 0)) / 50
    val thrDist = abs(col("score") - 0.75)
    val row = scores.agg(
      min(when(bandDist =!= 0.0, bandDist)).as("band"),
      min(when(thrDist =!= 0.0, thrDist)).as("thr")).head
    def orInf(i: Int) =
      if (row.isNullAt(i)) Double.PositiveInfinity else row.getDouble(i)
    val (band, thr) = (orInf(0), orInf(1))
    require(band > 1e-9 && thr > 1e-9,
      f"rule-score float-margin guard: minBandDist=$band%.3e " +
        f"minThresholdDist=$thr%.3e (bound 1e-09, score scale) — a " +
        "score sits NEAR a q147 band edge or q36's 0.75 threshold; " +
        "the exact-hash oracle gate is unsound for this data.")
  }

  // DuckDB fragments for the same derivations.
  private val accSql =
    """acc AS (
      |  SELECT c_custkey AS id,
      |    array_to_string(list_filter(string_split_regex(
      |      regexp_replace(lower(trim(c_name)), '[^\w\s&]', ' ', 'g'), '\s+'),
      |      x -> len(x) > 0), ' ') AS norm,
      |    'corp' || (c_custkey % 50) || '.com' AS dom,
      |    n_name AS country, c_mktsegment AS industry,
      |    (c_custkey % 7) * 150.0 AS employees,
      |    DATE '1992-01-01' + CAST(c_custkey % 2000 AS INTEGER) AS created,
      |    CASE WHEN c_custkey % 11 = 0 THEN NULL
      |      ELSE DATE '1992-01-01' + CAST(c_custkey % 2000 AS INTEGER)
      |           + CAST(c_custkey % 300 AS INTEGER) END AS last_act,
      |    greatest(c_acctbal, 0) * 1000 AS revenue,
      |    n_regionkey AS region
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)""".stripMargin

  private val pairSql =
    """pairs AS (
      |  SELECT a.id AS a_id, b.id AS b_id,
      |    a.norm AS a_norm, b.norm AS b_norm, a.dom AS a_dom, b.dom AS b_dom,
      |    a.country AS a_country, b.country AS b_country,
      |    a.industry AS a_industry, b.industry AS b_industry,
      |    a.employees AS a_emp, b.employees AS b_emp
      |  FROM acc a JOIN acc b
      |    ON a.country = b.country
      |   AND floor(a.employees / 300) = floor(b.employees / 300)
      |   AND a.id % 2 = 0 AND b.id % 2 = 1)""".stripMargin

  /** The q35 recommendation set (reference: pipeline.py:375-415,
    * api/main.py:589-641): weighted feature vote → confidence bucket →
    * type → estimated value → next action, pruned at 0.5. Shared by
    * q35 (full set) and q120 (notification digest over it). */
  private def recommendationFrame(s: SparkSession, dir: String): DataFrame = {
    val acc = accounts(s, dir).withColumnRenamed("_region", "org")
      .select(col("Id").as("id"), col("org"), col("Industry").as("industry"),
        col("BillingCountry").as("country"),
        col("NumberOfEmployees").as("employees"),
        col("CreatedDate").as("created"),
        col("LastActivityDate").as("last_activity"),
        col("AnnualRevenue").as("revenue"))
    val pairs = Candidates.candidatePairs(acc, "org",
      Seq(col("revenue").desc, col("id").asc), 50)
    val feats = Features.withFeatures(pairs, Features.pairFeatures(asOf))
    val score = col("industry_match") * 0.35 + col("size_compatibility") * 0.30 +
      col("geo_proximity") * 0.20 + col("maturity_alignment") * 0.15
    val scored = feats.withColumn("score", score)
    Candidates.prune(scored, col("score"), 0.5)
      .select(col("a_id"), col("b_id"), round(col("score"), 6).as("score"),
        when(col("score") > 0.8, "High").when(col("score") > 0.6, "Medium")
          .otherwise("Low").as("confidence"),
        when(col("industry_match") === 1.0, "Industry Expansion")
          .otherwise("Market Development").as("recommendation_type"),
        graft.ml.Scoring.estimatedPairValue(col("a_revenue"), col("b_revenue"))
          .as("estimated_value"),
        graft.ml.Scoring.nextBestAction(col("score")).as("next_best_action"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_er_features" -> ((s, dir) => {
      // 7 SQL-exact of the 9 ER pair features (reference:
      // entity_resolution.py:296-350); the 2 JW features are oracle-covered
      // end-to-end through q32's match_score (recursive-CTE JW oracle).
      blockedPairs(s, dir)
        .select(Seq(col("a_id").cast("long").as("a_id"),
          col("b_id").cast("long").as("b_id")) ++
          EntityResolution.pairFeatures.collect {
            case (n, c) if n != "domain_similarity" && n != "name_jaro_winkler" =>
              round(c, 6).as(n)
          }: _*)
        .orderBy("a_id", "b_id")
    }),

    "q32_er_resolve" -> ((s, dir) => {
      // Full resolve(): exact-shortcut ∪ fuzzy ≥ 0.7 with reasons
      // (reference: entity_resolution.py:403-446). JW inside → rows-only.
      val acc = accounts(s, dir)
      EntityResolution.resolve(
          acc.filter(col("Id") % 2 === 0), acc.filter(col("Id") % 2 === 1), cols,
          EntityResolution.Config(matchThreshold = 0.85),
          blockOn = Some(blockCond))
        .select(col("account1_id"), col("account2_id"),
          round(col("match_score"), 6).as("match_score"),
          col("match_type"), col("confidence"),
          array_join(col("match_reasons"), "|").as("reasons"))
        .orderBy("account1_id", "account2_id")
    }),

    "q213_er_block_stats" -> ((s, dir) => {
      // the pre-flight block-budget instrument (SCALING.md §q32): per
      // q32 blocking key (country × size band), both sides' counts and
      // the pair space the blocked join WILL generate — O(n) to
      // measure what costs O(Σ na·nb) to run. The gate row pins the
      // instrument's math; its sf-decade readings (61 → 6,010 →
      // 596,153 pairs) are the SCALING.md quadratic-pair-space
      // evidence.
      val acc = accounts(s, dir)
      val a = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 0),
        cols, "a")
      val b = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 1),
        cols, "b")
      EntityResolution.blockPairStats(a, b,
          concat(col("a_country"), lit("|"),
            floor(col("a_employees") / 300).cast("long")),
          concat(col("b_country"), lit("|"),
            floor(col("b_employees") / 300).cast("long")))
        .orderBy(col("pairs").desc, col("block").asc)
    }),

    "q159_er_salted_skew" -> ((s, dir) => {
      // q32's resolve under a HOT default blocking key, salted 8 ways
      // (SaltedJoin.joinOn via resolve(salt = 8): a-side rows salted on
      // their unique id, b-side exploded 8x) — the declared end-to-end
      // exercise of the ER skew recipe. The skewed frame plants one
      // 3-char block holding ~20% of rows (see skewedAccounts); the
      // oracle replays the UNSALTED default-key join — salting is
      // row-identical by contract, so the same SQL gates the salted
      // plan. Plan gate: PlanShapeSpec asserts the salt columns and
      // the 8x Generate actually appear in this query's plan.
      val acc = skewedAccounts(s, dir)
      EntityResolution.resolve(
          acc.filter(col("Id") % 2 === 0), acc.filter(col("Id") % 2 === 1),
          cols, EntityResolution.Config(matchThreshold = 0.85), salt = 8)
        .select(col("account1_id"), col("account2_id"),
          round(col("match_score"), 6).as("match_score"),
          col("match_type"), col("confidence"),
          array_join(col("match_reasons"), "|").as("reasons"))
        .orderBy("account1_id", "account2_id")
    }),

    "q33_pair_features" -> ((s, dir) => {
      // 6 cross-org pair features (reference: pipeline.py:108-157 F14) over
      // candidate pairs: region=org, top-50 by revenue per org (A2/J1/J2).
      val acc = accounts(s, dir).withColumnRenamed("_region", "org")
        .select(col("Id").as("id"), col("org"), col("Industry").as("industry"),
          col("BillingCountry").as("country"),
          col("NumberOfEmployees").as("employees"),
          col("CreatedDate").as("created"),
          col("LastActivityDate").as("last_activity"),
          col("AnnualRevenue").as("revenue"))
      val pairs = Candidates.candidatePairs(acc, "org",
        Seq(col("revenue").desc, col("id").asc), 50)
      Features.withFeatures(pairs, Features.pairFeatures(asOf))
        .select(Seq(col("a_id"), col("b_id")) ++
          Features.pairFeatures(asOf).map { case (n, _) => round(col(n), 6).as(n) }: _*)
        .orderBy("a_id", "b_id")
    }),

    "q34_account_features" -> ((s, dir) => {
      // account features (reference: pipeline.py:65-106 F9-F13)
      val acc = accounts(s, dir)
      val feats = Features.accountFeatures(col("AnnualRevenue"),
        col("NumberOfEmployees"), col("CreatedDate"), col("LastActivityDate"), asOf)
      acc.select(Seq(col("Id").as("id")) ++
          feats.map { case (n, c) => round(c, 6).as(n) }: _*)
        .orderBy("id")
    }),

    "q35_recommendations" -> ((s, dir) =>
      recommendationFrame(s, dir).orderBy("a_id", "b_id")),

    "q120_notify_digest" -> ((s, dir) => {
      // notification digest over the q35 recommendation set (reference:
      // utils/notifications.py:120-199): top-5 by score with the
      // headline stats every channel's header interpolates. Score
      // renders at 2dp exactly as the reference's {:.2f}.
      graft.serve.Serve.notifyDigest(recommendationFrame(s, dir), n = 5,
          tiebreak = Seq(col("a_id").asc, col("b_id").asc))
        .select(col("rank"), col("a_id"), col("b_id"),
          round(col("score"), 2).as("score"), col("estimated_value"),
          col("next_best_action"), col("n_total"), col("total_value"))
        .orderBy("rank")
    }),

    "q36_er_confusion" -> ((s, dir) => {
      // confusion metrics at a threshold (reference:
      // entity_resolution.py:554-613 A14) on a JW-free score vs synthetic label
      val p = blockedPairs(s, dir)
      val labeled = p.withColumn("pred", ruleScore >= 0.75)
        .withColumn("label", ruleLabel)
      EntityResolution.confusionMetrics(labeled, col("pred"), col("label"))
        .select(col("tp"), col("fp"), col("fn"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"), round(col("f1"), 6).as("f1"))
    }),

    "q147_score_calibration" -> ((s, dir) => {
      // reliability curve for the q36 rule score: 0.02-wide score bands
      // vs observed positive rate — the calibration evidence a reviewer
      // reads before trusting a threshold (q36 picks 0.75; this shows
      // what each score band actually delivers). ONE definition of the
      // score and label ([[ruleScore]]/[[ruleLabel]]) serves both
      // queries, so an edit to the weights cannot silently decouple the
      // threshold from its calibration. Every output is exact (counts +
      // one division), so no float-sum ordering risk crosses the oracle.
      val p = blockedPairs(s, dir)
      p.select(ruleScore.as("score"), ruleLabel.cast("long").as("label"))
        .withColumn("bucket",
          least(floor(col("score") * 50).cast("long"), lit(49L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("label").as("n_pos"),
          round(sum("label").cast("double") / count(lit(1)), 6)
            .as("pos_rate"))
        .orderBy("bucket")
    })
  )

  /** Reference Jaro-Winkler as DuckDB SQL (see class scaladoc for why the
    * builtins don't work). Expects a prior CTE `jwtasks(s1, s2)` holding the
    * distinct non-equal non-empty string pairs; yields `jwv(s1, s2, v)`.
    * The recursion folds the greedy match loop over i (one step per char of
    * s1, ≤20 here) carrying the matched-bit masks; transpositions compare
    * the matched subsequences; the final arithmetic mirrors the Scala
    * kernel's operation order so doubles come out bit-identical. The
    * BIGINT masks hold strings up to 63 chars — the base member errors
    * LOUDLY past that rather than silently corrupting the bookkeeping
    * (the Scala kernel has no such limit). */
  private val jwCteSql: String =
    """jwsteps AS (
      |  SELECT s1, s2,
      |    CASE WHEN len(s1) > 63 OR len(s2) > 63
      |      THEN error('jw oracle: string exceeds the 63-char BIGINT mask')
      |      ELSE len(s1) END AS l1,
      |    len(s2) AS l2,
      |    greatest(greatest(len(s1), len(s2)) // 2 - 1, 0) AS md,
      |    0 AS i, 0::BIGINT AS m1, 0::BIGINT AS m2, 0 AS matches
      |  FROM jwtasks
      |  UNION ALL
      |  SELECT s1, s2, l1, l2, md, i + 1,
      |    CASE WHEN j IS NULL THEN m1 ELSE m1 | (1::BIGINT << i) END,
      |    CASE WHEN j IS NULL THEN m2 ELSE m2 | (1::BIGINT << CAST(j AS INTEGER)) END,
      |    matches + CASE WHEN j IS NULL THEN 0 ELSE 1 END
      |  FROM (
      |    SELECT *, list_min(list_filter(range(greatest(0, i - md), least(i + md + 1, l2)),
      |        jj -> ((m2 >> CAST(jj AS INTEGER)) & 1) = 0
      |          AND substr(s2, CAST(jj AS INTEGER) + 1, 1) = substr(s1, i + 1, 1))) AS j
      |    FROM jwsteps WHERE i < l1) st),
      |jwtrans AS (
      |  SELECT s1, s2, l1, l2, matches,
      |    CASE WHEN matches = 0 THEN 0 ELSE CAST(list_sum(list_transform(range(1, matches + 1),
      |      k -> CASE WHEN s1cs[CAST(k AS INTEGER)] <> s2cs[CAST(k AS INTEGER)]
      |        THEN 1 ELSE 0 END)) AS INTEGER) END AS t
      |  FROM (
      |    SELECT *,
      |      list_transform(list_filter(range(0, l1), ii -> ((m1 >> CAST(ii AS INTEGER)) & 1) = 1),
      |        ii -> substr(s1, CAST(ii AS INTEGER) + 1, 1)) AS s1cs,
      |      list_transform(list_filter(range(0, l2), jj -> ((m2 >> CAST(jj AS INTEGER)) & 1) = 1),
      |        jj -> substr(s2, CAST(jj AS INTEGER) + 1, 1)) AS s2cs
      |    FROM (SELECT * FROM jwsteps WHERE i = l1) fin) d),
      |jwv AS (
      |  SELECT s1, s2,
      |    CASE WHEN matches = 0 THEN CAST(0.0 AS DOUBLE) ELSE
      |      (CAST(matches AS DOUBLE)/l1 + CAST(matches AS DOUBLE)/l2
      |        + (matches - t/2.0)/CAST(matches AS DOUBLE))/3.0
      |      + (CASE
      |          WHEN substr(s1,1,4) = substr(s2,1,4) THEN least(least(l1, l2), 4)
      |          WHEN substr(s1,1,3) = substr(s2,1,3) THEN 3
      |          WHEN substr(s1,1,2) = substr(s2,1,2) THEN 2
      |          WHEN substr(s1,1,1) = substr(s2,1,1) THEN 1
      |          ELSE 0 END) * CAST(0.1 AS DOUBLE) *
      |        (1 - (CAST(matches AS DOUBLE)/l1 + CAST(matches AS DOUBLE)/l2
      |          + (matches - t/2.0)/CAST(matches AS DOUBLE))/3.0)
      |    END AS v
      |  FROM jwtrans)""".stripMargin

  /** q159's skew-mutated account frame + UNSALTED default-key pair
    * space (name-3 + country-3 prefix equality). Salting is
    * row-identical by the SaltedJoin contract, so this unsalted replay
    * is the oracle for the salted plan. */
  private val accSql159 =
    """acc AS (
      |  SELECT c_custkey AS id,
      |    array_to_string(list_filter(string_split_regex(
      |      regexp_replace(lower(trim(
      |        CASE WHEN c_custkey % 5 = 0 THEN c_name
      |          ELSE ['alpha','bravo','charlie','delta','echo','foxtrot',
      |                'golf','hotel'][(c_custkey % 8) + 1] || ' ' || c_name
      |        END)), '[^\w\s&]', ' ', 'g'), '\s+'),
      |      x -> len(x) > 0), ' ') AS norm,
      |    'corp' || (c_custkey % 50) || '.com' AS dom,
      |    n_name AS country, c_mktsegment AS industry,
      |    (c_custkey % 7) * 150.0 AS employees
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_custkey % 3 = 0)""".stripMargin

  private val pairSql159 =
    """pairs AS (
      |  SELECT a.id AS a_id, b.id AS b_id,
      |    a.norm AS a_norm, b.norm AS b_norm, a.dom AS a_dom, b.dom AS b_dom,
      |    a.country AS a_country, b.country AS b_country,
      |    a.industry AS a_industry, b.industry AS b_industry,
      |    a.employees AS a_emp, b.employees AS b_emp
      |  FROM acc a JOIN acc b
      |    ON substring(a.norm, 1, 3) = substring(b.norm, 1, 3)
      |   AND substring(lower(a.country), 1, 3) = substring(lower(b.country), 1, 3)
      |   AND a.id % 2 = 0 AND b.id % 2 = 1)""".stripMargin

  /** Everything after the pair space in the resolve oracle — features,
    * JW-CTE consumers, scoring, reasons, the 0.85 gate. ONE definition
    * shared by q32 and the salted-skew twin q159, so the two can never
    * drift: only the account frame and the pair-space CTE differ. */
  private lazy val resolveTailSql: String =
    s"""toks AS (SELECT p.*,
        |  list_distinct(list_filter(string_split(a_norm, ' '), x -> len(x) > 2)) AS a_toks,
        |  list_distinct(list_filter(string_split(b_norm, ' '), x -> len(x) > 2)) AS b_toks
        |  FROM pairs p),
        |jwtasks AS (
        |  SELECT DISTINCT s1, s2 FROM (
        |    SELECT a_norm AS s1, b_norm AS s2 FROM pairs
        |    UNION SELECT a_dom, b_dom FROM pairs) u
        |  WHERE s1 <> s2 AND s1 <> '' AND s2 <> ''),
        |$jwCteSql,
        |feats AS (
        |  SELECT t.*,
        |    CASE WHEN a_dom = b_dom THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS dem,
        |    CASE WHEN a_dom = b_dom THEN CAST(1.0 AS DOUBLE)
        |      ELSE coalesce(jd.v, CAST(0.0 AS DOUBLE)) END AS dsim,
        |    CASE WHEN a_norm = b_norm THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS nem,
        |    CASE WHEN a_norm = '' OR b_norm = '' THEN CAST(0.0 AS DOUBLE)
        |      WHEN a_norm = b_norm THEN CAST(1.0 AS DOUBLE)
        |      ELSE coalesce(jn.v, CAST(0.0 AS DOUBLE)) END AS njw,
        |    CASE WHEN len(a_norm) = 0 OR len(b_norm) = 0 THEN CAST(0.0 AS DOUBLE)
        |      ELSE 1 - CAST(levenshtein(a_norm, b_norm) AS DOUBLE) /
        |        CAST(greatest(len(a_norm), len(b_norm)) AS DOUBLE) END AS nlev,
        |    CASE WHEN len(a_toks) = 0 OR len(b_toks) = 0 THEN CAST(0.0 AS DOUBLE)
        |      ELSE CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(a_toks, b_toks))) AS DOUBLE)
        |      END AS njac,
        |    CASE WHEN a_country = b_country AND a_country <> ''
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS sc,
        |    CASE WHEN a_industry = b_industry AND a_industry <> ''
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS si,
        |    CASE WHEN a_emp > 0 AND b_emp > 0
        |      THEN least(a_emp, b_emp) / greatest(a_emp, b_emp)
        |      ELSE CAST(0.5 AS DOUBLE) END AS sr
        |  FROM toks t
        |  LEFT JOIN jwv jn ON jn.s1 = t.a_norm AND jn.s2 = t.b_norm
        |  LEFT JOIN jwv jd ON jd.s1 = t.a_dom AND jd.s2 = t.b_dom),
        |scored AS (
        |  SELECT *,
        |    CASE WHEN dem > 0 THEN CAST(1.0 AS DOUBLE) ELSE dsim END AS dscore,
        |    CASE WHEN nem > 0 THEN CAST(1.0 AS DOUBLE)
        |      ELSE greatest(njw, njac, nlev) END AS nscore
        |  FROM feats),
        |scored2 AS (
        |  SELECT *,
        |    dscore * CAST(0.4 AS DOUBLE) + nscore * CAST(0.4 AS DOUBLE) +
        |      (sc * CAST(0.4 AS DOUBLE) + si * CAST(0.3 AS DOUBLE) +
        |       sr * CAST(0.3 AS DOUBLE)) * CAST(0.2 AS DOUBLE) AS score
        |  FROM scored)
        |SELECT CAST(a_id AS VARCHAR) AS account1_id,
        |  CAST(b_id AS VARCHAR) AS account2_id,
        |  round(CASE WHEN dem > 0 AND nem > 0 THEN CAST(1.0 AS DOUBLE)
        |    ELSE score END, 6) AS match_score,
        |  CASE WHEN dem > 0 AND nem > 0 THEN 'exact' ELSE 'fuzzy' END AS match_type,
        |  CASE WHEN dem > 0 AND nem > 0 THEN 'high'
        |    WHEN score > 0.9 THEN 'high' WHEN score > 0.8 THEN 'medium'
        |    ELSE 'low' END AS confidence,
        |  CASE WHEN dem > 0 AND nem > 0 THEN 'Exact domain and name match'
        |    ELSE array_to_string(list_filter([
        |      CASE WHEN dem > 0 THEN 'Exact domain match'
        |        WHEN dscore > 0.8
        |        THEN 'Similar domain (' || printf('%.2f', dscore) || ')' END,
        |      CASE WHEN nem > 0 THEN 'Exact name match'
        |        WHEN nscore > 0.8
        |        THEN 'Similar name (' || printf('%.2f', nscore) || ')' END,
        |      CASE WHEN sc > 0 THEN 'Same country' END,
        |      CASE WHEN si > 0 THEN 'Same industry' END],
        |      x -> x IS NOT NULL), '|') END AS reasons
        |FROM scored2
        |WHERE (dem > 0 AND nem > 0) OR score >= 0.85
        |ORDER BY account1_id, account2_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q31_er_features" ->
      s"""WITH $accSql, $pairSql,
        |toks AS (SELECT p.*,
        |  list_distinct(list_filter(string_split(a_norm, ' '), x -> len(x) > 2)) AS a_toks,
        |  list_distinct(list_filter(string_split(b_norm, ' '), x -> len(x) > 2)) AS b_toks
        |  FROM pairs p)
        |SELECT a_id, b_id,
        |  CASE WHEN a_dom = b_dom THEN 1.0 ELSE 0.0 END AS domain_exact_match,
        |  CASE WHEN a_norm = b_norm THEN 1.0 ELSE 0.0 END AS name_exact_match,
        |  round(CASE WHEN len(a_norm)=0 OR len(b_norm)=0 THEN 0.0
        |    ELSE 1.0 - levenshtein(a_norm, b_norm) /
        |      CAST(greatest(len(a_norm), len(b_norm)) AS DOUBLE) END, 6) AS name_levenshtein,
        |  round(CASE WHEN len(a_toks)=0 OR len(b_toks)=0 THEN 0.0
        |    ELSE CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a_toks, b_toks))) END, 6) AS name_jaccard,
        |  CASE WHEN a_country = b_country AND a_country <> '' THEN 1.0 ELSE 0.0 END AS same_country,
        |  CASE WHEN a_industry = b_industry AND a_industry <> '' THEN 1.0 ELSE 0.0 END AS same_industry,
        |  round(CASE WHEN a_emp > 0 AND b_emp > 0
        |    THEN least(a_emp, b_emp) / greatest(a_emp, b_emp) ELSE 0.5 END, 6) AS size_ratio
        |FROM toks ORDER BY a_id, b_id""".stripMargin,

    // replays the block-budget instrument: per-key counts on each
    // parity side and their product, hottest first
    "q213_er_block_stats" ->
      s"""WITH $accSql,
        |na AS (SELECT country || '|' ||
        |      CAST(CAST(floor(employees / 300) AS BIGINT) AS VARCHAR)
        |      AS block, CAST(count(*) AS BIGINT) AS na
        |  FROM acc WHERE id % 2 = 0 GROUP BY 1),
        |nb AS (SELECT country || '|' ||
        |      CAST(CAST(floor(employees / 300) AS BIGINT) AS VARCHAR)
        |      AS block, CAST(count(*) AS BIGINT) AS nb
        |  FROM acc WHERE id % 2 = 1 GROUP BY 1)
        |SELECT na.block, na.na, nb.nb, na.na * nb.nb AS pairs
        |FROM na JOIN nb ON na.block = nb.block
        |ORDER BY pairs DESC, na.block ASC""".stripMargin,

    // Full resolve() parity including both Jaro-Winkler features via the
    // recursive-CTE JW kernel (class scaladoc). The two-phase prune on the
    // Spark side is semantics-preserving, so the oracle scores single-phase.
    "q32_er_resolve" ->
      s"""WITH RECURSIVE $accSql, $pairSql,
        |$resolveTailSql""".stripMargin,

    // the UNSALTED default-key replay over the skew-mutated frame: the
    // salted Spark plan must hash-match it row-for-row
    "q159_er_salted_skew" ->
      s"""WITH RECURSIVE $accSql159, $pairSql159,
        |$resolveTailSql""".stripMargin,

    "q33_pair_features" ->
      s"""WITH $accSql,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY region
        |    ORDER BY revenue DESC, id ASC) AS rn FROM acc),
        |top AS (SELECT * FROM ranked WHERE rn <= 50),
        |cp AS (SELECT a.id AS a_id, b.id AS b_id,
        |    a.industry AS ai, b.industry AS bi, a.country AS ac, b.country AS bc,
        |    a.employees AS ae, b.employees AS be,
        |    a.created AS acr, b.created AS bcr, a.last_act AS ala, b.last_act AS bla
        |  FROM top a JOIN top b ON a.region < b.region)
        |SELECT a_id, b_id,
        |  CASE WHEN ai = bi THEN 1.0 ELSE 0.0 END AS industry_match,
        |  round(CASE WHEN ae > 0 AND be > 0
        |    THEN 1.0 / (1.0 + abs(ln(ae / be))) ELSE 0.0 END, 6) AS size_compatibility,
        |  CASE WHEN ac = bc THEN 1.0 ELSE 0.3 END AS geo_proximity,
        |  0.5 AS product_complementarity,
        |  round(CAST(least(date_diff('day', acr, DATE '1998-12-01'),
        |                   date_diff('day', bcr, DATE '1998-12-01')) AS DOUBLE) /
        |        greatest(date_diff('day', acr, DATE '1998-12-01'),
        |                 date_diff('day', bcr, DATE '1998-12-01')), 6) AS maturity_alignment,
        |  round(2.0 / (1.0 +
        |    coalesce(date_diff('day', ala, DATE '1998-12-01'), 365) / 30.0 +
        |    coalesce(date_diff('day', bla, DATE '1998-12-01'), 365) / 30.0), 6)
        |    AS activity_alignment
        |FROM cp ORDER BY a_id, b_id""".stripMargin,

    "q34_account_features" ->
      s"""WITH $accSql
        |SELECT id, round(ln(1 + revenue), 6) AS revenue_log,
        |  round(revenue / (CASE WHEN employees = 0 THEN 1 ELSE employees END), 6)
        |    AS revenue_per_employee,
        |  round(ln(1 + employees), 6) AS employees_log,
        |  CAST(employees > 1000 AS INTEGER) AS is_enterprise,
        |  round(CAST(date_diff('day', created, DATE '1998-12-01') AS DOUBLE), 6)
        |    AS company_age_days,
        |  round(coalesce(CAST(date_diff('day', last_act, DATE '1998-12-01') AS DOUBLE),
        |    365.0), 6) AS days_since_last_activity,
        |  round(1.0 / (1.0 + coalesce(CAST(date_diff('day', last_act, DATE '1998-12-01')
        |    AS DOUBLE), 365.0) / 30.0), 6) AS activity_recency_score
        |FROM acc ORDER BY id""".stripMargin,

    "q35_recommendations" ->
      s"""WITH $accSql,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY region
        |    ORDER BY revenue DESC, id ASC) AS rn FROM acc),
        |top AS (SELECT * FROM ranked WHERE rn <= 50),
        |cp AS (SELECT a.id AS a_id, b.id AS b_id, a.revenue AS arv, b.revenue AS brv,
        |    CASE WHEN a.industry = b.industry THEN 1.0 ELSE 0.0 END AS im,
        |    CASE WHEN a.employees > 0 AND b.employees > 0
        |      THEN 1.0 / (1.0 + abs(ln(a.employees / b.employees))) ELSE 0.0 END AS sc,
        |    CASE WHEN a.country = b.country THEN 1.0 ELSE 0.3 END AS gp,
        |    CAST(least(date_diff('day', a.created, DATE '1998-12-01'),
        |               date_diff('day', b.created, DATE '1998-12-01')) AS DOUBLE) /
        |      greatest(date_diff('day', a.created, DATE '1998-12-01'),
        |               date_diff('day', b.created, DATE '1998-12-01')) AS ma
        |  FROM top a JOIN top b ON a.region < b.region),
        |scored AS (SELECT *, im*0.35 + sc*0.30 + gp*0.20 + ma*0.15 AS score FROM cp)
        |SELECT a_id, b_id, round(score, 6) AS score,
        |  CASE WHEN score > 0.8 THEN 'High' WHEN score > 0.6 THEN 'Medium'
        |    ELSE 'Low' END AS confidence,
        |  CASE WHEN im = 1.0 THEN 'Industry Expansion'
        |    ELSE 'Market Development' END AS recommendation_type,
        |  round((arv + brv) / 2 * 0.1, 2) AS estimated_value,
        |  CASE WHEN score > 0.8 THEN 'Schedule executive introduction call immediately'
        |    WHEN score > 0.7 THEN 'Prepare joint value proposition and reach out'
        |    WHEN score > 0.6 THEN 'Add to nurture campaign and monitor engagement'
        |    ELSE 'Review quarterly for status changes' END AS next_best_action
        |FROM scored WHERE score > 0.5 ORDER BY a_id, b_id""".stripMargin,

    "q120_notify_digest" ->
      s"""WITH $accSql,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY region
        |    ORDER BY revenue DESC, id ASC) AS rn FROM acc),
        |top AS (SELECT * FROM ranked WHERE rn <= 50),
        |cp AS (SELECT a.id AS a_id, b.id AS b_id, a.revenue AS arv, b.revenue AS brv,
        |    CASE WHEN a.industry = b.industry THEN 1.0 ELSE 0.0 END AS im,
        |    CASE WHEN a.employees > 0 AND b.employees > 0
        |      THEN 1.0 / (1.0 + abs(ln(a.employees / b.employees))) ELSE 0.0 END AS sc,
        |    CASE WHEN a.country = b.country THEN 1.0 ELSE 0.3 END AS gp,
        |    CAST(least(date_diff('day', a.created, DATE '1998-12-01'),
        |               date_diff('day', b.created, DATE '1998-12-01')) AS DOUBLE) /
        |      greatest(date_diff('day', a.created, DATE '1998-12-01'),
        |               date_diff('day', b.created, DATE '1998-12-01')) AS ma
        |  FROM top a JOIN top b ON a.region < b.region),
        |scored AS (SELECT *, im*0.35 + sc*0.30 + gp*0.20 + ma*0.15 AS score FROM cp),
        |recs AS (SELECT a_id, b_id, round(score, 6) AS score,
        |    round((arv + brv) / 2 * 0.1, 2) AS estimated_value,
        |    CASE WHEN score > 0.8 THEN 'Schedule executive introduction call immediately'
        |      WHEN score > 0.7 THEN 'Prepare joint value proposition and reach out'
        |      WHEN score > 0.6 THEN 'Add to nurture campaign and monitor engagement'
        |      ELSE 'Review quarterly for status changes' END AS next_best_action
        |  FROM scored WHERE score > 0.5),
        |stats AS (SELECT count(*) AS n_total,
        |    CAST(sum(CAST(estimated_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM recs),
        |top5 AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, a_id, b_id)
        |    AS INTEGER) AS rank
        |  FROM recs QUALIFY rank <= 5)
        |SELECT rank, a_id, b_id, round(score, 2) AS score, estimated_value,
        |  next_best_action, n_total, total_value
        |FROM top5, stats ORDER BY rank""".stripMargin,

    "q36_er_confusion" ->
      s"""WITH $accSql, $pairSql,
        |$ruleFeatSql,
        |lab AS (SELECT
        |  $ruleScoreSql >= 0.75 AS pred,
        |  $ruleLabelSql AS label FROM f),
        |m AS (SELECT
        |  sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS tp,
        |  sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS fp,
        |  sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS fn FROM lab)
        |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS precision,
        |  round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6) AS recall,
        |  round(CASE WHEN CAST(tp AS DOUBLE)/greatest(tp+fp,1) + CAST(tp AS DOUBLE)/greatest(tp+fn,1) > 0
        |    THEN 2 * (CAST(tp AS DOUBLE)/greatest(tp+fp,1)) * (CAST(tp AS DOUBLE)/greatest(tp+fn,1)) /
        |      (CAST(tp AS DOUBLE)/greatest(tp+fp,1) + CAST(tp AS DOUBLE)/greatest(tp+fn,1))
        |    ELSE 0.0 END, 6) AS f1
        |FROM m""".stripMargin,

    // the SHARED feature/score fragments (ruleFeatSql/ruleScoreSql —
    // one definition with q36), re-terminated as a 0.02-band
    // reliability rollup (the bucket floor sits on the same doubles
    // both sides)
    "q147_score_calibration" ->
      s"""WITH $accSql, $pairSql,
        |$ruleFeatSql,
        |sc AS (SELECT
        |  $ruleScoreSql AS score,
        |  CASE WHEN $ruleLabelSql THEN 1 ELSE 0 END AS label FROM f),
        |b AS (SELECT least(CAST(floor(score * 50) AS BIGINT), 49) AS bucket,
        |  label FROM sc)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
