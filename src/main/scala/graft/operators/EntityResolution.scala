package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Cross-org entity resolution (reference: src/ml/entity_resolution.py
 * EntityResolver :255-485 — blocking :287-294, pair features :296-350,
 * rule score :352-396, exact shortcut + threshold :408-446).
 *
 * Spark-first shape: the reference's per-pair Python loop over blocked
 * groups IS a hash equi-join on the blocking key — we declare it as such and
 * Catalyst plans the join (broadcast if one side is small, SMJ otherwise,
 * AQE splits skewed blocks). All nine pair features and the rule score are
 * codegen'd Column expressions over the joined frame; nothing leaves the
 * executors until the final threshold filter.
 *
 * Scale notes (100 TB):
 *  - The blocking key (3-char name prefix + 3-char country) gives ~36k²
 *    theoretical buckets but real names skew heavily ("the"/"glo"/"acm").
 *    With AQE skew-join on (default in our sessions) hot blocks split
 *    automatically — but AQE splits BYTES; the pair work inside one hot
 *    block is still quadratic on one reducer. For known extreme skew pass
 *    `salt = S` to [[candidatePairs]]/[[resolve]]: the a-side is salted,
 *    the b-side exploded S× ([[SaltedJoin.joinOn]]), capping per-reducer
 *    pair work at 1/S of the hot block — row-identical output,
 *    spec-asserted (`SaltedBlockingSpec`).
 *  - `resolve` emits one row per candidate pair ≥ threshold — output is
 *    orders of magnitude smaller than the blocked pair space, and the
 *    filter sits directly on the join output (no materialization between).
 */
object EntityResolution {

  /** Column layout expected of an "accounts" frame (Salesforce-shaped,
    * reference: src/models/database.py:49-65). Remap via `as`/`select`. */
  case class AccountCols(
      id: String = "Id",
      name: String = "Name",
      website: String = "Website",
      country: String = "BillingCountry",
      industry: String = "Industry",
      employees: String = "NumberOfEmployees")

  case class Config(
      domainWeight: Double = 0.4,
      nameWeight: Double = 0.4,
      metadataWeight: Double = 0.2,
      matchThreshold: Double = 0.7,
      useBlocking: Boolean = true)

  /** Project an accounts frame to the prefixed canonical shape used in pair
    * joins, with normalized/derived columns computed ONCE before the join
    * (the reference recomputes normalize per pair — here each side is
    * normalized pre-shuffle, a strictly better plan). */
  def prepSide(df: DataFrame, cols: AccountCols, prefix: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val d = extractDomain(col(cols.website))
    // norm + tokens from ONE codegen kernel (NormalizedName scaladoc);
    // the two-level select keeps the struct evaluated once — Catalyst's
    // CollapseProject declines to merge because the struct is non-cheap
    // and referenced three times (norm, tokens, blocking key)
    val nn = GraftShim.column(graft.functions.NormalizedName(
      GraftShim.expr(col(cols.name))))
    df.select(
        col(cols.id).cast("string").as(s"${prefix}_id"),
        col(cols.name).as(s"${prefix}_name"),
        nn.as("_nn"),
        d.as(s"${prefix}_domain"),
        rootDomain(d).as(s"${prefix}_root"),
        col(cols.country).as(s"${prefix}_country"),
        col(cols.industry).as(s"${prefix}_industry"),
        col(cols.employees).cast("double").as(s"${prefix}_employees"))
      .select(
        col(s"${prefix}_id"), col(s"${prefix}_name"),
        coalesce(col("_nn.norm"), lit("")).as(s"${prefix}_norm"),
        col("_nn.tokens").as(s"${prefix}_tokens"),
        col(s"${prefix}_domain"), col(s"${prefix}_root"),
        col(s"${prefix}_country"), col(s"${prefix}_industry"),
        col(s"${prefix}_employees"),
        concat_ws("_",
          substring(coalesce(col("_nn.norm"), lit("")), 1, 3),
          substring(lower(coalesce(col(s"${prefix}_country"), lit(""))), 1, 3))
          .as(s"${prefix}_block"))
  }

  /** The 9 ER pair features (reference: entity_resolution.py:296-350) as
    * named Columns over a prepped a_/b_ pair frame. */
  def pairFeatures: Seq[(String, Column)] = {
    val bothDomains = col("a_domain").isNotNull && col("b_domain").isNotNull
    Seq(
      "domain_exact_match" -> when(bothDomains && col("a_root") === col("b_root"), 1.0)
        .otherwise(0.0),
      "domain_similarity" -> when(bothDomains,
        jaroWinkler(col("a_domain"), col("b_domain"))).otherwise(0.0),
      "name_exact_match" -> when(col("a_norm") === col("b_norm"), 1.0).otherwise(0.0),
      "name_jaro_winkler" -> jaroWinkler(col("a_norm"), col("b_norm")),
      "name_levenshtein" -> levenshteinSim(col("a_norm"), col("b_norm")),
      "name_jaccard" -> jaccardTokens(col("a_tokens"), col("b_tokens")),
      // non-null guarded equality (reference: `and account1.get(...)`)
      "same_country" -> when(col("a_country") === col("b_country") &&
        col("a_country").isNotNull && col("a_country") =!= "", 1.0).otherwise(0.0),
      "same_industry" -> when(col("a_industry") === col("b_industry") &&
        col("a_industry").isNotNull && col("a_industry") =!= "", 1.0).otherwise(0.0),
      "size_ratio" -> when(col("a_employees") > 0 && col("b_employees") > 0,
        least(col("a_employees"), col("b_employees")) /
          greatest(col("a_employees"), col("b_employees"))).otherwise(0.5))
  }

  // the component scores are SHARED by ruleScore and matchReasons — a
  // tweak to one greatest(...) must change the gating score and the
  // reported reason together, never one without the other
  private def domainComponent: Column =
    when(col("domain_exact_match") > 0, 1.0)
      .otherwise(col("domain_similarity"))
  private def nameComponent: Column =
    when(col("name_exact_match") > 0, 1.0)
      .otherwise(greatest(col("name_jaro_winkler"), col("name_jaccard"),
        col("name_levenshtein")))

  /** Rule-based score (reference: entity_resolution.py:352-396):
    * domain/name/metadata components weighted 0.4/0.4/0.2. */
  def ruleScore(cfg: Config = Config()): Column = {
    val metadataScore = col("same_country") * 0.4 +
      col("same_industry") * 0.3 + col("size_ratio") * 0.3
    domainComponent * cfg.domainWeight + nameComponent * cfg.nameWeight +
      metadataScore * cfg.metadataWeight
  }

  /** Human-readable match reasons (reference: entity_resolution.py:358-385)
    * as an array column, nulls filtered. */
  def matchReasons: Column = {
    val domainScore = domainComponent
    val nameScore = nameComponent
    filter(array(
      when(col("domain_exact_match") > 0, lit("Exact domain match"))
        .otherwise(when(domainScore > 0.8,
          concat(lit("Similar domain ("), format_number(domainScore, 2), lit(")")))),
      when(col("name_exact_match") > 0, lit("Exact name match"))
        .otherwise(when(col("name_exact_match") === 0.0 && nameScore > 0.8,
          concat(lit("Similar name ("), format_number(nameScore, 2), lit(")")))),
      when(col("same_country") > 0, lit("Same country")),
      when(col("same_industry") > 0, lit("Same industry"))),
      r => r.isNotNull)
  }

  /** Candidate pair space: blocked equi-join (reference :459-478) or full
    * cross join fallback (reference :480-485, flag-gated). `blockOn`
    * overrides the join condition — blocking is a pluggable query shape, and
    * when the default 3+3-prefix key degenerates (uninformative names → one
    * hot block = accidental cross join) callers swap in a finer key.
    * `salt > 1` salts the default-key join S ways ([[SaltedJoin.joinOn]]:
    * a-side salted, b-side exploded) for known hot blocks — output is
    * row-identical, only reducer load changes. Salting composes with the
    * DEFAULT key only; a custom `blockOn` condition can embed its own salt
    * directly. The salted path additionally requires the `a_id` column
    * ([[prepSide]] always emits it) — it is the deterministic salt key
    * that spreads a hot block uniformly even when its rows are
    * near-duplicates. */
  def candidatePairs(a: DataFrame, b: DataFrame, cfg: Config = Config(),
                     blockOn: Option[Column] = None, salt: Int = 1): DataFrame =
    if (!cfg.useBlocking) a.crossJoin(b)
    else if (salt > 1) {
      require(blockOn.isEmpty,
        "salt applies to the default blocking key; embed the salt in a custom blockOn")
      // saltOn = the prepped side's row id: unique, so the hot block
      // spreads uniformly even when its rows are near-duplicates
      SaltedJoin.joinOn(a, b, col("a_block"), col("b_block"), salt,
        saltOn = Some(col("a_id")))
    } else a.join(b, blockOn.getOrElse(col("a_block") === col("b_block")))

  /**
   * Full resolve: pair space → 9 features → exact-shortcut OR rule score ≥
   * threshold (reference match_pair :403-446). Returns
   * (account1_id, account2_id, match_score, match_type, confidence,
   *  match_reasons) — the MatchResult shape (reference :29-38).
   */
  def resolve(accounts1: DataFrame, accounts2: DataFrame,
              cols: AccountCols = AccountCols(),
              cfg: Config = Config(),
              blockOn: Option[Column] = None,
              salt: Int = 1): DataFrame = {
    val a = prepSide(accounts1, cols, "a")
    val b = prepSide(accounts2, cols, "b")
    // Two-phase scoring (the reference's exact-shortcut generalized into a
    // sound upper-bound prune, SURVEY §4 "exact-match short-circuit"):
    // phase 1 computes only the CHEAP features (domain JW over ~12-char
    // hosts, equality checks) and drops every pair whose best possible
    // score — domainScore·wd + 1·wn + 1·wm — can't reach the threshold.
    // Name JW + Levenshtein + token Jaccard (the O(len²) work over long
    // normalized names) run only on survivors: Catalyst pushes the
    // phase-1 predicate below the collapsed projection, so pruned pairs
    // never evaluate a name feature. Output is provably identical to
    // single-phase scoring; the prune rate is data-dependent (real-world
    // corpora with diverse domains prune hard, the synthetic testdata's
    // near-uniform domains less so).
    val featMap = pairFeatures.toMap
    val cheapNames = Seq("domain_exact_match", "domain_similarity",
      "name_exact_match", "same_country", "same_industry", "size_ratio")
    val cheap = cheapNames.foldLeft(candidatePairs(a, b, cfg, blockOn, salt)) {
      case (df, name) => df.withColumn(name, featMap(name))
    }
    val domainScoreUb = when(col("domain_exact_match") > 0, 1.0)
      .otherwise(col("domain_similarity")) * cfg.domainWeight +
      lit(cfg.nameWeight + cfg.metadataWeight)
    val exactCheap = col("domain_exact_match") > 0 && col("name_exact_match") > 0
    val pruned = cheap.filter(exactCheap || domainScoreUb >= cfg.matchThreshold)
    val feats = pairFeatures.foldLeft(pruned) {
      case (df, (name, c)) =>
        if (cheapNames.contains(name)) df else df.withColumn(name, c)
    }
    val exact = col("domain_exact_match") > 0 && col("name_exact_match") > 0
    val score = ruleScore(cfg)
    feats.select(
        col("a_id").as("account1_id"), col("b_id").as("account2_id"),
        when(exact, 1.0).otherwise(score).as("match_score"),
        when(exact, "exact").otherwise("fuzzy").as("match_type"),
        when(exact, "high").otherwise(
          when(score > 0.9, "high").when(score > 0.8, "medium").otherwise("low"))
          .as("confidence"),
        when(exact, array(lit("Exact domain and name match")))
          .otherwise(matchReasons).as("match_reasons"))
      .filter(col("match_type") === "exact" || col("match_score") >= cfg.matchThreshold)
  }

  /**
   * Pre-flight block-budget instrument (SCALING.md §q32): per blocking
   * key, both sides' row counts and the pair space the blocked join
   * will generate — two aggregations + one equi-join on the key, NEVER
   * the pair space itself, so it costs O(n) where the join it predicts
   * costs O(Σ na·nb). A blocked-ER pair space is QUADRATIC in block
   * size at fixed key cardinality (measured on the gate fixture:
   * 61 → 6,010 → 596,153 pairs across the three SF decades once the
   * country×size-band key saturates its 100 blocks), so a 100 TB
   * deployment MUST measure this before committing to a key — hot rows
   * here mean: refine the key (`blockOn`), or salt (`salt = S`) when
   * the heat is balance rather than volume. Ordered hottest-first.
   */
  def blockPairStats(a: DataFrame, b: DataFrame,
                     aKey: Column = col("a_block"),
                     bKey: Column = col("b_block")): DataFrame = {
    val na = a.groupBy(aKey.as("block")).agg(count(lit(1)).as("na"))
    val nb = b.groupBy(bKey.as("block")).agg(count(lit(1)).as("nb"))
    na.join(nb, "block")
      .select(col("block"), col("na"), col("nb"),
        (col("na") * col("nb")).as("pairs"))
      .orderBy(col("pairs").desc, col("block").asc)
  }

  /** ER confusion metrics at a threshold (reference:
    * entity_resolution.py:554-613, SURVEY A14): one agg pass over a frame
    * with boolean `pred` and `label` columns. */
  def confusionMetrics(df: DataFrame, pred: Column, label: Column): DataFrame = {
    val agged = df.agg(
      sum(when(pred && label, 1L).otherwise(0L)).as("tp"),
      sum(when(pred && !label, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && label, 1L).otherwise(0L)).as("fn"))
    agged.select(col("tp"), col("fp"), col("fn"),
      (col("tp") / greatest(col("tp") + col("fp"), lit(1L))).as("precision"),
      (col("tp") / greatest(col("tp") + col("fn"), lit(1L))).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0))
  }
}
