package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Seeded synthetic data generators (reference: S15 —
 * scripts/evaluate.py:101-196 `generate_synthetic_evaluation_data`,
 * scripts/generate_sample_data.py:21-107, ER variants
 * src/ml/entity_resolution.py:616-708).
 *
 * Pseudo-randomness is hash-derived, NOT `rand(seed)`: Spark's rand/randn
 * are deterministic only for a fixed partitioning — a repartition changes
 * every value — while an md5-derived uniform is a pure function of the row
 * (SURVEY §7.4.3 replayability) AND engine-portable: DuckDB replays the
 * identical draws, so the discrete generated columns are oracle-checked
 * exactly (q112). Distribution shapes match the reference (lognormal via
 * Box-Muller over two hash-uniforms, categorical via threshold buckets);
 * exact draws differ from numpy's Mersenne stream, so quality gates
 * compare metric ORDERINGS (ensemble > baselines), not digit-identical
 * metrics — same protocol, documented substitution.
 *
 * Scale: generation is a `spark.range(n)` projection — embarrassingly
 * parallel, no shuffle; the pair space generator emits the i<j upper
 * triangle via a range self-join on block-partitioned ids.
 */
object Synthetic {

  /** Uniform in [0,1) as a pure function of (id, salt, seed) — the
    * portable md5 uniform (Sampling.hashUniform), so DuckDB replays it:
    * CAST(('0x'||substring(md5('syn<seed>:<salt>:'||id),1,8)) AS UBIGINT)
    *   % 1000000 / 1000000.0 */
  def u(id: Column, salt: Int, seed: Int = 42): Column =
    graft.operators.Sampling.hashUniform(id, s"syn$seed:$salt")

  /** Standard normal via Box-Muller over two hash-uniforms; the 1e-9
    * floor keeps log() finite. */
  def gaussian(id: Column, salt: Int, seed: Int = 42): Column =
    sqrt(lit(-2.0) * log(greatest(u(id, salt, seed), lit(1e-9)))) *
      cos(lit(2.0 * math.Pi) * u(id, salt + 1, seed))

  /** Categorical pick: equal-weight over `values`. */
  def pick(id: Column, salt: Int, values: Seq[String], seed: Int = 42): Column =
    element_at(array(values.map(lit): _*),
      (u(id, salt, seed) * values.size).cast("int") + 1)

  /** Weighted categorical pick (reference Type p=[0.5,0.3,0.2]). */
  def pickWeighted(id: Column, salt: Int, weighted: Seq[(String, Double)],
                   seed: Int = 42): Column = {
    val cums = weighted.scanLeft(0.0)(_ + _._2).tail
    val uu = u(id, salt, seed)
    weighted.zip(cums).foldRight(lit(weighted.last._1): Column) {
      case (((v, _), cum), fb) => when(uu < cum, v).otherwise(fb)
    }
  }

  val industries = Seq("Technology", "Finance", "Healthcare", "Retail", "Manufacturing")
  val countries = Seq("USA", "UK", "Germany", "France", "Canada")

  /** Salesforce-shaped accounts (reference: evaluate.py:119-132). */
  def accounts(spark: SparkSession, n: Int, seed: Int = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      format_string("ACC_%04d", id).as("Id"),
      concat(lit("Company_"), id.cast("string")).as("Name"),
      pick(id, 1, industries, seed).as("Industry"),
      exp(lit(15.0) + lit(1.5) * gaussian(id, 3, seed)).as("AnnualRevenue"),
      floor(exp(lit(5.0) + lit(1.5) * gaussian(id, 5, seed)) + 1)
        .cast("double").as("NumberOfEmployees"),
      pick(id, 7, countries, seed).as("BillingCountry"),
      date_add(lit("2020-01-01").cast("date"),
        (u(id, 8, seed) * 1000).cast("int")).as("CreatedDate"),
      date_sub(lit("2024-01-01").cast("date"),
        (u(id, 9, seed) * 365).cast("int")).as("LastActivityDate"),
      pickWeighted(id, 10,
        Seq("Customer" -> 0.5, "Prospect" -> 0.3, "Partner" -> 0.2), seed)
        .as("Type"),
      id.as("_idx"))
  }

  /** Conversion probability of a candidate pair (reference:
    * evaluate.py:141-161 — industry/size/geo/type bonuses on a 2% base). */
  def conversionProb(a1Industry: Column, a2Industry: Column,
                     a1Emp: Column, a2Emp: Column,
                     a1Country: Column, a2Country: Column,
                     a1Type: Column, a2Type: Column): Column =
    lit(0.02) +
      when(a1Industry === a2Industry, 0.05).otherwise(0.0) +
      lit(0.03) * (least(a1Emp, a2Emp) / greatest(a1Emp, a2Emp)) +
      when(a1Country === a2Country, 0.02).otherwise(0.0) +
      when(a1Type === "Customer" && a2Type === "Customer", 0.03).otherwise(0.0)

  /** Labeled candidate pairs: the reference's sliding i<j<i+50 window
    * (evaluate.py:175-189), label drawn as u(pair) < conversionProb —
    * the same draw that defines interactions, so candidate labels and
    * the interactions set agree by construction. `probScale` scales the
    * conversion probability (1.0 = reference constants; tests raise it so
    * fixed-K ranking gates are stable at small n — the protocol, not the
    * base rate, is what's under test). */
  def labeledCandidates(accts: DataFrame, window: Int = 50,
                        seed: Int = 42, probScale: Double = 1.0): DataFrame = {
    val a = accts.select(col("_idx").as("i1"), col("Id").as("account1_id"),
      col("Industry").as("a1_industry"), col("NumberOfEmployees").as("a1_emp"),
      col("BillingCountry").as("a1_country"), col("Type").as("a1_type"),
      col("AnnualRevenue").as("a1_revenue"))
    val b = accts.select(col("_idx").as("i2"), col("Id").as("account2_id"),
      col("Industry").as("a2_industry"), col("NumberOfEmployees").as("a2_emp"),
      col("BillingCountry").as("a2_country"), col("Type").as("a2_type"),
      col("AnnualRevenue").as("a2_revenue"))
    val pairs = a.join(b, col("i2") > col("i1") && col("i2") < col("i1") + window)
    val p = conversionProb(
      col("a1_industry"), col("a2_industry"), col("a1_emp"), col("a2_emp"),
      col("a1_country"), col("a2_country"), col("a1_type"), col("a2_type"))
    val pairU = u(concat_ws("|", col("account1_id"), col("account2_id")), 20, seed)
    pairs.withColumn("label", (pairU < p * probScale).cast("int"))
  }

  /** ER test corpus (reference: entity_resolution.py:616-708
    * `generate_synthetic_test_data`): org1 accounts from 5 base
    * companies; org2 holds either a name/domain VARIANT of the org1
    * account (match, rate `matchRate`) or a shifted non-match. Returns
    * (accounts1, accounts2, labeledPairs). Variant selection and
    * numerics are hash-derived (replayable; see object scaladoc). */
  def erTestData(spark: SparkSession, n: Int, matchRate: Double = 0.15,
                 seed: Int = 42): (DataFrame, DataFrame, DataFrame) = {
    val bases = Seq(
      ("Acme Corporation", "acme.com", "Technology", "USA"),
      ("Global Finance Inc", "globalfinance.com", "Finance", "UK"),
      ("HealthCare Plus", "healthcareplus.org", "Healthcare", "USA"),
      ("TechStart Systems", "techstart.io", "Technology", "Germany"),
      ("Retail Giants Ltd", "retailgiants.co.uk", "Retail", "UK"))
    val id = col("id")
    def base(f: ((String, String, String, String)) => String): Column =
      element_at(array(bases.map(b => lit(f(b))): _*), (id % bases.size).cast("int") + 1)
    def tld(domain: String): String = domain.split("\\.").last

    val rows = spark.range(n)
      .withColumn("is_match", u(id, 30, seed) < matchRate)
    val name1 = concat(base(_._1), lit(" #"), id.cast("string"))
    val a1 = rows.select(
      format_string("ORG1_ACC_%04d", id).as("Id"),
      name1.as("Name"),
      concat(lit("company"), id.cast("string"), lit("."),
        base(b => tld(b._2))).as("Website"),
      base(_._3).as("Industry"),
      base(_._4).as("BillingCountry"),
      (u(id, 31, seed) * 4990 + 10).cast("int").cast("double")
        .as("NumberOfEmployees"),
      id.as("_idx"))

    // variant pick 0..5 (reference create_variant): exact, " Inc" suffix,
    // Corporation→Corp, www. prefix, UPPER, hyphenated
    val v = (u(id, 32, seed) * 6).cast("int")
    val dom1 = concat(lit("company"), id.cast("string"), lit("."), base(b => tld(b._2)))
    val varName = when(v === 1, concat(name1, lit(" Inc")))
      .when(v === 2, regexp_replace(name1, "Corporation", "Corp"))
      .when(v === 4, upper(name1))
      .when(v === 5, regexp_replace(name1, " ", "-"))
      .otherwise(name1)
    val varDomain = when(v === 3, concat(lit("www."), dom1)).otherwise(dom1)
    val otherBaseIdx = (id + 1) % bases.size
    def otherBase(f: ((String, String, String, String)) => String): Column =
      element_at(array(bases.map(b => lit(f(b))): _*), otherBaseIdx.cast("int") + 1)
    val a2 = rows.select(
      format_string("ORG2_ACC_%04d", id).as("Id"),
      when(col("is_match"), varName)
        .otherwise(concat(otherBase(_._1), lit(" #"), (id + 100).cast("string")))
        .as("Name"),
      when(col("is_match"), varDomain)
        .otherwise(concat(lit("other"), id.cast("string"), lit("."),
          otherBase(b => tld(b._2)))).as("Website"),
      when(col("is_match"), base(_._3)).otherwise(otherBase(_._3)).as("Industry"),
      when(col("is_match"), base(_._4)).otherwise(otherBase(_._4))
        .as("BillingCountry"),
      when(col("is_match"),
          (u(id, 31, seed) * 4990 + 10).cast("int") + (u(id, 33, seed) * 199).cast("int") - 99)
        .otherwise((u(id, 34, seed) * 4990 + 10).cast("int"))
        .cast("double").as("NumberOfEmployees"),
      id.as("_idx"))
    val pairs = rows.select(
      format_string("ORG1_ACC_%04d", id).as("account1_id"),
      format_string("ORG2_ACC_%04d", id).as("account2_id"),
      col("is_match").cast("int").as("is_match"),
      id.as("_idx"))
    (a1, a2, pairs)
  }
}
