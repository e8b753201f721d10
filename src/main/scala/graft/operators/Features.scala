package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Feature engineering (reference: src/ml/pipeline.py:57-157
 * FeatureEngineering — account features :65-106, cross-org pair
 * features :108-157).
 *
 * Time-dependent features take an explicit `asOf` timestamp instead of
 * `datetime.now()` (reference uses now(); SURVEY §7.4.3 — frozen asOf makes
 * runs replayable and results hash-stable). All features are pure Column
 * expressions — they fuse into whatever scan/join stage contains them
 * (whole-stage codegen), cost zero extra shuffles, and never leave
 * the executors.
 */
object Features {

  /** Categorical one-hot stages (reference: pipeline.py:92-103
    * `pd.get_dummies` on Industry / BillingCountry; SURVEY A15 — MLlib
    * inside the model pipeline, not an eager pivot). `handleInvalid=keep`
    * mirrors get_dummies' tolerance of unseen categories at transform
    * time (unseen → the extra "keep" bucket, not a crash — important when
    * the model scores fresher data than it trained on). */
  def oneHotStages(categoricalCols: Seq[String])
      : Array[org.apache.spark.ml.PipelineStage] = {
    val indexers = categoricalCols.map { c =>
      new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep").setStringOrderType("alphabetAsc")
    }
    val encoder = new org.apache.spark.ml.feature.OneHotEncoder()
      .setInputCols(categoricalCols.map(c => s"${c}_idx").toArray)
      .setOutputCols(categoricalCols.map(c => s"${c}_vec").toArray)
      .setHandleInvalid("keep")
    (indexers :+ encoder).toArray
  }

  /** Per-account features (reference: pipeline.py:65-106, F9-F13).
    * Null semantics match pandas fillna: revenue/employees null→0,
    * lastActivity null→365 days. One-hot encoding of categorical columns is
    * MLlib's job inside the model pipeline (StringIndexer+OneHotEncoder,
    * SURVEY A15) — not duplicated here. */
  def accountFeatures(revenue: Column, employees: Column,
                      created: Column, lastActivity: Column,
                      asOf: Column): Seq[(String, Column)] = {
    val rev = coalesce(revenue, lit(0.0))
    val emp = coalesce(employees, lit(0.0))
    val daysSinceActivity = coalesce(
      datediff(asOf.cast("date"), lastActivity.cast("date")).cast("double"), lit(365.0))
    Seq(
      "revenue_log" -> log1p(rev),
      "revenue_per_employee" -> rev / when(emp === 0, 1.0).otherwise(emp),
      "employees_log" -> log1p(emp),
      "is_enterprise" -> (emp > 1000).cast("int"),
      "company_age_days" ->
        datediff(asOf.cast("date"), created.cast("date")).cast("double"),
      "days_since_last_activity" -> daysSinceActivity,
      "activity_recency_score" -> lit(1.0) / (lit(1.0) + daysSinceActivity / 30.0))
  }

  /**
   * The 6 cross-org pair features (reference: pipeline.py:108-157, F14)
   * over a pair frame with `a_`/`b_` prefixed columns:
   *   industry_match, size_compat 1/(1+|ln(ratio)|), geo 1.0/0.3,
   *   product_complementarity unique/(overlap+unique+1) (0.5 when product
   *   arrays absent), maturity min(age)/max(age), activity 2/(1+d1/30+d2/30).
   */
  def pairFeatures(asOf: Column,
                   withProducts: Boolean = false): Seq[(String, Column)] = {
    def age(p: String): Column =
      datediff(asOf.cast("date"), col(s"${p}_created").cast("date")).cast("double")
    def actDays(p: String): Column = coalesce(
      datediff(asOf.cast("date"), col(s"${p}_last_activity").cast("date")).cast("double"),
      lit(365.0))
    // reference: get("NumberOfEmployees", 1)/... — missing→1; zero employees
    // make the ratio 0/∞ whose |ln| is +∞ → feature 0.0 in numpy; Spark's
    // log(≤0) is null, so the 0-employee limit is made explicit instead.
    val ea = coalesce(col("a_employees"), lit(1.0))
    val eb = coalesce(col("b_employees"), lit(1.0))
    val sizeCompat = when(ea > 0 && eb > 0,
      lit(1.0) / (lit(1.0) + abs(log(ea / eb)))).otherwise(0.0)
    val productCompat =
      if (!withProducts) lit(0.5)
      else {
        val overlap = size(array_intersect(col("a_products"), col("b_products")))
          .cast("double")
        val unique = (size(array_union(col("a_products"), col("b_products"))) -
          size(array_intersect(col("a_products"), col("b_products")))).cast("double")
        unique / (overlap + unique + 1.0)
      }
    Seq(
      "industry_match" ->
        when(col("a_industry") === col("b_industry"), 1.0).otherwise(0.0),
      "size_compatibility" -> sizeCompat,
      "geo_proximity" ->
        when(col("a_country") === col("b_country"), 1.0).otherwise(0.3),
      "product_complementarity" -> productCompat,
      "maturity_alignment" ->
        least(age("a"), age("b")) / greatest(age("a"), age("b")),
      "activity_alignment" ->
        lit(2.0) / (lit(1.0) + actDays("a") / 30.0 + actDays("b") / 30.0))
  }

  /** Apply a named feature set. */
  def withFeatures(df: DataFrame, features: Seq[(String, Column)]): DataFrame =
    features.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** Row-wise std-dev over k score columns (reference: pipeline.py:375-389
    * ensemble consensus spread, SURVEY A12) — population σ like np.std. */
  def rowStddev(cols: Seq[Column]): Column = {
    val n = cols.length
    val mean = cols.reduce(_ + _) / n
    sqrt(cols.map(c => pow(c - mean, 2)).reduce(_ + _) / n)
  }
}
