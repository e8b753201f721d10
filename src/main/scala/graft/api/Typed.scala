package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EntityResolution
import graft.operators.EntityResolution.{AccountCols, Config}

/**
 * Typed façade over the engine's core domain (reference:
 * src/models/database.py:49-65 Account, src/ml/entity_resolution.py:29-38
 * MatchResult): `Dataset[Account]` in, `Dataset[MatchResult]` out, with
 * case-class Encoders carrying the schema. The untyped DataFrame
 * operators stay the implementation — a typed wrapper adds compile-time
 * column safety at the API boundary without forcing row-object
 * serialization into the hot path (the plan below the façade is the same
 * Catalyst plan; Encoders only materialize objects at the user-facing
 * edges).
 */
object Typed {

  /** Salesforce-shaped account row (nullable fields as Options). */
  case class Account(
      Id: String,
      Name: String,
      Website: Option[String],
      BillingCountry: Option[String],
      Industry: Option[String],
      NumberOfEmployees: Option[Double])

  /** ER match result (reference MatchResult shape). */
  case class MatchResult(
      account1_id: String,
      account2_id: String,
      match_score: Double,
      match_type: String,
      confidence: String,
      match_reasons: Seq[String])

  def accounts(spark: SparkSession, df: DataFrame): Dataset[Account] = {
    import spark.implicits._
    df.select(
      col("Id").cast("string").as("Id"),
      col("Name").cast("string").as("Name"),
      col("Website").cast("string").as("Website"),
      col("BillingCountry").cast("string").as("BillingCountry"),
      col("Industry").cast("string").as("Industry"),
      col("NumberOfEmployees").cast("double").as("NumberOfEmployees"))
      .as[Account]
  }

  /** Typed resolve: same plan as [[EntityResolution.resolve]]. */
  def resolve(a: Dataset[Account], b: Dataset[Account],
              cfg: Config = Config()): Dataset[MatchResult] = {
    import a.sparkSession.implicits._
    EntityResolution.resolve(a.toDF(), b.toDF(), AccountCols(), cfg)
      .as[MatchResult]
  }
}
