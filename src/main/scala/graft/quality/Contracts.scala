package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data contracts + one-pass validation (reference:
 * src/utils/data_contracts.py — ColumnContract/DataContract :18-38,
 * validate_dataframe :103-192, quality monitor :216-231).
 *
 * Severity semantics match the reference exactly: nullability, uniqueness
 * and numeric-range violations are ERRORS; missing optional columns,
 * row-count overflow and allowed-set violations are WARNINGS; `is_valid`
 * = no errors.
 *
 * Spark-first shape: the reference walks the frame once per rule
 * (pandas column scans); here every rule for every column compiles into
 * ONE `agg(...)` pass — a single scan + partial aggregation regardless of
 * contract size. At 100 TB this is the difference between k full scans
 * and one; `count_distinct` for uniqueness is the only expression that
 * needs a shuffle, and it shares the same aggregate stage.
 */
object Contracts {

  final case class ColumnContract(
      name: String,
      dtype: String, // "string" | "numeric" | "datetime" | "boolean"
      nullable: Boolean = true,
      unique: Boolean = false,
      minValue: Option[Double] = None,
      maxValue: Option[Double] = None,
      allowedValues: Option[Set[String]] = None)

  final case class DataContract(
      name: String,
      columns: Seq[ColumnContract],
      requiredColumns: Seq[String],
      minRows: Long = 0L,
      maxRows: Option[Long] = None)

  final case class ValidationResult(
      isValid: Boolean,
      errors: Seq[String],
      warnings: Seq[String],
      rowCount: Long,
      nullCounts: Map[String, Long])

  /** The reference's three entity contracts (data_contracts.py:52-100). */
  val accountContract: DataContract = DataContract(
    name = "accounts",
    requiredColumns = Seq("Id", "Name"),
    columns = Seq(
      ColumnContract("Id", "string", nullable = false, unique = true),
      ColumnContract("Name", "string", nullable = false),
      ColumnContract("Industry", "string"),
      ColumnContract("AnnualRevenue", "numeric", minValue = Some(0)),
      ColumnContract("NumberOfEmployees", "numeric", minValue = Some(0)),
      ColumnContract("BillingCountry", "string"),
      ColumnContract("Type", "string",
        allowedValues = Some(Set("Customer", "Prospect", "Partner", "Other"))),
      ColumnContract("Rating", "string",
        allowedValues = Some(Set("Hot", "Warm", "Cold"))),
      ColumnContract("CreatedDate", "datetime"),
      ColumnContract("LastActivityDate", "datetime")),
    minRows = 1)

  val opportunityContract: DataContract = DataContract(
    name = "opportunities",
    requiredColumns = Seq("Id", "AccountId", "Name"),
    columns = Seq(
      ColumnContract("Id", "string", nullable = false, unique = true),
      ColumnContract("AccountId", "string", nullable = false),
      ColumnContract("Name", "string", nullable = false),
      ColumnContract("Amount", "numeric", minValue = Some(0)),
      ColumnContract("StageName", "string"),
      ColumnContract("CloseDate", "datetime"),
      ColumnContract("Probability", "numeric",
        minValue = Some(0), maxValue = Some(100)),
      ColumnContract("IsClosed", "boolean"),
      ColumnContract("IsWon", "boolean")))

  val recommendationContract: DataContract = DataContract(
    name = "recommendations",
    requiredColumns = Seq("account1_id", "account2_id", "score"),
    columns = Seq(
      ColumnContract("account1_id", "string", nullable = false),
      ColumnContract("account2_id", "string", nullable = false),
      ColumnContract("score", "numeric", nullable = false,
        minValue = Some(0), maxValue = Some(1)),
      ColumnContract("confidence_level", "string",
        allowedValues = Some(Set("Very High", "High", "Medium", "Low"))),
      ColumnContract("estimated_value", "numeric", minValue = Some(0))))

  /** All violation counters for one column, as named agg expressions.
    * Missing columns contribute no expressions (handled separately). */
  private def columnAggs(c: ColumnContract): Seq[Column] = {
    val v = col(c.name)
    val nonNull = v.isNotNull
    // dups ONLY for unique-contracted columns (the streaming twin's
    // rule, Streams.contractWindows): an unconditional count_distinct
    // per column makes Spark plan a multi-distinct Expand — one
    // replicated projection of the whole scan PER COLUMN — for counters
    // validate() never reads on non-unique columns
    val base = Seq(
      sum(v.isNull.cast("long")).as(s"${c.name}__nulls")) ++
      (if (c.unique)
        Seq((count(when(nonNull, 1)) - count_distinct(v))
          .as(s"${c.name}__dups"))
      else Nil)
    val range =
      c.minValue.toSeq.map(lo =>
        sum((nonNull && v < lo).cast("long")).as(s"${c.name}__below")) ++
      c.maxValue.toSeq.map(hi =>
        sum((nonNull && v > hi).cast("long")).as(s"${c.name}__above"))
    val allowed = c.allowedValues.toSeq.map { set =>
      sum((nonNull && !v.isin(set.toSeq: _*)).cast("long"))
        .as(s"${c.name}__invalid")
    }
    base ++ range ++ allowed
  }

  /** Validate `df` against `contract` in one aggregation pass. */
  def validate(df: DataFrame, contract: DataContract): ValidationResult = {
    val present = df.columns.toSet
    val errors = scala.collection.mutable.ListBuffer[String]()
    val warnings = scala.collection.mutable.ListBuffer[String]()

    contract.requiredColumns.filterNot(present).foreach { c =>
      errors += s"Required column '$c' missing"
    }
    val (checked, missing) = contract.columns.partition(c => present(c.name))
    missing.filterNot(c => contract.requiredColumns.contains(c.name))
      .foreach(c => warnings += s"Expected column '${c.name}' not found")

    // dtype is a CHECKED claim, not documentation: a numeric column
    // silently re-typed to string upstream would otherwise pass (the
    // comparison casts null out non-numeric strings), reporting
    // is_valid on a frame the contract no longer describes
    val schemaTypes = df.schema.map(f => f.name -> f.dataType).toMap
    checked.foreach { c =>
      val ok = (c.dtype, schemaTypes(c.name)) match {
        case ("numeric", t) => t.isInstanceOf[org.apache.spark.sql.types.NumericType]
        case ("string", t) => t == org.apache.spark.sql.types.StringType
        case ("datetime", t) =>
          t == org.apache.spark.sql.types.TimestampType ||
            t == org.apache.spark.sql.types.DateType
        case ("boolean", t) => t == org.apache.spark.sql.types.BooleanType
        case _ => true // unknown vocab entries stay unchecked
      }
      if (!ok) errors += s"Column '${c.name}' has type " +
        s"${schemaTypes(c.name).catalogString} but contract declares '${c.dtype}'"
    }

    val aggCols = count(lit(1)).as("__rows") +: checked.flatMap(columnAggs)
    val row = df.agg(aggCols.head, aggCols.tail: _*).head
    def n(field: String): Long =
      if (row.isNullAt(row.fieldIndex(field))) 0L
      else row.getAs[Any](field).toString.toLong
    val rows = n("__rows")

    if (rows < contract.minRows)
      errors += s"Row count $rows below minimum ${contract.minRows}"
    contract.maxRows.filter(rows > _).foreach { m =>
      warnings += s"Row count $rows exceeds maximum $m"
    }

    val nullCounts = checked.map(c => c.name -> n(s"${c.name}__nulls")).toMap
    checked.foreach { c =>
      val nulls = nullCounts(c.name)
      if (!c.nullable && nulls > 0)
        errors += s"Column '${c.name}' has $nulls null values but is not nullable"
      if (c.unique) {
        val dups = n(s"${c.name}__dups")
        if (dups > 0)
          errors += s"Column '${c.name}' has $dups duplicate values but should be unique"
      }
      c.minValue.foreach { lo =>
        val below = n(s"${c.name}__below")
        if (below > 0) errors +=
          s"Column '${c.name}' has $below values below minimum $lo"
      }
      c.maxValue.foreach { hi =>
        val above = n(s"${c.name}__above")
        if (above > 0) errors +=
          s"Column '${c.name}' has $above values above maximum $hi"
      }
      if (c.allowedValues.isDefined) {
        val invalid = n(s"${c.name}__invalid")
        if (invalid > 0) warnings +=
          s"Column '${c.name}' has $invalid values outside allowed set"
      }
    }
    ValidationResult(errors.isEmpty, errors.toList, warnings.toList,
      rows, nullCounts)
  }

  /** Violation profile as a DataFrame (the oracle-checkable face of
    * validate(): same counters, kept relational). One row per
    * (column, check) with a nonzero-or-not count. */
  def violationProfile(df: DataFrame, contract: DataContract): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val checked = contract.columns.filter(c => df.columns.contains(c.name))
    // the __rows sentinel keeps the agg non-empty when NO contract
    // column is present (validate() has the same guard) — an empty
    // profile, not empty.head
    val aggCols = count(lit(1)).as("__rows") +: checked.flatMap(columnAggs)
    val row = df.agg(aggCols.head, aggCols.tail: _*).head
    row.schema.fieldNames.filter(_ != "__rows").map { f =>
      // split at the LAST separator: contract columns may themselves
      // contain "__" (snake-cased warehouse feeds), the check suffix
      // never does
      val cut = f.lastIndexOf("__")
      val (colName, check) = (f.substring(0, cut), f.substring(cut + 2))
      val cnt = if (row.isNullAt(row.fieldIndex(f))) 0L
        else row.getAs[Any](f).toString.toLong
      (colName, check, cnt)
    }.toSeq.toDF("column", "check", "violations")
  }

  /** Schema drift between an expected and an observed frame: one row per
    * added / removed / type-changed column. The upstream-broke-the-feed
    * check a multi-org ingest runs BEFORE row-level validation (a type
    * change fails fast here instead of as a thousand row violations).
    * Pure schema comparison — no jobs, no scan. */
  def schemaDrift(expected: DataFrame,
                  observed: DataFrame): Seq[SchemaDriftRow] = {
    val e = expected.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val o = observed.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val removed = (e.keySet -- o.keySet).toSeq.sorted
      .map(c => SchemaDriftRow(c, "removed", e(c), null))
    val added = (o.keySet -- e.keySet).toSeq.sorted
      .map(c => SchemaDriftRow(c, "added", null, o(c)))
    val changed = (e.keySet & o.keySet).toSeq.sorted
      .filter(c => e(c) != o(c))
      .map(c => SchemaDriftRow(c, "type_changed", e(c), o(c)))
    removed ++ added ++ changed
  }

  // named to NOT shadow graft.quality.Drift (the PSI monitor object) —
  // inside this package `Drift(...)` and `Drift.psiBins` previously
  // resolved to unrelated things depending on scope
  final case class SchemaDriftRow(column: String, change: String,
                                  expected_type: String, observed_type: String)

  /** Quality-monitor rollup over a validation-history frame
    * (reference: data_contracts.py:216-231 A10): success rate, avg rows,
    * total errors. */
  def qualitySummary(history: DataFrame): DataFrame =
    history.agg(
      avg(col("is_valid").cast("double")).as("success_rate"),
      avg(col("row_count")).as("avg_rows"),
      sum(col("error_count")).as("total_errors"))
}
