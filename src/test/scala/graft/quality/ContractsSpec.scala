package graft.quality

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.quality.Contracts._

/** Severity + counter semantics vs the reference validator
  * (data_contracts.py:103-192): errors for null/unique/range, warnings
  * for allowed-set and missing optional columns. */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  private val contract = DataContract(
    name = "t",
    requiredColumns = Seq("id", "name"),
    columns = Seq(
      ColumnContract("id", "string", nullable = false, unique = true),
      ColumnContract("name", "string", nullable = false),
      ColumnContract("rev", "numeric", minValue = Some(0), maxValue = Some(100)),
      ColumnContract("rating", "string",
        allowedValues = Some(Set("Hot", "Cold"))),
      ColumnContract("extra", "string")),
    minRows = 1)

  test("clean frame validates with per-column null counts") {
    val df = Seq(("a", "x", 5.0, "Hot"), ("b", "y", 10.0, "Cold"))
      .toDF("id", "name", "rev", "rating")
    val r = validate(df, contract)
    assert(r.isValid)
    assert(r.warnings.exists(_.contains("'extra' not found")))
    assert(r.rowCount == 2 && r.nullCounts("rev") == 0)
  }

  test("null, duplicate, range and allowed-set violations classified") {
    val df = Seq(
      ("a", "x", -5.0, "Hot"),       // rev below min
      ("a", "y", 150.0, "Tepid"),    // dup id, rev above max, bad rating
      (null.asInstanceOf[String], "z", 50.0, "Cold")) // null id
      .toDF("id", "name", "rev", "rating")
    val r = validate(df, contract)
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("'id' has 1 null")))
    assert(r.errors.exists(_.contains("'id' has 1 duplicate")))
    assert(r.errors.exists(_.contains("1 values below minimum 0.0")))
    assert(r.errors.exists(_.contains("1 values above maximum 100.0")))
    assert(r.warnings.exists(_.contains("'rating' has 1 values outside")))
  }

  test("row-count bounds: min is an error, max a warning") {
    val empty = Seq.empty[(String, String)].toDF("id", "name")
    val r = validate(empty, contract)
    assert(r.errors.exists(_.contains("below minimum 1")))
    val wide = validate(
      Seq(("a", "x"), ("b", "y")).toDF("id", "name"),
      contract.copy(maxRows = Some(1)))
    assert(wide.warnings.exists(_.contains("exceeds maximum 1")))
  }

  test("missing required column is an error") {
    val df = Seq(("a")).toDF("id")
    val r = validate(df, contract)
    assert(r.errors.exists(_.contains("Required column 'name' missing")))
  }

  test("schemaDrift reports added/removed/type-changed columns") {
    import spark.implicits._
    val expected = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val observed = Seq((1L, 2, "x")).toDF("id", "score", "extra")
    val drift = Contracts.schemaDrift(expected, observed)
      .map(d => (d.column, d.change, d.expected_type, d.observed_type))
    assert(drift === Seq(
      ("name", "removed", "string", null),
      ("extra", "added", null, "string"),
      ("score", "type_changed", "double", "int")))
  }

  test("schema evolution: rename + default-fill + cast merges two " +
      "generations into the current schema (the alembic analog)") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("total_price", DoubleType),
      StructField("priority", StringType)))
    // v1: pre-migration names (price), int ids, no priority column
    val v1 = Seq((1, 10.5), (2, 20.0)).toDF("id", "price")
    // v2: current names, priority present
    val v2 = Seq((3L, 30.0, "HIGH")).toDF("id", "total_price", "priority")
    val merged = graft.sources.SchemaEvolution.alignGenerations(
      Seq(v1 -> Map("price" -> "total_price"), v2 -> Map.empty),
      target, defaults = Map("priority" -> lit("PRE_MIGRATION")))
    // names + types must match the target exactly; nullability may be
    // STRICTER (a generation whose source column is provably non-null
    // keeps that fact through the cast)
    assert(merged.schema.map(f => (f.name, f.dataType)) ==
      target.map(f => (f.name, f.dataType)))
    val rows = merged.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // int → long cast
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("PRE_MIGRATION", "PRE_MIGRATION", "HIGH"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.5, 20.0, 30.0))
  }

  test("schema evolution is strict: an undeclared generation column " +
      "fails the read instead of silently dropping data") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(StructField("id", LongType)))
    val gen = Seq((1L, "oops")).toDF("id", "legacy_notes")
    val e = intercept[IllegalArgumentException] {
      graft.sources.SchemaEvolution.alignGenerations(
        Seq(gen -> Map.empty), target)
    }
    assert(e.getMessage.contains("legacy_notes"))
    // declaring the drop makes the same read legal
    val ok = graft.sources.SchemaEvolution.alignGenerations(
      Seq(gen -> Map.empty), target, dropped = Set("legacy_notes"))
    assert(ok.columns.toSeq == Seq("id") && ok.count() == 1)
  }

  test("schema evolution: a dual-write generation (rename target " +
      "already present) is refused with the operator's message, not an " +
      "AMBIGUOUS_REFERENCE crash") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("id", LongType), StructField("total_price", DoubleType)))
    val dual = Seq((1L, 10.0, 10.0)).toDF("id", "price", "total_price")
    val e = intercept[IllegalArgumentException] {
      graft.sources.SchemaEvolution.alignGenerations(
        Seq(dual -> Map("price" -> "total_price")), target)
    }
    assert(e.getMessage.contains("price->total_price"))
  }

  test("schema evolution: renames apply atomically — a replacement " +
      "chain (v2 takes the name, old goes to _legacy) is legal") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DoubleType),
      StructField("price_legacy", DoubleType)))
    val gen = Seq((1L, 99.0, 11.0)).toDF("id", "price_v2", "price")
    val merged = graft.sources.SchemaEvolution.alignGenerations(
      Seq(gen -> Map("price_v2" -> "price", "price" -> "price_legacy")),
      target)
    val r = merged.head
    assert(r.getDouble(1) == 99.0, "price must carry v2's values")
    assert(r.getDouble(2) == 11.0, "price_legacy must carry the old values")
  }

  test("schema evolution refuses lossy casts (Long→Int, String→Long) " +
      "and honors the explicit allowLossy opt-out") {
    import org.apache.spark.sql.types._
    // Long source into an Int target: plain cast silently truncates
    // (non-ANSI) — refused with both type names in the message
    val narrow = StructType(Seq(StructField("id", IntegerType)))
    val longs = Seq(java.lang.Long.valueOf(5000000000L)).toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.SchemaEvolution.alignGenerations(
        Seq(longs -> Map.empty), narrow)
    }
    assert(e1.getMessage.contains("bigint -> int"))
    // String source into a Long target: cast nulls non-numeric rows
    val strTarget = StructType(Seq(StructField("id", LongType)))
    val strs = Seq("7", "oops").toDF("id")
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.SchemaEvolution.alignGenerations(
        Seq(strs -> Map.empty), strTarget)
    }
    assert(e2.getMessage.contains("string -> bigint"))
    // the explicit opt-out performs the lossy cast (audited, per-column)
    val opted = graft.sources.SchemaEvolution.alignGenerations(
      Seq(strs -> Map.empty), strTarget, allowLossy = Set("id"))
    assert(opted.collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0)).toSet == Set(7L, null))
    // the value-exact ladder: Int→Float (24-bit mantissa) is lossy,
    // Int→Double and Decimal widening are not
    import graft.sources.SchemaEvolution.widensLosslessly
    assert(!widensLosslessly(IntegerType, FloatType))
    assert(!widensLosslessly(LongType, DoubleType))
    assert(widensLosslessly(IntegerType, DoubleType))
    assert(widensLosslessly(DecimalType(10, 2), DecimalType(18, 4)))
    assert(!widensLosslessly(DecimalType(18, 4), DecimalType(10, 2)))
    assert(!widensLosslessly(DecimalType(10, 2), DoubleType))
  }

  test("schema evolution: a generation failing its version's contract " +
      "fails the read loudly") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("se_spec").toString
    Seq((1L, -5.0)).toDF("id", "price")
      .write.mode("overwrite").parquet(s"$dir/v1")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    val c = DataContract("v1",
      Seq(ColumnContract("price", "numeric", minValue = Some(0))),
      requiredColumns = Seq("id"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.SchemaEvolution.readEvolved(spark,
        Seq(graft.sources.SchemaEvolution.Generation(s"$dir/v1")),
        target, contracts = Map(0 -> c))
    }
    assert(e.getMessage.contains("v1"))
  }

  test("quality summary rollup (A10)") {
    val hist = Seq((true, 100L, 0L), (false, 50L, 3L))
      .toDF("is_valid", "row_count", "error_count")
    val row = qualitySummary(hist).head
    assert(row.getDouble(0) == 0.5 && row.getDouble(1) == 75.0 &&
      row.getLong(2) == 3L)
  }
}
