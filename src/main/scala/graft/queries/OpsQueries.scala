package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.Contracts
import graft.sources.{Synthetic, Tables}

/**
 * Pipeline-ops queries: the extract/union/generate/monitor plumbing rows
 * of SURVEY §2 that were previously spec-only (S9, S15, O5, A10), each
 * now with a deterministic DuckDB oracle.
 *
 * Oracle notes: the frozen `_extracted_at` stamp keeps S9 replayable
 * (reference stamps now(); SURVEY §7.4.3). The synthetic generator's
 * uniforms are the portable md5 hash (Synthetic.u scaladoc), so DuckDB
 * replays the discrete columns draw-for-draw; the lognormal columns
 * (Box-Muller → exp/log/cos) are engine-libm-dependent and stay
 * spec-gated, not oracle'd. pickWeighted cums are written as chained
 * DOUBLE additions in SQL — `0.5 + 0.3` in DuckDB decimal is exactly
 * 0.8, one ulp off Scala's double sum, which flips threshold compares.
 */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // parsed in the SESSION timezone (q111's oracle renders it back out with
  // date_format, also session-TZ): java.sql.Timestamp.valueOf would parse
  // in the JVM default TZ and shift the rendered stamp on non-UTC hosts
  private val frozenTsStr = "2024-01-15 00:00:00"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q111_stamped_extract" -> ((s, dir) => {
      // S9: metadata stamp on an extract (reference: base.py:151-156
      // appends _org_id/_org_name/_extracted_at to every entity frame)
      Tables.stampMetadata(
          t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          "org_a", "Org Alpha", lit(frozenTsStr).cast("timestamp"))
        .select(col("c_custkey"), col("c_mktsegment"), col("_org_id"),
          col("_org_name"),
          date_format(col("_extracted_at"), "yyyy-MM-dd HH:mm:ss")
            .as("_extracted_at"))
        .orderBy("c_custkey")
    }),

    "q112_synthetic_accounts" -> ((s, dir) => {
      // S15: seeded synthetic account generator (reference:
      // evaluate.py:119-132) — the md5-uniform discrete columns; the
      // `dir` parameter is unused by design (generation, not a scan)
      Synthetic.accounts(s, 500)
        .select(col("Id"), col("Name"), col("Industry"),
          col("BillingCountry"),
          date_format(col("CreatedDate"), "yyyy-MM-dd").as("created"),
          date_format(col("LastActivityDate"), "yyyy-MM-dd")
            .as("last_activity"),
          col("Type"))
        .orderBy("Id")
    }),

    "q113_union_orgs" -> ((s, dir) => {
      // O5: multi-org unionByName with allowMissingColumns (reference:
      // orchestrator.py:183-201) — the two org extracts carry different
      // column subsets; missing columns null-fill
      val a = Tables.stampMetadata(
        t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_acctbal").as("balance")),
        "org_a", "Org Alpha", lit(frozenTsStr).cast("timestamp"))
      val b = Tables.stampMetadata(
        t(s, dir, "customer").filter(col("c_custkey") % 2 === 1)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_mktsegment").as("segment")),
        "org_b", "Org Beta", lit(frozenTsStr).cast("timestamp"))
      Tables.unionOrgs(Seq(a, b))
        .select(col("id"), col("name"), col("balance"), col("segment"),
          col("_org_id"))
        .orderBy("id")
    }),

    "q114_quality_summary" -> ((s, dir) => {
      // A10: quality-monitor rollup (reference: data_contracts.py
      // monitoring summary) over a deterministic per-month validation
      // history: a month is invalid when any order breaches the
      // price-cap rule. All three outputs are exact in double (integer
      // sums < 2^53, one division) — no rounding needed.
      val history = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("period"))
        .agg(count(lit(1)).as("row_count"),
          sum((col("o_totalprice") > 450000).cast("long")).as("error_count"))
        .withColumn("is_valid", col("error_count") === 0)
      Contracts.qualitySummary(
        history.select("is_valid", "row_count", "error_count"))
    }),

    "q129_bulk_csv_scan" -> ((s, dir) => {
      // S2 through the driver's correctness gate (the last §2 row that
      // was spec-only): snapshot nation in the bulk-CSV batch-file
      // layout, read it back through the DSv2 connector with a typed
      // schema, and push filter + projection into the reader
      // (PushedFilters/ReadSchema in the plan dump). The oracle reads
      // the SAME rows from the parquet table, so the check proves the
      // connector's parse/pushdown path reproduces the table exactly.
      // Snapshot columns are quote-free by construction (the stub
      // grammar splits on commas; nation names/keys contain none).
      val snap = "/tmp/graft_bulkcsv_q129"
      t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(snap)
      s.read.format(graft.sources.BulkCsvSource.format)
        .schema("n_nationkey LONG, n_name STRING, n_regionkey LONG")
        .load(snap)
        .filter(col("n_regionkey") < 3)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q129_bulk_csv_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey < 3 ORDER BY n_nationkey""".stripMargin,

    "q111_stamped_extract" ->
      """SELECT c_custkey, c_mktsegment, 'org_a' AS _org_id,
        |  'Org Alpha' AS _org_name,
        |  '2024-01-15 00:00:00' AS _extracted_at
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the md5 uniform: same spelling as the q70 oracle (proven portable)
    "q112_synthetic_accounts" -> {
      def u(salt: Int) =
        s"""(CAST(('0x' || substring(md5('syn42:$salt:' || id), 1, 8))
           |  AS UBIGINT) % 1000000 / 1000000.0)""".stripMargin
      s"""WITH ids AS (SELECT range AS id FROM range(500)),
        |g AS (SELECT id,
        |  (['Technology','Finance','Healthcare','Retail','Manufacturing'])
        |    [CAST(floor(${u(1)} * 5) AS INTEGER) + 1] AS industry,
        |  (['USA','UK','Germany','France','Canada'])
        |    [CAST(floor(${u(7)} * 5) AS INTEGER) + 1] AS country,
        |  DATE '2020-01-01'
        |    + CAST(floor(${u(8)} * 1000) AS INTEGER) AS created,
        |  DATE '2024-01-01'
        |    - CAST(floor(${u(9)} * 365) AS INTEGER) AS last_activity,
        |  CASE WHEN ${u(10)} < CAST(0.5 AS DOUBLE) THEN 'Customer'
        |    WHEN ${u(10)} < CAST(0.5 AS DOUBLE) + CAST(0.3 AS DOUBLE)
        |    THEN 'Prospect' ELSE 'Partner' END AS type
        |  FROM ids)
        |SELECT printf('ACC_%04d', id) AS "Id",
        |  'Company_' || id AS "Name", industry AS "Industry",
        |  country AS "BillingCountry",
        |  strftime(created, '%Y-%m-%d') AS created,
        |  strftime(last_activity, '%Y-%m-%d') AS last_activity,
        |  type AS "Type"
        |FROM g ORDER BY 1""".stripMargin
    },

    "q113_union_orgs" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance,
        |    NULL AS segment, 'org_a' AS _org_id
        |  FROM customer WHERE c_custkey % 2 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, NULL, c_mktsegment, 'org_b'
        |  FROM customer WHERE c_custkey % 2 = 1)
        |ORDER BY id""".stripMargin,

    "q114_quality_summary" ->
      """WITH h AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS period,
        |    count(*) AS row_count,
        |    sum(CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0 END)
        |      AS error_count
        |  FROM orders GROUP BY 1)
        |SELECT avg(CASE WHEN error_count = 0 THEN CAST(1.0 AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END) AS success_rate,
        |  avg(CAST(row_count AS DOUBLE)) AS avg_rows,
        |  CAST(sum(error_count) AS BIGINT) AS total_errors
        |FROM h""".stripMargin
  )
}
