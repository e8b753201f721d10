package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.Contracts
import graft.quality.Contracts.{ColumnContract, DataContract}
import graft.serve.Serve
import graft.serve.Serve.RecFilter
import graft.sources.Tables

/**
 * Oracle-checked queries for the quality (P6/A10/A11) and serving
 * (P3/O3/A3-A6/E2) modules over the testdata.
 *
 * The serving queries run over a deterministic "recommendations" frame
 * derived from `orders`: score = (o_orderkey % 15013)/15013 is UNIQUE at
 * sf0.01 (orderkey 0..14999 dense < 15013 prime), giving the total order that
 * pagination hashing requires without a tie-break column (the oracle gate
 * runs at sf0.01 only; ties at larger SFs affect no correctness check).
 * Money columns stay at their native 2 decimal places — deriving values
 * with exactly 3 decimals (e.g. price*0.1) puts every rounded sum on the
 * .xx5 half-up boundary where binary float tie-breaking diverges between
 * engines (SURVEY §7.4.5).
 */
object ServeQueries {

  /** orders → recommendations-shaped frame, same arithmetic both engines. */
  private def recs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      (col("o_orderkey") % 15013 / 15013.0).as("score"),
      col("o_totalprice").as("estimated_value"),
      when(col("o_orderkey") % 1000 / 1000.0 > 0.8, "High")
        .when(col("o_orderkey") % 1000 / 1000.0 > 0.6, "Medium")
        .otherwise("Low").as("confidence"),
      when(col("o_orderpriority").startsWith("1"), "Industry Expansion")
        .when(col("o_orderpriority").startsWith("2"), "Partner Referral")
        .otherwise("Market Development").as("recommendation_type"),
      (col("o_custkey") % 5).cast("string").as("org1_id"),
      (col("o_custkey") % 7).cast("string").as("org2_id"),
      col("o_orderdate").as("created_at"))

  private val recsSql =
    """recs AS (SELECT o_orderkey,
      |  (o_orderkey % 15013)/15013.0 AS score,
      |  o_totalprice AS estimated_value,
      |  CASE WHEN (o_orderkey % 1000)/1000.0 > 0.8 THEN 'High'
      |       WHEN (o_orderkey % 1000)/1000.0 > 0.6 THEN 'Medium'
      |       ELSE 'Low' END AS confidence,
      |  CASE WHEN o_orderpriority LIKE '1%' THEN 'Industry Expansion'
      |       WHEN o_orderpriority LIKE '2%' THEN 'Partner Referral'
      |       ELSE 'Market Development' END AS recommendation_type,
      |  CAST(o_custkey % 5 AS VARCHAR) AS org1_id,
      |  CAST(o_custkey % 7 AS VARCHAR) AS org2_id,
      |  o_orderdate AS created_at
      | FROM orders)""".stripMargin

  /** Synthetic contract for `orders` exercising every checker: unique id,
    * non-null FK, bounded price, allowed-set status. */
  private val ordersContract = DataContract(
    name = "orders",
    requiredColumns = Seq("o_orderkey"),
    columns = Seq(
      ColumnContract("o_orderkey", "numeric", nullable = false, unique = true),
      ColumnContract("o_custkey", "numeric", nullable = false),
      ColumnContract("o_totalprice", "numeric",
        minValue = Some(1000.0), maxValue = Some(300000.0)),
      ColumnContract("o_orderstatus", "string",
        allowedValues = Some(Set("O", "F")))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q206_export_roundtrip" -> ((s, dir) => {
      // S13 hash-gated (VERDICT r15 #4; reference api/main.py:794-858):
      // the export surface closes its own loop — the same frame is
      // written through exportJson AND exportCsv, read back through
      // readJsonl/readCsv with the explicit schemas, and the result is
      // the INTERSECTION of the two roundtrips (exact row equality on
      // every column). A row any export path drops, mangles, or
      // re-types falls out of the intersect and the row count misses
      // the oracle, which replays the source filter directly — so the
      // green row certifies both serializers and both readers
      // value-exactly, not just "a file appeared".
      import org.apache.spark.sql.types._
      val src = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("o_orderdate"))
      val out = Scratch.path(s, "q206")
      Serve.exportJson(src, s"$out/json")
      Serve.exportCsv(src, s"$out/csv")
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", DateType)))
      Serve.readJsonl(s, s"$out/json", schema)
        .intersect(Serve.readCsv(s, s"$out/csv", schema))
        // rendered as a string for the cross-engine compare (the q11
        // date discipline); the roundtrip itself ran on the DATE type
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .orderBy("o_orderkey")
    }),

    "q58_contract_profile" -> ((s, dir) => {
      // one-agg-pass contract violation counters (reference:
      // data_contracts.py:103-192 P6/A11), relational face
      Contracts.violationProfile(Tables.load(s, dir, "orders"), ordersContract)
        .orderBy("column", "check")
    }),

    "q59_serve_page" -> ((s, dir) => {
      // dynamic filter compile + whitelisted sort + pagination
      // (reference: api/main.py:444-478 P3/O3/W4)
      val f = RecFilter(
        minScore = Some(0.3),
        confidenceLevels = Seq("High", "Medium"),
        orgIds = Seq("1", "2"))
      val filtered = recs(s, dir).filter(Serve.compile(f))
      Serve.page(filtered, "score", ascending = false, limit = 50, offset = 10)
        .select(col("o_orderkey"), round(col("score"), 6).as("score"),
          col("confidence"), col("org1_id"), col("org2_id"))
    }),

    "q116_health_counts" -> ((s, dir) => {
      // A8 health/status row counts per entity (reference: api/main.py
      // health endpoint)
      Serve.healthCounts(Seq(
          "customer" -> Tables.load(s, dir, "customer"),
          "orders" -> Tables.load(s, dir, "orders"),
          "documents" -> Tables.load(s, dir, "documents")))
        .orderBy("entity")
    }),

    "q60_insights_summary" -> ((s, dir) => {
      // A3 one-row insights aggregate (reference: api/main.py:663-676)
      Serve.insightsSummary(recs(s, dir))
        .select(col("total_recommendations"),
          round(col("total_estimated_value"), 2).as("total_estimated_value"),
          round(col("avg_score"), 6).as("avg_score"),
          col("high_value_count"),
          round(col("avg_deal_size"), 2).as("avg_deal_size"))
    }),

    "q61_insights_breakdown" -> ((s, dir) => {
      // A4/A5 per-dimension breakdown (reference: api/main.py:725-747)
      Serve.breakdown(recs(s, dir), col("recommendation_type"))
        .select(col("recommendation_type"), col("n"),
          round(col("total_value"), 2).as("total_value"),
          round(col("avg_score"), 6).as("avg_score"))
        .orderBy("recommendation_type")
    }),

    "q62_daily_trend" -> ((s, dir) => {
      // A6 recent-window daily trend with frozen asOf (reference:
      // api/main.py:750-761; SURVEY §7.4.3)
      Serve.dailyTrend(recs(s, dir), col("created_at"),
          lit("1998-08-02").cast("date"), 90)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          round(col("total_value"), 2).as("total_value"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // the export loop must hand back exactly the source selection —
    // the oracle never sees the files, it recomputes what a lossless
    // export+read pair must return
    "q206_export_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
        |FROM orders WHERE o_totalprice > 100000
        |ORDER BY o_orderkey""".stripMargin,

    "q58_contract_profile" ->
      """WITH c AS (
        |  SELECT 'o_orderkey' AS "column", 'nulls' AS "check",
        |    count(*) FILTER (o_orderkey IS NULL) AS violations FROM orders
        |  UNION ALL SELECT 'o_orderkey', 'dups',
        |    count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'o_custkey', 'nulls',
        |    count(*) FILTER (o_custkey IS NULL) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'nulls',
        |    count(*) FILTER (o_totalprice IS NULL) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'below',
        |    count(*) FILTER (o_totalprice < 1000.0) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'above',
        |    count(*) FILTER (o_totalprice > 300000.0) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'nulls',
        |    count(*) FILTER (o_orderstatus IS NULL) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'invalid',
        |    count(*) FILTER (o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O','F')) FROM orders)
        |SELECT * FROM c ORDER BY "column", "check"""".stripMargin,

    "q59_serve_page" ->
      s"""WITH $recsSql
        |SELECT o_orderkey, round(score, 6) AS score, confidence,
        |  org1_id, org2_id
        |FROM recs
        |WHERE score >= 0.3 AND confidence IN ('High', 'Medium')
        |  AND (org1_id IN ('1','2') OR org2_id IN ('1','2'))
        |ORDER BY score DESC LIMIT 50 OFFSET 10""".stripMargin,

    "q116_health_counts" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS entity, count(*) AS n FROM customer
        |  UNION ALL SELECT 'orders', count(*) FROM orders
        |  UNION ALL SELECT 'documents', count(*) FROM documents)
        |ORDER BY entity""".stripMargin,

    "q60_insights_summary" ->
      s"""WITH $recsSql
        |SELECT count(*) AS total_recommendations,
        |  round(sum(estimated_value), 2) AS total_estimated_value,
        |  round(avg(score), 6) AS avg_score,
        |  count(*) FILTER (score > 0.8) AS high_value_count,
        |  round(avg(estimated_value), 2) AS avg_deal_size
        |FROM recs""".stripMargin,

    "q61_insights_breakdown" ->
      s"""WITH $recsSql
        |SELECT recommendation_type, count(*) AS n,
        |  round(sum(estimated_value), 2) AS total_value,
        |  round(avg(score), 6) AS avg_score
        |FROM recs GROUP BY 1 ORDER BY recommendation_type""".stripMargin,

    "q62_daily_trend" ->
      s"""WITH $recsSql
        |SELECT strftime(created_at, '%Y-%m-%d') AS day, count(*) AS n,
        |  round(sum(estimated_value), 2) AS total_value
        |FROM recs
        |WHERE created_at >= DATE '1998-08-02' - INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY day""".stripMargin
  )
}
