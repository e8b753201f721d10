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

    "q205_schema_evolution" -> ((s, dir) => {
      // the alembic analog (VERDICT r15 #3): one logical orders table
      // split into two PHYSICAL schema generations — v1 (even keys,
      // pre-migration names, no priority column) and v2 (odd keys,
      // o_totalprice RENAMED to total_price, o_orderpriority ADDED) —
      // written to scratch parquet, then read back through
      // SchemaEvolution.readEvolved with the migration declared:
      // v1's rename ledger + a server_default for the added column +
      // a contract on each generation. The rollup groups by priority,
      // so pre-migration rows surface under the declared default —
      // the oracle replays the same split/merge from the base table.
      import org.apache.spark.sql.types._
      val orders = t(s, dir, "orders")
      val out = Scratch.path(s, "q205")
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$out/v1")
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("total_price"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$out/v2")
      val target = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("total_price", DoubleType),
        StructField("o_orderpriority", StringType)))
      def base(name: String) = Seq(
        Contracts.ColumnContract("o_orderkey", "numeric",
          nullable = false, unique = true),
        Contracts.ColumnContract("o_custkey", "numeric", nullable = false),
        Contracts.ColumnContract(name, "numeric", nullable = false,
          minValue = Some(0)))
      val merged = graft.sources.SchemaEvolution.readEvolved(s, Seq(
          graft.sources.SchemaEvolution.Generation(s"$out/v1",
            renames = Map("o_totalprice" -> "total_price")),
          graft.sources.SchemaEvolution.Generation(s"$out/v2")),
        target,
        defaults = Map("o_orderpriority" -> lit("0-PRE_MIGRATION")),
        contracts = Map(
          0 -> Contracts.DataContract("orders_v1", base("o_totalprice"),
            requiredColumns = Seq("o_orderkey", "o_totalprice")),
          1 -> Contracts.DataContract("orders_v2", base("total_price"),
            requiredColumns = Seq("o_orderkey", "total_price"))))
      merged.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("total_price").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    "q207_ops_metrics_rollup" -> ((s, dir) => {
      // the Grafana panel math (VERDICT r15 #5; reference
      // observability/grafana-dashboard.json: Success Rate / P95
      // Latency / Request Rate / Error Rate) over a DETERMINISTIC
      // request log derived from orders — the OpsMetrics.rollup
      // operator the /api/metrics endpoint serves, oracle-gated: per
      // route template the counts, success/error rates, total rows
      // served, and the EXACT-rank p95 latency (value at ⌈0.95·n⌉,
      // unique-key tiebreak — no histogram interpolation to diverge
      // between engines).
      val log = t(s, dir, "orders").select(
        col("o_orderkey").as("req_id"),
        when(col("o_orderkey") % 4 === 0, "/api/recommendations")
          .when(col("o_orderkey") % 4 === 1, "/api/recommendations/{id}")
          .when(col("o_orderkey") % 4 === 2, "/api/export/{format}")
          .otherwise("/api/insights").as("route"),
        when(col("o_orderkey") % 50 >= 45,
            when(col("o_orderkey") % 50 === 49, 500)
              .when(col("o_orderkey") % 50 === 48, 429)
              .otherwise(401))
          .otherwise(200).as("status"),
        ((col("o_orderkey") % 997) / 2.0 + 1.0).as("latency_ms"),
        (col("o_orderkey") % 100).as("rows"))
      graft.serve.OpsMetrics.rollup(log, tiebreak = col("req_id"))
        .select(col("route"), col("n_requests"),
          round(col("success_rate"), 6).as("success_rate"),
          round(col("error_rate"), 6).as("error_rate"),
          round(col("p95_latency_ms"), 6).as("p95_latency_ms"),
          col("rows_served"))
        .orderBy("route")
    }),

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
    }),

    "q136_compacted_layout" -> ((s, dir) => {
      // the 100 TB scan-cost story gated end-to-end (VERDICT r8 #3):
      // a streaming-sink-shaped directory of many small files is
      // compacted (Layout.compactParquet — marker-transaction swap,
      // row-count-verified), then laid out as the production fact table
      // (Layout.writeDatePartitionedZordered: Hive day partitions,
      // z-ordered on (user_id, value) within), and the final read
      // filters on day range + user_id — partition pruning eliminates
      // 25 of 30 day directories at PLANNING time and the user_id
      // predicate is a PushedFilter against z-tight row groups (plan
      // dump in PLANS.md). The oracle computes the same rollup from the
      // ORIGINAL events table, so the hash match proves the whole
      // rewrite chain (48-shard sink → compact → repartition →
      // partitioned rewrite) conserved every row and value exactly.
      val base = "/tmp/graft_layout_q136"
      val ev = t(s, dir, "events")
        .select("event_id", "ts", "user_id", "value")
      ev.repartition(48).write.mode("overwrite").parquet(s"$base/sink")
      graft.sources.Layout.compactParquet(s, s"$base/sink",
        targetBytes = 32L << 20)
      graft.sources.Layout.writeDatePartitionedZordered(
        s.read.parquet(s"$base/sink"), "ts", Seq("user_id", "value"),
        s"$base/lake")
      s.read.parquet(s"$base/lake")
        .filter(col("_day").between("2024-01-08", "2024-01-12") &&
          col("user_id") < 30)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          // decimal sum before the round: double-sum order differs
          // between Spark and DuckDB; a .xx5-boundary value would flip
          // the strict hash gate (the q95/q125 decimal discipline)
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
            .as("total_value"))
        .orderBy("user_id")
    }),

    "q137_contract_windows" -> ((s, dir) => {
      // the streaming contract monitor's windowed severity rollup,
      // oracle-gated end-to-end (VERDICT r8 #7, the q135 pattern): the
      // EXACT expression Streams.contractMonitor runs per event-time
      // window on a stream, evaluated on the batch events frame —
      // StreamsSpec proves stream ≡ batch severity semantics, this
      // query proves the math against DuckDB. The contract carries no
      // `unique` column, so every counter is an exact sum (the HLL dup
      // estimate is the one approximate counter in the monitor and
      // stays spec-gated by design).
      val contract = Contracts.DataContract("events_feed",
        columns = Seq(
          Contracts.ColumnContract("user_id", "numeric", nullable = false),
          Contracts.ColumnContract("value", "numeric",
            minValue = Some(1.0), maxValue = Some(400.0)),
          Contracts.ColumnContract("event_type", "string",
            allowedValues = Some(Set("view", "click", "purchase", "signup")))),
        requiredColumns = Seq("ts", "user_id", "value", "event_type"))
      graft.streaming.Streams.contractMonitor(
          t(s, dir, "events"), contract, windowLength = "1 day")
        .orderBy("window_start")
    }),

    "q145_delete_where" -> ((s, dir) => {
      // targeted row deletion gated end-to-end (Layout.deleteWhere
      // scaladoc — the right-to-erasure / retention-purge job): the
      // events table lands as a user-range-partitioned flat lake dir,
      // the erasure subjects (user_id % 10 == 3) are deleted — only
      // files CONTAINING them rewrite, found by a pruned predicate
      // scan — and the final rollup reads the post-delete directory.
      // The oracle computes the same rollup from the ORIGINAL table
      // minus the subjects, so the hash match proves the rewrite
      // deleted exactly the subjects and conserved everyone else.
      val base = "/tmp/graft_delete_q145"
      val ev = t(s, dir, "events")
        .select("event_id", "ts", "user_id", "value")
      ev.repartitionByRange(16, col("user_id"))
        .write.mode("overwrite").parquet(s"$base/table")
      graft.sources.Layout.deleteWhere(s, s"$base/table",
        pmod(col("user_id"), lit(10)) === 3)
      s.read.parquet(s"$base/table")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          // decimal sum before the round: double-sum order differs
          // between Spark and DuckDB; a .xx5-boundary value would flip
          // the strict hash gate (the q95/q125 decimal discipline)
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
            .as("total_value"))
        .orderBy("user_id")
    }),

    "q151_point_upsert" -> ((s, dir) => {
      // serving-store point update gated end-to-end (Layout.patchRow
      // scaladoc — the PATCH /recommendations/{id} lake shape): events
      // land as a key-range-partitioned lake, two rows are PATCHED in
      // place, one new row UPSERTED in, and the final rollup reads the
      // post-upsert directory. The oracle computes the same rollup from
      // the ORIGINAL table with the patches as CASE overrides and the
      // insert UNION'd on, so the hash match proves the keyed rewrite
      // replaced exactly the patched rows, inserted the new one, and
      // conserved everyone else byte-for-byte. Oracle parity DEPENDS on
      // the patched keys (42, 777) existing and the inserted key
      // (10000000) being ABSENT at the gate SF — enforced up front by
      // assertUpsertKeysSound via SparkEntry.verifyPreconditions, so a
      // regenerated events table that breaks the assumption fails the
      // round loudly instead of hash-mismatching.
      val base = "/tmp/graft_upsert_q151"
      val ev = t(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.repartitionByRange(8, col("event_id"))
        .write.mode("overwrite").parquet(s"$base/table")
      graft.sources.Layout.patchRow(s, s"$base/table", "event_id", 42L,
        Map("event_type" -> lit("purchase"), "value" -> lit(999.25)))
      graft.sources.Layout.patchRow(s, s"$base/table", "event_id", 777L,
        Map("event_type" -> lit("view"), "value" -> lit(111.5)))
      val insert = s.range(1).select(
        lit(10000000L).as("event_id"),
        to_timestamp(lit("2024-02-01 00:00:00")).as("ts"),
        lit(1L).as("user_id"),
        lit("purchase").as("event_type"),
        lit(100.5).as("value"))
      graft.sources.Layout.upsertByKey(s, s"$base/table", insert, "event_id")
      s.read.parquet(s"$base/table")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
            .as("total_value"))
        .orderBy("event_type")
    }),

    "q142_k_anonymize" -> ((s, dir) => {
      // k-anonymity release gate (quality.Privacy scaladoc): customers
      // exported under quasi-identifiers (nation, segment, 10000-wide
      // balance band) with every combination shared by < 5 rows
      // SUPPRESSED — the re-identification bound a governed export
      // enforces on top of q79's value redaction. At the gate SF the
      // band width releases ~92% of rows and suppresses the 76
      // small-group tail — the generalize-until-acceptable dial the
      // profile helper tunes. One partial-agg groupBy over the quasi
      // key joined back on the same key; the fact table never enters a
      // window.
      import graft.quality.Privacy
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          Privacy.bandLabel(col("c_acctbal"), 10000L).as("balance_band"))
      Privacy.kAnonymize(c,
          Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 5)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("balance_band"), col("group_size"))
        .orderBy("c_custkey")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // replays the synthetic request log + the panel math: rates as
    // avg-of-indicator, p95 as the exact rank-⌈0.95·n⌉ order statistic
    // with the same unique tiebreak
    "q207_ops_metrics_rollup" ->
      """WITH log AS (SELECT o_orderkey AS req_id,
        |    CASE WHEN o_orderkey % 4 = 0 THEN '/api/recommendations'
        |         WHEN o_orderkey % 4 = 1 THEN '/api/recommendations/{id}'
        |         WHEN o_orderkey % 4 = 2 THEN '/api/export/{format}'
        |         ELSE '/api/insights' END AS route,
        |    CASE WHEN o_orderkey % 50 >= 45 THEN
        |           CASE WHEN o_orderkey % 50 = 49 THEN 500
        |                WHEN o_orderkey % 50 = 48 THEN 429
        |                ELSE 401 END
        |         ELSE 200 END AS status,
        |    (o_orderkey % 997) / 2.0 + 1.0 AS latency_ms,
        |    o_orderkey % 100 AS rows
        |  FROM orders),
        |aggs AS (SELECT route, count(*) AS n_requests,
        |    avg(CASE WHEN status BETWEEN 200 AND 299 THEN 1.0 ELSE 0.0 END)
        |      AS success_rate,
        |    avg(CASE WHEN status >= 500 THEN 1.0 ELSE 0.0 END) AS error_rate,
        |    CAST(sum(rows) AS BIGINT) AS rows_served
        |  FROM log GROUP BY route),
        |p95 AS (SELECT route, latency_ms AS p95_latency_ms FROM (
        |    SELECT route, latency_ms,
        |      row_number() OVER (PARTITION BY route
        |        ORDER BY latency_ms ASC, req_id ASC) AS rn,
        |      count(*) OVER (PARTITION BY route) AS cnt
        |    FROM log)
        |  WHERE rn = CAST(ceiling(CAST(cnt AS DOUBLE) * 0.95) AS BIGINT))
        |SELECT a.route, a.n_requests, round(a.success_rate, 6) AS success_rate,
        |  round(a.error_rate, 6) AS error_rate,
        |  round(p.p95_latency_ms, 6) AS p95_latency_ms, a.rows_served
        |FROM aggs a LEFT JOIN p95 p ON p.route = a.route
        |ORDER BY a.route""".stripMargin,

    // replays the generation split + migration merge from the base
    // table: even keys are v1 (no priority column → the declared
    // default), odd keys are v2 (renamed price column — same values)
    "q205_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '0-PRE_MIGRATION'
        |    ELSE o_orderpriority END AS o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
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

    "q136_compacted_layout" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-12'
        |  AND user_id < 30
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the rollup over the ORIGINAL table with the two patches applied as
    // CASE overrides and the inserted row UNION'd on — a hash match
    // proves the keyed rewrite did exactly the upsert and nothing else
    "q151_point_upsert" ->
      """WITH patched AS (
        |  SELECT event_id, ts, user_id,
        |    CASE WHEN event_id = 42 THEN 'purchase'
        |         WHEN event_id = 777 THEN 'view'
        |         ELSE event_type END AS event_type,
        |    CASE WHEN event_id = 42 THEN 999.25
        |         WHEN event_id = 777 THEN 111.5
        |         ELSE value END AS value
        |  FROM events
        |  UNION ALL
        |  SELECT 10000000, TIMESTAMP '2024-02-01 00:00:00', 1,
        |    'purchase', 100.5)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM patched GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the rollup over the ORIGINAL table minus the erased subjects: a
    // hash match proves the file-targeted rewrite deleted exactly them
    "q145_delete_where" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
        |    AS total_value
        |FROM events
        |WHERE ((user_id % 10) + 10) % 10 <> 3
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q137_contract_windows" ->
      """WITH c AS (SELECT date_trunc('day', ts) AS w,
        |  CAST(count(*) AS BIGINT) AS rows_,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN value IS NOT NULL AND value < 1.0
        |        THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN value IS NOT NULL AND value > 400.0
        |        THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |  CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        |      ('view', 'click', 'purchase', 'signup')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS warnings
        |  FROM events GROUP BY 1)
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  rows_ AS "rows", errors, warnings, (errors = 0) AS is_valid
        |FROM c ORDER BY window_start""".stripMargin,

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
        |FROM h""".stripMargin,

    "q142_k_anonymize" ->
      """WITH b AS (SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(CAST(floor(CAST(c_acctbal AS DOUBLE) / 10000) AS BIGINT)
        |        * 10000 AS VARCHAR)
        |      || '-' ||
        |      CAST(CAST(floor(CAST(c_acctbal AS DOUBLE) / 10000) AS BIGINT)
        |        * 10000 + 10000 AS VARCHAR) AS balance_band
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, balance_band,
        |    CAST(count(*) AS BIGINT) AS group_size
        |  FROM b GROUP BY 1, 2, 3)
        |SELECT b.c_custkey, b.c_nationkey, b.c_mktsegment, b.balance_band,
        |  g.group_size
        |FROM b JOIN g
        |  ON b.c_nationkey IS NOT DISTINCT FROM g.c_nationkey
        |  AND b.c_mktsegment IS NOT DISTINCT FROM g.c_mktsegment
        |  AND b.balance_band IS NOT DISTINCT FROM g.balance_band
        |WHERE g.group_size >= 5
        |ORDER BY b.c_custkey""".stripMargin
  )
  /** q151 oracle-parity precondition: the patch targets must exist and
    * the insert key must be absent in the events table at the gate SF —
    * otherwise Spark's upsert REPLACES where the oracle's UNION ALL
    * appends, and the gate diverges (the q122/q153 margin-guard
    * discipline applied to key-existence assumptions). */
  def assertUpsertKeysSound(s: SparkSession, dir: String): Unit = {
    val ids = t(s, dir, "events")
      .filter(col("event_id").isin(42L, 777L, 10000000L))
      .select("event_id").distinct()
      .collect().map(_.getLong(0)).toSet
    require(ids == Set(42L, 777L),
      s"q151 precondition violated: patched keys 42/777 must exist and " +
        s"insert key 10000000 must be absent (found $ids) — the oracle's " +
        "CASE-override + UNION formulation no longer matches the upsert")
  }

}
