package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.TopK
import graft.sources.Tables

/**
 * Core relational operator inventory (SURVEY §2.2-§2.7) exercised against the
 * driver testdata, each with a DuckDB oracle (SURVEY §5 strategy).
 *
 * Conventions for oracle parity:
 *  - every query ends in a TOTAL deterministic ORDER BY (unique tiebreaker);
 *  - float aggregates rounded: sums → 2dp, ratios/avgs → 6dp (SURVEY §7.4.5);
 *  - integer-sum outputs cast to BIGINT on the DuckDB side (its SUM(int) is
 *    HUGEINT) and long on the Spark side;
 *  - dates emitted as 'yyyy-MM-dd' strings (engine-neutral hashing);
 *  - no current_timestamp()/now() — fixed literal asOf timestamps.
 */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // spread variant for per-row/pair compute-heavy pipelines over the
  // unsplittable single-row-group testdata files (Tables.loadSpread
  // scaladoc); the light scan->agg queries keep the shuffle-free scan
  private def th(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / filters (SURVEY S3, P1-P4, P7-P8) ----
    "q01_pricing_summary" -> ((s, dir) => {
      // TPC-H Q1 shape: filter + group + multi-agg (SURVEY A3; reference api/main.py:663-676)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_range" -> ((s, dir) => {
      // range predicates (reference: orchestrator.py:464-466 P1; api/main.py:444-468 P3)
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 150000 &&
          col("o_orderdate") >= lit("1995-06-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    "q03_filter_in_or" -> ((s, dir) => {
      // IN-set + OR disjunction (reference: api/main.py:444-468, dashboard.py:113-120)
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          (col("o_orderstatus") === "F" || col("o_totalprice") > 200000))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- joins (SURVEY J1, J5-J9) ----
    "q04_join_fk_rollup" -> ((s, dir) => {
      // FK equi-join chain + rollup (SURVEY J8/A4). nation/region are tiny →
      // Catalyst auto-broadcasts; orders⋈customer shuffles on custkey.
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    }),

    "q05_agg_then_join" -> ((s, dir) => {
      // aggregate-then-join + coalesce default (reference: orchestrator.py:407-414 J6/A9)
      val cust = t(s, dir, "customer")
      val perCust = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), max("o_totalprice").as("max_price"))
      cust.join(perCust, cust("c_custkey") === perCust("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("max_price"), lit(0.0)), 2).as("max_price"))
        .orderBy("c_custkey")
    }),

    "q06_theta_self_join" -> ((s, dir) => {
      // inequality self-join = org-pair generation (reference: pipeline.py:305-315 J1)
      val n1 = t(s, dir, "nation").alias("n1")
      val n2 = t(s, dir, "nation").alias("n2")
      n1.join(n2,
          col("n1.n_regionkey") === col("n2.n_regionkey") &&
            col("n1.n_nationkey") < col("n2.n_nationkey"))
        .select(col("n1.n_regionkey").as("r_key"),
          col("n1.n_name").as("nation_a"), col("n2.n_name").as("nation_b"))
        .orderBy("r_key", "nation_a", "nation_b")
    }),

    "q07_semi_join" -> ((s, dir) => {
      // membership as LEFT SEMI (reference: evaluate.py:178-187 J7)
      val cust = t(s, dir, "customer")
      val fOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      cust.join(fOrders, cust("c_custkey") === fOrders("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q08_anti_join" -> ((s, dir) => {
      // negatives as LEFT ANTI (reference: evaluate.py:188-190)
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q28_broadcast_lookup" -> ((s, dir) => {
      // fact⋈dim broadcast hash join (reference: entity_resolution.py:511-524 J5)
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    "q30_exact_match_join" -> ((s, dir) => {
      // deterministic exact-match pairing (reference: entity_resolution.py:408-416 J9)
      val a = th(s, dir, "part").alias("a")
      val b = th(s, dir, "part").alias("b")
      a.join(b, col("a.p_name") === col("b.p_name") &&
          col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_name").as("p_name"),
          col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"))
        .orderBy("p_name", "a_key", "b_key")
    }),

    // ---- aggregations (SURVEY A3-A7, A11, A15-A16) ----
    "q11_daily_trend" -> ((s, dir) => {
      // per-day rollup (reference: api/main.py:750-761, dashboard.py:71-79 A6)
      t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("value"))
        .orderBy("day")
    }),

    "q12_conditional_agg" -> ((s, dir) => {
      // count/sum/avg + filtered count (reference: api/main.py:663-676 A3)
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum("c_acctbal"), 2).as("total_bal"),
          round(avg("c_acctbal"), 6).as("avg_bal"),
          count(when(col("c_acctbal") > 5000, 1)).as("high_bal"))
        .orderBy("c_mktsegment")
    }),

    "q14_distinct_union" -> ((s, dir) => {
      // union+distinct of two columns (reference: dashboard.py:107-109 A16/O7)
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy("nationkey")
    }),

    "q15_null_profile" -> ((s, dir) => {
      // one-pass null profile (reference: data_contracts.py:140-141 A11/P6)
      val o = t(s, dir, "orders")
      o.agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        sum(col("o_totalprice").isNull.cast("long")).as("null_totalprice"),
        sum(col("o_orderdate").isNull.cast("long")).as("null_orderdate"),
        sum(col("o_orderpriority").isNull.cast("long")).as("null_priority"))
    }),

    "q24_pivot_segments" -> ((s, dir) => {
      // fixed-column pivot (reference: pipeline.py:92-103 A15 one-hot)
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      def seg(v: String) = count(when(col("c_mktsegment") === v, 1))
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(seg("AUTOMOBILE").as("n_automobile"), seg("BUILDING").as("n_building"),
          seg("FURNITURE").as("n_furniture"), seg("HOUSEHOLD").as("n_household"),
          seg("MACHINERY").as("n_machinery"))
        .orderBy("n_name")
    }),

    "q27_value_counts" -> ((s, dir) => {
      // value_counts (reference: dashboard.py:182 A7)
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")).orderBy("event_type")
    }),

    // ---- windows / ranking / pagination (SURVEY W1-W4, A2) ----
    "q09_topk_per_group" -> ((s, dir) => {
      // top-k per partition (reference: pipeline.py:335-336 A2/W3)
      TopK.topKPerGroup(t(s, dir, "customer"),
          Seq(col("c_mktsegment")),
          Seq(col("c_acctbal").desc, col("c_custkey").asc), 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_mktsegment", "rn")
    }),

    "q10_rank_global" -> ((s, dir) => {
      // global score rank (reference: pipeline.py:320-321 W1)
      TopK.globalTopK(t(s, dir, "orders"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 100)
        .select("o_orderkey", "o_totalprice", "rank")
        .orderBy("rank")
    }),

    "q13_pagination" -> ((s, dir) => {
      // sort + offset/limit (reference: api/main.py:471-478 W4/O3)
      TopK.paginate(t(s, dir, "orders"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 50, 100)
        .select("o_orderkey", "o_totalprice")
    }),

    // ---- scalar functions (SURVEY F1-F13, F17-F23, F26) ----
    "q16_name_normalize" -> ((s, dir) => {
      // company-name normalize (reference: entity_resolution.py:76-98 F1)
      // via the native NormalizedName kernel — bit-identical to the
      // composed TextFunctions.nameNormalize (HashOpsSpec), minus two
      // interpreted HOF lambdas per row and ~2s of codegen compile for
      // the giant literal-map expression tree
      t(s, dir, "customer")
        .select(col("c_custkey"),
          org.apache.spark.sql.graftshim.GraftShim.column(
            graft.functions.NormalizedName(
              org.apache.spark.sql.graftshim.GraftShim.expr(
                concat(col("c_name"), lit(" Tech Corp")))))
            .getField("norm").as("norm_name"))
        .orderBy("c_custkey")
    }),

    "q17_blocking_key" -> ((s, dir) => {
      // ER blocking key (reference: entity_resolution.py:287-294 F8)
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .select(col("c_custkey"),
          blockingKey(col("c_name"), col("n_name")).as("block_key"))
        .orderBy("c_custkey")
    }),

    "q18_levenshtein" -> ((s, dir) => {
      // edit distance + normalized similarity (reference: entity_resolution.py:166-196 F6)
      t(s, dir, "customer")
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000004242")).cast("long").as("lev_dist"),
          round(levenshteinSim(col("c_name"), lit("Customer#000004242")), 6).as("lev_sim"))
        .orderBy("c_custkey")
    }),

    "q20_hash_ids" -> ((s, dir) => {
      // deterministic hash ids (reference: feedback_logging.py:386-400,525-528 F22)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          md5(concat_ws(":", col("o_orderkey").cast("string"), col("o_orderstatus"))).as("h_md5"),
          substring(sha2(concat_ws(":", col("o_orderkey").cast("string"),
            col("o_orderstatus")), 256), 1, 12).as("pred_id"))
        .orderBy("o_orderkey")
    }),

    "q21_math_features" -> ((s, dir) => {
      // log1p / safe-ratio / flag features (reference: pipeline.py:70-77 F9-F11)
      t(s, dir, "part")
        .select(col("p_partkey"),
          round(log1p(col("p_retailprice")), 6).as("log_price"),
          round(col("p_retailprice") /
            when(col("p_size") === 0, 1).otherwise(col("p_size")), 6).as("price_per_size"),
          (col("p_size") > 25).cast("int").as("is_large"))
        .orderBy("p_partkey")
    }),

    "q22_bucketize" -> ((s, dir) => {
      // chained-when bucketing (reference: pipeline.py:375-398 F17/F18)
      val tier = when(col("o_totalprice") > 200000, "Very High")
        .when(col("o_totalprice") > 100000, "High")
        .when(col("o_totalprice") > 50000, "Medium")
        .otherwise("Low")
      t(s, dir, "orders")
        .groupBy(tier.as("tier"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 6).as("avg_price"))
        .orderBy("tier")
    }),

    "q23_date_arith" -> ((s, dir) => {
      // date arithmetic + recency score (reference: pipeline.py:80-89 F12/F13)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(lit("1998-12-01").cast("date"), col("o_orderdate"))
            .cast("long").as("days_since"),
          round(lit(1.0) / (lit(1.0) +
            datediff(lit("1998-12-01").cast("date"), col("o_orderdate")) / lit(30.0)), 6)
            .as("recency_score"))
        .filter(col("o_orderdate") <= lit("1998-12-01").cast("timestamp"))
        .orderBy("o_orderkey")
    }),

    "q29_token_jaccard" -> ((s, dir) => {
      // token-set Jaccard over pairs (reference: pipeline.py:126-133, entity_resolution.py:157-164 F5/O6)
      // per-ROW prep: distinct tokens → xxhash64 → sorted set (O(rows));
      // per-PAIR work is then one primitive merge walk
      // (SortedIntersectCount) instead of array_intersect+array_union hash
      // sets over strings (O(pairs), the hot loop). |∪|=|a|+|b|−|∩| on
      // distinct sets; 64-bit hashes make a cross-engine value drift a
      // ~2⁻⁶⁴-per-pair event (the oracle intersects the string sets).
      val p = th(s, dir, "part")
      def prep(key: String, pre: String) = p.select(
        col("p_partkey").as(key),
        col("p_brand").as(s"${pre}_brand"), col("p_type").as(s"${pre}_type"),
        sort_array(array_distinct(transform(
          array_distinct(split(col("p_name"), " ")), t => xxhash64(t))))
          .as(s"${pre}_hs"))
      val a = prep("a_key", "a")
      val b = prep("b_key", "b")
      val inter = graft.functions.TextFunctions
        .sortedIntersectCount(col("a_hs"), col("b_hs")).cast("double")
      val aSz = size(col("a_hs")).cast("double")
      val bSz = size(col("b_hs")).cast("double")
      val jacc = when(aSz === 0 || bSz === 0, lit(0.0))
        .otherwise(inter / (aSz + bSz - inter))
      a.join(b, col("a_brand") === col("b_brand") && col("a_type") === col("b_type") &&
          col("a_key") < col("b_key"))
        .select(col("a_key"), col("b_key"), round(jacc, 6).as("jaccard"))
        .orderBy("a_key", "b_key")
    }),

    // ---- incremental / time-window (SURVEY T1, T4, F26) ----
    "q25_event_rollup" -> ((s, dir) => {
      // event-time daily rollup (reference: dashboard.py:71-79 T4 batch shape)
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("day", "event_type")
    }),

    "q68_json_props" -> ((s, dir) => {
      // JSON get/put on the events props payload (reference F25:
      // from_json parse + to_json re-emit, database.py:146,170-173)
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"),
          col("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          max("k").as("max_k"))
        .orderBy("event_type")
    }),

    "q26_hwm_read" -> ((s, dir) => {
      // high-water-mark incremental read (reference: data_contracts.py:235-275 T1/S16)
      Tables.hwmRead(t(s, dir, "events"), "ts",
          java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty, round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_range" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_totalprice > 150000 AND o_orderdate >= TIMESTAMP '1995-06-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01' ORDER BY o_orderkey""".stripMargin,

    "q03_filter_in_or" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  AND (o_orderstatus = 'F' OR o_totalprice > 200000) ORDER BY o_orderkey""".stripMargin,

    "q04_join_fk_rollup" ->
      """SELECT r_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q05_agg_then_join" ->
      """SELECT c_custkey, c_name, coalesce(t.n_orders, 0) AS n_orders,
        | round(coalesce(t.max_price, 0.0), 2) AS max_price
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS max_price
        |  FROM orders GROUP BY o_custkey) t ON c_custkey = t.o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q06_theta_self_join" ->
      """SELECT n1.n_regionkey AS r_key, n1.n_name AS nation_a, n2.n_name AS nation_b
        |FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        |  AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY r_key, nation_a, nation_b""".stripMargin,

    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""".stripMargin,

    "q28_broadcast_lookup" ->
      """SELECT p_brand, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q30_exact_match_join" ->
      """SELECT a.p_name AS p_name, a.p_partkey AS a_key, b.p_partkey AS b_key
        |FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
        |ORDER BY a.p_name, a_key, b_key""".stripMargin,

    "q11_daily_trend" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n,
        | round(sum(o_totalprice),2) AS value
        |FROM orders GROUP BY 1 ORDER BY day""".stripMargin,

    "q12_conditional_agg" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal),2) AS total_bal,
        | round(avg(c_acctbal),6) AS avg_bal,
        | count(*) FILTER (WHERE c_acctbal > 5000) AS high_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q14_distinct_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q15_null_profile" ->
      """SELECT count(*) AS n_rows,
        | count(*) FILTER (WHERE o_custkey IS NULL) AS null_custkey,
        | count(*) FILTER (WHERE o_totalprice IS NULL) AS null_totalprice,
        | count(*) FILTER (WHERE o_orderdate IS NULL) AS null_orderdate,
        | count(*) FILTER (WHERE o_orderpriority IS NULL) AS null_priority
        |FROM orders""".stripMargin,

    "q24_pivot_segments" ->
      """SELECT n_name,
        | count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS n_automobile,
        | count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building,
        | count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS n_furniture,
        | count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS n_household,
        | count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS n_machinery
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q27_value_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",

    "q09_topk_per_group" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "q10_rank_global" ->
      """SELECT o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders) WHERE rank <= 100 ORDER BY rank""".stripMargin,

    "q13_pagination" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100""".stripMargin,

    "q16_name_normalize" ->
      """WITH t AS (SELECT c_custkey, lower(trim(c_name || ' Tech Corp')) AS nm FROM customer),
        |u AS (SELECT c_custkey, list_filter(list_transform(
        |  list_filter(string_split_regex(regexp_replace(nm, '[^\w\s&]', ' ', 'g'), '\s+'),
        |    x -> len(x) > 0),
        |  x -> CASE x WHEN 'intl' THEN 'international' WHEN 'corp' THEN 'corporation'
        |    WHEN 'inc' THEN 'incorporated' WHEN 'co' THEN 'company'
        |    WHEN 'tech' THEN 'technology' WHEN 'sys' THEN 'systems'
        |    WHEN 'svc' THEN 'services' WHEN 'svcs' THEN 'services'
        |    WHEN 'mfg' THEN 'manufacturing' ELSE x END),
        |  x -> x NOT IN ('inc','incorporated','corp','corporation','co','company',
        |    'llc','llp','ltd','limited','plc','gmbh','ag','sa','nv','holdings','group',
        |    'international','intl','global','worldwide')) AS toks FROM t)
        |SELECT c_custkey, array_to_string(toks, ' ') AS norm_name FROM u ORDER BY c_custkey""".stripMargin,

    "q17_blocking_key" ->
      """WITH t AS (SELECT c_custkey, lower(trim(c_name)) AS nm, lower(n_name) AS country
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |u AS (SELECT c_custkey, array_to_string(list_filter(
        |  list_filter(string_split_regex(regexp_replace(nm, '[^\w\s&]', ' ', 'g'), '\s+'),
        |    x -> len(x) > 0),
        |  x -> x NOT IN ('inc','incorporated','corp','corporation','co','company',
        |    'llc','llp','ltd','limited','plc','gmbh','ag','sa','nv','holdings','group',
        |    'international','intl','global','worldwide')), ' ') AS norm_name, country FROM t)
        |SELECT c_custkey, substring(norm_name, 1, 3) || '_' || substring(country, 1, 3) AS block_key
        |FROM u ORDER BY c_custkey""".stripMargin,

    "q18_levenshtein" ->
      """SELECT c_custkey, CAST(levenshtein(c_name, 'Customer#000004242') AS BIGINT) AS lev_dist,
        | round(1.0 - levenshtein(c_name, 'Customer#000004242') /
        |   CAST(greatest(len(c_name), len('Customer#000004242')) AS DOUBLE), 6) AS lev_sim
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q20_hash_ids" ->
      """SELECT o_orderkey,
        | md5(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus) AS h_md5,
        | substring(sha256(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus), 1, 12) AS pred_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_math_features" ->
      """SELECT p_partkey, round(ln(1 + p_retailprice), 6) AS log_price,
        | round(p_retailprice / (CASE WHEN p_size = 0 THEN 1 ELSE p_size END), 6) AS price_per_size,
        | CAST(p_size > 25 AS INTEGER) AS is_large
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q22_bucketize" ->
      """SELECT CASE WHEN o_totalprice > 200000 THEN 'Very High'
        |  WHEN o_totalprice > 100000 THEN 'High'
        |  WHEN o_totalprice > 50000 THEN 'Medium' ELSE 'Low' END AS tier,
        | count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
        |FROM orders GROUP BY tier ORDER BY tier""".stripMargin,

    "q23_date_arith" ->
      """SELECT o_orderkey,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT) AS days_since,
        | round(1.0 / (1.0 + date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') / 30.0), 6) AS recency_score
        |FROM orders WHERE o_orderdate <= TIMESTAMP '1998-12-01' ORDER BY o_orderkey""".stripMargin,

    "q29_token_jaccard" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_type,
        |  list_distinct(string_split(p_name, ' ')) AS toks FROM part)
        |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        | round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |   len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
        |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |  AND a.p_partkey < b.p_partkey
        |ORDER BY a_key, b_key""".stripMargin,

    "q25_event_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
        | round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q26_hwm_read" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id""".stripMargin,

    "q68_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
