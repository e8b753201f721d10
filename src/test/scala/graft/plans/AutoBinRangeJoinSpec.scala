package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule must (1) kill the nested-loop plan for the naive
  * SQL range join, (2) stay row-identical to it — boundaries, empty and
  * inverted intervals, duplicate matches included — and (3) stand down
  * for shapes Spark already plans well (existing equi-conjunct), when
  * disabled by conf, or when a conf value is malformed. The rewritten
  * plan carries a residual nested-loop branch for over-cap intervals;
  * with none present it is runtime-empty and AQE collapses it, so plan
  * assertions read the FINAL adaptive plan (after an action). Driven via
  * `experimental.extraOptimizations` (the already-built-session path;
  * `GraftExtensions` injects the same rule object at session build). */
class AutoBinRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-01 00:30:00")),
    (3L, ts("2024-01-01 01:00:00")), // == w1.from (inclusive)
    (4L, ts("2024-01-01 01:59:59.999999")),
    (5L, ts("2024-01-01 02:00:00")), // == w1.to (exclusive)
    (6L, ts("2024-01-01 02:45:00"))
  ).toDF("id", "ts")

  private lazy val windows = Seq(
    ("w1", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
    ("w2", ts("2024-01-01 00:15:00"), ts("2024-01-01 02:30:00")),
    ("w3", ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00")), // empty
    ("w4", ts("2024-01-01 03:00:00"), ts("2024-01-01 01:00:00")), // inverted
    ("w5", ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00"))  // covers all
  ).toDF("wid", "from_ts", "to_ts")

  private val rangeSql =
    """SELECT id, wid FROM abr_events e JOIN abr_windows w
      |ON e.ts >= w.from_ts AND e.ts < w.to_ts""".stripMargin

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ AutoBinRangeJoin
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  /** FINAL plan section only, AFTER an action: AQE has replaced
    * runtime-empty stages (the residual branch, when no interval exceeds
    * the cap). `toString` on an adaptive plan appends an "== Initial
    * Plan ==" section that legitimately still shows the pre-AQE residual
    * nested loop — sliced off here. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    events.createOrReplaceTempView("abr_events")
    windows.createOrReplaceTempView("abr_windows")
  }

  test("naive SQL range join: BNLJ killed, rows identical, boundaries kept") {
    val naivePlan = spark.sql(rangeSql).queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"),
      s"fixture must be naive without the rule:\n$naivePlan")
    val expected = rows(spark.sql(rangeSql))
    withRule {
      val df = spark.sql(rangeSql)
      assert(rows(df) === expected)
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule must remove the nested loop (final adaptive plan):\n$plan")
      assert(plan.contains("Generate"), s"bin explosion missing:\n$plan")
      // boundary semantics survive the rewrite: from inclusive, to exclusive
      assert(expected.contains((3L, "w1")) && !expected.contains((5L, "w1")))
      assert(expected.forall { case (_, w) => w != "w3" && w != "w4" })
    }
  }

  test("interval side on the LEFT is handled symmetrically") {
    val sql = """SELECT id, wid FROM abr_windows w JOIN abr_events e
                |ON e.ts >= w.from_ts AND e.ts < w.to_ts""".stripMargin
    val expected = rows(spark.sql(sql))
    withRule {
      val df = spark.sql(sql)
      assert(rows(df) === expected)
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
    }
  }

  test("stands down when an equi-conjunct already exists, when disabled, " +
      "and when a conf value is malformed") {
    // equi key present: Spark plans a hash join on its own; a bin
    // explosion would only add cost
    val eq = events.withColumn("k", col("id") % 2)
    val wq = windows.withColumn("k", lit(1L))
    eq.createOrReplaceTempView("abr_events_k")
    wq.createOrReplaceTempView("abr_windows_k")
    val sql = """SELECT id, wid FROM abr_events_k e JOIN abr_windows_k w
                |ON e.k = w.k AND e.ts >= w.from_ts AND e.ts < w.to_ts""".stripMargin
    val expected = rows(spark.sql(sql))
    withRule {
      val df = spark.sql(sql)
      assert(!df.queryExecution.executedPlan.toString.contains("Generate"),
        "rule must not fire on an existing equi-join")
      assert(rows(df) === expected)
      spark.conf.set("spark.graft.binRangeJoin.enabled", "false")
      try {
        val off = spark.sql(rangeSql).queryExecution.executedPlan.toString
        assert(off.contains("BroadcastNestedLoopJoin") ||
          off.contains("CartesianProduct"), "disabled rule must not rewrite")
      } finally spark.conf.unset("spark.graft.binRangeJoin.enabled")
      // malformed conf: the rule stands down instead of failing the query
      for ((key, bad) <- Seq(
          "spark.graft.binRangeJoin.binSeconds" -> "not-a-number",
          "spark.graft.binRangeJoin.binSeconds" -> "-60",
          "spark.graft.binRangeJoin.maxBinsPerRow" -> "oops",
          "spark.graft.binRangeJoin.maxBinsPerRow" -> "0")) {
        spark.conf.set(key, bad)
        try {
          val df2 = spark.sql(rangeSql)
          assert(rows(df2) === rows(spark.sql(rangeSql)))
          assert(!df2.queryExecution.executedPlan.toString.contains("Generate"),
            s"$key=$bad must stand the rule down")
        } finally spark.conf.unset(key)
      }
    }
  }

  test("strict-lower and inclusive-upper bound spellings are rewritten " +
      "with correct boundary semantics") {
    // ts > lo AND ts <= hi: a BETWEEN-ish shape. id=3 (== w1.from) now
    // excluded, id=5 (== w1.to) now included.
    val sql = """SELECT id, wid FROM abr_events e JOIN abr_windows w
                |ON e.ts > w.from_ts AND e.ts <= w.to_ts""".stripMargin
    val expected = rows(spark.sql(sql))
    assert(!expected.contains((3L, "w1")) && expected.contains((5L, "w1")))
    withRule {
      val df = spark.sql(sql)
      assert(rows(df) === expected)
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"strict/inclusive combo:\n$plan")
    }
    // fully inclusive [lo, hi]: zero-length w3 [02:00, 02:00] matches
    // id=5 exactly — the explosion must reach bin(hi) and the validity
    // filter must be lo <= hi, or this row silently vanishes
    val sqlIncl = """SELECT id, wid FROM abr_events e JOIN abr_windows w
                    |ON e.ts >= w.from_ts AND e.ts <= w.to_ts""".stripMargin
    val expectedIncl = rows(spark.sql(sqlIncl))
    assert(expectedIncl.contains((5L, "w3")) &&
      expectedIncl.contains((3L, "w1")) && expectedIncl.contains((5L, "w1")))
    withRule {
      val df = spark.sql(sqlIncl)
      assert(rows(df) === expectedIncl)
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"inclusive combo:\n$plan")
    }
  }

  test("interval-overlap predicate is rewritten, row-identical, " +
      "exactly-once — all four strictness combinations") {
    windows.select(col("wid").as("aid"), col("from_ts").as("a_from"),
        col("to_ts").as("a_to"))
      .createOrReplaceTempView("abr_a")
    windows.select(col("wid").as("bid"), col("from_ts").as("b_from"),
        col("to_ts").as("b_to"))
      .createOrReplaceTempView("abr_b")
    // strict-strict first: the LITERAL predicate keeps degenerate
    // intervals the set-overlap contract would drop — an empty [x, x)
    // strictly inside the other side (w3-in-w2), and even an INVERTED
    // interval whose swapped bounds both clear the other side's
    // (w4-vs-w5: 03:00 < 04:00 and 00:00 < 01:00)
    val strictSql = """SELECT aid, bid FROM abr_a JOIN abr_b
                      |ON a_from < b_to AND b_from < a_to""".stripMargin
    val strictRows = spark.sql(strictSql).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(strictRows.contains(("w1", "w2"))) // real overlap present
    assert(strictRows.contains(("w2", "w3")) && strictRows.contains(("w3", "w2")))
    assert(strictRows.contains(("w4", "w5")) && strictRows.contains(("w5", "w4")))
    // all four strictness spellings: <=/< per conjunct independently.
    // Closed intervals add boundary-touch pairs (w1.to == w3.from, so
    // w1-w3 appears exactly when the conjunct bounding each side is
    // inclusive) — row parity with the naive join proves each side's
    // last-bin arithmetic honors ITS conjunct's strictness.
    for ((op1, op2) <- Seq(("<", "<"), ("<", "<="), ("<=", "<"), ("<=", "<="))) {
      val sql = s"""SELECT aid, bid FROM abr_a JOIN abr_b
                   |ON a_from $op1 b_to AND b_from $op2 a_to""".stripMargin
      val expected = spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      withRule {
        val df = spark.sql(sql)
        assert(df.collect().map(r => (r.getString(0), r.getString(1)))
          .toSeq.sorted === expected, s"combo ($op1, $op2)")
        val plan = finalPlan(df)
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"overlap shape ($op1, $op2):\n$plan")
      }
    }
    // the closed spelling picks up the touching pair the half-open one
    // excludes (w1.to == w3.from == 02:00)
    val closed = """SELECT aid, bid FROM abr_a JOIN abr_b
                   |ON a_from <= b_to AND b_from <= a_to""".stripMargin
    val closedRows = spark.sql(closed).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(closedRows.contains(("w1", "w3")) && closedRows.contains(("w3", "w1")))
    assert(!strictRows.contains(("w1", "w3")))
  }

  test("degenerate strict containment (lo < ts AND ts < hi) takes the " +
      "POINT rewrite, not the overlap one") {
    val sql = """SELECT id, wid FROM abr_events e JOIN abr_windows w
                |ON w.from_ts < e.ts AND e.ts < w.to_ts""".stripMargin
    val expected = rows(spark.sql(sql))
    assert(expected.nonEmpty && !expected.contains((3L, "w1"))) // lo strict
    withRule {
      val df = spark.sql(sql)
      assert(rows(df) === expected)
      val plan = finalPlan(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      // one Generate (interval side), not two — the overlap matcher must
      // not claim this shape (its from<to filter would empty the result)
      assert(plan.split("Generate").length - 1 === 1, s"plan:\n$plan")
    }
  }

  test("explosion cap: over-cap intervals take the residual branch, " +
      "rows stay identical, open-ended bounds don't explode") {
    // cap=2 forces w2 (3 bins) and w5 (4 bins) through the residual
    // nested loop while w1 (1 bin) stays binned — parity across the split
    val expected = rows(spark.sql(rangeSql))
    withRule {
      spark.conf.set("spark.graft.binRangeJoin.maxBinsPerRow", "2")
      try {
        val df = spark.sql(rangeSql)
        assert(rows(df) === expected, "residual split must not change rows")
        val plan = finalPlan(df)
        assert(plan.contains("Generate"), s"binned branch missing:\n$plan")
        assert(plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct"),
          s"populated residual branch must appear in the final plan:\n$plan")
      } finally spark.conf.unset("spark.graft.binRangeJoin.maxBinsPerRow")
      // the OOM case the cap exists for: an SCD2-style open-ended upper
      // bound (year 9999 ≈ 70M hourly bins) must NOT be exploded — at
      // the default cap it rides the residual and the query completes
      val wOpen = windows.union(Seq(
        ("w6", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))).toDF())
      wOpen.createOrReplaceTempView("abr_windows_open")
      val sqlOpen = """SELECT id, wid FROM abr_events e JOIN abr_windows_open w
                      |ON e.ts >= w.from_ts AND e.ts < w.to_ts""".stripMargin
      val expOpen = rows(spark.sql(sqlOpen))
      assert(expOpen.count(_._2 == "w6") === events.count())
      val df = spark.sql(sqlOpen)
      assert(rows(df) === expOpen)
      assert(finalPlan(df).contains("Generate"))
    }
  }

  test("rule result matches the library operator exactly") {
    val expected = graft.operators.RangeJoin.binnedRangeJoin(
        events, "ts", windows, "from_ts", "to_ts", binSeconds = 3600)
      .select("id", "wid")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    withRule { assert(rows(spark.sql(rangeSql)) === expected) }
  }

  test("seeded fuzz: random events x windows (null bounds, zero-length, " +
      "inverted, sub-bin and multi-bin durations) stay row-identical to " +
      "the naive join under every spelling, uncapped and capped") {
    // the hand-built fixtures pin each edge case once; this sweeps the
    // cross product of them at random, INCLUDING null timestamps and
    // null bounds (claimed handled in the rule scaladoc — a null bin
    // must never equi-match, and the residual filters must drop null
    // counts — but not otherwise driven by a spec row)
    val rnd = new scala.util.Random(42)
    val base = ts("2024-03-01 00:00:00").getTime
    def rts(): Timestamp = // 10-day span, second granularity + odd millis
      new Timestamp(base + rnd.nextInt(240 * 3600) * 1000L + rnd.nextInt(1000))
    val evs = (1L to 300L)
      .map(i => (i, if (rnd.nextInt(20) == 0) None else Some(rts())))
      .toDF("id", "ts")
    val wins = (1 to 60).map { i =>
      val from = rts()
      val durSec = rnd.nextInt(5) match {
        case 0 => 0                            // zero-length
        case 1 => -rnd.nextInt(48 * 3600)      // inverted
        case _ => rnd.nextInt(96 * 3600)       // up to ~96 hourly bins
      }
      val to = new Timestamp(from.getTime + durSec * 1000L)
      (s"w$i", if (rnd.nextInt(25) == 0) None else Some(from),
        if (rnd.nextInt(25) == 0) None else Some(to))
    }.toDF("wid", "from_ts", "to_ts")
    evs.createOrReplaceTempView("abrf_events")
    wins.createOrReplaceTempView("abrf_windows")
    wins.select(col("wid").as("aid"), col("from_ts").as("a_from"),
      col("to_ts").as("a_to")).createOrReplaceTempView("abrf_a")
    wins.select(col("wid").as("bid"), col("from_ts").as("b_from"),
      col("to_ts").as("b_to")).createOrReplaceTempView("abrf_b")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def parity(sql: String, tag: String): Unit = {
      val expected = rowsOf(spark.sql(sql)) // rule off: the naive plan
      assert(expected.nonEmpty, s"$tag: degenerate fixture, nothing joined")
      withRule {
        assert(rowsOf(spark.sql(sql)) === expected, tag)
        spark.conf.set("spark.graft.binRangeJoin.maxBinsPerRow", "3")
        try assert(rowsOf(spark.sql(sql)) === expected, s"$tag capped")
        finally spark.conf.unset("spark.graft.binRangeJoin.maxBinsPerRow")
      }
    }
    for ((lo, hi) <- Seq((">=", "<"), (">", "<="), (">=", "<="), (">", "<")))
      parity(s"""SELECT id, wid FROM abrf_events e JOIN abrf_windows w
                |ON e.ts $lo w.from_ts AND e.ts $hi w.to_ts""".stripMargin,
        s"point ($lo, $hi)")
    for ((o1, o2) <- Seq(("<", "<"), ("<", "<="), ("<=", "<"), ("<=", "<=")))
      parity(s"""SELECT aid, bid FROM abrf_a JOIN abrf_b
                |ON a_from $o1 b_to AND b_from $o2 a_to""".stripMargin,
        s"overlap ($o1, $o2)")
  }
}
