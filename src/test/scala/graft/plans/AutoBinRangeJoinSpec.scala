package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule must (1) kill the nested-loop plan for the naive
  * SQL range join, (2) stay row-identical to it — boundaries, empty and
  * inverted intervals, duplicate matches included — and (3) stand down
  * for shapes Spark already plans well (existing equi-conjunct) or when
  * disabled by conf. Driven via `experimental.extraOptimizations` (the
  * already-built-session path; `GraftExtensions` injects the same rule
  * object at session build). */
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
    ("w4", ts("2024-01-01 03:00:00"), ts("2024-01-01 01:00:00"))  // inverted
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
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule must remove the nested loop:\n$plan")
      assert(plan.contains("Generate"), s"bin explosion missing:\n$plan")
      assert(rows(df) === expected)
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
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      assert(rows(df) === expected)
    }
  }

  test("stands down when an equi-conjunct already exists, and when disabled") {
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
    }
  }

  test("rule result matches the library operator exactly") {
    val expected = graft.operators.RangeJoin.binnedRangeJoin(
        events, "ts", windows, "from_ts", "to_ts", binSeconds = 3600)
      .select("id", "wid")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    withRule { assert(rows(spark.sql(rangeSql)) === expected) }
  }
}
