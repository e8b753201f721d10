package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event-analytics operators: ordered conversion funnels and retention
 * cohorts — the dashboard workloads behind the reference's
 * daily-trend/insights rollups (`api/main.py:750-761`,
 * `dashboard.py:71-79`), generalized to the sequence-aware forms every
 * product-analytics engine ships.
 *
 * Scale shape (both operators):
 *  - everything partitions by the user key; ONE hash Exchange feeds all
 *    the per-user windows (the funnel chains N stage computations over
 *    that single Exchange rather than N self-joins);
 *  - outputs collapse to per-user rows before the final tiny aggregate,
 *    so nothing user-level crosses the wire twice;
 *  - a power user contributes one partition row-group, not a crossJoin
 *    blowup — skew degrades one task, never the plan.
 */
object EventAnalytics {

  /**
   * Ordered funnel with per-step conversion windows: stage i counts a
   * user when their FIRST stage-i event falls strictly after the user's
   * qualifying stage-(i-1) time and within `windowExpr` of it (classic
   * "view → click → purchase within 24h of each step").
   *
   * Per-user stage times are chained analytic minima over one user
   * partitioning; returns (stage, users) with stages labeled
   * `stage<i>_<type>` in order.
   */
  def funnel(events: DataFrame, user: Column, ts: Column, typ: Column,
             stages: Seq[String], windowExpr: String = "INTERVAL 24 HOURS")
  : DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val byUser = Window.partitionBy(col("_u"))
    val base = events.select(user.as("_u"), ts.as("_ts"), typ.as("_ty"))
    val withStages = stages.zipWithIndex.foldLeft(base) {
      case (df, (st, i)) =>
        val qualifies =
          if (i == 0) col("_ty") === st
          else col("_ty") === st &&
            col("_ts") > col(s"_t${i - 1}") &&
            col("_ts") <= col(s"_t${i - 1}") + expr(windowExpr)
        df.withColumn(s"_t$i",
          min(when(qualifies, col("_ts"))).over(byUser))
    }
    val stageAggs = stages.indices.map(i => max(col(s"_t$i")).as(s"_t$i"))
    val perUser = withStages
      .groupBy("_u")
      .agg(stageAggs.head, stageAggs.tail: _*)
    // coalesce: a global agg over ZERO users yields null sums, where the
    // natural count(*) reading (and the SQL oracle) is 0 — and a null
    // `users` would NPE callers reading it as Long
    val countAggs = stages.indices.map(i =>
      coalesce(sum(col(s"_t$i").isNotNull.cast("long")), lit(0L)).as(s"_c$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(s"stage${i + 1}_$st").as("stage"), col(s"_c$i").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.users").as("users"))
  }

  /**
   * Retention cohorts: cohort = date of the user's first `anchorType`
   * event; a (cohort, offset) cell counts users with an `anchorType`
   * event exactly `offset` `grain`s after their cohort date. Returns
   * (cohort, offset, active_users) for offsets in [0, maxOffset].
   */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column,
                       typ: Column, anchorType: String,
                       maxOffset: Int = 14, grain: String = "day")
  : DataFrame = {
    val anchored = events.filter(typ === anchorType)
      .select(user.as("_u"), ts.as("_ts"))
    val first = anchored.groupBy("_u")
      .agg(to_date(min(col("_ts"))).as("cohort"))
    anchored.join(first, "_u")
      .select(col("_u"), col("cohort"),
        (grain match {
          case "day" => datediff(to_date(col("_ts")), col("cohort"))
          case "week" => floor(datediff(to_date(col("_ts")), col("cohort")) / 7)
          case g => throw new IllegalArgumentException(s"unsupported grain: $g")
        }).cast("int").as("offset"))
      .filter(col("offset") <= maxOffset)
      .distinct()
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("active_users"))
  }
}
