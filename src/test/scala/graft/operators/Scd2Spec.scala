package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Long, Long, String)*) =
    rows.toDF("user", "t", "eid", "state")
      .select(col("user"), timestamp_seconds(col("t")).as("ts"),
        col("eid"), col("state"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("key", "state", "valid_from", "valid_to", "is_current")
    .collect()
    .map(r => (r.getString(0), r.getString(1),
      Option(r.getTimestamp(2)).map(_.getTime),
      Option(r.getTimestamp(3)).map(_.getTime), r.getBoolean(4)))
    .toSet

  private def buildAll(df: org.apache.spark.sql.DataFrame) =
    Scd2.build(df, col("user"), col("ts"), col("eid"), col("state"))

  // the merge ≡ rebuild identity across every path: untouched key (u0),
  // same-state continuation (u1: open 'a' + delta 'a','b'), plain change
  // (u2), key new in the delta (u3)
  test("merge(hist ≤ hwm, delta > hwm) equals a full rebuild") {
    val all = ev(
      ("u0", 10, 1, "a"), ("u0", 20, 2, "b"),            // untouched
      ("u1", 10, 3, "a"), ("u1", 30, 4, "a"),
      ("u1", 110, 5, "a"), ("u1", 120, 6, "b"),          // continuation then change
      ("u2", 10, 7, "x"), ("u2", 130, 8, "y"),           // change in delta
      ("u3", 140, 9, "z"), ("u3", 150, 10, "z"))         // new key
    val hwm = 100L
    val hist = buildAll(all.filter(col("t") <= hwm))
    val merged = Scd2.merge(hist, all.filter(col("t") > hwm),
      col("user"), col("ts"), col("eid"), col("state"))
    assert(rows(merged) === rows(buildAll(all)))
    // the same-state continuation did NOT open a new interval
    assert(merged.filter(col("key") === "u1").count() === 2)
  }

  test("merge with an empty delta returns the history unchanged") {
    val all = ev(("u0", 10, 1, "a"), ("u0", 20, 2, "b"))
    val hist = buildAll(all)
    val merged = Scd2.merge(hist, all.filter(col("t") > 1000),
      col("user"), col("ts"), col("eid"), col("state"))
    assert(rows(merged) === rows(hist))
  }

  test("merge closes the open interval at the first real change ts " +
      "and leaves closed intervals untouched") {
    val all = ev(
      ("u1", 10, 1, "a"), ("u1", 50, 2, "b"),  // closed [10,50) + open b
      ("u1", 200, 3, "c"))                     // delta change at 200
    val hist = buildAll(all.filter(col("t") <= 100))
    val merged = Scd2.merge(hist, all.filter(col("t") > 100),
      col("user"), col("ts"), col("eid"), col("state"))
    val byState = merged.collect()
      .map(r => r.getAs[String]("state") ->
        (Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.getTime),
          r.getAs[Boolean]("is_current"))).toMap
    assert(byState("a") === (Some(50000L), false))   // untouched closed
    assert(byState("b") === (Some(200000L), false))  // closed at the change
    assert(byState("c") === (None, true))            // new current
  }

  test("merge(validate = true) fails loudly on a late delta and " +
      "passes a conforming one") {
    val all = ev(
      ("u1", 10, 1, "a"), ("u1", 50, 2, "b"),  // open interval from 50
      ("u2", 10, 3, "x"))
    val hist = buildAll(all)
    // late: ts 30 <= u1's open valid_from 50 → corrupt-interval input
    val late = ev(("u1", 30, 9, "c"))
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(hist, late, col("user"), col("ts"), col("eid"),
        col("state"), validate = true)
    }
    assert(e.getMessage.contains("strictly-later"))
    assert(e.getMessage.contains("u1"))
    // conforming delta (all ts past every open valid_from) passes and
    // still equals the unvalidated merge
    val ok = ev(("u1", 200, 10, "c"), ("u2", 210, 11, "y"))
    val validated = Scd2.merge(hist, ok, col("user"), col("ts"),
      col("eid"), col("state"), validate = true)
    val plain = Scd2.merge(hist, ok, col("user"), col("ts"),
      col("eid"), col("state"))
    assert(rows(validated) === rows(plain))
  }

  test("build on the events table matches the q86 inline window formulation") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val viaOp = Scd2.build(e, col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val inline = e
      .select(col("user_id").as("key"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("_prev", lag(col("state"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts"), col("event_id"))))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts"), col("event_id"))))
      .select(col("key"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
    assert(viaOp.count() > 0)
    assert(viaOp.exceptAll(inline).count() === 0)
    assert(inline.exceptAll(viaOp).count() === 0)
  }
}
