package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // group (1, "A", band 0-1000): 3 rows — suppressed at k=3? kept at 3, dropped at 4
    (1L, 1, "A", 100.0), (2L, 1, "A", 900.0), (3L, 1, "A", 500.0),
    // group (1, "B", band 0-1000): 1 row — always suppressed for k>1
    (4L, 1, "B", 50.0),
    // group (2, "A", band 1000-2000): 4 rows
    (5L, 2, "A", 1100.0), (6L, 2, "A", 1900.0),
    (7L, 2, "A", 1500.0), (8L, 2, "A", 1000.0),
    // negative balance: band -1000-0
    (9L, 3, "C", -1.0), (10L, 3, "C", -999.0)
  ).toDF("id", "nation", "seg", "bal")

  private def quasi(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("band", Privacy.bandLabel(col("bal"), 1000L))

  test("bandLabel: half-open 1000-wide bands, negative values handled") {
    val bands = quasi(rows).select("id", "band").as[(Long, String)]
      .collect().toMap
    assert(bands(1L) === "0-1000")
    assert(bands(8L) === "1000-2000") // boundary value starts its band
    assert(bands(9L) === "-1000-0")
  }

  test("kAnonymize keeps exactly the groups of size >= k, with evidence") {
    val out = Privacy.kAnonymize(quasi(rows), Seq("nation", "seg", "band"), 3)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 5L, 6L, 7L, 8L))
    val sizes = out.select("id", "group_size").as[(Long, Long)].collect().toMap
    assert(sizes(1L) === 3L && sizes(5L) === 4L)
    // k larger than every group suppresses everything
    assert(Privacy.kAnonymize(quasi(rows), Seq("nation", "seg", "band"), 5)
      .count() === 0L)
    // k=1 releases everything
    assert(Privacy.kAnonymize(quasi(rows), Seq("nation", "seg", "band"), 1)
      .count() === rows.count())
  }

  test("released rows always satisfy the k bound (self-audit)") {
    val out = Privacy.kAnonymize(quasi(rows), Seq("nation", "seg", "band"), 2)
    val recount = out.groupBy("nation", "seg", "band").count()
      .select("count").as[Long].collect()
    assert(recount.nonEmpty && recount.forall(_ >= 2L))
  }

  test("null quasi values form their own group and are released at >= k " +
      "(null-safe join — a plain equi-join would silently suppress them)") {
    val withNulls = Seq(
      (1L, Some("A")), (2L, Some("A")), (3L, None),
      (4L, None), (5L, None), (6L, Some("B"))
    ).toDF("id", "seg")
    val out = Privacy.kAnonymize(withNulls, Seq("seg"), 2)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L)) // null group (3 rows) released
    assert(out.filter(col("seg").isNull).select("group_size")
      .as[Long].collect().toSet === Set(3L))
  }

  test("kAnonymityProfile reports every combination with its verdict") {
    val prof = Privacy.kAnonymityProfile(quasi(rows),
      Seq("nation", "seg", "band"), 3).collect()
    assert(prof.length === 4)
    val byKey = prof.map(r => (r.getAs[Int]("nation"), r.getAs[String]("seg"))
      -> (r.getAs[Long]("group_size"), r.getAs[Boolean]("released"))).toMap
    assert(byKey((1, "A")) === ((3L, true)))
    assert(byKey((1, "B")) === ((1L, false)))
    assert(byKey((2, "A")) === ((4L, true)))
    assert(byKey((3, "C")) === ((2L, false)))
  }
}
