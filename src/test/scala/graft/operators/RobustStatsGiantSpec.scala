package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The giant-group selection path ([[RobustStats.rankedByGroup]]
  * `giantGroups = true`): a range-partitioned sort + zipWithIndex +
  * group-start offsets, so no single task ever holds a whole group. The
  * contract is ROW-IDENTITY with the default window path — same rn, same
  * n, same downstream winsorize/MAD numbers — proven here on a
  * constructed giant group that spans many range partitions. */
class RobustStatsGiantSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // one giant group (40k rows — hundreds of range partitions at the
  // spec's shuffle parallelism), two small ones, ties in v (v = i/7
  // collides), nulls to be excluded
  private lazy val frame = {
    val giant = (0L until 40000L).map(i => ("giant", Some((i % 701).toDouble), i))
    val smallA = (0L until 37L).map(i => ("a", Some((i % 5).toDouble), 100000L + i))
    val smallB = (0L until 11L).map(i => ("b", Some(i.toDouble), 200000L + i))
    val nulls = Seq(("giant", Option.empty[Double], 300000L), ("a", Option.empty[Double], 300001L))
    (giant ++ smallA ++ smallB ++ nulls).toDF("g", "v", "id")
  }

  test("rankedByGroup: range path is row-identical to the window path on a giant group") {
    val window = RobustStats.rankedByGroup(frame, col("g"), col("v"), col("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val range = RobustStats.rankedByGroup(frame, col("g"), col("v"), col("id"),
        giantGroups = true)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(range.size === 40048)            // 40000 + 37 + 11, nulls excluded
    assert(range === window)
  }

  test("winsorizedRollup: giantGroups=true matches the window path row-for-row") {
    val a = RobustStats.winsorizedRollup(frame, col("g"), col("v"), col("id"))
      .collect().map(_.toSeq).toSet
    val b = RobustStats.winsorizedRollup(frame, col("g"), col("v"), col("id"),
        giantGroups = true)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 3)
  }

  test("madAnomalies: giantGroups=true matches the window path row-for-row") {
    val a = RobustStats.madAnomalies(frame, col("g"), col("v"), col("id"))
      .collect().map(_.toSeq).toSet
    val b = RobustStats.madAnomalies(frame, col("g"), col("v"), col("id"),
        giantGroups = true)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 3)
  }
}
