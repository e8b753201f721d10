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

  test("property: range path ≡ window path for ANY generated frame " +
      "(duplicate values, nulls, skewed group sizes, negative values)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val frameGen = Gen.listOfN(400, for {
      g <- Gen.frequency(8 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c"))
      v <- Gen.frequency(
        9 -> Gen.choose(-50, 50).map(i => Some(i / 7.0)),  // heavy ties
        1 -> Gen.const(Option.empty[Double]))
    } yield (g, v))
    (0 until 3).foreach { i =>
      val rows = frameGen(Gen.Parameters.default, Seed(42L + i)).get
        .zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
      val df = rows.toDF("g", "v", "id")
      def rowsOf(giant: Boolean) =
        RobustStats.rankedByGroup(df, col("g"), col("v"), col("id"), giant)
          .collect().map(_.toSeq).toSet
      assert(rowsOf(true) === rowsOf(false), s"case $i diverged")
    }
  }

  test("property: rank-selection percentile (q78 arithmetic) equals a " +
      "direct percentile_disc reimplementation for any value multiset") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // percentile_disc(p): smallest value with cume_dist >= p, i.e. the
    // ceil(p*n)-th smallest — verified against an independent local
    // implementation computing cume_dist directly over the sorted list
    def directDisc(values: Seq[Double], p: Double): Double = {
      val sorted = values.sorted
      val n = sorted.size
      sorted.find { x =>
        sorted.count(_ <= x).toDouble / n >= p
      }.getOrElse(sorted.last)
    }
    val valsGen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 30).map(_ / 3.0))) // duplicates likely
    (0 until 5).foreach { i =>
      val values = valsGen(Gen.Parameters.default, Seed(7L + i)).get
      val df = values.zipWithIndex.map { case (v, id) => ("g", v, id.toLong) }
        .toDF("g", "v", "id")
      val ranked = RobustStats.rankedByGroup(df, col("g"), col("v"), col("id"))
      for ((a, b, p) <- Seq((1, 2, 0.5), (9, 10, 0.9), (99, 100, 0.99))) {
        val selected = ranked
          .filter(col("rn") === expr(s"($a * n + ${b - 1}) div $b"))
          .select("v").head.getDouble(0)
        assert(selected === directDisc(values, p),
          s"case $i p=$p: rank selection diverged from direct percentile_disc")
      }
    }
  }
}
