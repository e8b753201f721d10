package graft.ml

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropsCases, SparkSpec}

/** Property gates for the NewtonBoost SQL compiler and attribution
  * algebra under GENERATED models — the q193/q196 oracles pin two
  * frozen fixtures; these pin the compiler for ANY tree shape. Raw
  * ScalaCheck generators with fixed seeds; few, fat cases — each case
  * evaluates Spark queries. */
class NewtonBoostPropsSpec extends SparkSpec with PropsCases {

  private lazy val s = spark
  import s.implicits._

  private val Feats = Seq("f0", "f1", "f2")

  /** Random tree over 3 features: thresholds in the data range,
    * weights/values in [-2, 2], depth ≤ 3, optional missing-left. */
  private def nodeGen(depth: Int): Gen[NewtonBoost.Node] =
    if (depth == 0) Gen.choose(-2.0, 2.0).map(NewtonBoost.Leaf.apply)
    else Gen.frequency(
      2 -> Gen.choose(-2.0, 2.0).map(NewtonBoost.Leaf.apply),
      3 -> (for {
        f <- Gen.choose(0, Feats.size - 1)
        thr <- Gen.choose(-1.0, 1.0)
        dl <- Gen.oneOf(true, false)
        v <- Gen.choose(-2.0, 2.0)
        l <- nodeGen(depth - 1)
        r <- nodeGen(depth - 1)
      } yield NewtonBoost.Split(f, 0, thr, dl, v, l, r)))

  private val modelGen: Gen[NewtonBoost.Model] = for {
    nTrees <- Gen.choose(1, 3)
    trees <- Gen.listOfN(nTrees, nodeGen(3))
    lr <- Gen.oneOf(0.1, 0.3, 1.0)
  } yield NewtonBoost.Model(Feats, trees, lr, 0.5)

  // 40 rows with nulls interleaved — exercises both missing branches;
  // `rid` keys the row-PAIRED compare (sorted multisets would let a
  // permutation-compensated divergence slip)
  private lazy val frame = {
    val rows = (0 until 40).map { i =>
      def v(j: Int): Option[Double] =
        if ((i + j) % 7 == 0) None
        else Some(math.sin(i * 2.39996 + j) * 1.5)
      (i, v(0), v(1), v(2))
    }
    rows.toDF("rid", "f0", "f1", "f2").localCheckpoint(true)
  }

  test("marginSql ≡ margin Column bit-for-bit for any model") {
    frame.createOrReplaceTempView("nb_props_frame")
    cases(modelGen, 6).foreach { m =>
      val viaCol = frame.select(col("rid"), m.margin.as("v"))
        .orderBy("rid").collect().map(_.getDouble(1))
      val viaSql = spark.sql(
        s"SELECT rid, ${m.marginSql} AS v FROM nb_props_frame ORDER BY rid")
        .collect().map(_.getDouble(1))
      assert(viaCol.sameElements(viaSql),
        s"margin SQL/Column divergence for ${m.toJson.take(120)}")
    }
  }

  test("contributionSql ≡ contribution Column and the telescoping " +
      "identity holds for any model") {
    frame.createOrReplaceTempView("nb_props_frame2")
    cases(modelGen, 4).foreach { m =>
      Feats.indices.foreach { f =>
        val viaCol = frame.select(col("rid"), m.contribution(f).as("v"))
          .orderBy("rid").collect().map(_.getDouble(1))
        val viaSql = spark.sql(
          s"SELECT rid, ${m.contributionSql(f)} AS v " +
            "FROM nb_props_frame2 ORDER BY rid")
          .collect().map(_.getDouble(1))
        assert(viaCol.sameElements(viaSql),
          s"contribution($f) SQL/Column divergence")
      }
      val rebuilt = m.contributions.map(_._2).foldLeft(m.bias)(_ + _)
      val maxDiff = frame.select(abs(m.margin - rebuilt).as("d"))
        .agg(max(col("d"))).head.getDouble(0)
      assert(maxDiff < 1e-12, s"telescoping broken by $maxDiff")
    }
  }

  test("JSON roundtrip is the identity for any model") {
    cases(modelGen, 8).foreach { m =>
      assert(NewtonBoost.fromJson(m.toJson).toJson == m.toJson)
    }
  }

  test("pre-r14 JSON (no \"v\" key) loads with exact margins and a " +
      "still-telescoping attribution") {
    cases(modelGen, 3).foreach { m =>
      val legacy = m.toJson.replaceAll(""","v":[-0-9.E]+""", "")
      val back = NewtonBoost.fromJson(legacy)
      val paired = frame.select(col("rid"), m.margin.as("a"))
        .join(frame.select(col("rid"), back.margin.as("b")), "rid")
      assert(paired.filter(col("a") =!= col("b")).count() == 0,
        "legacy-loaded margins must be bit-identical")
      val rebuilt = back.contributions.map(_._2).foldLeft(back.bias)(_ + _)
      val maxDiff = frame.select(abs(back.margin - rebuilt).as("d"))
        .agg(max(col("d"))).head.getDouble(0)
      assert(maxDiff < 1e-12, s"legacy telescoping broken by $maxDiff")
    }
  }
}
