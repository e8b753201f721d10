package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bit-equivalence of the [[ArrayMatVec]] codegen kernel with the nested
 * HOF form it replaced in `SimilaritySearch.rotated` (r17
 * optimization): `transform(sequence(0,d−1), i =>
 * aggregate(zip_with(element_at(rLit,i+1), v, (a,b)=>a*b.cast(double)),
 * 0.0, +))`. Same left-to-right fold per output dimension, so `===` on
 * the resulting doubles is the contract, not "close". Covers float and
 * double inputs, null arrays (the coalesce wrapper's array-of-nulls),
 * null elements and length mismatches (all-null output elements).
 */
class ArrayMatVecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rnd = new scala.util.Random(43)

  private def hofRotated(vecCol: org.apache.spark.sql.Column,
                         r: Seq[Seq[Double]], d: Int) = {
    val rLit = array(r.map(row => array(row.map(lit): _*)): _*)
    transform(sequence(lit(0), lit(d - 1)), i =>
      aggregate(zip_with(element_at(rLit, i + 1), vecCol,
        (a, b) => a * b.cast("double")), lit(0.0), _ + _))
  }

  private def mat(d: Int): Seq[Seq[Double]] =
    Seq.fill(d, d)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(5) - 2))

  test("double vectors: kernel == HOF bit-for-bit at d=8 and d=64") {
    Seq(8, 64).foreach { d =>
      val r = mat(d)
      val rows = (0 until 200).map { i =>
        (i.toLong, (0 until d).map { _ =>
          if (rnd.nextInt(60) == 0) null
          else java.lang.Double.valueOf(
            rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))
        })
      }
      val df = rows.toDF("id", "v")
      val bad = df.select(col("id"),
          graft.operators.SimilaritySearch.rotated(col("v"), r, d).as("k"),
          hofRotated(col("v"), r, d).as("h"))
        .filter(!(col("k") <=> col("h")))
      assert(bad.count() === 0, s"d=$d")
    }
  }

  test("float vectors, null arrays and length mismatches: kernel == HOF") {
    val d = 16
    val r = mat(d)
    val rows = (0 until 200).map { i =>
      // wrong lengths ~1/4 of the time; null array sometimes
      val len = if (rnd.nextInt(4) == 0) rnd.nextInt(2 * d) else d
      val v = if (rnd.nextInt(30) == 0) null
        else (0 until len).map { _ =>
          if (rnd.nextInt(60) == 0) null
          else java.lang.Float.valueOf(rnd.nextGaussian().toFloat)
        }
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    val bad = df.select(col("id"),
        graft.operators.SimilaritySearch.rotated(col("v"), r, d).as("k"),
        hofRotated(col("v"), r, d).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }

  test("the q210 shape: seeded orthogonal mixer over 64-d vectors") {
    val d = 64
    val g = breeze.linalg.DenseMatrix.fill(d, d)(rnd.nextGaussian())
    val q = breeze.linalg.qr(g).q
    val r = Seq.tabulate(d, d)((i, j) => q(i, j))
    val df = (0 until 100).map { i =>
      (i.toLong, (0 until d).map(_ => rnd.nextGaussian()))
    }.toDF("id", "v")
    val bad = df.select(
        graft.operators.SimilaritySearch.rotated(col("v"), r, d).as("k"),
        hofRotated(col("v"), r, d).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }
}
