package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bit-equivalence of the [[ArraySqDist]] codegen kernel with the
 * `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, +)` HOF form it
 * replaced in `VectorFunctions.sqDist` (r17 optimization): the fuzz
 * corpus covers float and double element types, nulls at every level
 * (null array, null element), length mismatches, empty arrays, and
 * denormal-scale values. `===` on doubles here is intentional — the
 * kernel's contract is the SAME IEEE operation sequence, not "close".
 */
class ArraySqDistSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, x) => acc + x)

  private lazy val rnd = new scala.util.Random(41)

  private def randFloats(n: Int): Seq[java.lang.Float] =
    (0 until n).map { _ =>
      if (rnd.nextInt(40) == 0) null
      else java.lang.Float.valueOf(
        (rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat)
    }

  test("float arrays: kernel == HOF bit-for-bit incl. null elements " +
      "and length mismatches") {
    val rows = (0 until 400).map { i =>
      val la = rnd.nextInt(10)
      // mostly equal lengths (the real shape), some mismatched
      val lb = if (rnd.nextInt(4) == 0) rnd.nextInt(10) else la
      (i.toLong, randFloats(la), randFloats(lb))
    } ++ Seq((1000L, null, randFloats(4)), (1001L, randFloats(0), randFloats(0)))
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        graft.functions.VectorFunctions.sqDist(col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }

  test("double arrays: kernel == HOF bit-for-bit") {
    val rows = (0 until 400).map { i =>
      val n = rnd.nextInt(12)
      def arr() = (0 until n).map { _ =>
        if (rnd.nextInt(50) == 0) null
        else java.lang.Double.valueOf(
          rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4))
      }
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        graft.functions.VectorFunctions.sqDist(col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }

  test("kernel is exact on the PQ encode shape: slice of a 64-d float " +
      "vector against a double sub-centroid") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, (0 until 64).map(_ => rnd.nextGaussian().toFloat))
    }.toDF("id", "v")
    val cvs = (0 until 8).map(_ => rnd.nextGaussian())
    val cvsLit = array(cvs.map(lit): _*)
    val bad = vecs.select(
        graft.functions.VectorFunctions.sqDist(
          slice(col("v"), 17, 8), cvsLit).as("k"),
        hof(slice(col("v"), 17, 8), cvsLit).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }
}
