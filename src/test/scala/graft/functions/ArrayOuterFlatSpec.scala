package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bit-equivalence of the [[ArrayOuterFlat]] codegen kernel with the
 * `flatten(transform(a, h => transform(b, x => h*x)))` HOF form it
 * replaced in the OPQ Procrustes scatter
 * (`SimilaritySearch.opqTrainWithFlat`, r17 optimization). Each output
 * element is a single IEEE multiply, so `===` is exact; the spec pins
 * row-major order, null arrays, null elements and the empty-array
 * edge.
 */
class ArrayOuterFlatSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    VectorFunctions.outerFlat(a, b)

  private def hof(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column) =
    flatten(transform(a, h => transform(b, x => h * x)))

  private lazy val rnd = new scala.util.Random(47)

  test("double arrays: kernel == HOF bit-for-bit incl. nulls, " +
      "mismatched lengths and empties") {
    val rows = (0 until 300).map { i =>
      def arr(n: Int) =
        if (rnd.nextInt(40) == 0) null
        else (0 until n).map { _ =>
          if (rnd.nextInt(50) == 0) null
          else java.lang.Double.valueOf(
            rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))
        }
      (i.toLong, arr(rnd.nextInt(10)), arr(rnd.nextInt(10)))
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        kernel(col("a"), col("b")).as("k"), hof(col("a"), col("b")).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }

  test("the OPQ scatter shape: 64-d x̂ against 64-d v, posexplode " +
      "positions and per-cell sums unchanged") {
    val d = 64
    val df = (0 until 50).map { i =>
      (i.toLong, (0 until d).map(_ => rnd.nextGaussian()),
        (0 until d).map(_ => rnd.nextGaussian()))
    }.toDF("id", "xhat", "v")
    val viaKernel = df.select(posexplode(kernel(col("xhat"), col("v"))))
      .groupBy("pos").agg(sum("col").as("c"))
    val viaHof = df.select(posexplode(hof(col("xhat"), col("v"))))
      .groupBy("pos").agg(sum("col").as("c"))
    assert(viaKernel.count() === d.toLong * d)
    val bad = viaKernel.alias("k")
      .join(viaHof.alias("h"), Seq("pos"), "full")
      .filter(!(col("k.c") <=> col("h.c")))
    assert(bad.count() === 0)
  }
}
