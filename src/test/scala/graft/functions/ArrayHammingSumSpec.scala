package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bit-equivalence of the [[ArrayHammingSum]] codegen kernel with the
 * `aggregate(zip_with(a,b,(x,y)=>bit_count(x^y).cast(long)), 0L, +)`
 * HOF form it replaced in `SimilaritySearch.hammingDistance` (r17
 * optimization). Integer arithmetic — exact by construction; the spec
 * pins null arrays, null elements, length mismatches, and the packed
 * sign-code shape (1–4 words).
 */
class ArrayHammingSumSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b,
      (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), _ + _)

  private lazy val rnd = new scala.util.Random(53)

  test("packed words: kernel == HOF incl. nulls and length mismatches") {
    val rows = (0 until 400).map { i =>
      def arr(n: Int) =
        if (rnd.nextInt(40) == 0) null
        else (0 until n).map { _ =>
          if (rnd.nextInt(50) == 0) null
          else java.lang.Long.valueOf(rnd.nextLong())
        }
      val la = rnd.nextInt(5)
      val lb = if (rnd.nextInt(4) == 0) rnd.nextInt(5) else la
      (i.toLong, arr(la), arr(lb))
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        graft.operators.SimilaritySearch.hammingDistance(
          col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .filter(!(col("k") <=> col("h")))
    assert(bad.count() === 0)
  }

  test("the binary serving shape: 64-d sign codes, distance == " +
      "popcount of xor, self-distance 0") {
    val d = 64
    val df = (0 until 100).map { i =>
      (i.toLong, (0 until d).map(_ => rnd.nextGaussian()))
    }.toDF("id", "v")
    val codes = df.select(col("id"),
      graft.operators.SimilaritySearch.binarySignCode(col("v"), d).as("c"))
    val pairs = codes.alias("x").crossJoin(codes.alias("y"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"),
        col("x.c").as("ca"), col("y.c").as("cb"))
    val bad = pairs.select(col("ida"), col("idb"),
        graft.operators.SimilaritySearch.hammingDistance(
          col("ca"), col("cb")).as("k"),
        hof(col("ca"), col("cb")).as("h"))
      .filter(!(col("k") <=> col("h")) ||
        (col("ida") === col("idb") && col("k") =!= 0))
    assert(bad.count() === 0)
  }
}
