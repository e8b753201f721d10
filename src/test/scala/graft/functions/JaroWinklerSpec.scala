package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Golden values computed by executing the reference scalar
 * (reference: src/ml/entity_resolution.py:198-252) directly — the expression
 * must reproduce them bit-for-bit.
 */
class JaroWinklerSpec extends SparkSpec {

  val goldens: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("acme corporation", "acme corp", 0.9125),
    ("hello", "hello", 1.0),
    ("", "x", 0.0),
    ("abc", "xyz", 0.0),
    ("global tech", "global tech systems", 0.9157894736842105),
    ("Customer#000000001", "Customer#000000010", 0.9888888888888889),
    ("a", "ab", 0.8500000000000001))

  test("scalar kernel matches reference goldens exactly") {
    goldens.foreach { case (a, b, want) =>
      assert(JaroWinkler.compute(a, b) == want, s"jw($a, $b)")
    }
  }

  test("expression evaluates through the DataFrame API (codegen path)") {
    import spark.implicits._
    val df = goldens.toDF("a", "b", "want")
    val got = df.select(
      TextFunctions.jaroWinkler(col("a"), col("b")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null input → 0.0 via TextFunctions wrapper (reference None→0.0)") {
    import spark.implicits._
    val df = Seq(("x", Option.empty[String])).toDF("a", "b")
    val v = df.select(TextFunctions.jaroWinkler(col("a"), col("b"))).head.getDouble(0)
    assert(v == 0.0)
  }

  test("property: symmetric, in [0,1], identity = 1 (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (0 until rnd.nextInt(24)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 2000).foreach { _ =>
      val a = word(); val b = word()
      val ab = JaroWinkler.compute(a, b)
      val ba = JaroWinkler.compute(b, a)
      assert(math.abs(ab - ba) < 1e-12, s"symmetry: $a / $b")
      assert(ab >= 0.0 && ab <= 1.0, s"range: $a / $b → $ab")
      if (a.nonEmpty) assert(JaroWinkler.compute(a, a) == 1.0)
    }
  }

  test("sql registration: jaro_winkler usable from spark.sql") {
    JaroWinkler.register(spark)
    val v = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS v").head.getDouble(0)
    assert(v == 0.9611111111111111)
  }
}
