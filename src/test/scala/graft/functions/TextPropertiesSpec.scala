package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Property tests for the text primitives (SURVEY §5: properties the
 * reference implies but never asserts). One DataFrame of seeded fuzz
 * strings, both sides of each property computed in one pass.
 */
class TextPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // seeded fuzz: words, punctuated company-ish names, suffixes, abbrevs
  private lazy val fuzz = {
    val rnd = new scala.util.Random(42)
    val frags = Seq("acme", "corp", "inc", "intl", "&", "the", "tech-sys",
      "co.", "GLOBAL", "Gmbh", "s.a.", "x", "", "  ", "a&b", "123")
    val rows = (0 until 300).map { _ =>
      (0 until rnd.nextInt(5)).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(" ")
    }
    rows.toDF("s").cache()
  }

  test("nameNormalize is idempotent") {
    val bad = fuzz.select(
        TextFunctions.nameNormalize(col("s")).as("once"))
      .select(col("once"),
        TextFunctions.nameNormalize(col("once")).as("twice"))
      .filter(col("once") =!= col("twice"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString(", "))
  }

  test("jaccardTokens is symmetric and in [0,1]; self-similarity 1 for non-empty") {
    val pairs = fuzz.select(col("s").as("a"))
      .crossJoin(fuzz.limit(20).select(col("s").as("b")))
    val t = (c: org.apache.spark.sql.Column) => TextFunctions.nameTokens(c)
    val checked = pairs.select(
      TextFunctions.jaccardTokens(t(col("a")), t(col("b"))).as("ab"),
      TextFunctions.jaccardTokens(t(col("b")), t(col("a"))).as("ba"),
      TextFunctions.jaccardTokens(t(col("a")), t(col("a"))).as("aa"),
      size(t(col("a"))).as("na"))
    assert(checked.filter(col("ab") =!= col("ba")).isEmpty, "symmetry")
    assert(checked.filter(col("ab") < 0 || col("ab") > 1).isEmpty, "range")
    assert(checked.filter(col("na") > 0 && col("aa") =!= 1.0).isEmpty,
      "self-similarity")
  }

  test("levenshteinSim: identity 1 for non-empty, range [0,1]") {
    val checked = fuzz.filter(length(trim(col("s"))) > 0).select(
      TextFunctions.levenshteinSim(col("s"), col("s")).as("self"),
      TextFunctions.levenshteinSim(col("s"), reverse(col("s"))).as("rev"))
    assert(checked.filter(col("self") =!= 1.0).isEmpty)
    assert(checked.filter(col("rev") < 0 || col("rev") > 1).isEmpty)
  }

  test("blockingKey is a pure function of its normalized inputs (stable)") {
    val k1 = fuzz.select(TextFunctions.blockingKey(col("s"), lit("Germany")).as("k"))
    val k2 = fuzz.select(TextFunctions.blockingKey(col("s"), lit("Germany")).as("k"))
    assert(k1.exceptAll(k2).isEmpty && k2.exceptAll(k1).isEmpty)
  }
}
