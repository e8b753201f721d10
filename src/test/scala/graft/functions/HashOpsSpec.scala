package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

import graft.SparkSpec

/**
 * Equivalence properties for the native hash/shingle/minhash expressions:
 * each custom codegen kernel must produce bit-identical values to the
 * composed built-in formulation it replaced (which is also what the
 * DuckDB oracles replay). Fuzz corpus includes unicode, empty strings,
 * short-of-window texts, and repeated tokens.
 */
class HashOpsSpec extends SparkSpec {
  import spark.implicits._

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftShim.column(e)
  private def x(col: org.apache.spark.sql.Column) = GraftShim.expr(col)

  private lazy val fuzz = {
    val rnd = new scala.util.Random(7)
    val frags = Seq("the quick", "brown  fox", "jumps", "über", "naïve",
      "日本語テキスト", "a", "", "  ", "tab\tsep", "line\nbreak",
      "dup dup dup", "x y z w v", "!@#$%", "caFE", "0123456789")
    val rows = (0 until 200).map { _ =>
      (0 until rnd.nextInt(6)).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(" ")
    } ++ Seq("", "ab", "abcd", "abcde", "abcdef", "ü", "日本")
    rows.toDF("s").cache()
  }

  test("Md5Prefix32 == conv(substring(md5(s),1,8),16,10)") {
    val bad = fuzz.select(
        c(Md5Prefix32(x(col("s")))).as("fast"),
        conv(substring(md5(col("s").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("Md5Lanes4 == conv(substring(md5(s), 1+8j, 8), 16, 10) per lane") {
    val bad = fuzz.select(
        c(Md5Lanes4(x(col("s")))).as("fast"),
        array((0 to 3).map(j =>
          conv(substring(md5(col("s").cast("binary")), 1 + 8 * j, 8), 16, 10)
            .cast("long")): _*).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("ShingleHashes == md5-prefix of every charShingle (as sets)") {
    val viaComposed = array_sort(array_distinct(transform(
      TextFunctions.charShingles(lower(col("s")), 5),
      sh => conv(substring(md5(sh.cast("binary")), 1, 8), 16, 10).cast("long"))))
    val viaKernel = array_sort(array_distinct(
      c(ShingleHashes(x(lower(col("s"))), 5))))
    val bad = fuzz.select(viaKernel.as("fast"), viaComposed.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("WordNgramHashes == md5-prefix of every wordNgram (as sets)") {
    val viaComposed = array_sort(array_distinct(transform(
      TextFunctions.wordNgrams(col("s"), 3),
      g => conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long"))))
    val viaKernel = array_sort(array_distinct(
      c(WordNgramHashes(x(lower(col("s"))), 3))))
    val bad = fuzz.select(viaKernel.as("fast"), viaComposed.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("MinhashSignature == explode + min-aggregate formulation") {
    val numHashes = 8
    // the operator excludes empty text BY CONTRACT (every dedup oracle
    // filters len(text) > 0; '' hashes to one shingle and would make
    // all empty docs mutual near-dups) — compare on the same domain,
    // and pin the exclusion itself below
    val withId = fuzz.filter(length(col("s")) > 0)
      .withColumn("id", monotonically_increasing_id())
    // reference: explode hashed shingles, take affine minima per doc
    val exploded = withId.select(col("id"),
      explode(c(ShingleHashes(x(lower(col("s"))), 5))).as("h"))
    val aggs = (0 until numHashes).map(i =>
      min(graft.operators.Dedup.permute(col("h"), i)).as(s"_m$i"))
    val ref = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("ref"))
    val fast = graft.operators.Dedup.minhashSignatures(
      withId, col("id"), col("s"), 5, numHashes)
      .withColumnRenamed("sig", "fast")
      .withColumnRenamed("id", "id2")
    val bad = ref.join(fast, col("id") === col("id2"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
    assert(ref.count() === fast.count())
    // the exclusion contract: empty text produces NO signature row
    val withEmpty = fuzz.withColumn("id", monotonically_increasing_id())
    assert(graft.operators.Dedup.minhashSignatures(
        withEmpty, col("id"), col("s"), 5, numHashes).count()
      === withEmpty.filter(length(col("s")) > 0).count())
  }

  test("MinhashDocState: hs is sorted distinct shingle hashes; sig matches") {
    val st = c(MinhashDocState(x(lower(col("s"))), 5, 8)).as("st")
    val refHs = array_sort(array_distinct(c(ShingleHashes(x(lower(col("s"))), 5))))
    val refSig = c(MinhashSignature(x(lower(col("s"))), 5, 8))
    val bad = fuzz.select(st, refHs.as("ref_hs"), refSig.as("ref_sig"))
      .filter(col("st.hs") =!= col("ref_hs") ||
        col("st.sz") =!= size(col("ref_hs")) ||
        col("st.sig") =!= col("ref_sig"))
    assert(bad.count() === 0)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { _ =>
      val a = (0 until rnd.nextInt(20)).map(_ => rnd.nextInt(30).toLong)
        .distinct.sorted
      val b = (0 until rnd.nextInt(20)).map(_ => rnd.nextInt(30).toLong)
        .distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        c(SortedIntersectCount(x(col("a")), x(col("b")))).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("NormalizedName == nameNormalize / nameTokens composed forms") {
    val rnd = new scala.util.Random(17)
    val frags = Seq("acme", "corp", "inc", "intl", "&", "the", "tech-sys",
      "co.", "GLOBAL", "Gmbh", "s.a.", "x", "", "  ", "a&b", "123",
      "Ünïcode", "svcs", "mfg", "ab")
    val names = (0 until 300).map { _ =>
      (0 until rnd.nextInt(6)).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(" ")
    }.toDF("s")
    val nn = c(NormalizedName(x(col("s"))))
    val bad = names.select(
        coalesce(nn.getField("norm"), lit("")).as("fast_norm"),
        nn.getField("tokens").as("fast_toks"),
        TextFunctions.nameNormalize(col("s")).as("ref_norm"),
        TextFunctions.nameTokens(col("s")).as("ref_toks"))
      .filter(col("fast_norm") =!= col("ref_norm") ||
        col("fast_toks") =!= col("ref_toks"))
    assert(bad.count() === 0)
  }

  test("PositionalEqCount == zip_with + aggregate count") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { _ =>
      val n = rnd.nextInt(16)
      val a = (0 until n).map(_ => rnd.nextInt(5).toLong)
      val b = (0 until n).map(_ => rnd.nextInt(5).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val ref = aggregate(
      zip_with(col("a"), col("b"), (p, q) => (p === q).cast("int")),
      lit(0), (acc, v) => acc + v)
    val bad = df.select(
        c(PositionalEqCount(x(col("a")), x(col("b")))).as("fast"), ref.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }
}
