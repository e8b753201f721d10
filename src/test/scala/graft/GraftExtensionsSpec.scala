package graft

/** The extensions entry point exposes every kernel as a SQL function.
  * `registerAll` is exercised on the shared session (a fresh
  * `withExtensions` build would be silently ignored by getOrCreate when
  * a session already exists — the class path is the same injection list,
  * asserted below). */
class GraftExtensionsSpec extends SparkSpec {

  test("injection list covers the whole kernel surface") {
    assert(GraftExtensions.injections.map(_._1.funcName).toSet === Set(
      "jaro_winkler", "array_dot", "array_unit", "md5_prefix32", "md5_lanes4",
      "bpe_encode", "byte_level_words", "byte_level_encode",
      "shingle_hashes",
      "word_ngram_hashes", "minhash_signature", "minhash_doc_state",
      "sorted_intersect_count", "positional_eq_count", "normalized_name",
      "phrase_hits"))
  }

  test("all kernels are callable from pure SQL after registerAll") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  jaro_winkler('martha', 'marhta') AS jw,
        |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  md5_prefix32('abc') AS h32,
        |  md5_lanes4('abc') AS lanes,
        |  bpe_encode('the newest thing', 'e s;es t;t h;th e') AS bpe,
        |  byte_level_words('Hi there42') AS blw,
        |  byte_level_encode('Hi there42', 'Ġ t;Ġt h;Ġth e') AS ble,
        |  size(shingle_hashes('abcdefgh', 5)) AS n_shingles,
        |  size(word_ngram_hashes('a b c d', 3)) AS n_grams,
        |  size(minhash_signature('hello world docs', 5, 8)) AS sig_len,
        |  minhash_doc_state('hello world docs', 5, 8).sz AS hs_sz,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS inter,
        |  positional_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS poseq,
        |  normalized_name('Acme Corp Intl.').norm AS norm,
        |  phrase_hits('a hash  JOIN here', 'hash join;scan;here', 2) AS ph
        |""".stripMargin).head
    assert(math.abs(row.getAs[Double]("jw") - 0.9611111111111111) < 1e-12)
    assert(row.getAs[Double]("dot") === 11.0)
    assert(row.getAs[Long]("h32") ===
      java.lang.Long.parseLong("90015098", 16))  // md5('abc') = 900150983...
    assert(row.getSeq[Long](row.fieldIndex("lanes")).head ===
      java.lang.Long.parseLong("90015098", 16))  // lane 0 == md5_prefix32
    assert(row.getSeq[Long](row.fieldIndex("lanes")).size === 4)
    assert(row.getSeq[String](row.fieldIndex("bpe")) ===
      Seq("the", "n", "e", "w", "est", "th", "i", "n", "g"))
    assert(row.getSeq[String](row.fieldIndex("blw")) ===
      Seq("Hi", "Ġthere", "42"))
    assert(row.getSeq[String](row.fieldIndex("ble")) ===
      Seq("H", "i", "Ġthe", "r", "e", "4", "2"))
    assert(row.getAs[Int]("n_shingles") === 4)
    assert(row.getAs[Int]("n_grams") === 2)
    assert(row.getAs[Int]("sig_len") === 8)
    assert(row.getAs[Int]("hs_sz") > 0)
    assert(row.getAs[Int]("inter") === 2)
    assert(row.getAs[Int]("poseq") === 2)
    // reference order: abbrevs expand FIRST (corp->corporation,
    // intl->international), then both land in the legal-suffix stop set
    assert(row.getAs[String]("norm") === "acme")
    // 'hash join' (idx 0, across the doc's double space) + 'here' (idx 2)
    assert(row.getSeq[Int](row.fieldIndex("ph")) === Seq(0, 2))
  }

  test("bad arity and non-literal int args raise clean AnalysisException") {
    GraftExtensions.registerAll(spark)
    def analysisMsg(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).queryExecution.analyzed
      }.getMessage
    // wrong arg count → named function + expected count, not IndexOutOfBounds
    assert(analysisMsg("SELECT jaro_winkler('a')")
      .contains("jaro_winkler(a, b): expects 2 arguments, got 1"))
    // non-foldable int arg → named argument, not an opaque eval() crash
    assert(analysisMsg(
      "SELECT minhash_signature(text, cast(doc_id AS INT), 16) " +
        "FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
      .contains("argument 2 must be a foldable integer literal"))
  }
}
