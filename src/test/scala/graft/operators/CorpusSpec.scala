package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant specs for the corpus-preparation operators (Corpus /
  * Retrieval / Resample / Sampling.fixedKPerStratum). The DuckDB oracles
  * (q93-q98) pin exact values; these pin the algebraic contracts on
  * adversarial mini-frames the testdata doesn't exercise. */
class CorpusSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // ---- decontaminate ----

  test("decontaminate: verbatim copy is fully contaminated, disjoint doc is clean") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),     // exact copy
      (11L, "one two three four five six seven"),       // disjoint
      (12L, "x alpha beta gamma delta epsilon y")       // one shared 5-gram
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, bench, col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out.keySet === Set(10L, 12L))
    assert(out(10L) === ((2, 2L)))          // 6 words → 2 distinct 5-grams, both shared
    assert(out(12L)._2 === 1L)              // exactly one overlapping 5-gram
  }

  test("decontaminateBloom: bit-identical to the exact path (no false " +
      "negatives by the Bloom contract; exact join removes false positives)") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "x alpha beta gamma delta epsilon y")
    ).toDF("doc_id", "text")
    val exact = Corpus.decontaminate(train, bench, col("doc_id"), col("text"), n = 5)
      .collect().map(_.toSeq).toSet
    // tight fpp AND a sloppy one: the exact confirm join must erase the
    // difference either way
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Corpus.decontaminateBloom(train, bench,
        col("doc_id"), col("text"), n = 5, fpp = fpp)
        .collect().map(_.toSeq).toSet
      assert(bloom === exact, s"fpp=$fpp")
    }
  }

  test("decontaminateSemantic: precision is exact and recall equals the " +
      "probe contract vs a brute-force cross join on the embeddings table") {
    val embs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val bench = embs.filter(pmod(col("vec_id"), lit(10)) === 0)
    val corpus = embs.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val got = Corpus.decontaminateSemantic(corpus, bench, col("vec_id"),
        col("embedding"), modulus = 20, nprobe = 2, threshold = 0.40)
      .select("id", "bench_id").as[(Long, Long)].collect().toSet
    // brute-force truth (small SF only)
    import graft.functions.VectorFunctions
    def u(df: org.apache.spark.sql.DataFrame, idAs: String, uAs: String) =
      df.select(col("vec_id").as(idAs),
        VectorFunctions.unit(col("embedding")).as(uAs))
    val brute = u(corpus, "id", "cu").crossJoin(u(bench, "bench_id", "bu"))
      .filter(VectorFunctions.dot(col("cu"), col("bu")) >= 0.40)
      .select("id", "bench_id").as[(Long, Long)].collect().toSet
    // precision 1.0: everything reported is a true over-threshold pair
    assert(got.subsetOf(brute))
    assert(got.nonEmpty)
    // recall contract: a true pair is reported IFF the bench vector's
    // list is among the corpus vector's nprobe probed lists — recompute
    // the probe sets and check the equivalence exactly
    val cents = graft.operators.SimilaritySearch.ivfCentroids(bench,
      col("vec_id"), col("embedding"), 20)
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("id"),
          VectorFunctions.unit(col("embedding")).as("uu"))
        .join(broadcast(cents))
        .select(col("id"), col("cid"),
          VectorFunctions.dot(col("uu"), col("cu")).as("cos"))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("cos").desc, col("cid").asc)))
    val benchList = ranked(bench).filter(col("rk") === 1)
      .select(col("id").as("bench_id"), col("cid"))
      .as[(Long, Long)].collect().toMap
    val probeSets = ranked(corpus).filter(col("rk") <= 2)
      .select("id", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = brute.filter { case (id, bid) =>
      probeSets.getOrElse(id, Set.empty).contains(benchList(bid))
    }
    assert(got === expected)
  }

  test("decontaminate: short docs (< n words) produce no grams, never flagged") {
    val bench = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c")).toDF("doc_id", "text")
    assert(Corpus.decontaminate(train, bench, col("doc_id"), col("text"), 5).count() === 0)
  }

  // ---- spanDedup ----

  test("spanDedup: repeated tile excised from the LATER doc only; partial " +
      "tails always survive, even when identical; rebuilt text verified") {
    // spanWords=3 for hand computation. doc 1: tiles [a b c][d e f], tail "t".
    // doc 2 repeats [a b c] (dropped — doc 1 owns it), has its own [x y z],
    // and the SAME tail "t" (kept — partials never dedup). doc 3 repeats
    // [a b c] twice (both dropped: within-doc repeats lose to doc 1) and
    // is tail-less and tile-less after excision. doc 4: shorter than one
    // tile — everything is tail.
    val docs = Seq(
      (1L, "a b c d e f t"),
      (2L, "a b c x y z t"),
      (3L, "a b c a b c"),
      (4L, "p q")
    ).toDF("doc_id", "text")
    val out = Corpus.spanDedup(docs, col("doc_id"), col("text"), spanWords = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(1L) === ((2L, 2L, 0L, m("a b c d e f t"))))  // first owner keeps all
    assert(out(2L) === ((2L, 1L, 1L, m("x y z t"))))        // shared tile gone, tail kept
    assert(out(3L) === ((2L, 0L, 2L, m(""))))               // fully excised
    assert(out(4L) === ((0L, 0L, 0L, m("p q"))))            // all tail
  }

  test("spanDedup: within-doc tile order is preserved in the rebuilt text") {
    // doc 20 keeps tiles 0 and 2 (tile 1 stolen by doc 10) — the rebuild
    // must splice [k1][k3] in index order, not collection order
    val docs = Seq(
      (10L, "s s s"),
      (20L, "k one a s s s k two b k three c")
    ).toDF("doc_id", "text")
    val out = Corpus.spanDedup(docs, col("doc_id"), col("text"), spanWords = 3)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(20L) === m("k one a k two b k three c"))
  }

  // ---- slidingSpanDedup ----

  test("slidingSpanDedup: catches a repeat at arbitrary alignment that " +
      "tile-aligned spanDedup misses; first occurrence keeps its copy") {
    // W=3. The shared span [a b c] sits at positions 3–5 of doc 1 and
    // 2–4 of doc 2 — OFF tile phase both times, so spanDedup(3) sees
    // disjoint tiles and excises nothing; stride-1 windows match it.
    val docs = Seq(
      (1L, "p q a b c r"),
      (2L, "x a b c y z")
    ).toDF("doc_id", "text")
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val slid = Corpus.slidingSpanDedup(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(slid(1L) === ((6, 6, m("p q a b c r")))) // canonical copy intact
    assert(slid(2L) === ((6, 3, m("x y z"))))       // covered span excised
    val tiled = Corpus.spanDedup(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(tiled(2L) === m("x a b c y z"))          // tiles are phase-blind
  }

  test("slidingSpanDedup: periodic self-overlapping run collapses to its " +
      "first token; short docs untouched; tokenization normalizes") {
    val docs = Seq(
      (1L, "a a a a"),   // windows at 1,2 share one hash → dup at 2
      (2L, "p q"),       // shorter than W — no windows, fully kept
      (3L, "B  b a a")   // lower+trim: windows [b b a][b a a], both unique
    ).toDF("doc_id", "text")
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val out = Corpus.slidingSpanDedup(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) === ((4, 1, m("a")))) // dup window at 2 covers 2-4
    assert(out(2L) === ((2, 2, m("p q"))))
    assert(out(3L) === ((4, 4, m("b b a a"))))
  }

  test("slidingSpanDedup: partition-invariant") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(12)(vocab(rnd.nextInt(4))).mkString(" "))).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Corpus.slidingSpanDedup(d, col("doc_id"), col("text"), 4)
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSet
    assert(run(docs.repartition(1)) === run(docs.repartition(7)))
  }

  // ---- removeBoilerplate ----

  test("removeBoilerplate: a tile reaching minDf distinct docs is excised " +
      "from EVERY copy (incl. the first); below-threshold and within-doc " +
      "repeats survive; tails always kept") {
    // spanWords=3, minDf=3. Tile [a b c] appears in docs 1,2,3 (df=3 →
    // boilerplate, all three copies dropped). Tile [x y z] appears in
    // docs 1,2 (df=2 → kept in both: dedup's business, not ours). Doc 4
    // repeats its own tile [r r r] twice — df=1, both copies survive
    // (df counts DISTINCT docs).
    val docs = Seq(
      (1L, "a b c x y z t1"),
      (2L, "x y z a b c t2"),
      (3L, "a b c own u v"),
      (4L, "r r r r r r")
    ).toDF("doc_id", "text")
    val out = Corpus.removeBoilerplate(docs, col("doc_id"), col("text"),
        spanWords = 3, minDf = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(1L) === ((2L, 1L, 1L, m("x y z t1"))))       // first copy dropped too
    assert(out(2L) === ((2L, 1L, 1L, m("x y z t2"))))
    assert(out(3L) === ((2L, 1L, 1L, m("own u v"))))
    assert(out(4L) === ((2L, 2L, 0L, m("r r r r r r"))))    // within-doc df=1
  }

  test("removeBoilerplate: within-doc order preserved; partition-invariant; " +
      "minDf < 2 rejected") {
    val docs = Seq(
      (1L, "b p 1 keep one a b p 2 keep two b"),
      (2L, "b p 1 other x a b p 2 other y c"),
      (3L, "b p 1 third x a b p 2 third y c")
    ).toDF("doc_id", "text")
    // tiles [b p 1] and [b p 2] hit df=3; doc 1's survivors must splice
    // in index order around the excised tiles
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Corpus.removeBoilerplate(df, col("doc_id"), col("text"),
          spanWords = 3, minDf = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
        .sortBy(_._1).toSeq
    val base = run(docs)
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(base.head._3 === m("keep one a keep two b"))
    assert(run(docs.repartition(7)) === base)
    intercept[IllegalArgumentException] {
      Corpus.removeBoilerplate(docs, col("doc_id"), col("text"), 3, minDf = 1)
    }
  }

  test("boilerplateTiles: df counts DISTINCT docs; only >= minDf tiles " +
      "stored; removeBoilerplateAgainst on the stored set (parquet " +
      "roundtrip) equals the inline operator row-for-row") {
    val docs = Seq(
      (1L, "a b c x y z t1"),
      (2L, "x y z a b c t2"),
      (3L, "a b c own u v"),
      (4L, "r r r r r r")      // within-doc repeat: df=1, never stored
    ).toDF("doc_id", "text")
    val tiles = Corpus.boilerplateTiles(docs, col("doc_id"), col("text"),
      spanWords = 3, minDf = 3)
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val stored = tiles.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // [a b c] df=3 (docs 1,2,3); [x y z] df=2 and [r r r] df=1 stay out
    assert(stored === Map(m("a b c") -> 3L))
    intercept[IllegalArgumentException] {
      Corpus.boilerplateTiles(docs, col("doc_id"), col("text"), 3, minDf = 1)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-boiler-tiles").toString
    tiles.write.mode("overwrite").parquet(dir)
    val against = Corpus.removeBoilerplateAgainst(docs,
        spark.read.parquet(dir), col("doc_id"), col("text"), spanWords = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
    val inline = Corpus.removeBoilerplate(docs, col("doc_id"), col("text"),
        spanWords = 3, minDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
    assert(against === inline)
  }

  // ---- packSequences ----

  test("packSequences: offsets chain (prior + n_tok of prev = offset of next), spans consistent") {
    val docs = Seq(
      (1L, "s1", 100L), (2L, "s1", 200L), (3L, "s1", 50L), (4L, "s1", 300L),
      (5L, "s2", 600L), (6L, "s2", 10L)
    ).toDF("doc_id", "shard", "n_tok")
    val out = Corpus.packSequences(docs, col("doc_id"), col("shard"), col("n_tok"), 256)
      .orderBy("shard", "id").collect()
    // s1: priors 0,100,300,350 → offsets mod 256: 0,100,44,94
    val s1 = out.filter(_.getString(1) == "s1")
    assert(s1.map(_.getLong(5)).toSeq === Seq(0L, 100L, 44L, 94L))
    // pack_first = prior / 256; pack_last covers the doc's final token
    assert(s1.map(r => (r.getLong(3), r.getLong(4))).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 2L)))
    // shards pack independently: s2 starts at offset 0 again
    val s2 = out.filter(_.getString(1) == "s2")
    assert(s2.head.getLong(5) === 0L)
    // doc longer than capacity spans multiple packs
    assert(s2.head.getLong(4) - s2.head.getLong(3) === 2L) // 600 tokens / 256 → 3 packs
  }

  test("packSequences: token mass is conserved per shard") {
    val docs = (1L to 40L).map(i => (i, s"s${i % 3}", (i * 7) % 90 + 1))
      .toDF("doc_id", "shard", "n_tok")
    val out = Corpus.packSequences(docs, col("doc_id"), col("shard"), col("n_tok"), 64)
    val in = docs.groupBy("shard").agg(sum("n_tok")).as[(String, Long)].collect().toMap
    val packed = out.groupBy("shard").agg(sum("n_tok")).as[(String, Long)].collect().toMap
    assert(packed === in)
  }

  // ---- chunkChars ----

  test("chunkChars: reconstruction — stripping the overlap re-concatenates to the text") {
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"), (2L, "short"))
      .toDF("doc_id", "text")
    val out = Corpus.chunkChars(docs, col("doc_id"), col("text"), size = 10, overlap = 3)
      .orderBy("id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1)))
    // step = 7: chunk i starts at 7i; concat(chunk0, drop(3) of rest) = text
    val rebuilt = byDoc(1L).map(_.getString(2)).reduce((a, b) => a + b.drop(3))
    assert(rebuilt === "abcdefghijklmnopqrstuvwxyz0123456789")
    assert(byDoc(2L).map(_.getString(2)).toSeq === Seq("short"))
    // every non-final chunk is exactly `size` chars
    byDoc(1L).init.foreach(r => assert(r.getString(2).length === 10))
  }

  // ---- repetitionSignals ----

  test("repetitionSignals: boilerplate loop scores high, varied text low, fragments dropped") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now"),   // pure loop
      (2L, "the quick brown fox jumps over a lazy dog"), // all distinct
      (3L, "too short")                                  // < minWords
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionSignals(docs, col("doc_id"), col("text"), minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    val loop = out(1L)
    assert(loop.getDouble(2) === 1.0 - 2.0 / 10)  // 10 words, 2 distinct
    // bigrams: "buy now"×5, "now buy"×4 → top share 5/9
    assert(math.abs(loop.getDouble(3) - 5.0 / 9) < 1e-9)
    val varied = out(2L)
    assert(varied.getDouble(2) === 0.0)
    assert(math.abs(varied.getDouble(3) - 1.0 / 8) < 1e-9) // all bigrams unique
  }

  // ---- bm25 ----

  test("bm25: uppercase query terms match the lowercased tokens") {
    val docs = Seq((1L, "Paris paris PARIS other")).toDF("doc_id", "text")
    val upper = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("Paris"))
      .head.getDouble(1)
    val lower = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("paris"))
      .head.getDouble(1)
    assert(upper === lower && upper > 0.0)
  }

  test("queryLikelihood: hand-computed Dirichlet smoothing; uppercase " +
      "terms match lowercased tokens") {
    // corpus "a b" + "b b": |C| = 4, ctf(b) = 3; mu = 2
    // doc1 (tf=1, dl=2): ln((1 + 2*3/4) / (2+2)) = ln(0.625)
    // doc2 (tf=2, dl=2): ln((2 + 2*3/4) / (2+2)) = ln(0.875)
    val docs = Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihood(docs, col("doc_id"), col("text"),
        Seq("B"), mu = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - math.log(0.625)) < 1e-12)
    assert(math.abs(out(2L) - math.log(0.875)) < 1e-12)
    // the better-matching doc scores higher (less negative)
    assert(out(2L) > out(1L))
  }

  test("winsorizedRollup: null values are excluded, not rank-poisoning") {
    val df = ((1 to 20).map(i => ("a", Some(i.toDouble), i.toLong)) ++
      Seq(("a", None, 100L), ("a", None, 101L)))
      .toDF("grp", "v", "k")
    val r = RobustStats.winsorizedRollup(df, col("grp"), col("v"), col("k")).head
    assert(r.getLong(1) === 20L)                      // n counts non-null only
    assert(!r.isNullAt(2) && !r.isNullAt(5))          // thresholds/counts non-null
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 19.0) // kLo=1, kHi=19
  }

  test("madAnomalies: hand-computed median/MAD per group; outlier flagged " +
      "without moving either statistic (robust breakdown)") {
    // group a: 1..9 plus one huge outlier. Lower median of 10 values =
    // 5th-ranked = 5.0; deviations {0,1,1,2,2,3,3,4,4,9995} → lower
    // median = 2.0; only the outlier has d > 3·MAD = 6. A mean/σ gate on
    // the same data would put the threshold past every inlier AND pull
    // the center to ~1004 — the masking this operator exists to avoid.
    val df = ((1 to 9).map(i => ("a", i.toDouble, i.toLong)) :+
      ("a", 10000.0, 10L) :+ ("b", 7.0, 11L))
      .toDF("grp", "v", "k")
    val out = RobustStats.madAnomalies(df, col("grp"), col("v"), col("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") === ((10L, 5.0, 2.0, 1L)))
    // singleton group: median = the value, MAD = 0, nothing flagged
    assert(out("b") === ((1L, 7.0, 0.0, 0L)))
  }

  test("bm25: tf monotonicity and absent-term zero") {
    val docs = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L))               // higher tf, same dl → higher score
    assert(out(2L) > 0.0)
    assert(out(3L) === 0.0)                 // term absent → zero (tf factor kills it)
  }

  test("unigramLogProb: hand-computed corpus statistics; common-token docs " +
      "score higher than rare-token docs") {
    // corpus tokens = {a:2, b:2, c:1}, N=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Retrieval.unigramLogProb(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 2L)
    assert(math.abs(out(1L)._2 - math.log(0.4)) < 1e-9)
    assert(math.abs(out(2L)._2 - (math.log(0.4) + math.log(0.2)) / 2) < 1e-9)
    assert(out(1L)._2 > out(2L)._2) // all-common tokens → less surprising
  }

  test("bm25: multi-term score is the fixed-order sum of single-term scores") {
    val docs = Seq((1L, "a b a c"), (2L, "b b c c"), (3L, "c a b a")).toDF("doc_id", "text")
    val multi = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pa = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pb = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(multi(id) - (pa(id) + pb(id))) < 1e-12)
    }
  }

  // ---- gapFillDaily ----

  test("gapFillDaily: gap days are zero-total, forward fill carries the last observed day") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-01 12:00:00", 5.0),
      (1L, "2024-01-04 09:00:00", 7.5),
      (2L, "2024-02-10 00:00:00", 1.0)
    ).toDF("k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = Resample.gapFillDaily(df, col("k"), col("ts"), col("v"))
      .orderBy("key", "day").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length === 4)                 // Jan 1..4 inclusive
    assert(k1.map(_.getDouble(2)).toSeq === Seq(15.0, 0.0, 0.0, 7.5))
    assert(k1.map(_.getDouble(3)).toSeq === Seq(15.0, 15.0, 15.0, 7.5))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1)                 // single-day span, no scaffold beyond it
  }

  // ---- winsorizedRollup ----

  test("winsorizedRollup: thresholds are real group elements, clipping bounds the sum") {
    val df = ((1 to 100).map(i => ("a", i.toDouble, i.toLong)) ++
      Seq(("a", 10000.0, 101L), ("b", 5.0, 102L), ("b", 6.0, 103L)))
      .toDF("grp", "v", "k")
    val out = RobustStats.winsorizedRollup(df, col("grp"), col("v"), col("k"),
        pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // group a: 101 rows → kLo = ceil(0.05·101) = 6, kHi = ceil(0.95·101) = 96
    assert(a.getDouble(2) === 6.0 && a.getDouble(3) === 96.0)
    assert(a.getLong(5) === 5L && a.getLong(6) === 5L) // 1..5 low, 97..100+10000 high
    // clipped sum: 5·6 + Σ6..96 + 5·96 = 30 + 4641 + 480
    assert(a.getDouble(4) === (30 + (6 to 96).sum + 480).toDouble)
    // tiny group: kLo = kHi clamp → both thresholds = the rank-1/2 element
    val b = out("b")
    assert(b.getLong(1) === 2L && b.getLong(5) + b.getLong(6) <= 1L)
  }

  // ---- epochShuffle ----

  test("epochShuffle: a permutation — every row once, pos dense per shard, salt re-permutes") {
    val df = (1L to 200L).toDF("id")
    val s1 = Sampling.epochShuffle(df, col("id"), nShards = 4, salt = "epoch1")
    assert(s1.count() === 200)
    assert(s1.select("id").distinct().count() === 200)
    // pos is 1..count(shard) dense within each shard
    val dense = s1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(dense === 0)
    // deterministic: same salt identical, different salt differs
    val s1b = Sampling.epochShuffle(df.repartition(7), col("id"), 4, "epoch1")
    assert(s1.orderBy("shard", "pos").collect().toSeq ===
      s1b.orderBy("shard", "pos").collect().toSeq)
    val s2 = Sampling.epochShuffle(df, col("id"), 4, "epoch2")
    val o1 = s1.orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    val o2 = s2.orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    assert(o1 !== o2)
    assert(o1.sorted === o2.sorted)
  }

  // ---- temperatureMixture ----

  test("temperatureMixture: alpha=1 preserves rates ∝ target, alpha<1 flattens strata") {
    val df = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")))
      .toDF("id", "stratum")
    // alpha=1: every stratum keeps exactly targetFraction
    val a1 = Sampling.temperatureMixture(df, col("id"), col("stratum"), 1.0, 0.5)
      .select("stratum", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(a1("big") - 0.5) < 1e-9 && math.abs(a1("small") - 0.5) < 1e-9)
    // alpha=0.3: the small stratum keeps a strictly higher rate
    val a03 = Sampling.temperatureMixture(df, col("id"), col("stratum"), 0.3, 0.5)
      .select("stratum", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a03("small") > a03("big"))
    assert(a03("small") <= 1.0 && a03("big") > 0.0)
  }

  // ---- fixedKPerStratum ----

  test("fixedKPerStratum: exactly k per stratum (or all, if fewer), disjoint and deterministic") {
    val df = (1L to 100L).map(i => (i, s"s${i % 4}")).toDF("id", "stratum")
      .union(Seq((1000L, "tiny")).toDF("id", "stratum"))
    val a = Sampling.fixedKPerStratum(df, col("id"), col("stratum"), 7)
    val counts = a.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(Seq("s0", "s1", "s2", "s3").forall(counts(_) == 7L))
    assert(counts("tiny") === 1L)
    // partition-invariance: same membership after a repartition
    val b = Sampling.fixedKPerStratum(df.repartition(13), col("id"), col("stratum"), 7)
    assert(a.select("id").as[Long].collect().sorted.toSeq ===
      b.select("id").as[Long].collect().sorted.toSeq)
  }
}
