package graft.operators

import graft.SparkSpec
import graft.functions.{TextAnalysis, TextFunctions}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup keeps deterministic min-tiebreak row per key") {
    val df = Seq(("a", 3, "x3"), ("a", 1, "x1"), ("b", 2, "y2"), ("a", 2, "x2"))
      .toDF("k", "v", "payload")
    val out = Dedup.exactDedup(df, col("k"), col("v")).orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("a", "x1"), ("b", "y2")))
  }

  test("exactDupGroups finds only keys with count > 1") {
    val df = Seq("x", "y", "x", "z", "x", "y").toDF("k")
    val g = Dedup.exactDupGroups(df, col("k")).orderBy("dup_key").collect()
    assert(g.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 3L), ("y", 2L)))
  }

  test("minhash: identical text → identical signature, bands collide") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content here with other words"))
      .toDF("id", "text")
    val pairs = Dedup.minhashNearDups(docs, col("id"), col("text"),
      numHashes = 16, bands = 8, threshold = 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("simhash: identical tokens → identical fp; hamming 0") {
    val docs = Seq((1L, "alpha beta gamma", "g"), (2L, "alpha beta gamma", "g"),
      (3L, "delta epsilon zeta", "g")).toDF("id", "text", "grp")
    val out = Dedup.simhashNearDups(docs, col("id"),
      TextAnalysis.words(col("text")), col("grp"), bits = 16, maxDist = 0)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 0)))
  }

  test("simhash is order-insensitive over token multiset") {
    val df = Seq(("alpha beta gamma alpha", "gamma alpha alpha beta")).toDF("a", "b")
    val r = df.select(
      Dedup.simhash(TextAnalysis.words(col("a")), 16).as("fa"),
      Dedup.simhash(TextAnalysis.words(col("b")), 16).as("fb")).head
    assert(r.getInt(0) == r.getInt(1))
  }

  test("connectedComponents labels dup clusters with min id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(21L) == 20L && cc(22L) == 20L)
  }

  test("connectedComponents converges on a 60-node chain (pointer jumping)") {
    // worst case for plain min-label propagation (diameter 59 would need
    // 59 rounds); pointer jumping doubles reach per round → well within
    // the default maxIter=10 (2^10 > 59). driverEdgeCap=0 forces the
    // distributed loop — the 100 TB fallback path must keep converging.
    val edges = (0L until 59L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(edges, driverEdgeCap = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 60)
    assert(cc.values.forall(_ == 0L), "every chain node reaches min id 0")
  }

  test("connectedComponents: driver union-find finish equals the distributed loop") {
    // pseudo-random graph mixing cliques, chains and singleton-joins —
    // exercises multi-hop residual merging in the union-find phase
    val edges = (0 until 400).map { i =>
      val a = (i * 2654435761L) % 97
      val b = (i * 40503L + 17) % 97
      (math.min(a, b), math.max(a, b) + 1) // +1 avoids self loops
    }.toDF("a_id", "b_id")
    val viaDriver = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = Dedup.connectedComponents(edges, maxIter = 20, driverEdgeCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === viaLoop)
  }

  test("lshOperatingCurve refuses an over-maxDocs corpus (the all-pairs " +
      "ground truth is quadratic; the sample-only contract is enforced, " +
      "not just documented)") {
    val docs = (1L to 30L).map(i => (i, s"doc number $i with words"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.lshOperatingCurve(docs, col("doc_id"), col("text"),
        maxDocs = 10L)
    }
    assert(e.getMessage.contains("SAMPLE"))
    // under the cap it runs
    assert(Dedup.lshOperatingCurve(
      docs.filter(col("doc_id") <= 10), col("doc_id"), col("text"),
      bandsConfigs = Seq(4), maxDocs = 10L).count() == 1)
  }

  test("ngram jaccard: overlapping vs disjoint") {
    val docs = Seq((1L, "a b c d e", "g"), (2L, "a b c d x", "g"),
      (3L, "p q r s t", "g")).toDF("id", "text", "grp")
    val out = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), col("grp"),
      n = 3, threshold = 0.1).collect()
    // trigrams doc1: {abc,bcd,cde}, doc2: {abc,bcd,cdx} → J = 2/4 = 0.5
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(math.abs(out.head.getDouble(2) - 0.5) < 1e-9)
  }

  test("incrementalNearDups: batch matches corpus and earlier batch, " +
      "never corpus-vs-corpus") {
    // corpus 10/12 are near-identical — an incremental run must NOT
    // re-emit that standing pair; batch 21 dups corpus 10, batch 23
    // dups batch 21, batch 25 is novel
    val mk = (id: Long, text: String) => (id, text)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(mk(10L, base), mk(12L, base + " x"),
      mk(14L, "completely different corpus content nothing alike here"))
      .toDF("doc_id", "text")
    val batch = Seq(mk(21L, base + " y"), mk(23L, base + " y z"),
      mk(25L, "novel unseen batch material with fresh words only"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDups(corpus, batch,
        col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // every b is a batch doc; corpus-corpus (10,12) absent
    assert(out.forall(_._3 % 2 == 1), s"b_id must be batch-side: $out")
    assert(out.contains((10L, "corpus", 21L)), s"corpus dup missed: $out")
    assert(out.contains((21L, "batch", 23L)), s"within-batch dup missed: $out")
    assert(!out.exists(p => p._1 == 10L && p._3 == 12L),
      "standing corpus pair must not be re-emitted")
    assert(!out.exists(p => p._1 == 25L || p._3 == 25L),
      s"novel doc must have no matches: $out")
  }

  test("incrementalNearDups ≡ minhashNearDups(corpus ∪ batch) restricted " +
      "to pairs touching the batch (seeded random docs)") {
    // the delta-dedup contract: running incrementally over (corpus, batch)
    // finds exactly the pairs a full re-dedup of the union would find,
    // minus the corpus-internal ones — same est gate, same exact-Jaccard
    // verify, orientation normalized
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(): String =
      (0 until 12 + rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    // near-dup structure: pairs of docs sharing a long common prefix
    val texts = (0 until 30).flatMap { _ =>
      val base = doc()
      Seq(base, base + " " + words(rnd.nextInt(words.size)))
    } ++ (0 until 20).map(_ => doc())
    val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batch = all.filter(col("doc_id") % 2 === 1)
    def norm(rows: Array[org.apache.spark.sql.Row], ai: Int, bi: Int) =
      rows.map(r => (math.min(r.getLong(ai), r.getLong(bi)),
        math.max(r.getLong(ai), r.getLong(bi)))).toSet
    val inc = norm(Dedup.incrementalNearDups(corpus, batch,
      col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3)
      .select("a_id", "b_id").collect(), 0, 1)
    val full = norm(Dedup.minhashNearDups(all, col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3)
      .select("a_id", "b_id").collect(), 0, 1)
    val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(expected.nonEmpty, "fixture must produce batch-touching pairs")
    assert(inc === expected,
      s"delta result must equal full-re-dedup restricted to batch pairs; " +
        s"missing=${expected -- inc} extra=${inc -- expected}")
  }

  test("incrementalNearDupsFromState(parquet-roundtripped signature table) " +
      "≡ incrementalNearDups(raw corpus text)") {
    // the production nightly-ingest shape: the corpus side reads a STORED
    // signature table (built once, parquet-persisted) instead of
    // re-shingling text — must produce byte-identical pairs to the
    // re-hash path
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq((10L, base), (12L, base + " x"),
      (14L, "completely different corpus content nothing alike here"))
      .toDF("doc_id", "text")
    val batch = Seq((21L, base + " y"), (23L, base + " y z"),
      (25L, "novel unseen batch material with fresh words only"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sigtab").toString
    Dedup.minhashStateTable(corpus, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaState = rows(Dedup.incrementalNearDupsFromState(stored, batch,
      col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3))
    val viaText = rows(Dedup.incrementalNearDups(corpus, batch,
      col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3))
    assert(viaState === viaText)
    assert(viaState.contains((10L, "corpus", 21L, viaState.find(
      p => p._1 == 10L && p._3 == 21L).get._4)))
  }

  test("nearDupArtifacts: signatures/edges/labels match the standalone " +
      "operators; the stored-signature path reproduces them from parquet") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, base), (2L, base + " x"), (3L, base + " x y"),
      (5L, "completely different corpus content nothing alike here"),
      (7L, "another standalone document with its own unshared words"))
      .toDF("doc_id", "text")
    val arts = Dedup.nearDupArtifacts(docs, col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3)
    // edges ≡ the one-shot operator
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneShot = pairs(Dedup.minhashNearDups(docs, col("doc_id"),
      col("text"), shingleSize = 5, numHashes = 16, bands = 8,
      threshold = 0.3))
    assert(pairs(arts.edges) === oneShot)
    assert(oneShot.exists(p => p._1 == 1L && p._2 == 2L), "fixture has dups")
    // labels ≡ CC over the one-shot edges; signatures ≡ the state table
    def labelRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelRows(arts.labels) === labelRows(Dedup.connectedComponents(
      Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.3)
        .select("a_id", "b_id"))))
    assert(arts.signatures.select("id", "sz").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet ===
      Dedup.minhashStateTable(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16).select("id", "sz").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet)
    // the production fan-out: signatures parquet-roundtripped, edges and
    // labels rebuilt from the STORED table without touching text
    val dir = java.nio.file.Files.createTempDirectory("artifacts").toString
    arts.signatures.write.mode("overwrite").parquet(dir)
    val rebuilt = Dedup.nearDupArtifactsFromState(
      spark.read.parquet(dir), numHashes = 16, bands = 8, threshold = 0.3)
    assert(pairs(rebuilt.edges) === oneShot)
    assert(labelRows(rebuilt.labels) === labelRows(arts.labels))
  }

  test("ngram jaccard maxDf: non-binding cap is exact; binding cap drops " +
      "hot-gram-only pairs") {
    // "x y z" is a boilerplate trigram shared by ALL docs (df=4); docs 1/2
    // additionally share their real content trigrams.
    val docs = Seq(
      (1L, "x y z a b c d", "g"), (2L, "x y z a b c e", "g"),
      (3L, "x y z p q r s", "g"), (4L, "x y z t u v w", "g"))
      .toDF("id", "text", "grp")
    def pairs(maxDf: Option[Int]) =
      Dedup.ngramJaccardPairs(docs, col("id"), col("text"), col("grp"),
          n = 3, threshold = 0.01, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val exact = pairs(None)
    assert(pairs(Some(100)) === exact) // cap above every df: identical
    // cap=3 < df("x y z")=4: the boilerplate gram stops generating pairs, so
    // pairs overlapping ONLY on it vanish; 1-2 still meet via content grams
    // (capped grams are nonexistent on BOTH sides of J — sizes come from
    // the same capped postings as the intersection, the ppjoin convention)
    val capped = pairs(Some(3))
    assert(capped.keySet === Set((1L, 2L)))
    assert(exact.keySet.contains((3L, 4L)))
  }

  test("ivfCosineNearDups: within-list pairs equal brute force; cross-list " +
      "pairs are the documented recall loss; cap drops oversized lists") {
    // two tight clusters around orthogonal axes; ids 0 and 100 are the
    // modulus-100 centroids, one per cluster, so assignment is by cluster
    def v(axis: Int, eps: Float): Seq[Float] = {
      val a = Array.fill(4)(eps); a(axis) = 1.0f; a.toSeq
    }
    val embs = Seq(
      (0L, v(0, 0.00f)), (1L, v(0, 0.01f)), (2L, v(0, 0.02f)),
      (100L, v(1, 0.00f)), (101L, v(1, 0.01f)), (102L, v(1, 0.03f)))
      .toDF("vec_id", "embedding")
    def pairsOf(maxList: Int) =
      Dedup.ivfCosineNearDups(embs, col("vec_id"), col("embedding"),
          modulus = 100, threshold = 0.9, maxListSize = maxList)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairsOf(10000)
    // all within-cluster pairs found (cosine ≈ 1 inside a cluster)…
    assert(got === Set((0L, 1L), (0L, 2L), (1L, 2L),
      (100L, 101L), (100L, 102L), (101L, 102L)))
    // …and a binding cap drops whole lists, never partial ones
    assert(pairsOf(2) === Set.empty)
  }
}
