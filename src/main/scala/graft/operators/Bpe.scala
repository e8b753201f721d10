package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed BPE merge-table training (Sennrich et al. 2016, word-level
 * variant) — the tokenizer-fitting step of a training-data pipeline,
 * shaped for Spark the way production BPE trainers are shaped for a
 * single machine:
 *
 *  1. ONE corpus scan aggregates word frequencies — the only stage that
 *     touches the text column. Everything after runs on the word-vocab
 *     frame (distinct words × counts), which is orders of magnitude
 *     smaller than the corpus and stays DISTRIBUTED (a 100 TB web corpus
 *     has billions of distinct "words"; they never sit on the driver).
 *  2. Each merge round is one hash-aggregate over the vocab frame
 *     (adjacent-pair counts, weighted by word frequency) + a ONE-ROW
 *     argmax collect (bounded driver traffic by construction) + a
 *     scan-local fold that rewrites the symbol arrays. No round
 *     re-reads the corpus.
 *
 * Determinism: the argmax tiebreak is total (count desc, pair asc), so
 * the learned merge sequence is partition-invariant — `BpeSpec` pins
 * equality with a single-node reference implementation and across
 * repartitionings. The vocab frame is re-localCheckpointed each round
 * (eagerly, previous copy unpersisted) so round R's plan is one
 * aggregate over a materialized frame, not R nested folds.
 *
 * Apply is [[graft.functions.BpeEncode]] — a scan-local codegen
 * expression carrying the learned table as a reference object.
 */
object Bpe {

  /** (word, cnt) frequencies — the one corpus-touching stage. Words are
    * lowercased whitespace tokens (the engine-wide convention; must
    * match [[graft.functions.BpeEncode]]'s splitter). */
  def wordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(filter(split(lower(textCol), "\\s+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Left-to-right non-overlapping merge of adjacent (a, b) → a+b in a
    * symbol array, as a scan-local fold. Symbols are never empty, so ""
    * is a safe no-pending sentinel. */
  private def mergePairCol(syms: Column, a: String, b: String): Column = {
    val stepped = aggregate(
      syms,
      struct(array().cast("array<string>").as("acc"), lit("").as("pend")),
      (s, x) => {
        val acc = s.getField("acc")
        val pend = s.getField("pend")
        val hit = pend === lit(a) && x === lit(b)
        struct(
          when(hit, concat(acc, array(lit(a + b))))
            .otherwise(when(pend === lit(""), acc)
              .otherwise(concat(acc, array(pend)))).as("acc"),
          when(hit, lit("")).otherwise(x).as("pend"))
      })
    when(stepped.getField("pend") === lit(""), stepped.getField("acc"))
      .otherwise(concat(stepped.getField("acc"),
        array(stepped.getField("pend"))))
  }

  /**
   * Learn up to `numMerges` merges from a word-count frame (cols
   * `word`, `cnt`). Stops early when no adjacent pair reaches
   * `minPairCount`. Returns merges in rank order.
   *
   * Adaptive execution: when the distinct-word frame holds at most
   * `localizeBelow` rows, it is collected once and the merge loop runs
   * on the driver — numMerges rounds of tiny Spark jobs collapse to one
   * job + a local loop, with IDENTICAL output (`BpeSpec` pins
   * local ≡ distributed equality; both share the total tiebreak).
   * Above the threshold the loop stays fully distributed: a web-scale
   * corpus has billions of distinct "words" and the vocab frame never
   * sits on one machine.
   */
  def trainFromCounts(counts: DataFrame, numMerges: Int,
                      minPairCount: Long = 2L,
                      localizeBelow: Long = 100000L): Seq[(String, String)] = {
    require(numMerges >= 0 && minPairCount >= 1)
    // clamp: limit() takes an Int; a threshold at/above Int.MaxValue would
    // overflow to a negative limit and fail the probe query at runtime
    val localizeLim = math.min(localizeBelow, Int.MaxValue - 1L)
    if (numMerges > 0 &&
        counts.limit(localizeLim.toInt + 1).count() <= localizeLim) {
      return trainLocal(
        counts.select(col("word"), col("cnt").cast("long")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq,
        numMerges, minPairCount)
    }
    // split("") keeps a trailing "" element (Java split, limit -1) —
    // filter it: "" is the fold's no-pending sentinel and must never be
    // a real symbol
    var vocab = counts
      .select(filter(split(col("word"), ""), s => s =!= lit("")).as("syms"),
        col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val best = vocab
        .select(explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"),
          col("cnt"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= minPairCount)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .select(mergePairCol(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Driver-local merge loop for vocab frames under the localize
    * threshold — same code-point alphabet, pair weighting, tiebreak and
    * single-pass merge as the distributed rounds. */
  private def trainLocal(counts: Seq[(String, Long)], numMerges: Int,
                         minPairCount: Long): Seq[(String, String)] = {
    def splitCp(w: String): Array[String] = {
      val out = Array.newBuilder[String]
      var off = 0
      while (off < w.length) {
        val next = w.offsetByCodePoints(off, 1)
        out += w.substring(off, next); off = next
      }
      out.result()
    }
    var vocab = counts.map { case (w, c) => (splitCp(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((sy, c) <- vocab; j <- 0 until sy.length - 1) {
        val k = (sy(j), sy(j + 1))
        pairs(k) = pairs.getOrElse(k, 0L) + c
      }
      val cand = pairs.iterator.filter(_._2 >= minPairCount)
      if (cand.isEmpty) exhausted = true
      else {
        // argmax with the distributed loop's total tiebreak (count
        // desc, a asc, b asc) — string order by CODE POINTS, matching
        // Spark's UTF8 binary ordering, not Java's UTF-16 compareTo
        // (they disagree for supplementary vs upper-BMP characters)
        def cpCompare(x: String, y: String): Int = {
          var i = 0; var j = 0
          while (i < x.length && j < y.length) {
            val cx = x.codePointAt(i); val cy = y.codePointAt(j)
            if (cx != cy) return Integer.compare(cx, cy)
            i += Character.charCount(cx); j += Character.charCount(cy)
          }
          Integer.compare(x.length - i, y.length - j)
        }
        val (a, b) = pairs.iterator.filter(_._2 >= minPairCount)
          .reduceLeft { (x, y) =>
            val ((xa, xb), xn) = x; val ((ya, yb), yn) = y
            val better = yn > xn || (yn == xn && {
              val ca = cpCompare(ya, xa)
              ca < 0 || (ca == 0 && cpCompare(yb, xb) < 0)
            })
            if (better) y else x
          }._1
        merges += ((a, b))
        vocab = vocab.map { case (sy, c) =>
          val out = Array.newBuilder[String]
          var j = 0
          while (j < sy.length) {
            if (j < sy.length - 1 && sy(j) == a && sy(j + 1) == b) {
              out += a + b; j += 2
            } else { out += sy(j); j += 1 }
          }
          (out.result(), c)
        }
        done += 1
      }
    }
    merges.result()
  }

  /** End-to-end: word-count scan + merge loop. */
  def train(docs: DataFrame, textCol: Column, numMerges: Int,
            minPairCount: Long = 2L): Seq[(String, String)] =
    trainFromCounts(wordCounts(docs, textCol), numMerges, minPairCount)

  // ---------------------------------------------------------------------
  // Batched training — R merges in ≪ R rounds
  // ---------------------------------------------------------------------

  /** Merges in global rank order + rounds actually executed. */
  final case class BatchedMerges(merges: Seq[(String, String)], rounds: Int)

  /** Symbol delimiter for the batched trainer's string-form vocab (unit
    * separator U+001F — never inside a whitespace-split word of a
    * printable corpus; the same convention the DuckDB oracle replay
    * uses with chr(31)). */
  private val US = "\u001f"

  /** UTF8-binary string compare (code points) — matches Spark's binary
    * sort order and DuckDB's default collation; Java compareTo disagrees
    * for supplementary vs upper-BMP characters. */
  private def cpCompare(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** The batched round's selection rule: from candidates ordered by
    * (count desc, a, b), keep a pair iff it shares NO symbol with ANY
    * strictly higher-ranked candidate — selected or not. Window-rule
    * (not greedy-vs-selected) on purpose: it is replayable in plain SQL
    * with row_number + NOT EXISTS, no recursion, so the DuckDB oracle
    * re-derives the exact same batch. Disjointness means the pairs'
    * measured counts are still exact at apply time (merging (a,b)
    * only creates/destroys adjacencies involving a or b). */
  private def selectDisjoint(
      cands: Seq[(String, String)]): Seq[(String, String)] =
    cands.zipWithIndex.collect {
      case ((a, b), i) if !cands.take(i).exists { case (c, d) =>
        c == a || c == b || d == a || d == b } => (a, b)
    }

  /** Shared round loop: ONE pair-count aggregate over the vocab frame +
    * ONE bounded top-`batchSize` collect + one scan-local apply of the
    * disjoint subset per round, until `continue(mergeCount, rounds)`
    * turns false or pairs exhaust. Application is leftmost
    * non-overlapping `replace` on the U+001F-delimited symbol string —
    * the SAME string algorithm the local twin (Java `String.replace`)
    * and the DuckDB oracle (`replace()`) run, so all three agree
    * bit-for-bit by construction. */
  private def batchedLoop(counts: DataFrame, batchSize: Int,
                          minPairCount: Long,
                          continue: (Int, Int) => Boolean): BatchedMerges = {
    require(batchSize >= 1 && minPairCount >= 1)
    var vocab = counts
      .select(concat(lit(US),
          concat_ws(US, filter(split(col("word"), ""), s => s =!= lit(""))),
          lit(US)).as("s"),
        col("cnt").cast("long").as("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (continue(merges.size, round) && !exhausted) {
      val syms = filter(split(col("s"), US), x => x =!= lit(""))
      val cands = vocab
        .select(explode(arrays_zip(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1))).as("p"),
          col("cnt"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= minPairCount)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(batchSize).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      if (cands.isEmpty) exhausted = true
      else {
        val picked = selectDisjoint(cands)
        merges ++= picked
        val newS = picked.foldLeft(col("s")) { case (c, (a, b)) =>
          replace(c, lit(US + a + US + b + US), lit(US + a + b + US))
        }
        val next = vocab.select(newS.as("s"), col("cnt"))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
        round += 1
      }
    }
    vocab.unpersist()
    BatchedMerges(merges.toSeq, round)
  }

  /**
   * Batched BPE, round-capped: exactly up to `numRounds` rounds — the
   * oracle-replayable form (the q192 DuckDB replay generates one fixed
   * CTE block per round). Semantics vs the sequential trainer: within a
   * round the selected pairs are pairwise symbol-disjoint, so their
   * pre-round counts are exact and the round ≡ applying them
   * sequentially; ACROSS rounds the order can differ from strict
   * argmax-per-merge (a pair created by this round's rank-1 merge may
   * out-count this round's rank-2 pick — the standard batched-trainer
   * trade; `batchSize = 1` reduces exactly to the sequential argmax,
   * which `BpeBatchedSpec` pins).
   */
  def trainBatchedRounds(counts: DataFrame, numRounds: Int, batchSize: Int,
                         minPairCount: Long = 2L): BatchedMerges = {
    require(numRounds >= 0)
    batchedLoop(counts, batchSize, minPairCount, (_, r) => r < numRounds)
  }

  /** Merge-capped batched training: rounds of up to `batchSize` merges
    * until at least `numMerges` are learned (or pairs exhaust), trimmed
    * to exactly `numMerges` — the scale entry point: 32k merges cost
    * ~32k/batch driver round-trips, not 32k (the sequential trainer's
    * per-round 1-row argmax means R merges = R job launches; at real
    * tokenizer merge counts driver latency dominates). */
  def trainBatched(counts: DataFrame, numMerges: Int, batchSize: Int,
                   minPairCount: Long = 2L): BatchedMerges = {
    require(numMerges >= 0)
    val all = batchedLoop(counts, batchSize, minPairCount,
      (m, _) => m < numMerges)
    BatchedMerges(all.merges.take(numMerges), all.rounds)
  }

  /** Instrumentation for the PLANS.md stage dump: the two per-round
    * plans of the batched trainer — the candidate-pair aggregate
    * (pair counts → threshold → total-order top-batchSize) and the
    * chained-replace apply projection for `merges` — which the
    * query-level plan hides behind the per-round localCheckpoint. */
  def batchedRoundPlans(counts: DataFrame, batchSize: Int,
                        minPairCount: Long,
                        merges: Seq[(String, String)])
      : (DataFrame, DataFrame) = {
    val vocab = counts
      .select(concat(lit(US),
          concat_ws(US, filter(split(col("word"), ""), s => s =!= lit(""))),
          lit(US)).as("s"),
        col("cnt").cast("long").as("cnt"))
    val syms = filter(split(col("s"), US), x => x =!= lit(""))
    val cands = vocab
      .select(explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1))).as("p"),
        col("cnt"))
      .groupBy(col("p.0").as("a"), col("p.1").as("b"))
      .agg(sum(col("cnt")).as("n"))
      .filter(col("n") >= minPairCount)
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(batchSize)
    val applied = vocab.select(
      merges.foldLeft(col("s")) { case (c, (a, b)) =>
        replace(c, lit(US + a + US + b + US), lit(US + a + b + US))
      }.as("s"), col("cnt"))
    (cands, applied)
  }

  /** Driver-local twin of [[trainBatchedRounds]] — same candidate order
    * (UTF8-binary tiebreak), same window selection rule, same
    * `String.replace` application on the same delimited string. Spec
    * harness for distributed ≡ local equality at scale. */
  def trainBatchedLocal(counts: Seq[(String, Long)], numRounds: Int,
                        batchSize: Int,
                        minPairCount: Long = 2L): BatchedMerges = {
    def splitCp(w: String): Array[String] = {
      val out = Array.newBuilder[String]
      var off = 0
      while (off < w.length) {
        val next = w.offsetByCodePoints(off, 1)
        out += w.substring(off, next); off = next
      }
      out.result()
    }
    var vocab = counts.map { case (w, c) =>
      (US + splitCp(w).mkString(US) + US, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    val ord = new Ordering[((String, String), Long)] {
      def compare(x: ((String, String), Long),
                  y: ((String, String), Long)): Int = {
        val byN = java.lang.Long.compare(y._2, x._2)
        if (byN != 0) byN
        else {
          val byA = cpCompare(x._1._1, y._1._1)
          if (byA != 0) byA else cpCompare(x._1._2, y._1._2)
        }
      }
    }
    while (round < numRounds && !exhausted) {
      val pairs = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((s, c) <- vocab) {
        val sy = s.split(US).filter(_.nonEmpty)
        var j = 0
        while (j < sy.length - 1) {
          val k = (sy(j), sy(j + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + c
          j += 1
        }
      }
      val cands = pairs.iterator.filter(_._2 >= minPairCount).toSeq
        .sorted(ord).take(batchSize).map(_._1)
      if (cands.isEmpty) exhausted = true
      else {
        val picked = selectDisjoint(cands)
        merges ++= picked
        vocab = vocab.map { case (s, c) =>
          (picked.foldLeft(s) { case (acc, (a, b)) =>
            acc.replace(US + a + US + b + US, US + a + b + US)
          }, c)
        }
        round += 1
      }
    }
    BatchedMerges(merges.toSeq, round)
  }

  /** The learned table as a tokenizing Column. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graftshim.GraftShim.expr(text), merges))

  // ---------------------------------------------------------------------
  // Byte-level variant (GPT-2 lineage) — see functions/ByteLevelBpe.scala
  // ---------------------------------------------------------------------

  /** Byte-level (word, cnt) frequencies: GPT-2-pretokenized (case
    * preserved, leading space part of the token), UTF-8 bytes mapped to
    * the printable byte alphabet — ONE corpus scan through the
    * [[graft.functions.ByteLevelWords]] kernel. The resulting counts
    * frame feeds [[trainBatchedRounds]] unchanged: mapped symbols are
    * single BMP chars, so the trainer's per-char alphabet split IS the
    * byte alphabet, and chr(31) can never occur in a symbol (the map's
    * range contains no control characters at all). */
  def byteLevelWords(textCol: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.ByteLevelWords(
        org.apache.spark.sql.graftshim.GraftShim.expr(textCol)))

  def byteLevelWordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(byteLevelWords(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** The learned byte-level table as a tokenizing Column (pretokenize →
    * byte-map → lowest-rank merge loop, scan-local codegen). */
  def encodeByteLevel(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.ByteLevelEncode(
        org.apache.spark.sql.graftshim.GraftShim.expr(text), merges))

  /** The merge loop over a single ALREADY byte-mapped pretoken (a
    * [[byteLevelWords]] element) — the vocab-frame tokenization path:
    * the corpus pays one pretokenize pass, the merge walk runs per
    * DISTINCT word. */
  def encodeMappedWord(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.ByteLevelEncodeMapped(
        org.apache.spark.sql.graftshim.GraftShim.expr(word), merges))
}
