package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Tables

/** T1-T4 streaming semantics (SURVEY §2.8): stream==batch equivalence for
  * the daily rollup, watermark late-data drop, idempotent batch sink. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("T2/T4: AvailableNow streaming rollup equals batch rollup") {
    // stage events.parquet alone in a dir (file source reads a directory)
    val dir = tmp("graft-events")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val streamed = Streams.rollupAvailableNow(spark, dir,
        tmp("graft-rollup-out"), tmp("graft-rollup-ckpt"))
      .select("day", "event_type", "n", "total_value")
    val batch = Streams.dailyRollup(
        Tables.load(spark, "/root/testdata/sf0.001", "events"))
      .select("day", "event_type", "n", "total_value")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("T2: a SECOND drain after new files re-emits updated windows " +
      "without duplicating day rows (rewrite, not append)") {
    val dir = tmp("graft-events2")
    val out = tmp("graft-rollup-out2")
    val ckpt = tmp("graft-rollup-ckpt2")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    Streams.rollupAvailableNow(spark, dir, out, ckpt)
    // new events land in ALREADY-ROLLED-UP days (a raw-schema copy of
    // the same file); the scheduled re-drain must yield each (day,
    // type) exactly once, with the updated counts
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/more.parquet"))
    val streamed = Streams.rollupAvailableNow(spark, dir, out, ckpt)
      .select("day", "event_type", "n", "total_value")
    assert(streamed.groupBy("day", "event_type").count()
      .filter(col("count") > 1).isEmpty,
      "a re-drained window appears twice in the rollup output")
    val once = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val batch = Streams.dailyRollup(once.unionByName(once))
      .select("day", "event_type", "n", "total_value")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "re-drained rollup diverges from the batch rollup over all files")
  }

  test("slidingRollup: streamed AvailableNow drain equals the batch " +
      "sliding-window aggregate (q126 shape)") {
    val dir = tmp("graft-sliding-events")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val out = tmp("graft-sliding-out")
    val writer = Streams.slidingRollup(Streams.readEvents(spark, dir))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
    Streams.runAvailableNow(writer, tmp("graft-sliding-ckpt"))
    val streamed = spark.read.parquet(out)
    val batch = Streams.slidingRollup(
      Tables.load(spark, "/root/testdata/sf0.001", "events"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // overlapping windows really overlap: 4 windows cover any one event
    assert(batch.count() > Streams.dailyRollup(
      Tables.load(spark, "/root/testdata/sf0.001", "events")).count())
  }

  test("nearDupIngest: cross-batch bucket state matches new docs against " +
      "earlier ones; novel docs emit nothing") {
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val cands = Streams.nearDupIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.5)
    val q = cands.writeStream.format("memory")
      .queryName("neardup_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-neardup-ckpt"))
      .start()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // batch 1: doc 1 and its near-copy doc 2; unrelated doc 3
    mem.addData((1L, t(1), base), (2L, t(2), base + " x"),
      (3L, t(3), "completely different content with nothing in common"))
    q.processAllAvailable()
    // batch 2: doc 4 duplicates doc 1 — the match must come from STATE
    // persisted across batches; doc 5 is novel
    mem.addData((4L, t(4), base),
      (5L, t(5), "yet another novel and unrelated document body"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_out")
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"in-batch near-dup missed: $pairs")
    assert(pairs.contains((1L, 4L)), s"cross-batch dup missed: $pairs")
    assert(pairs.contains((2L, 4L)), s"cross-batch near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L ||
      p._1 == 5L || p._2 == 5L), s"novel docs must not pair: $pairs")
  }

  test("nearDupIngest: streamed candidates cover every batch-verified " +
      "near-dup pair on real documents") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 00:00:00"),
        r.getString(1))).toSeq
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val cands = Streams.nearDupIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
    val q = cands.writeStream.format("memory")
      .queryName("neardup_docs_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-neardup-docs-ckpt"))
      .start()
    mem.addData(docs)
    q.processAllAvailable()
    q.stop()
    // normalize (earlier, later) arrival orientation to (min, max)
    val streamed = spark.table("neardup_docs_out")
      .select("a_id", "b_id").distinct().collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val verified = graft.operators.Dedup.minhashNearDups(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture must produce near-dup pairs")
    val missed = verified -- streamed
    assert(missed.isEmpty,
      s"est-gated stream candidates must cover batch-verified pairs: $missed")
  }

  test("spanDedupIngest: first occurrence kept, later copies suppressed " +
      "across batches; sub-tile docs emit nothing") {
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val kept = Streams.spanDedupIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      spanWords = 3)
    val q = kept.writeStream.format("memory")
      .queryName("span_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-span-ckpt"))
      .start()
    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // batch 1: doc 1 owns [a b c][d e f]; doc 2 repeats [a b c], owns
    // [x y z]; doc 3 is all tail (2 words)
    mem.addData((1L, t(1), "a b c d e f"), (2L, t(2), "a b c x y z"),
      (3L, t(3), "p q"))
    q.processAllAvailable()
    // batch 2: doc 4 repeats [a b c] AND [x y z] from STATE, owns [m n o]
    mem.addData((4L, t(4), "a b c x y z m n o"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("span_out").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows === Set((1L, 0), (1L, 1), (2L, 1), (4L, 2)),
      s"keep-set wrong: $rows")
  }

  test("spanDedupIngest: per-doc kept counts equal the batch twin's on " +
      "real documents at uniform event time") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 00:00:00"),
        r.getString(1))).toSeq
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val kept = Streams.spanDedupIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      spanWords = 10)
    val q = kept.writeStream.format("memory")
      .queryName("span_docs_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-span-docs-ckpt"))
      .start()
    mem.addData(docs)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("span_docs_out").groupBy("doc_id")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Corpus.spanDedup(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        col("doc_id"), col("text"), spanWords = 10)
      .select("id", "n_kept").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.values.sum > 0, "fixture must keep tiles")
    batch.foreach { case (id, nKept) =>
      assert(streamed.getOrElse(id, 0L) === nKept,
        s"doc $id: stream kept ${streamed.getOrElse(id, 0L)}, batch $nKept")
    }
  }

  test("boilerplateIngest: arriving docs are excised against the STORED " +
      "tile-key artifact; all-boilerplate and sub-tile docs still emit; " +
      "replayed doc_ids are suppressed") {
    // artifact from a standing corpus where [a b c] is template (df=3)
    val corpus = Seq(
      (10L, "a b c x y z t1"), (11L, "a b c k1 k2 k3 t2"),
      (12L, "a b c own u v")).toDF("doc_id", "text")
    val dir = tmp("graft-boiler-ingest-keys")
    graft.operators.Corpus.boilerplateTiles(corpus, col("doc_id"),
        col("text"), spanWords = 3, minDf = 3)
      .write.mode("overwrite").parquet(s"$dir/keys")
    val keys = spark.read.parquet(s"$dir/keys")
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.boilerplateIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      keys, spanWords = 3)
    val q = out.writeStream.format("memory")
      .queryName("boiler_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-boiler-ckpt"))
      .start()
    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // doc 1: one template tile + one own tile + tail; doc 2: ALL
    // template (n_kept=0 must still emit); doc 3: sub-tile (2 words)
    mem.addData((1L, t(1), "a b c m n o tl"), (2L, t(2), "a b c a b c"),
      (3L, t(3), "p q"))
    q.processAllAvailable()
    // replay doc 1 (at-least-once source): must NOT emit a second row
    mem.addData((1L, t(4), "a b c m n o tl"))
    q.processAllAvailable()
    q.stop()
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val rows = spark.table("boiler_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(rows === Set(
      (1L, 2L, 1L, 1L, m("m n o tl")),
      (2L, 2L, 0L, 2L, m("")),
      (3L, 0L, 0L, 0L, m("p q"))), s"gate output wrong: $rows")
  }

  test("boilerplateIngest: a doc_id delivered twice in ONE micro-batch " +
      "emits one clean row (earliest copy), not a merged splice; " +
      "edge-whitespace text digests match the batch twin (space-only trim)") {
    val corpus = Seq((10L, "a b c x y z t"), (11L, "a b c k1 k2 t2"),
      (12L, "a b c own u v")).toDF("doc_id", "text")
    val dir = tmp("graft-boiler-dup-keys")
    graft.operators.Corpus.boilerplateTiles(corpus, col("doc_id"),
        col("text"), spanWords = 3, minDf = 3)
      .write.mode("overwrite").parquet(s"$dir/keys")
    val keys = spark.read.parquet(s"$dir/keys")
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.boilerplateIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      keys, spanWords = 3)
    val q = out.writeStream.format("memory")
      .queryName("boiler_dup_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-boiler-dup-ckpt"))
      .start()
    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // doc 1 delivered TWICE in one batch (at-least-once inside one
    // trigger), second copy later and different; doc 2's text ends in a
    // newline INSIDE the tail — Spark trim keeps it, Java trim would not
    mem.addData((1L, t(1), "a b c m n o tl"), (1L, t(2), "a b c q q q zz"),
      (2L, t(3), "m m m w1 w2\n"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("boiler_dup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1).toSeq
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // doc 1: the EARLIEST copy alone — one template tile dropped, one
    // kept, tail kept (n_kept never exceeds n_tiles)
    assert(rows(0) === ((1L, 2L, 1L, 1L, m("m n o tl"))))
    // doc 2: no template tiles; digest must keep the trailing newline
    // exactly as the batch twin's Spark trim does
    val batch2 = graft.operators.Corpus.removeBoilerplateAgainst(
        Seq((2L, "m m m w1 w2\n")).toDF("doc_id", "text"), keys,
        col("doc_id"), col("text"), spanWords = 3)
      .select("rebuilt_md5").head.getString(0)
    assert(rows(1)._5 === batch2, "stream digest diverged from batch trim")
  }

  test("boilerplateIngest/spanDedupIngest: a row arriving behind the " +
      "watermark is DROPPED by the operator's late-row filter and the " +
      "query survives (measured: FlatMapGroupsWithStateExec pre-filters " +
      "late input, so the guarded timeout is defense-in-depth)") {
    val corpus = Seq((10L, "a b c x y z"), (11L, "a b c p p p"),
      (12L, "a b c u u u")).toDF("doc_id", "text")
    val dir = tmp("graft-boiler-late-keys")
    graft.operators.Corpus.boilerplateTiles(corpus, col("doc_id"),
        col("text"), spanWords = 3, minDf = 3)
      .write.mode("overwrite").parquet(s"$dir/keys")
    val keys = spark.read.parquet(s"$dir/keys")
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.boilerplateIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 hour"),
      keys, spanWords = 3, idleTimeout = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("boiler_late_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-boiler-late-ckpt"))
      .start()
    // advance the watermark 6 weeks past the late row below
    mem.addData((1L, Timestamp.valueOf("2024-02-15 00:00:00"), "x y z q"))
    q.processAllAvailable()
    // 45-days-late doc: FlatMapGroupsWithStateExec's watermark filter
    // drops it before the handler (ts < watermark), so no state, no
    // output, no crash; rows that DO reach the handler always satisfy
    // ts >= watermark, hence timeout > watermark — the guarded-timeout
    // helper covers the residual configs where the input filter is
    // absent (no event-time column on the input, future semantics
    // changes) rather than a reachable crash today
    mem.addData((2L, Timestamp.valueOf("2024-01-01 00:00:00"), "a b c zz"))
    q.processAllAvailable()
    // the query is ALIVE and still processing
    mem.addData((3L, Timestamp.valueOf("2024-02-15 01:00:00"), "a b c ok"))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    val ids = spark.table("boiler_late_out").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L),
      s"late row must be dropped, in-horizon rows processed: $ids")

    // same guard on the span gate
    val mem2 = MemoryStream[(Long, Timestamp, String)](spark)
    val kept = Streams.spanDedupIngest(
      mem2.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 hour"),
      spanWords = 3, idleTimeout = "1 hour")
    val q2 = kept.writeStream.format("memory")
      .queryName("span_late_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-span-late-ckpt"))
      .start()
    mem2.addData((1L, Timestamp.valueOf("2024-02-15 00:00:00"), "x y z"))
    q2.processAllAvailable()
    mem2.addData((2L, Timestamp.valueOf("2024-01-01 00:00:00"), "a b c"))
    q2.processAllAvailable()
    assert(q2.exception.isEmpty, s"span query died: ${q2.exception}")
    q2.stop()
    val spanIds = spark.table("span_late_out").collect()
      .map(_.getLong(0)).toSet
    assert(spanIds === Set(1L))
  }

  test("boilerplateIngest: rows equal the batch removeBoilerplateAgainst " +
      "twin on real documents at uniform event time") {
    val batchDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmp("graft-boiler-docs-keys")
    graft.operators.Corpus.boilerplateTiles(batchDocs, col("doc_id"),
        col("text"), spanWords = 10, minDf = 3)
      .write.mode("overwrite").parquet(s"$dir/keys")
    val keys = spark.read.parquet(s"$dir/keys")
    val docs = batchDocs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 00:00:00"),
        r.getString(1))).toSeq
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.boilerplateIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      keys, spanWords = 10)
    val q = out.writeStream.format("memory")
      .queryName("boiler_docs_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-boiler-docs-ckpt"))
      .start()
    mem.addData(docs)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("boiler_docs_out")
      .select("doc_id", "n_tiles", "n_kept", "n_dropped", "rebuilt_md5")
    val batch = graft.operators.Corpus.removeBoilerplateAgainst(
        batchDocs, keys, col("doc_id"), col("text"), spanWords = 10)
      .select(col("id").as("doc_id"), col("n_tiles"), col("n_kept"),
        col("n_dropped"), col("rebuilt_md5"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // the gate bites on the fixture: some doc lost a tile
    assert(batch.filter(col("n_dropped") > 0).count() > 0)
  }

  test("lmScoreIngest: rows equal the batch scoreNll twin bit-for-bit on " +
      "real documents split across micro-batches; replays suppressed") {
    val batchDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmp("graft-lm-artifacts")
    graft.operators.NgramLm.unigramCounts(batchDocs, col("text"))
      .write.mode("overwrite").parquet(s"$dir/uni")
    graft.operators.NgramLm.bigramCounts(batchDocs, col("text"))
      .write.mode("overwrite").parquet(s"$dir/bi")
    val uni = spark.read.parquet(s"$dir/uni")
    val bi = spark.read.parquet(s"$dir/bi")
    val docs = batchDocs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 00:00:00"),
        r.getString(1))).toSeq
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.lmScoreIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      uni, bi)
    val q = out.writeStream.format("memory")
      .queryName("lm_docs_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-lm-ckpt"))
      .start()
    val (b1, rest) = docs.splitAt(docs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    mem.addData(b3); q.processAllAvailable()
    // replay a full batch (at-least-once source): no duplicate rows
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lm_docs_out")
      .select(col("doc_id"), col("n_tokens"), col("avg_nll"))
    val batch = graft.operators.NgramLm.scoreNll(batchDocs, col("doc_id"),
        col("text"), uni, bi)
      .select(col("id").as("doc_id"), col("n_tokens"), col("avg_nll"))
    assert(streamed.count() == batch.count())
    // bit-for-bit: except() compares the raw doubles, no rounding
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("dsirScoreIngest: rows equal the batch importanceWeights twin " +
      "bit-for-bit across micro-batches; replays suppressed") {
    val B = 512
    val batchDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val target = batchDocs.filter(col("source") === "src0")
    val raw = batchDocs.filter(col("source") =!= "src0")
    val dir = tmp("graft-dsir-artifacts")
    graft.operators.Dsir.logRatio(
        graft.operators.Dsir.bucketCounts(target, col("text"), B),
        graft.operators.Dsir.bucketCounts(raw, col("text"), B), B)
      .write.mode("overwrite").parquet(s"$dir/ratio")
    val ratio = spark.read.parquet(s"$dir/ratio")
    val docs = raw.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 00:00:00"),
        r.getString(1))).toSeq
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.dsirScoreIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      ratio, B)
    val q = out.writeStream.format("memory")
      .queryName("dsir_docs_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-dsir-ckpt"))
      .start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    // replay a full batch (at-least-once source): no duplicate rows
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_docs_out")
      .select(col("doc_id"), col("n_grams"), col("log_w"))
    val batch = graft.operators.Dsir.importanceWeights(raw, col("doc_id"),
        col("text"), ratio, B)
      .select(col("id").as("doc_id"), col("n_grams"), col("log_w"))
    assert(streamed.count() == batch.count())
    // bit-for-bit: except() compares the raw doubles, no rounding
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("dsirScoreIngest: equal-ts duplicate doc_ids with different text " +
      "resolve to ONE payload (min content hash), never a chimera") {
    val B = 64
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-dsir-dup")
    graft.operators.Dsir.logRatio(
        graft.operators.Dsir.bucketCounts(corpus.limit(1), col("text"), B),
        graft.operators.Dsir.bucketCounts(corpus, col("text"), B), B)
      .write.mode("overwrite").parquet(s"$dir/ratio")
    val ratio = spark.read.parquet(s"$dir/ratio")
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val textA = "alpha beta gamma alpha"
    val textB = "delta epsilon zeta eta theta"
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val out = Streams.dsirScoreIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 day"),
      ratio, B)
    val q = out.writeStream.format("memory")
      .queryName("dsir_dup_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-dsir-dup-ckpt"))
      .start()
    mem.addData(Seq((7L, ts, textA), (7L, ts, textB)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dsir_dup_out").collect()
    assert(got.length == 1)
    // the winner is whichever text has the smaller xxhash64 — its
    // batch score must match exactly
    val winner = Seq(textA, textB).minBy(t =>
      corpus.sparkSession.range(1).select(xxhash64(lit(t))).head.getLong(0))
    val expect = graft.operators.Dsir.importanceWeights(
        Seq((7L, winner)).toDF("doc_id", "text"), col("doc_id"),
        col("text"), ratio, B).head()
    assert(got.head.getInt(1) == expect.getInt(1))
    assert(got.head.getDouble(2) == expect.getDouble(2))
  }

  test("quality-model gate is stateless streaming: the frozen-booster " +
      "projection runs unchanged on a stream, rows ≡ batch bit-for-bit") {
    // q196's scoring is ONE codegen projection (features + margin) —
    // no state, no watermark, no twin method needed: the batch Columns
    // apply verbatim to a streaming frame. This pins that contract.
    val m = graft.queries.QualityModelQueries.model
    val batchDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def score(df: org.apache.spark.sql.DataFrame) =
      graft.queries.QualityModelQueries.features(df)
        .withColumn("margin", m.margin)
        .select(col("doc_id"), col("margin"),
          (col("margin") >= graft.queries.QualityModelQueries.KeepMargin)
            .as("keep"))
    val docs = batchDocs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = score(mem.toDF.toDF("doc_id", "text", "source"))
      .writeStream.format("memory")
      .queryName("qm_gate_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-qm-ckpt"))
      .start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qm_gate_out")
    val batch = score(batchDocs)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("T1: watermark drops late rows that arrive after horizon passes") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val rollup = Streams.dailyRollup(
      mem.toDF.toDF("ts", "event_type", "value").withWatermark("ts", "1 day"))
    val q = rollup.writeStream.format("memory")
      .queryName("wm_rollup").outputMode("update")
      .option("checkpointLocation", tmp("graft-wm-ckpt"))
      .start()
    // batch 1: day 10 → watermark advances to day 9
    mem.addData((Timestamp.valueOf("2024-01-10 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 2: day 1 is far behind the watermark → must be dropped
    mem.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "late", 5.0))
    q.processAllAvailable()
    // batch 3: day 10 again → still aggregated (state alive)
    mem.addData((Timestamp.valueOf("2024-01-10 13:00:00"), "click", 2.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_rollup")
    assert(out.filter(col("event_type") === "late").isEmpty,
      "late row beyond watermark must not produce output")
    val day10 = out.filter(col("day") === "2024-01-10")
      .agg(max("n")).head.getLong(0)
    assert(day10 == 2L, "in-horizon updates keep aggregating")
  }

  test("T4: multi-batch drain (maxFilesPerTrigger=1) equals single-batch") {
    // split events across two files → AvailableNow processes 2 batches;
    // update-mode state must carry windows across batches
    val src = tmp("graft-ev-multi")
    // stage from the RAW file (ts stays a nanos long — the streaming
    // source schema; Tables.load would convert it to timestamp)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$src/p0")
    raw.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$src/p1")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // file source reads both dirs via glob into one stream dir layout
    val flat = tmp("graft-ev-flat")
    var i = 0
    java.nio.file.Files.walk(java.nio.file.Paths.get(src)).iterator()
      .forEachRemaining { p =>
        if (p.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("_")) {
          java.nio.file.Files.copy(p,
            java.nio.file.Paths.get(s"$flat/part$i.parquet"))
          i += 1
        }
      }
    val out = tmp("graft-ev-out")
    val rollup = Streams.dailyRollup(
      Streams.readEvents(spark, flat, maxFilesPerTrigger = Some(1)))
    val writer = rollup.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out); ()
      }
    Streams.runAvailableNow(writer, tmp("graft-ev-ckpt"))
    // update mode re-emits a window per batch that touched it → take the
    // LAST emission per (day, type): the final state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day", "event_type").orderBy(col("n").desc)
    // round the float sums: two-batch state accumulation adds in a
    // different order than the single-pass aggregate (last-ulp drift)
    val finalState = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("day"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
    val batchRollup = Streams.dailyRollup(ev)
      .select(col("day"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
    assert(finalState.count() == batchRollup.count())
    assert(finalState.except(batchRollup).isEmpty &&
      batchRollup.except(finalState).isEmpty)
  }

  test("streaming dedup within watermark: duplicates collapse, state bounded") {
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val deduped = Streams.dedupWithinWatermark(
      mem.toDF.toDF("event_id", "ts", "value").withWatermark("ts", "1 hour"),
      Seq("event_id"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-dedup-ckpt"))
      .start()
    mem.addData((1L, Timestamp.valueOf("2024-01-10 12:00:00"), 1.0))
    mem.addData((1L, Timestamp.valueOf("2024-01-10 12:00:05"), 1.0)) // dup
    mem.addData((2L, Timestamp.valueOf("2024-01-10 12:01:00"), 2.0))
    q.processAllAvailable()
    // same key re-delivered within the horizon: still a duplicate
    mem.addData((1L, Timestamp.valueOf("2024-01-10 12:30:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out")
    assert(out.count() === 2)
    assert(out.select("event_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("streaming session rollup equals batch sessionize off boundaries") {
    // stream the sf0.001 events through session_window; compare to the
    // batch Sessionize on the same data (timestamps are continuous
    // microseconds — no gap lands exactly on the 30-min boundary, where
    // the two formulations differ by definition; Streams.sessionRollup
    // scaladoc)
    val dir = tmp("graft-sess-ev")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val out = tmp("graft-sess-out")
    val rollup = Streams.sessionRollup(
      Streams.readEvents(spark, dir, watermark = "1 day"), "30 minutes")
    val writer = rollup.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out); ()
      }
    Streams.runAvailableNow(writer, tmp("graft-sess-ckpt"))
    val streamed = spark.read.parquet(out)
      .select(col("user_id"), col("session_start"),
        col("n_events"), round(col("total_value"), 4).as("tv"))
    val batch = graft.operators.Sessionize.sessions(
        Tables.load(spark, "/root/testdata/sf0.001", "events"),
        col("user_id"), col("ts"), col("event_id"), 1800,
        Seq(round(sum(col("value")), 4).as("tv")))
      .select(col("key").as("user_id"),
        col("session_start"), col("n_events"), col("tv"))
    // append mode emits only watermark-closed sessions; every emitted
    // session must match the batch result exactly, and near-all sessions
    // close (max ts is far past every session end + horizon)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty,
      "every closed streaming session matches its batch twin")
  }

  test("streaming SCD2 intervals equal the batch change-point build") {
    // drain sf0.001 events through scd2Intervals; every CLOSED interval
    // the stream emits must match the batch formulation (q86's plan
    // minus the final open interval per user, which stays in state)
    val dir = tmp("graft-scd2-ev")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val out = tmp("graft-scd2-out")
    val iv = Streams.scd2Intervals(
      Streams.readEvents(spark, dir, watermark = "1 day"))
    val writer = iv.toDF.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out); ()
      }
    Streams.runAvailableNow(writer, tmp("graft-scd2-ckpt"))
    val streamed = spark.read.parquet(out)
      .select("user_id", "state", "valid_from", "valid_to")
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("_prev", lag(col("state"), 1).over(byUser))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .filter(col("valid_to").isNotNull) // closed intervals only
      .select(col("user_id"), col("state"),
        col("ts").as("valid_from"), col("valid_to"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "closed streaming intervals == batch change-point intervals")
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val totals = Streams.runningTotals(
      mem.toDF.toDF("user_id", "ts", "value").withWatermark("ts", "1 day"))
    val q = totals.toDF.writeStream.format("memory")
      .queryName("running_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-running-ckpt"))
      .start()
    mem.addData((1L, ts("2024-01-10 10:00:00"), 2.0),
      (1L, ts("2024-01-10 11:00:00"), 3.0),
      (2L, ts("2024-01-10 10:30:00"), 7.0))
    q.processAllAvailable()
    // second batch: state must carry user 1's (2, 5.0) forward
    mem.addData((1L, ts("2024-01-11 09:00:00"), 10.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("running_out")
      .select("user_id", "running_n", "running_sum")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 1L, 2.0), (1L, 2L, 5.0), (2L, 1L, 7.0),
      (1L, 3L, 15.0)))
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tokenBudgetAdmit: single-batch drain equals the batch prefix " +
      "fill; cross-batch quota persists and closes") {
    import graft.operators.Sampling
    val docs = (1L to 60L).map(i => (i, s"s${i % 3}", (i % 7) + 1))
    val budgets = Map("s0" -> 0L, "s1" -> 40L, "s2" -> 40L)
    // batch twin on the same frame
    val batchDf = docs.toDF("doc_id", "stratum", "n_tokens")
    val expected = Sampling.tokenBudgetFill(batchDf, col("doc_id"),
        col("stratum"), col("n_tokens"),
        when(col("stratum") === "s0", 0L).otherwise(40L))
      .select("doc_id", "cum_tokens")
      .as[(Long, Long)].collect().toMap
    // stream: ALL docs in one batch → admitted set == batch prefix fill
    val mem = MemoryStream[(Long, String, Long)](spark)
    val admitted = Streams.tokenBudgetAdmit(
      mem.toDF.toDF("doc_id", "stratum", "n_tokens"), budgets)
    val q = admitted.toDF.writeStream.format("memory")
      .queryName("tba_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-tba-ckpt"))
      .start()
    mem.addData(docs.map { case (i, st, t) => (i, st, t.toLong) }: _*)
    q.processAllAvailable()
    val got = spark.table("tba_out")
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // zero-budget stratum admits nothing
    assert(!got.keySet.exists(id => docs.find(_._1 == id).exists(_._2 == "s0")))
    // a later batch: an overflowing doc closes its stratum; an s2 doc is
    // admitted only if s2 never overflowed in batch 1 (still open) AND
    // its token fits the remaining budget — strict prefix, no backfill
    mem.addData((100L, "s1", 1000L), (101L, "s2", 1L))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("tba_out")
      .select("doc_id").as[Long].collect().toSet
    assert(!after.contains(100L)) // over budget — dropped, s1 closed
    val s2Docs = docs.filter(_._2 == "s2")
    val s2Admitted = expected.keySet.count(id =>
      s2Docs.exists(_._1 == id))
    val s2Open = s2Admitted == s2Docs.size // no overflow seen in batch 1
    val s2Consumed = expected.collect {
      case (id, cum) if s2Docs.exists(_._1 == id) => cum
    }.maxOption.getOrElse(0L)
    assert(after.contains(101L) === (s2Open && s2Consumed + 1 <= 40L))
  }

  test("stream-stream interval join matches the batch theta join") {
    val lMem = MemoryStream[(Long, Timestamp, Long)](spark)
    val rMem = MemoryStream[(Long, Timestamp, Double)](spark)
    val l = lMem.toDF.toDF("user_id", "ts", "purchase_id")
      .withWatermark("ts", "2 hours")
    val r = rMem.toDF.toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours")
    val joined = Streams.intervalJoin(l, r, "user_id", windowSeconds = 3600)
      .select(col("l.purchase_id"), col("r.value"))
    val q = joined.writeStream.format("memory")
      .queryName("ij_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-ij-ckpt"))
      .start()
    rMem.addData((7L, ts("2024-01-10 09:30:00"), 1.0),  // in window
      (7L, ts("2024-01-10 08:00:00"), 2.0),             // too old
      (8L, ts("2024-01-10 09:45:00"), 3.0))             // other key
    lMem.addData((7L, ts("2024-01-10 10:00:00"), 100L))
    q.processAllAvailable()
    // right row arriving AFTER the left (but in-window by event time)
    // still joins — stream-stream buffers both sides
    rMem.addData((7L, ts("2024-01-10 09:59:00"), 4.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ij_out").as[(Long, Double)].collect().toSet
    assert(out === Set((100L, 1.0), (100L, 4.0)))
  }

  test("runningTotals state evicts after event-time idle timeout") {
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val totals = Streams.runningTotals(
      mem.toDF.toDF("user_id", "ts", "value").withWatermark("ts", "1 hour"),
      idleTimeout = "1 day")
    val q = totals.toDF.writeStream.format("memory")
      .queryName("evict_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-evict-ckpt"))
      .start()
    mem.addData((1L, ts("2024-01-10 10:00:00"), 5.0))
    q.processAllAvailable()
    // advance the watermark far past user 1's idle timeout (state dies)
    mem.addData((2L, ts("2024-02-20 10:00:00"), 1.0))
    q.processAllAvailable()
    // user 1 returns: running count must restart at 1, not continue at 2
    mem.addData((1L, ts("2024-02-20 11:00:00"), 7.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("evict_out")
      .select("user_id", "running_n", "running_sum")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 1L, 5.0), (2L, 1L, 1.0), (1L, 1L, 7.0)))
  }

  test("streaming decontamination flags the same docs as the batch operator") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val trainRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "2024-01-10 12:00:00"), // copy
      (2L, "one two three four five six seven", "2024-01-10 12:01:00"),   // clean
      (3L, "x alpha beta gamma delta epsilon y", "2024-01-10 12:02:00"))  // partial
    val benchGrams = graft.operators.Corpus
      .decontaminateBenchGrams(bench, col("text"), n = 5)
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val flagged = Streams.decontaminateStream(
      mem.toDF.toDF("doc_id", "text", "ts").withWatermark("ts", "1 hour"),
      benchGrams, "doc_id", "text", n = 5)
    val q = flagged.writeStream.format("memory")
      .queryName("decon_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-decon-ckpt"))
      .start()
    trainRows.foreach { case (id, text, ts) =>
      mem.addData((id, text, Timestamp.valueOf(ts)))
    }
    q.processAllAvailable()
    // re-delivery within the horizon must not re-flag
    mem.addData((1L, trainRows.head._2, Timestamp.valueOf("2024-01-10 12:30:00")))
    q.processAllAvailable()
    q.stop()
    val streamIds = spark.table("decon_out")
      .select("doc_id").as[Long].collect().toSet
    val batchIds = graft.operators.Corpus.decontaminate(
        trainRows.toDF("doc_id", "text", "ts"), bench,
        col("doc_id"), col("text"), n = 5)
      .select("id").as[Long].collect().toSet
    assert(streamIds === batchIds)
    assert(streamIds === Set(1L, 3L))
  }

  test("streaming decontamination with the Bloom prefilter flags exactly " +
      "the same docs (exact confirm erases sketch false positives)") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val trainRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "2024-01-10 12:00:00"),
      (2L, "one two three four five six seven", "2024-01-10 12:01:00"),
      (3L, "x alpha beta gamma delta epsilon y", "2024-01-10 12:02:00"))
    val benchGrams = graft.operators.Corpus
      .decontaminateBenchGrams(bench, col("text"), n = 5)
    // fpp 0.5: a deliberately sloppy sketch — the exact join must still
    // keep the flagged set identical to the batch operator's
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val flagged = Streams.decontaminateStream(
      mem.toDF.toDF("doc_id", "text", "ts").withWatermark("ts", "1 hour"),
      benchGrams, "doc_id", "text", n = 5, bloomFpp = Some(0.5))
    val q = flagged.writeStream.format("memory")
      .queryName("decon_bloom_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-decon-bloom-ckpt"))
      .start()
    trainRows.foreach { case (id, text, ts) =>
      mem.addData((id, text, Timestamp.valueOf(ts)))
    }
    q.processAllAvailable()
    q.stop()
    val streamIds = spark.table("decon_bloom_out")
      .select("doc_id").as[Long].collect().toSet
    assert(streamIds === Set(1L, 3L))
  }

  test("state-store hygiene: event-time timeout really EVICTS — state " +
      "rows peak, then drop to the in-horizon survivors (numRowsTotal " +
      "ledger, the COVERAGE §2.8 bound asserted, not narrated)") {
    // spanDedupIngest, 1-hour watermark + 1-hour idle timeout: the two
    // day-1 tile states must leave the store once a later batch's
    // watermark passes their timeout timestamps
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val kept = Streams.spanDedupIngest(
      mem.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 hour"),
      spanWords = 3, idleTimeout = "1 hour")
    val q = kept.writeStream.format("memory")
      .queryName("span_state_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-span-state-ckpt"))
      .start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    // batch 1: doc 1 owns tiles [a b c] and [d e f] → 2 state rows
    mem.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00"), "a b c d e f"))
    q.processAllAvailable()
    assert(stateRows === 2L, "two tile states after batch 1")
    // batch 2 jumps event time 2 days past the day-1 timeouts; batch 3
    // re-sends the SAME tile (suppressed, adds no state) so the final
    // count is deterministic whichever trigger — batch 3 or an
    // interleaved no-data microbatch (noDataMicroBatches, on by
    // default; its timing is not observable from processAllAvailable) —
    // actually fires the timeouts: exactly 1 in-horizon tile state.
    mem.addData((2L, Timestamp.valueOf("2024-01-03 00:00:00"), "x y z"))
    q.processAllAvailable()
    mem.addData((3L, Timestamp.valueOf("2024-01-03 00:10:00"), "x y z"))
    q.processAllAvailable()
    assert(stateRows === 1L,
      s"eviction failed: $stateRows tile states resident (want 1 — the " +
        "two day-1 tiles removed, the day-3 tile kept)")
    q.stop()

    // same protocol for the near-dup bucket gate: day-1 BUCKET states
    // evicted, only in-horizon buckets resident
    val mem2 = MemoryStream[(Long, Timestamp, String)](spark)
    val cands = Streams.nearDupIngest(
      mem2.toDF.toDF("doc_id", "ts", "text").withWatermark("ts", "1 hour"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.5,
      idleTimeout = "1 hour")
    val q2 = cands.writeStream.format("memory")
      .queryName("neardup_state_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-neardup-state-ckpt"))
      .start()
    def stateRows2: Long =
      q2.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val day3doc = "yet another novel and unrelated document body text here"
    mem2.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00"), doc))
    q2.processAllAvailable()
    val day1Buckets = stateRows2
    assert(day1Buckets > 0L, "bucket states after batch 1")
    // batch 2 jumps event time 2 days: its buckets coexist with day-1's
    // until a post-watermark trigger fires the timeouts
    mem2.addData((2L, Timestamp.valueOf("2024-01-03 00:00:00"), day3doc))
    q2.processAllAvailable()
    // batch 3 re-sends day-3 CONTENT (a dup of doc 2, new id): its band
    // keys hit only EXISTING buckets, so it adds zero state rows — a
    // deterministic eviction trigger whichever batch (3 or a no-data
    // microbatch) actually fires the timeouts. Day-3 and day-1 texts
    // differ, so their band keys are disjoint: the final count equals
    // day-3's own bucket count (= day1Buckets, one per band) iff every
    // day-1 bucket left; an eviction failure would read 2x.
    mem2.addData((3L, Timestamp.valueOf("2024-01-03 00:10:00"), day3doc))
    q2.processAllAvailable()
    q2.stop()
    assert(stateRows2 === day1Buckets,
      s"day-1 buckets survived the horizon: $stateRows2 resident " +
        s"(want $day1Buckets — the day-3 doc's own buckets only)")
  }

  test("heavy hitters stream state is shard-bounded: numRowsTotal == " +
      "active shards, regardless of key cardinality") {
    val mem = MemoryStream[String](spark)
    val cands = Streams.heavyHittersStream(mem.toDF.toDF("k"), "k",
      capacity = 8, nShards = 4)
    val q = cands.toDF.writeStream.format("memory")
      .queryName("hh_state_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-hh-state-ckpt"))
      .start()
    mem.addData((0 until 500).map(i => s"key$i"): _*)
    q.processAllAvailable()
    val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // 500 distinct keys, but state is ONE row per shard (a Misra-Gries
    // counter map ≤ capacity entries inside) — the running-census bound
    assert(rows <= 4L, s"state rows $rows exceed the shard count")
    assert(rows > 0L)
  }

  test("streaming heavy hitters: every true heavy key survives, estimates " +
      "within the Misra-Gries bound, state capacity-bounded per shard") {
    val capacity = 8
    val nShards = 4
    // 120 "hot1" + 100 "hot2" + 280 near-unique tail = 500 rows;
    // global threshold N/capacity = 62.5 → both hot keys are certified
    // candidates no matter how the tail shards
    val batch1 = Seq.fill(70)("hot1") ++ Seq.fill(40)("hot2") ++
      (0 until 140).map(i => s"tail$i")
    val batch2 = Seq.fill(50)("hot1") ++ Seq.fill(60)("hot2") ++
      (140 until 280).map(i => s"tail$i")
    val mem = MemoryStream[String](spark)
    val cands = Streams.heavyHittersStream(mem.toDF.toDF("k"), "k",
      capacity = capacity, nShards = nShards)
    val q = cands.toDF.writeStream.format("memory")
      .queryName("hh_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-hh-ckpt"))
      .start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions.{col, max}
    val all = spark.table("hh_out")
      .as[(Int, Long, String, Long)].collect()
    // latest snapshot per shard (MG counts can DECREASE — keep by
    // version, not by max count)
    val latestVer = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val latest = all.filter { case (s, v, _, _) => v == latestVer(s) }
    val est = latest.map { case (_, _, k, c) => k -> c }.toMap
    assert(est.contains("hot1") && est.contains("hot2"),
      s"certified heavy keys missing from $est")
    // MG bound: true − N/capacity ≤ est ≤ true (N = 500 global slack)
    assert(est("hot1") <= 120 && est("hot1") >= 120 - 500 / capacity)
    assert(est("hot2") <= 100 && est("hot2") >= 100 - 500 / capacity)
    // state bound: each shard's snapshot holds at most `capacity` keys
    latest.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length <= capacity, s"shard $s exceeded capacity")
    }
    // the batch operator's exact top-2 keys are both among the streaming
    // candidates (candidates ⊇ certified heavy hitters — the contract
    // that lets the exact recount run downstream)
    val exact = graft.operators.HeavyHitters.topKFrequent(
        (batch1 ++ batch2).toDF("k"), "k", 2, capacity = 64)
      .collect().map(_.getString(0)).toSet
    assert(exact === Set("hot1", "hot2"))
    assert(exact.subsetOf(est.keySet))
  }

  test("streaming PSI drift: matched window scores ~0, shifted window " +
      "scores high; stream equals the batch form of the same expression") {
    // reference: uniform over 0..99 → 5 equal bins
    val ref = (0 until 100).map(_.toDouble).toDF("x")
    val (edges, pRef) = graft.quality.Drift.referenceProfile(ref, col("x"), bins = 5)
    assert(edges.size === 4 && pRef.forall(p => math.abs(p - 0.2) < 1e-9))
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-10 ${10 + min / 60}%02d:${min % 60}%02d:00")
    // window A (hour 10): same uniform distribution; window B (hour 11):
    // everything in the top bin
    val rowsA = (0 until 100).map(i => (ts(i % 50), i.toDouble))
    val rowsB = (0 until 80).map(i => (ts(60 + i % 50), 95.0))
    val mem = MemoryStream[(Timestamp, Double)](spark)
    val out = Streams.psiDriftStream(
      mem.toDF.toDF("ts", "value").withWatermark("ts", "10 minutes"),
      col("value"), edges, pRef, windowLength = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("psi_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-psi-ckpt"))
      .start()
    mem.addData(rowsA ++ rowsB: _*)
    q.processAllAvailable()
    q.stop()
    // update mode re-emits windows as they grow — keep the final (max n)
    // row per window
    val byWindow = spark.table("psi_out")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val a = byWindow("2024-01-10 10:00:00")
    val b = byWindow("2024-01-10 11:00:00")
    assert(a._2 === 100L && math.abs(a._3) < 1e-9,
      s"matched window must score ~0, got $a")
    assert(b._2 === 80L && b._3 > 1.0, s"shifted window must score high, got $b")
    // the same function over the same rows as a BATCH frame is the twin
    val batch = Streams.psiDriftStream(
        (rowsA ++ rowsB).toDF("ts", "value"), col("value"), edges, pRef,
        windowLength = "1 hour")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, math.round(r._3 * 1e9)))).toMap
    val stream = byWindow.view
      .mapValues(r => (r._2, math.round(r._3 * 1e9))).toMap
    assert(stream === batch)
  }

  test("streaming contract monitor: clean window valid, dirty window's " +
      "error/warning counts match the batch severity semantics") {
    import graft.quality.Contracts.{ColumnContract, DataContract}
    val contract = DataContract(
      name = "stream_recs",
      requiredColumns = Seq("id"),
      columns = Seq(
        ColumnContract("id", "string", nullable = false, unique = true),
        ColumnContract("amount", "numeric", minValue = Some(0)),
        ColumnContract("kind", "string",
          allowedValues = Some(Set("A", "B")))))
    def ts(s: String) = Timestamp.valueOf(s)
    // hour 10: clean; hour 11: null id (error), dup id (error),
    // negative amount (error), kind=C (warning)
    val clean = Seq(
      ("r1", 10.0, "A", ts("2024-01-10 10:00:00")),
      ("r2", 20.0, "B", ts("2024-01-10 10:30:00")))
    val dirty = Seq(
      (null.asInstanceOf[String], 5.0, "A", ts("2024-01-10 11:00:00")),
      ("r3", -4.0, "C", ts("2024-01-10 11:10:00")),
      ("r4", 1.0, "A", ts("2024-01-10 11:20:00")),
      ("r4", 2.0, "B", ts("2024-01-10 11:30:00")))
    val mem = MemoryStream[(String, Double, String, Timestamp)](spark)
    val out = Streams.contractMonitor(
      mem.toDF.toDF("id", "amount", "kind", "ts")
        .withWatermark("ts", "10 minutes"),
      contract, windowLength = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("contract_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-contract-ckpt"))
      .start()
    mem.addData(clean ++ dirty: _*)
    q.processAllAvailable()
    q.stop()
    val byWindow = spark.table("contract_out")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val a = byWindow("2024-01-10 10:00:00")
    assert(a === (("2024-01-10 10:00:00", 2L, 0L, 0L, true)))
    val b = byWindow("2024-01-10 11:00:00")
    // errors: 1 null id + 1 dup id + 1 below-min = 3; warnings: kind=C
    assert(b === (("2024-01-10 11:00:00", 4L, 3L, 1L, false)))
  }

  test("streaming funnel completions equal the batch funnel counts") {
    val dir = tmp("graft-funnel-events")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val stages = Seq("view", "click", "purchase")
    val completions = Streams.funnelStream(
      Streams.readEvents(spark, dir), stages)
    val q = completions.writeStream.format("memory")
      .queryName("funnel_out").outputMode("append")
      .option("checkpointLocation", tmp("graft-funnel-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("funnel_out")
      .groupBy("stage").count().orderBy("stage")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = graft.operators.EventAnalytics.funnel(
        Tables.load(spark, "/root/testdata/sf0.001", "events"),
        col("user_id"), col("ts"), col("event_type"), stages)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.getOrElse(1, 0L) === batch("stage1_view"))
    assert(streamed.getOrElse(2, 0L) === batch("stage2_click"))
    assert(streamed.getOrElse(3, 0L) === batch("stage3_purchase"))
  }

  test("T3: idempotent batch writer — replayed batch does not duplicate") {
    val out = tmp("graft-sink")
    val writer = Streams.idempotentBatchWriter(out, Seq("id"))
    val batch = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v")
    writer(batch, 7L)        // first delivery (with an in-batch duplicate)
    writer(batch, 7L)        // at-least-once replay of the same batch
    val persisted = spark.read.parquet(out)
    assert(persisted.count() == 2, "replay must overwrite, not append")
    writer(batch.withColumn("id", col("id") + 10), 8L) // next batch appends
    assert(spark.read.parquet(out).count() == 4)
  }

  test("readEvents ts probe: empty/nonexistent dir falls back to the " +
      "nanos-long default; a present dir with junk files fails LOUDLY") {
    // empty dir: start-stream-before-data works
    val empty = tmp("graft-ev-empty")
    assert(Streams.readEvents(spark, empty).isStreaming)
    // a NONEXISTENT dir is refused by Spark's own file-source setup
    // (PATH_NOT_FOUND) — the probe's fallback must not mask that either
    intercept[org.apache.spark.sql.AnalysisException] {
      Streams.readEvents(spark, s"$empty/not-yet-created")
    }
    // dot/underscore metadata files don't count as data: still the fallback
    val metaOnly = tmp("graft-ev-meta")
    Files.writeString(Paths.get(metaOnly, "_SUCCESS"), "")
    assert(Streams.readEvents(spark, metaOnly).isStreaming)
    // files INSIDE a metadata directory don't count either — an
    // initialized-but-empty streaming sink holds _spark_metadata/0
    val sinkInit = tmp("graft-ev-sinkmeta")
    Files.createDirectory(Paths.get(sinkInit, "_spark_metadata"))
    Files.writeString(Paths.get(sinkInit, "_spark_metadata", "0"), "v1")
    assert(Streams.readEvents(spark, sinkInit).isStreaming)
    // a dir with an unreadable data file must throw at SETUP — not
    // silently decode the whole stream with the default ts type
    val junk = tmp("graft-ev-junk")
    Files.writeString(Paths.get(junk, "garbage.parquet"), "not parquet")
    intercept[Exception] { Streams.readEvents(spark, junk) }
  }

  test("kmvIngest: latest per-key snapshot equals the batch kmvSketch " +
      "over all streamed rows, split across micro-batches (exact merge " +
      "property end-to-end)") {
    import graft.operators.Sketches
    val k = 16
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"), col("text")).limit(400)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val mem = MemoryStream[(String, Timestamp, String)](spark)
    val snaps = Streams.kmvIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 day"),
      k = k)
    val q = snaps.writeStream.format("memory")
      .queryName("kmv_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-kmv-ckpt"))
      .start()
    // arbitrary 3-way split with interleaved sources — merge exactness
    // means the split must not matter
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    docs.grouped(150).foreach { chunk =>
      mem.addData(chunk.map { case (src, _, text) => (src, t, text) }.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val latest = spark.table("kmv_out").as[(String, Long, Seq[Long])]
      .collect().groupBy(_._1)
      .map { case (key, rows) => key -> rows.maxBy(_._2)._3.toList }
    val batchDf = docs.toSeq.toDF("key", "doc_id", "value")
    val batch = Sketches.kmvSketch(batchDf, Seq("key"), col("value"), k)
      .as[(String, Seq[Long])].collect()
      .map { case (key, sk) => key -> sk.toList }.toMap
    assert(latest === batch,
      "streamed final sketches must equal the batch twin's exactly")
    // every snapshot is ascending and ≤ k — the bounded-state contract
    spark.table("kmv_out").as[(String, Long, Seq[Long])].collect()
      .foreach { case (_, _, sk) =>
        assert(sk.size <= k && sk == sk.sorted)
      }
  }

  test("kmvIngest: idle keys are event-time EVICTED — state rows drop " +
      "to the in-horizon survivors") {
    val mem = MemoryStream[(String, Timestamp, String)](spark)
    val snaps = Streams.kmvIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 hour"),
      k = 8, idleTimeout = "1 hour")
    val q = snaps.writeStream.format("memory")
      .queryName("kmv_state_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-kmv-state-ckpt"))
      .start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    mem.addData(("a", Timestamp.valueOf("2024-01-01 00:00:00"), "v1"),
      ("b", Timestamp.valueOf("2024-01-01 00:00:00"), "v2"))
    q.processAllAvailable()
    assert(stateRows === 2L, "two key states after batch 1")
    // jump event time 2 days past the day-1 timeouts, then a same-key
    // re-send so the final count is deterministic whichever trigger
    // fires the timeouts (same protocol as the span-gate hygiene test)
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:00:00"), "v3"))
    q.processAllAvailable()
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:10:00"), "v4"))
    q.processAllAvailable()
    assert(stateRows === 1L,
      s"eviction failed: $stateRows key states resident (want 1 — a and " +
        "b removed, c kept)")
    // the surviving key's sketch still accumulated across its batches
    val cSk = spark.table("kmv_state_out").as[(String, Long, Seq[Long])]
      .collect().filter(_._1 == "c").maxBy(_._2)._3
    assert(cSk.size === 2, "c's sketch holds both its distinct values")
    q.stop()
  }

  test("cmsIngest: latest per-key snapshot equals the batch cmsSketch " +
      "over all streamed rows, split across micro-batches (additive-cell " +
      "merge property end-to-end)") {
    import graft.operators.Sketches
    val (depth, width) = (4, 64)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"), col("text")).limit(400)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val mem = MemoryStream[(String, Timestamp, String)](spark)
    val snaps = Streams.cmsIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 day"),
      depth = depth, width = width)
    val q = snaps.writeStream.format("memory")
      .queryName("cms_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-cms-ckpt"))
      .start()
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    docs.grouped(150).foreach { chunk =>
      mem.addData(chunk.map { case (src, _, text) => (src, t, text) }.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val latest = spark.table("cms_out")
      .as[(String, Long, Seq[(Int, Long, Long)])]
      .collect().groupBy(_._1)
      .map { case (key, rows) =>
        key -> rows.maxBy(_._2)._3.sortBy(c => (c._1, c._2)).toList }
    val batchDf = docs.toSeq.toDF("key", "doc_id", "value")
    val batch = Sketches.cmsSketch(batchDf, Seq("key"), col("value"),
        depth, width)
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (key, rows) =>
        key -> rows.map(r => (r._2, r._3, r._4))
          .sortBy(c => (c._1, c._2)).toList }
    assert(latest === batch,
      "streamed final CMS cells must equal the batch twin's exactly")
    // bounded-state contract: every snapshot holds <= depth*width cells,
    // all counts positive
    spark.table("cms_out").as[(String, Long, Seq[(Int, Long, Long)])]
      .collect().foreach { case (_, _, cells) =>
        assert(cells.size <= depth * width)
        assert(cells.forall(c => c._3 > 0 && c._1 >= 0 && c._1 < depth &&
          c._2 >= 0 && c._2 < width))
      }
  }

  test("cmsIngest: idle keys are event-time EVICTED — state rows drop " +
      "to the in-horizon survivors") {
    val mem = MemoryStream[(String, Timestamp, String)](spark)
    val snaps = Streams.cmsIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 hour"),
      depth = 2, width = 16, idleTimeout = "1 hour")
    val q = snaps.writeStream.format("memory")
      .queryName("cms_state_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-cms-state-ckpt"))
      .start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    mem.addData(("a", Timestamp.valueOf("2024-01-01 00:00:00"), "v1"),
      ("b", Timestamp.valueOf("2024-01-01 00:00:00"), "v2"))
    q.processAllAvailable()
    assert(stateRows === 2L, "two key states after batch 1")
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:00:00"), "v3"))
    q.processAllAvailable()
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:10:00"), "v3"))
    q.processAllAvailable()
    assert(stateRows === 1L,
      s"eviction failed: $stateRows key states resident (want 1 — a and " +
        "b removed, c kept)")
    // the surviving key's counters accumulated across its batches:
    // the same value arrived twice, so every cell counts 2
    val cCells = spark.table("cms_state_out")
      .as[(String, Long, Seq[(Int, Long, Long)])]
      .collect().filter(_._1 == "c").maxBy(_._2)._3
    assert(cCells.size === 2 && cCells.forall(_._3 == 2L),
      "c's 2 cells (one per row) each count its value twice")
    q.stop()
  }

  test("histIngest: latest per-key snapshot equals the batch " +
      "histogramSketch over all streamed rows, split across " +
      "micro-batches (additive-bin merge property end-to-end)") {
    import graft.operators.Sketches
    val (lo, hi, bins) = (0.0, 500.0, 50)
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("value")).filter(col("value").isNotNull)
      .limit(600)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val mem = MemoryStream[(String, Timestamp, Double)](spark)
    val snaps = Streams.histIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 day"),
      lo = lo, hi = hi, bins = bins)
    val q = snaps.writeStream.format("memory")
      .queryName("hist_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-hist-ckpt"))
      .start()
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    ev.grouped(200).foreach { chunk =>
      mem.addData(chunk.map { case (k, v) => (k, t, v) }.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val latest = spark.table("hist_out")
      .as[(String, Long, Seq[(Long, Long)])]
      .collect().groupBy(_._1)
      .map { case (key, rows) =>
        key -> rows.maxBy(_._2)._3.sortBy(_._1).toList }
    val batchDf = ev.toSeq.toDF("key", "value")
    val batch = Sketches.histogramSketch(batchDf, Seq("key"), col("value"),
        lo, hi, bins)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (key, rows) =>
        key -> rows.map(r => (r._2, r._3)).sortBy(_._1).toList }
    assert(latest === batch,
      "streamed final histogram bins must equal the batch twin's exactly")
    // bounded-state contract: <= bins cells, all in range, counts positive
    spark.table("hist_out").as[(String, Long, Seq[(Long, Long)])]
      .collect().foreach { case (_, _, cells) =>
        assert(cells.size <= bins)
        assert(cells.forall(c => c._2 > 0 && c._1 >= 0 && c._1 < bins))
      }
  }

  test("histIngest: idle keys are event-time EVICTED — state rows drop " +
      "to the in-horizon survivors") {
    val mem = MemoryStream[(String, Timestamp, Double)](spark)
    val snaps = Streams.histIngest(
      mem.toDF.toDF("key", "ts", "value").withWatermark("ts", "1 hour"),
      lo = 0.0, hi = 10.0, bins = 10, idleTimeout = "1 hour")
    val q = snaps.writeStream.format("memory")
      .queryName("hist_state_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-hist-state-ckpt"))
      .start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    mem.addData(("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1.5),
      ("b", Timestamp.valueOf("2024-01-01 00:00:00"), 2.5))
    q.processAllAvailable()
    assert(stateRows === 2L, "two key states after batch 1")
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:00:00"), 3.5))
    q.processAllAvailable()
    mem.addData(("c", Timestamp.valueOf("2024-01-03 00:10:00"), 3.7))
    q.processAllAvailable()
    assert(stateRows === 1L,
      s"eviction failed: $stateRows key states resident (want 1 — a and " +
        "b removed, c kept)")
    // both of c's values land in bin 3 — one cell counting 2
    val cCells = spark.table("hist_state_out")
      .as[(String, Long, Seq[(Long, Long)])]
      .collect().filter(_._1 == "c").maxBy(_._2)._3
    assert(cCells === Seq((3L, 2L)))
    q.stop()
  }

  test("opsMetricsRollup: streamed request-log panels across micro-batches " +
      "equal the batch twin; late row lands in ITS window") {
    val mem = MemoryStream[(Timestamp, String, Int, Double, Long)](spark)
    val out = Streams.opsMetricsRollup(
      mem.toDF.toDF("ts", "route", "status", "latency_ms", "rows"),
      watermark = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("ops_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-ops-ckpt"))
      .start()
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")
    val rowsIn = Seq(
      (t(0), "/api/recommendations", 200, 12.0, 3L),
      (t(1), "/api/recommendations", 500, 90.0, 0L),
      (t(2), "/api/recommendations/{id}", 200, 5.0, 1L),
      (t(6), "/api/recommendations", 200, 8.0, 3L))
    mem.addData(rowsIn.take(2): _*)
    q.processAllAvailable()
    // second batch carries a LATE row for the first window (in-horizon)
    mem.addData(rowsIn.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    // latest update per (window, route) snapshot == the batch twin over
    // all rows — the panel math is batch-identical including the sketch
    val streamed = spark.table("ops_out")
      .groupBy("window_start", "route")
      .agg(max(struct(col("n_requests"), col("success_rate"),
        col("error_rate"), col("p95_latency_ms"), col("rows_served")))
        .as("m"))
      .select(col("window_start"), col("route"), col("m.*"))
    val batch = Streams.opsMetricsRollup(
      rowsIn.toDF("ts", "route", "status", "latency_ms", "rows"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streamed ops panels diverge from the batch twin")
    // the 5xx landed in the first recommendations window: error_rate 0.5
    val w0 = batch.filter(col("route") === "/api/recommendations" &&
      col("window_start") === "2024-01-01 10:00:00").head
    assert(w0.getAs[Long]("n_requests") == 2L)
    assert(math.abs(w0.getAs[Double]("error_rate") - 0.5) < 1e-12)
  }
}
