package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming realizations of the reference's four
 * incremental/micro-batch patterns (SURVEY §2.8):
 *
 *   T1 watermark incremental sync   (reference: data_contracts.py:235-275)
 *   T2 scheduled micro-batch runs   (reference: orchestrator.py:471-495)
 *   T3 buffered idempotent log sink (reference: feedback_logging.py:327-384)
 *   T4 event-time daily rollups     (reference: dashboard.py:71-79,
 *                                    api/main.py:750-761)
 *
 * Scale notes (100 TB / continuous ingest): the rollup state is bounded by
 * the watermark horizon × group cardinality — state eviction is what makes
 * a day-window aggregate run forever on an unbounded stream. File-source
 * streams track seen files in the checkpoint; `maxFilesPerTrigger` bounds
 * per-batch work. foreachBatch writes land in per-batch directories so a
 * replayed batch overwrites itself (exactly-once on top of at-least-once
 * delivery — same contract as the reference's session.merge upsert).
 */
/** Output row of [[Streams.runningTotals]]. */
case class RunningTotal(user_id: Long, ts: java.sql.Timestamp,
                        running_n: Long, running_sum: Double)

/** Closed validity interval emitted by [[Streams.scd2Intervals]]. */
case class NearDupCandidate(a_id: Long, b_id: Long, est: Double)

/** First-occurrence tile kept by [[Streams.spanDedupIngest]]. */
case class SpanKeep(doc_id: Long, idx: Int)

/** Per-doc excision result emitted by [[Streams.boilerplateIngest]] —
  * same shape as the batch `Corpus.removeBoilerplate` output row. */
case class BoilerplateDoc(doc_id: Long, n_tiles: Long, n_kept: Long,
                          n_dropped: Long, rebuilt_md5: String)

/** Per-doc LM score emitted by [[Streams.lmScoreIngest]] — same values
  * as the batch `NgramLm.scoreNll` row (`avg_nll` None for token-less
  * docs, as the batch twin's NULL). */
case class LmScoredDoc(doc_id: Long, n_tokens: Int, avg_nll: Option[Double])

/** Per-doc DSIR importance weight emitted by
  * [[Streams.dsirScoreIngest]] — same values as the batch
  * `Dsir.importanceWeights` row (docs with zero grams are absent, as
  * in the batch twin). */
case class DsirScoredDoc(doc_id: Long, n_grams: Int, log_w: Double)

case class StageCompletion(user_id: Long, stage: Int,
                           ts: java.sql.Timestamp)

case class Scd2Interval(user_id: Long, state: String,
                        valid_from: java.sql.Timestamp,
                        valid_to: java.sql.Timestamp)

/** Per-trigger candidate snapshot emitted by
  * [[Streams.heavyHittersStream]] — consumers keep each shard's max
  * `version` (Misra-Gries counts can decrease, so "latest", not "max
  * count", is the merge rule). */
case class HhCandidate(shard: Int, version: Long, key: String, cnt: Long)

/** Doc admitted by [[Streams.tokenBudgetAdmit]] — `cum_tokens` is the
  * stratum's consumed budget AS OF this admission. */
case class AdmittedDoc(doc_id: Long, stratum: String, n_tokens: Long,
                       cum_tokens: Long)

/** Per-trigger KMV sketch snapshot emitted by [[Streams.kmvIngest]] —
  * consumers keep each key's max `version` (latest-wins merge: a later
  * snapshot's sketch supersedes, never merges with, an earlier one —
  * each snapshot already summarizes the key's WHOLE in-horizon
  * history, because bottom-k merge is exact). */
case class KmvSnapshot(key: String, version: Long, sk: Seq[Long])

/** One non-empty CMS counter cell inside a [[CmsSnapshot]]. */
case class CmsCell(r: Int, bucket: Long, cnt: Long)

/** Per-trigger count-min sketch snapshot emitted by
  * [[Streams.cmsIngest]] — consumers keep each key's max `version`
  * (latest-wins merge, the [[KmvSnapshot]] rule: every snapshot already
  * counts the key's WHOLE in-horizon history, because CMS cells are
  * exact additive counters). Cells are the NON-EMPTY entries of the
  * depth×width matrix, sorted by (r, bucket). */
case class CmsSnapshot(key: String, version: Long, cells: Seq[CmsCell])

/** One non-empty histogram bin inside a [[HistSnapshot]]. */
case class HistCell(bin: Long, cnt: Long)

/** Per-trigger fixed-bin histogram snapshot emitted by
  * [[Streams.histIngest]] — latest-wins merge, the [[CmsSnapshot]]
  * rule (bin counts are exact additive counters; every snapshot
  * already counts the key's whole in-horizon history). */
case class HistSnapshot(key: String, version: Long, cells: Seq[HistCell])

object Streams {

  /** Millis in a day-or-smaller interval string ("30 days", "1 hour"). */
  private def intervalMs(d: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(d))
    require(iv.months == 0,
      s"calendar-month timeouts are not supported (got '$d')")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Set the group's event-time timeout to maxEventMs + idleTimeout,
    * guarding the Structured Streaming rule that a timeout must sit
    * strictly beyond the current watermark — a violating
    * `setTimeoutTimestamp` THROWS in the handler and kills the whole
    * query. In the current engine this is defense-in-depth, not a
    * reachable crash: FlatMapGroupsWithStateExec pre-filters input rows
    * behind the watermark (StreamsSpec pins the drop), so every row the
    * handler sees satisfies ts >= watermark and the computed timeout is
    * legal. The guard covers the configurations where that input filter
    * is absent (no event-time column on the input, engine semantics
    * changes): an already-expired timeout means the group is due for
    * eviction anyway, so evict now (`state.remove()`) — observably
    * identical to the timeout firing on the next trigger, and it covers
    * the brand-new-group case that would otherwise linger timeout-less
    * forever. */
  private def setGuardedTimeout(state: org.apache.spark.sql.streaming.GroupState[_],
                                maxEventMs: Long, idleTimeout: String): Unit = {
    val at = maxEventMs + intervalMs(idleTimeout)
    if (at > state.getCurrentWatermarkMs()) state.setTimeoutTimestamp(at)
    else state.remove()
  }

  /** events table schema for the streaming file source (streams require an
    * explicit schema). `ts` has shipped as TIMESTAMP(NANOS)-as-long in some
    * testdata generations and TIMESTAMP(MICROS, NTZ) in others;
    * [[readEvents]] probes the directory's parquet footer (a batch
    * metadata-only read) and swaps the ts field to the physical type it
    * finds, then normalizes via [[graft.sources.Tables.normalizeEventTs]]. */
  def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType = LongType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** T1 (stream form): file-source stream of events with an event-time
    * watermark. `dir` must contain only events parquet files, and the
    * directory must be ts-HOMOGENEOUS: the physical `ts` type is probed
    * from whatever files exist at start time (a batch metadata-only
    * read) and fixed for the stream's lifetime, so a directory mixing
    * nanos-long and NTZ-micros files would mis-decode the minority type
    * mid-stream. An EMPTY directory is fine — the probe falls back to
    * the nanos-long default and the continuous-ingest
    * start-stream-before-data pattern still works (files arriving later
    * must then be nanos-long, the testdata generator's default). */
  def readEvents(spark: SparkSession, dir: String,
                 watermark: String = "1 day",
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // SESSION-WIDE by contract, not an accident: Tables.load sets the
    // same flag (Tables.scala — every engine session reads TIMESTAMP
    // (NANOS) parquet as long + explicit conversion), so batch and
    // stream decode identically. Scoping it per-read would let the two
    // paths diverge on the same files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // fall back ONLY when the directory is genuinely absent or holds no
    // data files (the start-stream-before-data pattern). The emptiness is
    // decided by LISTING, not by catching AnalysisException — a present
    // directory whose files merely fail schema inference (non-parquet
    // junk, no ts column) must fail loudly at setup, not silently
    // mis-decode for the stream's lifetime.
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    // a file counts as data only if NO path component below `dir` is
    // hidden/metadata (_spark_metadata/0 from an initialized-but-empty
    // sink must NOT defeat the start-stream-before-data fallback)
    val qualified = fs.makeQualified(hPath).toString
    val hasDataFiles = fs.exists(hPath) && {
      val it = fs.listFiles(hPath, true)
      var found = false
      while (!found && it.hasNext) {
        val rel = it.next().getPath.toString.stripPrefix(qualified)
          .stripPrefix("/")
        found = rel.split("/")
          .forall(seg => !seg.startsWith("_") && !seg.startsWith("."))
      }
      found
    }
    val tsType =
      if (hasDataFiles) spark.read.parquet(dir).schema("ts").dataType
      else LongType
    val reader = spark.readStream.schema(eventsRawSchema(tsType))
    val tuned = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    graft.sources.Tables.normalizeEventTs(tuned.parquet(dir))
      .withWatermark("ts", watermark)
  }

  /**
   * Streaming ops-metrics rollup — the /api/metrics Grafana panel math
   * ([[graft.serve.OpsMetrics.rollup]], q207) over a request-log
   * STREAM: per (tumbling window, route template) the request count,
   * success/error rates, p95 latency, and rows served. This is the
   * production shape of the panels proper (Prometheus `rate(...[5m])`
   * IS a windowed stream rollup); the in-process Recorder is the
   * point-in-time scrape surface.
   *
   * p95 here is the mergeable `percentile_approx` sketch, NOT the
   * batch rollup's exact rank selection — the psiBins/psiBinsApprox
   * split: exact rank needs a per-group global sort (fine on a bounded
   * batch log, unbounded state on a stream); the sketch's rank error is
   * immaterial against an alerting threshold (`OpsP95DivergenceSpec` +
   * the `ops_p95_approx_rel_err` ledger golden bound it on a skewed
   * latency fixture). State per window = the route-template label set
   * × one sketch, bounded by construction; the `watermark` horizon is
   * applied HERE on `ts` (the feedbackMetricsStream discipline — a
   * caller cannot forget it and leak unbounded update-mode state), a
   * no-op on a batch frame.
   */
  def opsMetricsRollup(reqs: DataFrame,
                       windowLength: String = "5 minutes",
                       accuracy: Int = 10000,
                       watermark: String = "1 hour"): DataFrame =
    reqs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("route"))
      .agg(count(lit(1)).as("n_requests"),
        avg((col("status") >= 200 && col("status") < 300).cast("double"))
          .as("success_rate"),
        avg((col("status") >= 500).cast("double")).as("error_rate"),
        percentile_approx(col("latency_ms"), lit(0.95), lit(accuracy))
          .as("p95_latency_ms"),
        sum(col("rows")).as("rows_served"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("route"), col("n_requests"),
        col("success_rate"), col("error_rate"), col("p95_latency_ms"),
        col("rows_served"))

  /** T4: event-time daily rollup — count + sum(value) per (day, type).
    * On a stream the watermark bounds state; on a batch frame the same
    * expression is the dashboard rollup (q25). */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total_value"))

  /**
   * Online feedback metrics — the STREAMING form of
   * [[graft.ml.Feedback.feedbackMetrics]] (q149's rollup; these are
   * ONLINE metrics, so the event-time-windowed stream is the production
   * habitat): the feedback event stream joins the prediction log as a
   * STREAM-STATIC equi-join (the log is the serving store's slowly-
   * growing table — no stream-stream state, the static side re-reads
   * per micro-batch and prunes on the join key) and aggregates the same
   * counters, guarded rates and decimal revenue per (model_version,
   * day window) — COMPOSED FROM the batch operator's own shared metric
   * expressions (`Feedback.impressionCell`/`typeCell`/`revenueCell`/
   * `metricColumns`), so stream/batch parity holds by construction,
   * not by hand-mirroring. The `watermark` horizon is applied HERE on
   * `created_at` (late feedback beyond it is dropped), bounding
   * open-window state at horizon-days × |versions|; on a batch frame
   * withWatermark is a no-op and the expression is exactly
   * [[graft.ml.Feedback.feedbackMetrics]]'s single-level form.
   * `FeedbackStreamSpec` proves a drain equals the batch operator
   * row-for-row.
   */
  def feedbackMetricsStream(feedback: DataFrame, predictions: DataFrame,
                            watermark: String = "1 day"): DataFrame = {
    import graft.ml.Feedback
    // day-bucket parity: the batch twin's to_date() buckets in the
    // SESSION timezone while window() aligns to the UTC epoch — they
    // agree only in a UTC session (this engine pins UTC at every
    // entrypoint; fail loudly rather than silently shift day rows)
    val tz = feedback.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"feedbackMetricsStream requires spark.sql.session.timeZone=UTC " +
        s"(got $tz): window() buckets days in UTC while the batch " +
        "twin's to_date() uses the session timezone — non-UTC sessions " +
        "would shift events across day rows between the two")
    feedback
      .withWatermark("created_at", watermark)
      .join(predictions.select("prediction_id", "model_version"),
        "prediction_id")
      .groupBy(col("model_version"), window(col("created_at"), "1 day"))
      .agg(
        sum(Feedback.impressionCell).as("impression_count"),
        sum(Feedback.typeCell("clicked")).as("click_count"),
        sum(Feedback.typeCell("accepted")).as("accept_count"),
        sum(Feedback.typeCell("converted")).as("conversion_count"),
        sum(Feedback.revenueCell).as("rev"))
      .select(Feedback.metricColumns(col("model_version"),
        date_format(col("window.start"), "yyyy-MM-dd").as("window_day")): _*)
  }

  /** Sliding event-time rollup — q126's batch aggregate on a stream:
    * overlapping windows (`length`, every `slide`) per event, count +
    * sum(value). window() explodes scan-locally into length/slide
    * windows; the watermark bounds how many stay open (state ≈ windows
    * per horizon × key cardinality — length/slide× the tumbling T4
    * state, the price of the finer grain). Same expression is the batch
    * q126 shape; `StreamsSpec` proves stream == batch. */
  def slidingRollup(events: DataFrame, length: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), length, slide))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("n"), col("total_value"))

  /** T2: run a streaming query as a scheduled micro-batch drain —
    * processes everything available, then stops (the Spark-native form of
    * the reference's cron rerun loop). */
  def runAvailableNow(writer: DataStreamWriter[org.apache.spark.sql.Row],
                      checkpoint: String): StreamingQuery = {
    val q = writer
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** T3: idempotent micro-batch sink. Each batch lands in its own
    * `batch_id=<n>` directory with overwrite, so at-least-once replay of a
    * batch after failure rewrites the same files instead of duplicating
    * (reference's buffered flush + merge upsert semantics). Within-batch
    * duplicates are collapsed on `keyCols` first. */
  def idempotentBatchWriter(outDir: String, keyCols: Seq[String])
      : (DataFrame, Long) => Unit = { (batch, id) =>
    batch.dropDuplicates(keyCols)
      .write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$id")
  }

  /**
   * Streaming IVF index maintenance — the ANN family's continuous-ingest
   * shape, completing its lifecycle (build q73 → stored artifacts q132 →
   * batch delta append q134 → THIS): embeddings arrive on a stream and
   * the STORED index absorbs each micro-batch. Per batch: read the
   * stored centroid table (held FIXED — the IVF maintenance contract,
   * identical to `SimilaritySearch.ivfAppend`; re-training centroids is
   * a deliberate full rebuild per corpus version), assign only the
   * batch's vectors (broadcast centroids + argmax partial agg — work ∝
   * batch), and land the delta as `assignments/batch_id=N` — the
   * [[idempotentBatchWriter]] layout, so an at-least-once replay of a
   * batch OVERWRITES its own directory instead of duplicating rows, and
   * a plain parquet read of `assignments/` discovers every generation
   * via partition discovery. At 100 TB each trigger appends files; the
   * corpus is never re-read or re-assigned. `IvfStreamSpec` proves the
   * streamed index ≡ the batch `ivfAppend` result, replay-safe, with
   * search parity through `ivfTopKFromIndex`.
   */
  def ivfAppendBatchWriter(indexDir: String, idCol: String = "vec_id",
                           vecCol: String = "embedding")
      : (DataFrame, Long) => Unit = { (batch, id) =>
    val cents = batch.sparkSession.read.parquet(s"$indexDir/centroids")
    // NO per-batch id dedup here: the batch twin (ivfAppend) keeps every
    // delta row, and this sink must be row-equal to it (IvfStreamSpec).
    // Exactly-once per id within the horizon is the upstream's job
    // (dropDuplicatesWithinWatermark), exactly as for every other sink.
    graft.operators.SimilaritySearch
      .assignAgainst(cents, batch, col(idCol), col(vecCol))
      .write.mode("overwrite")
      .parquet(s"$indexDir/assignments/batch_id=$id")
  }

  /** Write an IVF index into the streaming-maintainable layout
    * ([[ivfAppendBatchWriter]]'s contract): centroids + the base
    * assignment generation as `batch_id=-1`. The assignments directory
    * is cleared FIRST — a base rebuild is a new corpus version, and any
    * generations streamed against the OLD centroids must not survive
    * into it (partition discovery would silently merge them). */
  def writeIvfIndex(index: graft.operators.SimilaritySearch.IvfIndex,
                    dir: String): Unit = {
    val spark = index.centroids.sparkSession
    val aPath = new org.apache.hadoop.fs.Path(s"$dir/assignments")
    aPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(aPath, true)
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.assignments.write.mode("overwrite")
      .parquet(s"$dir/assignments/batch_id=-1")
  }

  /** Read a streaming-maintained IVF index back: every assignment
    * generation (base + streamed batches) via partition discovery. */
  def readIvfIndex(spark: SparkSession, dir: String)
      : graft.operators.SimilaritySearch.IvfIndex =
    graft.operators.SimilaritySearch.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments").drop("batch_id"))

  /** Streaming exact dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a key's dedup state only until
    * the watermark passes its event time, so state size is
    * O(keys-per-horizon), not O(all keys ever) — the only shape that
    * survives an unbounded stream (plain dropDuplicates grows state
    * forever). Batch twin: Dedup.exactDedup. At-least-once upstream
    * delivery within the horizon collapses to exactly-one row. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keyCols)

  /**
   * Streaming ingest NEAR-dup gate (beyond-reference): the streaming
   * twin of `Dedup.incrementalNearDups`' candidate phase. Per-LSH-bucket
   * state holds the (id, signature) of docs seen in that bucket; each
   * arriving doc emits a [[NearDupCandidate]] for every stored member
   * whose signature agreement passes the batch est gate
   * (threshold − 1/numHashes), then joins the bucket itself.
   *
   * Semantics and bounds:
   *  - input must be watermarked on `ts`; columns (doc_id, ts, text);
   *  - the same pair can surface from several bands — consumers
   *    `dropDuplicates("a_id","b_id")`, exactly like the batch
   *    `.distinct()`;
   *  - exact-Jaccard verification is the downstream batch step (hash
   *    SETS don't belong in per-bucket state); est-gated candidates are
   *    the LSH contract the batch twin shares — every batch-verified
   *    pair is (spec-pinned) among the streamed candidates;
   *  - the bucket cap stops ADMITTING members past `maxBucketSize`
   *    (streaming can't retro-drop a bucket the way the batch cap drops
   *    it whole) — still O(cap) state per bucket, the same skew bound;
   *  - state per active bucket ≤ cap × (numHashes+1) longs with
   *    event-time eviction, so total state is buckets-per-horizon
   *    bounded, not corpus bounded.
   */
  def nearDupIngest(docs: DataFrame, shingleSize: Int = 5,
                    numHashes: Int = 16, bands: Int = 8,
                    threshold: Double = 0.5, maxBucketSize: Int = 100,
                    idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[NearDupCandidate] = {
    import org.apache.spark.sql.graftshim.GraftShim
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val gate = threshold - 1.0 / numHashes
    val base = docs.select(col("doc_id"), col("ts"),
        GraftShim.column(graft.functions.MinhashSignature(
          GraftShim.expr(lower(col("text"))), shingleSize, numHashes))
          .as("sig"))
      .filter(col("sig").isNotNull)
    val banded = base.select(col("doc_id"), col("ts"), col("sig"),
        explode(graft.operators.Dedup.lshBandKeys(col("sig"), numHashes, bands))
          .as("bk"))
      .select(concat_ws("|", col("bk.band"), col("bk.key")).as("bucket"),
        col("doc_id"), col("ts"), col("sig"))
      .as[(String, Long, java.sql.Timestamp, Seq[Long])]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Seq[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // within a batch, arrival order = event-time order (id
            // tiebreak) — mirrors the batch x.id < y.id orientation for
            // same-timestamp rows
            var members = state.getOption.getOrElse(Seq.empty)
            val ordered = rows.toVector.sortBy(r => (r._3.getTime, r._2))
            val out = Vector.newBuilder[NearDupCandidate]
            ordered.foreach { case (_, id, _, sig) =>
              members.foreach { case (mid, msig) =>
                if (mid != id) {
                  val eq = msig.iterator.zip(sig.iterator)
                    .count { case (a, b) => a == b }
                  val est = eq.toDouble / numHashes
                  if (est >= gate) out += NearDupCandidate(mid, id, est)
                }
              }
              if (members.size < maxBucketSize && !members.exists(_._1 == id))
                members = members :+ (id -> sig)
            }
            state.update(members)
            if (ordered.nonEmpty)
              setGuardedTimeout(state, ordered.map(_._3.getTime).max, idleTimeout)
            out.result().iterator
          }
      }
  }

  /**
   * Streaming ingest span gate: the streaming twin of
   * `Corpus.spanDedup`'s KEEP decision (C4 repeated-span rule). Each
   * arriving doc's complete `spanWords`-word tiles are hashed
   * scan-local; per-tile-hash state records that the span has been
   * seen, so only the FIRST occurrence inside the watermark horizon
   * emits a [[SpanKeep]] — later copies (cross-batch included) are
   * suppressed at ingest. The per-doc rebuild (splicing kept tiles +
   * the partial tail, which never enters the gate) is the downstream
   * batch step, exactly as exact-Jaccard verify is for
   * [[nearDupIngest]].
   *
   * Semantics and bounds:
   *  - input watermarked on `ts`; columns (doc_id, ts, text);
   *  - within a micro-batch, (event-time, doc_id, idx) ordering decides
   *    the owner — on uniform timestamps this is the batch twin's
   *    (doc_id, idx) first-wins, so per-doc kept counts match
   *    `Corpus.spanDedup` (spec-pinned);
   *  - state is ONE boolean per distinct tile hash seen within the
   *    horizon, event-time evicted — tiles-per-horizon bounded, not
   *    corpus bounded (the batch twin's corpus-wide Exchange becomes
   *    the shuffle into `groupByKey(hash)`).
   */
  def spanDedupIngest(docs: DataFrame, spanWords: Int = 10,
                      idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[SpanKeep] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val base = docs
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("ws"))
      .withColumn("n_tiles",
        graft.operators.Corpus.tileCount(col("ws"), spanWords).cast("int"))
      .filter(col("n_tiles") > 0)
    val tiles = base
      .select(col("doc_id"), col("ts"), posexplode(transform(
        graft.operators.Corpus.tileArray(col("ws"), spanWords),
        t => md5(t))))
      .toDF("doc_id", "ts", "idx", "h")
      .as[(Long, java.sql.Timestamp, Int, String)]
    tiles.groupByKey(_._4)
      .flatMapGroupsWithState[Boolean, SpanKeep](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toVector.sortBy(r => (r._2.getTime, r._1, r._3))
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(SpanKeep(ordered.head._1, ordered.head._3))
            state.update(true)
            setGuardedTimeout(state, ordered.map(_._2.getTime).max, idleTimeout)
            out
          }
      }
  }

  /**
   * Streaming ingest boilerplate gate: the streaming twin of
   * `Corpus.removeBoilerplateAgainst` — ARRIVING docs are excised
   * against a PREBUILT tile-key artifact (`Corpus.boilerplateTiles`
   * stored to parquet; q157's batch path). This is the production
   * crawl-ingest shape the artifact exists for: the template-tile df
   * comes from the STANDING corpus, so a new doc is gated the moment
   * it arrives and never waits for a global df recount.
   *
   * Unlike [[nearDupIngest]]/[[spanDedupIngest]], the membership
   * decision itself is STATELESS — the stored artifact IS the state,
   * joined stream-static per micro-batch (broadcast while the key set
   * is small; AQE decides from the artifact's real size). Each doc's
   * tiles come from one input row, so the whole group is co-batch;
   * the `flatMapGroupsWithState` stage only reassembles the per-doc
   * splice and suppresses replayed doc_ids (one boolean per doc
   * within the watermark horizon, event-time evicted).
   *
   * Semantics and bounds:
   *  - input watermarked on `ts`; columns (doc_id, ts, text);
   *    `tileKeys` is a STATIC frame with column `k` (md5 tile key);
   *  - output rows equal the batch `Corpus.removeBoilerplateAgainst`
   *    rows for the same docs (spec-pinned at uniform event time),
   *    including n_kept = 0 docs and sub-tile (n_tiles = 0) docs —
   *    a sentinel null-tile row per doc carries the splice metadata
   *    through the explode+join so no doc drops out;
   *  - a replayed doc_id emits nothing the second time (state
   *    boolean), matching the at-least-once source contract the
   *    sibling ingest twins assume.
   */
  def boilerplateIngest(docs: DataFrame, tileKeys: DataFrame,
                        spanWords: Int = 10, idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[BoilerplateDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val base = docs
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("ws"),
        // content hash for the equal-timestamp duplicate tiebreak (the
        // lmScoreIngest/dsirScoreIngest discipline): two same-ts copies
        // with DIFFERENT text must resolve to ONE copy, never splice
        xxhash64(col("text")).as("th"))
      .withColumn("n_tiles",
        graft.operators.Corpus.tileCount(col("ws"), spanWords))
      // the trailing partial tile never enters the excision decision
      // (the batch tiling kernel's OWN expression — shared, not copied)
      .withColumn("tail_txt",
        graft.operators.Corpus.tailText(col("ws"), spanWords))
    // complete tiles + one always-null sentinel: the sentinel keeps
    // zero-tile docs alive through explode and the key join, and
    // carries (n_tiles, tail_txt) to the reassembly group
    val tiles = base
      .select(col("doc_id"), col("ts"), col("th"), col("n_tiles"),
        col("tail_txt"),
        posexplode(concat(
          graft.operators.Corpus.tileArray(col("ws"), spanWords),
          array(lit(null).cast("string")))))
      .toDF("doc_id", "ts", "th", "n_tiles", "tail_txt", "idx", "tile")
    // stream-static left join: flag = tile's md5 is in the artifact.
    // null sentinel tiles never match (null key joins nothing) and
    // survive the LEFT join unflagged.
    val flagged = tiles
      .join(tileKeys.select(col("k").as("_bk")),
        md5(col("tile")) === col("_bk"), "left")
      .select(col("doc_id"), col("ts"), col("th"), col("n_tiles"),
        col("tail_txt"),
        col("idx"), col("tile"), col("_bk").isNotNull.as("is_boiler"))
      .as[(Long, java.sql.Timestamp, Long, Long, String, Int,
        Option[String], Boolean)]
    flagged.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, BoilerplateDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (docId, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val all = rows.toVector
            val out =
              if (state.exists) Iterator.empty
              else {
                // within-batch duplicate doc_ids (at-least-once
                // redelivery inside ONE trigger): keep the EARLIEST
                // copy's rows only — and among equal-ts copies with
                // DIFFERENT text, the min content hash wins (sibling
                // ingest twins' rule) — then one row per tile index.
                // Without this, two copies' tiles would splice into a
                // single corrupted doc (n_kept > n_tiles, negative
                // n_dropped) where the batch twin emits one clean row
                val minTs = all.map(_._2.getTime).min
                val atTs = all.filter(_._2.getTime == minTs)
                val minTh = atTs.map(_._3).min
                val chosen = atTs.filter(_._3 == minTh)
                  .sortBy(_._6).distinctBy(_._6)
                val nTiles = chosen.head._4
                val tail = chosen.head._5
                val kept = chosen.filter(r => r._7.isDefined && !r._8)
                  .sortBy(_._6).map(_._7.get)
                val body = kept.mkString(" ")
                // batch twin: md5(trim(concat_ws(" ", body, tail_txt)))
                // — Spark's trim strips ONLY spaces (0x20); Java's
                // String.trim also strips tabs/newlines and would break
                // the documented row parity on edge-whitespace text
                val spliced = (body + " " + tail)
                  .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
                val digest = java.security.MessageDigest.getInstance("MD5")
                  .digest(spliced
                    .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  .map("%02x".format(_)).mkString
                Iterator.single(BoilerplateDoc(docId, nTiles,
                  kept.size.toLong, nTiles - kept.size, digest))
              }
            state.update(true)
            setGuardedTimeout(state, all.map(_._2.getTime).max, idleTimeout)
            out
          }
      }
  }

  /**
   * Ingest-time LM quality scoring — the streaming twin of
   * [[graft.operators.NgramLm.scoreNll]] (q169's CCNet gate): arriving
   * docs score against the STORED unigram/bigram count artifacts (the
   * CurationRunner `lm_*` frames) via stream-static LEFT joins; the
   * scoring decision itself is STATELESS (the stored model IS the
   * state) — flatMapGroupsWithState only reassembles the per-doc term
   * sum and suppresses at-least-once replays (one boolean per doc
   * within the watermark horizon). All of a doc's term rows come from
   * ONE input row, so every group completes in its arrival
   * micro-batch; state never holds partial sums. V and N are read off
   * the artifact once at query build — model constants, not stream
   * state.
   *
   * Value parity with the batch twin is exact: per-term ln doubles are
   * accumulated as BigDecimal(scale 18, HALF_UP) — the same
   * quantize-then-exact-sum the batch plan's DECIMAL(38,18) cast
   * performs — so stream rows equal batch rows bit-for-bit
   * (`StreamsSpec` pins it on real documents split across
   * micro-batches).
   *
   * Input: (doc_id, ts, text), watermarked by the caller.
   */
  def lmScoreIngest(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                    k: Double = 0.5, idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[LmScoredDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val consts = uni.agg(count(lit(1)).cast("double"),
      coalesce(sum("cnt"), lit(0L)).cast("double")).head()
    val vv = consts.getDouble(0)
    val nn = consts.getDouble(1)
    val base = docs
      .select(col("doc_id"), col("ts"), xxhash64(col("text")).as("th"),
        filter(split(lower(col("text")), "\\s+"), t => length(t) > 0).as("ws"))
      .withColumn("n_toks", size(col("ws")))
    // pos 0 scores the first token against the unigram model; pos p>=1
    // scores (ws[p], ws[p+1]); token-less docs ride a null sentinel row
    val terms = base
      .select(col("doc_id"), col("ts"), col("th"), col("n_toks"), col("ws"),
        posexplode(when(col("n_toks") > 0, col("ws"))
          .otherwise(array(lit(null).cast("string")))))
      .toDF("doc_id", "ts", "th", "n_toks", "ws", "pos", "cur")
      .withColumn("prev",
        when(col("pos") >= 1, element_at(col("ws"), col("pos"))))
      .drop("ws")
      .join(bi.select(col("t1").as("_bt1"), col("t2").as("_bt2"),
          col("cnt").as("_cb")),
        col("prev") === col("_bt1") && col("cur") === col("_bt2"), "left")
      .join(uni.select(col("token").as("_ut"), col("cnt").as("_cp")),
        col("prev") === col("_ut"), "left")
      .join(uni.select(col("token").as("_uc"), col("cnt").as("_cc")),
        col("cur") === col("_uc"), "left")
      .withColumn("term",
        when(col("cur").isNull, lit(null).cast("double"))
          .when(col("pos") === 0,
            log((coalesce(col("_cc"), lit(0L)) + k) / (nn + k * vv)))
          .otherwise(
            log((coalesce(col("_cb"), lit(0L)) + k) /
                (coalesce(col("_cp"), lit(0L)) + k * vv))))
      .select(col("doc_id"), col("ts"), col("th"), col("n_toks"),
        col("pos"), col("term"))
      .as[(Long, java.sql.Timestamp, Long, Int, Int, Option[Double])]
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, LmScoredDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (docId, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val all = rows.toVector
            val out =
              if (state.exists) Iterator.empty
              else {
                // earliest copy wins within a batch; among equal-ts
                // copies with DIFFERENT text, the min content hash
                // wins deterministically — never a pos-interleaved
                // chimera of two payloads
                val minTs = all.map(_._2.getTime).min
                val atTs = all.filter(_._2.getTime == minTs)
                val minTh = atTs.map(_._3).min
                val chosen = atTs.filter(_._3 == minTh)
                  .sortBy(_._5).distinctBy(_._5)
                val nToks = chosen.head._4
                val avg =
                  if (nToks == 0) None
                  else {
                    // the batch plan's cast(term as decimal(38,18)) →
                    // exact sum → cast double, replayed locally
                    val s = chosen.flatMap(_._6)
                      .map(t => BigDecimal(t)
                        .setScale(18, BigDecimal.RoundingMode.HALF_UP))
                      .sum
                    Some(-s.toDouble / nToks)
                  }
                Iterator.single(LmScoredDoc(docId, nToks, avg))
              }
            state.update(true)
            setGuardedTimeout(state, all.map(_._2.getTime).max, idleTimeout)
            out
          }
      }
  }

  /**
   * Ingest-time DSIR importance weighting — the streaming twin of
   * [[graft.operators.Dsir.importanceWeights]] (q194's fit-and-score
   * pass with the fit already done): arriving docs score against the
   * STORED bucket log-ratio artifact (the CurationRunner `dsir_ratio`
   * frame) via a stream-static join on the gram bucket; the decision
   * is STATELESS (the stored model IS the state) —
   * flatMapGroupsWithState only reassembles the per-doc weight sum and
   * suppresses at-least-once replays (one boolean per doc within the
   * watermark horizon). All of a doc's gram rows come from ONE input
   * row, so every group completes in its arrival micro-batch.
   *
   * Value parity with the batch twin is exact: gram generation is the
   * shared [[graft.operators.Dsir.grams]] expression, and per-gram
   * log-ratios accumulate as BigDecimal(scale 18, HALF_UP) — the same
   * quantize-then-exact-sum the batch plan's DECIMAL(38,18) cast
   * performs — so stream rows equal batch rows bit-for-bit
   * (`StreamsSpec` pins it on real documents split across
   * micro-batches). Docs with zero grams are absent, as in batch.
   *
   * Input: (doc_id, ts, text), watermarked by the caller. `ratio` is
   * the full-domain [[graft.operators.Dsir.logRatio]] artifact.
   */
  def dsirScoreIngest(docs: DataFrame, ratio: DataFrame, numBuckets: Int,
                      idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[DsirScoredDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val terms = docs
      .select(col("doc_id"), col("ts"), xxhash64(col("text")).as("th"),
        posexplode(graft.operators.Dsir.grams(col("text"))))
      .toDF("doc_id", "ts", "th", "pos", "gram")
      .withColumn("bucket",
        graft.operators.Dsir.bucketOf(col("gram"), numBuckets))
      .join(ratio.select(col("bucket"), col("logr")), Seq("bucket"))
      .select(col("doc_id"), col("ts"), col("th"), col("pos"), col("logr"))
      .as[(Long, java.sql.Timestamp, Long, Int, Double)]
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, DsirScoredDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (docId, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val all = rows.toVector
            val out =
              if (state.exists) Iterator.empty
              else {
                // earliest copy wins within a batch; among equal-ts
                // copies with DIFFERENT text, the min content hash
                // wins deterministically — never a pos-interleaved
                // chimera of two payloads
                val minTs = all.map(_._2.getTime).min
                val atTs = all.filter(_._2.getTime == minTs)
                val minTh = atTs.map(_._3).min
                val chosen = atTs.filter(_._3 == minTh)
                  .sortBy(_._4).distinctBy(_._4)
                // the batch plan's cast(logr as decimal(38,18)) →
                // exact sum → cast double, replayed locally
                val s = chosen.map(r => BigDecimal(r._5)
                  .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
                Iterator.single(
                  DsirScoredDoc(docId, chosen.size, s.toDouble))
              }
            state.update(true)
            setGuardedTimeout(state, all.map(_._2.getTime).max, idleTimeout)
            out
          }
      }
  }

  /**
   * Streaming KMV sketch maintenance: the streaming twin of
   * `Sketches.kmvSketch` — per-key bottom-k-distinct of the 60-bit
   * md5-prefix hashes of arriving values, maintained incrementally in
   * `flatMapGroupsWithState`. Because bottom-k merge is EXACT
   * (bottom-k of unioned bottom-k's ≡ bottom-k of the union — the
   * `SketchesSpec` merge property), the snapshot after any prefix of
   * batches equals the batch sketch over exactly those rows, in any
   * arrival order — the spec asserts final-snapshot ≡ batch-twin
   * equality on the real corpus split across micro-batches.
   *
   * Emits a [[KmvSnapshot]] per key per updating trigger (`version`
   * increments per update; latest wins downstream — the q161 rollup
   * shape then merges latest per-key snapshots with `Sketches.kmvMerge`).
   * Input: (key string, ts, value string), watermarked by the caller.
   *
   * State per key is AT MOST k longs + a version counter, event-time
   * evicted — keys-per-horizon × k bounded, not value-domain bounded
   * (the whole point of the sketch; the batch twin's bounded
   * aggregation buffer becomes bounded group state here). Values are
   * hashed SCAN-LOCALLY before the state shuffle, so the stateful
   * stage moves and stores only longs.
   */
  def kmvIngest(rows: DataFrame, k: Int, idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[KmvSnapshot] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    require(k >= 1, s"kmvIngest requires k >= 1 (got $k)")
    val hashed = rows
      .select(col("key").cast("string").as("key"), col("ts"),
        graft.operators.Sketches.kmvHash60(col("value")).as("hv"))
      // ts too: a null event time would NPE in the state function and
      // kill the stream (the row is meaningless to a watermarked query)
      .filter(col("key").isNotNull && col("hv").isNotNull &&
        col("ts").isNotNull)
      .as[(String, java.sql.Timestamp, Long)]
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]), KmvSnapshot](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[(Long, Seq[Long])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (ver0, saved) = state.getOption.getOrElse((0L, Seq.empty[Long]))
            // k-bounded fold (the batch aggregate's insert-evict, not a
            // sort of the whole batch): ≤k resident longs at all times
            val buf = scala.collection.mutable.TreeSet[Long](saved: _*)
            var maxTs = Long.MinValue
            it.foreach { case (_, ts, hv) =>
              if (ts.getTime > maxTs) maxTs = ts.getTime
              if (buf.size < k) buf += hv
              else if (hv < buf.last && buf.add(hv)) buf.remove(buf.last)
            }
            val merged = buf.toSeq
            val ver = ver0 + 1
            state.update((ver, merged))
            setGuardedTimeout(state, maxTs, idleTimeout)
            Iterator.single(KmvSnapshot(key, ver, merged))
          }
      }
  }

  /**
   * Streaming count-min sketch maintenance: the streaming twin of
   * [[graft.operators.Sketches.cmsSketch]] — per-key (d×w)-bounded
   * frequency counters over arriving values, maintained incrementally
   * in `flatMapGroupsWithState`. CMS cells are EXACT additive counts
   * (the same salted-md5 bucket construction, `Sketches.cmsBuckets`),
   * so the snapshot after any prefix of micro-batches equals the batch
   * sketch over exactly those rows, in any arrival order — `StreamsSpec`
   * asserts final-snapshot ≡ batch-twin equality on real documents
   * split across micro-batches (the q161-style gate the KMV twin got;
   * this is the frequency complement).
   *
   * Emits a [[CmsSnapshot]] per key per updating trigger; latest wins
   * downstream (each snapshot summarizes the key's whole in-horizon
   * history). State per key is AT MOST depth·width counters + a version
   * counter, event-time evicted — keys-per-horizon × d·w bounded, never
   * value-domain bounded. Bucket indices are computed SCAN-LOCALLY
   * before the state shuffle, so the stateful stage moves and stores
   * only (r, bucket) ints — the value strings never reach state.
   *
   * Input: (key string, ts, value string), watermarked by the caller.
   */
  def cmsIngest(rows: DataFrame, depth: Int, width: Int,
                idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[CmsSnapshot] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    require(depth >= 1 && width >= 1,
      s"cmsIngest requires depth/width >= 1 (got $depth x $width)")
    val bucketed = rows
      .filter(col("key").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("key").cast("string").as("key"), col("ts"),
        // cells keyed as r * width + bucket (one long per cell)
        transform(graft.operators.Sketches.cmsBuckets(
            col("value").cast("string"), depth, width),
          (b, r) => r.cast("long") * width + b).as("cells"))
      .as[(String, java.sql.Timestamp, Seq[Long])]
    additiveCellIngest(bucketed, idleTimeout).map { case (key, ver, cells) =>
      CmsSnapshot(key, ver,
        cells.map { case (c, n) => CmsCell((c / width).toInt, c % width, n) })
    }
  }

  /**
   * Streaming fixed-bin histogram maintenance: the streaming twin of
   * [[graft.operators.Sketches.histogramSketch]] — the quantile
   * complement of [[cmsIngest]], on the SAME additive-cell state
   * engine. Bin indices are computed scan-locally by the batch twin's
   * own `Sketches.histBin` (one shared definition), so the latest
   * snapshot after any micro-batch split equals the batch sketch over
   * exactly those rows (`StreamsSpec` pins it); quantile read-outs run
   * `Sketches.histogramQuantiles` over the ≤`bins`-row snapshot.
   * State per key is AT MOST `bins` counters, event-time evicted.
   *
   * Input: (key string, ts, value numeric), watermarked by the caller.
   */
  def histIngest(rows: DataFrame, lo: Double, hi: Double, bins: Int,
                 idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[HistSnapshot] = {
    import rows.sparkSession.implicits._
    require(bins >= 1 && hi > lo, s"need bins >= 1 and hi > lo")
    val binned = rows
      .filter(col("key").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("key").cast("string").as("key"), col("ts"),
        array(graft.operators.Sketches.histBin(col("value"), lo, hi, bins))
          .as("cells"))
      .as[(String, java.sql.Timestamp, Seq[Long])]
    additiveCellIngest(binned, idleTimeout).map { case (key, ver, cells) =>
      HistSnapshot(key, ver, cells.map { case (b, n) => HistCell(b, n) })
    }
  }

  /** The shared additive-cell state engine behind [[cmsIngest]] and
    * [[histIngest]]: per key, a map of cell-id → exact count folded
    * incrementally (bounded by the caller's cell domain — d·w for CMS,
    * `bins` for histograms), event-time evicted; emits (key, version,
    * sorted (cell, cnt)) per updating trigger. Exact additive counts
    * make any micro-batch split order-invariant — the twins' equality
    * gates rest on this one fold. */
  private def additiveCellIngest(
      rows: org.apache.spark.sql.Dataset[(String, java.sql.Timestamp, Seq[Long])],
      idleTimeout: String)
      : org.apache.spark.sql.Dataset[(String, Long, Seq[(Long, Long)])] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]),
          (String, Long, Seq[(Long, Long)])](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[(Long, Map[Long, Long])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (ver0, saved) =
              state.getOption.getOrElse((0L, Map.empty[Long, Long]))
            val buf = scala.collection.mutable.HashMap[Long, Long]()
            saved.foreach { case (c, n) => buf(c) = n }
            var maxTs = Long.MinValue
            it.foreach { case (_, ts, cells) =>
              if (ts.getTime > maxTs) maxTs = ts.getTime
              cells.foreach { c => buf(c) = buf.getOrElse(c, 0L) + 1L }
            }
            val merged = buf.toMap
            val ver = ver0 + 1
            state.update((ver, merged))
            setGuardedTimeout(state, maxTs, idleTimeout)
            Iterator.single((key, ver, merged.toSeq.sorted))
          }
      }
  }

  /** Streaming gap sessionization: `session_window` aggregation — state
    * per OPEN session, closed (emitted) once the watermark passes the
    * session end. Batch twin: Sessionize.sessions, with one boundary
    * difference: session_window treats a gap EXACTLY equal to
    * `gapDuration` as a new session (window is [ts, ts+gap)), while the
    * batch lag-based rule keeps it (`gap > threshold` starts new) —
    * immaterial for continuous-time data, documented for exactness. */
  def sessionRollup(events: DataFrame, gapDuration: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gapDuration))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-stream INTERVAL join: for each left event, right events of
    * the same key within `[left.ts - windowSeconds, left.ts]` — the
    * attribution join (purchase ← clicks in the last hour) as a genuine
    * stream×stream join. Both sides MUST be watermarked (callers attach
    * `withWatermark`); the time-range condition is what lets Spark bound
    * the join state: a buffered right row is dropped once the watermark
    * guarantees no future left row can reach back to it. Without the
    * range condition the state grows forever — the condition IS the
    * eviction policy. Batch twin: a plain theta join with the same
    * predicate. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   windowSeconds: Long): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("r.ts") <= col("l.ts"))
  }

  /** Per-key cumulative state via `flatMapGroupsWithState` — the custom-
    * state extension point for semantics the built-in windowed aggs can't
    * express. Emits one row per input event carrying the running count
    * and running value sum for its key AS OF that event (processing
    * order within key = batch arrival order; deterministic across
    * replays for append-only sources). State is one (count, sum) pair
    * per key, evicted after `idleTimeout` of event-time silence via
    * EventTimeTimeout — bounded the same way the windowed aggs are.
    * Batch twin: a cumulative window (`rowsBetween(unboundedPreceding,
    * currentRow)`). */
  def runningTotals(events: DataFrame, idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[RunningTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    // no re-cast: a projection that rewrites `ts` would mint a new
    // attribute without the caller's watermark tag, and event-time
    // timeouts require the watermarked column to flow through untouched
    val typed = events.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), RunningTotal](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (n, sum) = state.getOption.getOrElse((0L, 0.0))
            val out = rows.map { case (_, ts, v) =>
              n += 1; sum += v
              RunningTotal(user, ts, n, sum)
            }.toVector // drain before state.update (iterator is lazy)
            state.update((n, sum))
            setGuardedTimeout(state, out.map(_.ts.getTime).max, idleTimeout)
            out.iterator
          }
      }
  }

  /** Streaming twin of `Sampling.tokenBudgetFill` (q140) — ONLINE
    * token-budget admission at ingest: per stratum, admit arriving docs
    * until the stratum's token budget is consumed, then drop. State is
    * ONE counter per stratum (bounded by |strata|, no eviction — a
    * quota is a lifetime fact for the corpus version; rebuilding the
    * mix is a new query with a fresh checkpoint). Within each batch a
    * stratum's rows are processed in the batch twin's md5(salt:id)
    * order, so a single-batch drain is EXACTLY the batch prefix fill;
    * across batches admission is arrival-order (earlier batches consume
    * budget first) — the online form of the quota, deterministic for a
    * given batch sequence. STRICT PREFIX semantics, matching the batch
    * twin: the first overflowing doc CLOSES its stratum permanently —
    * no later (even smaller) doc back-fills past it, so the admitted
    * set is a stable function of the arrival sequence, never of which
    * small doc happened to squeeze in. State = (consumed, closed). */
  def tokenBudgetAdmit(docs: DataFrame, budgets: Map[String, Long],
                       defaultBudget: Long = 0L, salt: String = "tbf")
      : org.apache.spark.sql.Dataset[AdmittedDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    val typed = docs.select(col("doc_id").cast("long"),
        col("stratum").cast("string"), col("n_tokens").cast("long"),
        md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))
          .cast("binary")).as("hx"))
      .as[(Long, String, Long, String)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Boolean), AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (stratum, rows, state: GroupState[(Long, Boolean)]) =>
          val budget = budgets.getOrElse(stratum, defaultBudget)
          var (consumed, closed) = state.getOption.getOrElse((0L, false))
          val out = Vector.newBuilder[AdmittedDoc]
          // batch-local md5 order = the batch twin's per-stratum order
          // negative token counts (corrupt upstream) are dropped, the
          // same guard as the batch twin — they'd otherwise shrink
          // `consumed` and reopen a quota the batch path keeps shut
          rows.toVector.filter(_._3 >= 0).sortBy(r => (r._4, r._1)).foreach {
            case (id, _, tok, _) =>
              if (!closed) {
                if (consumed + tok <= budget) {
                  consumed += tok
                  out += AdmittedDoc(id, stratum, tok, consumed)
                } else closed = true
              }
          }
          state.update((consumed, closed))
          out.result().iterator
      }
  }

  /**
   * Streaming twin of the q103 funnel (real-time conversion tracking):
   * per-user state = the first-completion time of each stage
   * (`stages.length` long slots); an incoming event completes stage i
   * when its type matches and it falls within `windowSeconds` after the
   * recorded stage-(i-1) time. Emits one [[StageCompletion]] per newly
   * completed stage (append mode — completions are immutable facts;
   * funnel counts are `groupBy(stage).count` downstream). Within a
   * batch, a user's rows are processed in (ts) order to mirror the
   * batch windows; cross-batch correctness holds for in-order delivery
   * per key, which the watermark bounds (same contract as
   * [[scd2Intervals]]). State is `stages.length` longs per user with
   * event-time eviction — bounded regardless of stream length.
   *
   * Eviction semantics: completions are unique per user per ACTIVITY
   * EPOCH, not per lifetime. Once the idle timeout evicts a user's
   * state, a later event re-enters stage 1 fresh and the stages emit
   * again — so a `groupBy(stage).count` over the full output stream
   * counts such a user once per epoch, where the batch funnel (which
   * sees all history at once) counts them once. Consumers needing
   * lifetime-unique counts should `countDistinct(user_id)` downstream
   * (StageCompletion carries user_id for exactly this reason); the
   * batch-equivalence spec pins the single-epoch case. The alternative
   * — never evicting — is unbounded state, the wrong trade at stream
   * scale.
   */
  def funnelStream(events: DataFrame, stages: Seq[String],
                   windowSeconds: Long = 86400L,
                   idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[StageCompletion] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "need at least one stage")
    val stageIdx = stages.zipWithIndex.toMap
    val typed = events.select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
    val UNSET = Long.MaxValue
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], StageCompletion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val t = state.getOption.getOrElse(Array.fill(stages.length)(UNSET))
            val ordered = rows.toVector.sortBy(_._2.getTime)
            val out = Vector.newBuilder[StageCompletion]
            ordered.foreach { case (_, ts, ty) =>
              stageIdx.get(ty).foreach { i =>
                val ms = ts.getTime
                val qualifies =
                  if (i == 0) true
                  else t(i - 1) != UNSET && ms > t(i - 1) &&
                    ms <= t(i - 1) + windowSeconds * 1000L
                if (qualifies && t(i) == UNSET) {
                  t(i) = ms
                  out += StageCompletion(user, i + 1, ts)
                }
              }
            }
            val result = out.result()
            state.update(t)
            if (ordered.nonEmpty)
              setGuardedTimeout(state, ordered.map(_._2.getTime).max, idleTimeout)
            result.iterator
          }
      }
  }

  /** Streaming twin of the q86 SCD2 build: per-key state = the OPEN
    * interval (current state + its start); a state change CLOSES the
    * previous interval and emits it (append mode — closed intervals are
    * immutable facts; the open interval lives only in state until its
    * key changes state or times out). Within a batch, a key's rows are
    * sorted by (ts, event_id) to mirror the batch window's order;
    * cross-batch correctness holds for in-order delivery per key, which
    * the watermark bounds. State is one (string, timestamp) pair per
    * key — same eviction contract as [[runningTotals]]. */
  def scd2Intervals(events: DataFrame, idleTimeout: String = "30 days")
      : org.apache.spark.sql.Dataset[Scd2Interval] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val typed = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(String, java.sql.Timestamp), Scd2Interval](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[(String, java.sql.Timestamp)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toVector
              .sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
            var cur = state.getOption
            val out = Vector.newBuilder[Scd2Interval]
            sorted.foreach { case (_, ts, _, typ) =>
              cur match {
                case Some((s0, t0)) if s0 != typ =>
                  out += Scd2Interval(user, s0, t0, ts)
                  cur = Some((typ, ts))
                case None => cur = Some((typ, ts))
                case _ => () // same state continues the open interval
              }
            }
            state.update(cur.get)
            setGuardedTimeout(state, sorted.map(_._2.getTime).max,
              idleTimeout)
            out.result().iterator
          }
      }
  }

  /** Ingest-time benchmark decontamination (streaming twin of
    * [[graft.operators.Corpus.decontaminate]]): flag incoming documents
    * that share any word n-gram with a STATIC benchmark gram set, as they
    * arrive. The stream side stays append-mode with bounded state:
    * per-doc grams are scan-local (array_distinct over one codegen
    * WordNgramHashes pass), the gram probe is a stream-static broadcast
    * join, and the per-doc collapse (a doc with k shared grams matches k
    * times) is dropDuplicatesWithinWatermark — state O(contaminated docs
    * per horizon), not a streaming aggregation. This is the production
    * crawl-ingest shape: the eval set is fixed and tiny, the corpus
    * streams past it; n_shared counts (batch op) are for audits, the gate
    * only needs membership.
    *
    * `docs` must carry `idCol`, `textCol`, and an event-time column with
    * a watermark already applied. `benchGrams` is a static frame with one
    * `h: long` gram-hash column (build it batch-side with the same n).
    *
    * `bloomFpp`: when set, a Bloom sketch over the bench grams (built
    * batch-side at stream setup, ~1.2 bytes/gram at 1% FPP) prunes the
    * exploded gram stream SCAN-LOCALLY before the broadcast join — the
    * streaming form of [[graft.operators.Corpus.decontaminateBloom]]'s
    * two-phase plan. The join still confirms exactly, so the flagged-doc
    * stream is identical with or without the sketch (spec-gated); the
    * sketch just keeps the join probe volume ∝ true hits when the eval
    * suite outgrows hash-relation comfort.
    */
  def decontaminateStream(docs: DataFrame, benchGrams: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 5,
                          bloomFpp: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val exploded = docs
      .withColumn("_h", explode(array_distinct(GraftShim.column(
        graft.functions.WordNgramHashes(
          GraftShim.expr(lower(col(textCol))), n)))))
    val prefiltered = bloomFpp.fold(exploded) { fpp =>
      val nBench = math.max(benchGrams.count(), 1L)
      val bf = benchGrams.stat.bloomFilter(col("h"), nBench, fpp)
      val bytes = {
        val baos = new java.io.ByteArrayOutputStream()
        bf.writeTo(baos)
        baos.toByteArray
      }
      exploded.filter(GraftShim.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          GraftShim.expr(lit(bytes)), GraftShim.expr(col("_h")))))
    }
    prefiltered
      .join(broadcast(benchGrams.select(col("h").as("_h"))), "_h")
      .drop("_h", textCol)
      .dropDuplicatesWithinWatermark(Seq(idCol))
  }

  /**
   * Ingest-time SEMANTIC decontamination — the streaming twin of
   * [[graft.operators.Corpus.decontaminateSemantic]] (q153), as
   * [[decontaminateStream]] is for the n-gram path: arriving vectors
   * probe their `nprobe` nearest BENCH centroid lists and dot against
   * the stored bench list members; any hit ≥ `threshold` flags the
   * arriving doc. `benchLists` is the STORED bench assignment frame
   * (bench_id, cid, bu: unit vector) — built once by the batch operator
   * path and read as a static table, the ivfAppend maintenance
   * contract.
   *
   * Entirely STATELESS streaming — zero aggregation state on the
   * stream side: the centroid table collapses to ONE static row
   * carrying the centroid array (a batch-side agg), crossJoins in as a
   * broadcast scalar, and each arriving row computes its nprobe probe
   * set SCAN-LOCALLY (transform → array_sort → slice over K entries,
   * K ≈ √|bench| — a streaming groupBy/window here would be stateful).
   * No watermark needed — nothing accumulates.
   */
  def semanticDecontaminateStream(docs: DataFrame, centroids: DataFrame,
                                  benchLists: DataFrame,
                                  idCol: String, vecCol: String,
                                  nprobe: Int = 2,
                                  threshold: Double = 0.40): DataFrame = {
    import graft.functions.VectorFunctions
    // the batch twin's empty-centroid guard, mirrored: both static
    // inputs empty-checked eagerly at stream SETUP — an empty stored
    // artifact (missing/corrupt/incompatible-modulus) would otherwise
    // make every stage below a no-op and the stream would silently
    // report the corpus clean forever
    require(!centroids.isEmpty,
      "semanticDecontaminateStream: empty centroid table — the stored " +
        "artifact is missing or was built with an incompatible modulus")
    require(!benchLists.isEmpty,
      "semanticDecontaminateStream: empty bench-list table — nothing " +
        "to gate against; a silent always-clean stream is never right")
    val withU = docs.select(col(idCol).as("id"),
        VectorFunctions.unit(col(vecCol)).as("u"))
      .filter(col("u").isNotNull)
    // static side: all centroids in one row (K is tiny by construction)
    val centsRow = centroids
      .agg(collect_list(struct(col("cid"), col("cu"))).as("cents"))
    val probed = withU.crossJoin(broadcast(centsRow))
      // (-cos, cid) sorts to (best cos, lowest cid) — the exact batch
      // tiebreak (assignWithVector / the q153 oracle's rn ordering).
      // NaN parity: Spark's window orderBy(cos desc) treats NaN as the
      // LARGEST double (NaN centroid ranks first); ascending array_sort
      // on -cos would put NaN last — so a NaN cosine maps to -Infinity
      // here, keeping both paths' probe sets identical even on NaN
      // embeddings (cosines of unit vectors are otherwise in [-1, 1],
      // so -Infinity cannot collide with a real key)
      .select(col("id"), col("u"), explode(slice(array_sort(transform(
        col("cents"),
        c => {
          val cos = VectorFunctions.dot(col("u"), c.getField("cu"))
          struct(
            when(isnan(cos), lit(Double.NegativeInfinity))
              .otherwise(-cos).as("nc"),
            c.getField("cid").as("cid"))
        })), 1, nprobe)).as("p"))
      .select(col("id"), col("u"), col("p.cid").as("cid"))
    probed
      .join(benchLists.select(col("cid"), col("bench_id"), col("bu")), "cid")
      .select(col("id"), col("bench_id"),
        VectorFunctions.dot(col("u"), col("bu")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * Streaming heavy-hitter candidates — the ingest-time twin of
   * [[graft.operators.HeavyHitters.topKFrequent]]'s candidate pass:
   * a running Misra-Gries summary per key-hash shard in
   * `flatMapGroupsWithState`, emitting each shard's full current
   * summary (capacity-bounded) every trigger, tagged with a per-shard
   * `version` so consumers keep the latest snapshot.
   *
   * Guarantee (same certificate as the batch operator, sharded): a key's
   * whole count lands in ONE shard, and a key absent from its shard's
   * summary has shard count < n_shard/capacity ≤ N/capacity — so every
   * key with global count ≥ N/capacity is in the latest snapshots, with
   * estimate in [true − n_shard/capacity, true]. State is
   * ≤ capacity counters per shard, never evicted (a running census has
   * no event-time horizon); `nShards` bounds per-task state and spreads
   * update work. The exact RECOUNT (batch pass 2) stays a downstream
   * batch job over the stored corpus — the stream maintains candidates,
   * which is the part that must see every row.
   */
  def heavyHittersStream(rows: DataFrame, keyCol: String,
                         capacity: Int = 4096, nShards: Int = 32)
      : org.apache.spark.sql.Dataset[HhCandidate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    require(capacity > 0 && nShards > 0,
      s"capacity=$capacity, nShards=$nShards must be > 0")
    val typed = rows.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .withColumn("shard", pmod(hash(col("k")), lit(nShards)).cast("int"))
      .as[(String, Int)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Map[String, Long]), HhCandidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[(Long, Map[String, Long])]) =>
          val (ver0, saved) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
          val counters = scala.collection.mutable.HashMap[String, Long](saved.toSeq: _*)
          it.foreach { case (k, _) =>
            graft.operators.HeavyHitters.misraGriesStep(counters, k, capacity)
          }
          val ver = ver0 + 1
          state.update((ver, counters.toMap))
          counters.toVector.map { case (k, c) =>
            HhCandidate(shard, ver, k, c)
          }.iterator
      }
  }

  /**
   * Streaming drift monitor — PSI per event-time window against a FIXED
   * reference profile (the `Drift.referenceProfile` constants: order-stat
   * bin edges + reference proportions, computed batch-side from the
   * training window). Each event bins SCAN-LOCALLY against the literal
   * edge array; ONE streaming windowed aggregation produces per-bin
   * conditional counts as columns; PSI is then a row-local expression
   * over that single aggregated row — deliberately shaped around Spark's
   * one-streaming-aggregation limit (no chained agg, no foreachBatch
   * math). Emits (window_start, n, psi) rows; `events` must carry a
   * watermarked `ts` (caller applies `withWatermark`, the repo-wide
   * stream contract) so window state is bounded exactly as T4.
   *
   * OUTPUT-MODE CONTRACT: in APPEND mode each window emits once, on
   * close — PSI over the complete window, the row to alert on. In
   * UPDATE mode a window re-emits per trigger with PSI over its
   * PARTIAL counts so far — a running snapshot whose early emissions
   * are concentrated in few bins and can transiently read high; an
   * update-mode consumer must treat the latest row per window as
   * provisional until the watermark passes, never page on it.
   *
   * This is the production form of model monitoring: the reference
   * profile is versioned WITH the model artifact, the monitor scores
   * arriving data against it, and a CLOSED window with psi > 0.2 pages
   * before the model's predictions quietly rot (the conventional
   * threshold — Drift scaladoc).
   */
  def psiDriftStream(events: DataFrame, v: Column,
                     edges: Seq[Double], pRef: Seq[Double],
                     windowLength: String = "1 hour",
                     eps: Double = 1e-6): DataFrame = {
    require(pRef.size == edges.size + 1,
      s"pRef must have edges+1 entries (bins), got ${pRef.size} vs ${edges.size} edges")
    val bins = pRef.size
    val edgeArr = array(edges.map(lit): _*)
    val bin = size(filter(edgeArr, x => x < v.cast("double")))
    val counts = (0 until bins).map(b =>
      sum((bin === b).cast("long")).as(s"_c$b"))
    val windowed = events
      .filter(v.cast("double").isNotNull)
      .groupBy(window(col("ts"), windowLength))
      .agg(counts.head, counts.tail: _*)
    val n = (0 until bins).map(b => col(s"_c$b")).reduce(_ + _)
    val psi = (0 until bins).map { b =>
      val q = greatest(col(s"_c$b").cast("double") / n, lit(eps))
      val p = greatest(lit(pRef(b)), lit(eps))
      (q - p) * log(q / p)
    }.reduce(_ + _)
    windowed.select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      n.as("n"), psi.as("psi"))
  }

  /**
   * Streaming contract monitor — per-event-time-window validation
   * counters for a [[graft.quality.Contracts.DataContract]], the
   * ingest-time form of the one-agg-pass batch validate (reference
   * analogue: the quality monitor tracking validation rates,
   * data_contracts.py:216-231 — here the rates are computed ON ARRIVAL
   * per window instead of per nightly run). Same severity semantics:
   * nullability / uniqueness / range violations are ERRORS, allowed-set
   * violations WARNINGS, `is_valid` = zero errors.
   *
   * One streaming aggregation; every rule is a conditional sum except
   * uniqueness, where exact `count_distinct` is not streamable — the
   * dup count is `count − approx_count_distinct` (HLL, exact at small
   * per-window cardinalities, ~2% beyond): right for a MONITOR, whose
   * output is an alert rate; the exact dup listing stays a batch job
   * over the stored window, the heavy-hitters recount discipline.
   * `rows` must carry a watermarked `ts`. Emits (window_start, rows,
   * errors, warnings, is_valid) — append mode gives one final row per
   * closed window (the psiDriftStream output-mode contract applies).
   */
  def contractMonitor(rows: DataFrame,
                      contract: graft.quality.Contracts.DataContract,
                      windowLength: String = "1 hour"): DataFrame = {
    val present = rows.columns.toSet
    // a stream's schema is fixed at setup — a missing REQUIRED column is
    // permanent, so fail fast here (batch validate reports it as an
    // error per run; silently monitoring the remaining columns would
    // report is_valid=true on a feed batch validate rejects)
    val missingRequired = contract.requiredColumns.filterNot(present)
    require(missingRequired.isEmpty,
      s"stream is missing required contract column(s): ${missingRequired.mkString(", ")}")
    val checked = contract.columns.filter(c => present(c.name))
    require(checked.nonEmpty, "no contract columns present in the stream")
    val aggs = checked.flatMap { c =>
      val v = col(c.name)
      val nonNull = v.isNotNull
      // only severity-bearing counters are aggregated — an unused
      // counter would still occupy streaming state every window.
      // The dup estimate is clamped at 0: HLL can over-estimate
      // distincts, and a negative dup count would cancel out genuine
      // errors in the sum (or under-estimate → tiny spurious positives,
      // the documented monitor tolerance)
      (if (!c.nullable)
        Seq(sum(v.isNull.cast("long")).as(s"${c.name}__nulls")) else Nil) ++
        (if (c.unique)
          Seq(greatest(lit(0L), count(v) - approx_count_distinct(v))
            .as(s"${c.name}__dups")) else Nil) ++
        c.minValue.toSeq.map(lo =>
          sum((nonNull && v < lo).cast("long")).as(s"${c.name}__below")) ++
        c.maxValue.toSeq.map(hi =>
          sum((nonNull && v > hi).cast("long")).as(s"${c.name}__above")) ++
        c.allowedValues.toSeq.map(set =>
          sum((nonNull && !v.isin(set.toSeq: _*)).cast("long"))
            .as(s"${c.name}__invalid"))
    }
    val agged = rows.groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("rows"), aggs: _*)
    val errCols = checked.flatMap { c =>
      (if (!c.nullable) Seq(col(s"${c.name}__nulls")) else Nil) ++
        (if (c.unique) Seq(col(s"${c.name}__dups")) else Nil) ++
        c.minValue.toSeq.map(_ => col(s"${c.name}__below")) ++
        c.maxValue.toSeq.map(_ => col(s"${c.name}__above"))
    }
    val warnCols = checked.flatMap(c =>
      c.allowedValues.toSeq.map(_ => col(s"${c.name}__invalid")))
    def total(cs: Seq[Column]) =
      if (cs.isEmpty) lit(0L) else cs.reduce(_ + _)
    agged.select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("rows"), total(errCols).as("errors"), total(warnCols).as("warnings"),
      (total(errCols) === 0L).as("is_valid"))
  }

  /** Drain an events directory through the streaming daily rollup into
    * parquet and return the materialized result (complete mode via
    * foreachBatch overwrite — each AvailableNow drain rewrites the rollup,
    * which is the streaming equivalent of the dashboard's cached query). */
  def rollupAvailableNow(spark: SparkSession, eventsDir: String,
                         outDir: String, checkpoint: String): DataFrame = {
    val rollup = dailyRollup(readEvents(spark, eventsDir))
    val writer = rollup.writeStream
      // COMPLETE mode + overwrite, matching the contract above: update
      // mode + append would re-emit a changed window on the next drain
      // (or next micro-batch within one drain) and the directory would
      // then hold BOTH the stale and the updated row for that day —
      // double-counting on read. Complete re-emits the full aggregate,
      // overwrite keeps exactly the latest rollup.
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
        ()
      }
    runAvailableNow(writer, checkpoint)
    spark.read.parquet(outDir)
  }
}
