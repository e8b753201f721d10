package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics specs for the training-pipeline operators: as-of join
  * boundaries, session gap edges, sampling determinism, IVF vs brute
  * force. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf: inclusive boundary, latest-prior wins, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after two rights
      (2L, 10L, ts("2024-01-01 08:00:00")),  // exactly at a right ts
      (3L, 10L, ts("2024-01-01 06:00:00")),  // before all rights
      (4L, 20L, ts("2024-01-01 10:00:00"))   // key with no rights
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0),
      (10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(2.0))   // latest prior
    assert(out(2L) === Some(1.0))   // inclusive: right at same ts matches
    assert(out(3L) === None)        // nothing precedes
    assert(out(4L) === None)        // key absent on right
  }

  test("asOfNext: inclusive boundary, earliest-following wins, " +
      "lookahead tolerance, null when none follows") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 06:00:00")),  // before two rights → earliest
      (2L, 10L, ts("2024-01-01 08:00:00")),  // exactly at a right ts
      (3L, 10L, ts("2024-01-01 10:00:00")),  // after all rights
      (4L, 20L, ts("2024-01-01 06:00:00"))   // key with no rights
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0),
      (10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = AsOfJoin.asOfNext(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "next_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(1.0))   // earliest following, not latest
    assert(out(2L) === Some(1.0))   // inclusive: right at same ts matches
    assert(out(3L) === None)        // nothing follows
    assert(out(4L) === None)        // key absent on right
    // lookahead horizon: 1h tolerance drops the 2h-away match
    val bounded = AsOfJoin.asOfNext(left, right, "user_id", "ts",
        Seq("value"), toleranceSeconds = Some(3600))
      .select("event_id", "next_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(bounded(1L) === None)    // 08:00 is 2h after 06:00 → too far
    assert(bounded(2L) === Some(1.0))
  }

  test("asOf tolerance nulls stale matches but keeps fresh ones") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // right is 1h old → fresh
      (2L, 10L, ts("2024-01-03 10:00:00")))   // right is 2d+ old → stale
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value"),
        toleranceSeconds = Some(86400))
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(5.0))
    assert(out(2L) === None)
  }

  test("asOf: null payload on the latest right row is emitted as null") {
    // row-atomic carry: the most recent right row wins even when its
    // payload value is NULL — a per-column last(ignoreNulls) would leak
    // the OLDER row's 1.0 here (not as-of semantics; DuckDB ASOF → NULL)
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), Some(1.0)),
      (10L, ts("2024-01-01 09:00:00"), None: Option[Double])
    ).toDF("user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === None)
  }

  test("asOf tolerance judges freshness by the row whose payload is emitted") {
    // two-payload carry: both emitted fields must come from the same
    // (latest) right row, and that row's ts drives the tolerance check
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-02 09:30:00")))  // latest right is 1d+ old
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), Some(1.0), "a"),
      (10L, ts("2024-01-01 09:00:00"), None: Option[Double], "b")
    ).toDF("user_id", "ts", "value", "tag")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts",
        Seq("value", "tag"), toleranceSeconds = Some(86400))
      .select("event_id", "asof_value", "asof_tag")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((None, Some("b"))))  // latest row, null value kept
    assert(out(2L) === ((None, None)))       // stale → whole payload null
  }

  test("latestPerKeyTs keeps max-tiebreak row per (key, ts)") {
    val r = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0, 100L),
      (10L, ts("2024-01-01 08:00:00"), 9.0, 200L)
    ).toDF("user_id", "ts", "value", "event_id")
    val kept = AsOfJoin.latestPerKeyTs(r, col("user_id"), col("ts"),
      col("event_id")).select("value").as[Double].collect()
    assert(kept.toSeq === Seq(9.0))
  }

  test("sessionize: gap strictly greater than threshold starts a session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 5.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, 5.0),  // gap == 1800s: SAME session
      (1L, ts("2024-01-01 11:00:01"), 3L, 5.0),  // gap 1801s: new session
      (2L, ts("2024-01-01 10:00:00"), 4L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessions(ev, col("user_id"), col("ts"),
        col("event_id"), 1800, Seq(sum("value").as("total")))
      .select(col("key"), col("session"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("asOf equals the naive range-join formulation on random data") {
    // independent oracle: theta-join all (left, right<=ts) pairs, keep the
    // max-ts right per left row — O(L·R) but exact
    val rnd = new scala.util.Random(23)
    val lefts = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(20).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"))
    }.toDF("event_id", "user_id", "ts")
    val rights = (0 until 200).map { i =>
      (rnd.nextInt(20).toLong,
        ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:30:00"),
        rnd.nextDouble(), 1000L + i)
    }.toDF("user_id", "ts", "value", "event_id")
    val dedupRight = AsOfJoin.latestPerKeyTs(rights, col("user_id"),
      col("ts"), col("event_id")).select("user_id", "ts", "value")
    val fast = AsOfJoin.asOf(lefts, dedupRight, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value")
    val naive = lefts.as("l")
      .join(dedupRight.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"),
        "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max(struct(col("r.ts"), col("r.value"))).as("m"))
      .select(col("event_id"), col("m.value").as("asof_value"))
    assert(fast.count() === 300)
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("sessionize equals a naive per-key scan on random data") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(10).toLong,
        new Timestamp(ts("2024-01-01 00:00:00").getTime +
          rnd.nextInt(5 * 86400) * 1000L), i.toLong, 1.0)
    }
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
    val fast = Sessionize.sessions(ev, col("user_id"), col("ts"),
        col("event_id"), 1800)
      .select(col("key"), col("session"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    // naive: sort each key's events in Scala, split on gap > 1800s
    val naive = rows.groupBy(_._1).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      val sessions = sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, e) =>
        if (acc.isEmpty) Vector(Vector(e._2.getTime))
        else if (e._2.getTime - acc.last.last > 1800 * 1000L)
          acc :+ Vector(e._2.getTime)
        else acc.init :+ (acc.last :+ e._2.getTime)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (user, (i + 1).toLong, s.size.toLong)
      }
    }.toSet
    assert(fast === naive)
  }

  test("hash sampling is invariant under repartitioning") {
    val df = spark.range(2000).toDF("id")
    val s1 = Sampling.sample(df, col("id"), 0.3).select("id")
      .as[Long].collect().toSet
    val s2 = Sampling.sample(df.repartition(13), col("id"), 0.3).select("id")
      .as[Long].collect().toSet
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.size < 2000)
    // roughly the requested fraction (hash uniformity)
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.05)
  }

  test("sampleByWeight keeps rows proportional to weight, deterministically") {
    val df = spark.range(4000).toDF("id")
      .withColumn("w", when(col("id") % 2 === 0, 0.8).otherwise(0.1))
    val kept = Sampling.sampleByWeight(df, col("id"), col("w"))
    val byW = kept.groupBy("w").count()
      .as[(Double, Long)].collect().toMap
    // 2000 rows per weight class; expect ~1600 vs ~200
    assert(math.abs(byW(0.8) - 1600.0) < 120)
    assert(math.abs(byW(0.1) - 200.0) < 70)
    // deterministic under repartitioning
    val again = Sampling.sampleByWeight(df.repartition(7), col("id"), col("w"))
      .select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
  }

  test("tokenBudgetFill: prefix quota semantics, partition invariance, " +
      "zero budget strata contribute nothing") {
    val df = spark.range(300).toDF("id")
      .withColumn("src", concat(lit("s"), pmod(col("id"), lit(3))))
      .withColumn("tok", (pmod(col("id"), lit(7)) + 1).cast("long"))
    val budget = when(col("src") === "s0", 0L).otherwise(40L)
    val kept = Sampling.tokenBudgetFill(df, col("id"), col("src"),
      col("tok"), budget)
    val rows = kept.select("id", "src", "tok", "pos", "cum_tokens").collect()
    // zero-budget stratum contributes nothing
    assert(!rows.exists(_.getString(1) == "s0"))
    // per-stratum: cum is the running sum in pos order and stays ≤ budget
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq === (1 to sorted.length))
      var run = 0L
      sorted.foreach { r =>
        run += r.getAs[Long]("tok")
        assert(r.getAs[Long]("cum_tokens") === run)
      }
      assert(run <= 40L)
    }
    // PREFIX semantics: the kept set is exactly the ≤-budget prefix of
    // the full hash order — no later smaller doc back-fills past an
    // overflowing one
    val ordered = Sampling.tokenBudgetFill(df, col("id"), col("src"),
        col("tok"), lit(Long.MaxValue))
      .filter(col("src") === "s1")
      .orderBy("pos").select("id", "tok").collect()
    var run = 0L
    val prefix = ordered.takeWhile { r =>
      run += r.getAs[Long]("tok"); run <= 40L
    }.map(_.getAs[Long]("id")).toSet
    assert(rows.filter(_.getString(1) == "s1").map(_.getAs[Long]("id")).toSet
      === prefix)
    // partition-invariant
    val again = Sampling.tokenBudgetFill(df.repartition(11), col("id"),
      col("src"), col("tok"), budget)
      .select("id").collect().map(_.getAs[Long]("id")).toSet
    assert(again === rows.map(_.getAs[Long]("id")).toSet)
    // corrupt negative token counts are dropped BEFORE the window — they
    // must not pull the cumulative sum back under budget and re-admit
    // rows past an overflow (the streaming twin closes permanently)
    val withNeg = df.union(Seq((900L, "s1", -50L)).toDF("id", "src", "tok"))
    val guarded = Sampling.tokenBudgetFill(withNeg, col("id"), col("src"),
      col("tok"), budget).select("id").collect().map(_.getAs[Long]("id")).toSet
    assert(guarded === again)
  }

  test("foldAssignment: stable, complete, near-uniform") {
    val df = spark.range(1000).toDF("id")
    val folds = df.select(Sampling.foldAssignment(col("id"), 5).as("f"))
      .groupBy("f").count().as[(Int, Long)].collect().toMap
    assert(folds.keySet === Set(0, 1, 2, 3, 4))
    assert(folds.values.forall(n => n > 120 && n < 280))
  }

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of the big side on one hot key
    val big = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("key", "payload")
    val small = Seq(("hot", 1.0), ("k1", 2.0), ("k3", 3.0)).toDF("key", "w")
    val salted = SaltedJoin.join(big, small, "key", s = 8)
      .select("key", "payload", "w")
    val plain = big.join(small, "key").select("key", "payload", "w")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("ivfAssign picks the brute-force argmax centroid") {
    val rnd = new scala.util.Random(3)
    val embs = (0L until 200L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val assigned = SimilaritySearch.ivfAssign(
      embs, col("vec_id"), col("embedding"), modulus = 50)
      .select("id", "cid").as[(Long, Long)].collect().toMap
    // brute-force reference via cross join + window
    val cents = embs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"),
        graft.functions.VectorFunctions.unit(col("embedding")).as("cu"))
    val e = embs.select(col("vec_id").as("id"),
      graft.functions.VectorFunctions.unit(col("embedding")).as("u"))
    val ref = TopK.topKPerGroup(
        e.crossJoin(cents).select(col("id"), col("cid"),
          graft.functions.VectorFunctions.dot(col("u"), col("cu")).as("cos")),
        Seq(col("id")), Seq(col("cos").desc, col("cid").asc), 1)
      .select("id", "cid").as[(Long, Long)].collect().toMap
    assert(assigned === ref)
  }

  test("ivfTopK results are a prefix-consistent subset of brute force") {
    val rnd = new scala.util.Random(5)
    val embs = (0L until 300L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val ivf = SimilaritySearch.ivfTopK(embs, col("vec_id"), col("embedding"),
      q, modulus = 30, nprobe = 3, k = 5)
      .select("id").as[Long].collect().toSeq
    assert(ivf.size === 5)
    assert(ivf.head === 0L)  // the query vector itself lives in a probed list
    // every returned id really is in the probed lists and ranked by cosine:
    // brute-force order restricted to ivf's members equals ivf's order
    val brute = SimilaritySearch.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), q, 300)
      .select("id").as[Long].collect().toSeq
    assert(brute.filter(ivf.contains) === ivf)
  }

  test("leakageSafeSplit: no near-dup edge ever spans train and eval; " +
      "singletons split by their own id") {
    // components {1,2,3} (chain) and {10,11}; 20..29 singletons
    val docs = ((1L to 3L) ++ Seq(10L, 11L) ++ (20L to 29L)).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Sampling.leakageSafeSplit(docs, col("doc_id"), edges,
        evalFraction = 0.4, salt = "s1")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // cluster members share component AND split — the leakage guard
    assert(Set(1L, 2L, 3L).map(out(_)).size === 1)
    assert(Set(10L, 11L).map(out(_)).size === 1)
    assert(out(1L)._1 === 1L && out(10L)._1 === 10L) // min-id component
    // singleton component = own id; decision = the plain hash split on it
    val u = docs.filter(col("doc_id") >= 20L)
      .select(col("doc_id"), Sampling.hashUniform(col("doc_id"), "s1").as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (20L to 29L).foreach { i =>
      assert(out(i)._1 === i)
      assert((out(i)._2 == "eval") === (u(i) < 0.4))
    }
    val splits = out.values.map(_._2).toSet
    assert(splits.subsetOf(Set("train", "eval")) && splits.size === 2,
      s"0.4 eval fraction over 12 components should produce both splits: $out")
  }
}
