package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch
import graft.sources.Tables

/**
 * ANN serving instruments, round 17:
 *
 * q210 — OPQ (Ge et al. 2013, CVPR '13 §3.2 non-parametric
 * alternation) oracle-gated against flat PQ at the same code budget,
 * on the anisotropic-mixed regime where the method is DEFINED to pay
 * (OpqSpec's construction, derived deterministically from the
 * embeddings table and MATERIALIZED: both engines read the same
 * fixture parquet). The k-means fits and the Procrustes SVD are not
 * SQL-replayable, so the trained artifacts (flat codebook, rotation R,
 * rotated-space codebook) are parquet-written by the query and the
 * DuckDB oracle replays everything downstream of training: the R·v
 * rotation, the per-subspace encode argmin, the fixed-order ADC sum,
 * the rank, and the recall rollup — the q204 stored-artifact
 * discipline (reference eval loop: `scripts/evaluate.py:295-442`).
 *
 * q211 — the two-stage binary serving curve (VERDICT r16 #4): packed
 * sign-bit Hamming scan as STAGE-0 candidate generation (8 B/vector —
 * 1/32 of the raw float32 bytes; the standard binary-embedding
 * serving trick), trained-PQ ADC re-rank of the top-B survivors,
 * exact-L2 refine of the rf·K shortlist. Stage-0 replaces the IVF
 * probe as the candidate generator because the measured q204 spilled
 * curve shows probed-list COVERAGE binds first (0.91 recall already
 * costs scanned_frac 0.465 at kIvf=100/A=2); the binary scan has no
 * coverage ceiling — every vector is a candidate at 1/32 the bytes —
 * so the ADC stage (the cost axis q204 measures) shrinks to B/n
 * while recall RISES. `scanned_frac` keeps q204's definition
 * (ADC-stage pairs / (n·nq)) so the curves compare on the same axis;
 * `scan_bytes_frac` is the honest total-bytes accounting INCLUDING
 * the full-corpus stage-0 pass (n·8B binary + B·8B codes + rf·K·256B
 * raw vectors, over a raw scan's n·256B).
 */
object AnnServingQueries {

  private val Dim = 64
  private val K = 10

  // q210 budgets: m=8 × 8-d subspaces; 64 codes per subspace keeps the
  // codebook below fixture-corpus scale at sf0.01 (the OpqSpec ratio).
  // 3 alternations + random-init/10-round Lloyd fits, flat baseline
  // taken from alternation 0 (identity rotation — the SAME sample and
  // trainer, zero extra fits): the instrument trains 24 codebooks in
  // one query over a ≤2k-row sample, where k-means|| init + 20 rounds
  // is pure scheduler overhead (first cut: 74 s → the fit budget is
  // the job count, not the rows); measured gap at these settings:
  // OPQ 0.68 vs flat 0.64
  private val OpqM = 8
  private val OpqSubDim = 8
  private val OpqKSub = 64
  private val OpqIters = 3
  private val OpqFitIters = 10
  private val OpqFitInit = "random"

  // q211 budgets: the q204 code budget (8 B/vector) + binary stage-0
  private val B2M = 8
  private val B2SubDim = 8
  private val B2KSub = 256
  private val B2Configs =
    Seq((5, 3), (10, 3), (20, 3), (20, 5), (30, 3), (40, 5))
  private val B2MaxBpct = B2Configs.map(_._1).max

  private def l2(a: Column, b: Column): Column = VectorFunctions.sqDist(a, b)

  private def sfBase(dir: String): String = new java.io.File(dir).getName

  /** The OpqSpec mixer at D=64: a SEEDED orthogonal matrix (QR of a
    * seeded gaussian). Deterministic across sessions; only the
    * MATERIALIZED fixture matters for oracle parity, never this
    * matrix's arithmetic. */
  private lazy val mixQ: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(11)
    val g = breeze.linalg.DenseMatrix.fill(Dim, Dim)(rnd.nextGaussian())
    val q = breeze.linalg.qr(g).q
    Seq.tabulate(Dim, Dim)((i, j) => q(i, j))
  }

  /**
   * q210: recall@10 of raw-ADC ranking (no refine — the quantizer
   * quality isolated) for flat trained PQ vs OPQ, on the anisotropic
   * fixture, off stored artifacts. Two rows: (method, recall_at_10).
   */
  def opqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadSpread(s, dir, "embeddings")
    val n = e.count()
    val out = Scratch.oraclePath("q210", sfBase(dir))
    // fixture: z = decay ⊙ x concentrates energy in the low dims
    // (2^(-(i-1)/8): dim 1 full scale, dim 64 at ~0.4%), then the
    // seeded orthogonal mix spreads that structure across every PQ
    // subspace — axis-aligned codebooks can no longer see it, a
    // learned rotation can take it back out
    val decayLit = array((1 to Dim).map(i =>
      lit(math.pow(2.0, -(i - 1) / 8.0))): _*)
    val z = e.select(col("vec_id").as("id"),
      zip_with(col("embedding"), decayLit,
        (x, w) => x.cast("double") * w).as("z"))
    z.select(col("id"),
        SimilaritySearch.rotated(col("z"), mixQ, Dim).as("v"))
      .write.mode("overwrite").parquet(s"$out/aniso")
    val a = s.read.parquet(s"$out/aniso")
    // bounded training sample — the 100 TB build contract (q204)
    val trainFrac = if (n <= 2048L) 1.0 else 2048.0 / n
    val (r, cbOpq, cbFlat) = SimilaritySearch.opqTrainWithFlat(a,
      col("id"), col("v"), OpqM, OpqSubDim, OpqKSub, iters = OpqIters,
      trainFrac = trainFrac, fitMaxIter = OpqFitIters,
      fitInitMode = OpqFitInit)
    cbFlat.write.mode("overwrite").parquet(s"$out/flat_codebook")
    cbOpq.write.mode("overwrite").parquet(s"$out/opq_codebook")
    import s.implicits._
    r.zipWithIndex.map { case (row, i) => (i, row) }.toDF("i", "w")
      .write.mode("overwrite").parquet(s"$out/opq_r")
    // serve from the STORED artifacts only (what the oracle reads);
    // R is a bounded d×d artifact — 64 rows to the driver, never data
    val fcb = s.read.parquet(s"$out/flat_codebook")
    val ocb = s.read.parquet(s"$out/opq_codebook")
    val rStored: Seq[Seq[Double]] = s.read.parquet(s"$out/opq_r")
      .orderBy("i").collect().map(_.getSeq[Double](1).toSeq).toSeq
    val q = a.filter(pmod(col("id"), lit(50)) === 7)
      .select(col("id").as("qid"), col("v").as("qv"))
    val nq = q.count()
    val truth = a.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), l2(col("v"), col("qv")).as("d"))
      .withColumn("tr", row_number().over(
        Window.partitionBy("qid").orderBy(col("d").asc, col("id").asc)))
      .filter(col("tr") <= K).select("qid", "id")
      .localCheckpoint()

    def methodRecall(vecs: DataFrame, qs: DataFrame, cb: DataFrame,
                     method: String): DataFrame = {
      val codes = SimilaritySearch.pqCodesSub(vecs, col("id"), col("v"),
        cb, OpqM, OpqSubDim).withColumnRenamed("cid", "code")
      val dq = qs.select(col("qid"), col("qv"),
          explode(sequence(lit(0), lit(OpqM - 1))).as("s"))
        .join(broadcast(cb.select(col("s"), col("cid").as("code"),
          col("cvs"))), Seq("s"))
        .select(col("qid"), col("s"), col("code"),
          l2(slice(col("qv"), col("s") * OpqSubDim + 1, lit(OpqSubDim)),
            col("cvs")).as("dq"))
      val dCols = (0 until OpqM).map(i =>
        max(when(col("s") === i, col("dq"))).as(s"d$i"))
      val adc = codes.join(broadcast(dq), Seq("s", "code"))
        .filter(col("id") =!= col("qid"))
        .groupBy(col("qid"), col("id")).agg(dCols.head, dCols.tail: _*)
        .withColumn("adcd",
          (0 until OpqM).map(i => col(s"d$i")).reduce(_ + _))
      val top = adc.withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("adcd").asc, col("id").asc)))
        .filter(col("rk") <= K).select("qid", "id")
      top.join(truth, Seq("qid", "id"))
        .agg((count(lit(1)).cast("double") /
          lit(K.toLong * nq).cast("double")).as("r"))
        .select(lit(method).as("method"), round(col("r"), 6).as("recall_at_10"))
    }

    val flat = methodRecall(a, q, fcb, "flat_pq")
    val rotA = a.select(col("id"),
      SimilaritySearch.rotated(col("v"), rStored, Dim).as("v"))
    val rotQ = q.select(col("qid"),
      SimilaritySearch.rotated(col("qv"), rStored, Dim).as("qv"))
    val opq = methodRecall(rotA, rotQ, ocb, "opq")
    flat.unionByName(opq).orderBy("method")
  }

  /**
   * q211: the two-stage curve — per (bpct, refine_factor): measured
   * recall@10 vs exact-L2 truth, ADC-stage scanned_frac (q204's cost
   * axis), and the honest total-bytes fraction including stage-0.
   * Single-pass plan (the q203/q204 shape): hamming ranks once at max
   * B, ADC once per max-B survivor, configs are filters.
   */
  def twoStageCurve(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadSpread(s, dir, "embeddings")
    val n = e.count()
    val trainFrac = if (n <= 2048L) 1.0 else 2048.0 / n
    val out = Scratch.oraclePath("q211", sfBase(dir))
    SimilaritySearch.pqCodebookSubKMeans(e, col("vec_id"),
        col("embedding"), B2M, B2SubDim, B2KSub, trainFrac = trainFrac)
      .write.mode("overwrite").parquet(s"$out/codebook")
    val cb = s.read.parquet(s"$out/codebook")
    val ev = e.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val q = ev.filter(pmod(col("id"), lit(50)) === 7)
      .select(col("id").as("qid"), col("v").as("qv"))
    val nq = q.count()
    import s.implicits._
    val cfg = B2Configs.toDF("bpct", "refine_factor")
    val bOf = ceil(lit(n).cast("double") * col("bpct") / lit(100.0))
      .cast("long")
    val maxB = math.ceil(n.toDouble * B2MaxBpct / 100.0).toLong

    // stage-0 ONCE at max B: xor+popcount over packed sign codes —
    // the 1/32-bytes scan, no float math, no coverage ceiling
    val bcodes = ev.select(col("id"),
      SimilaritySearch.binarySignCode(col("v"), Dim).as("c"))
    val qcodes = q.select(col("qid"),
      SimilaritySearch.binarySignCode(col("qv"), Dim).as("qc"))
    val hr = bcodes.crossJoin(broadcast(qcodes))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        SimilaritySearch.hammingDistance(col("c"), col("qc")).as("h"))
      .withColumn("rh", row_number().over(
        Window.partitionBy("qid").orderBy(col("h").asc, col("id").asc)))
      .filter(col("rh") <= maxB)
      .select("qid", "id", "rh")
      .localCheckpoint()
    val scanned = hr.join(broadcast(cfg), col("rh") <= bOf)
      .groupBy("bpct", "refine_factor")
      .agg(count(lit(1)).as("pairs"))
      .select(col("bpct"), col("refine_factor"),
        (col("pairs").cast("double") / lit(n * nq).cast("double"))
          .as("scanned_frac"),
        ((lit(n.toDouble) * lit(8.0) +
          (col("pairs").cast("double") / lit(nq.toDouble)) * lit(8.0) +
          col("refine_factor").cast("double") * lit(2560.0)) /
          (lit(n.toDouble) * lit(256.0))).as("scan_bytes_frac"))

    // ADC once per max-B survivor (codes are per-vector facts)
    val codes = SimilaritySearch.pqCodesSub(ev, col("id"), col("v"),
      cb, B2M, B2SubDim).withColumnRenamed("cid", "code")
    val dq = q.select(col("qid"), col("qv"),
        explode(sequence(lit(0), lit(B2M - 1))).as("s"))
      .join(broadcast(cb.select(col("s"), col("cid").as("code"),
        col("cvs"))), Seq("s"))
      .select(col("qid"), col("s"), col("code"),
        l2(slice(col("qv"), col("s") * B2SubDim + 1, lit(B2SubDim)),
          col("cvs")).as("dq"))
    val dCols = (0 until B2M).map(i =>
      max(when(col("s") === i, col("dq"))).as(s"d$i"))
    val adc = hr.join(codes, "id")
      .join(broadcast(dq), Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(max(col("rh")).as("rh"), dCols: _*)
      .withColumn("adcd",
        (0 until B2M).map(i => col(s"d$i")).reduce(_ + _))
    val shortlist = adc.join(broadcast(cfg), col("rh") <= bOf)
      .withColumn("rk", row_number().over(
        Window.partitionBy("bpct", "refine_factor", "qid")
          .orderBy(col("adcd").asc, col("id").asc)))
      .filter(col("rk") <= col("refine_factor") * K)
      .select("bpct", "refine_factor", "qid", "id")
    // exact-L2 refine, computed once per distinct shortlisted pair
    val pairL2 = shortlist.select("qid", "id").distinct()
      .join(ev, "id").join(broadcast(q), "qid")
      .select(col("qid"), col("id"), l2(col("v"), col("qv")).as("d"))
    val refined = shortlist.join(pairL2, Seq("qid", "id"))
      .withColumn("fr", row_number().over(
        Window.partitionBy("bpct", "refine_factor", "qid")
          .orderBy(col("d").asc, col("id").asc)))
      .filter(col("fr") <= K)
      .select("bpct", "refine_factor", "qid", "id")
    // ground truth — the one contracted all-pairs instrument pass
    val truth = ev.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), l2(col("v"), col("qv")).as("d"))
      .withColumn("tr", row_number().over(
        Window.partitionBy("qid").orderBy(col("d").asc, col("id").asc)))
      .filter(col("tr") <= K).select("qid", "id")
    val rec = refined.join(truth, Seq("qid", "id"))
      .groupBy("bpct", "refine_factor")
      .agg((count(lit(1)).cast("double") /
        lit(K.toLong * nq).cast("double")).as("recall_at_10"))
    cfg.join(rec, Seq("bpct", "refine_factor"), "left")
      .join(scanned, Seq("bpct", "refine_factor"), "left")
      .select(col("bpct"), col("refine_factor"),
        round(coalesce(col("recall_at_10"), lit(0.0)), 6).as("recall_at_10"),
        round(coalesce(col("scanned_frac"), lit(0.0)), 6).as("scanned_frac"),
        round(coalesce(col("scan_bytes_frac"), lit(0.0)), 6)
          .as("scan_bytes_frac"))
      .orderBy("bpct", "refine_factor")
  }

  // q214 operating point: the q211 curve's (bp20, rf3) row — measured
  // recall@10 0.95 at a 0.30 ADC-scan fraction
  private val ServeBpct = 20
  private val ServeRf = 3

  /**
   * q214: the q211 operating point AS A SERVING CALL —
   * [[SimilaritySearch.binaryAdcRefinedTopK]] (binary stage-0 →
   * trained-PQ ADC → exact-cosine refine) answering one query vector
   * off the stored trained codebook, gated row-for-row: the oracle
   * replays the sign-mismatch rank, the ADC re-rank from the parquet
   * codebook, and the exact-cosine top-k. The curve instrument proves
   * the operating point; this gates the production entry a caller
   * actually invokes.
   */
  def binaryAdcServe(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadSpread(s, dir, "embeddings")
    val n = e.count()
    val trainFrac = if (n <= 2048L) 1.0 else 2048.0 / n
    val out = Scratch.oraclePath("q214", sfBase(dir))
    SimilaritySearch.pqCodebookSubKMeans(e, col("vec_id"),
        col("embedding"), B2M, B2SubDim, B2KSub, trainFrac = trainFrac)
      .write.mode("overwrite").parquet(s"$out/codebook")
    val cb = s.read.parquet(s"$out/codebook")
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val candidates = math.ceil(n.toDouble * ServeBpct / 100.0).toInt
    SimilaritySearch.binaryAdcRefinedTopK(e, col("vec_id"),
        col("embedding"), cb, B2M, B2SubDim, q, Dim, K,
        candidates, ServeRf)
      .select(col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_opq_adc_recall" -> ((s, dir) => opqRecall(s, dir)),
    "q211_ann_twostage_curve" -> ((s, dir) => twoStageCurve(s, dir)),
    "q214_binary_adc_serving" -> ((s, dir) => binaryAdcServe(s, dir)))

  val oracleSql: Map[String, String] = Map(

    // Replays from the stored q210 artifacts (aniso fixture + flat
    // codebook + R + rotated codebook — all parquet written by THIS
    // run's Spark query, pid-keyed path): the R·v rotation, the
    // per-subspace encode argmin, the fixed-order ADC, the rank, and
    // the recall rollup, for both methods.
    "q210_opq_adc_recall" -> {
      val out = Scratch.oraclePath("q210", "sf0.01")
      val sub = (v: String, cb: String) =>
        s"""list_sum([ ($v[$cb.s*$OpqSubDim+i] - $cb.cvs[i])
           |         * ($v[$cb.s*$OpqSubDim+i] - $cb.cvs[i])
           |           FOR i IN range(1, ${OpqSubDim + 1}) ])""".stripMargin
      val fullL2 = (a: String, b: String) =>
        s"""list_sum([ ($a[i] - $b[i]) * ($a[i] - $b[i])
           |           FOR i IN range(1, ${Dim + 1}) ])""".stripMargin
      val adcSum = (0 until OpqM)
        .map(i => s"max(CASE WHEN k.s = $i THEN d.dq END)")
        .mkString("\n        |      + ")
      s"""WITH a AS (SELECT id, v FROM read_parquet('$out/aniso/*.parquet')),
        |q AS (SELECT id AS qid, v AS qv FROM a WHERE id % 50 = 7),
        |nq AS (SELECT CAST(count(*) AS DOUBLE) AS nq FROM q),
        |truth AS (SELECT q.qid, a.id FROM a, q WHERE a.id <> q.qid
        |  QUALIFY row_number() OVER (PARTITION BY q.qid
        |    ORDER BY ${fullL2("a.v", "q.qv")} ASC, a.id ASC) <= $K),
        |fcb AS (SELECT s, cid AS code, cvs
        |  FROM read_parquet('$out/flat_codebook/*.parquet')),
        |fcodes AS (SELECT a.id, cb.s, cb.code FROM a, fcb cb
        |  QUALIFY row_number() OVER (PARTITION BY a.id, cb.s
        |    ORDER BY ${sub("a.v", "cb")} ASC, cb.code ASC) = 1),
        |fdq AS (SELECT q.qid, cb.s, cb.code, ${sub("q.qv", "cb")} AS dq
        |  FROM q, fcb cb),
        |fadc AS (SELECT d.qid, k.id,
        |    $adcSum AS adcd
        |  FROM fcodes k JOIN fdq d ON d.s = k.s AND d.code = k.code
        |  WHERE k.id <> d.qid GROUP BY d.qid, k.id),
        |ftop AS (SELECT qid, id FROM fadc
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |    ORDER BY adcd ASC, id ASC) <= $K),
        |frec AS (SELECT count(*) / ($K * nq.nq) AS r
        |  FROM ftop t JOIN truth tr ON tr.qid = t.qid AND tr.id = t.id, nq
        |  GROUP BY nq.nq),
        |rr AS (SELECT i, w FROM read_parquet('$out/opq_r/*.parquet')),
        |arotc AS (SELECT a.id, rr.i,
        |    list_sum([ rr.w[j] * a.v[j] FOR j IN range(1, ${Dim + 1}) ])
        |      AS val
        |  FROM a, rr),
        |arot AS (SELECT id, list(val ORDER BY i) AS v
        |  FROM arotc GROUP BY id),
        |qrot AS (SELECT id AS qid, v AS qv FROM arot WHERE id % 50 = 7),
        |ocb AS (SELECT s, cid AS code, cvs
        |  FROM read_parquet('$out/opq_codebook/*.parquet')),
        |ocodes AS (SELECT a.id, cb.s, cb.code FROM arot a, ocb cb
        |  QUALIFY row_number() OVER (PARTITION BY a.id, cb.s
        |    ORDER BY ${sub("a.v", "cb")} ASC, cb.code ASC) = 1),
        |odq AS (SELECT q.qid, cb.s, cb.code, ${sub("q.qv", "cb")} AS dq
        |  FROM qrot q, ocb cb),
        |oadc AS (SELECT d.qid, k.id,
        |    $adcSum AS adcd
        |  FROM ocodes k JOIN odq d ON d.s = k.s AND d.code = k.code
        |  WHERE k.id <> d.qid GROUP BY d.qid, k.id),
        |otop AS (SELECT qid, id FROM oadc
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |    ORDER BY adcd ASC, id ASC) <= $K),
        |orec AS (SELECT count(*) / ($K * nq.nq) AS r
        |  FROM otop t JOIN truth tr ON tr.qid = t.qid AND tr.id = t.id, nq
        |  GROUP BY nq.nq)
        |SELECT method, recall_at_10 FROM (
        |  SELECT 'flat_pq' AS method,
        |    round(coalesce((SELECT r FROM frec), 0.0), 6) AS recall_at_10
        |  UNION ALL
        |  SELECT 'opq' AS method,
        |    round(coalesce((SELECT r FROM orec), 0.0), 6) AS recall_at_10)
        |ORDER BY method""".stripMargin
    },

    // Replays the binary stage-0 (sign mismatch count ≡ xor+popcount
    // of the packed sign codes), the ADC re-rank from the stored
    // trained codebook, the exact-L2 refine, the recall, and BOTH
    // cost fractions.
    "q211_ann_twostage_curve" -> {
      val out = Scratch.oraclePath("q211", "sf0.01")
      val sub = (v: String) =>
        s"""list_sum([ ($v[cb.s*$B2SubDim+i] - cb.cvs[i])
           |         * ($v[cb.s*$B2SubDim+i] - cb.cvs[i])
           |           FOR i IN range(1, ${B2SubDim + 1}) ])""".stripMargin
      val fullL2 = (a: String, b: String) =>
        s"""list_sum([ ($a[i] - $b[i]) * ($a[i] - $b[i])
           |           FOR i IN range(1, ${Dim + 1}) ])""".stripMargin
      val adcSum = (0 until B2M)
        .map(i => s"max(CASE WHEN k.s = $i THEN d.dq END)")
        .mkString("\n        |      + ")
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |    FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
        |q AS (SELECT id AS qid, v AS qv FROM e WHERE id % 50 = 7),
        |nq AS (SELECT CAST(count(*) AS DOUBLE) AS nq FROM q),
        |cfgb AS (SELECT t.bpct, t.refine_factor,
        |    CAST(ceiling(nn.n * t.bpct / 100.0) AS BIGINT) AS b
        |  FROM (VALUES ${B2Configs.map { case (b, r) =>
           s"($b, $r)" }.mkString(", ")}) t(bpct, refine_factor), nn),
        |hr AS (SELECT q.qid, e.id,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY
        |      list_sum([ CASE WHEN (e.v[i] > 0) <> (q.qv[i] > 0)
        |        THEN 1 ELSE 0 END FOR i IN range(1, ${Dim + 1}) ]) ASC,
        |      e.id ASC) AS rh
        |  FROM e, q WHERE e.id <> q.qid
        |  QUALIFY rh <= (SELECT CAST(ceiling(nn.n * $B2MaxBpct / 100.0)
        |    AS BIGINT) FROM nn)),
        |scanned AS (SELECT c.bpct, c.refine_factor,
        |    count(*) / (nn.n * nq.nq) AS scanned_frac,
        |    (nn.n * 8.0 + (count(*) / nq.nq) * 8.0
        |      + c.refine_factor * 2560.0) / (nn.n * 256.0)
        |      AS scan_bytes_frac
        |  FROM hr JOIN cfgb c ON hr.rh <= c.b, nn, nq
        |  GROUP BY c.bpct, c.refine_factor, nn.n, nq.nq),
        |cb AS (SELECT s, cid AS code, cvs
        |  FROM read_parquet('$out/codebook/*.parquet')),
        |codes AS (SELECT e.id, cb.s, cb.code FROM e, cb
        |  QUALIFY row_number() OVER (PARTITION BY e.id, cb.s
        |    ORDER BY ${sub("e.v")} ASC, cb.code ASC) = 1),
        |dq AS (SELECT q.qid, cb.s, cb.code, ${sub("q.qv")} AS dq
        |  FROM q, cb),
        |adc AS (SELECT h.qid, h.id, h.rh,
        |    $adcSum AS adcd
        |  FROM hr h JOIN codes k ON k.id = h.id
        |    JOIN dq d ON d.qid = h.qid AND d.s = k.s AND d.code = k.code
        |  GROUP BY h.qid, h.id, h.rh),
        |short AS (SELECT c.bpct, c.refine_factor, a.qid, a.id,
        |    row_number() OVER (PARTITION BY c.bpct, c.refine_factor, a.qid
        |      ORDER BY a.adcd ASC, a.id ASC) AS rk
        |  FROM adc a JOIN cfgb c ON a.rh <= c.b
        |  QUALIFY rk <= c.refine_factor * $K),
        |pairl2 AS (SELECT p.qid, p.id, ${fullL2("e.v", "q.qv")} AS d
        |  FROM (SELECT DISTINCT qid, id FROM short) p
        |    JOIN e ON e.id = p.id JOIN q ON q.qid = p.qid),
        |refined AS (SELECT s.bpct, s.refine_factor, s.qid, s.id
        |  FROM short s JOIN pairl2 p ON p.qid = s.qid AND p.id = s.id
        |  QUALIFY row_number() OVER (PARTITION BY s.bpct, s.refine_factor,
        |      s.qid ORDER BY p.d ASC, s.id ASC) <= $K),
        |truth AS (SELECT q.qid, e.id FROM e, q WHERE e.id <> q.qid
        |  QUALIFY row_number() OVER (PARTITION BY q.qid
        |    ORDER BY ${fullL2("e.v", "q.qv")} ASC, e.id ASC) <= $K),
        |rec AS (SELECT r.bpct, r.refine_factor,
        |    count(*) / ($K * nq.nq) AS recall_at_10
        |  FROM refined r JOIN truth t ON t.qid = r.qid AND t.id = r.id, nq
        |  GROUP BY r.bpct, r.refine_factor, nq.nq)
        |SELECT c.bpct, c.refine_factor,
        |  round(coalesce(rec.recall_at_10, 0.0), 6) AS recall_at_10,
        |  round(coalesce(sc.scanned_frac, 0.0), 6) AS scanned_frac,
        |  round(coalesce(sc.scan_bytes_frac, 0.0), 6) AS scan_bytes_frac
        |FROM cfgb c
        |LEFT JOIN rec ON rec.bpct = c.bpct
        |  AND rec.refine_factor = c.refine_factor
        |LEFT JOIN scanned sc ON sc.bpct = c.bpct
        |  AND sc.refine_factor = c.refine_factor
        |ORDER BY c.bpct, c.refine_factor""".stripMargin
    },

    // Replays the three serving stages off the stored trained codebook:
    // sign-mismatch count (≡ xor+popcount of the packed sign codes)
    // ranked to the candidate budget, the ADC re-rank to rf·k, the
    // exact-cosine top-k. Self-match included (rank 1), as in q209.
    "q214_binary_adc_serving" -> {
      val out = Scratch.oraclePath("q214", "sf0.01")
      val sub = (v: String) =>
        s"""list_sum([ ($v[cb.s*$B2SubDim+i] - cb.cvs[i])
           |         * ($v[cb.s*$B2SubDim+i] - cb.cvs[i])
           |           FOR i IN range(1, ${B2SubDim + 1}) ])""".stripMargin
      val adcSum = (0 until B2M)
        .map(i => s"max(CASE WHEN k.s = $i THEN d.dq END)")
        .mkString("\n        |      + ")
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |    FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
        |q AS (SELECT v AS qv FROM e WHERE id = 0),
        |hr AS (SELECT e.id, e.v,
        |    row_number() OVER (ORDER BY
        |      list_sum([ CASE WHEN (e.v[i] > 0) <> (q.qv[i] > 0)
        |        THEN 1 ELSE 0 END FOR i IN range(1, ${Dim + 1}) ]) ASC,
        |      e.id ASC) AS rh
        |  FROM e, q
        |  QUALIFY rh <= (SELECT CAST(ceiling(nn.n * $ServeBpct / 100.0)
        |    AS BIGINT) FROM nn)),
        |cb AS (SELECT s, cid AS code, cvs
        |  FROM read_parquet('$out/codebook/*.parquet')),
        |codes AS (SELECT h.id, cb.s, cb.code FROM hr h, cb
        |  QUALIFY row_number() OVER (PARTITION BY h.id, cb.s
        |    ORDER BY ${sub("h.v")} ASC, cb.code ASC) = 1),
        |dq AS (SELECT cb.s, cb.code, ${sub("q.qv")} AS dq FROM q, cb),
        |adc AS (SELECT k.id, $adcSum AS adcd
        |  FROM codes k JOIN dq d ON d.s = k.s AND d.code = k.code
        |  GROUP BY k.id),
        |short AS (SELECT id FROM adc
        |  QUALIFY row_number() OVER (ORDER BY adcd ASC, id ASC)
        |    <= ${ServeRf * K})
        |SELECT e.id,
        |  round(list_cosine_similarity(e.v, q.qv), 6) AS cosine,
        |  CAST(row_number() OVER (ORDER BY
        |    list_cosine_similarity(e.v, q.qv) DESC, e.id ASC)
        |    AS INTEGER) AS rank
        |FROM e JOIN short ss ON ss.id = e.id, q
        |QUALIFY rank <= $K ORDER BY rank""".stripMargin
    })
}
