package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch
import graft.sources.Tables

/** Temporary r17 instrument: q210 decomposed into timed phases. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val Dim = 64
    val K = 10
    val OpqM = 8
    val OpqSubDim = 8
    val OpqKSub = 64
    val OpqIters = 3

    (1 to 2).foreach { rnd =>
      println(s"=== round $rnd ===")
      val e = Tables.loadSpread(s, sfDir, "embeddings")
      val n = e.count()
      val out = s"/tmp/graft_profile_q210_$rnd"
      val mixQ: Seq[Seq[Double]] = {
        val rnd = new scala.util.Random(11)
        val g = breeze.linalg.DenseMatrix.fill(Dim, Dim)(rnd.nextGaussian())
        val q = breeze.linalg.qr(g).q
        Seq.tabulate(Dim, Dim)((i, j) => q(i, j))
      }
      val decayLit = array((1 to Dim).map(i =>
        lit(math.pow(2.0, -(i - 1) / 8.0))): _*)
      phase("aniso-write") {
        val z = e.select(col("vec_id").as("id"),
          zip_with(col("embedding"), decayLit,
            (x, w) => x.cast("double") * w).as("z"))
        z.select(col("id"),
            SimilaritySearch.rotated(col("z"), mixQ, Dim).as("v"))
          .write.mode("overwrite").parquet(s"$out/aniso")
      }
      val a = s.read.parquet(s"$out/aniso")
      val trainFrac = if (n <= 2048L) 1.0 else 2048.0 / n
      // decomposed replica of opqTrainWithFlat with per-stage timers
      phase("opq-train-decomposed") {
        val d = OpqM * OpqSubDim
        val e2 = a.select(col("id"), col("v"))
        val train = phase("  train-ckpt") { e2.localCheckpoint() }
        var rr: Seq[Seq[Double]] =
          Seq.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
        (0 until OpqIters).foreach { it =>
          val rot = phase(s"  it$it-rot-ckpt") {
            train.select(col("id"),
              SimilaritySearch.rotated(col("v"), rr, d).as("v"))
              .localCheckpoint()
          }
          val cb = phase(s"  it$it-fits") {
            SimilaritySearch.pqCodebookSubKMeans(rot, col("id"), col("v"),
              OpqM, OpqSubDim, OpqKSub, 42L, 1.0, 10, "random")
          }
          if (it < OpqIters - 1) {
            val codes = SimilaritySearch.pqCodesSub(rot, col("id"),
              col("v"), cb, OpqM, OpqSubDim)
            val xhat = codes.join(broadcast(cb), Seq("s", "cid"))
              .groupBy("id")
              .agg(flatten(array_sort(collect_list(struct(col("s"),
                col("cvs")))).getField("cvs")).as("xhat"))
            val cells = phase(s"  it$it-scatter-collect") {
              train.join(xhat, "id")
                .select(posexplode(flatten(
                  transform(col("xhat"), h => transform(col("v"), x => h * x)))))
                .groupBy("pos").agg(sum("col").as("c"))
                .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
            }
            val mMat = breeze.linalg.DenseMatrix.tabulate(d, d)(
              (i, j) => cells.getOrElse(i * d + j, 0.0))
            val svd = breeze.linalg.svd(mMat)
            val rNew = svd.U * svd.Vt
            rr = Seq.tabulate(d, d)((i, j) => rNew(i, j))
          }
        }
      }
      val (r, cbOpq, cbFlat) = phase("opqTrainWithFlat") {
        SimilaritySearch.opqTrainWithFlat(a,
          col("id"), col("v"), OpqM, OpqSubDim, OpqKSub, iters = OpqIters,
          trainFrac = trainFrac, fitMaxIter = 10,
          fitInitMode = "random")
      }
      phase("write-codebooks") {
        cbFlat.write.mode("overwrite").parquet(s"$out/flat_codebook")
        cbOpq.write.mode("overwrite").parquet(s"$out/opq_codebook")
        import s.implicits._
        r.zipWithIndex.map { case (row, i) => (i, row) }.toDF("i", "w")
          .write.mode("overwrite").parquet(s"$out/opq_r")
      }
      val fcb = s.read.parquet(s"$out/flat_codebook")
      val ocb = s.read.parquet(s"$out/opq_codebook")
      val rStored: Seq[Seq[Double]] = s.read.parquet(s"$out/opq_r")
        .orderBy("i").collect().map(_.getSeq[Double](1).toSeq).toSeq
      val q = a.filter(pmod(col("id"), lit(50)) === 7)
        .select(col("id").as("qid"), col("v").as("qv"))
      val nq = q.count()
      def l2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        VectorFunctions.sqDist(x, y)
      val truth = phase("truth") {
        a.crossJoin(broadcast(q))
          .filter(col("id") =!= col("qid"))
          .select(col("qid"), col("id"), l2(col("v"), col("qv")).as("d"))
          .withColumn("tr", row_number().over(
            Window.partitionBy("qid").orderBy(col("d").asc, col("id").asc)))
          .filter(col("tr") <= K).select("qid", "id")
          .localCheckpoint()
      }

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

      val flat = phase("flat-recall-build") { methodRecall(a, q, fcb, "flat_pq") }
      val rotA = a.select(col("id"),
        SimilaritySearch.rotated(col("v"), rStored, Dim).as("v"))
      val rotQ = q.select(col("qid"),
        SimilaritySearch.rotated(col("qv"), rStored, Dim).as("qv"))
      val opq = phase("opq-recall-build") { methodRecall(rotA, rotQ, ocb, "opq") }
      phase("final-noop") {
        flat.unionByName(opq).orderBy("method")
          .write.format("noop").mode("overwrite").save()
      }
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    s.stop()
  }
}
