package graft.operators

import org.apache.spark.mllib.clustering.GraftLocalKMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Bit-exactness gate for the r18 driver-local k-means replay
 * ([[GraftLocalKMeans]]): on every (input shape, k, seed, maxIter,
 * initMode) combination the trained-ANN family actually fits —
 * ivfCentroidsKMeans (unit vectors), ivfCentroidsKMeansL2 (raw
 * doubles), pqCodebookSubKMeans subspace slices (k-means|| 256 and the
 * q210 random-init 64) — the local replay must return the SAME
 * centers, in the same order, bit-for-bit
 * (`java.lang.Double.doubleToRawLongBits` equality, not tolerance),
 * as the distributed `org.apache.spark.ml.clustering.KMeans` fit on
 * the same canonical 4-partition layout. This is the proof that
 * swapping the fit engine cannot move ANY declared query's output:
 * identical centers ⇒ identical stored artifacts ⇒ identical
 * downstream ADC/recall rows.
 */
class LocalKMeansSpec extends SparkSpec {

  private val GateDir = "/root/testdata/sf0.01"

  /** The canonForFit layout (SimilaritySearch.canonForFit): hash-mod
    * repartition on the id + in-partition sort — what both engines
    * train on. */
  private def canon(df: DataFrame): DataFrame =
    df.repartition(4, col("id")).sortWithinPartitions("id")

  /** The exact input the distributed ml fit sees, partition-structured
    * for the local replay (SimilaritySearch.collectVectorParts). */
  private def parts(df: DataFrame, featCol: String)
      : Array[Array[org.apache.spark.mllib.linalg.Vector]] =
    df.select(featCol).rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(r => org.apache.spark.mllib.linalg.Vectors.fromML(
          r.getAs[org.apache.spark.ml.linalg.Vector](0))).toArray))
      }
      .collect().sortBy(_._1).map(_._2)

  private def distributedFit(train: DataFrame, k: Int, seed: Long,
                             maxIter: Int, initMode: String)
      : Array[Array[Double]] =
    new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setInitMode(initMode).setMaxIter(maxIter)
      .setTol(1e-6).setFeaturesCol("f")
      .fit(train)
      .clusterCenters.map(_.toArray)

  private def assertBitIdentical(name: String, a: Array[Array[Double]],
                                 b: Array[Array[Double]]): Unit = {
    assert(a.length == b.length,
      s"$name: center count ${a.length} != ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((ca, cb), i) =>
      assert(ca.length == cb.length, s"$name center $i: dim mismatch")
      ca.zip(cb).zipWithIndex.foreach { case ((x, y), d) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y),
          s"$name center $i dim $d: $x != $y (bit mismatch)")
      }
    }
  }

  private def check(name: String, feat: DataFrame, k: Int, seed: Long,
                    maxIter: Int, initMode: String): Unit = {
    // feat: (id, f raw array<double>); both engines get the canon layout
    val c = canon(feat)
    val train = c.withColumn("f",
      org.apache.spark.ml.functions.array_to_vector(col("f")))
      .select("id", "f")
    val dist = distributedFit(train, k, seed, maxIter, initMode)
    val local = GraftLocalKMeans.fit(parts(train, "f"), k, maxIter, 1e-6,
      seed, initMode)
    info(f"$name: ${dist.length} centers, d=${dist.head.length}")
    assertBitIdentical(name, dist, local)
  }

  private lazy val embs = graft.sources.Tables.load(spark, GateDir,
    "embeddings")

  test("trained IVF (unit vectors, k=25, k-means||, 20 iters) — " +
      "ivfCentroidsKMeans config, bit-identical") {
    val feat = embs.select(col("vec_id").as("id"),
        graft.functions.VectorFunctions.unit(col("embedding")).as("f"))
      .filter(col("f").isNotNull)
    check("ivf-km-unit-k25", feat, k = 25, seed = 42L, maxIter = 20,
      initMode = "k-means||")
  }

  test("trained IVF L2 (raw doubles, k=100, k-means||, 20 iters) — " +
      "q204 ivfCentroidsKMeansL2 config, bit-identical") {
    val feat = embs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("f"))
    check("ivf-km-l2-k100", feat, k = 100, seed = 42L, maxIter = 20,
      initMode = "k-means||")
  }

  test("PQ subspace slices (k=256, k-means||, 20 iters) — q211/q214 " +
      "pqCodebookSubKMeans config, bit-identical on subspaces 0 and 7") {
    Seq(0, 7).foreach { s =>
      val feat = embs.select(col("vec_id").as("id"),
        slice(col("embedding").cast("array<double>"), s * 8 + 1, 8).as("f"))
      check(s"pq-sub$s-k256", feat, k = 256, seed = 42L + s, maxIter = 20,
        initMode = "k-means||")
    }
  }

  test("PQ subspace slices (k=64, random init, 10 iters) — the q210 OPQ " +
      "fit config, bit-identical, incl. on decay-scaled (anisotropic) input") {
    val decay = array((1 to 64).map(i =>
      lit(math.pow(2.0, -(i - 1) / 8.0))): _*)
    val aniso = embs.select(col("vec_id").as("id"),
      zip_with(col("embedding"), decay, (x, w) => x.cast("double") * w)
        .as("z"))
    Seq(0, 5).foreach { s =>
      val feat = aniso.select(col("id"), slice(col("z"), s * 8 + 1, 8).as("f"))
      check(s"opq-sub$s-k64-random", feat, k = 64, seed = 42L + s,
        maxIter = 10, initMode = "random")
    }
  }

  test("the fit that actually serves: pqCodebookSubKMeans output is " +
      "unchanged by the local path (full codebook frame comparison)") {
    // end-to-end through the operator: the declared q211/q214 codebook.
    // The local path is on by default; force the distributed engine via
    // the operator's own fallback by comparing against a directly-built
    // distributed codebook frame for one subspace (s=3).
    val cb = SimilaritySearch.pqCodebookSubKMeans(embs, col("vec_id"),
      col("embedding"), m = 8, subDim = 8, k = 256)
    val s3 = cb.filter(col("s") === 3).orderBy("cid")
      .collect().map(r => (r.getLong(1), r.getSeq[Double](2)))
    val feat = embs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("f"))
      .filter(col("f").isNotNull)
    val c = canon(feat)
    val train = c.withColumn("f2",
      org.apache.spark.ml.functions.array_to_vector(
        slice(col("f"), 3 * 8 + 1, 8))).select(col("id"),
      col("f2").as("f"))
    val dist = distributedFit(train, k = 256, seed = 42L + 3, maxIter = 20,
      initMode = "k-means||")
    assert(s3.length == dist.length)
    s3.zip(dist).foreach { case ((cid, cvs), dc) =>
      assert(cvs.zip(dc).forall { case (x, y) =>
        java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y)
      }, s"codebook row cid=$cid differs from the distributed fit")
    }
  }
}
