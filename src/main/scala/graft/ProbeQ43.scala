package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SortedIntersectCount}
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.graftshim.GraftShim

/** Stage-by-stage timing of minhashNearDups (dev tool). */
object ProbeQ43 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.load(spark, sfDir, "documents")
    val idCol = col("doc_id"); val textCol = col("text")
    val shingleSize = 5; val numHashes = 16; val bands = 8
    val threshold = 0.25; val maxBucketSize = 100

    val exploded = docs
      .select(idCol.as("id"),
        explode(Dedup.shingleHashes(textCol, shingleSize)).as("h"))
    val minAggs = (0 until numHashes).map(i =>
      min(Dedup.permute(col("h"), i)).as(s"_m$i"))
    val docState = exploded.groupBy("id")
      .agg(collect_set(col("h")).as("hs0"), minAggs: _*)
      .select(col("id"), sort_array(col("hs0")).as("hs"),
        size(col("hs0")).as("sz"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docState-materialize") { docState.count() }

    val bandedAll = docState.select(col("id"),
        explode(Dedup.lshBandKeys(col("sig"), numHashes, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val bucketN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key"))
    val banded = bandedAll
      .withColumn("_sz", count(lit(1)).over(bucketN))
      .filter(col("_sz") <= maxBucketSize)
      .drop("_sz")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand-pairs") { println("  cand rows=" + cand.count()) }

    val sigEst = aggregate(
      zip_with(col("a_sig"), col("b_sig"),
        (x, y) => (x === y).cast("int")),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes
    val estGate = threshold - 1.0 / numHashes
    val withSigs = cand
      .join(docState.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(docState.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("_est", sigEst)
      .filter(col("_est") >= estGate)
      .select("a_id", "b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("est-gate") { println("  est rows=" + withSigs.count()) }

    val withSets = withSigs
      .join(docState.select(col("id").as("a_id"), col("hs").as("a_hs"),
        col("sz").as("a_sz")), "a_id")
      .join(docState.select(col("id").as("b_id"), col("hs").as("b_hs"),
        col("sz").as("b_sz")), "b_id")
    val inter = GraftShim.column(SortedIntersectCount(
      GraftShim.expr(col("a_hs")), GraftShim.expr(col("b_hs")))).cast("double")
    val result = withSets.select(col("a_id"), col("b_id"),
        (inter / (col("a_sz") + col("b_sz") - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    time("verify") { println("  result rows=" + result.count()) }
    spark.stop()
  }
}
