package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TopK}
import graft.sources.Tables

/** Dev-only cost bisection for q107 (LSH edges → CC → canonical pick):
  * runs q107 five times in ONE hot JVM (enough repeats to see its
  * steady-state past the JIT tail), q75 and q43 once each as hot
  * references, then times the canonical-pick tail alone on materialized
  * labels — isolating where q107's hot-time gap over q75 lives. */
object ProbeQ107 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe107] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def run(name: String): Unit =
      time(name)(SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    for (i <- 1 to 5) { run("q107_canonical_docs") }
    run("q75_dup_clusters"); run("q43_minhash_neardups")
    // tail alone: labels precomputed
    val docs = Tables.load(spark, sfDir, "documents")
    val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
      .select("a_id", "b_id")
    val labels = time("lsh_cc")(
      Dedup.connectedComponents(edges, maxIter = 20).localCheckpoint())
    println(s"[probe107] n_labels = ${labels.count()}")
    time("tail_join_window") {
      val labeled = labels.join(
        docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      val sized = labeled.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
      TopK.topKPerGroup(sized, Seq(col("component")),
          Seq(col("n_chars").desc, col("id").asc), 1)
        .select(col("component"), col("id").as("canonical_id"),
          col("cluster_size"))
        .orderBy("component")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
