package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only cost bisection for q75 (LSH edges → connected components):
  * times the edge pipeline and each CC round separately. */
object ProbeQ75 {
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
      println(f"[probe75] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
      .select("a_id", "b_id")
    val e0 = time("edges_checkpoint")(edges.localCheckpoint())
    println(s"[probe75] n_edges = ${e0.count()}")
    val confKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    spark.conf.set(confKey, "8m")
    val sym = time("symmetrize")(
      e0.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(e0.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint())
    var labels = time("init_labels")(sym
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_mn"))
      .select(col("id"), least(col("id"), col("_mn")).as("component"))
      .localCheckpoint())
    val idType = labels.schema("id").dataType
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      // mirrors Dedup.connectedComponentsLoop exactly (probed variants:
      // a 2nd pointer hop per round cut rounds 7→6 but cost +0.2s/round;
      // 2 steps per checkpoint cut actions but the untruncated 2-join DAG
      // nearly doubled round cost — the production shape wins both)
      val c = time(s"round_$iter") {
        val viaSelf = labels.select(col("id"), col("component"),
          col("component").as("_old"))
        val viaEdges = sym
          .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
          .select(col("src").as("id"), col("component"),
            lit(null).cast(idType).as("_old"))
        val viaJump = labels.as("l")
          .join(labels.select(col("id").as("c2"), col("component").as("cc")),
            col("l.component") === col("c2"))
          .select(col("l.id").as("id"), col("cc").as("component"),
            lit(null).cast(idType).as("_old"))
        val next = viaSelf.union(viaEdges).union(viaJump)
          .groupBy("id").agg(min("component").as("component"),
            max("_old").as("_old"))
          .localCheckpoint()
        val ch = next.filter(col("component") < col("_old")).count()
        labels = next.select(col("id"), col("component"))
        ch
      }
      println(s"[probe75] round $iter changed=$c")
      changed = c
      iter += 1
    }
    time("census")(labels.groupBy("component")
      .agg(count(lit(1)).as("cluster_size")).orderBy("component")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
