package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.loadSpread(spark, "/root/testdata/sf0.1", "documents")
    val edges = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
      shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
      .select("a_id", "b_id").localCheckpoint()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[cc] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (i <- 1 to 3) {
      time(s"driver_$i")(Dedup.connectedComponents(edges, 20)
        .write.format("noop").mode("overwrite").save())
      time(s"loop_$i")(Dedup.connectedComponents(edges, 20, driverEdgeCap = 0)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
