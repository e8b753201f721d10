package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import graft.functions.{TextAnalysis, WordNgramHashes}
import graft.sources.Tables

/** Dev-only A/B: scan-local sorted-run-length bigram mode vs explode+groupBy. */
object ProbeQ101 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.loadSpread(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[q101] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def scanLocal(): Unit =
      graft.operators.Corpus.repetitionSignals(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save()
    def explodeForm(): Unit = {
      val w = TextAnalysis.words(col("text"))
      val base = docs.select(col("doc_id").as("id"), w.as("w"), lower(col("text")).as("_t"))
        .filter(size(col("w")) >= 5)
        .select(col("id"), size(col("w")).as("n_words"),
          (lit(1.0) - size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("dwf"),
          explode(GraftShim.column(WordNgramHashes(GraftShim.expr(col("_t")), 2))).as("h"))
      base.groupBy(col("id"), col("h"))
        .agg(first(col("n_words")).as("n_words"), first(col("dwf")).as("dwf"),
          count(lit(1)).as("c"))
        .groupBy("id")
        .agg(first(col("n_words")).as("n_words"), first(col("dwf")).as("dwf"),
          (max(col("c")).cast("double") / sum(col("c"))).as("rep2"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) { time(s"scanlocal_$i")(scanLocal()); time(s"explode_$i")(explodeForm()) }
    spark.stop()
  }
}
