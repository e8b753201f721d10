package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EntityResolution
import graft.operators.EntityResolution.AccountCols

/** Dev-only cost bisection for the ER pair pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = graft.queries.ErQueries.accounts(spark, "/root/testdata/sf0.1")
    val cols = AccountCols()
    val a = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 0), cols, "a")
    val b = EntityResolution.prepSide(acc.filter(col("Id") % 2 === 1), cols, "b")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val blockCond =
      col("a_country") === col("b_country") &&
        floor(col("a_employees") / 300) === floor(col("b_employees") / 300)
    val pairs = a.join(b, blockCond)
    println(s"[probe] blocked pairs = ${pairs.count()}")
    time("prep_a_only")(a.write.format("noop").mode("overwrite").save())
    time("join_only")(pairs.select("a_id", "b_id")
      .write.format("noop").mode("overwrite").save())
    for ((n, c) <- EntityResolution.pairFeatures) {
      time(s"feature_$n")(pairs.select(col("a_id"), col("b_id"), c.as(n))
        .write.format("noop").mode("overwrite").save())
    }
    val fm = EntityResolution.pairFeatures.toMap
    time("all9") {
      EntityResolution.pairFeatures.foldLeft(pairs) {
        case (df, (n, c)) => df.withColumn(n, c)
      }.select((Seq("a_id", "b_id") ++ fm.keys.toSeq).map(col): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("resolve_q32_shape") {
      EntityResolution.resolve(
        acc.filter(col("Id") % 2 === 0), acc.filter(col("Id") % 2 === 1), cols,
        EntityResolution.Config(),
        blockOn = Some(blockCond))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
