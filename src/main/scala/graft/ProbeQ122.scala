package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch
/** Dev probe: q122 float-stability margins per SF — the smallest
  * |cosine - threshold| over within-list pairs and the smallest
  * top-2 centroid-cosine gap over all vectors. Engine fp divergence is
  * ~1e-12; margins orders above that mean the exact-hash gate cannot
  * flip on arithmetic. */
object ProbeQ122 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val embs = graft.sources.Tables.load(spark, dir, "embeddings")
      val cents = SimilaritySearch.ivfCentroids(embs, col("vec_id"), col("embedding"), 100)
      val e = embs.select(col("vec_id").as("id"), VectorFunctions.unit(col("embedding")).as("u"))
        .filter(col("u").isNotNull)
      val cos = e.join(broadcast(cents))
        .select(col("id"), col("cid"), VectorFunctions.dot(col("u"), col("cu")).as("cos"))
      import org.apache.spark.sql.expressions.Window
      val top2 = cos.withColumn("rk", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid").asc)))
        .filter(col("rk") <= 2)
        .groupBy("id").agg((max(when(col("rk")===1, col("cos"))) -
          max(when(col("rk")===2, col("cos")))).as("gap"))
      val minGap = top2.agg(min("gap")).head.getDouble(0)
      val assigned = cos
        .withColumn("m", max(struct(col("cos"), -col("cid"))).over(Window.partitionBy(col("id"))))
        .filter(col("cos") === col("m.cos") && col("cid") === -col("m.col2"))
      val pairs = assigned.as("x").join(assigned.as("y"),
          col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      val pairCos = pairs.join(e.select(col("id").as("xid"), col("u").as("xu")), col("x.id")===col("xid"))
        .join(e.select(col("id").as("yid"), col("u").as("yu")), col("y.id")===col("yid"))
        .select(VectorFunctions.dot(col("xu"), col("yu")).as("pc"))
      val minThr = pairCos.agg(min(abs(col("pc") - 0.30))).head.getDouble(0)
      println(f"[q122margin] $sf minArgmaxGap=$minGap%.3e minThresholdDist=$minThr%.3e")
    }
    spark.stop()
  }
}
