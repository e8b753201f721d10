package graft
/** Dev probe: q122 float-stability margins per SF — the smallest
  * |cosine - threshold| over within-list pairs and the smallest
  * top-2 centroid-cosine gap over all vectors. The computation (and the
  * 1e-9 soundness bound Verify enforces on every q122 verify) lives in
  * [[graft.queries.Q122Margin]]; this wrapper just reports all three SFs.
  * Run: sbt "Test/runMain graft.ProbeQ122" */
object ProbeQ122 {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val (gap, thr) =
        graft.queries.Q122Margin.margins(spark, s"/root/testdata/$sf")
      println(f"[q122margin] $sf minArgmaxGap=$gap%.3e minThresholdDist=$thr%.3e")
    }
    spark.stop()
  }
}
