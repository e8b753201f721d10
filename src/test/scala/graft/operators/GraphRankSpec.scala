package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: org.apache.spark.sql.DataFrame,
                    iters: Int = 3): Map[Long, (Long, Double)] =
    GraphRank.pageRank(edges, iterations = iters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("pageRank: hand-computed 3 rounds on the path graph 1-2-3") {
    val out = ranks(Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
    // r0=1; r1=(.575,1.85,.575); r2=(.93625,1.1275,.93625);
    // r3(1)=.15+.85*1.1275/2, r3(2)=.15+.85*2*.93625
    assert(out(1L)._1 == 1L && out(2L)._1 == 2L)
    assert(math.abs(out(1L)._2 - 0.6291875) < 1e-9)
    assert(math.abs(out(2L)._2 - 1.741625) < 1e-9)
    assert(out(1L)._2 == out(3L)._2) // symmetric endpoints, identical doubles
  }

  test("pageRank: rank mass is conserved (Σ rank = N every round — " +
    "symmetric graphs have no dangling leak)") {
    val edges = (0 until 40).map(i => (i.toLong, ((i * 7 + 3) % 40).toLong))
      .filter { case (a, b) => a != b }.toDF("a_id", "b_id")
    val out = ranks(edges, iters = 4)
    val n = out.size
    assert(math.abs(out.values.map(_._2).sum - n) < 1e-9)
  }

  test("pageRank: the hub of a star out-ranks its leaves; leaves tie") {
    val out = ranks((1L to 6L).map(l => (0L, l)).toDF("a_id", "b_id"))
    val (hubDeg, hubRank) = out(0L)
    assert(hubDeg == 6L)
    assert((1L to 6L).forall(l => out(l)._2 < hubRank))
    assert((1L to 6L).map(out(_)._2).distinct.size == 1)
  }

  test("pageRank: partition-invariant to the last bit (decimal " +
    "contribution sums)") {
    val edges = (0 until 60).flatMap(i =>
      Seq((i.toLong, ((i * 11 + 5) % 60).toLong),
        (i.toLong, ((i * 3 + 1) % 60).toLong)))
      .filter { case (a, b) => a != b }.toDF("a_id", "b_id")
    val a = ranks(edges).toSeq.sortBy(_._1)
    val b = ranks(edges.repartition(13)).toSeq.sortBy(_._1)
    assert(a === b)
  }

  test("pageRank: parameter guards") {
    val e = Seq((1L, 2L)).toDF("a_id", "b_id")
    intercept[IllegalArgumentException] { GraphRank.pageRank(e, iterations = 0) }
    intercept[IllegalArgumentException] { GraphRank.pageRank(e, damping = 1.0) }
  }

  test("pageRankFromEdgeArtifact: bit-identical to the in-session path, " +
      "and the bucketed layout deletes edge-side Exchanges (the scale " +
      "note realized)") {
    val edges = (0 until 60).flatMap(i =>
      Seq((i.toLong, ((i * 11 + 5) % 60).toLong),
        (i.toLong, ((i * 3 + 1) % 60).toLong)))
      .filter { case (a, b) => a != b }.toDF("a_id", "b_id")
    // clean catalog + leftover warehouse dir (BucketingSpec pattern)
    Seq("gr_edges_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    GraphRank.writeEdgeArtifact(edges, "gr_edges_b", buckets = 4)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small test frames would broadcast — force the SMJ path the
      // bucketing exists for (at scale the edge side is fact-sized)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fromArtifact = GraphRank
        .pageRankFromEdgeArtifact(spark, "gr_edges_b")
      val inSession = GraphRank.pageRank(edges)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2))))
        .sortBy(_._1).toSeq
      assert(rows(fromArtifact) === rows(inSession))
      // the plan dividend: the artifact path, whose edge scans carry
      // the bucket distribution, plans strictly fewer Exchanges than
      // the same loop over a PLAIN (unbucketed) parquet copy
      val plain = java.nio.file.Files
        .createTempDirectory("gr-plain").toString
      spark.table("gr_edges_b").write.mode("overwrite").parquet(plain)
      def loopPlan(symDeg: org.apache.spark.sql.DataFrame): String = {
        var ranks = symDeg.groupBy("src")
          .agg(org.apache.spark.sql.functions.max(col("deg")).as("deg"))
          .select(col("src").as("id"),
            org.apache.spark.sql.functions.lit(1.0).as("rank"))
        for (_ <- 1 to 3) {
          ranks = symDeg
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .select(col("dst"),
              (col("rank") / col("deg")).cast("decimal(38,18)").as("c"))
            .groupBy("dst")
            .agg(org.apache.spark.sql.functions.sum(col("c")).as("cs"))
            .select(col("dst").as("id"),
              (org.apache.spark.sql.functions.lit(0.15) +
                org.apache.spark.sql.functions.lit(0.85) *
                  col("cs").cast("double")).as("rank"))
        }
        ranks.queryExecution.executedPlan.toString
      }
      def exchanges(plan: String): Int =
        "Exchange hashpartitioning".r.findAllIn(plan).size
      val bucketedEx = exchanges(loopPlan(spark.table("gr_edges_b")))
      val plainEx = exchanges(loopPlan(spark.read.parquet(plain)))
      assert(bucketedEx < plainEx,
        s"bucketed loop plans $bucketedEx exchanges vs plain $plainEx — " +
          "the edge-side shuffle was not deleted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
