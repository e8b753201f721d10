package graft.evaluate

import org.apache.spark.sql.SparkSession

/** Regenerates the committed recommendation-list golden
  * (`src/test/resources/golden/ensemble_top50.txt`) from the
  * ordering-gate fixture — run via
  * `tools/run.sh graft.evaluate.GoldenGen` after an INTENTIONAL model
  * change, inspect the diff, and commit it. `EnsembleGoldenSpec` fails
  * on any unintentional drift (an MLlib default change, a broken
  * feature, a weight edit): the golden makes model output diffable the
  * way the DuckDB oracle makes query output diffable.
  *
  * Printed format: one `account1_id|account2_id` line per rank, best
  * first. */
object GoldenGen {
  val GoldenPath = "src/test/resources/golden/ensemble_top50.txt"
  val K = 50

  def main(args: Array[String]): Unit = {
    // spec-session shape (local[4], 4 shuffle partitions): the golden is
    // layout-canonicalized upstream, but generate under the exact config
    // the spec asserts under anyway
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (model, test, cleanup) = MetricsLedger.orderingFixture(spark)
    val lines = MetricsLedger.topPairs(model, test, K)
      .map { case (a, b) => s"$a|$b" }
    cleanup()
    val out = args.headOption.getOrElse(GoldenPath)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.size} ranks to $out")
    spark.stop()
  }
}
