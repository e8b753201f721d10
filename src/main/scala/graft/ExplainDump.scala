package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** r17 optimization-round instrument: write `.explain("formatted")` for
  * named declared queries to `<outDir>/<query>_<suffix>.txt` — the
  * before/after plan evidence the round's deliverables require
  * (`plans/r17/`). Runs at sf0.001 by default: the *shape* (join
  * strategy, Exchange count, PushedFilters, codegen spans, expression
  * trees) is what is compared, and the formatted plan of the
  * un-executed DataFrame is pre-AQE so it is SF-independent for every
  * declared query.
  *
  * Usage: tools/run.sh graft.ExplainDump <outDir> <suffix> qNNN [qNNN...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump outDir suffix qNNN...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
