package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DSv2 connector gate (SURVEY S1/S2): correctness of the bulk-CSV scan
  * and — the point — that projection and predicates are PUSHED into the
  * source: the executed plan's BatchScanExec must carry the pruned
  * ReadSchema and the accepted PushedFilters, with unsupported
  * predicates left as residuals above the scan. */
class BulkCsvSourceSpec extends SparkSpec {

  private def writeSnapshot(): String = {
    val dir = Files.createTempDirectory("bulkcsv").toFile
    dir.deleteOnExit()
    def w(name: String, body: String): Unit = {
      val f = new java.io.File(dir, name)
      val p = new java.io.PrintWriter(f)
      try p.print(body) finally p.close()
    }
    // two batch files = two input partitions; empty cell = null
    w("batch_0.csv",
      "id,name,amount,segment\n" +
        "1,alpha,10.5,A\n2,beta,,B\n3,gamma,30.0,A\n")
    w("batch_1.csv",
      "id,name,amount,segment\n" +
        "4,delta,40.25,C\n5,epsilon,55.0,A\n")
    dir.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType), StructField("segment", StringType)))

  private def scanOf(df: org.apache.spark.sql.DataFrame): BulkCsvScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.length == 1, s"expected one BatchScanExec, got $scans")
    scans.head.asInstanceOf[BulkCsvScan]
  }

  test("scan reads all rows across batch files with typed nulls") {
    val dir = writeSnapshot()
    val df = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows(1).isNullAt(2), "empty cell must parse as null")
    assert(rows(3).getDouble(2) === 40.25)
    assert(df.rdd.getNumPartitions === 2, "one partition per batch file")
  }

  test("projection pushdown: pruned ReadSchema reaches the source") {
    val dir = writeSnapshot()
    val df = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .select("id", "segment")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq === Seq("id", "segment"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("A", "B", "A", "C", "A"))
  }

  test("predicate pushdown: supported filters land in PushedFilters and " +
      "filter inside the source; unsupported stay residual") {
    val dir = writeSnapshot()
    val df = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .filter(col("segment") === "A" && col("amount") > 20.0)
    val scan = scanOf(df)
    val pushedStr = scan.pushed.mkString(";")
    assert(pushedStr.contains("segment"), s"segment filter not pushed: $pushedStr")
    assert(pushedStr.contains("amount"), s"amount filter not pushed: $pushedStr")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 5L))

    // endswith is not in the supported SOQL-shaped grammar → residual:
    // not pushed, still correct (Spark applies it above the scan)
    val resid = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .filter(col("name").endsWith("ta") && col("id") > 1)
    val scan2 = scanOf(resid)
    assert(!scan2.pushed.mkString(";").toLowerCase.contains("ends"),
      "endswith must not be accepted by the source")
    assert(resid.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L))
  }

  test("predicate pushdown: In and boolean combinations evaluate in-source") {
    val dir = writeSnapshot()
    val in = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .filter(col("segment").isin("A", "C"))
    assert(scanOf(in).pushed.mkString(";").contains("In(segment"),
      "isin must push as an In filter")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L, 5L))

    val orf = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .filter(col("id") < 2 || col("amount") > 50.0)
    val pushedOr = scanOf(orf).pushed.mkString(";")
    assert(pushedOr.contains("Or("), s"disjunction must push whole: $pushedOr")
    assert(orf.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 5L))
  }

  test("schema inference: header-derived all-string schema when none given") {
    val dir = writeSnapshot()
    val df = spark.read.format(BulkCsvSource.format).load(dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("id", "name", "amount", "segment"))
    assert(df.schema.fields.forall(_.dataType == StringType),
      "inferred columns must be strings (bulk CSV carries no types)")
    assert(df.count() === 5)
  }

  test("explain carries the source's pushdown description") {
    val dir = writeSnapshot()
    val df = spark.read.format(BulkCsvSource.format)
      .schema(schema).load(dir)
      .select("id").filter(col("id") > 2)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedFilters"))
    assert(scan.description().contains("ReadSchema"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L, 5L))
  }
}
