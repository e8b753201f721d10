package graft.serve

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.serve.Serve._

/** Filter-compiler and pagination semantics vs the reference API
  * (api/main.py:444-478). */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val recs = Seq(
    (1, 0.9, "High", "Industry Expansion", "o1", "o2"),
    (2, 0.7, "Medium", "Partner Referral", "o3", "o1"),
    (3, 0.4, "Low", "Market Development", "o2", "o3"),
    (4, 0.95, "Very High", "Industry Expansion", "o4", "o5")
  ).toDF("id", "score", "confidence", "recommendation_type", "org1_id", "org2_id")

  test("empty filter compiles to always-true") {
    assert(recs.filter(compile(RecFilter())).count() == 4)
  }

  test("all predicate kinds AND together; org list ORs across both sides") {
    val f = RecFilter(minScore = Some(0.5),
      confidenceLevels = Seq("High", "Medium"), orgIds = Seq("o1"))
    val got = recs.filter(compile(f)).select("id").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2)) // o1 matches via org1 (id 1) and org2 (id 2)
  }

  test("pagination: whitelist fallback, offset+limit, bounds clamp") {
    val p = page(recs, "nonsense_column", ascending = false,
      limit = 2, offset = 1)
    // falls back to score desc → order 4, 1, 2, 3 → offset 1 limit 2 → 1, 2
    assert(p.select("id").as[Int].collect().toSeq == Seq(1, 2))
    assert(page(recs, "score", ascending = true, limit = 5000, offset = 0)
      .count() == 4) // limit clamped to 1000, not an error
  }

  test("insights summary shape (A3)") {
    val row = insightsSummary(
      recs.withColumn("estimated_value", col("score") * 1000)).head
    assert(row.getAs[Long]("total_recommendations") == 4L)
    assert(row.getAs[Long]("high_value_count") == 2L)
  }

  test("CSV export/scan roundtrip preserves rows and declared types (S2/S13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Seq((1L, "Acme Corp", 1000000.0, true),
      (2L, "Global, Inc", 5000000.0, false)) // embedded comma → quoting path
      .toDF("id", "name", "revenue", "active")
    Serve.exportCsv(df, dir)
    val back = Serve.readCsv(spark, dir, df.schema)
    // CSV sources are nullable-by-construction; names+types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)), "explicit schema, no inference drift")
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("JSONL export/scan roundtrip; missing fields null-fill, unknown " +
      "fields ignored (tolerant reader)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val df = Seq((1L, "Acme \"quoted\" Corp", 1000000.0),
      (2L, "Global, Inc", 5000000.0)).toDF("id", "name", "revenue")
    Serve.exportJson(df, dir)
    val back = Serve.readJsonl(spark, dir, df.schema)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // tolerant-reader contract: a feed row missing `revenue` and carrying
    // an undeclared field reads with null revenue, no failure
    val feed = java.nio.file.Files.createTempDirectory("graft-feed").toString
    val w = new java.io.PrintWriter(s"$feed/part-0.json")
    try w.println("""{"id": 3, "name": "Newco", "undeclared": "x"}""")
    finally w.close()
    val row = Serve.readJsonl(spark, feed, df.schema).head
    assert(row.getLong(0) === 3L && row.getString(1) === "Newco")
    assert(row.isNullAt(2), "missing declared field must null-fill")
  }

  test("Excel export: valid OOXML zip, typed cells, XML escaping, nulls, " +
      "header row (S13 — the reference's to_excel)") {
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx")
      .resolve("out.xlsx").toString
    val df = Seq(
      (1L, Some("Acme <&> \"Corp\""), Some(1000000.5), Some(true)),
      (2L, Some("Global, Inc"), None, Some(false)),
      (3L, None, Some(-2.5), None)
    ).toDF("id", "name", "revenue", "active")
    Serve.exportExcel(df.orderBy("id"), path, sheet = "recs")
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.map(_.getName).toSet
      assert(entries === Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml"))
      def read(name: String): String =
        new String(zf.getInputStream(zf.getEntry(name)).readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
      // every part must be well-formed XML (JDK parser, no libs)
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      entries.foreach { e =>
        dbf.newDocumentBuilder().parse(
          new java.io.ByteArrayInputStream(read(e).getBytes("UTF-8")))
      }
      assert(read("xl/workbook.xml").contains("""<sheet name="recs""""))
      val sheet = read("xl/worksheets/sheet1.xml")
      // header row + escaped inline string + typed cells
      assert(sheet.contains("""<row r="1"><c r="A1" t="inlineStr"><is><t xml:space="preserve">id</t></is></c>"""))
      assert(sheet.contains("Acme &lt;&amp;&gt; &quot;Corp&quot;"))
      assert(sheet.contains("""<c r="A2"><v>1</v></c>"""), "long as number cell")
      assert(sheet.contains("""<c r="C2"><v>1000000.5</v></c>"""), "double as number cell")
      assert(sheet.contains("""<c r="D2" t="b"><v>1</v></c>"""), "boolean cell")
      assert(sheet.contains("""<row r="4"><c r="A4"><v>3</v></c><c r="C4"><v>-2.5</v></c></row>"""),
        "null cells omitted entirely")
    } finally zf.close()
    // loud overflow, never silent truncation — and the half-written file
    // must not survive to be mistaken for a successful export
    val err = intercept[IllegalArgumentException] {
      Serve.exportExcel(spark.range(5).toDF("id"), path, maxRows = 3)
    }
    assert(err.getMessage.contains("exceeds 3 rows"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "partial xlsx must be deleted on failure")
  }

  test("Excel export: NaN/Infinity render as inline text, never numeric " +
      "cells (OOXML excludes non-finite doubles)") {
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx3")
      .resolve("nan.xlsx").toString
    val df = Seq((1L, Double.NaN), (2L, Double.PositiveInfinity), (3L, 2.5))
      .toDF("id", "x")
    Serve.exportExcel(df.orderBy("id"), path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val sheet = new String(zf.getInputStream(
        zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      assert(!sheet.contains("<v>NaN</v>") && !sheet.contains("<v>Infinity</v>"))
      assert(sheet.contains("""<c r="B2" t="inlineStr"><is><t xml:space="preserve">NaN</t></is></c>"""))
      assert(sheet.contains("""<c r="B3" t="inlineStr"><is><t xml:space="preserve">Infinity</t></is></c>"""))
      assert(sheet.contains("""<c r="B4"><v>2.5</v></c>"""))
    } finally zf.close()
  }

  test("Excel export: column refs past Z (AA...) and 2^20-row cap default") {
    val wide = (0 until 30).foldLeft(Seq((1)).toDF("c")) {
      case (d, i) => d.withColumn(s"x$i", lit(i))
    }
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx2")
      .resolve("wide.xlsx").toString
    Serve.exportExcel(wide, path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val sheet = new String(zf.getInputStream(
        zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      assert(sheet.contains("""<c r="AA1""""), "27th column must be AA")
      assert(sheet.contains("""<c r="AE2"><v>29</v></c>"""), "31st column AE")
    } finally zf.close()
  }

  test("ORC export/scan roundtrip (second columnar format beside parquet)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // predicate pushdown reaches the ORC reader too
    val plan = spark.read.orc(dir).filter(col("id") === 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"ORC scan must receive pushed filters:\n$plan")
  }

  test("notifyDigest: top-N by score with full-set headline stats on " +
      "every row; TakeOrdered plan, never a global sort") {
    // reference notifications.py:120-199 — top-5 email table whose
    // header interpolates count(*) and the TOTAL estimated value of the
    // whole set, not just the shown rows
    val frame = Seq(
      (1L, 0.9, 100.10), (2L, 0.8, 200.00), (3L, 0.7, 50.25),
      (4L, 0.6, 25.00), (5L, 0.5, 10.00)
    ).toDF("id", "score", "estimated_value")
    val got = notifyDigest(frame, n = 3, tiebreak = Seq(col("id").asc))
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // stats cover ALL 5 rows (385.35), repeated on each emitted row
    assert(got.forall(_.getAs[Long]("n_total") == 5L))
    assert(got.forall(r =>
      math.abs(r.getAs[Double]("total_value") - 385.35) < 1e-9))
    val plan = notifyDigest(frame, n = 3, tiebreak = Seq(col("id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must plan as TakeOrderedAndProject:\n$plan")
  }

  test("point-score path applies expression graph to 1-row frame (E3)") {
    val one = Seq((0.2, 0.6)).toDF("f1", "f2")
    val scored = scoreOne(one, Seq(
      "score" -> (col("f1") * 0.5 + col("f2") * 0.5),
      "confidence" -> graft.ml.Scoring.confidenceLevelScoreOnly(col("score"))))
    val r = scored.head
    assert(math.abs(r.getAs[Double]("score") - 0.4) < 1e-9)
    assert(r.getAs[String]("confidence") == "Low")
  }
}
