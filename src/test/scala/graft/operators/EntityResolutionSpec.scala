package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/**
 * Fixture mirrors the reference's account shape (reference:
 * tests/test_all.py:38-51; ER semantics entity_resolution.py:403-446).
 */
class EntityResolutionSpec extends SparkSpec {
  import EntityResolution._
  import spark.implicits._

  private def acc(id: String, name: String, website: String, country: String,
                  industry: String, employees: Double) =
    (id, name, website, country, industry, employees)

  private val schema = Seq("Id", "Name", "Website", "BillingCountry",
    "Industry", "NumberOfEmployees")

  lazy val org1 = Seq(
    acc("o1_1", "Acme Corp", "www.acme.com", "USA", "Technology", 5000),
    acc("o1_2", "Global Industries Inc", "globalind.com", "USA", "Manufacturing", 1200),
    acc("o1_3", "Tiny Shop", "tinyshop.io", "Canada", "Retail", 12)
  ).toDF(schema: _*)

  lazy val org2 = Seq(
    // exact: same root domain AND same normalized name ("acme" == "acme")
    acc("o2_1", "ACME Corporation", "http://acme.com/home", "USA", "Technology", 4800),
    // fuzzy: similar name, different domain
    acc("o2_2", "Global Industry", "www.glbind.net", "USA", "Manufacturing", 1000),
    // non-match in a different block
    acc("o2_3", "Zeta Research", "zeta.org", "Germany", "Biotech", 40)
  ).toDF(schema: _*)

  test("exact shortcut: domain+name exact → score 1.0, type exact") {
    val out = resolve(org1, org2).collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val m = out(("o1_1", "o2_1"))
    assert(m.getDouble(2) == 1.0)
    assert(m.getString(3) == "exact")
    assert(m.getString(4) == "high")
    assert(m.getSeq[String](5) == Seq("Exact domain and name match"))
  }

  test("fuzzy match: similar name in same block passes threshold with reasons") {
    val out = resolve(org1, org2, cfg = Config(matchThreshold = 0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val m = out(("o1_2", "o2_2"))
    assert(m.getString(3) == "fuzzy")
    assert(m.getDouble(2) > 0.5 && m.getDouble(2) < 1.0)
    assert(m.getSeq[String](5).contains("Same country"))
    assert(m.getSeq[String](5).contains("Same industry"))
  }

  test("blocking prunes cross-block pairs; crossJoin fallback finds them") {
    val blocked = resolve(org1, org2, cfg = Config(matchThreshold = 0.0))
    // zeta (Germany) never pairs with canada/usa blocks
    assert(!blocked.collect().exists(_.getString(1) == "o2_3"))
    val unblocked = resolve(org1, org2,
      cfg = Config(matchThreshold = 0.0, useBlocking = false))
    assert(unblocked.collect().exists(_.getString(1) == "o2_3"))
    assert(unblocked.count() == 9) // full 3×3 cross
  }

  test("pair features: size_ratio default 0.5 when employees unknown") {
    val a = prepSide(Seq(acc("a", "X Co", "x.com", "USA", "T", 0)).toDF(schema: _*),
      AccountCols(), "a")
    val b = prepSide(Seq(acc("b", "Y Co", "y.com", "USA", "T", 100)).toDF(schema: _*),
      AccountCols(), "b")
    val f = pairFeatures.foldLeft(a.crossJoin(b)) { case (d, (n, c)) => d.withColumn(n, c) }
    assert(f.select("size_ratio").head.getDouble(0) == 0.5)
  }

  test("confusionMetrics: known tp/fp/fn") {
    val df = Seq((true, true), (true, true), (true, false), (false, true),
      (false, false)).toDF("pred", "label")
    val m = confusionMetrics(df, col("pred"), col("label")).head
    assert(m.getLong(0) == 2 && m.getLong(1) == 1 && m.getLong(2) == 1)
    assert(math.abs(m.getDouble(3) - 2.0 / 3) < 1e-9) // precision
    assert(math.abs(m.getDouble(4) - 2.0 / 3) < 1e-9) // recall
    assert(math.abs(m.getDouble(5) - 2.0 / 3) < 1e-9) // f1
  }

  test("candidate generation: top-k per org + org-pair cross (reference cap)") {
    val accounts = (1 to 30).map(i =>
      (s"a$i", s"org${i % 3}", i.toDouble)).toDF("id", "org", "revenue")
    val pairs = Candidates.candidatePairs(accounts, "org",
      Seq(col("revenue").desc, col("id").asc), 5)
    // 3 orgs → 3 unordered pairs × 5×5
    assert(pairs.count() == 75)
    assert(Candidates.orgPairs(accounts, "org").count() == 3)
  }
}
