package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The ER blocked join's salt option (VERDICT r8 #2): a constructed hot
 * block — the degenerate 3+3 key the reference's blocking produces for
 * uninformative names ("The …" × one country, entity_resolution.py:287-294)
 * — resolved salted vs unsalted must be ROW-IDENTICAL. Salting only
 * re-partitions the pair work ([[SaltedJoin.joinOn]]); the candidate pair
 * set, features, scores, and reasons are untouched.
 */
class SaltedBlockingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = Seq("Id", "Name", "Website", "BillingCountry",
    "Industry", "NumberOfEmployees")

  // one hot block ("the_usa") carrying ~90% of each side, plus a light
  // tail of healthy blocks — the exact skew shape salting exists for
  private lazy val orgA = ((0 until 90).map { i =>
    (s"a$i", s"The Widget Company $i", s"widget$i.com", "USA",
      "Technology", 100.0 + i)
  } ++ (0 until 10).map { i =>
    (s"ax$i", s"Zeta Labs $i", s"zeta$i.org", "Germany", "Biotech", 40.0 + i)
  }).toDF(schema: _*)

  private lazy val orgB = ((0 until 45).map { i =>
    (s"b$i", s"The Widget Company ${i * 2}", s"widget${i * 2}.com", "USA",
      "Technology", 95.0 + i)
  } ++ (0 until 5).map { i =>
    (s"bx$i", s"Zeta Labs ${i * 2}", s"zeta${i * 2}.org", "Germany",
      "Biotech", 38.0 + i)
  }).toDF(schema: _*)

  test("candidatePairs(salt=8) is row-identical to the unsalted blocked join") {
    val a = EntityResolution.prepSide(orgA, EntityResolution.AccountCols(), "a")
    val b = EntityResolution.prepSide(orgB, EntityResolution.AccountCols(), "b")
    val plain = EntityResolution.candidatePairs(a, b)
    val salted = EntityResolution.candidatePairs(a, b, salt = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq) // no salt leakage
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the hot block really is hot: most pairs share one blocking key
    val hot = plain.filter(col("a_block") === "the_usa").count()
    assert(hot === 90L * 45L)
  }

  test("resolve(salt=8) reproduces q31/q32-shaped output row-for-row") {
    def shaped(salt: Int) =
      EntityResolution.resolve(orgA, orgB,
          cfg = EntityResolution.Config(matchThreshold = 0.5), salt = salt)
        .select(col("account1_id"), col("account2_id"),
          round(col("match_score"), 6).as("match_score"),
          col("match_type"), col("confidence"),
          array_join(col("match_reasons"), "|").as("reasons"))
    val plain = shaped(1)
    val salted = shaped(8)
    assert(plain.count() > 0, "fixture must produce matches")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt rejects a custom blockOn (embed the salt in the condition instead)") {
    val a = EntityResolution.prepSide(orgA, EntityResolution.AccountCols(), "a")
    val b = EntityResolution.prepSide(orgB, EntityResolution.AccountCols(), "b")
    intercept[IllegalArgumentException] {
      EntityResolution.candidatePairs(a, b,
        blockOn = Some(col("a_root") === col("b_root")), salt = 4)
    }
  }
}
