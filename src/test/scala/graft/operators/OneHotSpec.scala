package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.linalg.Vector
import graft.SparkSpec

/** A15: categorical one-hot inside the MLlib pipeline (reference:
  * pd.get_dummies pipeline.py:92-103), incl. unseen-category tolerance. */
class OneHotSpec extends SparkSpec {
  import spark.implicits._

  test("one-hot stages encode categories and tolerate unseen values") {
    val train = Seq(("Technology", "USA"), ("Finance", "UK"),
      ("Technology", "UK")).toDF("Industry", "BillingCountry")
    val model = new Pipeline()
      .setStages(Features.oneHotStages(Seq("Industry", "BillingCountry")))
      .fit(train)
    val out = model.transform(train)
    assert(out.columns.contains("Industry_vec") &&
      out.columns.contains("BillingCountry_vec"))
    // alphabetAsc: Finance=0, Technology=1 (+1 keep bucket)
    val vec = out.filter($"Industry" === "Finance")
      .select("Industry_vec").head.getAs[Vector](0)
    assert(vec(0) == 1.0 && vec.size == 3)
    // unseen category at transform time lands in the keep bucket, no crash
    val fresh = model.transform(
      Seq(("Healthcare", "Mars")).toDF("Industry", "BillingCountry"))
    val freshVec = fresh.select("Industry_vec").head.getAs[Vector](0)
    assert(freshVec.numNonzeros <= 1)
  }
}
