package graft.evaluate

import graft.SparkSpec
import graft.ml.EnsembleModel

/**
 * End-to-end recommendation-list golden (VERDICT r13 #2): the
 * ordering-gate fixture's trained four-model ensemble serves a top-50
 * list that must MATCH the committed artifact rank-for-rank — model-side
 * drift (an MLlib default change, a feature bug, an edited weight)
 * becomes a diffable failure like an oracle-query mismatch, instead of a
 * metric sliding inside the AUC gates' tolerance.
 *
 * Regenerate after an INTENTIONAL change with
 * `tools/run.sh graft.evaluate.GoldenGen` and commit the diff.
 *
 * The second test proves the golden actually binds: perturbing one
 * ensemble weight on the SAME fit changes the served list.
 */
class EnsembleGoldenSpec extends SparkSpec {

  private lazy val fixture = MetricsLedger.orderingFixture(spark)

  test("served top-50 matches the committed golden rank-for-rank") {
    val (model, test, _) = fixture
    val got = MetricsLedger.topPairs(model, test, GoldenGen.K)
      .map { case (a, b) => s"$a|$b" }
    val in = getClass.getResourceAsStream("/golden/ensemble_top50.txt")
    assert(in != null, "golden file missing — run " +
      "tools/run.sh graft.evaluate.GoldenGen and commit the output")
    val want = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSeq
    assert(got.size == want.size)
    val diffs = got.zip(want).zipWithIndex.collect {
      case ((g, w), i) if g != w => s"rank $i: got $g want $w"
    }
    assert(diffs.isEmpty,
      s"${diffs.size} rank diffs vs golden (first: ${diffs.headOption});" +
        " if the model change was intentional, regenerate with GoldenGen")
  }

  test("golden binds: a weight perturbation changes the served list") {
    val (model, test, _) = fixture
    val perturbed = new EnsembleModel(model.models,
      model.weights.map { case (k, v) =>
        k -> (if (k == "rf") v + 0.5 else math.max(0.0, v - 0.15)) })
    val got = MetricsLedger.topPairs(perturbed, test, GoldenGen.K)
      .map { case (a, b) => s"$a|$b" }
    val in = getClass.getResourceAsStream("/golden/ensemble_top50.txt")
    val want = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSeq
    assert(got != want,
      "perturbing ensemble weights left the top-50 unchanged — the " +
        "golden would not catch a weight drift")
  }
}
