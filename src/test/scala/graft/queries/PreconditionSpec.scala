package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The Verify soundness preconditions must HOLD on the shipped testdata
  * (a failing guard is for regenerated data, not the current gate) and
  * every registry entry must point at a declared query. */
class PreconditionSpec extends SparkSpec {

  test("every verifyPreconditions key is a declared query") {
    val declared = SparkEntry.queries.keySet
    val orphans = SparkEntry.verifyPreconditions.keySet.diff(declared)
    assert(orphans.isEmpty, s"preconditions for undeclared queries: $orphans")
  }

  test("all preconditions hold at the smoke and gate SFs") {
    for {
      sf <- Seq("sf0.001", "sf0.01")
      (name, check) <- SparkEntry.verifyPreconditions
    } check(spark, s"/root/testdata/$sf") // throws on a knife edge
  }
}
