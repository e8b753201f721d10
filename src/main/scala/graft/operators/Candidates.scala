package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Candidate generation for cross-sell scoring (reference:
 * src/ml/pipeline.py:300-348 — org-pair loop :305-315, top-100-by-revenue
 * per org :335-336, nested-loop pair cross product :338-348).
 *
 * Spark-first shape: the reference's O(orgs² · 100²) nested Python loops
 * become (1) one window-based top-k per org — a single shuffle on org id,
 * Catalyst's WindowGroupLimit keeps only k rows per partition pre-shuffle —
 * and (2) a self-join of the capped frame on `a.org < b.org`. The capped
 * side is tiny (orgs × k rows) so the pair join is a broadcast: at 1000
 * executors the full candidate space materializes in parallel with no
 * shuffle at all.
 */
object Candidates {

  /** Top-k accounts per org by a ranking column (reference: pipeline.py:335-336).
    * `order` must include a unique tiebreaker for determinism. */
  def topKPerOrg(accounts: DataFrame, orgCol: Column, order: Seq[Column],
                 k: Int): DataFrame =
    TopK.topKPerGroup(accounts, Seq(orgCol), order, k).drop("rn")

  /** All unordered org pairs `(a,b), a<b` (reference: pipeline.py:305-315,
    * SURVEY J1): theta self-join on the distinct org set. */
  def orgPairs(accounts: DataFrame, orgCol: String): DataFrame = {
    val orgs = accounts.select(col(orgCol)).distinct()
    orgs.select(col(orgCol).as("org_a"))
      .join(orgs.select(col(orgCol).as("org_b")), col("org_a") < col("org_b"))
  }

  /**
   * Cross product of top-k accounts across every org pair (reference:
   * pipeline.py:334-348, SURVEY J2). Input columns are prefixed a_/b_;
   * the join condition `a_org < b_org` yields each unordered org pair once.
   * `broadcast` on the b side: orgs×k rows ≪ broadcast threshold by design
   * (the cap is the reference's own candidate-explosion control).
   */
  def candidatePairs(accounts: DataFrame, orgCol: String,
                     order: Seq[Column], k: Int = 100): DataFrame = {
    val top = topKPerOrg(accounts, col(orgCol), order, k)
    val a = top.select(top.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = top.select(top.columns.map(c => col(c).as(s"b_$c")): _*)
    a.join(broadcast(b), col(s"a_$orgCol") < col(s"b_$orgCol"))
  }

  /** Keep promising candidates only (reference: pipeline.py:353, P2). */
  def prune(scored: DataFrame, scoreCol: Column, threshold: Double = 0.5): DataFrame =
    scored.filter(scoreCol > threshold)
}
