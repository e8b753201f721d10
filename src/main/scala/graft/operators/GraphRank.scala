package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded-iteration PageRank over an undirected edge list — graph
 * centrality for corpus curation (beyond-reference LLM-pipeline
 * operator, SURVEY §7.5). Over the near-dup candidate graph
 * (`Dedup.minhashNearDups` edges) it ranks TEMPLATE HUBS: a doc wired
 * to many near-copies, or bridging several copy-clusters, scores far
 * above a leaf of a single pair — the triage signal web-corpus
 * pipelines use to find boilerplate farms and SEO mirror networks
 * that per-pair Jaccard can't see (every pair looks alike; the HUB
 * STRUCTURE is the tell). Complements the cluster census (q75: how
 * big) and canonical pick (q107: which to keep) with "which nodes
 * carry the graph".
 *
 * Algorithm: standard damped power iteration (Page et al. 1999),
 * r₀ = 1, r_{t+1}(v) = (1−d) + d·Σ_{u∈N(v)} r_t(u)/deg(u), run a
 * FIXED `iterations` rounds (a ranking signal needs stable ordering,
 * not convergence to machine epsilon; 3 rounds separate hubs from
 * leaves on diameter-2..3 near-dup graphs). Undirected symmetric form:
 * every node in the edge list has deg ≥ 1 — no dangling-mass term.
 *
 * Engine-portable determinism (the q125 decimal discipline): each
 * contribution r/deg is an IEEE double, bit-identical in any engine
 * given identical inputs — but a SUM of doubles is partition-order
 * dependent, so contributions are cast to DECIMAL(38,18) and summed
 * exactly (order-invariant), then the damped update returns to double.
 * The (1−d) teleport term is computed as the double expression
 * `1.0 − d` (not a pre-folded decimal literal) so an oracle replaying
 * the same arithmetic matches bit-for-bit.
 *
 * Plan shape (100 TB): per iteration, ONE equi-join of the rank frame
 * onto the degree-annotated edge list plus ONE aggregation on the
 * destination key — the same per-round cost envelope as
 * `Dedup.connectedComponents`' label loop. The edge list is
 * localCheckpointed once (the CC-family convention: the upstream LSH
 * pipeline must not re-run per round and per final-plan reference);
 * ranks frames are (id, rank) pairs only. Iterations are a fixed
 * small constant, so lineage stays shallow without per-round
 * checkpoints.
 */
object GraphRank {

  /** Symmetrized (src, dst) edge frame — both directions of every
    * undirected edge. ONE definition for the in-session path and the
    * artifact writer. */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))

  /** The power-iteration rounds + final (id, deg, pagerank) projection,
    * shared by [[pageRank]] and [[pageRankFromEdgeArtifact]]: the two
    * paths' "output bit-identical" contract is enforced by sharing the
    * ONE loop (decimal(38,18) contribution sums, damped update), not by
    * keeping two copies in sync. `symDeg` = (src, dst, deg); `deg` =
    * one row per src. */
  private def iterate(symDeg: DataFrame, deg: DataFrame,
                      iterations: Int, damping: Double): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    var ranks = deg.select(col("src").as("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = symDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(38,18)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(1.0) - lit(damping) +
            lit(damping) * col("cs").cast("double")).as("rank"))
    }
    ranks.join(deg.select(col("src").as("id"), col("deg")), "id")
      .select(col("id"), col("deg"), col("rank").as("pagerank"))
  }

  /** PageRank over undirected (a_id, b_id) edges →
    * (id, deg, pagerank). */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg): each edge annotated with its source's out-degree,
    // built once and reused by every round's join
    val symDeg = sym.join(deg, "src").localCheckpoint()
    iterate(symDeg, deg, iterations, damping)
  }

  /**
   * Write the symmetrized, degree-annotated edge list as a BUCKETED
   * managed table keyed by `src` — the storage layout the per-round
   * join wants (this file's own scale note, realized): the
   * localCheckpoint in [[pageRank]] erases outputPartitioning, so the
   * in-session path re-exchanges the edge list every round; the
   * bucketed artifact carries its distribution in the TABLE layout,
   * so every consumer round (and every future session) reads it
   * join-ready. Build once per corpus version, exactly like the
   * nearDup/IVF artifacts.
   */
  def writeEdgeArtifact(edges: DataFrame, table: String,
                        buckets: Int): Unit = {
    val sym = symmetrize(edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    graft.sources.Bucketing.writeBucketed(sym.join(deg, "src"), table,
      "src", buckets)
  }

  /**
   * [[pageRank]] over the STORED bucketed artifact
   * ([[writeEdgeArtifact]]): identical rounds, identical DECIMAL(38,18)
   * contribution sums — output bit-identical to the in-session path
   * (partition-invariant by construction; `GraphRankSpec` pins it) —
   * but each round's equi-join consumes the table's bucket
   * distribution on `src`, so the EDGE side never re-shuffles: the
   * per-round Exchange cost drops to the (small) rank frame plus the
   * unavoidable dst aggregation. At 100 TB the edge list is the
   * fact-sized side; moving its shuffle from every-round to
   * write-once is the entire point of the artifact.
   */
  def pageRankFromEdgeArtifact(spark: org.apache.spark.sql.SparkSession,
                               table: String, iterations: Int = 3,
                               damping: Double = 0.85): DataFrame = {
    val symDeg = spark.table(table)
    // one row per src, computed ON the bucket distribution (no Exchange)
    val deg = symDeg.groupBy("src").agg(max(col("deg")).as("deg"))
    iterate(symDeg, deg, iterations, damping)
  }
}
