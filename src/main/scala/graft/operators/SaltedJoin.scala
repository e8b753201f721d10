package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-salting for hash equi-joins: when one join key carries a
 * disproportionate share of the big side's rows, a plain shuffle sends
 * the whole hot key to ONE reducer. Salting splits the hot key S ways:
 * the big side gets a uniform salt in [0, S); the small side is exploded
 * S× so every (key, salt) bucket still finds its match. Result is
 * ROW-IDENTICAL to the unsalted join (spec-asserted) — only the
 * partitioning changes: max reducer load drops from |hot key| to
 * |hot key| / S at the cost of an S× replication of the small side
 * (which is why the SMALL side explodes, never the big one).
 *
 * AQE's skew-join handles byte-skew after the fact; explicit salting is
 * the plan-level fix when the skew is known (the ER blocking scaladoc's
 * recipe, realized — degenerate blocking keys like "the_usa" at 100 TB).
 */
object SaltedJoin {

  /** Deterministic per-row salt. NOT monotonically_increasing_id — that
    * is nondeterministic under task recomputation (partition/order
    * dependent), so a fetch-failure rerun could assign a row a
    * different salt than reducers already consumed, duplicating or
    * dropping join rows. `saltOn` should be a (near-)unique column of
    * the big side — a row id — for uniform spread; the default hashes
    * the row's FULL content, which is stable but degenerates when a hot
    * key's rows are exact duplicates or low-cardinality (they collapse
    * onto few salts, re-concentrating the reducer — pass the id column
    * there; hash() also rejects MapType columns, another reason an
    * explicit id beats the whole-row default). */
  private def rowSalt(df: DataFrame, s: Int, saltOn: Option[Column]): Column =
    pmod(hash(saltOn.map(Seq(_)).getOrElse(df.columns.map(col).toSeq): _*),
      lit(s))

  /** Inner equi-join of `big` and `small` on `key`, salted `s` ways.
    * Column sets must be disjoint apart from `key` (standard join rule).
    * The salt is deterministic (see [[rowSalt]]) — stable under task
    * retry; pass `saltOn` (a unique id) for guaranteed uniform spread. */
  def join(big: DataFrame, small: DataFrame, key: String, s: Int,
           saltOn: Option[Column] = None): DataFrame = {
    val bigSalted = big.withColumn("_salt", rowSalt(big, s, saltOn))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(s - 1))))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** [[join]] generalized to sides whose key COLUMNS differ in name
    * (the ER blocked pair join: `a_block` vs `b_block`) — same protocol,
    * expressed as an explicit equi-condition so the planner still sees a
    * hash join on (key, salt). `big` is the salted side, `replicated` is
    * exploded s× — within a hot block of n_b×n_r pairs the per-reducer
    * pair work drops to (n_b/s)×n_r; total pair count is unchanged
    * (salting fixes reducer LOAD, not quadratic blow-up — cap or refine
    * the key for that). Output carries no salt columns and is
    * row-identical to the unsalted join (spec-asserted). */
  def joinOn(big: DataFrame, replicated: DataFrame,
             bigKey: Column, replicatedKey: Column, s: Int,
             saltOn: Option[Column] = None): DataFrame = {
    val bigSalted = big.withColumn("_salt_big", rowSalt(big, s, saltOn))
    val repExploded = replicated.withColumn("_salt_rep",
      explode(sequence(lit(0), lit(s - 1))))
    bigSalted.join(repExploded,
        bigKey === replicatedKey && col("_salt_big") === col("_salt_rep"))
      .drop("_salt_big", "_salt_rep")
  }
}
