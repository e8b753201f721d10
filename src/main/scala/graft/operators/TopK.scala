package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Top-k / ranking operators (reference: src/ml/pipeline.py:320-321 global
 * rank, :335-336 `nlargest(100, AnnualRevenue)` per org; SURVEY A2/W1/W3).
 *
 * Scale notes:
 *  - topKPerGroup is a single shuffle on the partition keys followed by a
 *    per-partition sort; with AQE on, skewed groups are split. For very hot
 *    groups at 100 TB, pre-aggregate with a partial top-k per input partition
 *    (rank is monotone under union) — Catalyst already pushes a partial sort
 *    + limit into the window when k is small via `WindowGroupLimit`.
 *  - globalTopK with small k is a `TakeOrderedAndProject` physical node: each
 *    partition keeps k rows, the driver merges — no full sort, no shuffle of
 *    the full relation.
 */
object TopK {

  /** Top k rows per group by `order` columns. Adds `rankCol` (1-based).
    * Always include a unique tiebreaker in `order` for deterministic output. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Global top k with 1-based rank (reference: pipeline.py:320-321).
    *
    * Sort+limit FIRST — Catalyst plans it as TakeOrderedAndProject (each
    * partition keeps its top k, driver merges; no global shuffle) — then the
    * row_number window runs over only k rows. A bare
    * `row_number().over(Window.orderBy(...))` would move the WHOLE relation
    * to one partition, which is wrong at any scale. */
  def globalTopK(df: DataFrame, order: Seq[Column], k: Int,
                 rankCol: String = "rank"): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))

  /** Sort + offset/limit pagination (reference: api/main.py:471-478). */
  def paginate(df: DataFrame, order: Seq[Column], limit: Int, offset: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)
}
