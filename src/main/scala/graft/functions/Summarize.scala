package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic extractive summarizer STUB (reference:
 * src/ml/summarizer.py:7-33 — DistilBART `transformers` pipeline, returns
 * "" when the model is unavailable; input assembly
 * orchestrator.py:262-288).
 *
 * The heavy seq2seq model is out of scope (SURVEY F24: deterministic
 * extractive stub preserving the column + null/empty semantics): the stub
 * keeps the first `maxSentences` sentences. Swapping in a real model
 * means replacing this expression with a model-serving call; every
 * surrounding pipeline shape (column in, column out, "" for null/empty)
 * is already final.
 *
 * Pure built-in expressions (split/slice/array_join) — codegen'd, no UDF,
 * no shuffle, scales with the scan.
 */
object Summarize {

  /** First-N-sentences extractive summary; null/empty → "" (matches the
    * reference's model-unavailable behavior). Sentence boundary is the
    * literal ". " delimiter — identical semantics in the DuckDB oracle's
    * string_split. */
  def summarize(text: Column, maxSentences: Int = 2): Column =
    when(text.isNull || length(text) === 0, lit(""))
      .otherwise(array_join(slice(split(text, "\\. "), 1, maxSentences), ". "))

  /** Account-text assembly feeding the summarizer (reference:
    * orchestrator.py:262-288 — name, industry, description and contact
    * titles concatenated; null-tolerant). */
  def accountText(name: Column, industry: Column, description: Column): Column =
    concat_ws(". ",
      Seq(name, industry, description).map(c => when(c.isNotNull && length(c) > 0, c)): _*)

  /**
   * REAL extractive summarization — degree-centrality LexRank (Erkan &
   * Radev 2004, the threshold/degree variant that needs no power
   * iteration): segment each doc into `spanWords`-word tiles (the q131
   * tiling; corpus text has no sentence punctuation, so fixed-width
   * segments are the sentence stand-in), score every tile by the SUM of
   * its token-Jaccard similarity to the doc's other tiles, and keep the
   * `k` most central tiles re-joined in original order. The model-free
   * upgrade over [[summarize]]'s first-N stub: central segments carry
   * the doc's dominant vocabulary. Deterministic end-to-end — Jaccards
   * are exact small-int ratios and the centrality sum rides
   * DECIMAL(28,18) (the q125 discipline) so partition order never moves
   * a ranking; ties (including the all-zero single-tile doc) break to
   * the earliest tile, degenerating to the stub exactly when there is
   * no similarity signal.
   *
   * Scale: the quadratic is per-DOC (tiles² with tiles ≈ words/span —
   * bounded by the chunking contract upstream, q98's cap discipline);
   * the pair join and both aggregations hash on doc id, so the whole
   * plan is one Exchange family and nothing global is quadratic.
   */
  def lexRankTiles(docs: org.apache.spark.sql.DataFrame, idCol: Column,
                   textCol: Column, spanWords: Int = 10,
                   k: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = lit(spanWords)
    val tiles = docs
      .select(idCol.as("id"), split(textCol, " ").as("ws"))
      .withColumn("n_tiles",
        ceil(size(col("ws")).cast("double") / spanWords).cast("long"))
      .select(col("id"), col("n_tiles"), posexplode(transform(
        sequence(lit(0), (col("n_tiles") - 1).cast("int")),
        i => concat_ws(" ", slice(col("ws"), i * w + 1, w)))))
      .toDF("id", "n_tiles", "idx", "tile")
      .filter(length(col("tile")) > 0)
      .withColumn("toks", array_distinct(split(col("tile"), " ")))
      // the tile frame feeds FOUR consumers (both self-join sides, the
      // pair union, the ranked join) — persist once instead of re-tiling
      // the corpus per consumer. cache(), NOT localCheckpoint: lazy (no
      // job at DataFrame-construction time) and lineage-preserving, so
      // an evicted or executor-lost block recomputes instead of failing
      // the query — localCheckpoint blocks are pinned and non-fault-
      // tolerant, wrong for a 100 TB-scale operator. For a multi-query
      // fan-out, write the tile frame to parquet instead (the Dedup
      // artifact pattern).
      .cache()
    val pairs = tiles.as("x").join(tiles.as("y"),
        col("x.id") === col("y.id") && col("x.idx") < col("y.idx"))
      .select(col("x.id").as("id"), col("x.idx").as("ia"),
        col("y.idx").as("ib"),
        (size(array_intersect(col("x.toks"), col("y.toks"))).cast("double") /
          size(array_union(col("x.toks"), col("y.toks")))).as("j"))
    val centrality = pairs.select(col("id"), col("ia").as("idx"), col("j"))
      .unionByName(pairs.select(col("id"), col("ib").as("idx"), col("j")))
      .groupBy("id", "idx")
      .agg(sum(col("j").cast("decimal(28,18)")).as("c"))
    val ranked = tiles.join(centrality, Seq("id", "idx"), "left")
      .withColumn("c", coalesce(col("c"), lit(0).cast("decimal(28,18)")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("c").desc, col("idx").asc)))
    ranked.filter(col("rk") <= k)
      .groupBy("id")
      .agg(max(col("n_tiles")).as("n_tiles"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tile")))),
          s => s("idx").cast("string")), ",").as("picked"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tile")))),
          s => s("tile")), " ").cast("binary")).as("summary_md5"),
        round(max(col("c")).cast("double"), 6).as("top_centrality"))
  }
}
