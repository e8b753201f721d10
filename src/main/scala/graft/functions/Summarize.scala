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
}
