package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Dictionary phrase tagging — the taxonomy/blocklist gate every corpus
 * pipeline runs (topic routing, badword screening, licensing-term
 * detection). Reference tie-in: the reference's keyword-driven insight
 * labels (`api/main.py` insight categories) are this operation at
 * dashboard scale; here it is corpus-scale.
 *
 * A native engine would run Aho–Corasick per document; the Spark-first
 * equivalent generates word n-grams SCAN-LOCALLY (one Generate, no
 * shuffle), hash-joins them against the BROADCAST dictionary
 * (taxonomy-scale, never corpus-scale), and aggregates per doc — so the
 * only Exchange carries MATCHED rows: shuffle ∝ hits, never ∝ tokens.
 * The gram generation and the join probe both stay inside whole-stage
 * codegen. At 100 TB with a 10^4-phrase taxonomy the dictionary
 * broadcast is a few MB and the scan is the only corpus-wide pass.
 */
object Tagging {

  /**
   * Tag `docs` against a `(phrase, category)` dictionary of word
   * n-gram phrases (1..maxPhraseLen words; the dictionary side is
   * lowercased and whitespace-collapsed here, so multi-space/tab
   * taxonomy rows match the single-space grams). Returns one row per (id, category) with ≥1 phrase hit:
   * `(id, category, n_phrases)` where `n_phrases` counts the DISTINCT
   * dictionary phrases of that category present in the doc (grams are
   * deduplicated per doc by [[TextFunctions.wordNgrams]] — presence
   * semantics, not occurrence counts, the blocklist contract).
   *
   * Docs with no hits produce no rows — LEFT-join the result back for
   * a complete per-doc frame (the q181 shape).
   */
  def tagPhrases(docs: DataFrame, idCol: Column, textCol: Column,
                 dict: DataFrame, maxPhraseLen: Int): DataFrame = {
    require(maxPhraseLen >= 1,
      s"tagPhrases requires maxPhraseLen >= 1 (got $maxPhraseLen)")
    val grams = concat(
      (1 to maxPhraseLen).map(n => TextFunctions.wordNgrams(textCol, n)): _*)
    docs
      .select(idCol.as("id"), explode(grams).as("gram"))
      .join(broadcast(
        // normalize the dictionary the way wordNgrams normalizes text:
        // lowercase AND collapse/trim whitespace to single spaces — a
        // taxonomy row with a double space or tab would otherwise
        // silently never match
        dict.select(
            trim(regexp_replace(lower(col("phrase")), "\\s+", " "))
              .as("gram"),
            col("category"))
          .filter(length(col("gram")) > 0)
          .distinct()), "gram")
      .groupBy("id", "category")
      .agg(count(lit(1)).as("n_phrases"))
  }

  /**
   * The fixed-taxonomy fast path: same output frame as [[tagPhrases]]
   * (TaggingSpec pins equality), but matching runs inside ONE codegen
   * projection ([[graft.functions.PhraseHits]] — the dictionary rides
   * into generated code as a reference map), so the corpus never
   * materializes its gram stream: no Generate, no corpus-scale join
   * probe; only MATCHED phrase indices leave the scan. Use when the
   * taxonomy fits a plan constant (the common 10^2–10^5-phrase case);
   * [[tagPhrases]] remains the path for dictionaries that must stay a
   * DataFrame.
   */
  def tagPhrasesKernel(docs: DataFrame, idCol: Column, textCol: Column,
                       dict: Seq[(String, String)],
                       maxPhraseLen: Int): DataFrame = {
    require(maxPhraseLen >= 1,
      s"tagPhrasesKernel requires maxPhraseLen >= 1 (got $maxPhraseLen)")
    // one index per DISTINCT normalized phrase; a phrase may carry
    // several categories (distinct (phrase, category) pairs, as
    // tagPhrases' dict distinct)
    val norm = dict.map { case (p, c) =>
      // UTF8String lowercase — same primitive as tagPhrases' lower()
      (org.apache.spark.unsafe.types.UTF8String.fromString(p)
        .toLowerCase.toString.trim.replaceAll("\\s+", " "), c)
    }.filter(_._1.nonEmpty).distinct
    val phrases = norm.map(_._1).distinct
    val pi = phrases.zipWithIndex.toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val cats = norm.map { case (p, c) => (pi(p), c) }.toDF("pi", "category")
    docs
      .select(idCol.as("id"),
        explode(org.apache.spark.sql.graftshim.GraftShim.column(graft.functions.PhraseHits(
          org.apache.spark.sql.graftshim.GraftShim.expr(textCol), phrases, maxPhraseLen))).as("pi"))
      .join(broadcast(cats), "pi")
      .groupBy("id", "category")
      .agg(count(lit(1)).as("n_phrases"))
  }
}
