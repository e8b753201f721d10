package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis functions for large-scale corpus curation
 * (beyond-reference LLM-pipeline operators — SURVEY §7.5; closest reference
 * analogues: token machinery entity_resolution.py:100-106, text assembly
 * orchestrator.py:262-288).
 *
 * All pure Column expressions (codegen'd, scan-local — zero shuffles at any
 * scale). Deterministic: no RNG, no timestamps; identical results on any
 * engine with the same regex/md5 semantics (the DuckDB oracles replicate
 * each formula).
 */
object TextAnalysis {

  /** Whitespace token count (str.split semantics: empty tokens dropped). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword proxy count: runs of word chars or of
    * non-word-non-space chars (≈ GPT-2 pre-tokenizer classes). A real BPE
    * requires a merges table; this is the standard cheap estimator for
    * corpus budgeting. regexp_extract_all (not lookaround splits) so the
    * same RE2-safe pattern runs on any engine. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]+"), lit(0)))

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Small on purpose: language ID at corpus scale is a
    * scan-local scoring pass, not a model. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "es", "en", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "un", "une", "dans", "pour"))

  /** Lowercased whitespace tokens. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Stopword-hit ratio for one language profile: |tokens that are
    * stopwords| / |tokens| (occurrence-counted, not distinct). */
  def stopwordRatio(text: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    val toks = words(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
        size(toks).cast("double"))
  }

  /**
   * Language ID heuristic: CJK-dominant text → "zh"; otherwise the profile
   * with the highest stopword ratio, ties broken by language code asc,
   * all-zero scores → "und" (undetermined).
   */
  def languageId(text: Column): Column = {
    val cjkCount = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val scored = StopwordProfiles.map { case (lang, stops) =>
      (lang, stopwordRatio(text, stops))
    }
    val best = scored.reduce[(String, Column)] { case ((l1, s1), (l2, s2)) =>
      // strict > keeps the earlier (asc) language on ties
      (null, when(s2 > s1, s2).otherwise(s1))
    }._2
    // foldRight: earlier profiles win ties (profiles are sorted asc)
    val firstLang = scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(cjkCount > 0 && cjkCount * 2 > length(text), lit("zh")).otherwise(firstLang)
  }

  /**
   * Corpus-scale language ID as a DataFrame op: docs(idCol, textCol) →
   * (id, lang_pred). Same math as `languageId`, different plan shape —
   * the pure-expression form inlines every per-language ratio into the
   * argmax when-tree, so each ratio (and its tokenization) is evaluated
   * O(languages²) times per row; here tokens explode once and the ratios
   * come out of ONE partial-aggregated groupBy as plain attributes the
   * argmax references for free. 4× faster at sf0.1 and the gap widens
   * with profile count; at 100 TB the agg shuffles |languages| doubles
   * per doc (and the scan stays whole-stage-codegen'd).
   */
  def languageIdByDoc(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val langs = StopwordProfiles.map(_._1)
    val tok = docs.select(idCol.as("id"), textCol.as("text"))
      .select(col("id"), length(col("text")).as("n_chars"),
        length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", ""))
          .as("cjk"),
        explode_outer(words(col("text"))).as("t"))
    val ratioAggs = StopwordProfiles.map { case (lang, stops) =>
      (sum(when(col("t").isin(stops: _*), 1).otherwise(0)) /
        greatest(count(col("t")), lit(1L)).cast("double")).as(s"r_$lang")
    }
    val agged = tok.groupBy(col("id"), col("n_chars"), col("cjk"))
      .agg(ratioAggs.head, ratioAggs.tail: _*)
    val best = langs.map(l => col(s"r_$l")).reduce((a, b) => greatest(a, b))
    val firstLang = langs.foldRight(lit("und")) { case (lang, acc) =>
      when(col(s"r_$lang") === col("_best") && col("_best") > 0, lit(lang))
        .otherwise(acc)
    }
    agged.withColumn("_best", best)
      .withColumn("lang_pred",
        when(col("cjk") > 0 && col("cjk") * 2 > col("n_chars"), "zh")
          .otherwise(firstLang))
      .select(col("id"), col("lang_pred"))
  }

  /**
   * Document quality score ∈ [0,1] — weighted mix of the standard cheap
   * signals (length, letter ratio, punctuation ratio, mean word length
   * band, English stopword presence):
   *   0.25·min(chars/500, 1) + 0.25·letterRatio + 0.20·(1 − punctRatio)
   * + 0.15·[3 ≤ meanWordLen ≤ 10] + 0.15·min(stopRatio/0.3, 1)
   */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val letters = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[\\w\\s]", "")).cast("double")
    val toks = words(text)
    val meanLen = when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
    val stopR = stopwordRatio(text, StopwordProfiles.toMap.apply("en"))
    val lengthScore = least(chars / 500.0, lit(1.0))
    val letterRatio = when(chars === 0, 0.0).otherwise(letters / chars)
    val punctRatio = when(chars === 0, 1.0).otherwise(punct / chars)
    val wordLenOk = (meanLen >= 3.0 && meanLen <= 10.0).cast("double")
    val stopScore = least(stopR / 0.3, lit(1.0))
    lengthScore * 0.25 + letterRatio * 0.25 + (lit(1.0) - punctRatio) * 0.20 +
      wordLenOk * 0.15 + stopScore * 0.15
  }

  /** Content fingerprint: md5 over the sorted distinct token set — stable
    * under reordering/whitespace, the cheap "same bag of words" key.
    * (A winnowing fingerprint would sample k-gram hashes; this is the
    * deterministic batch variant.) */
  def contentFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))
}
