package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text / name normalization column functions (reference:
 * src/ml/entity_resolution.py:52-151 NameNormalizer + DomainNormalizer,
 * :157-196 SimilarityMetrics).
 *
 * Everything here is composed from `org.apache.spark.sql.functions` built-ins
 * (codegen'd, null-safe) — no UDFs. Each function returns a `Column` so it can
 * appear anywhere in a plan and keep predicate pushdown / whole-stage codegen
 * intact. At 100 TB these run inside the scan's codegen stage: zero extra
 * shuffles, no serialization boundary.
 */
object TextFunctions {

  /** Legal-suffix stop set (reference: entity_resolution.py:56-61). */
  val Suffixes: Seq[String] = Seq(
    "inc", "incorporated", "corp", "corporation", "co", "company",
    "llc", "llp", "ltd", "limited", "plc", "gmbh", "ag", "sa", "nv",
    "holdings", "group", "international", "intl", "global", "worldwide")

  /** Abbreviation expansion map (reference: entity_resolution.py:64-74).
    * NOTE: expansion runs before suffix removal, so e.g. "intl" →
    * "international" which is itself a suffix — matching reference order. */
  val Abbrevs: Seq[(String, String)] = Seq(
    "intl" -> "international", "corp" -> "corporation",
    "inc" -> "incorporated", "co" -> "company", "tech" -> "technology",
    "sys" -> "systems", "svc" -> "services", "svcs" -> "services",
    "mfg" -> "manufacturing")

  private val abbrevMap: Column =
    map(Abbrevs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
  private val suffixArr: Column = array(Suffixes.map(lit): _*)

  /** Tokens of a lowercased name with punctuation (except &) spaced out
    * (reference: entity_resolution.py:81-93). Empty tokens dropped (Python
    * str.split() semantics). */
  private def rawTokens(name: Column): Column =
    filter(
      split(regexp_replace(lower(trim(name)), "[^\\w\\s&]", " "), "\\s+"),
      t => length(t) > 0)

  /** Normalized token array: abbreviations expanded then suffixes removed,
    * order and duplicates preserved (reference: entity_resolution.py:86-91
    * uses list comprehensions, not sets — array_except would wrongly dedup). */
  def normalizedTokens(name: Column): Column = {
    val expanded = transform(rawTokens(name),
      t => coalesce(element_at(abbrevMap, t), t))
    filter(expanded, t => !array_contains(suffixArr, t))
  }

  /** Company-name normalize (reference: entity_resolution.py:76-98).
    * null/empty input → "" (reference returns ""). */
  def nameNormalize(name: Column): Column =
    when(name.isNull, lit("")).otherwise(array_join(normalizedTokens(name), " "))

  /** Significant tokens: normalized, len > 2, DISTINCT (reference returns a
    * set — entity_resolution.py:100-106). */
  def nameTokens(name: Column): Column =
    array_distinct(filter(normalizedTokens(name), t => length(t) > 2))

  /** Domain from URL or email (reference: entity_resolution.py:109-140).
    * Email → substring after last '@'; URL → host via parse_url; strips
    * leading "www." and any path. */
  def extractDomain(urlOrEmail: Column): Column = {
    val s = lower(trim(urlOrEmail))
    val fromEmail = substring_index(s, "@", -1)
    val withScheme = when(s.startsWith("http://") || s.startsWith("https://"), s)
      .otherwise(concat(lit("https://"), s))
    val host = parse_url(withScheme, lit("HOST"))
    val raw = when(s.contains("@"), fromEmail)
      .otherwise(coalesce(host, substring_index(s, "/", 1)))
    val noWww = regexp_replace(raw, "^www\\.", "")
    val noPath = substring_index(noWww, "/", 1)
    when(urlOrEmail.isNull || s === "", lit(null)).otherwise(
      when(noPath === "", lit(null)).otherwise(noPath))
  }

  /** Root domain = last two dot-parts (reference: entity_resolution.py:143-151). */
  def rootDomain(domain: Column): Column =
    when(domain.isNull, lit(null)).otherwise(
      array_join(slice(split(domain, "\\."), -2, 2), "."))

  /** Blocking key: first 3 chars of normalized name + "_" + first 3 of
    * lowercased country (reference: entity_resolution.py:287-294). At scale
    * this is the ER join key — 3-char prefixes skew ("the"/"glo"), so the
    * blocked join should be salted or rely on AQE skew handling. */
  def blockingKey(name: Column, country: Column): Column =
    concat_ws("_",
      substring(nameNormalize(name), 1, 3),
      substring(lower(coalesce(country, lit(""))), 1, 3))

  /** |a ∩ b| of two sorted distinct long arrays — codegen merge walk
    * ([[SortedIntersectCount]]); the pairwise-join fast path for set
    * similarity over hashed tokens. */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(SortedIntersectCount(GraftShim.expr(a), GraftShim.expr(b)))
  }

  /** Jaccard similarity of two token arrays: |∩|/|∪|, 0.0 when either empty
    * (reference: entity_resolution.py:157-164). Inputs are expected to be
    * distinct already (sets); array_intersect/union dedup regardless. */
  def jaccardTokens(a: Column, b: Column): Column =
    when(size(a) === 0 || size(b) === 0 || a.isNull || b.isNull, lit(0.0))
      .otherwise(
        size(array_intersect(a, b)).cast("double") /
          size(array_union(a, b)).cast("double"))

  /** Normalized Levenshtein similarity 1 - d/maxlen; 0.0 for null/empty
    * (reference: entity_resolution.py:183-196). Uses Spark's built-in
    * codegen'd levenshtein. */
  def levenshteinSim(a: Column, b: Column): Column =
    when(a.isNull || b.isNull || length(a) === 0 || length(b) === 0, lit(0.0))
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double"))

  /** Jaro-Winkler similarity — custom Catalyst expression (SURVEY F7);
    * 0.0 for null/empty inputs to match reference semantics. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    coalesce(GraftShim.column(JaroWinkler(GraftShim.expr(a), GraftShim.expr(b))), lit(0.0))
  }

  /** Character n-gram shingles of a string, distinct, for MinHash/Jaccard
    * dedup (beyond-reference: LLM-pipeline dedup operator). */
  def charShingles(text: Column, n: Int): Column = {
    // sliding window via sequence + substring: distinct shingles
    val idx = sequence(lit(1), greatest(length(text) - (n - 1), lit(1)))
    array_distinct(transform(idx, i => text.substr(i, lit(n))))
  }

  /** Word n-grams (space-tokenized), distinct. Texts with < n words give an
    * EMPTY array (guarded: sequence(1,0) would count downward). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val count = size(toks) - (n - 1)
    when(count < 1, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(1), count),
          i => array_join(slice(toks, i, lit(n)), " "))))
  }
}
