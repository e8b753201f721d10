package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.NgramLm
import graft.sources.Tables

/**
 * Bigram-LM quality-filter queries (q168–q169): the CCNet-style
 * perplexity gate ([[graft.operators.NgramLm]]) trained and applied
 * in-engine on the synthetic corpus.
 *
 * Oracle parity: counts are exact; per-position smoothed ln terms are
 * row-local double arithmetic replayed verbatim in DuckDB; the per-doc
 * sum is DECIMAL(38,18)-exact (partition/engine order-invariant); the
 * reported score is rounded to 6dp and the keep flag thresholds the
 * UNROUNDED score identically on both sides. The 3.45 nats/token
 * threshold is a filter dial (≈ keeps the cleanest ~90% of this
 * corpus), far from any doc's score at float-noise scale.
 */
object LmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  private val K = 0.5
  private val KeepNll = 3.45

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q168_lm_bigram_model" -> ((s, dir) => {
      // the model artifact's head: top-50 bigrams — the gate on the
      // trained object itself (q169 then gates its application)
      val docs = t(s, dir, "documents")
      NgramLm.bigramCounts(docs, col("text"))
        .orderBy(col("cnt").desc, col("t1").asc, col("t2").asc)
        .limit(50)
    }),

    "q175_filter_reasons" -> ((s, dir) => {
      // the Dolma-style explainable gate (Soldaini et al. 2024 §3:
      // attributes computed once, filter policies mix them): every doc
      // carries WHICH rules it violated — length bounds, duplicate-word
      // fraction, LM perplexity — not just a boolean. Pipelines audit
      // drop composition per source from exactly this frame. All four
      // signals are scan-local or reuse the q169 scoring joins; the
      // reasons array is deterministic (sorted, comma-joined).
      val docs = t(s, dir, "documents")
      val uni = NgramLm.unigramCounts(docs, col("text"))
      val bi = NgramLm.bigramCounts(docs, col("text"))
      val nll = NgramLm.scoreNll(docs, col("doc_id"), col("text"), uni, bi, K)
        .select(col("id").as("doc_id"), col("n_tokens"), col("avg_nll"))
      val toks = filter(split(lower(col("text")), "\\s+"),
        x => length(x) > 0)
      val sig = docs.select(col("doc_id"),
        (lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
          .as("_dw"))
      nll.join(sig, "doc_id")
        .withColumn("_reasons", array_sort(filter(array(
          when(col("n_tokens") < 30, lit("short")),
          when(col("n_tokens") > 75, lit("long")),
          when(col("_dw") > 0.65, lit("dup_words")),
          when(col("avg_nll") > KeepNll, lit("high_nll"))),
          x => x.isNotNull)))
        .select(col("doc_id"), col("n_tokens"),
          (size(col("_reasons")) === 0).as("keep"),
          array_join(col("_reasons"), ",").as("reasons"))
        .orderBy("doc_id")
    }),

    "q176_lm_shard_merge" -> ((s, dir) => {
      // LM mergeability through the oracle itself (the q161 discipline
      // for the count-artifact family): the bigram model is built as
      // PER-SOURCE shard artifacts, parquet-roundtripped, and merged by
      // union+sum — while the oracle computes the single-pass global
      // counts. Hash equality IS the merge-correctness proof, so the
      // oracle below is q168's verbatim. Production shape: each crawl
      // shard ships its own count frame; the serving model is a rollup,
      // never a corpus re-scan.
      val docs = t(s, dir, "documents")
      val shardArtifacts = docs
        .select(col("source"),
          filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0).as("_w"))
        .select(col("source"), explode(arrays_zip(
          slice(col("_w"), lit(1), greatest(size(col("_w")) - 1, lit(0))),
          slice(col("_w"), lit(2), greatest(size(col("_w")) - 1, lit(0)))))
          .as("p"))
        .select(col("source"), col("p.0").as("t1"), col("p.1").as("t2"))
        .groupBy("source", "t1", "t2").agg(count(lit(1)).as("cnt"))
      val out = Scratch.path(s, "q176")
      shardArtifacts.write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("t1", "t2").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("t1").asc, col("t2").asc)
        .limit(50)
    }),

    "q169_lm_doc_nll" -> ((s, dir) => {
      // train-then-score on the same corpus snapshot (the in-domain
      // filter configuration: outliers vs the corpus's own statistics),
      // gate at KeepNll nats/token
      val docs = t(s, dir, "documents")
      val uni = NgramLm.unigramCounts(docs, col("text"))
      val bi = NgramLm.bigramCounts(docs, col("text"))
      NgramLm.scoreNll(docs, col("doc_id"), col("text"), uni, bi, K)
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("avg_nll"), 6).as("avg_nll"),
          (col("avg_nll") <= KeepNll).as("keep"))
        .orderBy("doc_id")
    })
  )

  private val lmCtes =
    raw"""WITH toksl AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS t FROM toksl),
      |uni AS (SELECT t AS token, count(*) AS cnt FROM tok GROUP BY 1),
      |big AS (SELECT t1, t2, count(*) AS cnt FROM (
      |    SELECT w[i] AS t1, w[i+1] AS t2 FROM (
      |      SELECT w, unnest(range(1, len(w))) AS i FROM toksl))
      |  GROUP BY 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q168_lm_bigram_model" -> (lmCtes + """
      |SELECT t1, t2, cnt FROM big
      |ORDER BY cnt DESC, t1, t2 LIMIT 50""".stripMargin),

    // q176 runs the sharded-artifact rollup plan against q168's SQL:
    // merged-per-source == single-pass-global is the gate
    "q176_lm_shard_merge" -> (lmCtes + """
      |SELECT t1, t2, cnt FROM big
      |ORDER BY cnt DESC, t1, t2 LIMIT 50""".stripMargin),

    "q169_lm_doc_nll" -> (lmCtes + s""",
      |consts AS (SELECT CAST(count(*) AS DOUBLE) AS v,
      |    CAST(sum(cnt) AS DOUBLE) AS n FROM uni),
      |pairs AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur FROM (
      |    SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toksl)),
      |firstt AS (SELECT doc_id, w[1] AS cur FROM toksl WHERE len(w) >= 1),
      |terms AS (
      |  SELECT p.doc_id,
      |    CAST(ln((coalesce(b.cnt, 0) + $K) /
      |             (coalesce(u.cnt, 0) + $K * c.v)) AS DECIMAL(38,18)) AS term
      |  FROM pairs p
      |  LEFT JOIN big b ON b.t1 = p.prev AND b.t2 = p.cur
      |  LEFT JOIN uni u ON u.token = p.prev
      |  CROSS JOIN consts c
      |  UNION ALL
      |  SELECT f.doc_id,
      |    CAST(ln((coalesce(u.cnt, 0) + $K) /
      |             (c.n + $K * c.v)) AS DECIMAL(38,18))
      |  FROM firstt f LEFT JOIN uni u ON u.token = f.cur
      |  CROSS JOIN consts c),
      |nd AS (SELECT doc_id, len(w) AS n_tokens FROM toksl),
      |sc AS (SELECT doc_id, -CAST(sum(term) AS DOUBLE) AS s
      |  FROM terms GROUP BY 1)
      |SELECT nd.doc_id, CAST(nd.n_tokens AS INTEGER) AS n_tokens,
      |  round(sc.s / nd.n_tokens, 6) AS avg_nll,
      |  sc.s / nd.n_tokens <= $KeepNll AS keep
      |FROM nd LEFT JOIN sc ON sc.doc_id = nd.doc_id
      |ORDER BY nd.doc_id""".stripMargin),

    "q175_filter_reasons" -> (lmCtes + s""",
      |consts AS (SELECT CAST(count(*) AS DOUBLE) AS v,
      |    CAST(sum(cnt) AS DOUBLE) AS n FROM uni),
      |pairs AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur FROM (
      |    SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toksl)),
      |firstt AS (SELECT doc_id, w[1] AS cur FROM toksl WHERE len(w) >= 1),
      |terms AS (
      |  SELECT p.doc_id,
      |    CAST(ln((coalesce(b.cnt, 0) + $K) /
      |             (coalesce(u.cnt, 0) + $K * c.v)) AS DECIMAL(38,18)) AS term
      |  FROM pairs p
      |  LEFT JOIN big b ON b.t1 = p.prev AND b.t2 = p.cur
      |  LEFT JOIN uni u ON u.token = p.prev
      |  CROSS JOIN consts c
      |  UNION ALL
      |  SELECT f.doc_id,
      |    CAST(ln((coalesce(u.cnt, 0) + $K) /
      |             (c.n + $K * c.v)) AS DECIMAL(38,18))
      |  FROM firstt f LEFT JOIN uni u ON u.token = f.cur
      |  CROSS JOIN consts c),
      |sc AS (SELECT doc_id, -CAST(sum(term) AS DOUBLE) AS s
      |  FROM terms GROUP BY 1),
      |sig AS (SELECT doc_id, len(w) AS n_tokens,
      |    1 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dwf
      |  FROM toksl),
      |flagged AS (SELECT g.doc_id, g.n_tokens,
      |    list_sort(list_filter([
      |      CASE WHEN g.n_tokens < 30 THEN 'short' END,
      |      CASE WHEN g.n_tokens > 75 THEN 'long' END,
      |      CASE WHEN g.dwf > 0.65 THEN 'dup_words' END,
      |      CASE WHEN sc.s / g.n_tokens > $KeepNll THEN 'high_nll' END],
      |      x -> x IS NOT NULL)) AS rs
      |  FROM sig g LEFT JOIN sc ON sc.doc_id = g.doc_id)
      |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
      |  len(rs) = 0 AS keep,
      |  coalesce(array_to_string(rs, ','), '') AS reasons
      |FROM flagged ORDER BY doc_id""".stripMargin)
  )
}
