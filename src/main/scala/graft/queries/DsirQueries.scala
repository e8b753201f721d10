package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dsir
import graft.sources.Tables

/**
 * DSIR domain-targeted selection queries (q194–q195): hashed-n-gram
 * importance weights and the Gumbel top-k sample, trained and applied
 * in-engine on the synthetic corpus ([[graft.operators.Dsir]]; Xie et
 * al. 2023). Target domain = source 'src0' (the same held-out-source
 * convention as the decontamination queries q93/q133); raw pool =
 * every other source; selection draws from the raw pool with
 * probability ∝ importance weight.
 *
 * Oracle parity: bucket hashing is the engine-portable md5-prefix
 * (replayed verbatim in DuckDB); per-bucket log-ratios are row-local
 * double arithmetic with identical literal spelling (`E0` doubles, the
 * BoostQueries discipline) and association order on both sides; the
 * per-doc sum is DECIMAL(38,18)-exact; reported floats round to 6dp;
 * the top-k cut orders by the UNROUNDED Gumbel key with a doc_id
 * tiebreak on both sides.
 */
object DsirQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  private val B = 4096          // hash buckets (k*B = 2048.0, an exact double)
  private val K = 0.5           // add-k smoothing
  private val SelectK = 80      // Gumbel top-k sample size
  private val Salt = "dsir"

  private def weights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    val raw = docs.filter(col("source") =!= "src0")
    val ratio = Dsir.logRatio(
      Dsir.bucketCounts(target, col("text"), B),
      Dsir.bucketCounts(raw, col("text"), B), B, K)
    Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q194_dsir_weights" -> ((s, dir) => {
      // every raw-pool doc's hashed-n-gram log importance weight —
      // the fit-and-score pass (two bucket-count artifacts, one
      // broadcast ratio join, one per-doc aggregate)
      weights(s, dir)
        .select(col("id").as("doc_id"), col("n_grams"),
          round(col("log_w"), 6).as("log_w"))
        .orderBy("doc_id")
    }),

    "q195_dsir_select" -> ((s, dir) => {
      // the Gumbel top-k draw: a probability-∝-w sample WITHOUT
      // replacement, deterministic in (corpus, salt) — global top-k
      // compiles to TakeOrderedAndProject, rank runs on k rows
      Dsir.gumbelTopK(weights(s, dir), col("id"), col("log_w"),
          SelectK, Salt)
        .select(col("sel_rank"), col("id").as("doc_id"),
          round(col("log_w"), 6).as("log_w"),
          round(col("key"), 6).as("key"))
        .orderBy("sel_rank")
    }),

    "q198_dsir_select_audit" -> ((s, dir) => {
      // the analyst-facing audit of the q195 draw: per source, pool
      // size, kept count, keep rate, and mean log-weight of pool vs
      // kept — the frame a curation reviewer reads to see WHERE the
      // selection quota went (domain-composition shift is the whole
      // point of DSIR, so it must be observable, not asserted). One
      // extra broadcast join + one 20-row aggregate over q195's pass.
      val docs = t(s, dir, "documents")
      val w = weights(s, dir)
      val picked = Dsir.gumbelTopK(w, col("id"), col("log_w"),
          SelectK, Salt)
        .select(col("id"), lit(1).as("kept"))
      w.join(broadcast(picked), Seq("id"), "left")
        .join(docs.select(col("doc_id").as("id"), col("source")), "id")
        .groupBy("source")
        .agg(count(lit(1)).cast("int").as("n_pool"),
          coalesce(sum("kept"), lit(0)).cast("int").as("n_kept"),
          round(coalesce(sum("kept"), lit(0)).cast("double") /
            count(lit(1)), 6).as("keep_rate"),
          // decimal-exact sum → double → /count: partition-invariant
          // where a plain double avg would not be
          round(sum(col("log_w").cast("decimal(38,18)")).cast("double") /
            count(lit(1)), 6).as("mean_log_w"))
        .orderBy("source")
    }),

    "q199_selector_agreement" -> ((s, dir) => {
      // the generative-vs-discriminative ablation frame: per raw-pool
      // doc, the DSIR log-weight + top-k membership AND the frozen
      // quality classifier's margin + keep flag, with an agreement
      // bit. The two selectors share the target-vs-raw framing but
      // disagree exactly where hashed-n-gram evidence and the four
      // scan-local features diverge — this frame is WHERE a curation
      // reviewer looks first. Both passes are the audited q194/q196
      // plans; the join is id-keyed.
      val docs = t(s, dir, "documents")
      val w = weights(s, dir)
      val picked = Dsir.gumbelTopK(w, col("id"), col("log_w"),
          SelectK, Salt)
        .select(col("id"), lit(true).as("dsir_sel"))
      val m = QualityModelQueries.model
      val quality = QualityModelQueries
        .features(docs.filter(col("source") =!= "src0"))
        .withColumn("_mr", m.margin)
        .select(col("doc_id").as("id"),
          round(col("_mr"), 6).as("margin"),
          (col("_mr") >= QualityModelQueries.KeepMargin).as("q_keep"))
      w.join(broadcast(picked), Seq("id"), "left")
        .withColumn("dsir_sel", coalesce(col("dsir_sel"), lit(false)))
        .join(quality, "id")
        .select(col("id").as("doc_id"), round(col("log_w"), 6).as("log_w"),
          col("dsir_sel"), col("margin"), col("q_keep"),
          (col("dsir_sel") === col("q_keep")).as("agree"))
        .orderBy("doc_id")
    }),

    "q197_dsir_shard_merge" -> ((s, dir) => {
      // artifact mergeability through the oracle itself (the q176
      // discipline): the raw-pool bucket model is built as PER-SOURCE
      // shard artifacts, parquet-roundtripped, merged by union+sum,
      // and the merged model scores the pool — while the oracle
      // computes the single-pass global fit. Hash equality IS the
      // merge-correctness proof, so the oracle is q194's verbatim.
      // Production shape: each crawl shard ships its own count frame;
      // the serving ratio is a rollup, never a corpus re-fit.
      val docs = t(s, dir, "documents")
      val target = docs.filter(col("source") === "src0")
      val raw = docs.filter(col("source") =!= "src0")
      val shardArtifacts = Dsir.docBuckets(
          raw.select(col("source"), col("doc_id"), col("text")),
          col("source"), col("text"), B)
        .groupBy(col("id").as("shard"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val out = Scratch.path(s, "q197")
      shardArtifacts.write.mode("overwrite").parquet(out)
      val mergedRaw = s.read.parquet(out)
        .groupBy("bucket").agg(sum("cnt").as("cnt"))
      val ratio = Dsir.logRatio(
        Dsir.bucketCounts(target, col("text"), B), mergedRaw, B, K)
      Dsir.importanceWeights(raw, col("doc_id"), col("text"), ratio, B)
        .select(col("id").as("doc_id"), col("n_grams"),
          round(col("log_w"), 6).as("log_w"))
        .orderBy("doc_id")
    }))

  // Shared CTE pipeline: tokenize → unigram++bigram grams → md5 bucket
  // → per-corpus bucket counts → smoothed log-ratio over the FULL
  // domain → per-doc DECIMAL-exact weight sum. Mirrors the Column
  // pipeline literal for literal. Parameterized by the input relation
  // (rows with source = 'src0' are the target, the rest the pool) so
  // the funnel oracle (q202) can replay it over a stage CTE.
  /** The Gumbel-key SQL twin of [[graft.operators.Dsir.gumbel]] (salt
    * "dsir", md5-bucket uniform, -ln(-ln((u+0.5)/1e6))) — ONE derivation
    * point for every oracle that replays the selection draw (q195/q198/
    * q199 and the funnel's fsel). Emitted over a `log_w` column. */
  private[queries] def gumbelKeySql: String =
    """log_w + (-ln(-ln((CAST(CAST(CAST(('0x' || substring(
      |        md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |        AS UBIGINT) % 1000000 AS BIGINT) AS DOUBLE) + 0.5E0)
      |      / 1000000.0E0))) AS key""".stripMargin

  private[queries] def dsirCtesBodyFrom(rel: String): String =
    raw"""toksl AS (SELECT doc_id, source,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM $rel),
      |grams AS (SELECT doc_id, source, unnest(list_concat(w,
      |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS gram
      |  FROM toksl),
      |bk AS (SELECT doc_id, source,
      |    CAST(CAST(('0x' || substring(md5('dsir:' || gram), 1, 8)) AS UBIGINT)
      |      % 4096 AS BIGINT) AS bucket
      |  FROM grams),
      |tcnt AS (SELECT bucket, count(*) AS c FROM bk WHERE source = 'src0' GROUP BY 1),
      |rcnt AS (SELECT bucket, count(*) AS c FROM bk WHERE source <> 'src0' GROUP BY 1),
      |tot AS (SELECT (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) FROM tcnt) AS tn,
      |               (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) FROM rcnt) AS rn),
      |dom AS (SELECT unnest(range(0, 4096)) AS bucket),
      |ratio AS (SELECT d.bucket,
      |    (ln(CAST(coalesce(t.c, 0) AS DOUBLE) + 0.5E0) - ln(tn + 2048.0E0))
      |  - (ln(CAST(coalesce(r.c, 0) AS DOUBLE) + 0.5E0) - ln(rn + 2048.0E0)) AS logr
      |  FROM dom d LEFT JOIN tcnt t ON t.bucket = d.bucket
      |             LEFT JOIN rcnt r ON r.bucket = d.bucket
      |  CROSS JOIN tot),
      |wts AS (SELECT bk.doc_id, CAST(count(*) AS INTEGER) AS n_grams,
      |    CAST(sum(CAST(ratio.logr AS DECIMAL(38,18))) AS DOUBLE) AS log_w
      |  FROM bk JOIN ratio ON ratio.bucket = bk.bucket
      |  WHERE bk.source <> 'src0' GROUP BY 1)""".stripMargin

  private val dsirCtes = "WITH " + dsirCtesBodyFrom("documents")

  val oracleSql: Map[String, String] = Map(

    "q194_dsir_weights" -> (dsirCtes + """
      |SELECT doc_id, n_grams, round(log_w, 6) AS log_w
      |FROM wts ORDER BY doc_id""".stripMargin),

    // q197 runs the sharded-artifact rollup plan against q194's SQL:
    // merged-per-source == single-pass-global is the gate
    "q197_dsir_shard_merge" -> (dsirCtes + """
      |SELECT doc_id, n_grams, round(log_w, 6) AS log_w
      |FROM wts ORDER BY doc_id""".stripMargin),

    "q199_selector_agreement" -> (dsirCtes + s""",
      |sel AS (SELECT doc_id, log_w,
      |    $gumbelKeySql
      |  FROM wts),
      |picked AS (SELECT doc_id, true AS dsir_sel FROM sel
      |  ORDER BY key DESC, doc_id LIMIT 80),
      |qd AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks
      |  FROM documents WHERE source <> 'src0'),
      |qf AS (SELECT doc_id,
      |    ${QualityModelQueries.featureSql}
      |  FROM qd),
      |qm AS (SELECT doc_id, ${QualityModelQueries.model.marginSql} AS _mr
      |  FROM qf)
      |SELECT w.doc_id, round(w.log_w, 6) AS log_w,
      |  coalesce(p.dsir_sel, false) AS dsir_sel,
      |  round(qm._mr, 6) AS margin,
      |  qm._mr >= -1.25E0 AS q_keep,
      |  coalesce(p.dsir_sel, false) = (qm._mr >= -1.25E0) AS agree
      |FROM wts w
      |LEFT JOIN picked p ON p.doc_id = w.doc_id
      |JOIN qm ON qm.doc_id = w.doc_id
      |ORDER BY w.doc_id""".stripMargin),

    "q198_dsir_select_audit" -> (dsirCtes + s""",
      |sel AS (SELECT doc_id, log_w,
      |    $gumbelKeySql
      |  FROM wts),
      |picked AS (SELECT doc_id, 1 AS kept FROM sel
      |  ORDER BY key DESC, doc_id LIMIT 80)
      |SELECT d.source,
      |  CAST(count(*) AS INTEGER) AS n_pool,
      |  CAST(coalesce(sum(p.kept), 0) AS INTEGER) AS n_kept,
      |  round(CAST(coalesce(sum(p.kept), 0) AS DOUBLE) / count(*), 6)
      |    AS keep_rate,
      |  round(CAST(sum(CAST(w.log_w AS DECIMAL(38,18))) AS DOUBLE)
      |    / count(*), 6) AS mean_log_w
      |FROM wts w
      |LEFT JOIN picked p ON p.doc_id = w.doc_id
      |JOIN documents d ON d.doc_id = w.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin),

    "q195_dsir_select" -> (dsirCtes + s""",
      |sel AS (SELECT doc_id, log_w,
      |    $gumbelKeySql
      |  FROM wts)
      |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INTEGER)
      |    AS sel_rank,
      |  doc_id, round(log_w, 6) AS log_w, round(key, 6) AS key
      |FROM sel ORDER BY key DESC, doc_id LIMIT 80""".stripMargin))
}
