package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Corpus, Dedup, Dsir, Sampling, TopK}
import graft.sources.Tables

/**
 * The composed curation funnel as ONE oracle-gated query (q202 —
 * VERDICT r14 #7): the [[graft.app.CurationRunner]] stage chain that was
 * previously only spec-gated (`CurationRunnerSpec`) now has a green
 * CORRECTNESS row. Five stages, each the EXACT semantics of an already
 * oracle-gated query, composed output-into-input:
 *
 *   quality gate (q84's token bounds) → benchmark decontamination
 *   (q93/q133's 5-gram drop against source 'src0') → near-dup dedup to
 *   singletons ∪ canonical (q127) → DSIR domain selection (q194/q195's
 *   weights + Gumbel top-k against the same 'src0' target) → token-budget
 *   mix (q140's per-source quota fill).
 *
 * The DuckDB oracle is the concatenation of those stages' own CTE
 * chains (`DocQueries.dupClustersCteFrom`, `DsirQueries.dsirCtesBodyFrom`,
 * q93's gram CTEs, q140's window), each reading the previous stage's
 * CTE — so a divergence pinpoints WHICH stage broke, and the funnel's
 * cross-stage plumbing (column threading, anti-join survivorship) is
 * verified end-to-end rather than assumed from per-stage greens.
 *
 * Stage choices vs CurationRunner.run: boilerplate excision and the
 * perplexity/tokenizer stages are the runner's other arms (q157/q169/
 * q167 gate them); this query gates the selection spine. Scale shape is
 * the sum of the audited per-stage plans — the composition adds only
 * id-keyed semi/anti joins.
 */
object FunnelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  private val MinTokens = 25
  private val MaxTokens = 80
  private val B = 4096     // DSIR buckets (matches DsirQueries)
  private val K = 0.5      // DSIR add-k smoothing
  private val FunnelK = 64 // DSIR selection quota
  // per-source token budget for the mix — small enough that the quota
  // BINDS on the selected pool (≈3-4 docs/source at 25-80 tokens each);
  // a budget nothing exceeds would pass the stage without testing it
  private val Budget = 120L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q202_curation_funnel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("source") === "src0")
      // q84's quality bounds on whitespace tokens
      val quality = docs.filter(col("source") =!= "src0")
        .filter(TextAnalysis.tokenCount(col("text"))
          .between(MinTokens, MaxTokens))
      // q133's Bloom+exact decontamination (≡ q93 output by the
      // no-false-negatives contract); any shared 5-gram drops the doc
      val contaminated = Corpus.decontaminateBloom(quality, bench,
          col("doc_id"), col("text"), n = 5)
        .select(col("id").as("doc_id"))
      // materialize once (the Dedup-family convention): `clean` feeds
      // the LSH edge build AND two later joins — without the checkpoint
      // each consumer re-derives the 5-gram decontamination join
      val clean = quality.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // q127: LSH near-dup edges → CC labels → singletons ∪ canonical
      val edges = Dedup.minhashNearDups(clean, col("doc_id"), col("text"),
          shingleSize = 5, numHashes = 16, bands = 8, threshold = 0.25)
        .select("a_id", "b_id")
      val labels = Dedup.connectedComponents(edges, maxIter = 20)
      val canon = TopK.topKPerGroup(
          labels.join(clean.select(col("doc_id").as("id"), col("n_chars")),
            "id"),
          Seq(col("component")), Seq(col("n_chars").desc, col("id").asc), 1)
        .select(col("id").as("doc_id"))
      // `corpus` feeds the DSIR bucket counts, the weight pass, and the
      // final mix join — same materialize-once rationale
      val corpus = clean
        .join(labels.select(col("id").as("doc_id")), Seq("doc_id"),
          "left_anti")
        .select(col("doc_id"))
        .unionByName(canon)
        .join(clean, "doc_id")
        .localCheckpoint(true)
      // q194/q195: DSIR weights against the benchmark target + Gumbel
      // top-k draw over the deduped survivors
      val ratio = Dsir.logRatio(
        Dsir.bucketCounts(bench, col("text"), B),
        Dsir.bucketCounts(corpus, col("text"), B), B, K)
      val picked = Dsir.gumbelTopK(
          Dsir.importanceWeights(corpus, col("doc_id"), col("text"),
            ratio, B),
          col("id"), col("log_w"), FunnelK, "dsir")
        .select(col("id").as("doc_id"))
      // q140: per-source token quota in deterministic md5-shuffle order
      val selected = corpus.join(picked, "doc_id")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Sampling.tokenBudgetFill(selected, col("doc_id"), col("source"),
          col("n_tokens"), lit(Budget))
        .select(col("doc_id"), col("source"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          col("pos"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    "q212_funnel_evolved" -> ((s, dir) => {
      // the alembic analog IN COMPOSITION (VERDICT r16 #6): the funnel
      // spine's ingest reads a TWO-GENERATION staged documents table
      // through SchemaEvolution.readEvolved — v1 (even doc_ids) carries
      // the pre-migration column name (`body`) and predates the `lang`
      // column (filled from the declared default 'und'), v2 (odd) is
      // the current schema — then runs the q202-family quality gate +
      // exact-hash dedup + per-(source, lang) datasheet rollup over the
      // MERGED frame. The default-filled rows surface as lang='und'
      // groups, so the migration semantics are visible in the gated
      // output, not just in q205's standalone rollup.
      import org.apache.spark.sql.types._
      val docs = t(s, dir, "documents")
      val out = Scratch.path(s, "q212")
      docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), col("text").as("body"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/v1")
      docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
          col("lang"))
        .write.mode("overwrite").parquet(s"$out/v2")
      val target = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType),
        StructField("lang", StringType)))
      val merged = graft.sources.SchemaEvolution.readEvolved(s, Seq(
          graft.sources.SchemaEvolution.Generation(s"$out/v1",
            renames = Map("body" -> "text")),
          graft.sources.SchemaEvolution.Generation(s"$out/v2")),
        target, defaults = Map("lang" -> lit("und")))
      val quality = merged.filter(TextAnalysis.tokenCount(col("text"))
        .between(MinTokens, MaxTokens))
      val keep = quality.withColumn("h", md5(col("text")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")
            .orderBy(col("doc_id").asc)))
        .filter(col("rn") === 1)
      keep.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).cast("bigint")
            .as("n_tokens"))
        .orderBy("source", "lang")
    }))

  val oracleSql: Map[String, String] = Map(

    "q202_curation_funnel" -> {
      val tokCount =
        raw"len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))"
      raw"""WITH fb AS (SELECT doc_id, source, text FROM documents
        |  WHERE source = 'src0'),
        |fq AS (SELECT doc_id, source, text, n_chars FROM documents
        |  WHERE source <> 'src0'
        |    AND $tokCount BETWEEN $MinTokens AND $MaxTokens),
        |gtok AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM fq),
        |gg AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(w)-4, 0)+1),
        |      i -> CAST(CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 8))
        |        AS UBIGINT) AS BIGINT))) AS g
        |  FROM gtok),
        |btok AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM fb),
        |bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |      range(1, greatest(len(w)-4, 0)+1),
        |      i -> CAST(CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 8))
        |        AS UBIGINT) AS BIGINT)))) AS h
        |  FROM btok),
        |cont AS (SELECT DISTINCT doc_id FROM
        |    (SELECT doc_id, unnest(g) AS h FROM gg) tr JOIN bg USING (h)),
        |fclean AS (SELECT fq.* FROM fq LEFT JOIN cont USING (doc_id)
        |  WHERE cont.doc_id IS NULL),
        |${DocQueries.dupClustersCteFrom("fclean")},
        |canon AS (SELECT f.doc_id FROM l12 l JOIN fclean f ON f.doc_id = l.id
        |  QUALIFY row_number() OVER (PARTITION BY l.component
        |    ORDER BY f.n_chars DESC, f.doc_id) = 1),
        |fcorp AS (SELECT f.* FROM fclean f LEFT JOIN l12 l ON l.id = f.doc_id
        |    WHERE l.id IS NULL
        |  UNION ALL
        |  SELECT f.* FROM fclean f JOIN canon c ON c.doc_id = f.doc_id),
        |fd AS (SELECT doc_id, source, text FROM fb
        |  UNION ALL SELECT doc_id, source, text FROM fcorp),
        |${DsirQueries.dsirCtesBodyFrom("fd")},
        |fsel AS (SELECT doc_id, log_w,
        |    ${DsirQueries.gumbelKeySql}
        |  FROM wts),
        |fpicked AS (SELECT doc_id FROM fsel ORDER BY key DESC, doc_id
        |  LIMIT $FunnelK),
        |mixd AS (SELECT f.doc_id, f.source, $tokCount AS n_tokens,
        |    md5('tbf:' || CAST(f.doc_id AS VARCHAR)) AS hx
        |  FROM fcorp f JOIN fpicked p USING (doc_id)),
        |mixc AS (SELECT doc_id, source, n_tokens,
        |    CAST(row_number() OVER win AS INTEGER) AS pos,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hx, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM mixd
        |  WINDOW win AS (PARTITION BY source ORDER BY hx, doc_id))
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  pos, cum_tokens
        |FROM mixc WHERE cum_tokens <= $Budget
        |ORDER BY doc_id""".stripMargin
    },

    // replays the generation split + migration merge from the base
    // documents table (the q205 discipline applied to the funnel
    // ingest): even doc_ids are v1 — pre-migration name, lang filled
    // from the declared default — odd are v2; then the quality gate,
    // the md5 exact dedup (min doc_id survives), and the datasheet
    // rollup over the merged frame
    "q212_funnel_evolved" -> {
      val tokCount =
        raw"len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))"
      raw"""WITH merged AS (SELECT doc_id, text, source,
        |    CASE WHEN doc_id % 2 = 0 THEN 'und' ELSE lang END AS lang
        |  FROM documents),
        |q AS (SELECT * FROM merged
        |  WHERE $tokCount BETWEEN $MinTokens AND $MaxTokens),
        |keep AS (SELECT * FROM q
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id ASC) = 1)
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum($tokCount) AS BIGINT) AS n_tokens
        |FROM keep GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin
    })
}
