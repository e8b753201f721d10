package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.sources.Tables

/**
 * BPE tokenizer queries (q166–q167): distributed merge-table training
 * ([[graft.operators.Bpe]]) and scan-local apply
 * ([[graft.functions.BpeEncode]]) over the synthetic corpus.
 *
 * Oracle strategy — the training loop is replayed EXACTLY in DuckDB as a
 * generated CTE chain, one (pair-count → argmax → merge) triple per
 * round, carrying the word-vocab as a chr(31)-delimited symbol string:
 * merging (a, b) is `replace(s, US a US b US, US ab US)` — boundary-safe
 * because every symbol is delimiter-wrapped, and replace()'s leftmost
 * non-overlapping scan is exactly the trainer's single-pass fold
 * semantics. The final round's vocab IS the per-word tokenization, so
 * the apply query (q166) reads token frequencies straight off it, while
 * the Spark side re-tokenizes the raw corpus through the codegen
 * [[graft.functions.BpeEncode]] — the oracle checks trainer and encoder
 * agree end-to-end, not just that one replays the other.
 *
 * Soundness of the sequential replay (rank i applied to exhaustion
 * before rank i+1) vs the encoder's lowest-rank-first loop: merging
 * (a, b) only creates adjacencies involving the NEW symbol ab, so a
 * lower-rank pair can only reappear if its symbols include a
 * later-created string — impossible when each merge's operands are
 * single characters or outputs of strictly earlier merges, which holds
 * for every trained sequence on this corpus ([[graft.BpeSpec]] pins the
 * trainer/encoder agreement property directly).
 *
 * chr(31) (unit separator) is safe as the symbol delimiter: the corpus
 * is printable ASCII (verified empirically; words are whitespace-split
 * so no whitespace either), and symbols are substrings of words.
 */
object BpeQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)

  /** Merge rounds — deep enough that multi-round symbols (products of
    * earlier merges) participate in later merges, small enough that the
    * generated oracle stays readable. The sf0.01 corpus vocabulary
    * supports far more than 16 merges at minPairCount=2. */
  private val NumMerges = 16
  private val MinPair = 2L

  /** q192 batched-trainer shape: 4 rounds × up-to-12 disjoint merges —
    * small enough that the generated round-replay oracle stays readable,
    * deep enough that later rounds merge symbols built by earlier
    * batches AND the disjointness screen demonstrably rejects
    * candidates (top-12 char pairs share letters heavily). */
  private val BatchRounds = 4
  private val BatchSize = 12

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q166_bpe_encode" -> ((s, dir) => {
      // train-then-tokenize: the merge table is learned from the same
      // corpus (one corpus scan + NumMerges vocab-frame aggregates),
      // then applied as a single scan-local codegen projection — the
      // 100 TB shape: the expensive loop runs on the distinct-word
      // frame; the corpus itself is touched exactly twice (count, apply).
      val docs = t(s, dir, "documents")
      val merges = Bpe.train(docs, col("text"), NumMerges, MinPair)
      docs.select(explode(Bpe.encode(col("text"), merges)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy("token")
    }),

    "q173_bpe_compression" -> ((s, dir) => {
      // tokenizer fertility audit: chars-per-token and tokens-per-word
      // per source under the corpus-trained table — the compression
      // metric tokenizer teams track (a source with low chars/token
      // signals vocabulary mismatch and blows the token budget).
      // One encode pass; ratios from exact long sums.
      val docs = t(s, dir, "documents")
      val merges = Bpe.train(docs, col("text"), NumMerges, MinPair)
      val toks = filter(split(lower(col("text")), "\\s+"),
        x => length(x) > 0)
      docs.select(col("source"),
          size(Bpe.encode(col("text"), merges)).cast("long").as("_ntok"),
          size(toks).cast("long").as("_nw"),
          // sum of word lengths == length of the concatenation — stays
          // codegen'd where an aggregate() lambda would interpret
          length(concat_ws("", toks)).cast("long").as("_nch"))
        .groupBy("source")
        .agg(sum(col("_ntok")).as("n_tokens"),
          sum(col("_nch")).as("n_chars"),
          sum(col("_nw")).as("n_words"))
        .select(col("source"), col("n_tokens"), col("n_chars"), col("n_words"),
          round(col("n_chars").cast("double") /
            col("n_tokens").cast("double"), 6).as("chars_per_token"),
          round(col("n_tokens").cast("double") /
            col("n_words").cast("double"), 6).as("tokens_per_word"))
        .orderBy("source")
    }),

    "q167_bpe_train" -> ((s, dir) => {
      // the learned artifact itself, rank order — the tokenizer table a
      // downstream pipeline would broadcast to every encode site.
      val merges = Bpe.train(t(s, dir, "documents"), col("text"),
        NumMerges, MinPair)
      val rows = merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      s.createDataFrame(rows).toDF("rank", "a", "b").orderBy("rank")
    }),

    "q192_bpe_batched_train" -> ((s, dir) => {
      // the BATCHED trainer (real-tokenizer merge counts need rounds ≪
      // merges: the sequential argmax is one Spark job per merge, so 32k
      // merges = 32k driver round-trips). Each round collects the top
      // BatchSize candidate pairs once, keeps the subset disjoint from
      // all higher-ranked candidates (their measured counts stay exact
      // at apply time), and applies them in one scan-local projection.
      // The oracle replays the identical rounds in DuckDB — same window
      // selection rule via row_number + NOT EXISTS, same leftmost
      // non-overlapping replace() on the chr(31)-delimited vocab.
      val res = Bpe.trainBatchedRounds(
        Bpe.wordCounts(t(s, dir, "documents"), col("text")),
        BatchRounds, BatchSize, MinPair)
      val rows = res.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      s.createDataFrame(rows).toDF("rank", "a", "b").orderBy("rank")
    })
  )

  /** Word-count + symbol-string base, then one (pairs → best → vocab)
    * CTE triple per merge round. LEFT JOIN ON TRUE carries the vocab
    * through unchanged when a round finds no pair ≥ MinPair (the
    * trainer's early stop). */
  private def trainCtes: String = {
    val sb = new StringBuilder
    sb ++= raw"""WITH wc AS MATERIALIZED (SELECT w AS word, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY 1),
      |v0 AS MATERIALIZED (SELECT word,
      |    chr(31) || array_to_string(string_split(word, ''), chr(31)) || chr(31) AS s,
      |    cnt FROM wc)""".stripMargin
    for (i <- 0 until NumMerges) {
      sb ++= s""",
        |p$i AS MATERIALIZED (SELECT sy[i] AS a, sy[i+1] AS b, sum(cnt) AS n FROM (
        |    SELECT sy, cnt, unnest(range(1, len(sy))) AS i FROM (
        |      SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS sy, cnt
        |      FROM v$i))
        |  GROUP BY 1, 2 HAVING sum(cnt) >= $MinPair),
        |b$i AS MATERIALIZED (SELECT a, b FROM p$i ORDER BY n DESC, a, b LIMIT 1),
        |v${i + 1} AS MATERIALIZED (SELECT v.word,
        |    CASE WHEN b.a IS NOT NULL
        |      THEN replace(v.s, chr(31) || b.a || chr(31) || b.b || chr(31),
        |                        chr(31) || b.a || b.b || chr(31))
        |      ELSE v.s END AS s,
        |    v.cnt
        |  FROM v$i v LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    sb.toString
  }

  /** Round-replay of the BATCHED trainer: per round, candidate ranking
    * (row_number over the total (n desc, a, b) order, LIMIT BatchSize),
    * the disjointness window screen (NOT EXISTS a conflicting
    * strictly-higher-ranked candidate — the exact rule
    * [[graft.operators.Bpe.trainBatchedRounds]] applies), then
    * BatchSize fixed apply sub-steps (LEFT JOIN on sk = k carries the
    * vocab through unchanged when fewer pairs were selected). Global
    * rank = row_number over (round, within-round selection order). */
  private def batchedCtes: String = {
    val sb = new StringBuilder
    sb ++= raw"""WITH bwc AS MATERIALIZED (SELECT w AS word, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY 1),
      |bv0 AS MATERIALIZED (SELECT
      |    chr(31) || array_to_string(string_split(word, ''), chr(31)) || chr(31) AS s,
      |    cnt FROM bwc)""".stripMargin
    for (r <- 0 until BatchRounds) {
      sb ++= s""",
        |bp$r AS MATERIALIZED (SELECT sy[i] AS a, sy[i+1] AS b, sum(cnt) AS n FROM (
        |    SELECT sy, cnt, unnest(range(1, len(sy))) AS i FROM (
        |      SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS sy, cnt
        |      FROM bv$r))
        |  GROUP BY 1, 2 HAVING sum(cnt) >= $MinPair),
        |bc$r AS MATERIALIZED (SELECT a, b,
        |    row_number() OVER (ORDER BY n DESC, a, b) AS rk
        |  FROM bp$r ORDER BY n DESC, a, b LIMIT $BatchSize),
        |bk$r AS MATERIALIZED (SELECT a, b,
        |    row_number() OVER (ORDER BY rk) AS sk
        |  FROM bc$r c1
        |  WHERE NOT EXISTS (SELECT 1 FROM bc$r c2 WHERE c2.rk < c1.rk
        |    AND (c2.a IN (c1.a, c1.b) OR c2.b IN (c1.a, c1.b))))""".stripMargin
      for (k <- 1 to BatchSize) {
        val prev = if (k == 1) s"bv$r" else s"ba${r}_${k - 1}"
        sb ++= s""",
          |ba${r}_$k AS (SELECT CASE WHEN m.a IS NOT NULL
          |      THEN replace(v.s, chr(31) || m.a || chr(31) || m.b || chr(31),
          |                        chr(31) || m.a || m.b || chr(31))
          |      ELSE v.s END AS s, v.cnt
          |  FROM $prev v LEFT JOIN (SELECT a, b FROM bk$r WHERE sk = $k) m ON TRUE)""".stripMargin
      }
      sb ++= s""",
        |bv${r + 1} AS MATERIALIZED (SELECT s, cnt FROM ba${r}_$BatchSize)""".stripMargin
    }
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(

    "q192_bpe_batched_train" -> (batchedCtes + s"""
      |SELECT CAST(row_number() OVER (ORDER BY r, sk) - 1 AS INTEGER) AS rank, a, b
      |FROM (
      |${(0 until BatchRounds).map(r => s"  SELECT $r AS r, sk, a, b FROM bk$r")
        .mkString("  UNION ALL\n")}
      |) ORDER BY rank""".stripMargin),

    "q166_bpe_encode" -> (trainCtes + s"""
      |SELECT token, CAST(sum(cnt) AS BIGINT) AS n FROM (
      |  SELECT cnt,
      |    unnest(list_filter(string_split(s, chr(31)), x -> x <> '')) AS token
      |  FROM v$NumMerges)
      |GROUP BY 1 ORDER BY 1""".stripMargin),

    "q173_bpe_compression" -> (trainCtes + s""",
      |wsrc AS (SELECT source, w AS word, count(*) AS cnt FROM (
      |    SELECT source, unnest(list_filter(string_split_regex(lower(text), '${"\\s+"}'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY 1, 2),
      |wtok AS (SELECT word,
      |    len(list_filter(string_split(s, chr(31)), x -> x <> '')) AS ntok
      |  FROM v$NumMerges)
      |SELECT source,
      |  CAST(sum(cnt * ntok) AS BIGINT) AS n_tokens,
      |  CAST(sum(cnt * len(word)) AS BIGINT) AS n_chars,
      |  CAST(sum(cnt) AS BIGINT) AS n_words,
      |  round(CAST(sum(cnt * len(word)) AS DOUBLE) /
      |    CAST(sum(cnt * ntok) AS DOUBLE), 6) AS chars_per_token,
      |  round(CAST(sum(cnt * ntok) AS DOUBLE) /
      |    CAST(sum(cnt) AS DOUBLE), 6) AS tokens_per_word
      |FROM wsrc JOIN wtok USING (word)
      |GROUP BY source ORDER BY source""".stripMargin),

    "q167_bpe_train" -> (trainCtes + s"""
      |SELECT CAST(rank AS INTEGER) AS rank, a, b FROM (
      |${(0 until NumMerges).map(i => s"  SELECT $i AS rank, a, b FROM b$i")
        .mkString("  UNION ALL\n")}
      |) ORDER BY rank""".stripMargin)
  )
}
