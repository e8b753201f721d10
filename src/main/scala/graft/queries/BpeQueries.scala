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

  /** Byte-level trainer shape (q200/q201): 8 rounds × up-to-24 disjoint
    * merges over the GPT-2 byte alphabet. The documents corpus has only
    * ~61 distinct byte-pretokens (tiny synthetic vocabulary), bounding
    * TOTAL possible merges at a few hundred — so corpus-scale merge
    * counts (the 1024-merge gate) live in `ByteLevelBpeSpec` on a
    * synthetic wide-vocabulary corpus, exactly as q192's scale gate
    * does; the oracle-gated query trains to the depth this corpus
    * supports, with multi-round symbol reuse exercised. */
  private val ByteRounds = 8
  private val ByteBatch = 24

  /** The oracle's byte-map replay (`replace(w, ' ', chr(288))`) is exact
    * only while every corpus byte is printable ASCII or space — space is
    * then the ONLY remapped byte (the engine-side kernel maps all 256).
    * Any other byte appearing in a future testdata regen must fail the
    * gate loudly, not silently hash-diverge. */
  def assertByteLevelOracleSound(s: SparkSession, dir: String): Unit = {
    val docs = t(s, dir, "documents")
    // NULL text would make the ASCII filter predicate NULL and slip the
    // gate — reject it explicitly
    require(docs.filter(col("text").isNull).limit(1).count() == 0,
      "byte-level BPE oracle precondition violated: NULL documents.text")
    val bad = docs
      .filter(length(regexp_replace(col("text"), "[ -~]", "")) > 0)
      .limit(1).count()
    require(bad == 0,
      "byte-level BPE oracle precondition violated: documents.text " +
        "contains bytes outside printable ASCII + space; the DuckDB " +
        "replay's space-only byte map no longer matches the kernel")
    // every source must contribute >=1 non-empty text: the q201 oracle
    // derives its per-source frame from the pretoken stream (inner join),
    // so an all-empty source would drop the row the engine emits
    require(docs.groupBy(col("source"))
        .agg(max(length(col("text"))).as("m"))
        .filter(col("m") === 0).limit(1).count() == 0,
      "byte-level BPE oracle precondition violated: a documents.source " +
        "has only empty text; the fertility oracle would drop its row")
  }

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
    }),

    "q200_bpe_byte_train" -> ((s, dir) => {
      // BYTE-LEVEL batched training (GPT-2 lineage): pretokenize with
      // the RE2-compatible GPT-2 regex (case preserved, leading space
      // in-token), map UTF-8 bytes to the printable byte alphabet, then
      // the SAME batched round loop as q192 — one corpus scan, rounds
      // over the distinct-pretoken frame. The oracle replays the
      // identical rounds in DuckDB with a recursive-CTE apply (one
      // recursion step per selected merge, in selection order), the
      // same window disjointness screen, and the space→chr(288) byte
      // map the ASCII precondition guarantees is complete.
      val res = Bpe.trainBatchedRounds(
        Bpe.byteLevelWordCounts(t(s, dir, "documents"), col("text")),
        ByteRounds, ByteBatch, MinPair)
      val rows = res.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      s.createDataFrame(rows).toDF("rank", "a", "b").orderBy("rank")
    }),

    "q201_bpe_byte_fertility" -> ((s, dir) => {
      // byte-level fertility audit (q173's form, real-tokenizer units):
      // bytes-per-token and tokens-per-pretoken per source under the
      // corpus-trained byte-level table — the compression numbers the
      // mixing budgets (q140 form) should meter, since token counts from
      // a byte-level tokenizer are what any production tokenizer
      // produces on arbitrary text. Spark re-tokenizes the distinct-word
      // frame through the codegen merge kernel while the oracle reads
      // token counts off the final replay vocab — trainer and encoder
      // stay cross-checked end-to-end (the q166 discipline).
      val docs = t(s, dir, "documents")
      val res = Bpe.trainBatchedRounds(
        Bpe.byteLevelWordCounts(docs, col("text")),
        ByteRounds, ByteBatch, MinPair)
      // vocab-frame shape (the q166 discipline, and the oracle's own
      // zwsrc/zwtok frames): the corpus pays ONE pretokenize pass; the
      // merge walk runs on the distinct (source, word) frame. Pretokens
      // segment the text losslessly, so sum(len(word)*cnt) = text bytes
      // (1 byte = 1 mapped char on the ASCII-gated domain).
      val words = docs.select(col("source"),
          explode(Bpe.byteLevelWords(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      words.select(col("source"), col("cnt"),
          size(Bpe.encodeMappedWord(col("w"), res.merges))
            .cast("long").as("_ntok"),
          length(col("w")).cast("long").as("_nb"))
        .groupBy("source")
        .agg(sum(col("cnt") * col("_ntok")).as("n_tokens"),
          sum(col("cnt") * col("_nb")).as("n_bytes"),
          sum(col("cnt")).as("n_pretokens"))
        .select(col("source"), col("n_tokens"), col("n_bytes"),
          col("n_pretokens"),
          round(col("n_bytes").cast("double") /
            col("n_tokens").cast("double"), 6).as("bytes_per_token"),
          round(col("n_tokens").cast("double") /
            col("n_pretokens").cast("double"), 6).as("tokens_per_pretoken"))
        .orderBy("source")
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

  /** Byte-level round replay: the q192 window-rule CTEs over the
    * byte-mapped pretoken vocab, with the per-round apply as a
    * RECURSIVE CTE (one step per selected merge in sk order — exactly
    * the trainer's foldLeft; within-round disjointness makes the order
    * immaterial anyway, so the replay binds the SELECTION, the
    * recursion binds the application). `word` is threaded through the
    * recursion so the fertility oracle can read per-word token counts
    * off the final vocab. The byte map is space→chr(288) ONLY — exact
    * under the ASCII precondition `assertByteLevelOracleSound` enforces
    * per verify run. The pretokenizer is DERIVED from the one kernel
    * constant ([[graft.functions.ByteLevelBpe.sqlQuoted]]); RE2 and
    * java.util.regex agree on it over the gated ASCII domain (no
    * lookahead, leftmost-first alternation in both — but NOT on all of
    * `\s`: see the Pretokenizer scaladoc's vertical-tab caveat). */
  private def byteCtes: String = {
    val pretokSql = graft.functions.ByteLevelBpe.sqlQuoted
    val sb = new StringBuilder
    sb ++= s"""WITH RECURSIVE zwc AS MATERIALIZED (SELECT w AS word, count(*) AS cnt FROM (
      |    SELECT replace(unnest(regexp_extract_all(text, '$pretokSql', 0)),
      |      ' ', chr(288)) AS w
      |    FROM documents) GROUP BY 1),
      |zv0 AS MATERIALIZED (SELECT word,
      |    chr(31) || array_to_string(string_split(word, ''), chr(31)) || chr(31) AS s,
      |    cnt FROM zwc)""".stripMargin
    for (r <- 0 until ByteRounds) {
      sb ++= s""",
        |zp$r AS MATERIALIZED (SELECT sy[i] AS a, sy[i+1] AS b, sum(cnt) AS n FROM (
        |    SELECT sy, cnt, unnest(range(1, len(sy))) AS i FROM (
        |      SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS sy, cnt
        |      FROM zv$r))
        |  GROUP BY 1, 2 HAVING sum(cnt) >= $MinPair),
        |zc$r AS MATERIALIZED (SELECT a, b,
        |    row_number() OVER (ORDER BY n DESC, a, b) AS rk
        |  FROM zp$r ORDER BY n DESC, a, b LIMIT $ByteBatch),
        |zk$r AS MATERIALIZED (SELECT a, b,
        |    row_number() OVER (ORDER BY rk) AS sk
        |  FROM zc$r c1
        |  WHERE NOT EXISTS (SELECT 1 FROM zc$r c2 WHERE c2.rk < c1.rk
        |    AND (c2.a IN (c1.a, c1.b) OR c2.b IN (c1.a, c1.b)))),
        |za$r AS (SELECT word, s, cnt, 0 AS k FROM zv$r
        |  UNION ALL
        |  SELECT v.word, CASE WHEN m.a IS NOT NULL
        |      THEN replace(v.s, chr(31) || m.a || chr(31) || m.b || chr(31),
        |                        chr(31) || m.a || m.b || chr(31))
        |      ELSE v.s END AS s, v.cnt, v.k + 1
        |  FROM za$r v LEFT JOIN zk$r m ON m.sk = v.k + 1
        |  WHERE v.k < (SELECT coalesce(max(sk), 0) FROM zk$r)),
        |zv${r + 1} AS MATERIALIZED (SELECT word, s, cnt FROM za$r
        |  WHERE k = (SELECT coalesce(max(sk), 0) FROM zk$r))""".stripMargin
    }
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(

    "q200_bpe_byte_train" -> (byteCtes + s"""
      |SELECT CAST(row_number() OVER (ORDER BY r, sk) - 1 AS INTEGER) AS rank, a, b
      |FROM (
      |${(0 until ByteRounds).map(r => s"  SELECT $r AS r, sk, a, b FROM zk$r")
        .mkString("  UNION ALL\n")}
      |) ORDER BY rank""".stripMargin),

    "q201_bpe_byte_fertility" -> (byteCtes + s""",
      |zwsrc AS (SELECT source, w AS word, count(*) AS cnt FROM (
      |    SELECT source, replace(unnest(regexp_extract_all(text,
      |      '${graft.functions.ByteLevelBpe.sqlQuoted}', 0)),
      |      ' ', chr(288)) AS w
      |    FROM documents) GROUP BY 1, 2),
      |zwtok AS (SELECT word,
      |    len(list_filter(string_split(s, chr(31)), x -> x <> '')) AS ntok,
      |    len(word) AS nb
      |  FROM zv$ByteRounds)
      |SELECT source,
      |  CAST(sum(cnt * ntok) AS BIGINT) AS n_tokens,
      |  CAST(sum(cnt * nb) AS BIGINT) AS n_bytes,
      |  CAST(sum(cnt) AS BIGINT) AS n_pretokens,
      |  round(CAST(sum(cnt * nb) AS DOUBLE) /
      |    CAST(sum(cnt * ntok) AS DOUBLE), 6) AS bytes_per_token,
      |  round(CAST(sum(cnt * ntok) AS DOUBLE) /
      |    CAST(sum(cnt) AS DOUBLE), 6) AS tokens_per_pretoken
      |FROM zwsrc JOIN zwtok USING (word)
      |GROUP BY source ORDER BY source""".stripMargin),

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
