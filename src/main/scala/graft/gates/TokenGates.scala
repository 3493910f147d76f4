package graft.gates

import graft.algos._
import graft.core.Tables
import graft.expr.{DateComponents, PartitionCriteria, SchemaOps}
import graft.catalog.{CatalogOps, TableWriter}
import graft.fsops.FsOps
import graft.io.{DataFormat, LoadMode}
import graft.functions.PortableHash
import graft.operators._
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import OracleHelpers._

/** Gates: tokenization: BPE, packing, token accounting. */
object TokenGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // text: token counting (whitespace + BPE-ish regex)
    "q27_token_counts" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"))
    }),

    // corpus curation: concat-and-chunk sequence packing (distributed
    // prefix sum — no single-task global window)
    "q49_sequence_packing" -> ((s, dir) => {
      Packing.packDocuments(t(s, dir, "documents"), "doc_id", "text",
          budgetTokens = 4096)
        .frame
        .select(col("doc_id"), col("n_tokens"), col("chunk_id"),
          col("offset_in_chunk"))
    }),

    // packing: the assembled training sequences — q49's exact chunk-id
    // prefix sum, then per-chunk text concatenation in id order
    // (array_sort on (id, text) structs: deterministic, window-free);
    // chunk sizes are budget-bounded so no group outgrows its task
    // curation: packing-efficiency report — mean fill + p50/p90 of the
    // per-chunk assigned token mass at a 512-token budget (the "does the
    // budget match the length distribution" number)
    "q159_packing_stats" -> ((s, dir) => {
      val packed = Packing.packDocuments(t(s, dir, "documents"), "doc_id",
        "text", budgetTokens = 512)
      Packing.packingStats(packed.frame, "n_tokens", budgetTokens = 512,
        ps = Seq(0.5, 0.9))
    }),

    "q98_packed_sequences" -> ((s, dir) => {
      val packed = Packing.packDocuments(t(s, dir, "documents"), "doc_id",
        "text", budgetTokens = 4096)
      packed.frame.groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("seq_tokens"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text"))).as("seq_text"))
    }),

    // tokenizer training: BPE round-1 pair counts over the corpus
    // vocabulary (the only corpus-sized pass of BPE learning), top 30
    // with full tie-break so the LIMIT edge is deterministic
    "q196_bpe_pairs" -> ((s, dir) => {
      Bpe.pairCounts(
        Bpe.wordCounts(t(s, dir, "documents"), "text")
          .select(col("freq"), Bpe.initialSymbols(col("word")).as("syms")))
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(30)
    }),

    // tokenizer training: two full BPE merge rounds, oracle-unrolled —
    // text pre-normalized to [a-z0-9 ] so the oracle's round-2 regex
    // atom (the round-1 winner as a literal alternation) is regex-safe
    "q197_bpe_learn" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.learnMerges(docs, "text", nMerges = 2)
    }),

    // tokenizer: segmentVocabulary replaying a freshly-learned 1-rule
    // merge table — the learn -> segment artifact handoff, end to end
    "q204_bpe_segment" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.segmentVocabulary(docs, "text",
          Bpe.learnMerges(docs, "text", nMerges = 1))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // tokenizer: MULTI-rule replay — learn 2 merges, replay both in
    // rank order (the sequential-application semantics q204's 1-rule
    // gate could not pin; the oracle re-encodes round-1 symbols with
    // paren delimiters so round-2's regex replace IS the fold)
    "q212_bpe_replay2" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.segmentVocabulary(docs, "text",
          Bpe.learnMerges(docs, "text", nMerges = 2))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // tokenizer-training pipeline through the PARAMS surface only (the
    // q76 convention): BpeVocab learns the merges to a table, BpeSegment
    // replays them from merges_dir — no DataFrame passes between stages
    "q214_bpe_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q214")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents")
        .select(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")
          .as("text"))
        .write.parquet(p("docs"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BpeVocab",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("merges")}",
           | "text_column": "text", "n_merges": 2}""".stripMargin)
      run("BpeSegment",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("seg")}",
           | "text_column": "text",
           | "merges_dir": "${p("merges")}"}""".stripMargin)
      s.read.parquet(p("seg"))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // tokenizer -> packing bridge: per-doc subword counts under the
    // 2-merge segmented vocabulary (the packing budget unit)
    "q216_bpe_token_counts" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      val seg = Bpe.segmentVocabulary(docs, "text",
        Bpe.learnMerges(docs, "text", nMerges = 2))
      Bpe.subwordCounts(docs, "doc_id", "text", seg)
    }),

    // report: tokenizer fertility per language — subword tokens per
    // whitespace token, the per-language token-budget multiplier
    "q266_fertility" -> ((s, dir) => {
      TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "lang",
        "text")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q27_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS n_ws,
        | CAST(len(regexp_extract_all(lower(text),
        |   '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe
        |FROM documents""".stripMargin,

    // mirrors Packing.packDocuments (budget 4096): token counts as q27,
    // cumulative-before offsets in doc_id order — integer-exact, so the
    // oracle's plain ordered window reproduces the distributed prefix sum
    "q49_sequence_packing" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk)
        |SELECT doc_id, n_tokens,
        |  CAST(before // 4096 AS BIGINT) AS chunk_id,
        |  CAST(before % 4096 AS BIGINT) AS offset_in_chunk
        |FROM c""".stripMargin,

    // mirrors q98: q49's chunk-id prefix sum, then ordered string_agg
    // per chunk
    // mirrors q159: q98's ordered cumsum assigns chunks, per-chunk mass
    // histogram-cumulated for the type-1 quantiles, one exact quotient
    "q159_packing_stats" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk),
        |s AS (
        |  SELECT CAST(before // 512 AS BIGINT) AS chunk_id,
        |    CAST(sum(n_tokens) AS BIGINT) AS ct
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(ct) AS BIGINT) AS total_tokens FROM s),
        |h AS (SELECT ct, count(*) AS hc FROM s GROUP BY 1),
        |cum AS (SELECT ct, sum(hc) OVER (ORDER BY ct
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h),
        |q AS (
        |  SELECT p, min(ct) AS chunk_tokens
        |  FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS p)
        |  CROSS JOIN t
        |  WHERE cm >= ceil(p * n_chunks)
        |  GROUP BY p)
        |SELECT q.p, q.chunk_tokens, t.n_chunks, t.total_tokens,
        |  round(CAST(t.total_tokens AS DOUBLE)
        |    / (CAST(t.n_chunks AS DOUBLE) * 512), 6) AS mean_fill
        |FROM q CROSS JOIN t""".stripMargin,

    "q98_packed_sequences" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk),
        |a AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(before // 4096 AS BIGINT) AS chunk_id
        |  FROM c)
        |SELECT chunk_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text
        |FROM a GROUP BY chunk_id""".stripMargin,

    // mirrors q196: same whitespace tokenization, char+</w> symbol
    // split, freq-weighted adjacent pair counts, same full tie-break
    "q196_bpe_pairs" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(lower(text)),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms AS (SELECT freq, list_append(list_transform(
        |           generate_series(1, length(w)),
        |           i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |pr AS (SELECT s[g] AS left_sym, s[g+1] AS right_sym, freq
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms WHERE len(s) >= 2))
        |SELECT left_sym, right_sym,
        |  CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM pr GROUP BY 1, 2
        |ORDER BY pair_count DESC, left_sym, right_sym LIMIT 30""".stripMargin,

    // mirrors q197: two unrolled BPE rounds. Round 2 re-derives the
    // symbol split in the STRING domain: leftmost-first alternation
    // '(<round-1 merged>|</w>|.)' is exactly the leftmost
    // non-overlapping fold applyMerge performs (alnum-only tokens keep
    // the atom literal-safe; '<', '>', '/' are not RE2 metacharacters)
    "q197_bpe_learn" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r, pair_count FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |syms2 AS (SELECT freq, regexp_extract_all(w || '</w>',
        |            '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |            '|</w>|.)') AS s FROM words),
        |p2 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms2 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r2 AS (SELECT l, r, pair_count FROM p2
        |       ORDER BY pair_count DESC, l, r LIMIT 1)
        |SELECT CAST(1 AS INTEGER) AS rank, l AS left_sym, r AS right_sym,
        |  l || r AS merged, pair_count FROM r1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), l, r, l || r, pair_count FROM r2""".stripMargin,

    // mirrors q204: learn round 1 (q197's r1 CTE), then segment every
    // vocabulary word with the single learned rule via the same
    // leftmost-first alternation, symbols joined by spaces
    "q204_bpe_segment" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1)
        |SELECT w AS word, freq,
        |  array_to_string(regexp_extract_all(w || '</w>',
        |    '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |    '|</w>|.)'), ' ') AS segmented
        |FROM words""".stripMargin,

    // mirrors q212: q197's two learned rules; rule 1 applied in the
    // string domain (leftmost-first alternation); symbols then
    // paren-encoded '(s1)(s2)…' so rule 2's global regexp_replace has
    // exact symbol boundaries and leftmost non-overlapping scan —
    // verified equal to the fold incl. odd identical runs ((a)(a)(a)
    // with rule (a,a) -> (aa)(a))
    "q212_bpe_replay2" -> bpeReplay2Sql,

    // q214 runs the SAME computation through JobRunner params files
    "q214_bpe_pipeline" -> bpeReplay2Sql,

    // mirrors q216: the q212 segmentation as a nested CTE; per-doc word
    // explode joins it, subword length = symbols in the segmented string
    "q216_bpe_token_counts" ->
      s"""WITH seg AS ($bpeReplay2Sql),
         |dtk AS (SELECT doc_id, unnest(string_split_regex(trim(
         |          regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
         |          '\\s+')) AS word FROM documents),
         |tw AS (SELECT doc_id, word FROM dtk
         |       WHERE word IS NOT NULL AND word <> '')
         |SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(COALESCE(len(string_split(seg.segmented, ' ')),
         |    length(tw.word) + 1)) AS BIGINT) AS n_subwords
         |FROM tw LEFT JOIN seg ON tw.word = seg.word
         |GROUP BY tw.doc_id""".stripMargin,

    // mirrors TextAnalysis.tokenizerFertility: the q27 token mirrors
    // aggregated per language
    "q266_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |    AS BIGINT) AS n_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_subword_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CASE WHEN sum(len(string_split_regex(trim(lower(text)),
        |      '\s+'))) > 0
        |    THEN round(CAST(sum(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS DOUBLE)
        |      / sum(len(string_split_regex(trim(lower(text)), '\s+'))), 6)
        |    END AS fertility,
        |  CASE WHEN sum(len(string_split_regex(trim(lower(text)),
        |      '\s+'))) > 0
        |    THEN round(CAST(sum(length(text)) AS DOUBLE)
        |      / sum(len(string_split_regex(trim(lower(text)), '\s+'))), 6)
        |    END AS chars_per_token
        |FROM documents GROUP BY lang""".stripMargin
  )
}
