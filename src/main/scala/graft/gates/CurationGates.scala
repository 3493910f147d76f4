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

/** Gates: curation: decontamination, DSIR, rules, augmentation. */
object CurationGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q53_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 40 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 3, 12)).as("qtext"))
      Decontaminate.overlaps(docs, "doc_id", "text", bench, "qtext",
          n = 5, minOverlap = 2)
        .select(col("id").as("doc_id"), col("n_matched"),
          col("n_shingles"), col("overlap_ratio"))
    }),

    // curation: decontamination for eval sets too big to broadcast — the
    // corpus-side prefilter is Spark's bloom pair (narrow might_contain
    // literal, no join), exactness restored by the shingle semi-join on
    // survivors; row-identical to q53's broadcast path by construction,
    // so the oracle is the same shingle-overlap SQL (different params)
    "q71_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 2, 12)).as("qtext"))
      Decontaminate.overlapsBloom(docs, "doc_id", "text", bench, "qtext",
          n = 6, minOverlap = 1)
        .select(col("id").as("doc_id"), col("n_matched"),
          col("n_shingles"), col("overlap_ratio"))
    }),

    // substring-level dedup signal (Lee et al. 2022, arXiv:2107.06499):
    // per-doc coverage by 4-token spans that occur more than once in the
    // corpus — the span-removal footprint, relational instead of a
    // suffix array
    "q232_repeated_spans" -> ((s, dir) => {
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 4)
    }),

    // the transformation face of q232: duplicated spans REMOVED and the
    // document reassembled (position-sorted inside the collected array —
    // collect_list order alone is not deterministic)
    "q233_span_removal" -> ((s, dir) => {
      Dedup.removeRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 4)
    }),

    // augmentation: T5-style span masking (rate 0.3, block 5, seed s1) —
    // masked blocks collapse to one positional <extra_id_b> sentinel
    "q260_span_mask" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 1)
      TextAnalysis.augmentSpanMask(docs, "doc_id", "text",
        rate = 0.3, blockSize = 5, seed = "s1")
    }),

    // normalization: homoglyph folding — the fixture injects Cyrillic
    // look-alikes deterministically (both engines build it identically),
    // the operator must count and fold them back
    "q261_homoglyphs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val injected = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 1, translate(col("text"), "aeo", "аео"))
          .when(col("doc_id") % 3 === 2, translate(col("text"), "cpx", "срх"))
          .otherwise(col("text")).as("t"))
      injected.select(col("doc_id"),
        TextAnalysis.normalizeHomoglyphs(col("t")).as("text_norm"),
        TextAnalysis.homoglyphCount(col("t")).as("n_homoglyphs"))
    }),

    // augmentation: replayable token dropout (rate 0.1, seed "s1") —
    // positional md5 keeps/drops each token identically in both engines;
    // no RNG state, zero shuffle
    "q256_token_dropout" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
      TextAnalysis.augmentTokenDropout(docs, "doc_id", "text",
        rate = 0.1, seed = "s1")
    }),

    // DSIR via SAVED artifacts through the params surface: DsirArtifacts
    // writes the (bucket, diff) model table once, DsirScore replays it —
    // per-release amortization, q217's convention for the DSIR family.
    // The parquet round-trip is value-identity on doubles, so q236's
    // oracle gates it
    "q243_dsir_artifacts" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q243")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 25 === 0).write.parquet(p("target"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("DsirArtifacts",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("model")}",
           | "target_corpus_dir": "${p("target")}", "id_column": "doc_id",
           | "text_column": "text", "buckets": 512}""".stripMargin)
      run("DsirScore",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("weights")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "buckets": 512}""".stripMargin)
      s.read.parquet(p("weights"))
    }),

    // curation: the incremental face of q232 — span-count artifacts
    // built over the landed corpus (doc_id%5 != 0), the delivery batch
    // checked against batch + landed occurrences; landed text is never
    // re-read. Oracle identity: the whole-corpus q232 chain restricted
    // to the batch docs
    "q242_span_increment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val arts = Dedup.spanArtifacts(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", width = 4)
      Dedup.repeatedSpansIncrement(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
        width = 4, arts)
    }),

    // curation: the GOPHER quality ruleset (Rae et al. 2021 §A1.1) —
    // per-doc measured signals + one boolean per rule + the pass
    // conjunction, pure Columns, zero shuffle; the 50-word floor and
    // the stopword rule both split this corpus
    "q241_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherFlags(t(s, dir, "documents"), "doc_id", "text")
    }),

    // curation: SEMANTIC decontamination — corpus vectors within cosine
    // 0.9 of any benchmark vector (the vec_id%25 slice), sign-LSH
    // bucketed candidates with the benchmark side broadcast; catches
    // the paraphrase the n-gram families (q53/q71) cannot
    "q238_semantic_decontaminate" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
      Decontaminate.overlapsSemantic(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") % 25 === 0), "vec_id", "embedding",
        threshold = 0.9, bits = 8, tables = 4)
    }),

    // curation: DSIR importance weights (Xie et al. 2023) — every doc
    // scored by the hashed-ngram log-likelihood ratio of the doc_id%25
    // target slice over the whole corpus; buckets=512 keeps both models
    // literal-sized while leaving the bucket space unsaturated
    "q236_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dsir.importanceWeights(docs, docs.filter(col("doc_id") % 25 === 0),
        "doc_id", "text", buckets = 512)
    }),

    // the selection face: Gumbel-top-200 under md5-derived noise —
    // sampling w/o replacement ∝ exp(log_weight) as a pure function of
    // the data (TakeOrdered, never a global sort); the gate projects the
    // score columns, q240 consumes the carried document columns
    "q237_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dsir.select(docs, docs.filter(col("doc_id") % 25 === 0),
          "doc_id", "text", buckets = 512, k = 200)
        .select(col("doc_id"), col("log_weight"), col("sample_key"),
          col("rank"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q53_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bench AS (
        |  SELECT array_to_string(tk[3:14], ' ') AS qt FROM tk
        |  WHERE doc_id % 40 = 0),
        |btk AS (
        |  SELECT string_split_regex(trim(lower(qt)), '\s+') AS tk FROM bench),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-5, 0)+1),
        |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
        |  FROM btk),
        |csh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-5, 0)+1),
        |    i -> array_to_string(tk[i+1:i+5], ' '))) AS shl
        |  FROM tk),
        |csh AS (
        |  SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
        |    unnest(shl) AS s
        |  FROM csh0)
        |SELECT doc_id, count(*) AS n_matched, n_shingles,
        |  round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS overlap_ratio
        |FROM csh JOIN bsh USING (s)
        |GROUP BY doc_id, n_shingles
        |HAVING count(*) >= 2""".stripMargin,

    // mirrors Decontaminate.overlapsBloom(n=6, minOverlap=1) with the
    // snippet benchmark from every 25th doc's tokens 2..13 — the bloom
    // prefilter is exactness-preserving, so the oracle is the plain
    // shingle overlap (same shape as q53, different params)
    "q71_bloom_decontaminate" -> bloomDecontaminateSql,

    // mirrors q232: identical 4-token span md5-60 hashes, >1-occurrence
    // dup set, coverage = sliding max of dup-start flags over the
    // preceding width-1 positions
    "q232_repeated_spans" -> spanReportSql("TRUE"),

    // mirrors q233: the q232 coverage chain carrying the token itself,
    // uncovered tokens reassembled position-ordered (string_agg skips
    // the CASE NULLs; fully-covered docs coalesce to '')
    "q233_span_removal" ->
      s"""WITH ${spanCleanBodySql("SELECT doc_id, text FROM documents")}
         |SELECT doc_id, n_tokens, kept_tokens, clean_text
         |FROM cleaned""".stripMargin,

    // mirrors TextAnalysis.augmentSpanMask: block b = floor((i-1)/5),
    // masked iff md5_60("s1_m_{id}_{b}") mod 1000 < 300; first token of
    // a masked block becomes <extra_id_b>, the rest drop
    "q260_span_mask" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE doc_id % 4 = 1),
        |m AS (SELECT doc_id, tk,
        |  list_transform(tk, (x, i) ->
        |    CASE WHEN CAST('0x' || substr(md5('s1_m_'
        |        || CAST(doc_id AS VARCHAR) || '_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)),
        |        1, 15) AS BIGINT) % 1000 >= 300 THEN x
        |      WHEN (i-1) % 5 = 0 THEN '<extra_id_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)
        |        || '>'
        |      ELSE '' END) AS mp,
        |  len(list_filter(tk, (x, i) ->
        |    CAST('0x' || substr(md5('s1_m_'
        |        || CAST(doc_id AS VARCHAR) || '_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)),
        |        1, 15) AS BIGINT) % 1000 < 300)) AS n_masked
        |  FROM tok)
        |SELECT doc_id,
        |  array_to_string(list_filter(mp, x -> x <> ''), ' ')
        |    AS text_masked,
        |  CAST(len(tk) AS INTEGER) AS n_tokens,
        |  CAST(n_masked AS INTEGER) AS n_masked
        |FROM m""".stripMargin,

    // mirrors q261: the same deterministic confusable injection, then
    // translate-based folding and the deletion-count signal
    "q261_homoglyphs" ->
      s"""WITH inj AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', 'аео')
         |    WHEN doc_id % 3 = 2 THEN translate(text, 'cpx', 'срх')
         |    ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  translate(t, '${TextAnalysis.homoglyphFrom}',
         |    '${TextAnalysis.homoglyphTo}') AS text_norm,
         |  CAST(length(t) - length(translate(t,
         |    '${TextAnalysis.homoglyphFrom}', '')) AS INTEGER)
         |    AS n_homoglyphs
         |FROM inj""".stripMargin,

    // mirrors TextAnalysis.augmentTokenDropout: 1-based list_filter
    // index, the PortableHash 60-bit md5 of "{seed}_{id}_{pos}"
    "q256_token_dropout" -> dropoutSql,

    // q243 replays the identical diff table from its parquet artifact
    // (value-identity round-trip) — q236's oracle again
    "q243_dsir_artifacts" -> dsirWeightsSql,

    // mirrors q242: the q232 whole-corpus chain restricted to the batch
    // docs — the incremental identity (batch + artifact counts ==
    // global counts because batch ∪ landed IS the corpus)
    "q242_span_increment" -> spanReportSql("doc_id % 5 = 0"),

    // mirrors q241: identical signal arithmetic (integer sums, one
    // division each), flags on the UNROUNDED values, ratios rounded 6
    "q241_gopher_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE)
        |      / CAST(len(tk) AS DOUBLE) AS mean_len,
        |    CAST((length(text) - length(replace(text, '#', '')))
        |      + (length(text) - length(replace(text, '...', ''))) / 3
        |      AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS sym,
        |    CAST(len(list_filter(tk, t -> regexp_matches(t, '[a-z]')))
        |      AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS alpha,
        |    CAST(len(list_filter(tk, t -> t IN ('the', 'be', 'to', 'of',
        |      'and', 'that', 'have', 'with'))) AS BIGINT) AS n_stop
        |  FROM tk)
        |SELECT doc_id, n_words,
        |  round(mean_len, 6) AS mean_word_len,
        |  round(sym, 6) AS symbol_ratio,
        |  round(alpha, 6) AS alpha_word_ratio,
        |  n_stop AS n_stopwords,
        |  n_words >= 50 AND n_words <= 100000 AS word_count_ok,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_len_ok,
        |  sym <= 0.1 AS symbol_ok,
        |  alpha >= 0.8 AS alpha_ok,
        |  n_stop >= 2 AS stopword_ok,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND sym <= 0.1 AND alpha >= 0.8 AND n_stop >= 2 AS pass
        |FROM m""".stripMargin,

    // mirrors q238: identical sign-LSH signatures (4 tables x 8 bits
    // over the md5-derived hyperplanes), benchmark = vec_id%25,
    // candidates from bucket equality, sequential-order cosine, matched
    // rows grouped to (count, rounded max)
    "q238_semantic_decontaminate" -> semanticDeconSql,

    // mirrors q236: identical md5-60 unigram+bigram bucket hashing
    // (mod 512), add-one bucket models over target (doc_id%25) and raw,
    // per-doc log-ratio sums rounded to 6
    "q236_dsir_weights" -> dsirWeightsSql,

    // mirrors q237: q236's weights + the md5-derived Gumbel key,
    // top-200 by (key desc, doc_id)
    "q237_dsir_resample" ->
      s"""$dsirChainSql,
         |keyed AS (
         |  SELECT doc_id, log_weight,
         |    round(log_weight - ln(-ln(
         |      (CAST(${PortableHash.sqlHash60(
        "CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5)
         |        / 1000000.0)), 6) AS sample_key
         |  FROM w)
         |SELECT doc_id, log_weight, sample_key,
         |  CAST(rank AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC,
         |        doc_id) AS rank FROM keyed)
         |WHERE rank <= 200""".stripMargin
  )
}
