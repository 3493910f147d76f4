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

/** Gates: text analysis: language id, quality, terms, readability. */
object TextGates extends GateSupport {

  /** q181's oracle side-channel root: per-JVM collision-free (two
    * concurrent harness runs must not race each other's deflate sizes),
    * but shared between the GATE write and the ORACLE read — the oracle
    * SQL needs a literal path, so the SAME per-run value is interpolated
    * into both (the oracle string is built in the JVM that runs the
    * gate, and oracle_sql.json carries it to the DuckDB side).
    */
  private val q181SizesDir: String =
    java.nio.file.Files.createTempDirectory("graft_q181_sizes").toString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // text: language id + quality features
    "q25_lang_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(
          t(s, dir, "documents").withColumn("lang_pred",
            TextAnalysis.langId(col("text"))), "text")
        .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
          col("avg_token_len"), col("punct_ratio"), col("stopword_ratio"),
          col("quality_score"))
    }),

    // text: order-insensitive content fingerprint
    "q26_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // curation: benchmark decontamination — corpus docs sharing 5-gram
    // shingles with a (broadcast) eval set; the eval set here is built
    // from token snippets of every 40th doc, so sources and their
    // near-dups must surface
    // curation: per-doc novelty of the odd-id half against the even-id
    // half — 1 - (matched distinct 3-shingles / total), the "is this
    // delivery new material or a re-crawl" triage; the reference side is
    // deliberately NOT broadcast (corpus-sized regime)
    "q157_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.noveltyScores(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"),
          col("n_matched"), col("novelty"))
    }),

    // curation: Gopher-style repetition signals (dup lines, dup 2-grams,
    // top-2-gram mass) — the boilerplate/spam quality filters
    "q54_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_lines"), col("dup_line_fraction"),
          col("n_2grams"), col("dup_2gram_fraction"),
          col("top_2gram_fraction"))
    }),

    // curation: unigram log-prob quality score against the corpus's own
    // distribution (vocab capped at 20 of the corpus's 31 tokens so the
    // truncation + OOV-floor paths are exercised, not just the happy path)
    "q62_unigram_quality" -> ((s, dir) => {
      TextAnalysis.unigramLogProbScore(t(s, dir, "documents"), "doc_id",
        "text", vocabSize = 20)
    }),

    // curation: CROSS-document boilerplate — per doc, the share of its
    // distinct 3-grams occurring in >=5 distinct documents (corpus
    // document frequency; the recurring-chrome signal q54's per-doc
    // repetition stats cannot see)
    "q79_boilerplate" -> ((s, dir) => {
      TextAnalysis.boilerplateSignals(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minDocs = 5)
    }),

    // curation: sliding-window text chunking — 32-token windows every 24
    // tokens (overlapping context windows, the RAG/long-context prep
    // step); narrow end to end, tokenizer staged once per doc
    "q80_chunk_text" -> ((s, dir) => {
      Packing.chunkText(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, stride = 24)
    }),

    // dedup: chunk-granularity novelty — non-overlapping 16-token chunks,
    // counting per doc the chunks already present in a smaller-id doc.
    // Recycled text is synthesized deterministically (every 6th doc's
    // first 40 tokens re-landed under id+100000) like q55's injected PII:
    // full chunks of a copy match its source, the short tail does not
    "q81_chunk_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val copies = docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat_ws(" ", slice(Dedup.tokens(col("text")), 1, 40)).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(copies)
      Dedup.chunkNovelty(corpus, "doc_id", "text", chunkTokens = 16)
    }),

    // curation: canonical text normalization — Unicode NFC (native
    // Catalyst expression; Spark has no built-in), lowercase, whitespace
    // collapse. Denormalized unicode is injected deterministically
    // (combining accents, runs of spaces, a tab) so the gate proves real
    // recomposition: the digests match DuckDB's nfc_normalize output
    // byte-for-byte
    "q84_normalize_text" -> ((s, dir) => {
      // DECOMPOSED sequences (e+U+0301, i+U+0308): NFC must recompose
      // them ahead of the digest — precomposed literals would only ever
      // take the isNormalized fast path
      val messy = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 9 === 0,
            lit("  Cafe\u0301   nai\u0308ve \tE\u0301cole "))
            .otherwise(lit(""))).as("text"))
      val norm = TextAnalysis.normalizeText(col("text"))
      messy.select(col("doc_id"), md5(norm).as("norm_digest"),
        length(norm).as("n_chars_norm"))
    }),

    // curation: top-k frequent terms per language — the rank window runs
    // over the per-group distinct vocabulary (histogram), never the
    // corpus rows
    "q85_top_terms" -> ((s, dir) => {
      TextAnalysis.topTermsPerGroup(t(s, dir, "documents"), "lang",
        "text", k = 10)
    }),

    // text QA: Zipf-slope fit over the top-20 term frequencies — OLS of
    // ln(freq) on ln(rank); natural text sits near -1, template spam
    // flattens it (topK=20 < vocab so the truncation path is exercised)
    "q150_zipf_slope" -> ((s, dir) => {
      TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", topK = 20)
    }),

    // monitoring: vocabulary drift — appeared/vanished terms between
    // the even-id and odd-id halves, with deterministic injected
    // fixture terms on each side (the real corpus shares one vocab)
    "q143_vocab_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" zzzlegacy"))).otherwise(col("text")))
      val nw = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" zzznovel"))).otherwise(col("text")))
      TextAnalysis.vocabDiff(old, nw, "text", minCount = 2)
    }),

    // monitoring: per-type burstiness — Fano factor + CV of each event
    // type's daily counts ("is this feed steady or bursty at all",
    // next to q141's per-day flags)
    "q152_burstiness" -> ((s, dir) => {
      Stats.burstiness(t(s, dir, "events"), "ts", "event_type")
    }),

    // text: language-id confidence margin — best stopword score minus
    // runner-up; 0 flags the ambiguous docs a reviewer should see
    "q140_langid_margin" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.langIdMargin(col("text")).as("margin"))
    }),

    // text: vocab coverage curve — token-occurrence coverage of the
    // top-V terms at V=100/1000/4000 (4000 exceeds the vocab: clamp
    // branch); runs on the frequency HISTOGRAM, never a vocab-sized sort
    "q125_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text",
        Seq(100, 1000, 4000))
    }),

    // text: PMI collocations — top adjacent-token pairs by pointwise
    // mutual information (rational ranking, no libm); bigrams built
    // map-side from the token array, counts map-side-combinable
    "q119_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minCount = 3, k = 20)
    }),

    // text: per-doc top-3 TF-IDF terms — rational idf (N/df, same
    // ranking as log-idf, no libm in the path) keeps the score a single
    // division of exact integer products; rank ties break on unrounded
    // score then term, WindowGroupLimit prunes map-side
    "q111_tfidf_terms" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"),
        "doc_id", "text", k = 3)
    }),

    // curation: bigram-LM cross-entropy quality score (token ORDER now
    // matters, vs q62's unigram) — model truncated to 500 bigrams / 25
    // histories of the corpus's 31 tokens so the smoothing-floor and
    // truncated-history paths are exercised, not just the happy path
    "q180_bigram_quality" -> ((s, dir) => {
      TextAnalysis.bigramLogProbScore(t(s, dir, "documents"), "doc_id",
        "text", modelSize = 500, historySize = 25, addK = 0.5)
    }),

    // curation: zlib compression-ratio quality bands — template spam
    // deflates toward 0, noise toward 1. No SQL engine mirrors zlib, so
    // the gate writes the deflate sizes to a prepared side parquet
    // (hive-partitioned by corpus size: each SF owns its partition,
    // dynamic overwrite — Verify at sf0.01 and Bench at sf0.1 never
    // clobber each other) and the oracle reads them back as shared
    // input; what the gate checks is the raw-byte count, the exact
    // integer ppm ratio, and the banding math
    "q181_compression_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      TextAnalysis.compressionSignals(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_deflated"), lit(n).as("n_corpus"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("n_corpus").parquet(q181SizesDir)
      val sizes = s.read.parquet(q181SizesDir)
        .filter(col("n_corpus") === n).select("doc_id", "n_deflated")
      TextAnalysis.compressionBands(
        docs.select(col("doc_id"),
            octet_length(col("text")).as("n_bytes"))
          .join(sizes, Seq("doc_id")),
        "doc_id")
    }),

    // curation: C4-style blocklist blast-radius report — doc and
    // occurrence counts per blocked term, zero-hit terms kept as (0,0)
    // rows (the misspelled-blocklist-entry bug made visible)
    "q182_blocklist" -> ((s, dir) => {
      TextAnalysis.blocklistReport(t(s, dir, "documents"), "doc_id",
        "text", Seq("slow", "big", "vector", "zzz_unused"))
    }),

    // web-corpus: URL domain mix — every 3rd doc gets deterministic
    // URLs appended (the q156 mangle convention: the corpus has none),
    // then per-domain doc/url counts from the RE2-simple extraction
    "q183_url_domains" -> ((s, dir) => {
      val withUrls = t(s, dir, "documents").withColumn("text",
        concat(col("text"), when(col("doc_id") % 3 === 0,
          concat(lit(" https://site"), col("doc_id") % 7,
            lit(".example/p x http://cdn.example/a")))
          .otherwise(lit(""))))
      TextAnalysis.urlDomains(withUrls, "doc_id", "text")
    }),

    // curation: Flesch reading-ease — deterministic word/sentence/vowel-
    // group counts in a fixed association (the classic quality feature
    // next to q26's ratio heuristics)
    "q184_readability" -> ((s, dir) => {
      TextAnalysis.readabilityScores(t(s, dir, "documents"), "doc_id",
        "text")
    }),

    // eval: ROUGE-2 overlap between adjacent-document pairs — the
    // summarization/distillation fidelity metric (clipped n-gram
    // MULTISET matches: precision over candidate grams, recall over
    // reference grams, F1); fixed-width gram-hash shuffle keys
    "q253_rouge_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.as("a")
        .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .filter(col("a.doc_id") % 5 === 0)
        .select(col("a.doc_id").as("pair_id"), col("a.text").as("cand"),
          col("b.text").as("ref"))
      TextAnalysis.rougeN(pairs, "pair_id", "cand", "ref", n = 2)
    }),

    // report: writing-system profile per source on the q261-style
    // confusable-injected fixture — the mislabeled-vs-evasion signal
    "q267_script_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val injected = docs.select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 1, translate(col("text"), "aeo", "аео"))
          .when(col("doc_id") % 3 === 2, translate(col("text"), "cpx", "срх"))
          .otherwise(col("text")).as("t"))
      TextAnalysis.scriptProfile(injected, "source", "t")
    }),

    // curation: mixed-language (code-switching) report — the fixture
    // appends a 20-token German block to half the docs (both engines
    // identically); per-chunk langId, per-doc language mix
    "q265_mixed_language" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 5 < 2)
      val mixed = docs.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"),
          lit(" der die das und ist von mit ein der die das und ist" +
            " von mit ein der die das und")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.mixedLanguageReport(mixed, "doc_id", "text",
        chunkTokens = 20)
    }),

    // source format: the raw text reader (one record per line) — the
    // log/plain-corpus ingest path: lines land as `value`, fields
    // recovered by a first-tab split, tokenization downstream. The
    // synthetic texts are single-line (no tabs/newlines), which the
    // writer side relies on — the delimiter contract of any line format
    "q247_text_source" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 50 === 0)
      val base = tmpDir("graft_q247")
      val lines = docs.collect()
        .map(r => s"${r.getLong(0)}\t${r.getString(1)}")
      JFiles.write(Paths.get(base, "corpus.txt"),
        lines.mkString("\n").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      s.read.text(base)
        .select(
          substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
          expr("substring(value, instr(value, '\t') + 1)").as("text"))
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("text")).as("digest"))
    }),

    // curation: character-trigram language ID — the fasttext-langid
    // feature regime as a tokenizer variant of the NB machinery
    // (trigrams include spaces, so word boundaries carry signal);
    // vocab 200 over the trigram space
    "q245_charngram_langid" -> ((s, dir) => {
      Classify.naiveBayesClassify(t(s, dir, "documents"), "doc_id",
        "text", "lang", col("doc_id") % 5 === 0, vocabSize = 200,
        tokenizer = Classify.charTrigrams)
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q25_lang_quality" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |sc AS (SELECT doc_id, text, tk,
         |  $scores,
         |  CAST(len(tk) AS INTEGER) AS n_tokens,
         |  length(text) AS n_chars,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  len(list_filter(tk, x -> x IN ($stopAll))) AS n_stop
         |  FROM t),
         |f AS (SELECT doc_id,
         |  greatest(s_en, s_de, s_es, s_fr, s_zh) AS best,
         |  s_en, s_de, s_es, s_fr, s_zh, n_tokens,
         |  round(CAST(n_chars AS DOUBLE)/greatest(n_tokens,1),4) AS avg_token_len,
         |  round(CAST(n_punct AS DOUBLE)/greatest(n_chars,1),4) AS punct_ratio,
         |  round(CAST(n_stop AS DOUBLE)/greatest(n_tokens,1),4) AS stopword_ratio
         |  FROM sc)
         |SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang_pred,
         |  n_tokens, avg_token_len, punct_ratio, stopword_ratio,
         |  round(CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 0.4 ELSE 0.0 END
         |    + CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
         |    + CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END
         |    + CASE WHEN stopword_ratio >= 0.05 THEN 0.2 ELSE 0.0 END, 2)
         |    AS quality_score
         |FROM f""".stripMargin
    },

    "q26_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |  string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin,

    // mirrors Decontaminate.overlaps(n=5, minOverlap=2) with the snippet
    // benchmark built from every 40th doc's tokens 3..14
    // mirrors q157: q53's shingle-string chain at n=3 on both halves;
    // every doc emits >= 1 shingle (the greatest(len-3,0)+1 window), so
    // the per-doc counts cover all odd docs
    "q157_novelty" ->
      """WITH rtk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 2 = 0),
        |rsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' ')))) AS s
        |  FROM rtk),
        |ttk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 2 = 1),
        |tsh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
        |  FROM ttk),
        |tsh AS (SELECT doc_id, unnest(shl) AS s FROM tsh0)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(r.s) AS BIGINT) AS n_matched,
        |  round(1.0 - CAST(count(r.s) AS DOUBLE) / count(*), 6) AS novelty
        |FROM tsh t LEFT JOIN rsh r ON t.s = r.s
        |GROUP BY t.doc_id""".stripMargin,

    // mirrors TextAnalysis.repetitionSignals: line stats are per-row array
    // ops; 2-gram stats group by the gram itself (Spark groups by its
    // 8-byte hash — identical counts)
    "q54_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, greatest(len(tk)-2, 0)+1),
        |    i -> array_to_string(tk[i+1:i+2], ' '))) AS g
        |  FROM tk),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM g0 GROUP BY doc_id, g),
        |ga AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
        |    count(*) AS n_distinct, max(c) AS top
        |  FROM gc GROUP BY doc_id),
        |ln AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_lines,
        |    round(1.0 - CAST(len(list_distinct(string_split(text, chr(10))))
        |      AS DOUBLE) / len(string_split(text, chr(10))), 6)
        |      AS dup_line_fraction
        |  FROM documents)
        |SELECT ln.doc_id, n_lines, dup_line_fraction, n_2grams,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_2grams, 6)
        |    AS dup_2gram_fraction,
        |  round(CAST(top AS DOUBLE) / n_2grams, 6) AS top_2gram_fraction
        |FROM ln JOIN ga USING (doc_id)""".stripMargin,

    // mirrors TextAnalysis.unigramLogProbScore(vocabSize=20): same
    // count/total division, natural log, OOV floor ln(0.5/total);
    // round(…,6) absorbs any last-ulp libm difference between engines
    "q62_unigram_quality" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |c AS (SELECT t, count(*) AS c FROM tk GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM c),
        |v AS (
        |  SELECT t, ln(c / total) AS lp FROM c CROSS JOIN tot
        |  QUALIFY row_number() OVER (ORDER BY c DESC, t) <= 20)
        |SELECT doc_id,
        |  round(avg(COALESCE(lp, ln(0.5 / total))), 6) AS unigram_logprob
        |FROM tk LEFT JOIN v USING (t) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    // mirrors TextAnalysis.boilerplateSignals(n=3, minDocs=5): document
    // frequency of per-doc-DISTINCT 3-grams (Spark groups by the 8-byte
    // shingle hash, DuckDB by the gram text — identical counts, q54's
    // convention)
    "q79_boilerplate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' ')))) AS s
        |  FROM tk),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_common,
        |  round(CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS common_fraction
        |FROM sh JOIN df USING (s)
        |GROUP BY doc_id""".stripMargin,

    // mirrors Packing.chunkText(32, 24): window starts step the token
    // index by the stride; both engines slice the same 1-based token
    // array, trailing windows shorter than the chunk
    "q80_chunk_text" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk)-1, 0)+1, 24)) AS s
        |  FROM tk)
        |SELECT doc_id, CAST(s // 24 AS INTEGER) AS chunk_idx,
        |  array_to_string(tk[s+1:s+32], ' ') AS chunk_text,
        |  CAST(least(32, len(tk)-s) AS INTEGER) AS n_tokens
        |FROM st""".stripMargin,

    // mirrors Dedup.chunkNovelty(16) over documents ∪ the synthesized
    // 40-token-prefix copies: first-seen is the min doc_id per chunk
    // digest (digest equality ⟺ text equality within each engine)
    "q81_chunk_novelty" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |    array_to_string(
        |      string_split_regex(trim(lower(text)), '\s+')[1:40], ' ')
        |      AS text
        |  FROM documents WHERE doc_id % 6 = 0),
        |tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM base),
        |st AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk)-1, 0)+1, 16)) AS s
        |  FROM tk),
        |c AS (
        |  SELECT doc_id, md5(array_to_string(tk[s+1:s+16], ' ')) AS dig
        |  FROM st),
        |fs AS (SELECT dig, min(doc_id) AS first FROM c GROUP BY dig)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN first < doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_seen_chunks,
        |  round(1.0 - CAST(sum(CASE WHEN first < doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS novel_fraction
        |FROM c JOIN fs USING (dig)
        |GROUP BY doc_id""".stripMargin,

    // mirrors TextAnalysis.normalizeText with the injected decomposed
    // suffix (chr(769)=U+0301 combining acute, chr(776)=U+0308 combining
    // diaeresis, chr(9)=tab): both engines NFC-recompose, lowercase,
    // collapse whitespace — digests match byte-for-byte
    "q84_normalize_text" ->
      """WITH messy AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 9 = 0 THEN
        |      '  Cafe' || chr(769) || '   nai' || chr(776) || 've ' ||
        |      chr(9) || 'E' || chr(769) || 'cole '
        |    ELSE '' END AS text
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(lower(nfc_normalize(text))), '\s+', ' ',
        |      'g') AS nt
        |  FROM messy)
        |SELECT doc_id, md5(nt) AS norm_digest,
        |  CAST(length(nt) AS INTEGER) AS n_chars_norm
        |FROM norm""".stripMargin,

    // mirrors TextAnalysis.topTermsPerGroup(lang, 10): counts group
    // map-side in Spark, rank ties break on the token in both engines
    "q85_top_terms" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2)
        |SELECT lang, token, n,
        |  CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS rank
        |FROM c
        |QUALIFY rank <= 10""".stripMargin,

    // mirrors q150: rank by (freq desc, term), the four OLS sums folded
    // in rank order (q133 list_reduce discipline), slope/intercept trees
    // repeated textually so the doubles associate identically
    "q150_zipf_slope" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
        |  FROM tk GROUP BY 1),
        |top AS (
        |  SELECT term, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
        |      AS rank
        |  FROM tf ORDER BY freq DESC, term LIMIT 20),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE))})), s -> s.v),
        |    (x, y) -> x + y) AS sx,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(freq AS DOUBLE))})), s -> s.v),
        |    (x, y) -> x + y) AS sy,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE))})),
        |    s -> s.v), (x, y) -> x + y) AS sxy,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))})),
        |    s -> s.v), (x, y) -> x + y) AS sxx
        |  FROM top)
        |SELECT n_terms,
        |  CASE WHEN n_terms < 2 THEN NULL ELSE
        |    round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN n_terms < 2 THEN NULL ELSE
        |    round((sy
        |      - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
        |      / n_terms, 6)
        |  END AS intercept
        |FROM f""".stripMargin,

    // mirrors q143: same fixture injection and tokenizer, full-outer
    // vocab join with the frontier filter
    "q143_vocab_drift" ->
      """WITH o AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' zzzlegacy'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL),
        |n AS (
        |  SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' zzznovel'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        |co AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM o),
        |cn AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM n),
        |go AS (SELECT term, CAST(count(*) AS BIGINT) AS n_old
        |  FROM co GROUP BY 1),
        |gn AS (SELECT term, CAST(count(*) AS BIGINT) AS n_new
        |  FROM cn GROUP BY 1)
        |SELECT coalesce(go.term, gn.term) AS term,
        |  coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
        |  CASE WHEN coalesce(n_old, 0) = 0 THEN 'appeared'
        |    ELSE 'vanished' END AS status
        |FROM go FULL OUTER JOIN gn USING (term)
        |WHERE (coalesce(n_old, 0) = 0 AND coalesce(n_new, 0) >= 2)
        |   OR (coalesce(n_new, 0) = 0 AND coalesce(n_old, 0) >= 2)"""
        .stripMargin,

    // mirrors q152: per-type day counts, exact BIGINT moments, the q138
    // variance tree divided by the unrounded mean; k=1 nulls out
    "q152_burstiness" ->
      """WITH d AS (
        |  SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS k_days,
        |    CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM d GROUP BY 1)
        |SELECT event_type, k_days, total,
        |  round(CAST(total AS DOUBLE) / k_days, 6) AS mean,
        |  CASE WHEN k_days = 1 THEN NULL
        |    ELSE round(((CAST(s2 AS DOUBLE)
        |      - CAST(total AS DOUBLE) * total / k_days) / (k_days - 1))
        |      / (CAST(total AS DOUBLE) / k_days), 6)
        |  END AS fano,
        |  CASE WHEN k_days = 1 THEN NULL
        |    ELSE round(sqrt((CAST(s2 AS DOUBLE)
        |      - CAST(total AS DOUBLE) * total / k_days) / (k_days - 1))
        |      / (CAST(total AS DOUBLE) / k_days), 6)
        |  END AS cv
        |FROM m""".stripMargin,

    // mirrors q140: q25's score/pick conventions + a 5-element DESC
    // sort for the margin (INT both sides)
    "q140_langid_margin" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      val arr = TextAnalysis.stopwords.map { case (lang, _) => s"s_$lang" }
        .mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |sc AS (SELECT doc_id, $scores FROM t),
         |b AS (SELECT *, greatest($arr) AS best FROM sc)
         |SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang_pred,
         |  CAST(list_sort([$arr], 'DESC')[1]
         |    - list_sort([$arr], 'DESC')[2] AS INTEGER) AS margin
         |FROM b""".stripMargin
    },

    // mirrors q125 via the rank form (covered(V) = sum of top-V counts;
    // the engine's frequency-class formula is tie-break-invariant, so
    // the two forms agree exactly)
    "q125_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk
        |  FROM c),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |vs AS (SELECT unnest([100, 1000, 4000]) AS v)
        |SELECT vs.v AS vocab_size,
        |  CAST(coalesce(sum(CASE WHEN r.rk <= vs.v THEN r.c END), 0)
        |    AS BIGINT) AS covered,
        |  CAST(coalesce(sum(CASE WHEN r.rk <= vs.v THEN r.c END), 0)
        |    AS DOUBLE) / tot.n AS coverage
        |FROM vs CROSS JOIN r CROSS JOIN tot
        |GROUP BY vs.v, tot.n""".stripMargin,

    // mirrors TextAnalysis.collocations(minCount=3, k=20): the ratio
    // chain is mirrored left-assoc op by op (each step one IEEE double
    // operation on exact integer counts — bit-identical, no libm)
    "q119_collocations" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bi AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |pc AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count FROM bi
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi)
        |SELECT w1, w2, pair_count, round(ratio, 6) AS pmi_ratio
        |FROM (
        |  SELECT pc.w1, pc.w2, pc.pair_count,
        |    CAST(pc.pair_count AS DOUBLE) * tot.n * tot.n / btot.b
        |      / u1.c / u2.c AS ratio
        |  FROM pc JOIN uni u1 ON u1.w = pc.w1
        |          JOIN uni u2 ON u2.w = pc.w2, tot, btot)
        |ORDER BY ratio DESC, w1, w2 LIMIT 20""".stripMargin,

    // mirrors q111: tf over the shared tokenizer, df counted off the tf
    // frame, N = distinct docs with >=1 token; rank ordered by the
    // UNROUNDED score (identical IEEE bits both engines) then term
    "q111_tfidf_terms" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tk GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |  GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS sc,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term)
        |      AS INTEGER) AS rank
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, round(sc, 6) AS tfidf, rank
        |FROM s WHERE rank <= 3""".stripMargin,

    // mirrors q180: same bigram fan-out (1-indexed list slices), counts
    // truncated at 500 bigrams / 25 histories with identical tie-breaks,
    // denominators and V from the UNTRUNCATED counts, add-0.5 smoothing
    "q180_bigram_quality" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM tk)),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts,
        |      unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(
        |    (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |    (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |    AS bigram_logprob
        |FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin,

    // mirrors q181: the zlib deflate sizes are SHARED INPUT (the gate
    // writes them to the per-run q181SizesDir, hive-partitioned by
    // corpus size so this SF's partition is unambiguous); the oracle
    // re-derives raw UTF-8 bytes, the exact integer ppm ratio, the band
    "q181_compression_quality" ->
      s"""WITH sz AS (
        |  SELECT doc_id, n_deflated
        |  FROM read_parquet('$q181SizesDir/*/*.parquet',
        |                    hive_partitioning = true)
        |  WHERE n_corpus = (SELECT count(*) FROM documents)),
        |b AS (
        |  SELECT d.doc_id,
        |    CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |    CAST(s.n_deflated AS BIGINT) AS n_deflated
        |  FROM documents d JOIN sz s USING (doc_id))
        |SELECT doc_id, n_bytes, n_deflated,
        |  CASE WHEN n_bytes IS NULL OR n_bytes = 0 THEN NULL
        |       ELSE (n_deflated * 1000000) // n_bytes END AS ratio_ppm,
        |  CASE WHEN n_bytes IS NULL OR n_bytes = 0 THEN 'empty'
        |       WHEN (n_deflated * 1000000) // n_bytes < 300000
        |         THEN 'template'
        |       WHEN (n_deflated * 1000000) // n_bytes <= 700000
        |         THEN 'natural'
        |       ELSE 'incompressible' END AS band
        |FROM b""".stripMargin,

    // mirrors q182: same tokenization, IN-list prefilter, zero-hit
    // terms preserved by the VALUES-frame left join
    "q182_blocklist" ->
      """WITH terms(term) AS (
        |  VALUES ('slow'), ('big'), ('vector'), ('zzz_unused')),
        |tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |h AS (
        |  SELECT t AS term, count(DISTINCT doc_id) AS nd, count(*) AS no
        |  FROM tk WHERE t IN ('slow', 'big', 'vector', 'zzz_unused')
        |  GROUP BY t)
        |SELECT term, CAST(COALESCE(nd, 0) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(no, 0) AS BIGINT) AS n_occurrences
        |FROM terms LEFT JOIN h USING (term)""".stripMargin,

    // mirrors q183: identical URL fixture, RE2-simple extraction
    "q183_url_domains" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN text || ' https://site' || (doc_id % 7)
        |      || '.example/p x http://cdn.example/a'
        |    ELSE text END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    regexp_extract(unnest(
        |      regexp_extract_all(text, 'https?://[^\s]+')),
        |      'https?://([^/\s]+)', 1) AS domain
        |  FROM d)
        |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_urls
        |FROM u GROUP BY domain""".stripMargin,

    // mirrors q184: same three regex counts, same text-level syllable
    // floor, same fixed double association
    "q184_readability" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(lower(text)), '\s+'))
        |    END AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS g
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
        |  CAST(s AS BIGINT) AS n_sentences,
        |  CAST(greatest(g, w) AS BIGINT) AS n_syllables,
        |  CASE WHEN w = 0 THEN NULL
        |    ELSE round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
        |      - 84.6 * (CAST(greatest(g, w) AS DOUBLE) / w), 6)
        |  END AS flesch
        |FROM b""".stripMargin,

    // mirrors TextAnalysis.rougeN (n=2): clipped bigram MULTISET
    // matches per adjacent-doc pair; Spark's short-row guard (texts
    // with < n tokens yield ZERO grams, no truncated tail) is the CASE
    // WHEN; zero-overlap pairs survive via the totals LEFT JOIN
    "q253_rouge_eval" ->
      """WITH p AS (
        |  SELECT a.doc_id AS pair_id, a.text AS cand, b.text AS ref
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 5 = 0),
        |tok AS (SELECT pair_id,
        |  string_split_regex(trim(lower(cand)), '\s+') AS ct,
        |  string_split_regex(trim(lower(ref)), '\s+') AS rt FROM p),
        |g AS (SELECT pair_id,
        |  CASE WHEN len(ct) >= 2 THEN list_transform(range(0, len(ct)-1),
        |    i -> array_to_string(ct[i+1:i+2], ' ')) ELSE [] END AS cg,
        |  CASE WHEN len(rt) >= 2 THEN list_transform(range(0, len(rt)-1),
        |    i -> array_to_string(rt[i+1:i+2], ' ')) ELSE [] END AS rg
        |  FROM tok),
        |cc AS (SELECT pair_id, gg AS gram, count(*) AS c
        |  FROM (SELECT pair_id, unnest(cg) AS gg FROM g) GROUP BY 1, 2),
        |rc AS (SELECT pair_id, gg AS gram, count(*) AS r
        |  FROM (SELECT pair_id, unnest(rg) AS gg FROM g) GROUP BY 1, 2),
        |m AS (SELECT pair_id, CAST(sum(least(c, r)) AS BIGINT) AS mt
        |  FROM cc JOIN rc USING (pair_id, gram) GROUP BY 1),
        |tot AS (SELECT pair_id, len(cg) AS cand_total,
        |  len(rg) AS ref_total FROM g)
        |SELECT t.pair_id, coalesce(mt, 0) AS match_count,
        |  cand_total, ref_total,
        |  round(CASE WHEN cand_total > 0
        |    THEN CAST(coalesce(mt, 0) AS DOUBLE) / cand_total
        |    ELSE 0 END, 6) AS precision,
        |  round(CASE WHEN ref_total > 0
        |    THEN CAST(coalesce(mt, 0) AS DOUBLE) / ref_total
        |    ELSE 0 END, 6) AS recall,
        |  round(CASE WHEN coalesce(mt, 0) > 0 THEN
        |    2.0 * (CAST(mt AS DOUBLE) / cand_total)
        |        * (CAST(mt AS DOUBLE) / ref_total)
        |    / ((CAST(mt AS DOUBLE) / cand_total)
        |        + (CAST(mt AS DOUBLE) / ref_total))
        |    ELSE 0 END, 6) AS f1
        |FROM tot t LEFT JOIN m USING (pair_id)""".stripMargin,

    // mirrors TextAnalysis.scriptProfile over the q261-style fixture:
    // the deletion-count trick per script range ('g' flag — Spark's
    // regexp_replace is always global)
    "q267_script_profile" ->
      """WITH inj AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', 'аео')
        |    WHEN doc_id % 3 = 2 THEN translate(text, 'cpx', 'срх')
        |    ELSE text END AS t
        |  FROM documents),
        |g AS (SELECT source,
        |  CAST(sum(length(t)) AS BIGINT) AS n_chars,
        |  sum(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')))
        |    AS lat,
        |  sum(length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g')))
        |    AS cyr,
        |  sum(length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g')))
        |    AS cjk,
        |  sum(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))
        |    AS dig,
        |  sum(length(t) - length(regexp_replace(t, '[\s]', '', 'g')))
        |    AS spc
        |  FROM inj GROUP BY 1)
        |SELECT source, n_chars,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(lat AS DOUBLE) / n_chars, 6) END AS latin_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(cyr AS DOUBLE) / n_chars, 6) END
        |    AS cyrillic_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(cjk AS DOUBLE) / n_chars, 6) END AS cjk_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(dig AS DOUBLE) / n_chars, 6) END AS digit_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(spc AS DOUBLE) / n_chars, 6) END AS space_frac
        |FROM g""".stripMargin,

    // mirrors q265: same fixture, q25's per-chunk stopword-vote langId
    // (en-first tie CASE), then the doc x lang count + rank rollup
    "q265_mixed_language" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(ct, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text
         |    || ' der die das und ist von mit ein der die das und ist'
         |    || ' von mit ein der die das und'
         |    ELSE text END AS text
         |  FROM documents WHERE doc_id % 5 < 2),
         |toks AS (SELECT doc_id,
         |  string_split_regex(trim(lower(text)), '\\s+') AS tk FROM base),
         |st AS (SELECT doc_id, tk,
         |  unnest(range(0, greatest(len(tk)-1, 0)+1, 20)) AS s FROM toks),
         |cts AS (SELECT doc_id, tk[s+1:s+20] AS ct FROM st),
         |sc AS (SELECT doc_id, $scores FROM cts),
         |pick AS (SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang
         |  FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best
         |        FROM sc)),
         |bl AS (SELECT doc_id, lang, count(*) AS c
         |  FROM pick GROUP BY 1, 2),
         |rk AS (SELECT doc_id, lang, c, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY
         |      CASE WHEN lang = 'und' THEN 1 ELSE 0 END,
         |      c DESC, lang) AS rk FROM bl)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
         |  CAST(count(CASE WHEN lang <> 'und' THEN 1 END) AS BIGINT)
         |    AS n_langs,
         |  max(CASE WHEN rk = 1 THEN lang END) AS dominant_lang,
         |  round(CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
         |    / sum(c), 6) AS dominant_share
         |FROM rk GROUP BY doc_id""".stripMargin
    },

    // mirrors q247: the same token count + digest straight off the
    // documents the lines were written from
    "q247_text_source" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |    AS BIGINT) AS n_tokens,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    // mirrors q245: the NB chain with char-trigram tokenization and a
    // 200-entry vocabulary
    "q245_charngram_langid" ->
      s"""WITH ${nbChainBodySql(
        "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
        "SELECT doc_id, text FROM documents",
        charTrigramsSql, vocabSize = 200)}
         |SELECT b.doc_id, b.predicted, d.lang AS actual,
         |  b.predicted = d.lang AS correct, b.score
         |FROM best b JOIN documents d ON b.doc_id = d.doc_id
         |WHERE b.rk = 1""".stripMargin
  )
}
