package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (codegen'd; no UDFs), all embarrassingly parallel —
  * per-document work with zero shuffle.
  */
object TextAnalysis {

  /** Stopword tables per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and tiny by design — language ID at corpus
    * scale is a per-row map operation.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  // trim first: keeps token counts identical to the DuckDB oracle's
  // string_split_regex for documents with leading/trailing whitespace
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Canonical text normalization ahead of hashing/dedup: Unicode NFC
    * (native [[graft.functions.NfcNormalizeExpr]] — "café" as e+combining
    * acute and as precomposed é must digest identically), lowercased,
    * whitespace collapsed to single spaces, trimmed. Pure per-row map,
    * zero shuffle; every step reproduces in DuckDB (nfc_normalize /
    * lower / regexp_replace / trim), so normalized digests oracle-match.
    */
  def normalizeText(text: Column): Column =
    regexp_replace(
      trim(lower(graft.functions.NfcNormalizeExpr.nfc(text))),
      "\\s+", " ")

  /** Count of tokens that appear in `words`. */
  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Predicted language = argmax over stopword hit counts, ties broken by
    * the (fixed) language order; "und" (undetermined) when no hits at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.map { case (lang, words) =>
      (lang, hitCount(toks, words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.reverse.foldLeft(lit("und")) {
      case (acc, (lang, score)) =>
        when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Confidence margin of [[langId]]: best stopword hit count minus
    * the runner-up's — 0 when two languages tie (the ambiguous case a
    * reviewer should see), high when one language dominates. Works per
    * row with a fixed 5-element sort, no aggregation.
    */
  def langIdMargin(text: Column): Column = {
    val toks = tokens(text)
    val sorted = sort_array(
      array(stopwords.map { case (_, ws) => hitCount(toks, ws) }: _*),
      asc = false)
    element_at(sorted, 1) - element_at(sorted, 2)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mixed-language (code-switching) report — the doc-level [[langId]]
    * hides a document that flips language mid-way (its stopword vote
    * just picks the majority half); chunk the tokens into fixed
    * `chunkTokens` windows, language-ID each chunk, and report per doc:
    * chunk count, distinct identified languages (und — no stopword hit —
    * never counts as a language), the dominant chunk language
    * (count-majority; equal counts break to the lexicographically first
    * language) and its share. Consistent with the n_langs contract,
    * `und` ranks LAST for dominance: a doc with any identified chunk
    * reports the most common REAL language (its share still over all
    * chunks); `dominant_lang = 'und'` only when no chunk identified.
    * `n_langs >= 2` IS the
    * code-switching flag; `dominant_share` near 0.5 says an even split
    * (translation pairs, bilingual boilerplate), near 1 says a stray
    * foreign paragraph.
    *
    * Scale shape: the chunk explode is bounded by corpus token count /
    * chunkTokens; two map-side-combinable aggregations (doc×lang, then
    * doc) + one rank window over ≤ 6 lang rows per doc.
    */
  def mixedLanguageReport(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id"))
      .orderBy((col("__lang") === "und").cast("int"),
        col("__c").desc, col("__lang"))
    val chunks = Packing.chunkText(docs, idCol, textCol, chunkTokens,
      chunkTokens).select(col(s"`$idCol`").as("__id"),
        langId(col("chunk_text")).as("__lang"))
    chunks.groupBy(col("__id"), col("__lang"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_chunks"),
        count(when(col("__lang") =!= "und", lit(1))).as("n_langs"),
        max(when(col("__rk") === 1, col("__lang"))).as("dominant_lang"),
        max(when(col("__rk") === 1, col("__c"))).as("__dc"))
      .withColumn("dominant_share",
        round(col("__dc").cast("double") / col("n_chunks"), 6))
      .select(col("__id").as(idCol), col("n_chunks"), col("n_langs"),
        col("dominant_lang"), col("dominant_share"))
  }

  /** BPE-ish subword-unit count: runs of letters, runs of digits, or single
    * other non-space chars (the pre-tokenization regex family used by BPE
    * vocabularies).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Tokenizer fertility report per group — the budgeting number a
    * token-priced pipeline needs per language/source: subword tokens per
    * whitespace token (fertility — how much more a BPE-ish tokenizer
    * pays than word counts suggest; high for agglutinative or
    * non-Latin-script text) and chars per whitespace token. One
    * map-side-combinable aggregation; groups with zero whitespace
    * tokens report null ratios rather than NaN.
    */
  def tokenizerFertility(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = col(s"`$textCol`")
    graft.core.Spread(docs.select(col(s"`$groupCol`"), t))
      .groupBy(col(s"`$groupCol`"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(t)).as("n_ws_tokens"),
        sum(bpeishTokenCount(t)).as("n_subword_tokens"),
        sum(length(t)).as("n_chars"))
      .withColumn("fertility", when(col("n_ws_tokens") > 0,
        round(col("n_subword_tokens").cast("double")
          / col("n_ws_tokens"), 6)))
      .withColumn("chars_per_token", when(col("n_ws_tokens") > 0,
        round(col("n_chars").cast("double") / col("n_ws_tokens"), 6)))
  }

  /** Writing-system profile per group: character-mass fractions of
    * Latin letters, Cyrillic, CJK ideographs, digits, and whitespace
    * (the remainder is punctuation/symbols/other scripts) — the
    * corpus-mix companion to [[langId]] (which only votes stopwords)
    * and the aggregate face of [[homoglyphCount]]'s per-doc evasion
    * signal: a "Latin" source whose Cyrillic fraction is nonzero but
    * tiny is hiding confusables, one where it's large is mislabeled.
    * Counting is the deletion trick (length minus length-after-delete),
    * pure codegen'd Columns + one aggregation.
    */
  def scriptProfile(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = col(s"`$textCol`")
    def cnt(pattern: String): Column =
      length(t) - length(regexp_replace(t, pattern, ""))
    val grouped = graft.core.Spread(docs.select(col(s"`$groupCol`"), t))
      .groupBy(col(s"`$groupCol`"))
      .agg(sum(length(t)).as("n_chars"),
        sum(cnt("[A-Za-z]")).as("__lat"),
        sum(cnt("[Ѐ-ӿ]")).as("__cyr"),
        sum(cnt("[一-鿿]")).as("__cjk"),
        sum(cnt("[0-9]")).as("__dig"),
        sum(cnt("[\\s]")).as("__spc"))
    def frac(c: String): Column =
      when(col("n_chars") > 0,
        round(col(c).cast("double") / col("n_chars"), 6))
    grouped.select(col(s"`$groupCol`"), col("n_chars"),
      frac("__lat").as("latin_frac"), frac("__cyr").as("cyrillic_frac"),
      frac("__cjk").as("cjk_frac"), frac("__dig").as("digit_frac"),
      frac("__spc").as("space_frac"))
  }

  /** Quality features + a composite score in [0,1]:
    * length band, mean token length band, punctuation ratio, stopword ratio.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nChars = length(col(textCol))
    val punct = length(regexp_replace(col(textCol), "[^.,;:!?]", ""))
    val allStop = stopwords.flatMap(_._2).distinct
    val stopHits = hitCount(toks, allStop)
    df.withColumn("n_tokens", nTok)
      .withColumn("n_chars_m", nChars)
      .withColumn("avg_token_len",
        round(nChars.cast("double") / greatest(nTok, lit(1)), 4))
      .withColumn("punct_ratio",
        round(punct.cast("double") / greatest(nChars, lit(1)), 4))
      .withColumn("stopword_ratio",
        round(stopHits.cast("double") / greatest(nTok, lit(1)), 4))
      .withColumn("quality_score", round(
        when(col("n_tokens").between(10, 5000), 0.4).otherwise(0.0)
          + when(col("avg_token_len").between(2.0, 12.0), 0.3).otherwise(0.0)
          + when(col("punct_ratio") <= 0.2, 0.1).otherwise(0.0)
          + when(col("stopword_ratio") >= 0.05, 0.2).otherwise(0.0), 2))
  }

  /** Order-insensitive content fingerprint: digest of the sorted token set.
    * Near-identical docs that only permute sentences collide — a cheap
    * first-pass near-dup key (rolling/winnowing hashes layer on top).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling polynomial hash (Rabin-Karp base-31 over token hashes),
    * expressed with aggregate() — deterministic, codegen'd.
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * 31L + pmod(xxhash64(t), lit(1000000007L)))

  /** CCNet-style unigram log-probability quality score: documents whose
    * tokens are improbable under the corpus's own unigram distribution
    * (gibberish, boilerplate codes, wrong-language fragments) score low.
    *
    *  1. ONE aggregation builds the vocabulary: token → count, kept to the
    *     `vocabSize` most frequent (count desc, token asc tie-break), as
    *     log(count/total) — total over ALL tokens, so the vocabulary is a
    *     proper (truncated) distribution;
    *  2. the vocabulary broadcasts (bounded by the parameter, not the
    *     corpus — same O(C) discipline as the IVF centroids);
    *  3. each doc's tokens LEFT-join the vocabulary map-side;
    *     out-of-vocabulary tokens take a floor of log(0.5/total);
    *  4. per-doc mean log-prob, rounded for cross-engine comparison.
    *
    * Scale: one map-side-combinable count shuffle for the vocab, one
    * broadcast join + one per-doc aggregate for scoring. Scoring a NEW
    * corpus against a FROZEN vocabulary is the same pipeline with the
    * vocab frame loaded instead of computed.
    */
  def unigramLogProbScore(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 10000): DataFrame =
    scoreWithVocabulary(docs, idCol, textCol,
      unigramVocabulary(docs, textCol, vocabSize))

  /** Build the frozen unigram vocabulary from a corpus: the `vocabSize`
    * most frequent tokens (count desc, token asc tie-break) as
    * `(token, logprob, oov_floor)` — log(count/total) with total over ALL
    * tokens, so the table is a proper truncated distribution. `oov_floor`
    * (log(0.5/total), constant across rows) rides along denormalized: the
    * floor depends on the PRE-truncation total, which a reloaded table
    * could not otherwise reconstruct. Write this frame out once, then
    * score any number of later corpora against it with
    * [[scoreWithVocabulary]] — byte-identical to inline scoring (doubles
    * round-trip parquet exactly).
    */
  def unigramVocabulary(docs: DataFrame, textCol: String,
      vocabSize: Int = 10000): DataFrame = {
    // spread before the explode (graft.core.Spread — the tokenizer is the
    // heavy map-side work and a one-file scan serializes it), and carry
    // the total as a 1-row broadcast instead of a separate driver action:
    // one query → ReuseExchange shares the token-count aggregation between
    // the top-V and the total, so the corpus explodes ONCE, not twice.
    // log(c/total) and log(0.5/total) compute on the same doubles either
    // way; note Spark's Log expression goes through StrictMath.log while
    // driver-side math.log is the intrinsifiable Math.log — equal on this
    // platform (oracle-verified), but a last-ulp difference is possible on
    // exotic JVM/arch combinations, so an exact-hash comparison elsewhere
    // should prefer one side consistently (this query computes BOTH the
    // vocabulary and its consumers plan-side, so it is self-consistent).
    val toks = graft.core.Spread(docs.select(col(textCol)))
      .select(tokens(col(textCol)).as("__toks"))
      .select(explode(col("__toks")).as("__t"))
    val counts = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val totalDF = counts.agg(sum(col("__c")).cast("double").as("__tot"))
    counts
      .orderBy(col("__c").desc, col("__t"))
      .limit(vocabSize)
      .crossJoin(broadcast(totalDF))
      .select(col("__t").as("token"),
        log(col("__c") / col("__tot")).as("logprob"),
        log(lit(0.5) / col("__tot")).as("oov_floor"))
  }

  /** Score a corpus against a (possibly reloaded) frozen vocabulary from
    * [[unigramVocabulary]]: per-doc mean token log-prob, OOV tokens at the
    * vocabulary's floor, rounded for cross-engine comparison. The
    * vocabulary broadcasts (bounded by vocabSize, not the corpus); the
    * scan side is one map-side join + one per-doc aggregate.
    */
  def scoreWithVocabulary(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    // the vocabulary is vocabSize-BOUNDED by construction — collect it
    // once (the prepareModel convention) so the floor probe and the
    // broadcast build don't each re-run its build lineage (composed
    // inline, that lineage is a corpus-wide aggregation per use)
    val spark = vocab.sparkSession
    val slim = vocab.select(col("token"), col("logprob"), col("oov_floor"))
    val rows = slim.collect()
    require(rows.nonEmpty,
      "vocabulary is empty - build it from a non-empty corpus")
    val floor = rows.head.getDouble(2)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), slim.schema)
    val toks = graft.core.Spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("__t"))
    toks.join(
        broadcast(local.select(col("token").as("__t"),
          col("logprob").as("__lp"))),
        Seq("__t"), "left")
      .groupBy(col(idCol))
      .agg(round(avg(coalesce(col("__lp"), lit(floor))), 6)
        .as("unigram_logprob"))
  }

  /** Bigram language-model cross-entropy score with add-k smoothing —
    * the step up from [[unigramLogProbScore]] the CCNet/perplexity
    * filters actually use: token ORDER now matters, so shuffled-word
    * salad that fools the unigram model scores low here. Per doc (with
    * at least one bigram): mean ln P(w2|w1) where
    * P(w2|w1) = (c(w1,w2) + k) / (c(w1→·) + k·V), `c(w1→·)` the
    * PRE-truncation count of bigrams with history w1 and V the corpus's
    * distinct-token count. The model is truncated to the `modelSize`
    * most frequent bigrams and `historySize` most frequent histories
    * (count desc, token asc tie-breaks); truncated entries fall back to
    * the smoothed floor, which stays a proper probability because the
    * denominators come from the untruncated counts.
    *
    * 100 TB shape: bigram fan-out is a per-row array zip (no shuffle),
    * then ONE map-side-combinable (w1,w2) count; the history counts
    * re-aggregate the BIGRAM-VOCABULARY frame, not the corpus; both
    * model tables are bounded by their size parameters and broadcast,
    * so scoring is two map-side joins + one per-doc aggregate. Docs
    * with fewer than two tokens have no bigrams and are absent (their
    * quality is [[unigramLogProbScore]]'s job).
    */
  def bigramLogProbScore(docs: DataFrame, idCol: String, textCol: String,
      modelSize: Int = 100000, historySize: Int = 10000,
      addK: Double = 0.5): DataFrame =
    scoreWithBigramModel(docs, idCol, textCol,
      bigramModel(docs, textCol, modelSize, historySize), addK)

  /** Per-doc bigram fan-out: (id, __w1, __w2), one row per adjacent
    * token pair; docs with fewer than two tokens contribute nothing.
    * A per-row array zip — zero shuffle.
    */
  private def bigramPairs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.core.Spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(col(idCol), explode(zip_with(
          slice(col("__ts"), lit(1), size(col("__ts")) - 1),
          slice(col("__ts"), lit(2), size(col("__ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"),
        col("__bg.w2").as("__w2"))

  /** Build the frozen bigram model from a corpus: one frame holding
    * both tables — bigram rows `(w1, w2, cnt, v)` and history rows
    * `(w1, NULL, cnt, v)` — truncated to the `modelSize` most frequent
    * bigrams / `historySize` most frequent histories (count desc, token
    * asc tie-breaks). History counts and the denormalized
    * distinct-token count `v` come from the UNTRUNCATED counts, so the
    * smoothed fallback stays a proper probability after reload. Write
    * this out once, then score later corpora with
    * [[scoreWithBigramModel]] — byte-identical to inline scoring
    * (longs and doubles round-trip parquet exactly).
    */
  def bigramModel(docs: DataFrame, textCol: String,
      modelSize: Int = 100000, historySize: Int = 10000): DataFrame = {
    require(modelSize > 0, s"modelSize must be positive: $modelSize")
    require(historySize > 0, s"historySize must be positive: $historySize")
    val toksAll = graft.core.Spread(docs.select(col(textCol)))
      .select(tokens(col(textCol)).as("__ts"))
    val v = toksAll.select(explode(col("__ts")).as("__t"))
      .agg(countDistinct(col("__t"))).head.getLong(0).toDouble
    val bg = bigramPairs(docs.select(lit(0L).as("__id0"), col(textCol)),
      "__id0", textCol)
    val c2All = bg.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c"))
    val c1All = c2All.groupBy(col("__w1")).agg(sum(col("__c")).as("__c"))
    val c2 = c2All.orderBy(col("__c").desc, col("__w1"), col("__w2"))
      .limit(modelSize)
      .select(col("__w1").as("w1"), col("__w2").as("w2"),
        col("__c").as("cnt"))
    val c1 = c1All.orderBy(col("__c").desc, col("__w1"))
      .limit(historySize)
      .select(col("__w1").as("w1"), lit(null).cast("string").as("w2"),
        col("__c").as("cnt"))
    c2.unionByName(c1).withColumn("v", lit(v))
  }

  /** Score a corpus against a (possibly reloaded) frozen model from
    * [[bigramModel]]: per-doc mean ln P(w2|w1) with add-k smoothing,
    * truncated entries at the smoothed floor. Both model tables are
    * bounded by the build parameters and broadcast; scoring is two
    * map-side joins + one per-doc aggregate.
    */
  def scoreWithBigramModel(docs: DataFrame, idCol: String,
      textCol: String, model: DataFrame,
      addK: Double = 0.5): DataFrame =
    bigramLogProbRows(docs, idCol, textCol, model, addK)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("bigram_logprob"))

  /** Per-bigram smoothed logprob rows (id, __w1, __w2, __lp) against a
    * loaded model — shared by [[scoreWithBigramModel]] (mean over all
    * transitions) and [[minKProbScore]] (mean over the lowest-k%
    * slice).
    */
  private def bigramLogProbRows(docs: DataFrame, idCol: String,
      textCol: String, model: DataFrame, addK: Double): DataFrame = {
    require(addK > 0, s"addK must be positive: $addK")
    // the model is parameter-bounded (modelSize + historySize rows), so
    // land it on the driver ONCE as a LocalRelation — otherwise its
    // build lineage (two corpus-wide topK aggregations when composed
    // inline) re-evaluates for the v probe and for EACH broadcast build
    val spark = model.sparkSession
    val slim = model.select(col("w1"), col("w2"), col("cnt"), col("v"))
    val rows = slim.collect()
    require(rows.nonEmpty,
      "bigram model is empty - build it from a non-empty corpus")
    val v = rows.head.getDouble(3)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), slim.schema)
    val c2 = local.filter(col("w2").isNotNull)
      .select(col("w1").as("__w1"), col("w2").as("__w2"),
        col("cnt").as("__c2"))
    val c1 = local.filter(col("w2").isNull)
      .select(col("w1").as("__w1"), col("cnt").as("__c1"))
    val p = (coalesce(col("__c2"), lit(0L)).cast("double") + lit(addK)) /
      (coalesce(col("__c1"), lit(0L)).cast("double") + lit(addK) * lit(v))
    bigramPairs(docs, idCol, textCol)
      .join(broadcast(c2), Seq("__w1", "__w2"), "left")
      .join(broadcast(c1), Seq("__w1"), "left")
      .select(col(idCol), col("__w1"), col("__w2"), log(p).as("__lp"))
  }

  /** Min-K% Prob membership signal (Shi et al. 2023, "Detecting
    * Pretraining Data from Large Language Models"): the mean logprob
    * of each document's k% LEAST likely token transitions under a
    * reference LM. A memorized document scores high even on its rarest
    * spans; an unseen one's tail stays improbable — the
    * benchmark-membership / contamination triage that mean-perplexity
    * ([[scoreWithBigramModel]]) washes out. The frozen [[bigramModel]]
    * artifact stands in for the production LM; the selection-and-mean
    * shape is the operator.
    *
    * Boundary: the slice is the ceil(k·n) lowest logprobs (at least
    * one). Ties at the boundary value are interchangeable — any
    * tie-break yields the same mean — and the (lp, w1, w2) ordering
    * keeps the selected set deterministic anyway.
    *
    * Scale: the rank window is per-document (bounded by document
    * length) over rows that never carry text; the fan-out is the same
    * bigramPairs explode every scoring face pays.
    */
  def minKProbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, kFrac: Double = 0.2,
      addK: Double = 0.5): DataFrame = {
    require(kFrac > 0 && kFrac <= 1, s"kFrac must be in (0,1]: $kFrac")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol))
    val rows = bigramLogProbRows(docs, idCol, textCol, model, addK)
      .withColumn("__rn", row_number().over(
        byDoc.orderBy(col("__lp"), col("__w1"), col("__w2"))))
      .withColumn("__n", count(lit(1)).over(byDoc))
    rows
      .filter(col("__rn") <=
        greatest(lit(1L), ceil(col("__n") * lit(kFrac))))
      .groupBy(col(idCol))
      .agg(max(col("__n")).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("mink_logprob"))
  }

  /** Compression-ratio quality signal per document — the zlib test the
    * big web-corpus pipelines run next to the repetition heuristics:
    * deflated_size / raw UTF-8 bytes. Template/boilerplate spam
    * deflates far below natural language (ratio → 0); random noise and
    * minified junk barely compress (ratio → 1). Natural text sits in a
    * band the caller calibrates on the corpus itself. One row per doc:
    * (id, n_bytes, n_deflated, compression_ratio), empty text → null
    * ratio. Pure per-row map over the native [[graft.functions.DeflatedSizeExpr]]
    * (codegen'd, no UDF), zero shuffle — at 100 TB this is exactly one
    * streaming pass. No SQL oracle can mirror zlib, so the gate over
    * this operator is rows-only; exact values are spec-pinned against
    * an in-JVM Deflater recomputation.
    */
  def compressionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bytes = octet_length(col(s"`$textCol`"))
    val packed = graft.functions.DeflatedSizeExpr
      .deflatedSize(col(s"`$textCol`"))
    df.select(col(s"`$idCol`"), bytes.as("n_bytes"),
        packed.as("n_deflated"),
        when(bytes === 0, lit(null).cast("double"))
          .otherwise(round(packed.cast("double") / bytes, 6))
          .as("compression_ratio"))
  }

  /** Banding stage of the compression-quality signal, factored apart
    * from the zlib measurement so it is SQL-mirrorable: takes a frame
    * that already carries raw and deflated byte counts (from
    * [[compressionSignals]], or read back from a prepared sizes
    * artifact) and emits the curation verdict — exact integer
    * parts-per-million ratio (`div`, never a rounded double: the
    * repo's exact-integer gate convention) and the band label
    * (`empty` / `template` / `natural` / `incompressible`). The zlib
    * values are the shared input; the banding math is what a SQL
    * oracle checks. Pure per-row Columns, zero shuffle.
    */
  def compressionBands(sized: DataFrame, idCol: String,
      bytesCol: String = "n_bytes", deflatedCol: String = "n_deflated",
      lowPpm: Long = 300000L, highPpm: Long = 700000L): DataFrame = {
    require(lowPpm < highPpm, s"lowPpm $lowPpm must be < highPpm $highPpm")
    val b = col(s"`$bytesCol`").cast("long")
    val d = col(s"`$deflatedCol`").cast("long")
    val ppm = when(b.isNull || b === 0, lit(null).cast("long"))
      .otherwise(expr(
        s"CAST(`$deflatedCol` AS BIGINT) * 1000000 DIV " +
          s"CAST(`$bytesCol` AS BIGINT)"))
    sized.select(col(s"`$idCol`"), b.as("n_bytes"), d.as("n_deflated"),
      ppm.as("ratio_ppm"),
      when(b.isNull || b === 0, lit("empty"))
        .when(ppm < lowPpm, lit("template"))
        .when(ppm <= highPpm, lit("natural"))
        .otherwise(lit("incompressible")).as("band"))
  }

  /** C4-style blocklist report: for every term on the list (single
    * tokens, matched against the lowercased whitespace tokenization),
    * how many documents contain it and how many times it occurs —
    * the numbers a curation team reads BEFORE deciding a filter's
    * blast radius. Terms with zero hits still get a row (0, 0): a
    * silent miss on a misspelled blocklist entry is exactly the bug
    * this report exists to surface.
    *
    * 100 TB shape: the token explode is pre-filtered by an `isin`
    * literal predicate (the blocklist is a plan literal, nothing
    * broadcasts), so only blocked-term hits ever shuffle — ONE
    * map-side-combinable (term) aggregation, then a left join from the
    * terms-sized literal frame for the zero rows.
    */
  def blocklistReport(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.distinct == terms, s"duplicate terms: $terms")
    val spark = docs.sparkSession
    import spark.implicits._
    val hits = graft.core.Spread(
        docs.select(col(s"`$idCol`"), col(s"`$textCol`")))
      .select(col(s"`$idCol`").as("__id"),
        explode(tokens(col(s"`$textCol`"))).as("__t"))
      .filter(col("__t").isin(terms.map(lit(_)): _*))
      .groupBy(col("__t").as("term"))
      .agg(countDistinct(col("__id")).as("__nd"),
        count(lit(1)).as("__no"))
    terms.toDF("term").join(hits, Seq("term"), "left")
      .select(col("term"),
        coalesce(col("__nd"), lit(0L)).as("n_docs"),
        coalesce(col("__no"), lit(0L)).as("n_occurrences"))
  }

  /** The filter face of [[blocklistReport]]: keep only documents whose
    * tokenization contains NONE of the blocked terms (C4's badwords
    * filter). A narrow per-row predicate — composes with whatever the
    * scan prunes, zero shuffle.
    */
  def blocklistFilter(docs: DataFrame, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    docs.filter(size(filter(tokens(col(s"`$textCol`")),
      t => t.isin(terms.map(lit(_)): _*))) === 0)
  }

  /** Domain mix of the URLs mentioned in a corpus — the web-pipeline
    * report behind domain allow/block-lists and source attribution:
    * extract every `http(s)://…` URL, reduce to its host, count
    * documents and URL occurrences per domain. The regexes are
    * deliberately RE2-simple (`https?://[^\s]+`, host =
    * `https?://([^/\s]+)`) so an external SQL engine reproduces the
    * extraction exactly.
    *
    * 100 TB shape: extraction is a codegen'd per-row regexp (zero
    * shuffle); only (id, domain) hit rows — sparse for natural text —
    * reach the ONE map-side-combinable domain aggregation.
    */
  def urlDomains(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val urls = regexp_extract_all(col(s"`$textCol`"),
      lit("https?://[^\\s]+"), lit(0))
    docs.select(col(s"`$idCol`").as("__id"), explode(urls).as("__u"))
      .select(col("__id"),
        regexp_extract(col("__u"), "https?://([^/\\s]+)", 1).as("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col("__id")).as("n_docs"),
        count(lit(1)).as("n_urls"))
  }

  /** Flesch reading-ease score per document, from three deterministic
    * text-level counts: words = whitespace tokens, sentences =
    * `[.!?]+` runs floored at 1, syllables = `[aeiouy]+` vowel groups
    * floored at the word count (every word carries at least one
    * syllable; the floor is applied at TEXT level — documented
    * heuristic, exactly reproducible in any regex engine). Score =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) in
    * that fixed association, round(…, 6); empty text → null. Standard
    * prose lands ~60-80, legalese under 30 — the classic
    * quality-feature companion to [[qualityFeatures]].
    *
    * 100 TB shape: pure per-row codegen'd regexp counts, zero shuffle.
    */
  def readabilityScores(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(col(s"`$textCol`"))
    val nWords = when(col(s"`$textCol`").isNull ||
      trim(col(s"`$textCol`")) === "", lit(0)).otherwise(size(toks))
    val nSent = greatest(
      regexp_count(col(s"`$textCol`"), lit("[.!?]+")), lit(1))
    val nSyll = greatest(
      regexp_count(lower(col(s"`$textCol`")), lit("[aeiouy]+")), nWords)
    df.select(col(s"`$idCol`"),
      nWords.cast("long").as("n_words"),
      nSent.cast("long").as("n_sentences"),
      nSyll.cast("long").as("n_syllables"),
      when(nWords === 0, lit(null).cast("double"))
        .otherwise(round(lit(206.835)
          - lit(1.015) * (nWords.cast("double") / nSent.cast("double"))
          - lit(84.6) * (nSyll.cast("double") / nWords.cast("double")), 6))
        .as("flesch"))
  }

  /** Gopher-style intra-document repetition signals — the quality filters
    * that catch boilerplate/templated/spammy documents
    * (dup-line fraction, duplicate-2-gram fraction, most-frequent-2-gram
    * mass):
    *
    *  - `n_lines`, `dup_line_fraction`: computed per row with pure array
    *    Columns (no shuffle);
    *  - the 2-gram stats go through explode → count per (doc, gram) →
    *    per-doc aggregate: two map-side-combinable shuffles of
    *    (id, 8-byte gram hash) rows, then one join back by id. A pure-
    *    Column per-row frequency count would be O(tokens²) interpreted
    *    lambda calls per document — fine for short docs, quadratic pain
    *    exactly where these filters matter (the long repetitive ones).
    *
    * All fractions round(…, 6) for cross-engine comparison.
    */
  def repetitionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val withLines = df
      .withColumn("n_lines", size(lines))
      .withColumn("dup_line_fraction",
        round(lit(1.0) - size(array_distinct(lines)).cast("double") /
          size(lines), 6))
    // 2-grams, NON-distinct (repetition is the signal here); tokens staged
    // in their own projection — Catalyst does not CSE through lambdas
    val grams = graft.core.Spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(transform(
          sequence(lit(0), greatest(size(col("__toks")) - 2, lit(0))),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(2)))))
          .as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__g"))
    val perGram = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val perDoc = perGram.groupBy(col(idCol))
      .agg(sum(col("__c")).as("__total"),
        count(lit(1)).as("__distinct"),
        max(col("__c")).as("__top"))
      .select(col(idCol),
        col("__total").as("n_2grams"),
        round(lit(1.0) - col("__distinct").cast("double") / col("__total"), 6)
          .as("dup_2gram_fraction"),
        round(col("__top").cast("double") / col("__total"), 6)
          .as("top_2gram_fraction"))
    withLines.join(perDoc, Seq(idCol))
  }

  /** CROSS-document boilerplate signals — the corpus-frequency complement
    * of [[repetitionSignals]] (which only sees one document at a time):
    * navigation chrome, license headers, and templated spam are n-grams
    * that recur across MANY documents, not necessarily within one. For
    * each document: how many of its distinct word `n`-grams occur in at
    * least `minDocs` distinct documents (document frequency, binary
    * containment per doc — same convention as
    * [[Decontaminate.overlaps]]). Output: one row per document holding
    * at least one shingle — (idCol, n_grams, n_common, common_fraction),
    * fractions round(…, 6).
    *
    * 100 TB shape: shingles travel as 8-byte native hashes
    * ([[Dedup.shingleHashDF]] — the oracle groups by the gram text,
    * counts are identical). The corpus is deliberately shingled twice
    * (once per consumer — the df side's exchange carries map-side-
    * COMBINED (hash, count) rows, ≈ the mapper's distinct grams, while
    * the probe side carries the exploded rows): recombining document
    * frequency via a hash equi-join keeps a hot gram as a one-build-row
    * AQE skew split. The tempting single-pass alternative — `count()
    * over (partition by hash)` on one exploded frame — pins each gram's
    * rows in ONE window task, and a boilerplate gram is BY DEFINITION in
    * millions of documents: the recompute is 2× tokenizer arithmetic,
    * the window is an unbounded straggler. No text column ever enters a
    * shuffle.
    */
  /** Top-k most frequent tokens per group — the "most common terms per
    * language/source" corpus report (vocabulary drift, tokenizer QA,
    * stopword candidates). Rank ties break on the token itself, so the
    * output is deterministic.
    *
    * 100 TB shape: the (group, token) counts aggregate FIRST with
    * map-side combine — the rank window's input is the per-group DISTINCT
    * vocabulary (the histogram), never the corpus rows (q78's
    * histogram-window argument: a group holding half the corpus
    * contributes its vocabulary size to one window partition, not its
    * row count). Token strings ride the shuffles, but only once per
    * (mapper, group, token).
    */
  def topTermsPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val counts = graft.core.Spread(docs.select(col(groupCol), col(textCol)))
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank", row_number().over(
        w.partitionBy(col(groupCol)).orderBy(col("n").desc, col("token"))))
      .filter(col("rank") <= k)
  }

  def boilerplateSignals(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDocs: Int = 5): DataFrame = {
    require(n > 0, s"shingle size must be positive: $n")
    require(minDocs > 0, s"minDocs must be positive: $minDocs")
    val exploded = Dedup.shingleHashDF(docs, idCol, textCol, n)
      .select(col("id"), explode(col("sh")).as("__h"))
    // per-doc-distinct rows (shingleHashDF deduplicates per doc), so a
    // plain count per hash IS the document frequency
    val dfTab = exploded.groupBy(col("__h"))
      .agg(count(lit(1)).as("__df"))
    exploded.join(dfTab, Seq("__h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("n_common"))
      .select(col("id").as(idCol), col("n_grams"), col("n_common"),
        round(col("n_common").cast("double") / col("n_grams"), 6)
          .as("common_fraction"))
  }

  /** Per-document top-`k` terms by TF-IDF — the keyword-extraction face
    * of the unigram stack (and the classic relevance weighting,
    * Spärck Jones 1972).
    *
    * The idf is the RATIONAL form N/df rather than log(N/df): the ranking
    * is identical (log is monotone) and the score stays a single division
    * of exact integers — tf·N is a BIGINT product, so the resulting
    * double is bit-identical across engines with no libm in the path.
    *
    * Scale shape: tf is one (doc, term) aggregation; df reuses the tf
    * frame (already one row per doc-term) with a map-side-combinable
    * count per term; N is a one-row aggregate broadcast back by the
    * 1-row join; the top-k filter is `row_number() ≤ k` over
    * (score desc, term) which WindowGroupLimit map-side prunes. Ties
    * break on the UNROUNDED score then term, so the emitted rank is
    * deterministic.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val tf = graft.core.Spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val nDocs = tf.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("__n"))
    val score = (col("tf") * col("__n")).cast("double") / col("__df")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(score.desc, col("term"))
    tf.join(dfTab, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"),
        round(score, 6).as("tfidf"), col("rank"))
  }

  /** Corpus-level collocation extraction: the top-`k` adjacent-token
    * pairs ranked by pointwise mutual information — the phrase-mining
    * primitive (multi-word expressions a tokenizer or vocab builder
    * should treat as units; Church & Hanks 1990).
    *
    * PMI = log[ P(w1,w2) / (P(w1)·P(w2)) ]; ranking by the RATIONAL
    * inside the log (n_ab·N²/(B·n_a·n_b), identical order, the q111
    * trick) keeps libm out of the cross-engine path — the score is pure
    * IEEE arithmetic on exact integer counts. `minCount` floors the pair
    * count, else hapax pairs (PMI maximal by construction) drown the
    * signal.
    *
    * Scale shape: bigrams are built map-side from each doc's token array
    * (slice + zip_with — no shuffle, no self-join on position); unigram
    * and bigram counts are map-side-combinable hash aggregations; the
    * count joins attach a VOCAB-sized side (post-aggregation) to the
    * minCount-filtered pair table; N and B are one-row broadcasts; the
    * final top-k is a TakeOrdered, never a global sort.
    */
  /** Vocabulary coverage curve: for each candidate vocab size V, the
    * fraction of all token OCCURRENCES covered by the top-V terms (by
    * frequency, ties by term) — the tokenizer/vocab-sizing question
    * ("does 32k buy materially more than 16k on THIS corpus?") answered
    * from the corpus itself.
    *
    * Scale shape: one token-count aggregation, then everything runs on
    * the HISTOGRAM OF FREQUENCIES (one row per distinct count value —
    * O(√total) under Zipf, thousands of rows for a trillion tokens),
    * never on the vocab-sized term list: no global top-V sort, no
    * vocab-sized window. The V cutoff lands inside a frequency class
    * whose members are interchangeable (same count), so
    * covered(V) = cumTokens(boundary) − (cumTerms(boundary) − V)·c —
    * exact for any tie-break, mirrored by the oracle's rank form.
    */
  /** Per-group vocabulary concentration: token count, distinct-type
    * count, type-token ratio, and the Simpson repeat probability
    * Σc(c−1)/(n(n−1)) — the chance two tokens drawn without
    * replacement are the same type. High Simpson + low TTR says the
    * group's text is template/boilerplate-heavy; a diverse corpus sits
    * low. The corpus-level diversity triage next to the per-document
    * [[repetitionSignals]]. Groups with fewer than 2 tokens report a
    * null simpson (no pair to draw).
    *
    * Exactness: every statistic is a round(…,6) quotient of exact
    * BIGINT counts (c(c−1) sums stay under 2^63 while every per-group
    * term count is below ~3e9 — shard groups beyond that).
    *
    * 100 TB shape: one explode into a map-side-combinable
    * (group, term) count; the three group statistics re-aggregate
    * that vocab-sized frame — no window, no join, two shuffles total.
    */
  def vocabConcentration(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val counts = graft.core.Spread(docs
        .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
        .select(col(groupCol), col(textCol)))
      .select(col(groupCol).as("__g"),
        explode(tokens(col(textCol))).as("__term"))
      .groupBy(col("__g"), col("__term")).agg(count(lit(1)).as("__c"))
    counts.groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - 1)).as("__rep"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        when(col("n_tokens") < 2, lit(null).cast("double"))
          .otherwise(round(col("__rep").cast("double") /
            (col("n_tokens").cast("double") * (col("n_tokens") - 1)), 6))
          .as("simpson"))
  }

  /** Per-group charset profile: total characters and the ASCII /
    * digit / space fractions — the encoding-QA glance ("is the zh
    * feed actually CJK, did a latin-1 mojibake batch land in en").
    * Ratios are corpus-weighted (sums of per-doc counts, then one
    * quotient), not averages of per-doc ratios, so a group's few huge
    * documents weigh what they cost. Null or empty groups report null
    * ratios.
    *
    * 100 TB shape: per-row regexp counts (codegen'd, no UDF) into one
    * map-side-combinable agg — groups-sized output, single shuffle.
    */
  def charsetProfile(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(keepClass: String): Column =
      length(regexp_replace(t, keepClass, ""))
    graft.core.Spread(docs.filter(col(groupCol).isNotNull && t.isNotNull)
        .select(col(groupCol), t))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(t)).as("n_chars"),
        sum(cnt("[^\\x00-\\x7F]")).as("n_ascii"),
        sum(cnt("[^0-9]")).as("n_digit"),
        sum(length(t) - length(regexp_replace(t, " ", ""))).as("n_space"))
      .select(col(groupCol), col("n_docs"), col("n_chars"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_ascii").cast("double") / col("n_chars"),
            6)).as("ascii_ratio"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_digit").cast("double") / col("n_chars"),
            6)).as("digit_ratio"),
        when(col("n_chars") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_space").cast("double") / col("n_chars"),
            6)).as("space_ratio"))
  }

  /** Vocabulary drift between two deliveries: terms that APPEARED (no
    * old occurrences, ≥ `minCount` new ones) or VANISHED (the reverse)
    * — the text-level drift watch next to the categorical (q130) and
    * numeric (q136) monitors: a burst of never-seen tokens is how
    * spam floods, encoding bugs, and benchmark contamination first
    * show up. Terms present on both sides are NOT reported (shift in
    * degree is the drift monitors' job; this one watches the
    * frontier). `minCount` suppresses hapax noise.
    *
    * 100 TB shape: two map-side-combinable term counts, then a
    * vocab-sized full-outer join on the term — data-sized work is the
    * two explodes only.
    */
  def vocabDiff(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      minCount: Long = 2): DataFrame = {
    require(minCount >= 1, s"minCount must be positive: $minCount")
    def counts(df: DataFrame, cnt: String): DataFrame =
      graft.core.Spread(df.filter(col(textCol).isNotNull)
          .select(col(textCol)))
        .select(explode(tokens(col(textCol))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(cnt))
    counts(oldDf, "n_old")
      .join(counts(newDf, "n_new"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
      .filter((col("n_old") === 0 && col("n_new") >= minCount) ||
        (col("n_new") === 0 && col("n_old") >= minCount))
      .select(col("term"), col("n_old"), col("n_new"),
        when(col("n_old") === 0, lit("appeared")).otherwise(lit("vanished"))
          .as("status"))
  }

  def vocabCoverage(docs: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty, "sizes must be non-empty")
    require(sizes.forall(_ >= 1), s"sizes must be positive: $sizes")
    require(sizes.distinct.size == sizes.size, s"duplicate sizes: $sizes")
    import org.apache.spark.sql.expressions.Window
    val counts = graft.core.Spread(docs.select(col(textCol)))
      .select(explode(tokens(col(textCol))).as("__term"))
      .groupBy(col("__term")).agg(count(lit(1)).as("__c"))
    val classes = counts.groupBy(col("__c"))
      .agg(count(lit(1)).as("__t"))
    // frequency-class running totals: the window input is the count
    // HISTOGRAM (distinct frequency values), not the vocab
    val w = Window.orderBy(col("__c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = classes
      .withColumn("__cumT", sum(col("__t")).over(w))
      .withColumn("__cumTok", sum(col("__c") * col("__t")).over(w))
    val tot = cum.agg(max(col("__cumT")).as("__vocab"),
      max(col("__cumTok")).as("__n"))
    val sizesDf = docs.sparkSession.range(1)
      .select(explode(array(sizes.map(lit): _*)).as("vocab_size"))
    // boundary class per size = the first class reaching V terms;
    // a V beyond the vocab keeps no boundary and covers everything
    val bound = sizesDf.crossJoin(cum)
      .filter(col("__cumT") >= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(min_by(
        struct(col("__c"), col("__cumT"), col("__cumTok")),
        col("__cumT")).as("__b"))
    val covered = coalesce(
      col("__b.__cumTok") -
        (col("__b.__cumT") - col("vocab_size")) * col("__b.__c"),
      col("__n"))
    sizesDf.join(bound, Seq("vocab_size"), "left")
      .crossJoin(broadcast(tot))
      .select(col("vocab_size"), covered.as("covered"),
        (covered.cast("double") / col("__n")).as("coverage"))
  }

  /** Corpus-mixture report: per group the document and TOKEN counts,
    * both shares, and the cumulative token share in descending
    * token-mass order — "what is my pretraining mixture actually made
    * of" in one table (doc counts lie when lengths differ by group;
    * the token column is the one a budget planner reads). Ties in
    * token mass order by group name for a deterministic cumulative.
    *
    * Exactness: counts and token sums are exact BIGINTs; shares and
    * the cumulative are single IEEE quotients over them, round(…, 6).
    *
    * 100 TB shape: per-row token counts fold into one
    * map-side-combinable agg (groups-sized output); totals re-aggregate
    * that frame and broadcast back; the cumulative window runs over the
    * GROUPS frame.
    */
  def mixtureReport(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = graft.core.Spread(docs
        .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
        .select(col(groupCol), col(textCol)))
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val tot = g.agg(sum(col("n_docs")).as("__td"),
      sum(col("n_tokens")).as("__tt"))
    val w = Window.orderBy(col("n_tokens").desc, col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("__cum", sum(col("n_tokens")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("__g").as(groupCol), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("__td"), 6)
          .as("doc_share"),
        round(col("n_tokens").cast("double") / col("__tt"), 6)
          .as("token_share"),
        round(col("__cum").cast("double") / col("__tt"), 6)
          .as("cum_token_share"))
  }

  /** Zipf-slope fit over the top-`topK` term frequencies: the ordinary
    * least-squares slope of ln(freq) on ln(rank) — a healthy natural
    * corpus sits near −1; a flat slope means template spam, a cliff
    * means a tiny synthetic vocabulary. One output row:
    * (n_terms, slope, intercept). Ranks are 1-based by (freq desc,
    * term) so the fit is deterministic under frequency ties.
    *
    * Determinism: the four OLS sums (Σx, Σy, Σxy, Σx²) are float sums
    * over the topK frame, so each is collected, sorted by rank, and
    * LEFT-FOLDED in that fixed order (the q133/q149 discipline);
    * intercept reuses the slope value, and the oracle repeats the same
    * trees textually. Fewer than 2 terms → null slope/intercept.
    *
    * 100 TB shape: one map-side-combinable term count; the sort+limit
    * runs over the vocab frame (O(√total) distinct terms under Zipf),
    * and everything after lives on ≤ topK rows.
    */
  def zipfSlope(docs: DataFrame, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"topK must be at least 2: $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = graft.core.Spread(
        docs.filter(col(textCol).isNotNull).select(col(textCol)))
      .select(explode(tokens(col(textCol))).as("__term"))
      .groupBy(col("__term")).agg(count(lit(1)).as("__freq"))
    // the unpartitioned rank window runs AFTER the limit — topK rows
    val top = counts.orderBy(col("__freq").desc, col("__term")).limit(topK)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__freq").desc, col("__term"))))
    def fold(v: Column, name: String): Column = aggregate(
      sort_array(collect_list(struct(col("__rank"), v.as("__v")))),
      lit(0.0), (acc, s) => acc + s.getField("__v")).as(name)
    val x = log(col("__rank").cast("double"))
    val y = log(col("__freq").cast("double"))
    val f = top.agg(count(lit(1)).as("n_terms"),
      fold(x, "__sx"), fold(y, "__sy"),
      fold(x * y, "__sxy"), fold(x * x, "__sxx"))
    val kD = col("n_terms").cast("double")
    val den = kD * col("__sxx") - col("__sx") * col("__sx")
    val slope = (kD * col("__sxy") - col("__sx") * col("__sy")) / den
    f.select(col("n_terms"),
      when(col("n_terms") < 2, lit(null).cast("double"))
        .otherwise(round(slope, 6)).as("slope"),
      when(col("n_terms") < 2, lit(null).cast("double"))
        .otherwise(round((col("__sy") - slope * col("__sx")) / kD, 6))
        .as("intercept"))
  }

  def collocations(docs: DataFrame, textCol: String, minCount: Long = 3,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(minCount >= 1, s"minCount must be positive: $minCount")
    val toks = graft.core.Spread(docs.select(col(textCol)))
      .select(tokens(col(textCol)).as("__t"))
    val bi = toks.filter(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pairCounts = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val totals = uni.agg(sum(col("__c")).as("__n")).crossJoin(
      bi.agg(count(lit(1)).as("__b")))
    // left-assoc double chain mirrored verbatim in the oracle SQL: each
    // step is one IEEE op on exact integer inputs, so bit-identical
    val ratio = col("pair_count").cast("double") * col("__n") *
      col("__n") / col("__b") / col("__c1") / col("__c2")
    pairCounts
      .join(uni.select(col("w").as("w1"), col("__c").as("__c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__c").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .orderBy(ratio.desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("pair_count"),
        round(ratio, 6).as("pmi_ratio"))
  }

  /** Gopher's stopword-rule word list (Rae et al. 2021, arXiv:
    * 2112.11446 §A1.1): a document should contain at least
    * `minStopwords` occurrences of these.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule report (Rae et al. 2021, arXiv:2112.11446
    * §A1.1) — the named heuristic ruleset of large-corpus curation,
    * re-expressed as pure Columns (zero shuffle, one map pass): per
    * document the measured signals and one boolean per rule, plus the
    * conjunction `pass`:
    *
    *  - word count within [minWords, maxWords];
    *  - mean word length within [minMeanLen, maxMeanLen];
    *  - symbol-to-word ratio (`#` and `...`) at most maxSymbolRatio;
    *  - at least minAlphaRatio of words containing a letter;
    *  - at least minStopwords occurrences of [[gopherStopwords]].
    *
    * Ratios round to 6 decimals; the FLAGS compare the unrounded
    * values (a rule is a semantics boundary, not a display artifact).
    */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks).cast("double")
    val meanLen = aggregate(transform(toks, t => length(t)),
      lit(0L), (acc, x) => acc + x).cast("double") / n
    val hashes = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val ellipses = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val symbolRatio = (hashes + ellipses).cast("double") / n
    val alphaRatio =
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n
    val nStop = size(filter(toks,
      t => t.isin(gopherStopwords.map(lit(_)): _*)))
    df.select(col(idCol),
        size(toks).cast("long").as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(symbolRatio, 6).as("symbol_ratio"),
        round(alphaRatio, 6).as("alpha_word_ratio"),
        nStop.cast("long").as("n_stopwords"),
        (size(toks) >= minWords && size(toks) <= maxWords)
          .as("word_count_ok"),
        (meanLen >= minMeanLen && meanLen <= maxMeanLen)
          .as("mean_len_ok"),
        (symbolRatio <= maxSymbolRatio).as("symbol_ok"),
        (alphaRatio >= minAlphaRatio).as("alpha_ok"),
        (nStop >= minStopwords).as("stopword_ok"))
      .withColumn("pass",
        col("word_count_ok") && col("mean_len_ok") && col("symbol_ok") &&
          col("alpha_ok") && col("stopword_ok"))
  }

  /** The filtering face of [[gopherFlags]]: documents passing every
    * rule, original columns intact.
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame =
    df.join(
      gopherFlags(df, idCol, textCol, minWords, maxWords, minMeanLen,
        maxMeanLen, maxSymbolRatio, minAlphaRatio, minStopwords)
        .filter(col("pass")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Canonical URL normalization — the dedup key for URL-level corpus
    * dedup (a crawl corpus carries the same page as `HTTP://WWW.X.COM/a/`,
    * `http://x.com/a?utm_source=feed`, `http://x.com:80/a#top`, …):
    * fragment stripped, scheme and host lowercased, leading `www.`
    * dropped, default port (`:80` http / `:443` https) dropped, tracking
    * params (`utm_*`, `gclid`, `fbclid`) removed with separators tidied,
    * trailing slashes stripped. Pure regexp Columns (codegen'd, zero
    * shuffle); path case is PRESERVED (paths are case-sensitive). A value
    * with no `scheme://` is not a URL — canonicalizes to null.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val noWww = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?]+)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val pathq = regexp_extract(noFrag, "^[A-Za-z]+://[^/?]+(.*)$", 1)
    // anchored to a [?&] separator (kept via $1): a param whose NAME
    // merely contains a tracking token (`?notgclid=5`) must survive —
    // unanchored, distinct URLs collapse to one canonical key
    val noTrack = regexp_replace(pathq,
      "([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&]*", "$1")
    val tidy = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host,
        regexp_replace(tidy, "/+$", "")))
  }

  /** URL-level dedup report: rows grouped by [[canonicalUrl]] — total
    * raw occurrences, distinct surface variants, and the min id as the
    * group survivor. One hash-aggregate shuffle on the canonical string.
    */
  def canonicalUrlReport(df: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    df.select(col(s"`$idCol`").as("__id"), col(s"`$urlCol`").as("__url"))
      .withColumn("canonical_url", canonicalUrl(col("__url")))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__url")).as("n_variants"),
        min(col("__id")).as("first_id"))

  /** Deterministic token-dropout augmentation — the contrastive /
    * denoising training-data staple (drop ~`rate` of each document's
    * tokens, reassemble): position p of doc d survives iff
    * `md5_60("{seed}_{d}_{p}") mod 1000 >= rate·1000`, the
    * [[graft.functions.PortableHash]] convention, so the augmentation is
    * REPLAYABLE (same seed → same corpus, a different seed → an
    * independent draw) and oracle-mirrorable — no RNG state, no
    * driver-side sampling, a pure per-row Column program with zero
    * shuffle. Positions are 1-based (DuckDB's list_filter index
    * convention). Original token case/order preserved; output text is
    * single-space rejoined. Returns (id, text_aug, n_tokens, n_kept).
    */
  def augmentTokenDropout(docs: DataFrame, idCol: String, textCol: String,
      rate: Double, seed: String): DataFrame = {
    require(rate >= 0.0 && rate < 1.0, s"rate must be in [0, 1): $rate")
    val cut = math.round(rate * 1000).toInt
    val keepTok = docs
      .select(col(s"`$idCol`").as("id"),
        split(trim(col(s"`$textCol`")), "\\s+").as("__toks"))
      .select(col("id"), col("__toks"),
        filter(col("__toks"), (_, i) =>
          conv(substring(md5(concat_ws("_",
            lit(seed), col("id"), i + 1)), 1, 15), 16, 10)
            .cast("long") % 1000 >= cut).as("__kept"))
    keepTok.select(col("id").as(idCol),
      concat_ws(" ", col("__kept")).as("text_aug"),
      size(col("__toks")).as("n_tokens"),
      size(col("__kept")).as("n_kept"))
  }

  /** Deterministic span-mask augmentation (the T5 denoising objective's
    * data shape): tokens are cut into fixed blocks of `blockSize`; block
    * b of doc d is masked iff `md5_60("{seed}_m_{d}_{b}") mod 1000 <
    * rate·1000` (the "_m_" marker keeps the draw independent of
    * [[augmentTokenDropout]]'s positional draw under a shared seed); a
    * masked block's tokens are replaced by ONE `<extra_id_b>` sentinel
    * (the block index — deterministic, unlike T5's sequential numbering,
    * so the mask is positionally replayable). Same replayability and
    * oracle story as dropout: no RNG state, pure per-row Columns, zero
    * shuffle. Output: (id, text_masked, n_tokens, n_masked).
    */
  def augmentSpanMask(docs: DataFrame, idCol: String, textCol: String,
      rate: Double, blockSize: Int, seed: String): DataFrame = {
    require(rate >= 0.0 && rate < 1.0, s"rate must be in [0, 1): $rate")
    require(blockSize >= 1, s"blockSize must be >= 1: $blockSize")
    val cut = math.round(rate * 1000).toInt
    def blockOf(i0: Column): Column =
      floor(i0.cast("double") / blockSize).cast("long")
    def maskedBlock(i0: Column): Column =
      conv(substring(md5(concat_ws("_",
        lit(seed), lit("m"), col("id"), blockOf(i0))), 1, 15), 16, 10)
        .cast("long") % 1000 < cut
    val staged = docs.select(col(s"`$idCol`").as("id"),
      split(trim(col(s"`$textCol`")), "\\s+").as("__toks"))
    val mapped = staged.select(col("id"), col("__toks"),
      transform(col("__toks"), (t, i0) =>
        when(!maskedBlock(i0), t)
          .when(i0 % blockSize === 0,
            concat(lit("<extra_id_"), blockOf(i0), lit(">")))
          .otherwise(lit(""))).as("__m"),
      size(filter(col("__toks"), (_, i0) => maskedBlock(i0)))
        .as("n_masked"))
    mapped.select(col("id").as(idCol),
      concat_ws(" ", filter(col("__m"), t => t =!= "")).as("text_masked"),
      size(col("__toks")).as("n_tokens"), col("n_masked"))
  }

  /** Homoglyph (Unicode confusable) characters this normalizer folds to
    * their Latin look-alikes — the common Cyrillic and Greek letters
    * spam/evasion text swaps in so that "pаypal" (Cyrillic а) slips past
    * an exact blocklist. Paired `from`/`to` strings for `translate`.
    */
  val homoglyphFrom: String =
    "аеорсухі" + "АВЕКМНОРСТХІ" + "οα" // Cyrillic lc/uc + Greek ο α
  val homoglyphTo: String =
    "aeopcyxi" + "ABEKMHOPCTXI" + "oa"

  /** Fold Unicode homoglyphs onto their Latin look-alikes ahead of
    * blocklist/dedup hashing — character-for-character `translate`
    * (codegen'd, zero shuffle), NOT a general Unicode confusable table
    * (that's a locale decision); extend the paired strings for more.
    */
  def normalizeHomoglyphs(text: Column): Column =
    translate(text, homoglyphFrom, homoglyphTo)

  /** Count of homoglyph characters present — the evasion signal (a
    * natural-language doc whose Latin text hides Cyrillic look-alikes is
    * doing it on purpose): length minus length-after-deletion.
    */
  def homoglyphCount(text: Column): Column =
    length(text) - length(translate(text, homoglyphFrom, ""))

  /** Contiguous n-gram MULTISET of the token sequence (duplicates kept,
    * unlike [[graft.operators.Dedup.shinglesFromTokens]]'s distinct set):
    * ROUGE counts clipped per-gram occurrences, so a gram appearing twice
    * in both texts contributes two matches. Rows shorter than n yield an
    * EMPTY array (no truncated tail gram — a 1-token text has zero
    * bigrams).
    */
  private def allGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** ROUGE-n overlap between a candidate and a reference text per row
    * (Lin 2004): clipped n-gram multiset matches, precision = matches /
    * candidate grams, recall = matches / reference grams, F1 harmonic —
    * the summarization/distillation eval staple (and a cheap
    * transcription-vs-source fidelity check for synthetic training data).
    *
    * Shape: per-pair n-gram counts via explode → groupBy (id, gram-hash)
    * with map-side combine, one equi-join of the two count tables on the
    * same key, and a final per-id sum — every shuffle key is fixed-width
    * (xxhash64 of the gram, the [[graft.operators.Dedup.shingleHashDF]]
    * trick: counts per hash equal counts per gram up to ~2^-64
    * collisions, and the gram strings themselves never move). Pairs with
    * zero overlap survive via the totals left join; empty-gram sides
    * score 0, not NaN.
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val grams = pairs.select(col(idCol).as("id"),
        tokens(col(candCol)).as("__ct"), tokens(col(refCol)).as("__rt"))
      .select(col("id"), allGrams(col("__ct"), n).as("cg"),
        allGrams(col("__rt"), n).as("rg"))
    def counts(gramCol: String, cntName: String): DataFrame =
      grams.select(col("id"), explode(col(gramCol)).as("g"))
        .groupBy(col("id"), xxhash64(col("g")).as("h"))
        .agg(count(lit(1)).as(cntName))
    val matches = counts("cg", "__cc")
      .join(counts("rg", "__rc"), Seq("id", "h"))
      .groupBy("id")
      .agg(sum(least(col("__cc"), col("__rc"))).as("match_count"))
    val totals = grams.select(col("id"), size(col("cg")).as("cand_total"),
      size(col("rg")).as("ref_total"))
    val p = col("match_count").cast("double") / col("cand_total")
    val r = col("match_count").cast("double") / col("ref_total")
    totals.join(matches, Seq("id"), "left")
      .na.fill(0L, Seq("match_count"))
      .withColumn("precision",
        round(when(col("cand_total") > 0, p).otherwise(lit(0.0)), 6))
      .withColumn("recall",
        round(when(col("ref_total") > 0, r).otherwise(lit(0.0)), 6))
      .withColumn("f1", round(
        when(col("match_count") > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), 6))
      .select(col("id").as(idCol), col("match_count"), col("cand_total"),
        col("ref_total"), col("precision"), col("recall"), col("f1"))
  }
}
