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

/** Gates: profiling, drift, distribution QA. */
object StatsGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // profiling: robust per-lang length scale — median + MAD via two
    // histogram-quantile passes (a 100k-char outlier can't inflate it)
    "q173_mad_per_group" -> ((s, dir) => {
      Sampling.madPerGroup(t(s, dir, "documents"), "lang", "n_chars")
    }),

    // profiling: length-decile calibration — mean token count per
    // n_chars decile ("does char length actually track token count")
    "q174_score_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.scoreBucketsReport(docs, "n_chars", "n_tokens",
        nBuckets = 10)
    }),

    // curation: per-language quantile-band length filter — keep docs whose
    // n_chars percent_rank within their language lies in [0.1, 0.9] (trim
    // both distribution tails). The operator's window runs over the
    // per-(lang, n_chars) histogram, never the raw rows
    "q78_quantile_band" -> ((s, dir) => {
      Sampling.filterByQuantileBand(t(s, dir, "documents"), "lang",
          "n_chars", lo = 0.1, hi = 0.9)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // behavioral analytics: market-basket association rules over
    // user-level event-type baskets — support/confidence/lift per
    // directed rule; pair product keyed on the user, never cross-user
    "q131_association_rules" -> ((s, dir) => {
      Funnel.associationRules(t(s, dir, "events"), "user_id",
        "event_type", minPairUsers = 2)
    }),

    // profiling: pairwise Pearson correlation of the doc-feature trio
    // (chars, tokens, punct) — one scan, map-combinable moment sums,
    // pair fan-out on the single agg row
    "q132_feature_corr" -> ((s, dir) => {
      val f = t(s, dir, "documents").select(
        col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^.,;:!?]", ""))
          .cast("long").as("n_punct"))
      Stats.corrPairs(f, Seq("n_chars", "n_tokens", "n_punct"))
    }),

    // profiling: lang x source independence — χ² + Cramér's V, the float
    // sum made run-deterministic by a sorted left-fold over the cells
    "q133_contingency" -> ((s, dir) => {
      Stats.contingencyAssociation(t(s, dir, "documents"), "lang", "source")
    }),

    // profiling: lang x source information profile — entropies, mutual
    // information, and normalized MI (the "how redundant are these two
    // labels" score) via the q133 sorted-fold float discipline
    "q149_mutual_info" -> ((s, dir) => {
      Stats.mutualInformation(t(s, dir, "documents"), "lang", "source")
    }),

    // curation: corpus-mixture report — per lang the doc/token counts,
    // shares, and cumulative token share in token-mass order
    "q162_mixture_report" -> ((s, dir) => {
      TextAnalysis.mixtureReport(t(s, dir, "documents"), "lang", "text")
    }),

    // profiling: per-lang doc-length histogram at 100-char bins — the
    // distribution SHAPE next to the quantile machinery
    "q163_length_histogram" -> ((s, dir) => {
      Stats.groupedHistogram(t(s, dir, "documents"), "lang", "n_chars",
        binWidth = 100)
    }),

    // profiling: top-3 sources per lang by doc count — the mode report
    // with deterministic (count desc, value) ranking
    "q166_top_values" -> ((s, dir) => {
      Stats.topValuesPerGroup(t(s, dir, "documents"), "lang", "source",
        k = 3)
    }),

    // profiling: does length track token count per lang — q132's exact
    // moment tree sliced by group
    "q167_corr_per_group" -> ((s, dir) => {
      val f = t(s, dir, "documents").select(col("lang"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Stats.corrPerGroup(f, "lang", "n_chars", "n_tokens")
    }),

    // monitoring: KS distance between the even- and odd-id halves'
    // length distributions — the bin-free single-number drift score
    "q168_ks_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Stats.ksDistance(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars")
    }),

    // abuse QA: event-mass concentration across users — a Gini near 1
    // says a handful of bots own the stream (q148's operator pointed at
    // the behavioral table)
    "q169_user_gini" -> ((s, dir) => {
      Stats.giniConcentration(t(s, dir, "events"), "user_id")
    }),

    // abuse QA: the Lorenz curve behind q169's Gini — cumulative user
    // and event shares per distinct activity level
    "q175_lorenz_curve" -> ((s, dir) => {
      Stats.lorenzCurve(t(s, dir, "events"), "user_id")
    }),

    // behavioral: inter-event gap histogram per event type — whole-second
    // gaps in 60s bins (the think-time SHAPE next to q126's quantiles)
    "q170_gap_histogram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = t(s, dir, "events")
        .withColumn("__pts", lag(col("ts"), 1).over(w))
        .filter(col("__pts").isNotNull)
        .select(col("event_type"),
          floor((unix_micros(col("ts")) - unix_micros(col("__pts")))
            / 1000000).cast("long").as("gap_s"))
      Stats.groupedHistogram(gaps, "event_type", "gap_s", binWidth = 60)
    }),

    // monitoring: daily-volume anomaly flags — each day's event count
    // z-scored against all days, |z| >= 2 flagged
    "q138_daily_anomaly" -> ((s, dir) => {
      Stats.volumeAnomalies(t(s, dir, "events"), "ts", zThreshold = 2.0)
    }),

    // profiling: does source determine lang — per source the distinct
    // lang count, dominant lang (ties to smallest), and its share
    "q139_func_dependency" -> ((s, dir) => {
      Stats.functionalDependency(t(s, dir, "documents"), "source", "lang")
    }),

    // profiling: source concentration — Gini of docs across sources
    // (0 = even corpus, ->1 = one crawl wearing many labels)
    "q148_source_gini" -> ((s, dir) => {
      Stats.giniConcentration(t(s, dir, "documents"), "source")
    }),

    // curation: token-weighted length quantiles per language — the doc
    // length below which half the TOKEN MASS lives (a budget planner's
    // median, not the doc-count median)
    "q146_weighted_quantiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.weightedQuantilesPerGroup(docs, "lang", "n_chars",
        "n_tokens", ps = Seq(0.5, 0.9))
    }),

    // text QA: per-language charset profile — corpus-weighted ascii /
    // digit / space fractions (is the zh feed actually CJK)
    "q145_charset_profile" -> ((s, dir) => {
      TextAnalysis.charsetProfile(t(s, dir, "documents"), "lang", "text")
    }),

    // text: per-source vocabulary concentration — TTR + Simpson repeat
    // probability; high simpson/low ttr = template-heavy source
    "q142_vocab_concentration" -> ((s, dir) => {
      TextAnalysis.vocabConcentration(t(s, dir, "documents"),
        "source", "text")
    }),

    // monitoring: per-type daily anomaly — each event type's days
    // z-scored against that type's own history ("which feed broke")
    "q141_anomaly_per_type" -> ((s, dir) => {
      Stats.volumeAnomaliesPerGroup(t(s, dir, "events"), "ts",
        "event_type", zThreshold = 2.0)
    }),

    // data QA: column-profile report — null rates + exact distinct
    // counts per column, the first table of any data review
    "q176_column_profile" -> ((s, dir) => {
      graft.operators.Checks.columnProfile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
    }),

    // embedding QA: per-label null/zero-vector counts, dimensionality
    // range, and L2-norm range — the sanity report before any
    // similarity pass trusts the column
    "q153_norm_stats" -> ((s, dir) => {
      Similarity.embeddingNormStats(t(s, dir, "embeddings"),
        "embedding", "label")
    }),

    // monitoring: numeric drift — n_chars distribution of the even-id
    // half vs the odd-id half over fixed [0,500)x10 bins + overflow
    "q136_numeric_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Reconcile.numericDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars",
        lo = 0L, hi = 500L, nBins = 10)
    }),

    // curation: cross-source score calibration — each doc's n_chars
    // replaced by the global value at its within-source percent rank
    "q135_quantile_norm" -> ((s, dir) => {
      Sampling.quantileNormalize(t(s, dir, "documents"), "source", "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("n_chars_qn"))
    }),

    // monitoring: categorical drift — the event-type mix of the odd-id
    // half vs the even-id half, per-value chi-square contributions
    "q130_category_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Reconcile.categoryDrift(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), "event_type")
    }),

    // cleaning: per-language winsorization — doc length clipped into the
    // [p05, p95] exact quantile band (clamp, don't drop); bounds off the
    // q116 histogram machinery, clamp is a narrow broadcast-join map
    "q123_winsorize" -> ((s, dir) => {
      Sampling.winsorizePerGroup(t(s, dir, "documents"), "lang",
          "n_chars", pLo = 0.05, pHi = 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("n_chars_w"))
    }),

    // analytics: full quantile summary per group in ONE histogram pass —
    // p25/p50/p75/p95 of doc length per language; the p fan-out explodes
    // the cumulated histogram (distinct scores), never the raw rows
    "q116_quantile_summary" -> ((s, dir) => {
      Sampling.quantilesPerGroup(t(s, dir, "documents"), "lang",
        "n_chars", Seq(0.25, 0.5, 0.75, 0.95))
    }),

    // validation: declarative quality checks — all row-level rules fold
    // into ONE aggregation pass; uniqueness is a keys-only hash agg;
    // the FK check is a left-anti join vs distinct dim keys. The tight
    // l_discount band is deliberately violated so the gate pins a
    // passed=false row alongside the green ones
    "q112_quality_checks" -> ((s, dir) => {
      Checks.run(t(s, dir, "lineitem"), Seq(
        Checks.notNull("l_orderkey"),
        Checks.inRange("l_quantity", 1, 50),
        Checks.inRange("l_discount", 0.0, 0.05),
        Checks.matches("l_returnflag", "^[ARN]$"),
        Checks.unique("l_orderkey", "l_linenumber"),
        Checks.referential("l_orderkey", t(s, dir, "orders"),
          "o_orderkey")))
    }),

    // functions: feature hashing — raw text folds into fixed-dim count
    // vectors in one native loop (the doc → vector step feeding the
    // similarity stack, no model, no vocab table); md5 bucketing mirrors
    // in DuckDB, counts are exact ints — the gate emits the nonzero
    // (dim, count) pairs
    "q107_feature_hash" -> ((s, dir) => {
      val vecs = t(s, dir, "documents")
        .select(col("doc_id"), Dedup.tokens(col("text")).as("__tk"))
        .select(col("doc_id"),
          graft.functions.FeatureHashExpr.featureHash(col("__tk"), 64)
            .as("v"))
      vecs.select(col("doc_id"),
          posexplode(col("v")).as(Seq("dim", "value")))
        .filter(col("value") =!= 0)
        .select(col("doc_id"), col("dim"),
          col("value").cast("long").as("count"))
    }),

    // analytics: per-group standardization (z-score) from EXACT integer
    // moments — count/sum/sum-of-squares are BIGINT-exact, so the double
    // arithmetic is the same expression tree in both engines and the
    // z-scores hash-match at round 6; stats broadcast, corpus unshuffled
    "q99_zscore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s1"),
          sum(col("n_chars") * col("n_chars")).as("s2"))
      docs.join(broadcast(stats), Seq("lang"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("variance",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n")) /
            (col("n") - 1))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round((col("n_chars") - col("mean")) / sqrt(col("variance")), 6)
            .as("z"))
    }),

    // plan hygiene: join-key skew report — max/p50/p99 of the user_id
    // group sizes; the measured saltFactor input for q68's SkewJoin
    "q189_key_skew" -> ((s, dir) => {
      Stats.keySkewReport(t(s, dir, "events"), "user_id")
    }),

    // reporting: the dataset card — exact one-table corpus summary
    // (docs, tokens, source mix, dup rate) published beside the data
    "q221_dataset_card" -> ((s, dir) => {
      DatasetCard.report(t(s, dir, "documents"), "doc_id", "text",
        "source")
    }),

    // reporting: per-source dataset cards (the mixture-monitoring face)
    "q230_source_cards" -> ((s, dir) => {
      DatasetCard.reportPerGroup(t(s, dir, "documents"), "doc_id",
        "text", "source")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // mirrors q173: q101's type-1 rule twice, the median frame joined
    // back for the deviation histogram
    "q173_mad_per_group" ->
      """WITH d AS (
        |  SELECT lang, n_chars FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
        |h AS (SELECT lang, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |cum AS (
        |  SELECT h.lang, n_chars, n,
        |    sum(c) OVER (PARTITION BY h.lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h JOIN t USING (lang)),
        |med AS (
        |  SELECT lang, min(n_chars) AS median, CAST(min(n) AS BIGINT) AS n
        |  FROM cum WHERE cm >= ceil(0.5 * n) GROUP BY lang),
        |dev AS (
        |  SELECT d.lang, abs(d.n_chars - med.median) AS dv
        |  FROM d JOIN med USING (lang)),
        |h2 AS (SELECT lang, dv, count(*) AS c FROM dev GROUP BY 1, 2),
        |cum2 AS (
        |  SELECT h2.lang, dv, med.n,
        |    sum(c) OVER (PARTITION BY h2.lang ORDER BY dv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h2 JOIN med USING (lang)),
        |mad AS (
        |  SELECT lang, min(dv) AS mad FROM cum2
        |  WHERE cm >= ceil(0.5 * n) GROUP BY lang)
        |SELECT med.lang, med.n, med.median, mad.mad
        |FROM med JOIN mad USING (lang)""".stripMargin,

    // mirrors q174: type-1 decile thresholds from the cumulated score
    // histogram, bucket = 1 + count of thresholds strictly below
    "q174_score_buckets" ->
      """WITH d AS (
        |  SELECT n_chars AS s,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS m
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT s, count(*) AS c FROM d GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |cum AS (
        |  SELECT s, n, sum(c) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h CROSS JOIN t),
        |th AS (
        |  SELECT p, min(s) AS q
        |  FROM cum CROSS JOIN (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5,
        |    0.6, 0.7, 0.8, 0.9]) AS p)
        |  WHERE cm >= ceil(p * n) GROUP BY p),
        |b AS (
        |  SELECT d.s, d.m,
        |    1 + (SELECT CAST(count(*) AS INTEGER) FROM th
        |         WHERE d.s > th.q) AS bucket
        |  FROM d)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(s) AS score_min, max(s) AS score_max,
        |  round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mean_stat
        |FROM b GROUP BY bucket""".stripMargin,

    // mirrors Sampling.filterByQuantileBand: the operator's histogram
    // construction reproduces percent_rank exactly (rank ties share a
    // rank; pr = (rank-1)/(n-1); both engines divide the same integers)
    "q78_quantile_band" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |QUALIFY percent_rank() OVER (
        |  PARTITION BY lang ORDER BY n_chars) BETWEEN 0.1 AND 0.9"""
        .stripMargin,

    // mirrors q131: baskets = distinct (user, type); both directions of
    // each unordered pair; metrics are left-assoc quotients of BIGINTs
    "q131_association_rules" ->
      """WITH it AS (
        |  SELECT DISTINCT user_id AS u, event_type AS item FROM events),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM it
        |  GROUP BY 1),
        |nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu FROM it),
        |pc AS (
        |  SELECT a.item AS ia, b.item AS ib,
        |    CAST(count(*) AS BIGINT) AS pair_users
        |  FROM it a JOIN it b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (
        |  SELECT ia AS antecedent, ib AS consequent, pair_users FROM pc
        |  UNION ALL
        |  SELECT ib, ia, pair_users FROM pc)
        |SELECT r.antecedent, r.consequent, r.pair_users,
        |  ca.n AS n_antecedent, cc.n AS n_consequent,
        |  round(CAST(r.pair_users AS DOUBLE) / nu.nu, 6) AS support,
        |  round(CAST(r.pair_users AS DOUBLE) / ca.n, 6) AS confidence,
        |  round(CAST(r.pair_users AS DOUBLE) * nu.nu / ca.n / cc.n, 6)
        |    AS lift
        |FROM r JOIN ic ca ON ca.item = r.antecedent
        |  JOIN ic cc ON cc.item = r.consequent CROSS JOIN nu""".stripMargin,

    // mirrors q132: same feature trio, exact BIGINT moments, identical
    // double association (n·Σxy − Σx·Σy) / (√v_x · √v_y), null on zero
    // variance
    "q132_feature_corr" ->
      """WITH f AS (
        |  SELECT n_chars AS c,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS t,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        |      AS BIGINT) AS p
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c*c) AS BIGINT) AS qc,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(t*t) AS BIGINT) AS qt,
        |    CAST(sum(p) AS BIGINT) AS sp, CAST(sum(p*p) AS BIGINT) AS qp,
        |    CAST(sum(c*t) AS BIGINT) AS pct,
        |    CAST(sum(c*p) AS BIGINT) AS pcp,
        |    CAST(sum(t*p) AS BIGINT) AS ptp
        |  FROM f),
        |v AS (
        |  SELECT *,
        |    CAST(n AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc AS vc,
        |    CAST(n AS DOUBLE) * qt - CAST(st AS DOUBLE) * st AS vt,
        |    CAST(n AS DOUBLE) * qp - CAST(sp AS DOUBLE) * sp AS vp
        |  FROM m)
        |SELECT 'n_chars' AS x, 'n_tokens' AS y, n,
        |  CASE WHEN vc <= 0 OR vt <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * pct - CAST(sc AS DOUBLE) * st) /
        |      (sqrt(vc) * sqrt(vt)), 6) END AS r FROM v
        |UNION ALL
        |SELECT 'n_chars', 'n_punct', n,
        |  CASE WHEN vc <= 0 OR vp <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * pcp - CAST(sc AS DOUBLE) * sp) /
        |      (sqrt(vc) * sqrt(vp)), 6) END FROM v
        |UNION ALL
        |SELECT 'n_tokens', 'n_punct', n,
        |  CASE WHEN vt <= 0 OR vp <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * ptp - CAST(st AS DOUBLE) * sp) /
        |      (sqrt(vt) * sqrt(vp)), 6) END FROM v""".stripMargin,

    // mirrors q133: identical expected-count tree per cell and the SAME
    // sorted-fold summation order (list_reduce over list_sort; the
    // init-less fold equals Spark's 0.0-init fold — +0.0 + x == x)
    "q133_contingency" ->
      """WITH base AS (
        |  SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS obs
        |  FROM base GROUP BY 1, 2),
        |at AS (SELECT a, CAST(sum(obs) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1),
        |bt AS (SELECT b, CAST(sum(obs) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |j AS (
        |  SELECT c.a, c.b, nt.n,
        |    (CAST(nt.n AS DOUBLE) * (CAST(c.obs AS DOUBLE) * CAST(c.obs AS DOUBLE)))
        |      / (CAST(ra AS DOUBLE) * cb) AS contrib
        |  FROM cells c JOIN at USING (a) JOIN bt USING (b) CROSS JOIN nt),
        |f AS (
        |  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT b) AS BIGINT) AS kb,
        |    list_reduce(list_transform(
        |      list_sort(list({'a': a, 'b': b, 'c': contrib})), s -> s.c),
        |      (x, y) -> x + y) AS fold
        |  FROM j)
        |SELECT n, n_cells, (ka - 1) * (kb - 1) AS dof,
        |  round(fold - n, 6) AS chi2,
        |  CASE WHEN (ka - 1) * (kb - 1) = 0 THEN NULL
        |    ELSE round(sqrt(greatest(fold - n, 0.0) /
        |      (CAST(n AS DOUBLE) * least(ka - 1, kb - 1))), 6)
        |  END AS v
        |FROM f""".stripMargin,

    // mirrors q149: the three Σ c·ln c folds in sorted-key order (the
    // q133 list_reduce-over-list_sort discipline), entropies as
    // ln(n) − fold/n, MI composed from the unrounded entropy trees in
    // the same fixed association as the Spark side
    "q149_mutual_info" ->
      """WITH base AS (
        |  SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS obs
        |  FROM base GROUP BY 1, 2),
        |ab AS (
        |  SELECT CAST(sum(obs) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT b) AS BIGINT) AS kb,
        |    list_reduce(list_transform(
        |      list_sort(list({'a': a, 'b': b, 'c': CAST(obs AS DOUBLE)})),
        |      s -> s.c * ln(s.c)), (x, y) -> x + y) AS fab
        |  FROM cells),
        |ma AS (SELECT a, CAST(sum(obs) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(obs) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1),
        |fa AS (SELECT list_reduce(list_transform(
        |    list_sort(list({'a': a, 'c': CAST(ra AS DOUBLE)})),
        |    s -> s.c * ln(s.c)), (x, y) -> x + y) AS fa FROM ma),
        |fb AS (SELECT list_reduce(list_transform(
        |    list_sort(list({'b': b, 'c': CAST(cb AS DOUBLE)})),
        |    s -> s.c * ln(s.c)), (x, y) -> x + y) AS fb FROM mb)
        |SELECT n, ka, kb,
        |  round(ln(CAST(n AS DOUBLE)) - fa / n, 6) AS h_a,
        |  round(ln(CAST(n AS DOUBLE)) - fb / n, 6) AS h_b,
        |  round(ln(CAST(n AS DOUBLE)) - fab / n, 6) AS h_ab,
        |  round((ln(CAST(n AS DOUBLE)) - fa / n)
        |    + (ln(CAST(n AS DOUBLE)) - fb / n)
        |    - (ln(CAST(n AS DOUBLE)) - fab / n), 6) AS mi,
        |  CASE WHEN ka = 1 OR kb = 1 THEN NULL
        |    ELSE round(((ln(CAST(n AS DOUBLE)) - fa / n)
        |      + (ln(CAST(n AS DOUBLE)) - fb / n)
        |      - (ln(CAST(n AS DOUBLE)) - fab / n)) /
        |      sqrt((ln(CAST(n AS DOUBLE)) - fa / n)
        |        * (ln(CAST(n AS DOUBLE)) - fb / n)), 6)
        |  END AS nmi
        |FROM ab CROSS JOIN fa CROSS JOIN fb""".stripMargin,

    // mirrors q162: per-lang doc/token sums, shares, cumulative in
    // (token mass desc, lang) order
    "q162_mixture_report" ->
      """WITH g AS (
        |  SELECT lang,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
        |  CAST(sum(n_tokens) AS BIGINT) AS tt FROM g),
        |c AS (SELECT lang, n_docs, n_tokens,
        |  CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM g)
        |SELECT lang, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / td, 6) AS doc_share,
        |  round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
        |  round(CAST(cum AS DOUBLE) / tt, 6) AS cum_token_share
        |FROM c CROSS JOIN t""".stripMargin,

    // mirrors q163: floor(value/width) bins through doubles
    "q163_length_histogram" ->
      """SELECT lang,
        |  CAST(floor(CAST(n_chars AS DOUBLE) / 100) AS BIGINT) * 100
        |    AS bin_lo,
        |  (CAST(floor(CAST(n_chars AS DOUBLE) / 100) AS BIGINT) + 1) * 100
        |    AS bin_hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents
        |WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,

    // mirrors q166: (count desc, value)-ranked cells, group totals
    "q166_top_values" ->
      """WITH cells AS (
        |  SELECT lang, CAST(source AS VARCHAR) AS value,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, value, n,
        |    CAST(row_number() OVER (
        |      PARTITION BY lang ORDER BY n DESC, value) AS INTEGER)
        |      AS rank,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |  FROM cells)
        |SELECT lang, value, n, rank,
        |  round(CAST(n AS DOUBLE) / tot, 6) AS share
        |FROM r WHERE rank <= 3""".stripMargin,

    // mirrors q167: q132's exact moment tree per lang
    "q167_corr_per_group" ->
      """WITH f AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS y
        |  FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |    AND text IS NOT NULL),
        |m AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM f GROUP BY 1),
        |v AS (SELECT *,
        |  CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
        |  CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy
        |  FROM m)
        |SELECT lang, n,
        |  CASE WHEN vx <= 0 OR vy <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (sqrt(vx) * sqrt(vy)), 6) END AS r
        |FROM v""".stripMargin,

    // mirrors q168: exact cumulative counts over the value union, one
    // quotient per value, order-independent max
    "q168_ks_distance" ->
      """WITH ha AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY 1),
        |hb AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ha.v, hb.v) AS v,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ha FULL JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v,
        |  sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM j
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |  CAST(sum(cb) AS BIGINT) AS n_b FROM j)
        |SELECT n_a, n_b,
        |  round(max(abs(CAST(cuma AS DOUBLE) / n_a
        |    - CAST(cumb AS DOUBLE) / n_b)), 6) AS ks
        |FROM c CROSS JOIN t GROUP BY n_a, n_b""".stripMargin,

    // mirrors q169: q148's rank identity over per-user event counts
    "q169_user_gini" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM s),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS BIGINT) AS tot,
        |    CAST(sum(i * x) AS BIGINT) AS ix
        |  FROM r)
        |SELECT k AS n_groups, tot AS total_rows,
        |  round(2.0 * ix / (CAST(k AS DOUBLE) * tot)
        |    - CAST(k + 1 AS DOUBLE) / k, 6) AS gini
        |FROM a""".stripMargin,

    // mirrors q175: activity histogram, exact cumulatives, one quotient
    // per vertex
    "q175_lorenz_curve" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |h AS (
        |  SELECT n AS activity, CAST(count(*) AS BIGINT) AS n_entities
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n_entities) AS BIGINT) AS te,
        |  CAST(sum(activity * n_entities) AS BIGINT) AS tv FROM h),
        |cum AS (
        |  SELECT activity, n_entities,
        |    CAST(sum(n_entities) OVER w AS BIGINT) AS cume,
        |    CAST(sum(activity * n_entities) OVER w AS BIGINT) AS cumv
        |  FROM h
        |  WINDOW w AS (ORDER BY activity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT activity, n_entities,
        |  round(CAST(cume AS DOUBLE) / te, 6) AS cum_entity_share,
        |  round(CAST(cumv AS DOUBLE) / tv, 6) AS cum_event_share
        |FROM cum CROSS JOIN t""".stripMargin,

    // mirrors q170: per-user lag gaps floored to whole seconds (q144's
    // floor-not-CAST rule), then q163's floor bins at 60s width
    "q170_gap_histogram" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    CAST(floor(CAST(tsu - pts AS DOUBLE) / 1000000) AS BIGINT)
        |      AS gap_s
        |  FROM e WHERE pts IS NOT NULL)
        |SELECT event_type,
        |  CAST(floor(CAST(gap_s AS DOUBLE) / 60) AS BIGINT) * 60
        |    AS bin_lo,
        |  (CAST(floor(CAST(gap_s AS DOUBLE) / 60) AS BIGINT) + 1) * 60
        |    AS bin_hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY 1, 2, 3""".stripMargin,

    // mirrors q138: q99's z tree over the day-count frame; the flag
    // compares the unrounded z; one day or zero variance -> nulls
    "q138_daily_anomaly" ->
      """WITH d AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS s1,
        |  CAST(sum(n * n) AS BIGINT) AS s2 FROM d)
        |SELECT day, n,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE round((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1)), 6) END AS z,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE abs((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1))) >= 2.0 END AS is_burst
        |FROM d, m""".stripMargin,

    // mirrors q139: same cells, rank by (count desc, lang), INT window
    // count cast to BIGINT
    "q139_func_dependency" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, n,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n DESC, lang) AS rk,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_rows,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
        |      AS n_distinct_b
        |  FROM c)
        |SELECT source, n_rows, n_distinct_b, lang AS dominant_b,
        |  n AS dominant_n,
        |  round(CAST(n AS DOUBLE) / n_rows, 6) AS dominant_frac,
        |  n_distinct_b = 1 AS is_functional
        |FROM r WHERE rk = 1""".stripMargin,

    // mirrors q148: ascending (size, source) rank, exact Σi·x, the
    // same double formula tree
    "q148_source_gini" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS x
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM s),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS BIGINT) AS tot,
        |    CAST(sum(i * x) AS BIGINT) AS ix
        |  FROM r)
        |SELECT k AS n_groups, tot AS total_rows,
        |  round(2.0 * ix / (CAST(k AS DOUBLE) * tot)
        |    - CAST(k + 1 AS DOUBLE) / k, 6) AS gini
        |FROM a""".stripMargin,

    // mirrors q146: q116's quantile form with weight sums for counts
    "q146_weighted_quantiles" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS w
        |  FROM documents),
        |f AS (SELECT * FROM d WHERE w IS NOT NULL AND w > 0),
        |hist AS (
        |  SELECT lang, n_chars, CAST(sum(w) AS BIGINT) AS c
        |  FROM f GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(sum(w) AS BIGINT) AS n FROM f
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.5, 0.9]) AS p)
        |SELECT cum.lang, ps.p, min(cum.n_chars) AS quantile, tot.n AS w
        |FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY cum.lang, ps.p, tot.n""".stripMargin,

    // mirrors q145: same keep-class regex counts, BIGINT sums, one
    // quotient per ratio
    "q145_charset_profile" ->
      """WITH a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    CAST(sum(length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')))
        |      AS BIGINT) AS n_ascii,
        |    CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))
        |      AS BIGINT) AS n_digit,
        |    CAST(sum(length(text) - length(replace(text, ' ', '')))
        |      AS BIGINT) AS n_space
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL GROUP BY 1)
        |SELECT lang, n_docs, n_chars,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_ascii AS DOUBLE) / n_chars, 6) END
        |    AS ascii_ratio,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_digit AS DOUBLE) / n_chars, 6) END
        |    AS digit_ratio,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_space AS DOUBLE) / n_chars, 6) END
        |    AS space_ratio
        |FROM a""".stripMargin,

    // mirrors q142: shared tokenizer, exact BIGINT count quotients
    "q142_vocab_concentration" ->
      """WITH tk AS (
        |  SELECT source AS g,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (SELECT g, term, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c * (c - 1)) AS BIGINT) AS rep FROM c GROUP BY 1)
        |SELECT g AS source, n_tokens, n_types,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  CASE WHEN n_tokens < 2 THEN NULL
        |    ELSE round(CAST(rep AS DOUBLE) /
        |      (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
        |  END AS simpson
        |FROM a""".stripMargin,

    // mirrors q141: q138's z tree per event type's own day history
    "q141_anomaly_per_type" ->
      """WITH d AS (
        |  SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS s1,
        |  CAST(sum(n * n) AS BIGINT) AS s2 FROM d GROUP BY 1)
        |SELECT d.event_type, day, n,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE round((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1)), 6) END AS z,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE abs((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1))) >= 2.0 END AS is_burst
        |FROM d JOIN m USING (event_type)""".stripMargin,

    // mirrors q176: one UNION ALL branch per profiled column
    "q176_column_profile" -> {
      val branch = (c: String) =>
        s"""SELECT '$c' AS column, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CASE WHEN count(*) = 0 THEN NULL
           |    ELSE round(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0
           |      END) AS DOUBLE) / count(*), 6) END AS null_rate
           |FROM documents""".stripMargin
      Seq("doc_id", "lang", "source", "n_chars").map(branch)
        .mkString("", "\nUNION ALL\n", "")
    },

    // mirrors q153: per-row norm via the q23 list_sum element-order
    // fold (coalesce(…, 0.0) matches aggregate's 0.0 seed on empties);
    // min/max/counts are exact over identical doubles
    "q153_norm_stats" ->
      """WITH e AS (
        |  SELECT label, embedding,
        |    CASE WHEN embedding IS NULL THEN NULL ELSE
        |      sqrt(coalesce(list_sum(list_transform(
        |        range(1, len(embedding) + 1),
        |        i -> CAST(embedding[i] AS DOUBLE)
        |          * CAST(embedding[i] AS DOUBLE))), 0.0))
        |    END AS nrm
        |  FROM embeddings WHERE label IS NOT NULL)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN embedding IS NULL THEN 1 END) AS BIGINT)
        |    AS n_null,
        |  CAST(count(CASE WHEN nrm = 0.0 THEN 1 END) AS BIGINT) AS n_zero,
        |  CAST(min(CASE WHEN embedding IS NOT NULL
        |    THEN len(embedding) END) AS INTEGER) AS dims_min,
        |  CAST(max(CASE WHEN embedding IS NOT NULL
        |    THEN len(embedding) END) AS INTEGER) AS dims_max,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm
        |FROM e GROUP BY label""".stripMargin,

    // mirrors q136: same fixed-bin floor arithmetic (integer operands
    // through one double division), q130's expected/contrib convention
    "q136_numeric_drift" ->
      """WITH o AS (
        |  SELECT CAST(CASE WHEN n_chars < 0 THEN -1
        |      WHEN n_chars >= 500 THEN 10
        |      ELSE floor((n_chars - 0) * 10 / 500) END AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_old
        |  FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY 1),
        |nw AS (
        |  SELECT CAST(CASE WHEN n_chars < 0 THEN -1
        |      WHEN n_chars >= 500 THEN 10
        |      ELSE floor((n_chars - 0) * 10 / 500) END AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_new
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL GROUP BY 1),
        |t AS (
        |  SELECT (SELECT CAST(sum(n_old) AS BIGINT) FROM o) AS tot_o,
        |         (SELECT CAST(sum(n_new) AS BIGINT) FROM nw) AS tot_n)
        |SELECT coalesce(o.bin, nw.bin) AS bin,
        |  coalesce(o.n_old, 0) AS n_old, coalesce(nw.n_new, 0) AS n_new,
        |  round(CAST(coalesce(o.n_old, 0) AS DOUBLE) * t.tot_n / t.tot_o,
        |    6) AS expected_new,
        |  round(CASE WHEN coalesce(o.n_old, 0) > 0 THEN
        |    (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    * (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    / (CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o) END, 6)
        |    AS chisq
        |FROM o FULL OUTER JOIN nw USING (bin), t""".stripMargin,

    // mirrors q135: percent rank from the per-(source, score) histogram
    // ((cum − own)/(n−1), single-row group → 0.0), global lookup =
    // smallest score with cumulative count >= ceil(p·N)
    "q135_quantile_norm" ->
      """WITH b AS (
        |  SELECT source AS g, n_chars AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |pr AS (
        |  SELECT h.g, h.v,
        |    CASE WHEN t.n = 1 THEN 0.0
        |      ELSE CAST(sum(h.c) OVER (PARTITION BY h.g ORDER BY h.v)
        |        - h.c AS DOUBLE) / (t.n - 1) END AS p
        |  FROM h JOIN t USING (g)),
        |gh AS (SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY 1),
        |gc AS (SELECT v AS gv,
        |  CAST(sum(gc) OVER (ORDER BY v) AS BIGINT) AS gcum,
        |  (SELECT CAST(sum(gc) AS BIGINT) FROM gh) AS gn FROM gh),
        |map AS (
        |  SELECT pr.g, pr.v, min(gc.gv) AS qn
        |  FROM pr JOIN gc
        |    ON gc.gcum >= CAST(ceil(pr.p * gc.gn) AS BIGINT)
        |  GROUP BY 1, 2)
        |SELECT d.doc_id, d.source, d.n_chars, map.qn AS n_chars_qn
        |FROM documents d LEFT JOIN map
        |  ON map.g = d.source AND map.v = d.n_chars""".stripMargin,

    // mirrors q130: expected = share_old * total_new; contribution =
    // (obs - E)^2 / E, null when the category is new (E = 0)
    "q130_category_drift" ->
      """WITH o AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_old
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |nw AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_new
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |t AS (
        |  SELECT (SELECT CAST(sum(n_old) AS BIGINT) FROM o) AS tot_o,
        |         (SELECT CAST(sum(n_new) AS BIGINT) FROM nw) AS tot_n)
        |SELECT coalesce(o.event_type, nw.event_type) AS event_type,
        |  coalesce(o.n_old, 0) AS n_old, coalesce(nw.n_new, 0) AS n_new,
        |  round(CAST(coalesce(o.n_old, 0) AS DOUBLE) * t.tot_n / t.tot_o,
        |    6) AS expected_new,
        |  round(CASE WHEN coalesce(o.n_old, 0) > 0 THEN
        |    (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    * (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    / (CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o) END, 6)
        |    AS chisq
        |FROM o FULL OUTER JOIN nw USING (event_type), t""".stripMargin,

    // mirrors q123: q116's discrete-quantile rule at p05/p95 per lang,
    // then clamp each doc's length into the band
    "q123_winsorize" ->
      """WITH hist AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.05, 0.95]) AS p),
        |q AS (
        |  SELECT cum.lang, ps.p, min(cum.n_chars) AS qv
        |  FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |  WHERE cum.cm >= ceil(ps.p * tot.n)
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT lang, min(CASE WHEN p = 0.05 THEN qv END) AS lo,
        |         max(CASE WHEN p = 0.95 THEN qv END) AS hi
        |  FROM q GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  least(greatest(d.n_chars, b.lo), b.hi) AS n_chars_w
        |FROM documents d JOIN b USING (lang)""".stripMargin,

    // mirrors q116: the q101 discrete-quantile rule (smallest score whose
    // cumulative count reaches ceil(p*n)) per p, off one cumulated
    // histogram
    "q116_quantile_summary" ->
      """WITH hist AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p)
        |SELECT cum.lang, ps.p, min(cum.n_chars) AS quantile, tot.n
        |FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY cum.lang, ps.p, tot.n""".stripMargin,

    // mirrors q112: one SELECT per rule, unioned; rule names match the
    // operator's generated labels exactly
    "q112_quality_checks" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem),
        |rules AS (
        |  SELECT 'not_null(l_orderkey)' AS check_name,
        |    CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0
        |      END), 0) AS BIGINT) AS violations FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_quantity,1.0,50.0)',
        |    CAST(coalesce(sum(CASE WHEN l_quantity IS NULL
        |      OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_discount,0.0,0.05)',
        |    CAST(coalesce(sum(CASE WHEN l_discount IS NULL
        |      OR l_discount < 0.0 OR l_discount > 0.05 THEN 1 ELSE 0
        |      END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'matches(l_returnflag)',
        |    CAST(coalesce(sum(CASE WHEN l_returnflag IS NULL
        |      OR NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1
        |      ELSE 0 END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey,l_linenumber)',
        |    CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
        |      SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'referential(l_orderkey)',
        |    CAST(count(*) AS BIGINT) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_orderkey = l.l_orderkey))
        |SELECT r.check_name, r.violations, t.total,
        |  r.violations = 0 AS passed
        |FROM rules r CROSS JOIN t""".stripMargin,

    // mirrors q107: the same md5-60 bucket per token (multiset counts —
    // every occurrence lands)
    "q107_feature_hash" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS t FROM tk)
         |SELECT doc_id,
         |  CAST(${PortableHash.sqlHash60("t")} % 64 AS INTEGER) AS dim,
         |  count(*) AS count
         |FROM tok GROUP BY 1, 2""".stripMargin,

    // mirrors q99: identical double expression tree over BIGINT-exact
    // moments — same parenthesization, same rounding
    "q99_zscore" ->
      """WITH s AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |  round((n_chars - CAST(s1 AS DOUBLE) / n) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) /
        |      (n - 1)), 6) AS z
        |FROM documents d JOIN s ON d.lang = s.lang""".stripMargin,

    // mirrors q189: key-size histogram quantiles + one-row skew summary
    "q189_key_skew" ->
      """WITH g AS (
        |  SELECT user_id, count(*) AS sz FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |t AS (
        |  SELECT CAST(sum(sz) AS BIGINT) AS nrows, count(*) AS nkeys,
        |    max(sz) AS mx FROM g),
        |h AS (SELECT sz, count(*) AS c FROM g GROUP BY sz),
        |cum AS (SELECT sz, sum(c) OVER (ORDER BY sz) AS cumc FROM h),
        |q AS (
        |  SELECT p, min(sz) AS qv
        |  FROM cum CROSS JOIN t
        |    CROSS JOIN (SELECT unnest([0.5, 0.99]) AS p)
        |  WHERE cumc >= ceil(p * nkeys) GROUP BY p)
        |SELECT nrows AS n_rows, CAST(nkeys AS BIGINT) AS n_keys,
        |  CAST(mx AS BIGINT) AS max_group,
        |  CAST(p50.qv AS BIGINT) AS p50_group,
        |  CAST(p99.qv AS BIGINT) AS p99_group,
        |  round(CAST(mx AS DOUBLE) / nrows, 6) AS max_key_share,
        |  round(CAST(mx AS DOUBLE) / p50.qv, 6) AS skew_factor
        |FROM t, (SELECT qv FROM q WHERE p = 0.5) p50,
        |  (SELECT qv FROM q WHERE p = 0.99) p99""".stripMargin,

    // mirrors q221: same token split, digest distinct, source shares
    "q221_dataset_card" ->
      """WITH b AS (SELECT doc_id, text, source FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        |  FROM b),
        |shr AS (
        |  SELECT CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mss
        |  FROM (SELECT count(*) AS n FROM b GROUP BY source))
        |SELECT metric, value FROM agg CROSS JOIN shr CROSS JOIN (VALUES
        |  ('n_docs'), ('n_tokens'), ('n_sources'), ('mean_doc_tokens'),
        |  ('exact_dup_fraction'), ('max_source_share')) AS m(metric)
        |CROSS JOIN LATERAL (SELECT CASE metric
        |  WHEN 'n_docs' THEN CAST(n_docs AS DOUBLE)
        |  WHEN 'n_tokens' THEN CAST(n_tokens AS DOUBLE)
        |  WHEN 'n_sources' THEN CAST(n_sources AS DOUBLE)
        |  WHEN 'mean_doc_tokens'
        |    THEN round(CAST(n_tokens AS DOUBLE) / n_docs, 6)
        |  WHEN 'exact_dup_fraction'
        |    THEN round(CAST(1.0 AS DOUBLE)
        |      - CAST(n_distinct AS DOUBLE) / n_docs, 6)
        |  ELSE round(mss, 6) END AS value) v""".stripMargin,

    // mirrors q230: q221's metric arithmetic per source group
    "q230_source_cards" ->
      """WITH agg AS (
        |  SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        |  FROM documents GROUP BY source)
        |SELECT grp AS "group", metric,
        |  CASE metric
        |    WHEN 'n_docs' THEN CAST(n_docs AS DOUBLE)
        |    WHEN 'n_tokens' THEN CAST(n_tokens AS DOUBLE)
        |    WHEN 'mean_doc_tokens'
        |      THEN round(CAST(n_tokens AS DOUBLE) / n_docs, 6)
        |    ELSE round(CAST(1.0 AS DOUBLE)
        |      - CAST(n_distinct AS DOUBLE) / n_docs, 6) END AS value
        |FROM agg CROSS JOIN (VALUES
        |  ('n_docs'), ('n_tokens'), ('mean_doc_tokens'),
        |  ('exact_dup_fraction')) AS m(metric)""".stripMargin
  )
}
