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

/** Gates: privacy and membership: redaction, DP, k-anon, audits. */
object PrivacyGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // curation: PII redaction — synthetic PII is injected deterministically
    // (same CASE logic both engines) so the gate exercises real matches,
    // not an all-zero pass over clean testdata
    // compliance: per-source PII exposure report — doc and match counts
    // per category over the q55 injection fixture, before any rewrite
    "q165_pii_stats" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        col("source"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" reach me at user"), col("doc_id"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), col("doc_id") % 256, lit(".17")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))).as("text"))
      Redact.piiStats(withPii, "source", "text")
    }),

    "q55_pii_redaction" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" reach me at user"), col("doc_id"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), col("doc_id") % 256, lit(".17")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))).as("text"))
      Redact.withRedactions(withPii, "text")
        .select(col("doc_id"), col("red_text"), col("n_email"),
          col("n_ipv4"), col("n_phone"))
    }),

    // compliance: salted pseudonymization — user ids replaced by
    // sha256(salt || id), referentially consistent so the per-user
    // aggregate still groups correctly on the tokenized key
    "q103_pseudonymize" -> ((s, dir) => {
      Redact.pseudonymize(t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type")),
        Seq("user_id"), salt = "graft-salt-v1")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
    }),

    // privacy: k-anonymity audit over quasi-identifiers — (lang, source,
    // coarse length bucket) as the quasi tuple; min_class_size >= k IS
    // the anonymity property, risky classes/rows quantify the exposure
    "q178_k_anonymity" -> ((s, dir) => {
      graft.operators.Checks.kAnonymityReport(
        t(s, dir, "documents").withColumn("len_bucket",
          floor(col("n_chars") / 100).cast("long")),
        Seq("lang", "source", "len_bucket"), k = 5)
    }),

    // privacy: ε-DP released group counts — deterministic seeded
    // Laplace noise (the PortableHash convention, so the release
    // replays bit-for-bit); only noised values leave the aggregation
    "q190_dp_counts" -> ((s, dir) => {
      graft.operators.Privacy.dpCounts(t(s, dir, "documents"),
        Seq("lang", "source"), epsilon = 1.0)
    }),

    // privacy: ε-DP noised per-type value sums with per-row clipping
    // at 100 (the bounded-sensitivity recipe), independent draw from
    // q190's count release (seed suffix)
    "q191_dp_sums" -> ((s, dir) => {
      graft.operators.Privacy.dpSum(t(s, dir, "events"),
        Seq("event_type"), "value", clip = 100.0, epsilon = 1.0)
    }),

    // governance: Min-K% Prob membership signal — mean logprob of each
    // doc's 20% least likely transitions under the LM trained on the
    // reference subset (every 3rd doc); the contamination triage that
    // mean perplexity washes out
    "q277_mink_prob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = TextAnalysis.bigramModel(
        docs.filter(col("doc_id") % 3 === 0), "text",
        modelSize = 500, historySize = 25)
      TextAnalysis.minKProbScore(docs, "doc_id", "text", model,
        kFrac = 0.2)
    }),

    // privacy: l-diversity over the q178 quasi classes with user-ish
    // sensitive buckets — the homogeneity-attack audit k-anonymity
    // leaves open
    "q259_l_diversity" -> ((s, dir) => {
      graft.operators.Checks.lDiversityReport(
        t(s, dir, "events").withColumn("hour_bucket",
          hour(col("ts")).cast("long")),
        Seq("event_type", "hour_bucket"), "user_id", l = 3)
    }),

    // dedup: winnowing fingerprint candidates (MOSS scheme) — local
    // partial overlap (a shared token run >= w+k-1) guarantees a shared
    // selected fingerprint; pairs from the fp inverted index
    "q258_winnow_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 10 < 3)
      Dedup.winnowCandidates(docs, "doc_id", "text",
        shingleSize = 3, window = 4, minShared = 2)
    })
  )

  val oracleSql: Map[String, String] = Map(

    // mirrors Redact.withRedactions over the same injected PII; patterns
    // interpolated from the Redact constants so the two engines can never
    // drift (DuckDB regexp_replace needs the explicit 'g' flag)
    // mirrors q165: q55's injection fixture, per-source doc/match counts
    "q165_pii_stats" ->
      s"""WITH pii AS (
         |  SELECT source, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567'
         |      ELSE '' END AS text
         |  FROM documents
         |  WHERE source IS NOT NULL AND text IS NOT NULL),
         |h AS (
         |  SELECT source,
         |    len(regexp_extract_all(text, '${Redact.emailPattern}'))
         |      AS he,
         |    len(regexp_extract_all(text, '${Redact.ipv4Pattern}'))
         |      AS hi,
         |    len(regexp_extract_all(text, '${Redact.phonePattern}'))
         |      AS hp
         |  FROM pii)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN he > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_email,
         |  CAST(sum(he) AS BIGINT) AS n_email,
         |  CAST(sum(CASE WHEN hi > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_ipv4,
         |  CAST(sum(hi) AS BIGINT) AS n_ipv4,
         |  CAST(sum(CASE WHEN hp > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_phone,
         |  CAST(sum(hp) AS BIGINT) AS n_phone
         |FROM h GROUP BY source""".stripMargin,

    "q55_pii_redaction" ->
      s"""WITH pii AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567'
         |      ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Redact.emailPattern}', '<EMAIL>', 'g'),
         |    '${Redact.ipv4Pattern}', '<IP>', 'g'),
         |    '${Redact.phonePattern}', '<PHONE>', 'g') AS red_text,
         |  CAST(len(regexp_extract_all(text, '${Redact.emailPattern}'))
         |    AS INTEGER) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${Redact.ipv4Pattern}'))
         |    AS INTEGER) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '${Redact.phonePattern}'))
         |    AS INTEGER) AS n_phone
         |FROM pii""".stripMargin,

    // mirrors q103: sha256 over the same salt||id string in both engines
    "q103_pseudonymize" ->
      """WITH p AS (
        |  SELECT sha256('graft-salt-v1' || CAST(user_id AS VARCHAR))
        |    AS user_id, event_type
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM p GROUP BY user_id""".stripMargin,

    // mirrors q178: class sizes over the same quasi tuple (nulls group
    // together in both engines), then one-row risk summary at k=5
    "q178_k_anonymity" ->
      """WITH c AS (
        |  SELECT count(*) AS sz FROM (
        |    SELECT lang, source,
        |      CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket
        |    FROM documents)
        |  GROUP BY lang, source, len_bucket)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(sz) AS BIGINT) AS min_class_size,
        |  CAST(count(CASE WHEN sz < 5 THEN 1 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(COALESCE(sum(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
        |    AS n_risky_rows,
        |  CASE WHEN sum(sz) = 0 THEN NULL
        |    ELSE round(CAST(COALESCE(sum(CASE WHEN sz < 5 THEN sz END), 0)
        |      AS DOUBLE) / sum(sz), 6) END AS risky_rate
        |FROM c""".stripMargin,

    // mirrors q190: identical md5-seeded inverse-CDF Laplace draw per
    // group, same clamp, same double association
    "q190_dp_counts" ->
      s"""WITH c AS (
         |  SELECT lang, source, count(*) AS n FROM documents
         |  GROUP BY lang, source),
         |k AS (
         |  SELECT lang, source, n,
         |    ${PortableHash.sqlHash60(
        "'dp' || '|' || COALESCE(CAST(lang AS VARCHAR), ' null') " +
        "|| '|' || COALESCE(CAST(source AS VARCHAR), ' null')")} AS h
         |  FROM c),
         |u AS (
         |  SELECT lang, source, n,
         |    CAST(h AS DOUBLE) / 1152921504606846976.0 - 0.5 AS uu
         |  FROM k),
         |d AS (
         |  SELECT lang, source,
         |    round(CAST(n AS DOUBLE) + (-(1.0) * sign(uu)
         |      * ln(greatest(1.0 - 2.0 * abs(uu), 0.000000000001))), 6)
         |      AS dp_count
         |  FROM u)
         |SELECT lang, source, dp_count,
         |  CAST(greatest(round(dp_count, 0), 0.0) AS BIGINT)
         |    AS dp_released
         |FROM d""".stripMargin,

    // mirrors q191: identical clip-then-sum, md5 draw with the "sum"
    // seed suffix, Laplace scale clip/epsilon
    "q191_dp_sums" ->
      s"""WITH s AS (
         |  SELECT event_type,
         |    sum(least(greatest(COALESCE(CAST(value AS DOUBLE), 0.0),
         |      -100.0), 100.0)) AS sv
         |  FROM events GROUP BY event_type),
         |k AS (
         |  SELECT event_type, sv,
         |    ${PortableHash.sqlHash60(
        "'dp' || '|' || 'sum' || '|' || " +
        "COALESCE(CAST(event_type AS VARCHAR), ' null')")} AS h
         |  FROM s),
         |u AS (
         |  SELECT event_type, sv,
         |    CAST(h AS DOUBLE) / 1152921504606846976.0 - 0.5 AS uu
         |  FROM k)
         |SELECT event_type,
         |  round(sv + (-(100.0) * sign(uu)
         |    * ln(greatest(1.0 - 2.0 * abs(uu), 0.000000000001))), 6)
         |    AS dp_sum
         |FROM u""".stripMargin,

    // mirrors q277: q274's reference-trained model CTEs, per-bigram
    // logprobs, rank window (lp, w1, w2), ceil(0.2·n) slice, mean
    "q277_mink_prob" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |ref AS (SELECT doc_id, ts FROM tk WHERE doc_id % 3 = 0),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM ref)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM ref WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |lps AS (
        |  SELECT doc_id, w1, w2,
        |    ln((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |       (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v)) AS lp
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |    CROSS JOIN vv),
        |ranked AS (
        |  SELECT doc_id, lp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY lp, w1, w2) AS rn,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM lps)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_bigrams,
        |  round(avg(lp), 6) AS mink_logprob
        |FROM ranked
        |WHERE rn <= greatest(1, CAST(ceil(0.2 * n) AS BIGINT))
        |GROUP BY doc_id""".stripMargin,

    // mirrors Checks.lDiversityReport: per-class (size, distinct
    // sensitive), risky when diversity < 3; hour() matches Spark's hour
    "q259_l_diversity" ->
      """WITH c AS (
        |  SELECT count(*) AS sz, count(DISTINCT user_id) AS div FROM (
        |    SELECT event_type,
        |      CAST(extract(hour FROM ts) AS BIGINT) AS hour_bucket,
        |      user_id
        |    FROM events)
        |  GROUP BY event_type, hour_bucket)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(div) AS BIGINT) AS min_diversity,
        |  CAST(count(CASE WHEN div < 3 THEN 1 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(COALESCE(sum(CASE WHEN div < 3 THEN sz END), 0) AS BIGINT)
        |    AS n_risky_rows,
        |  CASE WHEN sum(sz) = 0 THEN NULL
        |    ELSE round(CAST(COALESCE(sum(CASE WHEN div < 3 THEN sz END), 0)
        |      AS DOUBLE) / sum(sz), 6) END AS risky_rate
        |FROM c""".stripMargin,

    // mirrors Dedup.winnowCandidates (k=3, w=4): positional 3-gram md5-60
    // hashes, per-window min with RIGHTMOST tie position (list_max over
    // the matching-position CASE — later positions overwrite), distinct
    // selected (doc, fp), df>1 prefilter, pair counts
    "q258_winnow_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 10 < 3),
        |sl AS (SELECT doc_id,
        |  CASE WHEN len(tk) >= 3 THEN list_transform(range(0, len(tk)-2),
        |    i -> array_to_string(tk[i+1:i+3], ' ')) ELSE [] END AS sl
        |  FROM tok),
        |hl0 AS (SELECT doc_id, list_transform(sl, s ->
        |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hl,
        |    len(sl) AS m FROM sl),
        |ok AS (SELECT doc_id, hl, m FROM hl0 WHERE m >= 4),
        |wm AS (SELECT doc_id, hl, list_transform(range(1, m-4+2),
        |    j -> list_min(hl[j:j+3])) AS wm FROM ok),
        |ps AS (SELECT doc_id, hl,
        |  list_distinct(list_transform(range(1, len(wm)+1), j ->
        |    list_max(list_transform(range(j, j+4),
        |      p -> CASE WHEN hl[p] = wm[j] THEN p ELSE 0 END)))) AS pos
        |  FROM wm),
        |f AS (SELECT DISTINCT doc_id, hl[p] AS fp
        |  FROM (SELECT doc_id, hl, unnest(pos) AS p FROM ps)),
        |d AS (SELECT doc_id, fp FROM f
        |  QUALIFY count(*) OVER (PARTITION BY fp) > 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
  )
}
