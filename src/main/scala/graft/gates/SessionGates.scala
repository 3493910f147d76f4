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

/** Gates: event-stream behavioral analytics (batch). */
object SessionGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gap sessionization (lag + cumulative sum windows)
    "q17_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Sessionize(e, "user_id", unix_millis(col("ts")), "event_id",
          gapMillis = 1800000L)
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // behavioral: session-shape summary — sessions per user, bounce
    // share, events per session in one row ("how many and how shallow"
    // before q144's "how long")
    "q171_session_summary" -> ((s, dir) => {
      Sessionize.sessionSummary(t(s, dir, "events"), "user_id",
        unix_millis(col("ts")), "event_id", gapMillis = 1800000L)
    }),

    // abuse QA: per-type distinct-user intensity — events per distinct
    // user ("is purchase volume broad or three users deep")
    "q172_distinct_intensity" -> ((s, dir) => {
      Stats.distinctIntensity(t(s, dir, "events"), "event_type",
        "user_id")
    }),

    // tumbling-window agg (same transform powers the streaming path)
    "q18_windowed_counts" -> ((s, dir) => {
      EventStream.windowedCounts(t(s, dir, "events"), "5 minutes")
    }),

    // stateful sessionization (flatMapGroupsWithState) on the batch frame —
    // the same code path Structured Streaming runs with per-key state
    "q41_stateful_sessions" -> ((s, dir) => {
      import graft.streaming.StatefulSessionize
      import s.implicits._
      implicit val sp: SparkSession = s
      val events = t(s, dir, "events")
        .select(col("user_id").as("userId"), col("event_id").as("eventId"),
          unix_millis(col("ts")).as("tsMillis"))
        .as[StatefulSessionize.Event]
      StatefulSessionize(events, gapMillis = 1800000L)
        .groupBy(col("userId").as("user_id"))
        .agg(max(col("sessionId")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_sessions"), col("n_events"))
    }),

    // monitoring: day-of-week x hour-of-day seasonality heat map —
    // counts and shares over at most 168 cells
    "q164_seasonality" -> ((s, dir) => {
      Stats.seasonalityProfile(t(s, dir, "events"), "ts")
    }),

    // analytics: ordered funnel — view → click → purchase per user,
    // greedy earliest-match (each step strictly after the previous);
    // one min-aggregation per step joined on the user key, no per-user
    // window over raw events
    // analytics: funnel drop-off curve — per step the users reaching at
    // least it, survival vs step 1, and step-over-step conversion
    "q160_conversion_curve" -> ((s, dir) => {
      Funnel.conversionCurve(t(s, dir, "events"), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
    }),

    // analytics: funnel completion latency — p50/p90 whole-second
    // first-view -> purchase time over completing users
    "q177_funnel_latency" -> ((s, dir) => {
      Funnel.stepLatency(t(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), ps = Seq(0.5, 0.9))
    }),

    "q105_funnel" -> ((s, dir) => {
      Funnel.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .select(col("user_id"),
          unix_millis(col("step_ts_1")).as("t_view"),
          unix_millis(col("step_ts_2")).as("t_click"),
          unix_millis(col("step_ts_3")).as("t_purchase"),
          col("n_completed"))
    }),

    // behavioral: session-duration quantiles — 30-min-gap sessions
    // reduced to whole-second durations, exact type-1 p50/p90/p99
    "q144_session_stats" -> ((s, dir) => {
      Sessionize.sessionStats(t(s, dir, "events"), "user_id",
        unix_micros(col("ts")), "event_id", gapMicros = 1800000000L,
        ps = Seq(0.5, 0.9, 0.99))
    }),

    // monitoring: rolling daily volume — trailing 7-observed-day moving
    // average + day-over-day percent change (the trend line next to
    // q138's spike flags)
    "q155_rolling_volume" -> ((s, dir) => {
      Stats.rollingDailyVolume(t(s, dir, "events"), "ts", window = 7)
    }),

    // analytics: think-time — exact median gap (µs) per consecutive
    // event-type transition; per-user lag window + histogram quantile
    "q126_transition_times" -> ((s, dir) => {
      Funnel.transitionTimes(t(s, dir, "events"), "user_id",
        "event_type", "ts", "event_id", p = 0.5)
    }),

    // behavioral: first-order Markov transition matrix — per (from, to)
    // event-type step the count and row-normalized probability ("where
    // do users go next"), transitions never crossing users
    "q151_transition_matrix" -> ((s, dir) => {
      Funnel.transitionMatrix(t(s, dir, "events"), "user_id",
        "event_type", "ts", "event_id")
    }),

    // analytics: path mining — the corpus-wide top-10 event-type
    // trigrams from per-user (ts, event_id)-ordered sequences; n-gram
    // fan-out is map-side, counts map-side-combinable, top-k TakeOrdered
    "q124_event_paths" -> ((s, dir) => {
      Funnel.pathNgrams(t(s, dir, "events"), "user_id", "event_type",
        "ts", "event_id", n = 3, k = 10)
    }),

    // analytics: rolling engagement — DAU and 7-day rolling WAU per
    // activity day; activity dedupes to (day, user) BEFORE the window
    // fan-out, so the x7 explode multiplies the deduped frame, never the
    // raw event log, and no per-day window state exists anywhere
    "q110_rolling_active" -> ((s, dir) => {
      Funnel.rollingActive(t(s, dir, "events"), "user_id", "ts",
        windowDays = 7)
    }),

    // analytics: weekly cohort retention — distinct users per
    // (first-activity cohort week, week offset); activity dedupes to
    // (user, week) before the matrix count
    "q106_retention" -> ((s, dir) => {
      Funnel.retentionMatrix(t(s, dir, "events"), "user_id", "ts")
        .select(col("cohort_week").cast("string").as("cohort_week"),
          col("week_offset"), col("n_users"))
    }),

    // monitoring: exponential time-decay engagement per user — events a
    // half-life (3 days) older than the newest event count half as much;
    // the recency-weighted activity rank next to q169's lifetime gini
    "q179_decayed_engagement" -> ((s, dir) => {
      Stats.decayedScore(t(s, dir, "events"), "ts", "user_id", "value",
        halfLifeDays = 3.0)
    }),

    // ingest debounce: burst leaders per user (chain semantics — the
    // session-start rows), the retransmit/double-fire collapse an event
    // pipeline runs before counting anything
    "q293_debounce" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("tsu", unix_micros(col("ts")))
      Sessionize.debounce(e, "user_id", col("tsu"), "event_id",
          gap = 600000000L) // 10 minutes in micros
        .select(col("event_id"), col("user_id"), col("tsu"))
    }),

    // step-signal time-weighted average per user: each value holds until
    // the next observation; exact BIGINT numerator (cents × micros),
    // bounded by max(value)·span regardless of row count
    "q294_time_weighted_avg" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Sessionize.timeWeightedAverage(e, "user_id",
        unix_micros(col("ts")), col("value"), "event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q17_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |s AS (SELECT user_id,
        |  CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |       WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin,

    // mirrors q171: q17's session labeling, (user, session) sizes, one
    // summary row of exact counts + three quotients
    "q171_session_summary" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |l AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |         WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0
        |    END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT user_id,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM l),
        |g AS (
        |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n
        |  FROM s GROUP BY 1, 2),
        |a AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_sessions,
        |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bounce,
        |    CAST(sum(n) AS BIGINT) AS ev
        |  FROM g)
        |SELECT n_users, n_sessions, n_bounce,
        |  round(CAST(n_sessions AS DOUBLE) / n_users, 6)
        |    AS sessions_per_user,
        |  round(CAST(n_bounce AS DOUBLE) / n_sessions, 6) AS bounce_rate,
        |  round(CAST(ev AS DOUBLE) / n_sessions, 6) AS events_per_session
        |FROM a""".stripMargin,

    // mirrors q172: exact distinct per group, one quotient
    "q172_distinct_intensity" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
        |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id), 6)
        |    AS rows_per_distinct
        |FROM events
        |WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q18_windowed_counts" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes',
        |   CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q41_stateful_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |s AS (SELECT user_id,
        |  CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |       WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id))
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin,

    // mirrors q164: DuckDB's 0-based dayofweek maps to Spark's 1-based
    "q164_seasonality" ->
      """WITH c AS (
        |  SELECT
        |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INTEGER) AS dow,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
        |SELECT dow, hour, n,
        |  round(CAST(n AS DOUBLE) / tt, 6) AS share
        |FROM c CROSS JOIN t""".stripMargin,

    // mirrors q160: q105's greedy funnel chain, n_completed histogram,
    // reached = Σ c over n_completed >= step, rates as exact quotients
    "q160_conversion_curve" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id),
        |f AS (
        |  SELECT CASE WHEN t3 IS NOT NULL THEN 3
        |              WHEN t2 IS NOT NULL THEN 2
        |              ELSE 1 END AS n_completed
        |  FROM s1
        |  LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s2.user_id = s3.user_id),
        |h AS (SELECT n_completed, CAST(count(*) AS BIGINT) AS c
        |  FROM f GROUP BY 1),
        |st AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS step,
        |  unnest(['view', 'click', 'purchase']) AS step_name),
        |r AS (
        |  SELECT st.step, st.step_name,
        |    CAST(coalesce(sum(h.c), 0) AS BIGINT) AS n_users
        |  FROM st LEFT JOIN h ON h.n_completed >= st.step
        |  GROUP BY 1, 2),
        |x AS (SELECT step, step_name, n_users,
        |  max(CASE WHEN step = 1 THEN n_users END) OVER () AS n1,
        |  lag(n_users) OVER (ORDER BY step) AS prev FROM r)
        |SELECT step, step_name, n_users,
        |  CASE WHEN n1 = 0 THEN NULL
        |    ELSE round(CAST(n_users AS DOUBLE) / n1, 6) END
        |    AS rate_vs_first,
        |  CASE WHEN prev IS NULL OR prev = 0 THEN NULL
        |    ELSE round(CAST(n_users AS DOUBLE) / prev, 6) END
        |    AS rate_vs_prev
        |FROM x""".stripMargin,

    // mirrors q105: the same greedy chained-min construction — every ts
    // compared at microsecond precision (CAST truncates the ns parquet
    // type exactly like the Spark loader)
    // mirrors q177: q105's greedy funnel chain, floored whole-second
    // latency for completers, q101's type-1 histogram quantiles
    "q177_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id),
        |lat AS (
        |  SELECT CAST(floor(CAST(epoch_us(t3) - epoch_us(s1.t1)
        |    AS DOUBLE) / 1000000) AS BIGINT) AS latency_s
        |  FROM s3 JOIN s1 USING (user_id)),
        |h AS (SELECT latency_s, count(*) AS c FROM lat GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
        |cum AS (
        |  SELECT latency_s, n, sum(c) OVER (ORDER BY latency_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h CROSS JOIN t)
        |SELECT p, min(latency_s) AS latency_s,
        |  CAST(min(n) AS BIGINT) AS n_users
        |FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS p)
        |WHERE cm >= ceil(p * n) GROUP BY p""".stripMargin,

    "q105_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT s1.user_id,
        |  CAST(epoch_ms(t1) AS BIGINT) AS t_view,
        |  CAST(epoch_ms(t2) AS BIGINT) AS t_click,
        |  CAST(epoch_ms(t3) AS BIGINT) AS t_purchase,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            ELSE 1 END AS INTEGER) AS n_completed
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s2.user_id = s3.user_id""".stripMargin,

    // mirrors q144: lag+cumsum sessionize, floor'd whole-second
    // durations, the type-1 ceil(p*n) quantile rule on the histogram
    "q144_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    event_id FROM events),
        |l AS (
        |  SELECT user_id, tsu, event_id,
        |    CASE WHEN lag(tsu) OVER w IS NULL THEN 1
        |         WHEN tsu - lag(tsu) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT user_id, tsu,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS session_id
        |  FROM l),
        |g AS (
        |  SELECT user_id, session_id,
        |    CAST(floor((max(tsu) - min(tsu)) / 1000000) AS BIGINT)
        |      AS duration_s
        |  FROM s GROUP BY 1, 2),
        |hist AS (SELECT duration_s, count(*) AS c FROM g GROUP BY 1),
        |cum AS (SELECT duration_s,
        |  sum(c) OVER (ORDER BY duration_s) AS cm FROM hist),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
        |ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
        |SELECT ps.p, min(cum.duration_s) AS duration_s,
        |  tot.n AS n_sessions
        |FROM cum CROSS JOIN tot CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY ps.p, tot.n""".stripMargin,

    // mirrors q155: observed-day counts, trailing 7-row window, single
    // IEEE quotients; first day's pct_change is null
    "q155_rolling_volume" ->
      """WITH d AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
        |SELECT day, n,
        |  CAST(count(*) OVER w AS BIGINT) AS win_days,
        |  CAST(sum(n) OVER w AS BIGINT) AS win_total,
        |  round(CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w, 6)
        |    AS win_avg,
        |  CASE WHEN lag(n) OVER (ORDER BY day) IS NULL THEN NULL
        |    ELSE round((CAST(n AS DOUBLE) - lag(n) OVER (ORDER BY day))
        |      / lag(n) OVER (ORDER BY day), 6)
        |  END AS pct_change
        |FROM d
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |""".stripMargin,

    "q126_transition_times" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    lag(event_type) OVER w AS pt,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS pts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT pt || '>' || event_type AS transition, tsu - pts AS gap_us
        |  FROM e WHERE pt IS NOT NULL),
        |h AS (SELECT transition, gap_us, count(*) AS c FROM g
        |  GROUP BY 1, 2),
        |t AS (SELECT transition, count(*) AS n FROM g GROUP BY 1),
        |cum AS (
        |  SELECT h.transition, gap_us, n,
        |    sum(c) OVER (PARTITION BY h.transition ORDER BY gap_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h JOIN t ON h.transition = t.transition)
        |SELECT transition, min(gap_us) AS quantile,
        |  CAST(min(n) AS BIGINT) AS n
        |FROM cum WHERE cm >= ceil(0.5 * n)
        |GROUP BY transition""".stripMargin,

    // mirrors q126: lag gaps per user (ORDER BY ts, event_id), then the
    // q101 discrete-quantile rule per transition
    // mirrors q151: per-user lag ordered by (ts, event_id), (from, to)
    // cell counts, from-totals re-aggregated, one exact quotient
    "q151_transition_matrix" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, f.n_from,
        |  round(CAST(c.n AS DOUBLE) / f.n_from, 6) AS prob
        |FROM c JOIN f USING (from_type)""".stripMargin,

    // mirrors q124: per-user ordered sequences (ORDER BY ts, event_id —
    // the q115 tie convention), 3-windows, count, top-10
    "q124_event_paths" ->
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT array_to_string(seq[i:i+2], '>') AS path
        |  FROM seqs, unnest(generate_series(1, len(seq) - 2)) AS u(i)
        |  WHERE len(seq) >= 3)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_paths
        |FROM g GROUP BY 1
        |ORDER BY n_paths DESC, path LIMIT 10""".stripMargin,

    // mirrors q110: a day d credits the windows ending on d..d+6; BETWEEN
    // range join against observed days replaces the explode; dau is the
    // distinct count restricted to d = end day (CASE → NULL ignored by
    // count distinct in both engines)
    "q110_rolling_active" ->
      """WITH au AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d AS day FROM au)
        |SELECT days.day,
        |  CAST(count(DISTINCT CASE WHEN au.d = days.day THEN au.user_id
        |    END) AS BIGINT) AS dau,
        |  CAST(count(DISTINCT au.user_id) AS BIGINT) AS wau
        |FROM au JOIN days ON days.day BETWEEN au.d AND au.d + 6
        |GROUP BY days.day""".stripMargin,

    // mirrors q106: both engines truncate to Monday-start weeks; offsets
    // are exact day differences between week starts divided by 7
    "q106_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |c AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY user_id),
        |x AS (
        |  SELECT DISTINCT e.user_id,
        |    CAST(date_trunc('week', d0) AS DATE) AS cohort_week,
        |    CAST(date_diff('day', date_trunc('week', d0),
        |      date_trunc('week', d)) // 7 AS INTEGER) AS week_offset
        |  FROM e JOIN c ON e.user_id = c.user_id)
        |SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM x GROUP BY 1, 2""".stripMargin,

    // mirrors q179: whole-day ages against the frame's max ts, weight
    // 0.5^(age/3), identical double association (value * weight summed)
    "q179_decayed_engagement" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    CAST(floor(CAST(
        |      (SELECT max(epoch_us(ts)) FROM events
        |       WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |         AND value IS NOT NULL) - epoch_us(ts)
        |      AS DOUBLE) / 86400000000) AS DOUBLE) AS age_days
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS raw_value,
        |  round(sum(value * pow(0.5, age_days / 3.0)), 6)
        |    AS decayed_value
        |FROM r GROUP BY user_id""".stripMargin,

    "q293_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
        |  FROM events),
        |d AS (
        |  SELECT *, tsu - lag(tsu) OVER
        |    (PARTITION BY user_id ORDER BY tsu, event_id) AS gap
        |  FROM e)
        |SELECT event_id, user_id, tsu FROM d
        |WHERE gap IS NULL OR gap > 600000000""".stripMargin,

    "q294_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    CAST(round(value * 100, 0) AS BIGINT) AS q
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |d AS (
        |  SELECT *, COALESCE(lead(tsu) OVER
        |    (PARTITION BY user_id ORDER BY tsu, event_id) - tsu, 0) AS dt
        |  FROM e)
        |SELECT user_id, CAST(sum(q * dt) AS BIGINT) AS twa_num,
        |  max(tsu) - min(tsu) AS span,
        |  CASE WHEN max(tsu) - min(tsu) > 0 THEN
        |    round(CAST(sum(q * dt) AS DOUBLE)
        |      / (max(tsu) - min(tsu)) / 100, 6) END AS twa
        |FROM d GROUP BY user_id""".stripMargin
  )
}
