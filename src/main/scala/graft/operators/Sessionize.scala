package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream in batch: a new session
  * starts when the time since the previous event of the same key exceeds
  * the gap. Classic lag + cumulative-sum over a per-key window — one
  * shuffle by key, then linear scans within partitions.
  */
object Sessionize {
  def apply(events: DataFrame, keyCol: String, tsMillis: Column,
      orderCol: String, gapMillis: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    events
      .withColumn("__ts", tsMillis)
      .withColumn("__new_session",
        when(col("__ts") - lag(col("__ts"), 1).over(byKey) > gapMillis, 1)
          .when(lag(col("__ts"), 1).over(byKey).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__ts", "__new_session")
  }

  /** Session-shape summary: sessionize, then one row of engagement
    * facts — session count, sessions per active user, the single-event
    * ("bounce") session share, and mean events per session — the
    * numbers an engagement review reads BEFORE the duration quantiles
    * ([[sessionStats]] answers "how long", this answers "how many and
    * how shallow"). One output row:
    * (n_users, n_sessions, n_bounce, sessions_per_user, bounce_rate,
    * events_per_session).
    *
    * Exactness: all counts are exact BIGINTs; the three ratios are
    * single IEEE quotients, round(…, 6).
    *
    * 100 TB shape: the sessionize window is the one key-partitioned
    * shuffle; (key, session) sizes collapse map-side; the summary is
    * one more map-side-combinable agg over the sessions frame.
    */
  def sessionSummary(events: DataFrame, keyCol: String, tsMillis: Column,
      orderCol: String, gapMillis: Long): DataFrame = {
    val sessions = apply(events, keyCol, tsMillis, orderCol, gapMillis)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("__n"))
    sessions.agg(
        countDistinct(col(keyCol)).as("n_users"),
        count(lit(1)).as("n_sessions"),
        coalesce(sum(when(col("__n") === 1, 1L).otherwise(0L)), lit(0L))
          .as("n_bounce"),
        coalesce(sum(col("__n")), lit(0L)).as("__events"))
      .select(col("n_users"), col("n_sessions"), col("n_bounce"),
        round(col("n_sessions").cast("double") / col("n_users"), 6)
          .as("sessions_per_user"),
        round(col("n_bounce").cast("double") / col("n_sessions"), 6)
          .as("bounce_rate"),
        round(col("__events").cast("double") / col("n_sessions"), 6)
          .as("events_per_session"))
  }

  /** Session-duration distribution summary: sessionize, reduce each
    * (key, session) to its whole-second duration
    * (floor((max−min)/1e6) of the µs clock — floor, not cast, so the
    * oracle's CAST-rounds-to-even never disagrees), then the exact
    * type-1 quantiles of that duration over ALL sessions — the
    * "how long is a session really" engagement report. One row per
    * requested p: (p, duration_s, n_sessions).
    *
    * `ts`/`gap` must share a unit (µs against the repo's event clock).
    *
    * 100 TB shape: the sessionize window is the one key-partitioned
    * shuffle; durations collapse sessions map-side; the quantile rides
    * [[Sampling.quantilesPerGroup]]'s histogram machinery — the
    * final window sees distinct whole-second durations, not sessions.
    */
  def sessionStats(events: DataFrame, keyCol: String, tsMicros: Column,
      orderCol: String, gapMicros: Long, ps: Seq[Double]): DataFrame = {
    val durations = apply(events, keyCol, tsMicros, orderCol, gapMicros)
      .withColumn("__tsu", tsMicros)
      .groupBy(col(keyCol), col("session_id"))
      .agg(floor((max(col("__tsu")) - min(col("__tsu"))) / 1000000)
        .cast("long").as("duration_s"))
      .withColumn("__all", lit("all"))
    Sampling.quantilesPerGroup(durations, "__all", "duration_s", ps)
      .select(col("p"), col("quantile").as("duration_s"),
        col("n").as("n_sessions"))
  }

  /** Debounce: keep only the FIRST event of each burst per key, where a
    * burst is a chain of events each within `gap` of its predecessor
    * (retransmits, double-clicks, sensor chatter). Exactly the
    * session-start rows of [[apply]] — chain semantics, so a long burst
    * collapses to one row no matter how long it lasts (the alternative
    * "gap from the last KEPT row" rule is an inherently sequential scan
    * neither Spark windows nor the SQL oracle can express). Output: the
    * input rows that survive, original columns only. Same 100 TB shape
    * as sessionize: one key-partitioned exchange, linear scans.
    */
  def debounce(events: DataFrame, keyCol: String, ts: Column,
      orderCol: String, gap: Long): DataFrame = {
    // time-ordered (orderCol is the equal-timestamp tie-break only)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(ts, col(orderCol))
    events
      .withColumn("__ts", ts)
      .withColumn("__keep",
        coalesce(col("__ts") - lag(col("__ts"), 1).over(byKey) > gap,
          lit(true)))
      .filter(col("__keep"))
      .drop("__ts", "__keep")
  }

  /** Time-weighted average of a step signal per key: each observation's
    * value HOLDS until the next one (the standard step/last-observation-
    * carried-forward reading of an event stream), so the mean over the
    * observed span weights each value by how long it held. Values are
    * quantized to integer `scale`-ths (cents at scale=100) so the
    * numerator Σ q_i·(t_{i+1}−t_i) is an exact BIGINT — bounded by
    * max(q)·span regardless of row count, because consecutive deltas
    * telescope to the span. Output per key: (key, twa_num, span, twa)
    * where twa = num/span/scale rounded to 6 — rows with a single
    * observation (span 0) report null twa.
    *
    * One key-partitioned exchange: the lead() window and the final
    * aggregate share the partitioning.
    */
  def timeWeightedAverage(events: DataFrame, keyCol: String, ts: Column,
      valueCol: Column, orderCol: String, scale: Int = 100): DataFrame = {
    // time-ordered (orderCol is the equal-timestamp tie-break only)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(ts, col(orderCol))
    events
      .filter(valueCol.isNotNull && ts.isNotNull)
      .withColumn("__ts", ts)
      .withColumn("__q", round(valueCol * scale, 0).cast("long"))
      .withColumn("__dt",
        coalesce(lead(col("__ts"), 1).over(byKey) - col("__ts"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(sum(col("__q") * col("__dt")).as("twa_num"),
        (max(col("__ts")) - min(col("__ts"))).as("span"))
      .select(col(keyCol), col("twa_num"), col("span"),
        when(col("span") > 0,
          round(col("twa_num").cast("double") / col("span") / scale, 6))
          .as("twa"))
  }
}
