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
}
