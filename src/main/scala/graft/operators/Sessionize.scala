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
}
