package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * rightTime <= leftTime within the same key — the standard time-series
  * enrichment operator (absent from both Spark and the reference; an
  * extension).
  *
  * Implementation: equi-join on the key (hash-partitioned, broadcast when
  * small) with the temporal predicate as a join condition, then a
  * row_number window keeps the latest match per left row. Catalyst plans
  * key-partitioned SMJ/SHJ — never a cartesian product; the window runs on
  * data already clustered by the join. Tie-break on `tieBreak` for
  * determinism.
  *
  * Scale note: for heavily repeated keys the intermediate is
  * |left| × matches-per-key; the mitigation is bucketing time into coarse
  * ranges before the join (add a range column to the key) — not needed at
  * current skew.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTime: Column, rightTime: Column,
      leftId: Column, tieBreak: Column, joinType: String = "left")
      : DataFrame = {
    val joined = left.join(right,
      leftKey === rightKey && rightTime <= leftTime, joinType)
    val w = Window.partitionBy(leftId)
      .orderBy(rightTime.desc_nulls_last, tieBreak.desc_nulls_last)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }
}
