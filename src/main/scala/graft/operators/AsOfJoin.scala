package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the single latest right row with
  * rightTime <= leftTime within the same key — the standard time-series
  * enrichment operator (absent from both Spark and the reference; an
  * extension).
  *
  * Implementation (round 10, sort-fill): tag each side, union on
  * (key, time, side), and fill every left row with the last non-null
  * right payload in a single `last(..., ignoreNulls)` window running over
  * rows clustered by key and ordered by time. Right rows sort BEFORE left
  * rows at an equal timestamp, so the match predicate is inclusive
  * (rightTime <= leftTime); equal right timestamps resolve to the largest
  * `tieBreak` for cross-engine determinism.
  *
  * Scale: the intermediate is |left| + |right| rows — ONE hash exchange on
  * the key and one sort, with NO join node at all. The previous
  * formulation (kept as [[pairExpansion]] for the probe) joined on the key
  * with the temporal predicate and ranked matches per left row, which
  * materializes |left| × matches-per-key candidate rows before the window
  * discards all but one — at a 100 TB key history that intermediate IS the
  * operator's cost, and it grows with history depth even when the answer
  * does not. The sort-fill cost is history-depth-linear and shuffles each
  * row exactly once (AsOfProbe measures the gap). For a pathologically hot
  * key (one key = one task), pre-split the key by coarse time bucket and
  * seed each bucket with its predecessor's last right row.
  */
object AsOfJoin {

  /** Latest right row at or before each left row's time, per key
    * (`direction = "backward"`, the default) — or the EARLIEST right row
    * at or after it (`direction = "forward"`, the next-event lookup; same
    * plan, the sort just runs time-descending).
    *
    * Output columns: every left column, then every right column (null when
    * no right row qualifies and `joinType` is "left"; unmatched left rows
    * are dropped when "inner"). Right rows with a null `rightTime` never
    * match; left rows with a null `leftTime` match nothing. Equal right
    * times resolve to the largest `tieBreak` in both directions.
    */
  def apply(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTime: Column, rightTime: Column,
      tieBreak: Column, joinType: String = "left",
      direction: String = "backward"): DataFrame = {
    require(Seq("left", "inner").contains(joinType),
      s"joinType must be left|inner, got: $joinType")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got: $direction")
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val rSide = right.filter(rightTime.isNotNull).select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      tieBreak.as("__tb"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    // left rows carry a null tie-break (typed to the right side's) — they
    // never win a fill; only right rows are non-null in the filled column
    val lSide = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
      lit(null).cast(rSide.schema("__tb").dataType).as("__tb"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    // backward scans time ascending (last right seen = max rt <= lt);
    // forward scans descending (last right seen = min rt >= lt). Right
    // rows sort before left at an equal time either way -> inclusive.
    val timeOrd =
      if (direction == "backward") col("__t").asc_nulls_first
      else col("__t").desc_nulls_first
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrd, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val kept = joinType match {
      case "inner" => filled.filter(col("__m").isNotNull)
      case _       => filled
    }
    kept.select(
      left.columns.map(c => col("__l").getField(c).as(c)).toIndexedSeq ++
        right.columns.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** The round-9 formulation, retained as the probe baseline: equi-join on
    * the key with the temporal predicate, then a row_number window keeps
    * the latest match per left row. Correct, but the intermediate is
    * |left| × matches-per-key — AsOfProbe measures it against [[apply]].
    */
  def pairExpansion(left: DataFrame, right: DataFrame, leftKey: Column,
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
