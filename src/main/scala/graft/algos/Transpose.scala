package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide pivot (reference: src/main/scala/com/adidas/analytics/algo/Transpose.scala:64-80):
  * `groupBy(groupCols).pivot(pivotCol, explicitValues).agg(agg(aggCol))`,
  * pre-filtered to non-null pivot keys.
  *
  * The explicit value list matters at scale: without it Spark runs an extra
  * distinct-scan job over the full input to discover pivot values
  * (reference derives the list from the target schema; we require it from
  * the caller for the same reason).
  */
object Transpose {
  def apply(df: DataFrame, groupCols: Seq[String], pivotCol: String,
      pivotValues: Seq[Any], aggCol: String,
      agg: Column => Column = first(_)): DataFrame =
    df.filter(col(pivotCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(agg(col(aggCol)))
}
