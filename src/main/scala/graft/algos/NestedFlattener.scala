package graft.algos

import graft.expr.SchemaOps
import org.apache.spark.sql.DataFrame

/** Flatten deeply nested semi-structured data into a flat relational shape
  * (reference: src/main/scala/com/adidas/analytics/algo/NestedFlattener.scala:64-205):
  * 1. scrub problematic chars from nested field names;
  * 2. iteratively expand structs to `parent__child` columns and explode
  *    arrays (explode_outer — null/empty preserving), with an opt-in
  *    "side-flatten" that turns fixed-size arrays into indexed columns
  *    instead of rows.
  * MapType is not handled, matching the reference's known edge.
  */
object NestedFlattener {
  def apply(df: DataFrame,
      charsToReplace: String = "[.:#]+", replacement: String = "_",
      renames: Map[String, String] = Map.empty,
      sideFlatten: Map[String, Int] = Map.empty): DataFrame =
    SchemaOps.flatten(
      SchemaOps.cleanNames(df, charsToReplace, replacement, renames),
      sideFlatten = sideFlatten)
}
