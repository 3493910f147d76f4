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
  *
  * MapType: by default maps pass through untouched, matching the
  * reference's silent ignore (NestedFlattener.scala:73-93). `mapFlatten`
  * opts a column IN to `name__key` expansion — a deliberate divergence
  * (exceed): the reference leaves those columns unreadable for DSV sinks.
  * Maps nested inside structs surface under their flattened
  * `parent__map` name first, so that is the name to list. Key discovery
  * and its scale contract live in [[SchemaOps.flattenMap]].
  */
object NestedFlattener {
  def apply(df: DataFrame,
      charsToReplace: String = "[.:#]+", replacement: String = "_",
      renames: Map[String, String] = Map.empty,
      sideFlatten: Map[String, Int] = Map.empty,
      mapFlatten: Seq[String] = Nil): DataFrame = {
    val flat = SchemaOps.flatten(
      SchemaOps.cleanNames(df, charsToReplace, replacement, renames),
      sideFlatten = sideFlatten)
    mapFlatten.foldLeft(flat)((d, c) => SchemaOps.flattenMap(d, c))
  }
}
