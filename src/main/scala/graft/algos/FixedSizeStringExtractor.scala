package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField}

/** Unpack fixed-width records packed in a single string column into typed
  * columns (reference: src/main/scala/com/adidas/analytics/algo/FixedSizeStringExtractor.scala:30-60).
  *
  * The reference uses a Scala UDF per field; here each field is
  * `trim(substring(...))` with empty→null and a cast — pure codegen'd
  * Column expressions, no serialization boundary in the hot loop.
  */
object FixedSizeStringExtractor {

  /** Field spec: target column, 1-based start, inclusive end, type. */
  case class FieldSpec(name: String, start: Int, end: Int, dataType: DataType)

  def extractField(source: Column, f: FieldSpec): Column = {
    val raw = trim(substring(source, f.start, f.end - f.start + 1))
    when(length(raw) === 0, lit(null)).otherwise(raw).cast(f.dataType)
      .as(f.name)
  }

  def apply(df: DataFrame, sourceCol: String, fields: Seq[FieldSpec],
      keepCols: Seq[String] = Seq.empty): DataFrame = {
    val kept = keepCols.map(col)
    val extracted = fields.map(f => extractField(col(sourceCol), f))
    df.select(kept ++ extracted: _*)
  }
}
