package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-dispatched read/write for the three lake formats the reference
  * supports (reference: src/main/scala/com/adidas/analytics/util/DataFormat.scala:16-67):
  * Parquet, DSV (delimiter-separated), JSON. Schema is enforced when given,
  * inferred otherwise; reader mode (FAILFAST / PERMISSIVE / DROPMALFORMED)
  * flows through options (reference: config/loads/LoadConfiguration.scala:60-70).
  */
sealed trait DataFormat {
  def read(spark: SparkSession, options: Map[String, String],
      schema: Option[StructType], paths: String*): DataFrame
  def write(writer: DataFrameWriter[Row], path: String): Unit
}

object DataFormat {
  case object Parquet extends DataFormat {
    def read(spark: SparkSession, options: Map[String, String],
        schema: Option[StructType], paths: String*): DataFrame = {
      val r = withSchema(spark.read.options(options), schema)
      r.parquet(paths: _*)
    }
    def write(writer: DataFrameWriter[Row], path: String): Unit =
      writer.parquet(path)
  }

  /** DSV: csv with configurable delimiter; inferSchema only when no schema
    * given (reference DataFormat.scala:32-48).
    */
  case class Dsv(delimiter: String = "|", hasHeader: Boolean = false)
      extends DataFormat {
    private def base(opts: Map[String, String]) = Map(
      "sep" -> delimiter, "header" -> hasHeader.toString) ++ opts
    def read(spark: SparkSession, options: Map[String, String],
        schema: Option[StructType], paths: String*): DataFrame = {
      val opts = base(options) ++
        (if (schema.isEmpty) Map("inferSchema" -> "true") else Map.empty)
      withSchema(spark.read.options(opts), schema).csv(paths: _*)
    }
    def write(writer: DataFrameWriter[Row], path: String): Unit =
      writer.options(Map("sep" -> delimiter, "header" -> hasHeader.toString))
        .csv(path)
  }

  /** ORC: beyond-parity format arm (the reference supports parquet/dsv/json
    * only); columnar like parquet, same pushdown/pruning behavior.
    */
  case object Orc extends DataFormat {
    def read(spark: SparkSession, options: Map[String, String],
        schema: Option[StructType], paths: String*): DataFrame =
      withSchema(spark.read.options(options), schema).orc(paths: _*)
    def write(writer: DataFrameWriter[Row], path: String): Unit =
      writer.orc(path)
  }

  case object Json extends DataFormat {
    def read(spark: SparkSession, options: Map[String, String],
        schema: Option[StructType], paths: String*): DataFrame =
      withSchema(spark.read.options(options), schema).json(paths: _*)
    def write(writer: DataFrameWriter[Row], path: String): Unit =
      writer.json(path)
  }

  private def withSchema(r: DataFrameReader,
      schema: Option[StructType]): DataFrameReader =
    schema.fold(r)(r.schema)

  def apply(name: String, delimiter: String = "|",
      hasHeader: Boolean = false): DataFormat =
    name.toLowerCase match {
      case "parquet" => Parquet
      case "dsv" | "csv" => Dsv(delimiter, hasHeader)
      case "json" => Json
      case "orc" => Orc
      case other => throw new IllegalArgumentException(s"format: $other")
    }
}
