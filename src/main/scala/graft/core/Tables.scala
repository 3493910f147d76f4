package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated test tables (TESTDATA.md): one parquet
  * file per table under an sf directory. Centralized so every query reads
  * through the same path (schema-pruned parquet scans; Catalyst pushes
  * filters/projections into the scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (read as nanos-long
    * under Session's nanosAsLong, floored to µs with integer division —
    * double division would lose precision at 1e18 magnitudes) and as
    * TIMESTAMP(MICROS) without the UTC flag (read as TIMESTAMP_NTZ).
    * Normalize both to a session-zone TimestampType so every downstream
    * consumer — batch and streaming — sees one type; the session zone is
    * UTC, so the NTZ cast is a relabel, not a shift.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }
}
