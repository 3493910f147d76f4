package graft.core

import graft.algos._
import graft.config.JsonConfig
import graft.fsops.FsOps
import graft.io.DataFormat
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Name → algorithm dispatch, replacing the reference's string match in
  * AlgorithmFactory (reference: src/main/scala/com/adidas/analytics/AlgorithmFactory.scala:59-84).
  * Each factory takes (spark, fsOps, params-JSON) and returns a runnable
  * [[Algorithm]] (or a side-effecting job for the non-Spark ones).
  */
object AlgoRegistry {

  private def fmt(c: JsonConfig): DataFormat =
    DataFormat(c.getStringOpt("file_format").getOrElse("parquet"),
      c.getStringOpt("delimiter").getOrElse("|"),
      c.getBoolean("has_header"))

  private def schemaOf(c: JsonConfig, key: String): Option[StructType] =
    c.getOpt[Any](key).map {
      case m: Map[_, _] =>
        val json = new com.fasterxml.jackson.databind.ObjectMapper()
          .registerModule(
            new com.fasterxml.jackson.module.scala.DefaultScalaModule)
          .writeValueAsString(m)
        DataType.fromJson(json).asInstanceOf[StructType]
      case s: String => DataType.fromJson(s).asInstanceOf[StructType]
    }

  def create(name: String, spark: SparkSession, fsOps: FsOps,
      config: JsonConfig): Algorithm = name match {
    case "FullLoad" => new FullLoad(spark, fsOps, FullLoadParams(
      sourceDir = config.getString("source_dir"),
      targetDir = config.getString("target_dir"),
      format = fmt(config),
      targetSchema = schemaOf(config, "target_schema"),
      partitionSourceColumn = config.getStringOpt("partition_column"),
      partitionSourceFormat = config.getStringOpt("partition_column_format")
        .getOrElse("yyyyMMdd"),
      targetPartitions = config.getSeq[String]("target_partitions"),
      readerMode = config.getStringOpt("reader_mode").getOrElse("FAILFAST"),
      outputFilesNum = config.getIntOpt("output_files_num").orElse(Some(10))))
    case "AppendLoad" => new AppendLoad(spark, fsOps, AppendLoadParams(
      sourceDir = config.getString("source_dir"),
      targetDir = config.getString("target_dir"),
      headerDir = config.getString("header_dir"),
      format = fmt(config),
      targetSchema = schemaOf(config, "target_schema").getOrElse(
        throw new IllegalArgumentException("AppendLoad needs target_schema")),
      partitionRegexes = config.getSeq[String]("regex_filename"),
      targetPartitions = config.getSeq[String]("target_partitions"),
      readerMode = config.getStringOpt("reader_mode").getOrElse("DROPMALFORMED")))
    case "DeltaLoad" => new DeltaLoad(spark, fsOps, DeltaLoadParams(
      activeDir = config.getString("active_records_dir"),
      deltaDir = config.getString("delta_records_file_path"),
      format = fmt(config),
      businessKey = config.getSeq[String]("business_key"),
      technicalKey = config.getSeq[String]("technical_key"),
      targetPartitions = config.getSeq[String]("target_partitions")))
    case "DeltaMergeLoad" | "DeltaLakeLoad" =>
      new DeltaMergeLoad(spark, fsOps, DeltaMergeLoadParams(
        targetDir = config.getString("target_dir"),
        deltaDir = config.getString("source_dir"),
        format = fmt(config),
        businessKey = config.getSeq[String]("business_key"),
        technicalKey = config.getSeq[String]("technical_key"),
        partitionSourceColumn = config.getStringOpt("partition_column"),
        targetPartitions = config.getSeq[String]("target_partitions"),
        isInit = config.getBoolean("is_manual_repartitioning") == false &&
          config.getBoolean("init", default = false)))
    case "FullMaterialization" => new Materialization(spark, fsOps,
      MaterializationParams(
        sourceDir = config.getString("source_dir"),
        targetBaseDir = config.getString("target_dir"),
        scope = MaterializationScope.Full,
        targetPartitions = config.getSeq[String]("target_partitions"),
        outputFilesNum = config.getIntOpt("output_files_num"),
        versionsToRetain = config.getIntOpt("num_versions_to_retain")
          .getOrElse(1)))
    case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
  }
}
