package graft.algos

import graft.core.Algorithm
import graft.fsops.FsOps
import graft.io.{AtomicWriter, DataFormat, LoadMode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Append load: incrementally land new files into a partitioned target,
  * deriving partition values from the FILE NAME/PATH via configured regexes,
  * and persisting per-partition schema "header" files so later loads of the
  * same partition reuse the pinned schema.
  *
  * Behavior per reference: src/main/scala/com/adidas/analytics/algo/loads/AppendLoad.scala:87-309
  * (schema-grouped scans, regex partition extraction via regexp_extract over
  * input_file_name, header.json write). Differences, deliberate:
  *  - partition extraction is pure Column work (`input_file_name` +
  *    `regexp_extract`), no UDF (reference uses a path-strip UDF).
  *  - files with identical schema are read in ONE multi-path scan; the
  *    reference's per-group loop is kept (grouping by schema) but each group
  *    is a single distributed read.
  */
case class AppendLoadParams(
    sourceDir: String,
    targetDir: String,
    headerDir: String,
    format: DataFormat,
    targetSchema: StructType,
    /** regex per target partition, applied to the file path; group 1 is the
      * partition value (reference: AppendLoad.scala:230-239) */
    partitionRegexes: Seq[String],
    targetPartitions: Seq[String],
    readerMode: String = "DROPMALFORMED",
    readerOptions: Map[String, String] = Map.empty)

class AppendLoad(val spark: SparkSession, fsOps: FsOps, p: AppendLoadParams)
    extends Algorithm {

  private def partitionType(name: String): DataType =
    p.targetSchema.fields.find(_.name == name).map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)

  private def dataSchema: StructType =
    StructType(p.targetSchema.fields.filterNot(f =>
      p.targetPartitions.contains(f.name)))

  /** Group source files by schema: files whose partition already has a
    * header file use that pinned schema; the rest use the target schema
    * (reference: AppendLoad.scala:87-198 simplified to its semantics).
    */
  private def schemaForFile(file: String): StructType = {
    val partVals = p.targetPartitions.zip(p.partitionRegexes).map {
      case (c, re) => c + "=" + re.r.findFirstMatchIn(file)
        .map(m => if (m.groupCount >= 1) m.group(1) else m.matched).getOrElse("")
    }.mkString("/")
    val headerPath = s"${p.headerDir}/$partVals/header.json"
    if (fsOps.exists(headerPath))
      DataType.fromJson(fsOps.readFile(headerPath)).asInstanceOf[StructType]
    else dataSchema
  }

  override def read(): Vector[DataFrame] = {
    val files = fsOps.listFilesRecursive(p.sourceDir)
      .filterNot(f => f.endsWith("_SUCCESS") || f.contains("/."))
    val bySchema = files.groupBy(schemaForFile)
    bySchema.toVector.map { case (schema, group) =>
      p.format.read(spark, Map("mode" -> p.readerMode) ++ p.readerOptions,
        Some(schema), group: _*)
    }
  }

  override def transform(dfs: Vector[DataFrame]): Vector[DataFrame] =
    dfs.map { df =>
      val withParts = p.targetPartitions.zip(p.partitionRegexes)
        .foldLeft(df.withColumn("__file", input_file_name())) {
          case (d, (c, re)) =>
            d.withColumn(c,
              regexp_extract(col("__file"), re, 1).cast(partitionType(c)))
        }
      withParts.drop("__file")
    }

  override def write(dfs: Vector[DataFrame]): Vector[DataFrame] = {
    val writer = new AtomicWriter(fsOps, p.targetPartitions, None)
    dfs.foreach { df =>
      writer.write(df, DataFormat.Parquet, p.targetDir,
        LoadMode.OverwritePartitions)
      writeHeaders(df)
    }
    dfs
  }

  /** Persist header.json per affected partition (reference: AppendLoad.scala:267-288). */
  private def writeHeaders(df: DataFrame): Unit = {
    val dataJson = StructType(df.schema.fields.filterNot(f =>
      p.targetPartitions.contains(f.name))).prettyJson
    val parts = df.select(p.targetPartitions.map(col): _*).distinct()
      .collect()
    parts.foreach { r =>
      val dir = p.targetPartitions.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
      val path = s"${p.headerDir}/$dir/header.json"
      if (!fsOps.exists(path)) fsOps.writeFile(path, dataJson)
    }
  }
}
