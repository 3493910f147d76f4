package graft.algos

import graft.core.Algorithm
import graft.expr.{DateComponents, SchemaOps}
import graft.fsops.FsOps
import graft.io.{AtomicWriter, DataFormat, LoadMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Full snapshot load: read a landing drop (DSV/Parquet/JSON), optionally
  * derive date partition components, enforce the target schema, and
  * atomically replace the target directory — keeping the previous content
  * restorable on failure.
  *
  * Behavior per reference: src/main/scala/com/adidas/analytics/algo/loads/FullLoad.scala:24-82
  * (read with FAILFAST default, reshape pipeline, write to timestamped dir +
  * catalog swap with rollback). Our write path delegates the swap/rollback to
  * [[AtomicWriter]] over plain directories; a metastore swap is layered on by
  * the caller when a catalog table is in play.
  *
  * Scale: the transform chain is pure narrow Column work (no shuffle until
  * the partition-aligned repartition before write); the scan carries the
  * enforced schema so unused landing columns are pruned at the source.
  */
/** Optional pre-reshaping tasks, composed ahead of the date-partition and
  * schema-enforcement steps in [[FullLoad.transform]] — the reference's
  * DataReshapingTask chain (reference: algo/shared/DataReshapingTask.scala:25-42,
  * wired into FullLoad at algo/loads/FullLoad.scala:36-45): flatten nested
  * structures first, then pivot long→wide, then derive date partitions,
  * then cast to the target schema.
  */
case class FlattenTask(
    charsToReplace: String = "[.:#]+",
    replacement: String = "_",
    sideFlatten: Map[String, Int] = Map.empty)

case class TransposeTask(
    groupByColumns: Seq[String],
    pivotColumn: String,
    aggregationColumn: String)

case class FullLoadParams(
    sourceDir: String,
    targetDir: String,
    format: DataFormat,
    targetSchema: Option[StructType] = None,
    partitionSourceColumn: Option[String] = None,
    partitionSourceFormat: String = "yyyyMMdd",
    targetPartitions: Seq[String] = Seq.empty,
    readerMode: String = "FAILFAST",
    outputFilesNum: Option[Int] = Some(10),
    readerOptions: Map[String, String] = Map.empty,
    flattenTask: Option[FlattenTask] = None,
    transposeTask: Option[TransposeTask] = None,
    /** Explicit READ schema for reshaped sources — a nested/long landing
      * drop cannot be read with the flat/wide target schema (the reference
      * models this as the optional json `schema` param,
      * FullLoadConfiguration.scala:75-79). None + reshaping tasks → infer.
      */
    readSchema: Option[StructType] = None,
    /** PERMISSIVE-mode corrupt-record channel (reference:
      * util/CatalogTableManager.scala:135-136): append a StringType
      * `_corrupt_record` column to the read schema so malformed rows
      * survive with their raw text captured instead of dissolving into
      * all-null rows.
      */
    addCorruptRecordColumn: Boolean = false)

object FullLoad {
  val CorruptRecordColumn = "_corrupt_record"
}

class FullLoad(val spark: SparkSession, fsOps: FsOps, p: FullLoadParams)
    extends Algorithm {

  override def read(): Vector[DataFrame] = {
    // the partition components are derived, not read — drop them from the
    // reader schema (reference: CatalogTableManager.getSchemaSafely). With
    // reshaping tasks the source shape differs from the target: use the
    // explicit readSchema or infer.
    val schemaForRead0 = p.readSchema.orElse {
      if (p.flattenTask.nonEmpty || p.transposeTask.nonEmpty) None
      else p.targetSchema.map { s =>
        StructType(s.fields.filterNot(f => p.targetPartitions.contains(f.name)))
      }
    }
    val corrupt = p.addCorruptRecordColumn &&
      p.readerMode.equalsIgnoreCase("PERMISSIVE")
    val schemaForRead =
      if (corrupt) schemaForRead0.map(s =>
        if (s.fieldNames.contains(FullLoad.CorruptRecordColumn)) s
        else StructType(s.fields :+
          org.apache.spark.sql.types.StructField(FullLoad.CorruptRecordColumn,
            org.apache.spark.sql.types.StringType)))
      else schemaForRead0
    val corruptOpts =
      if (corrupt)
        Map("columnNameOfCorruptRecord" -> FullLoad.CorruptRecordColumn)
      else Map.empty
    Vector(p.format.read(spark,
      Map("mode" -> p.readerMode) ++ corruptOpts ++ p.readerOptions,
      schemaForRead, p.sourceDir))
  }

  /** Pivot values come from the target schema minus group-by and partition
    * columns — the reference's explicit-value derivation, which avoids
    * pivot's extra distinct-scan job (reference: algo/Transpose.scala:64-80).
    */
  private def applyTranspose(df: DataFrame, t: TransposeTask): DataFrame = {
    val values = p.targetSchema match {
      case Some(s) => s.fieldNames.toSeq
        .filterNot(t.groupByColumns.contains)
        .filterNot(p.targetPartitions.contains)
      case None => throw new IllegalArgumentException(
        "transpose task needs target_schema to derive pivot values")
    }
    Transpose(df, t.groupByColumns, t.pivotColumn, values, t.aggregationColumn)
  }

  override def transform(dfs: Vector[DataFrame]): Vector[DataFrame] =
    dfs.map { df =>
      val flat = p.flattenTask.fold(df)(f =>
        NestedFlattener(df, f.charsToReplace, f.replacement,
          sideFlatten = f.sideFlatten))
      val wide = p.transposeTask.fold(flat)(t => applyTranspose(flat, t))
      val withParts = p.partitionSourceColumn match {
        case Some(src) if p.targetPartitions.nonEmpty =>
          DateComponents.withComponents(wide, src, p.partitionSourceFormat,
            p.targetPartitions)
        case _ => wide
      }
      p.targetSchema.fold(withParts)(s => SchemaOps.enforce(withParts, s))
    }

  override def write(dfs: Vector[DataFrame]): Vector[DataFrame] = {
    val writer = new AtomicWriter(fsOps, p.targetPartitions, p.outputFilesNum)
    dfs.foreach(df =>
      writer.write(df, DataFormat.Parquet, p.targetDir, LoadMode.OverwriteTable))
    dfs
  }
}
