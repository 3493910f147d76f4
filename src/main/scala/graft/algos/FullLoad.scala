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
    readerOptions: Map[String, String] = Map.empty)

class FullLoad(val spark: SparkSession, fsOps: FsOps, p: FullLoadParams)
    extends Algorithm {

  override def read(): Vector[DataFrame] = {
    // the partition components are derived, not read — drop them from the
    // reader schema (reference: CatalogTableManager.getSchemaSafely)
    val readSchema = p.targetSchema.map { s =>
      StructType(s.fields.filterNot(f => p.targetPartitions.contains(f.name)))
    }
    Vector(p.format.read(spark, Map("mode" -> p.readerMode) ++ p.readerOptions,
      readSchema, p.sourceDir))
  }

  override def transform(dfs: Vector[DataFrame]): Vector[DataFrame] =
    dfs.map { df =>
      val withParts = p.partitionSourceColumn match {
        case Some(src) if p.targetPartitions.nonEmpty =>
          DateComponents.withComponents(df, src, p.partitionSourceFormat,
            p.targetPartitions)
        case _ => df
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
