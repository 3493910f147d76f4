package graft.algos

import graft.core.Algorithm
import graft.expr.PartitionCriteria
import graft.fsops.FsOps
import graft.io.{AtomicWriter, DataFormat, LoadMode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialization family: persist a (possibly partition-scoped) view of a
  * source into a versioned target directory, retaining N previous versions.
  *
  * Reference: src/main/scala/com/adidas/analytics/algo/Materialization.scala
  * — three variants:
  *  - FullMaterialization: whole source (:34-46)
  *  - RangeMaterialization: partition column between [from, to] (:48-62)
  *  - QueryMaterialization: explicit partition criteria list (:64-76)
  *
  * The reference filters with Row=>Boolean closures; here the range/criteria
  * are Column predicates, so partition pruning + parquet min/max skipping
  * apply — at 100 TB a RangeMaterialization of one month touches only that
  * month's directories.
  */
sealed trait MaterializationScope {
  def toFilter: Option[Column]
}
object MaterializationScope {
  case object Full extends MaterializationScope {
    def toFilter: Option[Column] = None
  }
  case class Range(column: String, from: Any, to: Any)
      extends MaterializationScope {
    def toFilter: Option[Column] = Some(col(column).between(lit(from), lit(to)))
  }
  case class Query(criteria: PartitionCriteria.Criteria)
      extends MaterializationScope {
    def toFilter: Option[Column] = Some(PartitionCriteria.toColumn(criteria))
  }
}

case class MaterializationParams(
    sourceDir: String,
    targetBaseDir: String,
    scope: MaterializationScope,
    targetPartitions: Seq[String] = Seq.empty,
    outputFilesNum: Option[Int] = None,
    versionsToRetain: Int = 1)

class Materialization(val spark: SparkSession, fsOps: FsOps,
    p: MaterializationParams) extends Algorithm {

  override def read(): Vector[DataFrame] =
    Vector(DataFormat.Parquet.read(spark,
      Map("basePath" -> p.sourceDir), None, p.sourceDir))

  override def transform(dfs: Vector[DataFrame]): Vector[DataFrame] =
    dfs.map(df => p.scope.toFilter.fold(df)(df.filter))

  override def write(dfs: Vector[DataFrame]): Vector[DataFrame] = {
    // versioned dir: <base>/data_<timestamp>; newest wins; retention prunes
    // old versions (reference: Materialization.scala:112-119)
    val versionDir = fsOps.timestampedDir(s"${p.targetBaseDir}/data")
    val writer = new AtomicWriter(fsOps, p.targetPartitions, p.outputFilesNum)
    dfs.foreach(df =>
      writer.write(df, DataFormat.Parquet, versionDir, LoadMode.OverwriteTable))
    Materialization.versionsIn(fsOps, p.targetBaseDir)
      .dropRight(p.versionsToRetain + 1)
      .foreach(v => fsOps.deleteAll(s"${p.targetBaseDir}/$v"))
    dfs
  }

  /** Path of the current (newest) COMPLETE materialized version. */
  def currentVersion: Option[String] =
    Materialization.versionsIn(fsOps, p.targetBaseDir).lastOption
      .map(v => s"${p.targetBaseDir}/$v")
}

object Materialization {
  /** Exactly `data_<17-digit timestamp>` — leftover `data_<ts>_tmp_<ts>` /
    * `_backup_` dirs from a failed run must never be mistaken for a
    * version (they'd sort last and be served as current).
    */
  private val VersionDir = "^data_\\d{17}$".r

  private[algos] def versionsIn(fsOps: FsOps, base: String): Seq[String] =
    fsOps.ls(base).filter(v => VersionDir.matches(v)).sorted
}
