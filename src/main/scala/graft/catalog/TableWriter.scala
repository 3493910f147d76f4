package graft.catalog

import graft.fsops.FsOps
import graft.io.{AtomicWriter, DataFormat, LoadMode}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Catalog-table write paths
  * (reference: src/main/scala/com/adidas/analytics/util/OutputWriter.scala:264-342):
  *  - [[saveToTable]]: `saveAsTable` with SaveMode, TRUNCATE-first on
  *    overwrite (keeps the table object + grants, unlike drop/recreate);
  *  - [[writeToTableLocation]]: resolve the table's LOCATION from the
  *    catalog, atomically install data there (partition backup/restore),
  *    then recover partition metadata and refresh — the path structured
  *    loads use so a failed write never leaves the metastore pointing at
  *    half-written data;
  *  - [[recreateTable]]: swap a table to a new location via a temp-table
  *    DDL dance with rollback (reference: CatalogTableManager.scala:87-99).
  */
object TableWriter {

  /** `insertInto` resolves columns by POSITION; align the DataFrame to the
    * table's declared column order first so a frame whose columns were
    * appended in a different order (e.g. after addMissingColumns) is not
    * silently written into the wrong columns.
    */
  private def alignedToTable(df: DataFrame, table: String): DataFrame =
    df.select(df.sparkSession.table(table).columns.map(col).toIndexedSeq: _*)

  def saveToTable(df: DataFrame, table: String, mode: LoadMode,
      partitions: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    val exists = spark.catalog.tableExists(table)
    mode match {
      case LoadMode.OverwriteTable if exists =>
        // TRUNCATE + insertInto keeps the table OBJECT (schema, grants,
        // properties); SaveMode.Overwrite saveAsTable would drop/recreate
        spark.sql(s"TRUNCATE TABLE $table")
        alignedToTable(df, table).write.mode(SaveMode.Append).insertInto(table)
      case LoadMode.OverwriteTable =>
        val w0 = df.write.mode(SaveMode.Overwrite)
        val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
        w.saveAsTable(table)
      case LoadMode.AppendUnionPartitions if exists =>
        alignedToTable(df, table).write.mode(SaveMode.Append).insertInto(table)
      case LoadMode.AppendUnionPartitions =>
        val w0 = df.write.mode(SaveMode.Append)
        val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
        w.saveAsTable(table)
      case other => throw new IllegalArgumentException(
        s"saveToTable supports OverwriteTable/AppendUnionPartitions, got $other")
    }
  }

  def writeToTableLocation(df: DataFrame, fsOps: FsOps, table: String,
      mode: LoadMode, partitions: Seq[String] = Seq.empty,
      outputFilesNum: Option[Int] = None): Unit = {
    val spark = df.sparkSession
    val location = CatalogOps.tableLocation(spark, table)
    new AtomicWriter(fsOps, partitions, outputFilesNum)
      .write(df, DataFormat.Parquet, stripScheme(location), mode)
    if (partitions.nonEmpty) CatalogOps.recoverPartitionsNative(spark, table)
    CatalogOps.refresh(spark, table)
  }

  /** The reference's metastore swap (reference: CatalogTableManager.scala:87-99):
    * recreate `table` at `newLocation` via a temp-table CREATE TABLE .. LIKE
    * dance — the old table can't be dropped before something holds its
    * definition — then recover partition metadata. Rollback restores the
    * table at its old location from whichever definition survived the
    * failure (the table itself or the temp), so the metastore never ends
    * pointing at half-swapped state (FailFastIntegrationTest behavior).
    */
  def recreateTableLike(spark: SparkSession, table: String,
      newLocation: String, targetPartitions: Seq[String] = Seq.empty): Unit = {
    val tmp = s"${table}_tmp"
    val oldLocation = CatalogOps.tableLocation(spark, table)
    def swap(location: String): Unit = {
      // the swap recreates the table object — drop the cached location
      CatalogOps.invalidateLocation(spark, table)
      spark.sql(s"CREATE TABLE IF NOT EXISTS $tmp LIKE $table LOCATION '$location'")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table LIKE $tmp LOCATION '$location'")
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      if (targetPartitions.nonEmpty)
        CatalogOps.recoverPartitionsNative(spark, table)
      CatalogOps.refresh(spark, table)
    }
    try swap(newLocation) catch {
      case e: Throwable =>
        try {
          CatalogOps.invalidateLocation(spark, table)
          if (spark.catalog.tableExists(table))
            CatalogOps.setTableLocation(spark, table, oldLocation)
          else if (spark.catalog.tableExists(tmp)) {
            spark.sql(
              s"CREATE TABLE IF NOT EXISTS $table LIKE $tmp LOCATION '$oldLocation'")
          }
          spark.sql(s"DROP TABLE IF EXISTS $tmp")
          if (spark.catalog.tableExists(table)) {
            if (targetPartitions.nonEmpty)
              CatalogOps.recoverPartitionsNative(spark, table)
            spark.catalog.refreshTable(table)
          }
        } catch { case restoreFailure: Throwable =>
          e.addSuppressed(restoreFailure)
        }
        throw e
    }
  }

  /** Point `table` at `newLocation` by recreating it (CREATE .. LIKE via
    * captured DDL), restoring the old location if the swap fails.
    */
  def recreateTable(spark: SparkSession, table: String,
      newLocation: String): Unit = {
    val oldLocation = CatalogOps.tableLocation(spark, table)
    try {
      CatalogOps.setTableLocation(spark, table, newLocation)
      CatalogOps.recoverPartitionsNative(spark, table)
      CatalogOps.refresh(spark, table)
    } catch {
      case e: Throwable =>
        CatalogOps.setTableLocation(spark, table, oldLocation)
        spark.catalog.refreshTable(table)
        throw e
    }
  }

  private def stripScheme(location: String): String =
    location.replaceFirst("^file:", "")
}
