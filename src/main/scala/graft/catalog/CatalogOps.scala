package graft.catalog

import org.apache.spark.sql.SparkSession

/** Catalog/DDL surface (reference: src/main/scala/com/adidas/analytics/util/CatalogTableManager.scala,
  * util/RecoverPartitionsNative.scala, util/RecoverPartitionsCustom.scala,
  * algo/core/TableStatistics.scala). Thin `spark.sql`/`spark.catalog`
  * wrappers — the semantics live in the metastore.
  */
object CatalogOps {

  /** DESCRIBE FORMATTED is a metastore round-trip (a Derby/Thrift RPC, not
    * a Spark job) that algorithm write paths issue repeatedly for the same
    * table within one run; locations only change through [[setTableLocation]]
    * below, so a per-table cache with explicit invalidation is safe.
    * Keyed by session too — tests run several sessions per JVM.
    */
  // weak session keys: a static strong map would pin every test/CLI
  // session (and its cached tables) against GC for the JVM's lifetime
  private val locationCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]()

  private def perSession(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, String] =
    locationCache.synchronized {
      var m = locationCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, String]()
        locationCache.put(spark, m)
      }
      m
    }

  private[catalog] def invalidateLocation(spark: SparkSession,
      table: String): Unit =
    perSession(spark).remove(table)

  def tableLocation(spark: SparkSession, table: String): String =
    perSession(spark).computeIfAbsent(table, { t =>
      spark.sql(s"DESCRIBE FORMATTED $t").collect()
        .find(r => Option(r.getString(0)).exists(_.trim.equalsIgnoreCase("Location")))
        .map(_.getString(1).trim)
        .getOrElse(throw new IllegalStateException(s"no location for $t"))
    })

  def setTableLocation(spark: SparkSession, table: String,
      location: String): Unit = {
    invalidateLocation(spark, table)
    spark.sql(s"ALTER TABLE $table SET LOCATION '$location'")
  }

  /** Native partition recovery (reference: RecoverPartitionsNative.scala:11-13). */
  def recoverPartitionsNative(spark: SparkSession, table: String): Unit =
    spark.catalog.recoverPartitions(table)

  /** "Custom" recovery: generated ALTER TABLE ADD IF NOT EXISTS PARTITION
    * statements from the distinct partition values of the just-written data
    * (reference: RecoverPartitionsCustom.scala:23-31).
    */
  def recoverPartitionsCustom(spark: SparkSession, table: String,
      partitionValues: Seq[Seq[(String, Any)]]): Unit =
    partitionValues.foreach { spec =>
      val specSql = spec.map { case (c, v) =>
        v match {
          case s: String => s"$c='${s.replace("'", "''")}'"
          case other => s"$c=$other"
        }
      }.mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($specSql)")
    }

  def refresh(spark: SparkSession, table: String): Unit =
    spark.catalog.refreshTable(table)

  /** Compact the given partitions to a controlled file count — the native
    * equivalent of the reference's Delta compaction (reference:
    * algo/loads/DeltaLakeLoad.scala:309-352: rewrite affected partitions
    * with dataChange=false). Each partition dir is rewritten through a
    * temp dir + atomic rename; content is unchanged.
    */
  def compactPartitions(spark: SparkSession, fsOps: graft.fsops.FsOps,
      tableDir: String, partitionDirs: Seq[String],
      filesPerPartition: Int): Unit =
    partitionDirs.foreach { p =>
      val dir = s"$tableDir/$p"
      val tmp = fsOps.timestampedDir(dir + "_compact")
      spark.read.parquet(dir).repartition(filesPerPartition)
        .write.parquet(tmp)
      val backup = fsOps.timestampedDir(dir + "_pre")
      fsOps.move(dir, backup)
      try {
        fsOps.move(tmp, dir)
        fsOps.deleteAll(backup)
      } catch {
        case e: Throwable =>
          if (!fsOps.exists(dir)) fsOps.move(backup, dir)
          fsOps.deleteAll(tmp)
          throw e
      }
    }

  /** ANALYZE statistics, whole-table and optionally per partition
    * (reference: TableStatistics.scala:22-123). Feeds Spark CBO.
    */
  def computeStatistics(spark: SparkSession, table: String,
      perPartition: Boolean = false,
      partitionColumns: Seq[String] = Seq.empty): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (perPartition && partitionColumns.nonEmpty) {
      val parts = spark.sql(s"SHOW PARTITIONS $table").collect()
        .map(_.getString(0))
      parts.foreach { p =>
        val spec = p.split("/").map { kv =>
          val Array(k, v) = kv.split("=", 2)
          s"$k='$v'"
        }.mkString(", ")
        spark.sql(s"ANALYZE TABLE $table PARTITION ($spec) COMPUTE STATISTICS")
      }
    }
  }
}
