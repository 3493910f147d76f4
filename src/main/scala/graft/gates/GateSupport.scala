package graft.gates

import graft.core.Tables
import graft.fsops.FsOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** Shared surface + helpers for the per-family gate files split out of
  * SparkEntry (round 10): each family pairs its gated queries with their
  * DuckDB oracle SQL so a gate and its oracle live side by side.
  */
trait GateSupport {

  /** Gated queries: name -> (session, sfDir) => result frame. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-equivalent SQL per gate (same column names as the query). */
  def oracleSql: Map[String, String]

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  protected def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  protected def fsOps(s: SparkSession): FsOps =
    new FsOps(s.sparkContext.hadoopConfiguration)
}
