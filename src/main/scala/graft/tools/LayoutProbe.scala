package graft.tools

import graft.operators.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Layout probe: does [[Layout.writeSorted]]'s range clustering actually
  * skip data at read time? Writes the same frame twice — range-sorted
  * and hash-scattered — then runs an identical narrow range filter over
  * both and reports the parquet SCAN's own `number of output rows`
  * metric: rows that survived the reader's row-group/page pruning by the
  * pushed predicate, BEFORE Spark's row-level filter. On the sorted
  * layout only the row groups whose min/max overlap the range
  * materialize; scattered, every row group spans the key domain and the
  * scan materializes the whole table.
  *
  * Usage: runMain graft.tools.LayoutProbe [rows] [files]
  */
object LayoutProbe {

  private def scanOutputRows(spark: SparkSession, path: String,
      lo: Long, hi: Long): (Long, Long) = {
    // filter-only plan (no aggregate): no exchange, so no AQE wrapper and
    // the FileSourceScanExec (with its metrics) sits in the executed plan
    val df = spark.read.parquet(path)
      .filter(col("key").between(lo, hi)).select(col("key"))
    val matching = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan
      .collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(sys.error("no FileSourceScanExec in plan"))
    (matching, scan.metrics("numOutputRows").value)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-layoutprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = s"/tmp/graft_layoutprobe_$rows"
    val df = spark.range(rows).select(col("id"),
      (col("id") * 2654435761L % 1000003L).as("key"),
      concat(lit("payload-"), col("id")).as("body"))
    Layout.writeSorted(df, s"$base/sorted", "key", files)
    df.repartition(files).write.mode("overwrite").parquet(s"$base/scattered")

    val lo = 100L; val hi = 5000L // ~0.5% of the key domain
    val (nS, scanS) = scanOutputRows(spark, s"$base/sorted", lo, hi)
    val (nU, scanU) = scanOutputRows(spark, s"$base/scattered", lo, hi)
    require(nS == nU, s"row mismatch: $nS vs $nU")

    println(f"""{"probe":"layout","rows":$rows,"files":$files,""" +
      f""""matching_rows":$nS,""" +
      f""""sorted_scan_rows":$scanS,"scattered_scan_rows":$scanU,""" +
      f""""skip_ratio":${scanU.toDouble / math.max(scanS, 1)}%.1f}""")

    // z-order: the SECOND dimension also skips. Same frame with two
    // independent 16-bit dims; a narrow y-filter against (a) z-ordered
    // and (b) x-sorted layouts — single-column sort buys y nothing,
    // the Morton curve buys both axes
    val df2 = spark.range(rows).select(
      (col("id") * 2654435761L % 65536L).as("x"),
      (col("id") * 40503L % 65536L).as("y"),
      concat(lit("payload-"), col("id")).as("body"))
    Layout.writeZOrdered(df2, s"$base/zorder", "x", "y", 16, files)
    Layout.writeSorted(df2, s"$base/xsorted", "x", files)
    def yScan(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("y") < 1024L).select(col("y"))
      val n = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .getOrElse(sys.error("no FileSourceScanExec in plan"))
      (n, scan.metrics("numOutputRows").value)
    }
    val (nZ, scanZ) = yScan(s"$base/zorder")
    val (nX, scanX) = yScan(s"$base/xsorted")
    require(nZ == nX, s"row mismatch: $nZ vs $nX")
    println(f"""{"probe":"layout_zorder","rows":$rows,"files":$files,""" +
      f""""matching_rows":$nZ,""" +
      f""""zorder_scan_rows":$scanZ,"xsorted_scan_rows":$scanX,""" +
      f""""y_skip_ratio":${scanX.toDouble / math.max(scanZ, 1)}%.1f}""")
    spark.stop()
  }
}
