package graft.tools

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Incremental-view-maintenance scaling probe: the 100 TB claim behind
  * IncrementalAgg is that refreshing a maintained view costs the DELTA
  * plus group-cardinality partials — never a rescan of the base. This
  * measures exactly that, at a FIXED delta against a base grown
  * `factor`×:
  *
  *  1. `refresh` (count/sum, weighted) at base 1× vs `factor`× — the
  *     state row count is the group cardinality (fixed here), so the
  *     wall should be ~FLAT in base size while the full-recompute
  *     baseline grows ~linearly;
  *  2. `refreshWithRecompute` (min/max under deletes) at `factor`× vs
  *     the full recompute — the semi-join-pruned touched-group scan
  *     should beat rescanning every group.
  *
  * Usage: runMain graft.tools.MaintenanceProbe [factor] [rowsBase]
  */
object MaintenanceProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val rowsBase = args.lift(1).map(_.toLong).getOrElse(10_000_000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-maintprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val groups = 1000
    def mkBase(rows: Long) = spark.range(rows).select(
      (col("id") % groups).as("g"),
      (col("id") * 37 % 1001).as("m"),
      col("id"))
    val b1Dir = "/tmp/graft_maintprobe_b1"
    val bNDir = s"/tmp/graft_maintprobe_b$factor"
    mkBase(rowsBase).write.mode("overwrite").parquet(b1Dir)
    mkBase(rowsBase * factor).write.mode("overwrite").parquet(bNDir)
    val base1 = spark.read.parquet(b1Dir)
    val baseN = spark.read.parquet(bNDir)
    // fixed-size delta regardless of base scale: inserts with fresh ids
    val delta = spark.range(rowsBase / 100).select(
      (col("id") % groups).as("g"),
      (col("id") * 53 % 1001).as("m"),
      (col("id") + rowsBase * factor).as("id"),
      lit(1L).as("w"))
    delta.count() // warm

    def state(base: org.apache.spark.sql.DataFrame) = {
      val dir = s"/tmp/graft_maintprobe_st_${base.hashCode}"
      IncrementalAgg.init(base, Seq("g"), Seq("m"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val st1 = state(base1)
    val stN = state(baseN)

    def refreshWall(st: org.apache.spark.sql.DataFrame): Double =
      time { IncrementalAgg.refresh(st, delta, Seq("g"), Seq("m"),
        weightCol = Some("w")).count() }._2
    def recomputeWall(base: org.apache.spark.sql.DataFrame): Double =
      time { base.select("g", "m")
        .unionByName(delta.select("g", "m"))
        .groupBy("g").agg(count(lit(1)), sum("m")).count() }._2

    // median of 3 (NOISE.md discipline)
    def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)
    val r1 = med(refreshWall(st1))
    val rN = med(refreshWall(stN))
    val c1 = med(recomputeWall(base1))
    val cN = med(recomputeWall(baseN))

    // min/max under deletes: drop some baseN rows clustered in 10 of
    // the 1000 groups (the touched set), compare pruned recompute vs
    // full recompute of every group. newBase is laid out PARTITIONED BY
    // group — the lake layout a grouped view maintains against — so the
    // broadcast semi join on the touched keys triggers dynamic
    // partition pruning and the recompute SCANS only the touched
    // groups' partitions (the claim in refreshWithRecompute's scaladoc)
    val stMm = {
      val dir = "/tmp/graft_maintprobe_stmm"
      IncrementalAgg.init(baseN, Seq("g"), Seq("m"),
        minCols = Seq("m"), maxCols = Seq("m"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val delRows = baseN.filter(col("g") < 10 && col("id") % 7 === 0)
      .withColumn("w", lit(-1L))
    val newBaseDir = "/tmp/graft_maintprobe_nb"
    baseN.filter(!(col("g") < 10 && col("id") % 7 === 0))
      .write.mode("overwrite").partitionBy("g").parquet(newBaseDir)
    val newBase = spark.read.parquet(newBaseDir)
    val mmPruned = med(time {
      IncrementalAgg.refreshWithRecompute(stMm, delRows, newBase,
        Seq("g"), Seq("m"), Seq("m"), Seq("m"), Some("w")).count() }._2)
    val mmFull = med(time {
      newBase.groupBy("g").agg(count(lit(1)), sum("m"), min("m"),
        max("m")).count() }._2)

    println(f"""{"probe":"maintenance","factor":$factor,""" +
      f""""refresh_1x":$r1%.2f,"refresh_${factor}x":$rN%.2f,""" +
      f""""refresh_growth":${rN / r1}%.2f,""" +
      f""""recompute_1x":$c1%.2f,"recompute_${factor}x":$cN%.2f,""" +
      f""""recompute_growth":${cN / c1}%.2f,""" +
      f""""minmax_pruned":$mmPruned%.2f,"minmax_full":$mmFull%.2f}""")
    spark.stop()
  }
}
