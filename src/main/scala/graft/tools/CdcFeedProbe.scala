package graft.tools

import graft.catalog.VersionedTable
import graft.fsops.FsOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Writer-recorded change-set scaling probe: the 100 TB claim behind
  * [[graft.catalog.VersionedTable.writeWithChanges]]/[[graft.catalog.VersionedTable.merge]]
  * is that `changeFeed(v−1, v)` over a recorded commit costs the DELTA —
  * a plain scan of the `_changes` dir — while the snapshot-diff fallback
  * reads TWO FULL snapshots into a keyed full-outer join. This measures
  * exactly that, at a FIXED delta against a base grown `factor`×:
  *
  *  - `feed_recorded_*`: wall of `changeFeed` (served from the recorded
  *    set) at 1× vs `factor`× — should be ~FLAT in base size;
  *  - `feed_joined_*`: wall of the forced snapshot-diff fold on the
  *    same commits — grows ~linearly with the base;
  *  - `bytes_changes` vs `bytes_snapshots`: on-disk input of the two
  *    paths at `factor`× — the recorded path's input ∝ delta.
  *
  * Usage: runMain graft.tools.CdcFeedProbe [factor] [rowsBase]
  */
object CdcFeedProbe {

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val rowsBase = args.lift(1).map(_.toLong).getOrElse(10_000_000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-cdcprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)

    def mkBase(rows: Long) = spark.range(rows).select(
      col("id"),
      (col("id") % 1000).as("g"),
      (col("id") * 37 % 100003).as("m"))

    // FIXED delta regardless of base scale: 50k updates + 20k deletes
    val upserts = spark.range(0L, 50_000L).select(
      col("id"), (col("id") % 1000).as("g"),
      (col("id") * 37 % 100003 + 1).as("m"))
    val deleteKeys = spark.range(50_000L, 70_000L).select(col("id"))

    def build(rows: Long, tag: String): String = {
      val root = s"/tmp/graft_cdcprobe_$tag"
      fsOps.deleteAll(root)
      VersionedTable.write(mkBase(rows), fsOps, root, ts = 1000L)
      VersionedTable.merge(spark, fsOps, root, upserts, deleteKeys,
        keys = Seq("id"), ts = 2000L)
      root
    }
    val root1 = build(rowsBase, "1x")
    val rootN = build(rowsBase * factor, s"${factor}x")

    def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)
    def recordedWall(root: String): Double = med(time {
      VersionedTable.changeFeed(spark, fsOps, root, 1L, 2L, Seq("id"))
        .agg(count(lit(1)), sum("m")).collect() })
    def joinedWall(root: String): Double = med(time {
      VersionedTable.changeFeedJoined(spark, fsOps, root, 1L, 2L,
        Seq("id")).agg(count(lit(1)), sum("m")).collect() })

    val r1 = recordedWall(root1)
    val rN = recordedWall(rootN)
    val j1 = joinedWall(root1)
    val jN = joinedWall(rootN)

    // on-disk input of each path at factor×: the recorded set vs the
    // two full snapshots the fallback join reads
    def bytesOf(dir: String): Long =
      fsOps.fs(new Path(dir)).getContentSummary(new Path(dir)).getLength
    val cs = VersionedTable.commits(fsOps, rootN)
    val snapBytes = cs.map(c => bytesOf(s"$rootN/${c.path}")).sum
    val changesBytes = bytesOf(
      s"$rootN/${cs.last.path}/_changes")

    println(f"""{"probe":"cdc_feed","factor":$factor,""" +
      f""""rows_base":$rowsBase,""" +
      f""""feed_recorded_1x":$r1%.2f,"feed_recorded_${factor}x":$rN%.2f,""" +
      f""""feed_recorded_growth":${rN / r1}%.2f,""" +
      f""""feed_joined_1x":$j1%.2f,"feed_joined_${factor}x":$jN%.2f,""" +
      f""""feed_joined_growth":${jN / j1}%.2f,""" +
      f""""bytes_changes":$changesBytes,"bytes_snapshots":$snapBytes,""" +
      f""""bytes_ratio":${snapBytes.toDouble / changesBytes}%.1f}""")
    Seq(root1, rootN).foreach(fsOps.deleteAll)
    spark.stop()
  }
}
