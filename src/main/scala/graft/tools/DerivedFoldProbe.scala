package graft.tools

import graft.catalog.{LogFold, VersionedTable}
import graft.fsops.FsOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-aligned derived-state probe: the scaling law behind
  * [[graft.catalog.LogFold.catchUpBucketed]] is
  *
  *   fold bytes written ≈ |touched buckets| × (|table| / nBuckets)
  *
  * vs the plain fold's |table| per consumed version — so with a delta
  * touching fewer keys than there are buckets, bytes written are
  * ∝ delta (in units of one bucket), and the bucket count is the knob
  * that trades write amplification against files-per-snapshot. This
  * measures both layouts with a SMALL fixed delta (|Δkeys| ≪ nBuckets)
  * against a derived table grown `factor`×, plus a 8× larger delta at
  * the big scale to show bucketed bytes growing ∝ delta while the
  * plain fold's bytes don't move (they're the whole table either way).
  *
  * The derivation is a cheap projection so the probe isolates the
  * FOLD's read/write cost; the base's v2 lands via
  * [[VersionedTable.merge]] so the change feed is O(delta) in both
  * arms (CdcFeedProbe covers that half).
  *
  * Usage: runMain graft.tools.DerivedFoldProbe [factor] [rowsBase] [nBuckets]
  */
object DerivedFoldProbe {

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val rowsBase = args.lift(1).map(_.toLong).getOrElse(10_000_000L)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-foldprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)

    def mkBase(rows: Long) = spark.range(rows).select(
      col("id"), (col("id") * 37 % 100003).as("m"))
    def derive(df: DataFrame) =
      df.select(col("id"), (col("m") * 2 + 1).as("d"))
    // deltaKeys ≪ nBuckets: 8 upserts + 4 deletes (spread by hash, so
    // they touch ≤ 12 of the nBuckets buckets)
    def mkUpserts(keys: Int) = spark.range(0L, keys.toLong).select(
      (col("id") * 7919).as("id"),
      (col("id") * 37 % 100003 + 1).as("m"))
    def mkDeletes(keys: Int) = spark.range(0L, keys.toLong)
      .select((col("id") * 104729 + 1).as("id"))

    def feedParts(baseRoot: String, c: VersionedTable.Commit)
        : (DataFrame, DataFrame) = {
      val feed = VersionedTable.changeFeed(spark, fsOps, baseRoot,
        c.version - 1, c.version, Seq("id"))
      (feed.filter(col("change_type").isin("delete", "update_preimage"))
          .select(col("id")),
        feed.filter(col("change_type")
            .isin("insert", "update_postimage"))
          .select(col("id"), col("m")))
    }

    def bytesOf(dir: String): Long =
      fsOps.fs(new Path(dir)).getContentSummary(new Path(dir)).getLength

    /** Build base v1+v2 (merge-recorded feed), bootstrap the derived
      * table, time the INCREMENTAL fold; returns (wall, bytes the
      * fold's commit wrote into its own dir, touched buckets).
      */
    def run(rows: Long, tag: String, bucketed: Boolean,
        upsertKeys: Int, deleteKeys: Int): (Double, Long, Int) = {
      val baseRoot = s"/tmp/graft_foldprobe_b_$tag"
      val derRoot = s"/tmp/graft_foldprobe_d_$tag"
      Seq(baseRoot, derRoot).foreach(fsOps.deleteAll)
      VersionedTable.write(mkBase(rows), fsOps, baseRoot, ts = 1000L)
      def foldOnce(): Seq[Long] =
        if (!bucketed)
          LogFold.catchUp(spark, fsOps, baseRoot, derRoot, "base") {
            (state, c) => state match {
              case None => derive(VersionedTable.readVersion(spark,
                fsOps, baseRoot, c.version))
              case Some(st) =>
                val (removed, added) = feedParts(baseRoot, c)
                st.join(removed, Seq("id"), "left_anti")
                  .unionByName(derive(added))
            }
          }
        else
          LogFold.catchUpBucketed(spark, fsOps, baseRoot, derRoot,
              "base", "id", nBuckets) { (state, c) => state match {
            case None => LogFold.Full(derive(VersionedTable.readVersion(
              spark, fsOps, baseRoot, c.version)))
            case Some(st) =>
              val (removed, added) = feedParts(baseRoot, c)
              val touched = removed.unionByName(added.select(col("id")))
                .select(VersionedTable.bucketOf(col("id"), nBuckets)
                  .as("b"))
                .distinct().collect().map(_.getInt(0)).toSeq.sorted
              LogFold.Delta(
                st.buckets(touched).join(removed, Seq("id"), "left_anti")
                  .unionByName(derive(added)), touched)
          }}
      require(foldOnce() == Seq(1L), "bootstrap did not fold v1")
      VersionedTable.merge(spark, fsOps, baseRoot, mkUpserts(upsertKeys),
        mkDeletes(deleteKeys), Seq("id"), ts = 2000L)
      val wall = time { require(foldOnce() == Seq(2L),
        "incremental fold did not consume v2") }
      val c2 = VersionedTable.commits(fsOps, derRoot).last
      val written = bytesOf(s"$derRoot/${c2.path}")
      val touched = c2.bucketMap.map(_.split(",")
        .count(_.endsWith(":self"))).getOrElse(nBuckets)
      Seq(baseRoot, derRoot).foreach(fsOps.deleteAll)
      (wall, written, touched)
    }

    val (wp1, bp1, _) = run(rowsBase, "p1", bucketed = false, 8, 4)
    val (wpN, bpN, _) = run(rowsBase * factor, "pN", bucketed = false,
      8, 4)
    val (wb1, bb1, t1) = run(rowsBase, "b1", bucketed = true, 8, 4)
    val (wbN, bbN, tN) = run(rowsBase * factor, "bN", bucketed = true,
      8, 4)
    // 8x the delta at the big scale: bucketed bytes grow ∝ delta
    val (_, bbN8, tN8) = run(rowsBase * factor, "bN8", bucketed = true,
      64, 32)

    println(f"""{"probe":"derived_fold","factor":$factor,""" +
      f""""rows_base":$rowsBase,"n_buckets":$nBuckets,""" +
      f""""plain_wall_1x":$wp1%.2f,"plain_wall_${factor}x":$wpN%.2f,""" +
      f""""plain_bytes_1x":$bp1,"plain_bytes_${factor}x":$bpN,""" +
      f""""bucketed_wall_1x":$wb1%.2f,"bucketed_wall_${factor}x":$wbN%.2f,""" +
      f""""bucketed_bytes_1x":$bb1,"bucketed_bytes_${factor}x":$bbN,""" +
      f""""touched_1x":$t1,"touched_${factor}x":$tN,""" +
      f""""bytes_ratio_${factor}x":${bpN.toDouble / bbN}%.1f,""" +
      f""""wall_ratio_${factor}x":${wpN / wbN}%.2f,""" +
      f""""bucketed_bytes_8x_delta":$bbN8,"touched_8x_delta":$tN8,""" +
      f""""delta_growth":${bbN8.toDouble / bbN}%.2f}""")
    spark.stop()
  }
}
