package graft.catalog

import graft.SparkSpec
import graft.fsops.FsOps
import org.apache.spark.sql.functions._
import scala.collection.parallel.CollectionConverters._

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new FsOps(spark.sparkContext.hadoopConfiguration)

  private def df(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("id", "name", "val")

  test("write/readVersion/readLatest round-trip three snapshots") {
    val root = tmp("vt")
    val v1 = df((1L, "a", 10L), (2L, "b", 20L))
    val v2 = df((1L, "a", 11L), (3L, "c", 30L))
    val v3 = df((3L, "c", 31L))
    assert(VersionedTable.write(v1, fs, root, ts = 100L) === 1L)
    assert(VersionedTable.write(v2, fs, root, ts = 200L) === 2L)
    assert(VersionedTable.write(v3, fs, root, ts = 300L) === 3L)
    assertSameRows(VersionedTable.readVersion(spark, fs, root, 1L), v1)
    assertSameRows(VersionedTable.readVersion(spark, fs, root, 2L), v2)
    assertSameRows(VersionedTable.readLatest(spark, fs, root), v3)
    assert(VersionedTable.latestVersion(fs, root) === 3L)
  }

  test("readAsOf picks the newest commit at or before ts; before-first fails") {
    val root = tmp("vt")
    VersionedTable.write(df((1L, "a", 1L)), fs, root, ts = 100L)
    VersionedTable.write(df((1L, "a", 2L)), fs, root, ts = 200L)
    assert(VersionedTable.versionAsOf(fs, root, 150L) === 1L)
    assert(VersionedTable.versionAsOf(fs, root, 200L) === 2L)
    assert(VersionedTable.versionAsOf(fs, root, 9999L) === 2L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.versionAsOf(fs, root, 50L)
    }
    assert(e.getMessage.contains("ts=50"))
  }

  test("readVersion fails by name for never-committed and vacuumed versions") {
    val root = tmp("vt")
    VersionedTable.write(df((1L, "a", 1L)), fs, root, ts = 100L)
    VersionedTable.write(df((2L, "b", 2L)), fs, root, ts = 200L)
    VersionedTable.write(df((3L, "c", 3L)), fs, root, ts = 300L)
    val never = intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, fs, root, 9L)
    }
    assert(never.getMessage.contains("version 9"))
    assert(VersionedTable.vacuum(fs, root, keepLast = 2) === Seq(1L))
    val gone = intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, fs, root, 1L)
    }
    assert(gone.getMessage.contains("vacuumed"))
    assert(gone.getMessage.contains("earliest readable is 2"))
    // retained versions unaffected
    assert(VersionedTable.readVersion(spark, fs, root, 2L).count() === 1L)
    // vacuum is idempotent; must retain at least one version
    assert(VersionedTable.vacuum(fs, root, keepLast = 2).isEmpty)
    intercept[IllegalArgumentException] {
      VersionedTable.vacuum(fs, root, keepLast = 0)
    }
  }

  test("diff classifies insert/delete/update with the right payload side") {
    val root = tmp("vt")
    VersionedTable.write(
      df((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)), fs, root, 100L)
    VersionedTable.write(
      df((1L, "a", 10L), (2L, "b", 21L), (4L, "d", 40L)), fs, root, 200L)
    val d = VersionedTable.diff(spark, fs, root, 1L, 2L, Seq("id"))
      .select("id", "change_type", "name", "val")
    assertSameRows(d, Seq(
      (2L, "update", "b", 21L), // to-side payload
      (3L, "delete", "c", 30L), // from-side payload
      (4L, "insert", "d", 40L)
    ).toDF("id", "change_type", "name", "val"))
  }

  test("diff treats null payloads null-safely and rejects schema drift") {
    val root = tmp("vt")
    val a = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "name")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    VersionedTable.write(a, fs, root, 100L)
    VersionedTable.write(b, fs, root, 200L)
    val d = VersionedTable.diff(spark, fs, root, 1L, 2L, Seq("id"))
    // id=1 null==null → unchanged; id=2 x→null → update
    assertSameRows(d.select("id", "change_type"),
      Seq((2L, "update")).toDF("id", "change_type"))
    VersionedTable.write(b.withColumn("extra", lit(1)), fs, root, 300L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.diff(spark, fs, root, 2L, 3L, Seq("id"))
    }
    assert(e.getMessage.contains("matching schemas"))
  }

  test("restore publishes old content as a new version; history records it") {
    val root = tmp("vt")
    val v1 = df((1L, "a", 10L))
    VersionedTable.write(v1, fs, root, 100L)
    VersionedTable.write(df((2L, "b", 20L)), fs, root, 200L)
    assert(VersionedTable.restore(spark, fs, root, 1L, ts = 300L) === 3L)
    assertSameRows(VersionedTable.readLatest(spark, fs, root), v1)
    // restored copy survives vacuuming the original
    VersionedTable.vacuum(fs, root, keepLast = 2)
    assertSameRows(VersionedTable.readLatest(spark, fs, root), v1)
    val h = VersionedTable.history(spark, fs, root)
      .select("version", "ts", "op", "rows", "readable")
    assertSameRows(h, Seq(
      (1L, 100L, "write", 1L, false),
      (2L, 200L, "write", 1L, true),
      (3L, 300L, "restore", 1L, true)
    ).toDF("version", "ts", "op", "rows", "readable"))
  }

  test("an orphan data dir from a crashed writer is invisible; vacuum " +
      "sweep reclaims it") {
    val root = tmp("vt")
    VersionedTable.write(df((1L, "a", 1L)), fs, root, 100L)
    // simulate a writer that landed data but died before its commit
    df((9L, "ghost", 9L)).write.parquet(s"$root/d-deadbeef")
    assert(VersionedTable.latestVersion(fs, root) === 1L) // invisible
    val v = VersionedTable.write(df((2L, "b", 2L)), fs, root, 200L)
    assert(v === 2L)
    assertSameRows(VersionedTable.readVersion(spark, fs, root, 2L),
      df((2L, "b", 2L)))
    VersionedTable.vacuum(fs, root, keepLast = 2, sweepUncommitted = true)
    assert(!fs.exists(s"$root/d-deadbeef")) // orphan reclaimed
    // committed versions untouched by the sweep
    assertSameRows(VersionedTable.readVersion(spark, fs, root, 1L),
      df((1L, "a", 1L)))
  }

  test("two racing writers commit distinct versions, both readable") {
    val root = tmp("vt")
    VersionedTable.write(df((0L, "seed", 0L)), fs, root, 50L)
    val frames = Seq(df((1L, "w1", 1L)), df((2L, "w2", 2L)))
    val versions = frames.par.map(f =>
      VersionedTable.write(f, fs, root, ts = 100L)).toList.sorted
    assert(versions === List(2L, 3L))
    val both = VersionedTable.readVersion(spark, fs, root, 2L)
      .unionByName(VersionedTable.readVersion(spark, fs, root, 3L))
    assertSameRows(both, frames.head.unionByName(frames.last))
  }
}
