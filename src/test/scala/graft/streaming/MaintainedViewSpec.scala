package graft.streaming

import graft.SparkSpec
import graft.catalog.VersionedTable
import graft.fsops.FsOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaintainedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new FsOps(spark.sparkContext.hadoopConfiguration)

  private def fact(n: Int): DataFrame =
    (1 to n).map(i => (s"k${i % 4}", (i * 31 % 97).toLong)).toDF("k", "m")

  private def recompute(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("m").as("sum_m"))

  test("settled maintained view equals the batch recompute and is " +
      "trigger-boundary invariant (1 trigger vs per-file triggers)") {
    val data = fact(400)
    val inDir = tmp("mv_in")
    data.repartition(4).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val oneTrigger = MaintainedView.runOnce(spark, schema, inDir,
      tmp("mv_s1"), Seq("k"), Seq("m"), "mv_one")
    val manyTriggers = MaintainedView.runOnce(spark, schema, inDir,
      tmp("mv_s2"), Seq("k"), Seq("m"), "mv_many",
      maxFilesPerTrigger = Some(1))
    val want = recompute(data)
    assertSameRows(oneTrigger.select("k", "n_rows", "sum_m"), want)
    assertSameRows(manyTriggers.select("k", "n_rows", "sum_m"), want)
  }

  test("per-trigger commits land in the versioned state: one version " +
      "per batch, history auditable") {
    val data = fact(100)
    val inDir = tmp("mv_in")
    data.repartition(3).write.mode("overwrite").parquet(inDir)
    val root = tmp("mv_state")
    MaintainedView.runOnce(spark, spark.read.parquet(inDir).schema, inDir,
      root, Seq("k"), Seq("m"), "mv_hist", maxFilesPerTrigger = Some(1))
    val cs = VersionedTable.commits(fs, root)
    assert(cs.size === 3)
    assert(cs.map(_.op) === Seq("batch-0", "batch-1", "batch-2"))
  }

  test("a replayed trigger is idempotent: folding the same batch id " +
      "twice leaves the state unchanged") {
    val root = tmp("mv_state")
    val b0 = Seq(("a", 10L), ("b", 5L)).toDF("k", "m")
    val b1 = Seq(("a", 7L)).toDF("k", "m")
    MaintainedView.maintainBatch(spark, fs, root, b0, 0L, Seq("k"), Seq("m"))
    MaintainedView.maintainBatch(spark, fs, root, b1, 1L, Seq("k"), Seq("m"))
    // the streaming engine replays batch 1 after a simulated failure
    MaintainedView.maintainBatch(spark, fs, root, b1, 1L, Seq("k"), Seq("m"))
    assert(VersionedTable.commits(fs, root).size === 2) // no third commit
    assertSameRows(
      VersionedTable.readLatest(spark, fs, root).select("k", "n_rows",
        "sum_m"),
      recompute(b0.unionByName(b1)))
  }

  test("catchUp folds a versioned base table's commit log into the " +
      "maintained view: bootstrap, incremental polls, exactly-once") {
    val tableRoot = tmp("mv_tbl")
    val stateRoot = tmp("mv_cst")
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("id", "g", "m")
    val v2 = Seq((1L, "a", 10L), (2L, "b", 25L), (4L, "b", 40L))
      .toDF("id", "g", "m") // 3 deleted, 2 updated, 4 inserted
    val v3 = Seq((1L, "a", 11L), (4L, "b", 40L)).toDF("id", "g", "m")
    def recomputeG(df: DataFrame): DataFrame = df.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum("m").as("sum_m"))
    VersionedTable.write(v1, fs, tableRoot, ts = 100L)
    VersionedTable.write(v2, fs, tableRoot, ts = 200L)
    // first poll BOOTSTRAPS AT THE LATEST pending version (the
    // derivation is snapshot-functional, so replaying v1 first would
    // only add a redundant CDC join — and would fail on vacuumed
    // histories)
    assert(MaintainedView.catchUp(spark, fs, tableRoot, stateRoot,
      cdcKeys = Seq("id"), groupKeys = Seq("g"), sumCols = Seq("m"))
      === Seq(2L))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, stateRoot)
        .select("g", "n_rows", "sum_m"),
      recomputeG(v2.select("g", "m")))
    // nothing new: the poll is a no-op (no state commit burned)
    assert(MaintainedView.catchUp(spark, fs, tableRoot, stateRoot,
      Seq("id"), Seq("g"), Seq("m")).isEmpty)
    assert(VersionedTable.commits(fs, stateRoot).size === 1)
    // a third base version folds incrementally (only v3 consumed)
    VersionedTable.write(v3, fs, tableRoot, ts = 300L)
    assert(MaintainedView.catchUp(spark, fs, tableRoot, stateRoot,
      Seq("id"), Seq("g"), Seq("m")) === Seq(3L))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, stateRoot)
        .select("g", "n_rows", "sum_m"),
      recomputeG(v3.select("g", "m")))
    // the state log records which base version each commit consumed
    assert(VersionedTable.commits(fs, stateRoot).map(_.op)
      === Seq("table-v-2", "table-v-3"))
  }

  test("overlapping catch-up polls never double-fold: concurrent polls " +
      "settle on the single-poll answer with unique version tags") {
    import scala.collection.parallel.CollectionConverters._
    val tableRoot = tmp("mv_tbl2")
    val stateRoot = tmp("mv_cst2")
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "m")
    val v2 = Seq((1L, "a", 15L), (3L, "a", 30L)).toDF("id", "g", "m")
    val v3 = Seq((1L, "a", 15L), (3L, "a", 31L), (4L, "b", 4L))
      .toDF("id", "g", "m")
    Seq(v1, v2, v3).zipWithIndex.foreach { case (v, i) =>
      VersionedTable.write(v, fs, tableRoot, ts = (i + 1) * 100L) }
    // two polls race over the same 3 pending versions; the op-tag
    // re-check + the pinned state commit make the outcome invariant
    val folded = (1 to 2).par.map(_ =>
      MaintainedView.catchUp(spark, fs, tableRoot, stateRoot,
        Seq("id"), Seq("g"), Seq("m"))).toList
    assert(folded.flatten.sorted === Seq(3L)) // bootstrap at latest, once
    val ops = VersionedTable.commits(fs, stateRoot).map(_.op)
    assert(ops === Seq("table-v-3"))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, stateRoot)
        .select("g", "n_rows", "sum_m"),
      v3.groupBy("g").agg(count(lit(1)).as("n_rows"),
        sum("m").as("sum_m")))
  }

  test("catchUp with min/max: a CDC delete that removes a group's " +
      "extremum recomputes it from the touched group only") {
    val tableRoot = tmp("mv_tbl3")
    val stateRoot = tmp("mv_cst3")
    val v1 = Seq((1L, "a", 90L), (2L, "a", 10L), (3L, "a", 40L),
      (4L, "b", 7L)).toDF("id", "g", "m")
    // v2 deletes a's max (90) AND min (10), updates 3 to 55, leaves b
    val v2 = Seq((3L, "a", 55L), (4L, "b", 7L)).toDF("id", "g", "m")
    VersionedTable.write(v1, fs, tableRoot, ts = 100L)
    MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
      Seq("g"), Seq("m"), minCols = Seq("m"), maxCols = Seq("m"))
    VersionedTable.write(v2, fs, tableRoot, ts = 200L)
    MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
      Seq("g"), Seq("m"), minCols = Seq("m"), maxCols = Seq("m"))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, stateRoot)
        .select("g", "n_rows", "sum_m", "min_m", "max_m"),
      v2.groupBy("g").agg(count(lit(1)).as("n_rows"),
        sum("m").as("sum_m"), min("m").as("min_m"),
        max("m").as("max_m")))
  }

  test("catchUp fails fast on aggregate-config drift against the " +
      "persisted state") {
    val tableRoot = tmp("mv_tbl4")
    val stateRoot = tmp("mv_cst4")
    VersionedTable.write(Seq((1L, "a", 5L)).toDF("id", "g", "m"),
      fs, tableRoot, ts = 100L)
    MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
      Seq("g"), Seq("m")) // bootstrapped WITHOUT min/max
    VersionedTable.write(Seq((1L, "a", 6L)).toDF("id", "g", "m"),
      fs, tableRoot, ts = 200L)
    val e = intercept[IllegalArgumentException] {
      MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
        Seq("g"), Seq("m"), minCols = Seq("m")) // drifted config
    }
    assert(e.getMessage.contains("aggregate config must stay fixed"))
  }

  test("streaming min/max view is trigger-boundary invariant and " +
      "matches the batch recompute (insert-only extrema fold)") {
    val data = fact(400)
    val inDir = tmp("mv_in")
    data.repartition(4).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val want = data.groupBy("k").agg(count(lit(1)).as("n_rows"),
      sum("m").as("sum_m"), min("m").as("min_m"), max("m").as("max_m"))
    val one = MaintainedView.runOnce(spark, schema, inDir, tmp("mv_m1"),
      Seq("k"), Seq("m"), "mv_mm_one",
      minCols = Seq("m"), maxCols = Seq("m"))
    val many = MaintainedView.runOnce(spark, schema, inDir, tmp("mv_m2"),
      Seq("k"), Seq("m"), "mv_mm_many", maxFilesPerTrigger = Some(1),
      minCols = Seq("m"), maxCols = Seq("m"))
    assertSameRows(one.select("k", "n_rows", "sum_m", "min_m", "max_m"),
      want)
    assertSameRows(many.select("k", "n_rows", "sum_m", "min_m", "max_m"),
      want)
  }

  test("min/max streaming batches reject a weight column: extrema are " +
      "not retractable") {
    val root = tmp("mv_state")
    val b = Seq(("a", 10L, 1L)).toDF("k", "m", "w")
    val e = intercept[IllegalArgumentException] {
      MaintainedView.maintainBatch(spark, fs, root, b, 0L, Seq("k"),
        Seq("m"), weightCol = Some("w"), minCols = Seq("m"))
    }
    assert(e.getMessage.contains("not retractable"))
  }

  test("maintainBatch fails fast on aggregate-config drift against the " +
      "persisted state") {
    val root = tmp("mv_state")
    val b = Seq(("a", 10L)).toDF("k", "m")
    MaintainedView.maintainBatch(spark, fs, root, b, 0L, Seq("k"),
      Seq("m"))
    val e = intercept[IllegalArgumentException] {
      MaintainedView.maintainBatch(spark, fs, root, b, 1L, Seq("k"),
        Seq("m"), minCols = Seq("m")) // drifted config
    }
    assert(e.getMessage.contains("aggregate config must stay fixed"))
  }

  test("runOnce resumes against an existing state via checkpoint " +
      "(stable batch ids), and fails fast when rerun without one") {
    val inDir = tmp("mv_in")
    val root = tmp("mv_state")
    val cp = tmp("mv_cp")
    val d1 = fact(200)
    d1.coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    MaintainedView.runOnce(spark, schema, inDir, root, Seq("k"),
      Seq("m"), "mv_resume", checkpointLocation = Some(cp))
    // new files land; the resumed run must process ONLY them, under
    // fresh batch ids (the checkpoint carries the engine's counter)
    val d2 = fact(90).withColumn("m", col("m") + 1000L)
    d2.coalesce(1).write.mode("append").parquet(inDir)
    val settled = MaintainedView.runOnce(spark, schema, inDir, root,
      Seq("k"), Seq("m"), "mv_resume2", checkpointLocation = Some(cp))
    assertSameRows(settled.select("k", "n_rows", "sum_m"),
      recompute(d1.unionByName(d2)))
    // batch ids advanced across runs — no collision with run 1's tags
    val ops = VersionedTable.commits(fs, root).map(_.op)
    assert(ops.distinct.size === ops.size)
    // a checkpoint-less rerun against the same state refuses instead of
    // silently replay-skipping / double-folding
    val e = intercept[IllegalArgumentException] {
      MaintainedView.runOnce(spark, schema, inDir, root, Seq("k"),
        Seq("m"), "mv_resume3")
    }
    assert(e.getMessage.contains("checkpoint"))
  }

  test("a FRESH checkpoint against an existing state is refused — only " +
      "the original (offsets-bearing) checkpoint resumes") {
    val inDir = tmp("mv_in")
    val root = tmp("mv_state")
    fact(100).coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    MaintainedView.runOnce(spark, schema, inDir, root, Seq("k"),
      Seq("m"), "mv_fcp", checkpointLocation = Some(tmp("mv_cp1")))
    fact(50).coalesce(1).write.mode("append").parquet(inDir)
    // a brand-new checkpoint dir restarts engine batch ids at 0 — the
    // replay-skip/double-fold hazard the guard exists for
    val e = intercept[IllegalArgumentException] {
      MaintainedView.runOnce(spark, schema, inDir, root, Seq("k"),
        Seq("m"), "mv_fcp2", checkpointLocation = Some(tmp("mv_cp2")))
    }
    assert(e.getMessage.contains("ORIGINAL"))
  }

  test("a base table gaining a column does not break the maintained " +
      "view: unchanged agg config keeps folding; aggregating the NEW " +
      "column requires a fresh state (clear drift error)") {
    val tableRoot = tmp("mv_tbl7")
    val stateRoot = tmp("mv_cst7")
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "m")
    VersionedTable.write(v1, fs, tableRoot, ts = 100L)
    MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
      Seq("g"), Seq("m"))
    // v2 adds a column AND changes a row — the cross-boundary CDC feed
    // aligns schemas (added column as typed nulls on the v1 side)
    val v2 = Seq((1L, "a", 10L, 5L), (2L, "b", 25L, 6L), (3L, "a", 7L, 8L))
      .toDF("id", "g", "m", "extra")
    VersionedTable.write(v2, fs, tableRoot, ts = 200L)
    assert(MaintainedView.catchUp(spark, fs, tableRoot, stateRoot,
      Seq("id"), Seq("g"), Seq("m")) === Seq(2L))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, stateRoot)
        .select("g", "n_rows", "sum_m"),
      v2.groupBy("g").agg(count(lit(1)).as("n_rows"),
        sum("m").as("sum_m")))
    // folding the NEW column into the existing state fails by name —
    // the policy: rebuild under a fresh stateRoot to widen the config
    VersionedTable.write(v2.withColumn("m", $"m" + 1L), fs, tableRoot,
      ts = 300L)
    val e = intercept[IllegalArgumentException] {
      MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
        Seq("g"), Seq("m", "extra"))
    }
    assert(e.getMessage.contains("aggregate config must stay fixed"))
    // and a FRESH state over the widened config bootstraps fine
    val fresh = tmp("mv_cst7b")
    MaintainedView.catchUp(spark, fs, tableRoot, fresh, Seq("id"),
      Seq("g"), Seq("m", "extra"))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, fresh)
        .select("g", "n_rows", "sum_m", "sum_extra"),
      v2.withColumn("m", $"m" + 1L).groupBy("g")
        .agg(count(lit(1)).as("n_rows"), sum("m").as("sum_m"),
          sum("extra").as("sum_extra")))
  }

  test("catchUp refuses to bootstrap onto a derived root holding " +
      "foreign commits (op tags from another loop or a plain table)") {
    val tableRoot = tmp("mv_tbl6")
    val stateRoot = tmp("mv_cst6")
    VersionedTable.write(Seq((1L, "a", 5L)).toDF("id", "g", "m"),
      fs, tableRoot, ts = 100L)
    // the derived root already holds an UNTAGGED commit — a foreign
    // table, not a bootstrapped state
    VersionedTable.write(Seq(("x", 1L)).toDF("k", "v"), fs, stateRoot,
      ts = 50L)
    val e = intercept[IllegalArgumentException] {
      MaintainedView.catchUp(spark, fs, tableRoot, stateRoot, Seq("id"),
        Seq("g"), Seq("m"))
    }
    assert(e.getMessage.contains("foreign commit"))
    assert(e.getMessage.contains(stateRoot))
  }

  test("weighted batches retract: a delete batch removes its rows from " +
      "the maintained view") {
    val root = tmp("mv_state")
    val b0 = Seq(("a", 10L, 1L), ("a", 4L, 1L), ("b", 5L, 1L))
      .toDF("k", "m", "w")
    val b1 = Seq(("a", 10L, -1L)).toDF("k", "m", "w") // retract the 10
    MaintainedView.maintainBatch(spark, fs, root, b0, 0L, Seq("k"),
      Seq("m"), weightCol = Some("w"))
    MaintainedView.maintainBatch(spark, fs, root, b1, 1L, Seq("k"),
      Seq("m"), weightCol = Some("w"))
    assertSameRows(
      VersionedTable.readLatest(spark, fs, root)
        .select("k", "n_rows", "sum_m"),
      Seq(("a", 1L, 4L), ("b", 1L, 5L)).toDF("k", "n_rows", "sum_m"))
  }
}
