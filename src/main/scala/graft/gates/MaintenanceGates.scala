package graft.gates

import graft.catalog.VersionedTable
import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates: lake maintenance — versioned-table time travel (the native
  * answer to the reference's Delta-jar history/vacuum surface) and
  * incremental view maintenance (refresh cost ∝ delta, never a base
  * rescan).
  */
object MaintenanceGates extends GateSupport {

  /** Version 1 of the gated table: customers off the %3 lattice, balance
    * quantized to exact cents (the repo's BIGINT determinism device).
    */
  private def v1Frame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))

  /** Version 2: every %7 key deleted, every %5 balance bumped 1000
    * cents, even %3 keys inserted.
    */
  private def v2Frame(s: SparkSession, dir: String): DataFrame =
    v1Frame(s, dir)
      .filter(col("c_custkey") % 7 =!= 0)
      .withColumn("bal_cents",
        when(col("c_custkey") % 5 === 0, col("bal_cents") + 1000L)
          .otherwise(col("bal_cents")))
      .unionByName(t(s, dir, "customer")
        .filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents")))

  private val v1Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      |FROM customer WHERE c_custkey % 3 <> 0""".stripMargin

  private val v2Sql: String =
    s"""SELECT c_custkey, c_name, c_mktsegment,
       |  CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 1000
       |       ELSE bal_cents END AS bal_cents
       |FROM ($v1Sql) WHERE c_custkey % 7 <> 0
       |UNION ALL
       |SELECT c_custkey, c_name, c_mktsegment,
       |  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
       |FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // versioned table: two committed snapshots, then time travel by
    // TIMESTAMP to the first — the read opens only v1's immutable data
    // dir (an ordinary pruned parquet scan; the commit log is one tiny
    // json per version, listed driver-side)
    "q303_version_travel" -> ((s, dir) => {
      val root = tmpDir("q303")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      VersionedTable.write(v2Frame(s, dir), fs, root, ts = 2000L)
      VersionedTable.readAsOf(s, fs, root, ts = 1500L)
    }),

    // versioned table: change-data-feed between two snapshots — one
    // full-outer join keyed on c_custkey classifies insert/delete/update
    // (deletes carry the vanished row's payload, updates the new one)
    "q304_version_diff" -> ((s, dir) => {
      val root = tmpDir("q304")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      VersionedTable.write(v2Frame(s, dir), fs, root, ts = 2000L)
      VersionedTable.diff(s, fs, root, fromV = 1L, toV = 2L,
          keys = Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"), col("bal_cents"))
    }),

    // versioned table: ROLLBACK then VACUUM — restore publishes v1's
    // content as v3, vacuum(keepLast=2) drops v1's data dir; the latest
    // read serves v1's content from the restored copy (v1 itself now
    // fails fast by name — spec-pinned)
    "q305_version_restore" -> ((s, dir) => {
      val root = tmpDir("q305")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      VersionedTable.write(v2Frame(s, dir), fs, root, ts = 2000L)
      VersionedTable.restore(s, fs, root, version = 1L, ts = 3000L)
      VersionedTable.vacuum(fs, root, keepLast = 2)
      VersionedTable.readLatest(s, fs, root)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("bal_cents")).as("total_cents"))
    }),

    // incremental view maintenance: count+sum state per order priority,
    // folded forward by a delta batch of inserts (+1) and deletes (-1,
    // carrying original rows); the refresh shuffles only group-
    // cardinality partials, never the base table
    "q306_incremental_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("price_cents",
        round(col("o_totalprice") * 100, 0).cast("long"))
      val base = o.filter(col("o_orderkey") % 7 =!= 0)
      val inserts = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("w", lit(1L))
      val deletes = base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("w", lit(-1L))
      val state = IncrementalAgg.init(base, Seq("o_orderpriority"),
        Seq("price_cents"))
      val refreshed = IncrementalAgg.refresh(state,
        inserts.unionByName(deletes), Seq("o_orderpriority"),
        Seq("price_cents"), weightCol = Some("w"))
      refreshed.select(col("o_orderpriority"), col("n_rows"),
        col("sum_price_cents"))
    }),

    // incremental JOIN-aggregate view: revenue per nation maintained
    // under a lineitem delta — the refresh joins ONLY the delta rows
    // through orders→customer→nation before folding into the state
    // (at 100 TB that is a delta-sized join vs a full-fact rescan)
    "q307_incremental_join_agg" -> ((s, dir) => {
      def enrich(li: DataFrame): DataFrame = li
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100, 0).cast("long"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
            .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
      val li = t(s, dir, "lineitem")
      val base = li.filter(col("l_orderkey") % 5 =!= 0)
      val inserts = enrich(li.filter(col("l_orderkey") % 5 === 0))
        .withColumn("w", lit(1L))
      val deletes = enrich(base.filter(col("l_orderkey") % 9 === 0
          && col("l_linenumber") === 1))
        .withColumn("w", lit(-1L))
      val state = IncrementalAgg.init(enrich(base), Seq("n_name"),
        Seq("rev_cents"))
      IncrementalAgg.refresh(state, inserts.unionByName(deletes),
          Seq("n_name"), Seq("rev_cents"), weightCol = Some("w"))
        .select(col("n_name"), col("n_rows"), col("sum_rev_cents"))
    }),

    // the maintenance loop CLOSED: a versioned base table's v1→v2
    // change feed (update_preimage/update_postimage rows) maintains its
    // aggregate view with no manual delta construction — refresh cost is
    // the CDC join of the two snapshots + a group-cardinality shuffle,
    // and the result equals a full recompute on v2 (the gate's oracle)
    "q308_maintained_view_cdc" -> ((s, dir) => {
      val root = tmpDir("q308")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      VersionedTable.write(v2Frame(s, dir), fs, root, ts = 2000L)
      val state = IncrementalAgg.init(
        VersionedTable.readVersion(s, fs, root, 1L),
        Seq("c_mktsegment"), Seq("bal_cents"))
      val feed = VersionedTable.changeFeed(s, fs, root, 1L, 2L,
        keys = Seq("c_custkey"))
      IncrementalAgg.refreshFromChanges(state, feed, Seq("c_mktsegment"),
          Seq("bal_cents"))
        .select(col("c_mktsegment"), col("n_rows"), col("sum_bal_cents"))
    }),

    // pruned time travel: the snapshot COMMITS its per-file min/max
    // manifest (landed range-sorted on c_custkey), and the versioned
    // range read admits files from that manifest before opening any —
    // a later unindexed commit doesn't disturb version 1's index
    "q309_version_pruned_travel" -> ((s, dir) => {
      val root = tmpDir("q309")
      val fs = fsOps(s)
      VersionedTable.writeIndexed(v1Frame(s, dir), fs, root, ts = 1000L,
        indexCol = "c_custkey", numFiles = 8)
      VersionedTable.write(v2Frame(s, dir), fs, root, ts = 2000L)
      VersionedTable.readVersionPruned(s, fs, root, version = 1L,
        indexCol = "c_custkey", lo = 200L, hi = 700L)
    }),

    // min/max maintained UNDER DELETES: count/sum retract algebraically;
    // min/max recompute only for the groups the delta touched (one
    // broadcast-semi-join-pruned scan of those groups' base rows),
    // untouched groups keep their state extrema without any base scan
    "q310_incremental_minmax" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("price_cents",
        round(col("o_totalprice") * 100, 0).cast("long"))
      val base = o.filter(col("o_orderkey") % 7 =!= 0)
      val inserts = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("w", lit(1L))
      val deletes = base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("w", lit(-1L))
      val newBase = o.filter(
        !(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 13 === 0))
      val state = IncrementalAgg.init(base, Seq("o_orderpriority"),
        Seq("price_cents"), minCols = Seq("price_cents"),
        maxCols = Seq("price_cents"))
      IncrementalAgg.refreshWithRecompute(state,
          inserts.unionByName(deletes), newBase, Seq("o_orderpriority"),
          Seq("price_cents"), Seq("price_cents"), Seq("price_cents"),
          weightCol = Some("w"))
        .select(col("o_orderpriority"), col("n_rows"),
          col("sum_price_cents"), col("min_price_cents"),
          col("max_price_cents"))
    }),

    // streaming face of the maintenance loop: per-file triggers fold
    // order batches into the versioned state, one commit per trigger
    // (replays are idempotent by batch id recorded in the commit op);
    // the settled view equals the batch recompute — the oracle
    "q311_stream_maintained_view" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long")
          .as("price_cents"))
      val inDir = tmpDir("q311_in")
      o.repartition(4).write.mode("overwrite").parquet(inDir)
      val root = tmpDir("q311_state")
      graft.streaming.MaintainedView.runOnce(s,
          s.read.parquet(inDir).schema, inDir, root,
          Seq("o_orderpriority"), Seq("price_cents"), "q311_sink",
          maxFilesPerTrigger = Some(1))
        .select(col("o_orderpriority"), col("n_rows"),
          col("sum_price_cents"))
    }),

    // streaming maintained view WITH min/max (insert-only stream:
    // extrema only ever tighten, so the per-trigger fold is exact and
    // algebraic — parity with catchUp's min/max face); settled view
    // equals the batch recompute regardless of trigger boundaries
    "q320_stream_minmax_view" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long")
          .as("price_cents"))
      val inDir = tmpDir("q320_in")
      o.repartition(4).write.mode("overwrite").parquet(inDir)
      val root = tmpDir("q320_state")
      graft.streaming.MaintainedView.runOnce(s,
          s.read.parquet(inDir).schema, inDir, root,
          Seq("o_orderpriority"), Seq("price_cents"), "q320_sink",
          maxFilesPerTrigger = Some(1),
          minCols = Seq("price_cents"), maxCols = Seq("price_cents"))
        .select(col("o_orderpriority"), col("n_rows"),
          col("sum_price_cents"), col("min_price_cents"),
          col("max_price_cents"))
    }),

    // 2-D pruned time travel: the snapshot commits z-ordered on (x, y)
    // with each file's bounding RECTANGLE in the manifest, so a box
    // predicate on BOTH axes admits files before any opens — the
    // OPTIMIZE ZORDER trade, per committed snapshot
    "q312_version_zorder_travel" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        (col("o_orderkey") % 64).as("x"),
        (col("o_custkey") % 64).as("y"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long")
          .as("price_cents"))
      val root = tmpDir("q312")
      val fs = fsOps(s)
      VersionedTable.writeZIndexed(o, fs, root, ts = 1000L,
        xCol = "x", yCol = "y", bits = 6, numFiles = 16)
      VersionedTable.readVersionPrunedRect(s, fs, root, version = 1L,
        "x", "y", xLo = 8, xHi = 23, yLo = 16, yHi = 47)
    }),

    // OPTIMIZE: a high-frequency maintenance loop left the latest
    // snapshot in 32 small files; compact republishes IDENTICAL content
    // range-indexed in 4 files as a new version (op=compact) with no
    // write outage — the gate reads the compacted latest
    "q313_version_compact" -> ((s, dir) => {
      val root = tmpDir("q313")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir).repartition(32), fs, root,
        ts = 1000L)
      VersionedTable.compact(s, fs, root, ts = 2000L, numFiles = 4,
        indexCol = Some("c_custkey"))
      VersionedTable.readLatest(s, fs, root)
    }),

    // CDC-source maintenance: the maintained view is fed straight from
    // the base table's COMMIT LOG — catchUp folds each unconsumed
    // version as a change feed against its predecessor (bootstrap =
    // insert load), one exactly-once state commit per base version;
    // the settled view equals a full recompute on the latest snapshot
    "q314_catchup_maintained_view" -> ((s, dir) => {
      val tableRoot = tmpDir("q314_t")
      val stateRoot = tmpDir("q314_s")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, tableRoot, ts = 1000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents")) // poll 1: bootstrap
      VersionedTable.write(v2Frame(s, dir), fs, tableRoot, ts = 2000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents")) // poll 2: incremental CDC fold
      VersionedTable.readLatest(s, fs, stateRoot)
        .select(col("c_mktsegment"), col("n_rows"), col("sum_bal_cents"))
    }),

    // hive-partitioned snapshot: the time-travel read of a
    // partition-filtered slice prunes whole col=value directories via
    // Spark's partition discovery (PartitionFilters on the scan —
    // spec-pinned; the oracle checks the content)
    "q315_version_partitioned" -> ((s, dir) => {
      val root = tmpDir("q315")
      val fs = fsOps(s)
      VersionedTable.writePartitioned(v1Frame(s, dir), fs, root,
        ts = 1000L, partitionCols = Seq("c_mktsegment"))
      VersionedTable.readVersion(s, fs, root, 1L)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_name"), col("bal_cents"),
          col("c_mktsegment"))
    }),

    // optimistic concurrency: two writers base their snapshot on v1;
    // the second writeIf refuses (ConcurrentModificationException)
    // instead of silently dropping the first's change, re-reads v2 and
    // recommits — the final table carries BOTH edits
    "q316_version_occ" -> ((s, dir) => {
      val root = tmpDir("q316")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      // writer A from base 1: +100 cents on %5 keys
      val a = VersionedTable.readVersion(s, fs, root, 1L)
        .withColumn("bal_cents",
          when(col("c_custkey") % 5 === 0, col("bal_cents") + 100L)
            .otherwise(col("bal_cents")))
      VersionedTable.writeIf(a, fs, root, ts = 2000L,
        expectedVersion = 1L)
      // writer B also from base 1: drop %11 keys — conflicts, retries
      def bFrom(v: Long) = VersionedTable.readVersion(s, fs, root, v)
        .filter(col("c_custkey") % 11 =!= 0)
      try VersionedTable.writeIf(bFrom(1L), fs, root, ts = 3000L,
        expectedVersion = 1L)
      catch { case _: java.util.ConcurrentModificationException =>
        VersionedTable.writeIf(bFrom(2L), fs, root, ts = 3000L,
          expectedVersion = 2L) // re-read, recompute, retry
      }
      VersionedTable.readLatest(s, fs, root)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("bal_cents")).as("total_cents"))
    }),

    // the training-data loop end to end: a VERSIONED corpus (deletes +
    // text re-extractions between v1 and v2) maintains its dedup
    // artifacts from its own commit log (delta-signed only — the corpus
    // is never re-shingled outside the CDC delta), then an incoming
    // delivery is admitted against the MAINTAINED artifacts; the oracle
    // recomputes exact+near-dup admission from scratch on v2, so any
    // staleness in the maintained artifacts (leftover deleted digest,
    // un-resigned update) would flip admitted rows
    // TIME TRAVEL ON THE SQL SURFACE (the q76 composition shape): the
    // whole chain runs through params files — two VersionWrite commits,
    // a VersionRead AS OF the first timestamp dumping the snapshot,
    // then a SQLRunner step aggregating the dump — so versioned tables
    // compose with arbitrary SQL steps on the acon/CLI surface
    "q326_version_asof_sql_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("q326")
      val root = s"$base/table"
      v1Frame(s, dir).write.parquet(s"$base/src1")
      v2Frame(s, dir).write.parquet(s"$base/src2")
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("VersionWrite",
        s"""{"source_dir": "$base/src1", "table_root": "$root",
           | "ts": 1000}""".stripMargin)
      run("VersionWrite",
        s"""{"source_dir": "$base/src2", "table_root": "$root",
           | "ts": 2000}""".stripMargin)
      run("VersionRead",
        s"""{"table_root": "$root", "as_of_ts": 1500,
           | "target_dir": "$base/asof"}""".stripMargin)
      graft.algos.SQLRunner.run(s, Seq(
        "CREATE OR REPLACE TEMPORARY VIEW graft_asof AS " +
          s"SELECT * FROM parquet.`$base/asof`",
        """SELECT c_mktsegment,
          |  count(*) AS n_customers,
          |  sum(bal_cents) AS total_cents
          |FROM graft_asof GROUP BY c_mktsegment""".stripMargin))
    }),

    // SCHEMA EVOLUTION across versions: v2 gains a column, and the
    // boundary diff aligns the missing side as typed nulls — a row
    // whose only difference is the new column being non-null
    // classifies as an update, null-valued new columns leave rows
    // unchanged, deletes carry the FROM side (aligned null) — the
    // OverwritePartitionsWithAddedColumns semantics on the CDC surface
    "q325_schema_evolution_diff" -> ((s, dir) => {
      val root = tmpDir("q325")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, root, ts = 1000L)
      val v2evo = v2Frame(s, dir).withColumn("vip",
        when(col("c_custkey") % 25 === 0, lit(1L))
          .otherwise(lit(null).cast("long")))
      VersionedTable.write(v2evo, fs, root, ts = 2000L)
      VersionedTable.diff(s, fs, root, fromV = 1L, toV = 2L,
          keys = Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"), col("bal_cents"),
          col("vip"))
    }),

    // q317 with PARTITION-ALIGNED artifacts: the table is hash-bucketed
    // on id, so the CDC fold reads and rewrites ONLY the buckets the
    // delta touches (fold bytes ∝ delta — spec-pinned at the fs level);
    // admission must be indistinguishable from the plain layout, so the
    // oracle is exactly q317's from-scratch recompute
    "q324_bucketed_artifact_maintenance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = tmpDir("q324_c")
      val arts = tmpDir("q324_a")
      val fs = fsOps(s)
      val v1 = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("text"))
      val v2 = v1.filter(col("doc_id") % 9 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(lit("v2 "), col("text")))
            .otherwise(col("text")))
      VersionedTable.write(v1, fs, corpus, ts = 1000L)
      graft.operators.CorpusMaintenance.catchUpArtifacts(s, fs, corpus,
        arts, "doc_id", "text", buckets = Some(16)) // bucketed bootstrap
      VersionedTable.write(v2, fs, corpus, ts = 2000L)
      graft.operators.CorpusMaintenance.catchUpArtifacts(s, fs, corpus,
        arts, "doc_id", "text", buckets = Some(16)) // delta-bucket fold
      val incoming = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      graft.operators.CorpusMaintenance.admit(s, fs, incoming, corpus,
          arts, "doc_id", "text", threshold = 0.5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
    }),

    "q317_corpus_artifact_maintenance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = tmpDir("q317_c")
      val arts = tmpDir("q317_a")
      val fs = fsOps(s)
      val v1 = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("text"))
      val v2 = v1.filter(col("doc_id") % 9 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(lit("v2 "), col("text")))
            .otherwise(col("text")))
      VersionedTable.write(v1, fs, corpus, ts = 1000L)
      graft.operators.CorpusMaintenance.catchUpArtifacts(s, fs, corpus,
        arts, "doc_id", "text") // poll 1: bootstrap-signs v1
      VersionedTable.write(v2, fs, corpus, ts = 2000L)
      graft.operators.CorpusMaintenance.catchUpArtifacts(s, fs, corpus,
        arts, "doc_id", "text") // poll 2: CDC fold, delta-signed only
      val incoming = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      graft.operators.CorpusMaintenance.admit(s, fs, incoming, corpus,
          arts, "doc_id", "text", threshold = 0.5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
    }),

    // the similarity-family maintenance loop: a VERSIONED embeddings
    // table (deletes + inserts between v1 and v2) maintains its IVF-PQ
    // index from its own commit log — quantizers FROZEN at bootstrap
    // (trained on v1, the add-after-train contract), CDC folds encode
    // only the delta — then ANN queries run against the MAINTAINED
    // index; the oracle re-derives codes/cells for ALL of v2 under the
    // same v1-trained quantizers, so a stale code or leftover deleted
    // vector would flip neighbors
    "q318_vector_index_maintenance" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding"))
      val embRoot = tmpDir("q318_e")
      val idxRoot = tmpDir("q318_i")
      val fs = fsOps(s)
      val v1 = emb.filter(col("vec_id") % 3 =!= 0)
      val v2 = v1.filter(col("vec_id") % 7 =!= 0)
        .unionByName(emb.filter(col("vec_id") % 3 === 0
          && col("vec_id") % 2 === 0))
      VersionedTable.write(v1, fs, embRoot, ts = 1000L)
      graft.operators.VectorIndexMaintenance.catchUpIndex(s, fs,
        embRoot, idxRoot, "vec_id", "embedding", dim = 64, m = 8,
        ks = 16, centroids = 32) // bootstrap: train + encode v1
      VersionedTable.write(v2, fs, embRoot, ts = 2000L)
      graft.operators.VectorIndexMaintenance.catchUpIndex(s, fs,
        embRoot, idxRoot, "vec_id", "embedding", dim = 64, m = 8,
        ks = 16, centroids = 32) // CDC fold: delta encode only
      val queries = VersionedTable.readLatest(s, fs, embRoot)
        .filter(col("vec_id") % 50 === 0)
      graft.operators.VectorIndexMaintenance.searchMaintained(s, fs,
        queries, idxRoot, "vec_id", "embedding", k = 5, dim = 64,
        m = 8, nprobe = 4)
    }),

    // WRITER-RECORDED change set: v2 lands via MERGE (upserts + delete
    // keys), which computes the 4-type feed at write time and records
    // it inside the commit — changeFeed(1,2) then serves a plain scan
    // of delta-cardinality rows (no snapshot join; plan-spec-pinned);
    // the oracle recomputes the feed from the v1/v2 definitions, so a
    // wrong or incomplete recorded set cannot hide behind the fallback
    "q322_recorded_changefeed" -> ((s, dir) => {
      val root = tmpDir("q322")
      val fs = fsOps(s)
      val v1 = v1Frame(s, dir)
      VersionedTable.write(v1, fs, root, ts = 1000L)
      val deleteKeys = v1.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"))
      val upserts = v1
        .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
        .withColumn("bal_cents", col("bal_cents") + 1000L)
        .unionByName(t(s, dir, "customer")
          .filter(col("c_custkey") % 3 === 0
            && col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            round(col("c_acctbal") * 100, 0).cast("long")
              .as("bal_cents")))
      VersionedTable.merge(s, fs, root, upserts, deleteKeys,
        keys = Seq("c_custkey"), ts = 2000L)
      VersionedTable.changeFeed(s, fs, root, 1L, 2L,
          keys = Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"), col("bal_cents"))
    }),

    // q322 on a BUCKETED chain: the base table itself is hash-bucketed,
    // so the merge dispatches to the delta-commit path — only the
    // buckets the delta keys hash into are read and rewritten, and the
    // feed is served from the recorded set exactly as on the plain
    // layout (same oracle: the recorded feed is layout-invariant)
    "q327_bucketed_merge_feed" -> ((s, dir) => {
      val root = tmpDir("q327")
      val fs = fsOps(s)
      val v1 = v1Frame(s, dir)
      VersionedTable.writeBucketed(v1, fs, root, ts = 1000L,
        bucketBy = "c_custkey", nBuckets = 16)
      val deleteKeys = v1.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"))
      val upserts = v1
        .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
        .withColumn("bal_cents", col("bal_cents") + 1000L)
        .unionByName(t(s, dir, "customer")
          .filter(col("c_custkey") % 3 === 0
            && col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            round(col("c_acctbal") * 100, 0).cast("long")
              .as("bal_cents")))
      VersionedTable.merge(s, fs, root, upserts, deleteKeys,
        keys = Seq("c_custkey"), ts = 2000L)
      VersionedTable.changeFeed(s, fs, root, 1L, 2L,
          keys = Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"), col("bal_cents"))
    }),

    // the maintenance loop over a RECORDED-changes commit: catch-up
    // consumes the recorded set (O(delta) fold — no snapshot join) and
    // must land on the SAME settled view as the snapshot-diff fold:
    // the oracle is the full recompute on v2, exactly q314's
    "q323_merge_maintained_view" -> ((s, dir) => {
      val tableRoot = tmpDir("q323_t")
      val stateRoot = tmpDir("q323_s")
      val fs = fsOps(s)
      val v1 = v1Frame(s, dir)
      VersionedTable.write(v1, fs, tableRoot, ts = 1000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents")) // poll 1: bootstrap
      val deleteKeys = v1.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"))
      val upserts = v1
        .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
        .withColumn("bal_cents", col("bal_cents") + 1000L)
        .unionByName(t(s, dir, "customer")
          .filter(col("c_custkey") % 3 === 0
            && col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            round(col("c_acctbal") * 100, 0).cast("long")
              .as("bal_cents")))
      VersionedTable.merge(s, fs, tableRoot, upserts, deleteKeys,
        keys = Seq("c_custkey"), ts = 2000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents")) // poll 2: folds the RECORDED feed
      VersionedTable.readLatest(s, fs, stateRoot)
        .select(col("c_mktsegment"), col("n_rows"), col("sum_bal_cents"))
    }),

    // explicit index REBUILD: the corpus drifted from the bootstrap
    // snapshot (deletes + inserts), so quantizers are RETRAINED on the
    // latest snapshot into a fresh root (outage-free — the old index
    // root stays live until readers swap); the oracle re-derives the
    // whole IVF-PQ chain with v2-trained quantizers, so a leftover
    // v1-trained artifact anywhere in the rebuilt root flips neighbors
    "q321_vector_index_rebuild" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding"))
      val embRoot = tmpDir("q321_e")
      val idx2 = tmpDir("q321_r")
      val fs = fsOps(s)
      val v1 = emb.filter(col("vec_id") % 3 =!= 0)
      val v2 = v1.filter(col("vec_id") % 7 =!= 0)
        .unionByName(emb.filter(col("vec_id") % 3 === 0
          && col("vec_id") % 2 === 0))
      VersionedTable.write(v1, fs, embRoot, ts = 1000L)
      VersionedTable.write(v2, fs, embRoot, ts = 2000L)
      graft.operators.VectorIndexMaintenance.rebuild(s, fs, embRoot,
        idx2, "vec_id", "embedding", dim = 64, m = 8, ks = 16,
        centroids = 32) // retrain + full encode AT THE LATEST version
      val queries = VersionedTable.readLatest(s, fs, embRoot)
        .filter(col("vec_id") % 50 === 0)
      graft.operators.VectorIndexMaintenance.searchMaintained(s, fs,
        queries, idx2, "vec_id", "embedding", k = 5, dim = 64,
        m = 8, nprobe = 4)
    }),

    // CDC maintenance with MIN/MAX: the v1→v2 fold retracts count/sum
    // algebraically and recomputes extrema ONLY for the feed-touched
    // groups (broadcast-semi-join-pruned scan of v2); v2's deletes
    // remove group extrema, so a stale carried min/max would flip the
    // oracle's recompute
    "q319_catchup_minmax_view" -> ((s, dir) => {
      val tableRoot = tmpDir("q319_t")
      val stateRoot = tmpDir("q319_s")
      val fs = fsOps(s)
      VersionedTable.write(v1Frame(s, dir), fs, tableRoot, ts = 1000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents"), minCols = Seq("bal_cents"),
        maxCols = Seq("bal_cents"))
      VersionedTable.write(v2Frame(s, dir), fs, tableRoot, ts = 2000L)
      graft.streaming.MaintainedView.catchUp(s, fs, tableRoot, stateRoot,
        cdcKeys = Seq("c_custkey"), groupKeys = Seq("c_mktsegment"),
        sumCols = Seq("bal_cents"), minCols = Seq("bal_cents"),
        maxCols = Seq("bal_cents"))
      VersionedTable.readLatest(s, fs, stateRoot)
        .select(col("c_mktsegment"), col("n_rows"), col("sum_bal_cents"),
          col("min_bal_cents"), col("max_bal_cents"))
    })
  )

  /** q322/q327 shared oracle: the 4-type feed recomputed from the
    * v1/v2 definitions — the recorded set must be layout-invariant
    * (plain copy-on-write merge vs bucketed delta merge).
    */
  private lazy val recordedFeedOracle: String =
    s"""WITH v1 AS ($v1Sql), v2 AS ($v2Sql)
       |SELECT c_custkey, 'insert' AS change_type, bal_cents FROM v2
       |WHERE c_custkey NOT IN (SELECT c_custkey FROM v1)
       |UNION ALL
       |SELECT c_custkey, 'delete' AS change_type, bal_cents FROM v1
       |WHERE c_custkey NOT IN (SELECT c_custkey FROM v2)
       |UNION ALL
       |SELECT v1.c_custkey, 'update_preimage' AS change_type,
       |  v1.bal_cents
       |FROM v1 JOIN v2 ON v1.c_custkey = v2.c_custkey
       |WHERE v1.bal_cents <> v2.bal_cents OR v1.c_name <> v2.c_name
       |   OR v1.c_mktsegment <> v2.c_mktsegment
       |UNION ALL
       |SELECT v2.c_custkey, 'update_postimage' AS change_type,
       |  v2.bal_cents
       |FROM v1 JOIN v2 ON v1.c_custkey = v2.c_custkey
       |WHERE v1.bal_cents <> v2.bal_cents OR v1.c_name <> v2.c_name
       |   OR v1.c_mktsegment <> v2.c_mktsegment""".stripMargin

  /** q317/q324 shared oracle: exact+near-dup admission recomputed from
    * scratch against the corpus's v2 — layout (plain vs bucketed
    * artifacts) must be invisible to the admitted set.
    */
  private lazy val corpusAdmitOracle: String =
    s"""WITH v1 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
       |existing AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 13 = 0 THEN 'v2 ' || text ELSE text END
       |      AS text
       |  FROM v1 WHERE doc_id % 9 <> 0),
       |inc AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |inp AS (
       |  SELECT i.doc_id, i.text FROM inc i
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text))),
       |docs0 AS (
       |  SELECT doc_id, text FROM existing
       |  UNION ALL SELECT doc_id, text FROM inp),
       |${OracleHelpers.minhashChainSql("docs0")},
       |pairs AS (
       |  SELECT id_a, id_b FROM j
       |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
       |bad AS (
       |  SELECT id_b AS doc_id FROM pairs
       |  WHERE id_a IN (SELECT doc_id FROM existing)
       |  UNION
       |  SELECT id_a AS doc_id FROM pairs
       |  WHERE id_b IN (SELECT doc_id FROM existing))
       |SELECT d.doc_id, d.lang FROM documents d
       |WHERE d.doc_id IN (SELECT doc_id FROM inp)
       |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q303_version_travel" -> v1Sql,

    "q304_version_diff" ->
      s"""WITH v1 AS ($v1Sql), v2 AS ($v2Sql)
         |SELECT COALESCE(v2.c_custkey, v1.c_custkey) AS c_custkey,
         |  CASE WHEN v1.c_custkey IS NULL THEN 'insert'
         |       WHEN v2.c_custkey IS NULL THEN 'delete'
         |       ELSE 'update' END AS change_type,
         |  CASE WHEN v2.c_custkey IS NULL THEN v1.bal_cents
         |       ELSE v2.bal_cents END AS bal_cents
         |FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
         |WHERE v1.c_custkey IS NULL OR v2.c_custkey IS NULL
         |   OR v1.bal_cents <> v2.bal_cents
         |   OR v1.c_name <> v2.c_name
         |   OR v1.c_mktsegment <> v2.c_mktsegment""".stripMargin,

    "q305_version_restore" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
         |FROM ($v1Sql) GROUP BY c_mktsegment""".stripMargin,

    // final logical table = (base \ deletes) ∪ inserts
    //                     = orders minus (key%7<>0 AND key%13=0)
    "q306_incremental_agg" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents
        |FROM orders
        |WHERE NOT (o_orderkey % 7 <> 0 AND o_orderkey % 13 = 0)
        |GROUP BY o_orderpriority""".stripMargin,

    "q307_incremental_join_agg" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100,
        |    0) AS BIGINT)) AS BIGINT) AS sum_rev_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT (l_orderkey % 5 <> 0 AND l_orderkey % 9 = 0
        |  AND l_linenumber = 1)
        |GROUP BY n_name""".stripMargin,

    // the maintained view must equal a FULL RECOMPUTE on v2
    "q308_maintained_view_cdc" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
         |FROM ($v2Sql) GROUP BY c_mktsegment""".stripMargin,

    "q309_version_pruned_travel" ->
      s"""SELECT * FROM ($v1Sql)
         |WHERE c_custkey BETWEEN 200 AND 700""".stripMargin,

    // final logical table = (base \ deletes) ∪ inserts
    "q310_incremental_minmax" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(pc) AS BIGINT) AS sum_price_cents,
        |  CAST(min(pc) AS BIGINT) AS min_price_cents,
        |  CAST(max(pc) AS BIGINT) AS max_price_cents
        |FROM (SELECT o_orderpriority,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
        |      FROM orders
        |      WHERE NOT (o_orderkey % 7 <> 0 AND o_orderkey % 13 = 0))
        |GROUP BY o_orderpriority""".stripMargin,

    "q311_stream_maintained_view" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS sum_price_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q320_stream_minmax_view" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(pc) AS BIGINT) AS sum_price_cents,
        |  CAST(min(pc) AS BIGINT) AS min_price_cents,
        |  CAST(max(pc) AS BIGINT) AS max_price_cents
        |FROM (SELECT o_orderpriority,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
        |      FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,

    "q312_version_zorder_travel" ->
      """SELECT * FROM (
        |  SELECT o_orderkey % 64 AS x, o_custkey % 64 AS y, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders)
        |WHERE x BETWEEN 8 AND 23 AND y BETWEEN 16 AND 47""".stripMargin,

    // content identical to v1 by construction — the oracle IS v1
    "q313_version_compact" -> v1Sql,

    // same recompute-on-v2 oracle as q308: the CDC-source loop must
    // land on the identical settled view
    "q314_catchup_maintained_view" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
         |FROM ($v2Sql) GROUP BY c_mktsegment""".stripMargin,

    "q315_version_partitioned" ->
      s"""SELECT c_custkey, c_name, bal_cents, c_mktsegment
         |FROM ($v1Sql)
         |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin,

    // mirrors q317: admission recomputed from scratch against v2 — the
    // q72 oracle chain with the versioned corpus's v2 as the landed side
    "q317_corpus_artifact_maintenance" -> corpusAdmitOracle,

    // q324's admission must be layout-invariant: same oracle as q317
    "q324_bucketed_artifact_maintenance" -> corpusAdmitOracle,

    // AS OF 1500 resolves to v1: the SQL step's aggregate over v1
    "q326_version_asof_sql_pipeline" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
         |FROM ($v1Sql) GROUP BY c_mktsegment""".stripMargin,

    // the full-outer diff with the v1 side's missing column aligned to
    // NULL: updates fire on payload drift OR a non-null new column;
    // deletes carry the (aligned-null) FROM side
    "q325_schema_evolution_diff" ->
      s"""WITH v1 AS ($v1Sql),
         |v2 AS (
         |  SELECT v.*, CASE WHEN c_custkey % 25 = 0
         |    THEN CAST(1 AS BIGINT) ELSE NULL END AS vip
         |  FROM ($v2Sql) v)
         |SELECT COALESCE(v2.c_custkey, v1.c_custkey) AS c_custkey,
         |  CASE WHEN v1.c_custkey IS NULL THEN 'insert'
         |       WHEN v2.c_custkey IS NULL THEN 'delete'
         |       ELSE 'update' END AS change_type,
         |  CASE WHEN v2.c_custkey IS NULL THEN v1.bal_cents
         |       ELSE v2.bal_cents END AS bal_cents,
         |  CASE WHEN v2.c_custkey IS NULL THEN NULL
         |       ELSE v2.vip END AS vip
         |FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
         |WHERE v1.c_custkey IS NULL OR v2.c_custkey IS NULL
         |   OR v1.bal_cents <> v2.bal_cents
         |   OR v1.c_name <> v2.c_name
         |   OR v1.c_mktsegment <> v2.c_mktsegment
         |   OR v2.vip IS NOT NULL""".stripMargin,

    // mirrors q318: the q273 IVF-PQ chain with quantizers (sel/cent)
    // trained on V1 while codes/cells/queries cover V2 — exactly the
    // frozen-at-bootstrap maintenance contract
    "q318_vector_index_maintenance" -> {
      import graft.functions.PortableHash
      val h = PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")
      val l2 = OracleHelpers.l2Sql _
      s"""WITH v1 AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <> 0),
         |v2 AS (
         |  SELECT vec_id, embedding FROM v1 WHERE vec_id % 7 <> 0
         |  UNION ALL
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 3 = 0 AND vec_id % 2 = 0),
         |sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY $h, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM v1 ORDER BY $h, vec_id LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM v2 e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce2
         |  FROM v1 ORDER BY $h, vec_id LIMIT 32),
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM v2 e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM v2 e CROSS JOIN cent c
         |    WHERE e.vec_id % 50 = 0) WHERE rk <= 4),
         |ad AS (
         |  SELECT t.query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(t.qd) AS BIGINT) AS adfix
         |  FROM enc e
         |  JOIN asg a ON e.vec_id = a.vec_id
         |  JOIN probe p ON a.cid = p.cid
         |  JOIN qt t ON p.query_id = t.query_id
         |    AND e.j = t.j AND e.code = t.code
         |  WHERE t.query_id <> e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id,
         |  round(adfix / 1048576.0, 6) AS pq_dist
         |FROM ad
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adfix, neighbor_id) <= 5""".stripMargin
    },

    // the 4-type feed recomputed from the v1/v2 definitions: inserts,
    // deletes, and BOTH images per updated key
    "q322_recorded_changefeed" -> recordedFeedOracle,

    // q327 lands the SAME logical v2 through the bucketed merge — the
    // recorded feed must be layout-invariant
    "q327_bucketed_merge_feed" -> recordedFeedOracle,

    // same recompute-on-v2 oracle as q314: the recorded-feed fold must
    // land on the identical settled view
    "q323_merge_maintained_view" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
         |FROM ($v2Sql) GROUP BY c_mktsegment""".stripMargin,

    // mirrors q321: the q318 IVF-PQ chain with sel/cent (quantizers)
    // trained on V2 — the rebuild retrains on the latest snapshot
    "q321_vector_index_rebuild" -> {
      import graft.functions.PortableHash
      val h = PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")
      val l2 = OracleHelpers.l2Sql _
      s"""WITH v1 AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <> 0),
         |v2 AS (
         |  SELECT vec_id, embedding FROM v1 WHERE vec_id % 7 <> 0
         |  UNION ALL
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 3 = 0 AND vec_id % 2 = 0),
         |sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY $h, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM v2 ORDER BY $h, vec_id LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM v2 e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce2
         |  FROM v2 ORDER BY $h, vec_id LIMIT 32),
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM v2 e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM v2 e CROSS JOIN cent c
         |    WHERE e.vec_id % 50 = 0) WHERE rk <= 4),
         |ad AS (
         |  SELECT t.query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(t.qd) AS BIGINT) AS adfix
         |  FROM enc e
         |  JOIN asg a ON e.vec_id = a.vec_id
         |  JOIN probe p ON a.cid = p.cid
         |  JOIN qt t ON p.query_id = t.query_id
         |    AND e.j = t.j AND e.code = t.code
         |  WHERE t.query_id <> e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id,
         |  round(adfix / 1048576.0, 6) AS pq_dist
         |FROM ad
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adfix, neighbor_id) <= 5""".stripMargin
    },

    // full recompute on v2, count/sum/min/max per segment
    "q319_catchup_minmax_view" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
         |  CAST(min(bal_cents) AS BIGINT) AS min_bal_cents,
         |  CAST(max(bal_cents) AS BIGINT) AS max_bal_cents
         |FROM ($v2Sql) GROUP BY c_mktsegment""".stripMargin,

    // final logical table = v1 with A's +100 on %5 keys AND B's %11
    // deletes — BOTH edits survive the conflict protocol
    "q316_version_occ" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 100
         |               ELSE bal_cents END) AS BIGINT) AS total_cents
         |FROM ($v1Sql)
         |WHERE c_custkey % 11 <> 0
         |GROUP BY c_mktsegment""".stripMargin
  )
}
