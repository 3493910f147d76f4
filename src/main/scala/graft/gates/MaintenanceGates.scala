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
    })
  )

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
        |GROUP BY n_name""".stripMargin
  )
}
