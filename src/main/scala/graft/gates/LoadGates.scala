package graft.gates

import graft.algos._
import graft.core.Tables
import graft.expr.{DateComponents, PartitionCriteria, SchemaOps}
import graft.catalog.{CatalogOps, TableWriter}
import graft.fsops.FsOps
import graft.io.{DataFormat, LoadMode}
import graft.functions.PortableHash
import graft.operators._
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import OracleHelpers._

/** Gates: reference load algorithms end-to-end + IO / catalog / schema ops. */
object LoadGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3/P10: delta condensation window (latest record per business key)
    "q10_latest_events" -> ((s, dir) => {
      DeltaMerge.condense(t(s, dir, "events"),
          businessKey = Seq("user_id", "event_type"),
          technicalKey = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 2).as("value"))
    }),

    // U2: Spark-native CDC merge algebra (anti-join + union of upserts)
    "q11_delta_merge" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val active = e.filter(col("event_id") % 5 =!= 0)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"))
      val delta = e.filter(col("event_id") % 4 === 0)
        .select(col("event_id"), col("user_id"),
          round(col("value") + 10, 2).as("value"),
          when(col("event_id") % 20 === 0, "D").otherwise("N")
            .as("recordmode"))
      val condensed = DeltaMerge.condense(delta, Seq("event_id"), Seq("user_id"))
      DeltaMerge.merge(active, condensed, Seq("event_id"),
        col("recordmode") =!= "D")
    }),

    // FullLoad end-to-end: DSV landing → date partitions → atomic write
    "q30_full_load" -> ((s, dir) => {
      val landing = tmpDir("graft_fl_landing")
      val target = tmpDir("graft_fl_target") + "/table"
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("orderdate"))
        .write.mode("overwrite").option("sep", "|").csv(landing)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("orderdate", StringType),
        StructField("year", ShortType), StructField("month", ShortType)))
      // month-granularity partitions: ~84 dirs over the 7-year span. Daily
      // partitioning at this row density is the small-files antipattern —
      // dir count grows 30x while file sizes collapse.
      new FullLoad(s, fsOps(s), FullLoadParams(
        sourceDir = landing, targetDir = target,
        format = DataFormat.Dsv("|", hasHeader = false),
        targetSchema = Some(schema),
        partitionSourceColumn = Some("orderdate"),
        targetPartitions = Seq("year", "month"))).run()
      s.read.option("basePath", target).parquet(target)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("year").cast("short").as("year"),
          col("month").cast("short").as("month"))
    }),

    // AppendLoad end-to-end: filename-regex partitions + header files
    "q31_append_load" -> ((s, dir) => {
      val landing = tmpDir("graft_al_landing")
      val header = tmpDir("graft_al_header")
      val target = tmpDir("graft_al_target") + "/table"
      val e = t(s, dir, "events")
      val d0 = e.agg(min(to_date(col("ts"))).as("d0")).collect()(0)
        .getDate(0).toLocalDate
      val d1 = d0.plusDays(1)
      e.withColumn("date_str", date_format(col("ts"), "yyyyMMdd"))
        .filter(col("date_str").isin(
          d0.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE),
          d1.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)))
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"), col("date_str"))
        .write.mode("overwrite").partitionBy("date_str").option("sep", "|")
        .csv(landing)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType),
        StructField("date_part", StringType)))
      new AppendLoad(s, fsOps(s), AppendLoadParams(
        sourceDir = landing, targetDir = target, headerDir = header,
        format = DataFormat.Dsv("|", hasHeader = false),
        targetSchema = schema,
        partitionRegexes = Seq(".*date_str=(\\d{8}).*"),
        targetPartitions = Seq("date_part"))).run()
      s.read.option("basePath", target).parquet(target)
        .select(col("event_id"), col("user_id"), col("value"),
          col("date_part").cast("string").as("date_part"))
    }),

    // DeltaLoad end-to-end: partitioned CDC merge over directories
    "q32_delta_load" -> ((s, dir) => {
      val activeD = tmpDir("graft_dl_active") + "/t"
      val deltaD = tmpDir("graft_dl_delta") + "/t"
      val e = t(s, dir, "events")
      e.filter(col("event_id") % 5 =!= 0)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"), col("event_type"))
        .write.partitionBy("event_type").parquet(activeD)
      e.filter(col("event_id") % 4 === 0)
        .select(col("event_id"), col("user_id"),
          round(col("value") + 10, 2).as("value"),
          when(col("event_id") % 20 === 0, "D").otherwise("N")
            .as("recordmode"), col("event_type"))
        .write.parquet(deltaD)
      new DeltaLoad(s, fsOps(s), DeltaLoadParams(
        activeDir = activeD, deltaDir = deltaD,
        format = DataFormat.Parquet,
        businessKey = Seq("event_id"), technicalKey = Seq("user_id"),
        recordsToDelete = Seq("D"),
        targetPartitions = Seq("event_type"))).run()
      s.read.option("basePath", activeD).parquet(activeD)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type").cast("string").as("event_type"))
    }),

    // Materialization end-to-end: criteria-scoped, versioned target
    "q33_materialization" -> ((s, dir) => {
      val src = tmpDir("graft_mat_src") + "/t"
      val tgt = tmpDir("graft_mat_tgt")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_linestatus"))
        .write.partitionBy("l_linestatus").parquet(src)
      val mat = new Materialization(s, fsOps(s), MaterializationParams(
        sourceDir = src, targetBaseDir = tgt,
        scope = MaterializationScope.Query(Seq(Seq("l_linestatus" -> "F"))),
        targetPartitions = Seq("l_linestatus")))
      mat.run()
      s.read.option("basePath", mat.currentVersion.get)
        .parquet(mat.currentVersion.get)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // SQLRunner pass-through
    "q34_sqlrunner" -> ((s, dir) => {
      SQLRunner.run(s, Seq(
        s"CREATE OR REPLACE TEMPORARY VIEW graft_li AS SELECT * FROM parquet.`$dir/lineitem.parquet`",
        "SELECT l_returnflag, count(*) AS n FROM graft_li GROUP BY l_returnflag"))
    }),

    // A2 with first(): deterministic because input is pre-condensed
    "q35_transpose_first" -> ((s, dir) => {
      val latest = DeltaMerge.condense(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
      Transpose(latest, Seq("user_id"), "event_type",
        Seq("click", "view", "purchase", "signup", "error"), "value")
    }),

    // GzipDecompressor end-to-end: gzip landing → decompress → read
    "q36_gzip_load" -> ((s, dir) => {
      val landing = tmpDir("graft_gz") + "/in"
      t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        .coalesce(1)
        .write.option("sep", "|").option("compression", "gzip").csv(landing)
      new GzipDecompressor(s.sparkContext.hadoopConfiguration, fsOps(s))
        .run(landing)
      val schema = StructType(Seq(StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      DataFormat.Dsv("|", hasHeader = false)
        .read(s, Map("mode" -> "FAILFAST"), Some(schema), landing)
    }),

    // S4/S5/W3/A6/§2.10: metastore table create at location, partition
    // recovery, ANALYZE stats, read back through the catalog
    "q38_catalog_table" -> ((s, dir) => {
      val loc = tmpDir("graft_cat") + "/t"
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_linestatus"))
        .write.partitionBy("l_linestatus").parquet(loc)
      s.sql("DROP TABLE IF EXISTS graft_cat_q38")
      s.sql("CREATE TABLE graft_cat_q38 (l_orderkey BIGINT, l_quantity DOUBLE, " +
        s"l_linestatus STRING) USING parquet PARTITIONED BY (l_linestatus) LOCATION '$loc'")
      graft.catalog.CatalogOps.recoverPartitionsNative(s, "graft_cat_q38")
      graft.catalog.CatalogOps.computeStatistics(s, "graft_cat_q38")
      s.table("graft_cat_q38")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // W3: TableWriter round-trip — saveAsTable create, then TRUNCATE-first
    // overwrite with a deliberately column-reordered frame (positional
    // insertInto must re-align or the values land in the wrong columns)
    "q50_table_writer" -> ((s, dir) => {
      s.sql("DROP TABLE IF EXISTS graft_q50")
      // a managed table's warehouse dir can survive from a PREVIOUS jvm
      // (fresh in-memory catalog, same cwd) — DROP IF EXISTS can't see it,
      // and saveAsTable refuses a pre-existing location
      val stale = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + "/graft_q50")
      val fs = stale.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(stale)) fs.delete(stale, true)
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
      TableWriter.saveToTable(c, "graft_q50", LoadMode.OverwriteTable)
      val c2 = c
        .select(col("c_acctbal"), col("c_custkey"), col("c_name"))
        .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
      TableWriter.saveToTable(c2, "graft_q50", LoadMode.OverwriteTable)
      s.table("graft_q50")
    }),

    // W7: TableLocationWriter — install a partition through the
    // catalog-resolved location (atomic swap + recover + refresh), the
    // structured-load path
    "q51_table_location_writer" -> ((s, dir) => {
      val loc = tmpDir("graft_q51") + "/t"
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_linestatus"))
      li.filter(col("l_linestatus") === "F")
        .write.partitionBy("l_linestatus").parquet(loc)
      s.sql("DROP TABLE IF EXISTS graft_q51")
      s.sql("CREATE TABLE graft_q51 (l_orderkey BIGINT, l_quantity DOUBLE, " +
        s"l_linestatus STRING) USING parquet PARTITIONED BY (l_linestatus) " +
        s"LOCATION '$loc'")
      CatalogOps.recoverPartitionsNative(s, "graft_q51")
      val oRows = li.filter(col("l_linestatus") === "O")
        .withColumn("l_quantity", col("l_quantity") + 1)
      TableWriter.writeToTableLocation(oRows, fsOps(s), "graft_q51",
        LoadMode.OverwritePartitions, Seq("l_linestatus"))
      s.table("graft_q51").groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // X4: compaction — rewrite each partition to a controlled file count;
    // the gate proves content survives the rewrite byte-for-byte (the
    // file-count assertion lives in the compaction spec)
    "q52_compaction" -> ((s, dir) => {
      val loc = tmpDir("graft_q52") + "/t"
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"), col("event_type"))
      e.repartition(6).write.partitionBy("event_type").parquet(loc)
      val parts = e.select(col("event_type")).distinct().collect()
        .map(r => s"event_type=${r.getString(0)}").toSeq
      CatalogOps.compactPartitions(s, fsOps(s), loc, parts,
        filesPerPartition = 1)
      s.read.option("basePath", loc).parquet(loc)
        .groupBy(col("event_type").cast("string").as("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
    }),

    // S3: JSON write → schema-enforced FAILFAST read round-trip
    "q57_json_load" -> ((s, dir) => {
      val loc = tmpDir("graft_q57") + "/t"
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars"))
        .write.json(loc)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType)))
      DataFormat.Json.read(s, Map("mode" -> "FAILFAST"), Some(schema), loc)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    }),

    // A4: init-load condensation — technical-key DESC then recordmode ASC
    // tiebreak (the init path prefers deletions over upserts on equal
    // versions); rows are projected to the ordering keys so ties carry
    // identical content and the gate is deterministic
    "q58_init_condense" -> ((s, dir) => {
      val d = t(s, dir, "events").select(
        col("user_id"), col("event_type"),
        (col("event_id") % 100).as("ver"),
        when(col("event_id") % 3 === 0, "X")
          .when(col("event_id") % 3 === 1, "N")
          .otherwise("D").as("recordmode"))
      DeltaMerge.condense(d, Seq("user_id", "event_type"), Seq("ver"),
        Some("recordmode"), initOrder = true)
    }),

    // curation: int8 embedding quantization (native kernel; codes
    // serialized to a string for the cross-engine compare)
    "q59_quantize" -> ((s, dir) => {
      Quantize.withQuantized(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_str"))
    }),

    // P7: lowercase column normalization — mixed-case source columns land
    // lowercased, values untouched
    "q60_lowercase_cols" -> ((s, dir) => {
      val mixed = t(s, dir, "region")
        .select(col("r_regionkey").as("R_RegionKey"),
          col("r_name").as("R_NAME"))
      SchemaOps.lowercaseColumns(mixed)
    }),

    // schema exceed: MapType flattening — the reference silently ignores
    // maps (NestedFlattener.scala:73-93); flattenMap DISCOVERS the key
    // space (bounded distinct over the pruned map keys) and expands
    // name__key columns with typed nulls for the keys a row lacks
    "q70_map_flatten" -> ((s, dir) => {
      val m = t(s, dir, "events")
        .select(col("event_id"),
          map(col("event_type"), col("value")).as("props"))
      SchemaOps.flattenMap(m, "props")
    }),

    // functions: schema'd JSON extraction from a string column —
    // from_json with an explicit schema (codegen'd Jackson parse), the
    // metadata-sidecar step every ingest pipeline has; malformed rows
    // yield nulls, counted by count(k) vs count(*)
    "q91_json_extract" -> ((s, dir) => {
      val parsed = t(s, dir, "events")
        .withColumn("p", from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))))
      parsed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), count(col("p.k")).as("n_k"),
          sum(col("p.k")).as("sum_k"), max(col("p.k")).as("max_k"))
    }),

    // functions: the SQL surface — native graft expressions registered
    // as session SQL functions (GraftFunctions.register), driven purely
    // through spark.sql; nfc_normalize digests and shingle counts match
    // DuckDB's own functions
    "q89_sql_functions" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("graft_docs_q89")
      s.sql(
        """SELECT doc_id, md5(nfc_normalize(text)) AS norm_digest,
          |  size(shingle_hashes(split(trim(lower(text)), '\\s+'), 3))
          |    AS n_shingles
          |FROM graft_docs_q89""".stripMargin)
    }),

    // layout: range-sorted export — files carry disjoint n_chars ranges
    // (repartitionByRange + sortWithinPartitions), so the read-back range
    // filter skips whole files on parquet footer stats
    "q88_sorted_export" -> ((s, dir) => {
      val loc = tmpDir("graft_q88") + "/t"
      Layout.writeSortedSafe(t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        fsOps(s), loc, "n_chars", 8)
      s.read.parquet(loc)
        .filter(col("n_chars").between(100, 300))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    }),

    // P5/P6: schema enforcement with narrowing casts + added null column
    "q37_schema_enforce" -> ((s, dir) => {
      val target = StructType(Seq(
        StructField("c_custkey", IntegerType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType),
        StructField("loyalty_tier", StringType)))
      SchemaOps.enforce(t(s, dir, "customer"), target, addMissing = true)
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q10_latest_events" ->
      """SELECT user_id, event_type, event_id, round(value,2) AS value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY event_id DESC) = 1""".stripMargin,

    "q11_delta_merge" ->
      """WITH active AS (
        |  SELECT event_id, user_id, round(value,2) AS value
        |  FROM events WHERE event_id % 5 <> 0),
        |delta AS (
        |  SELECT event_id, user_id, round(value+10,2) AS value,
        |    CASE WHEN event_id % 20 = 0 THEN 'D' ELSE 'N' END AS recordmode
        |  FROM events WHERE event_id % 4 = 0)
        |SELECT a.event_id, a.user_id, a.value FROM active a
        |WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.event_id=a.event_id)
        |UNION ALL
        |SELECT event_id, user_id, value FROM delta WHERE recordmode <> 'D'""".stripMargin,

    "q30_full_load" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice,
        | CAST(year(o_orderdate) AS SMALLINT) AS year,
        | CAST(month(o_orderdate) AS SMALLINT) AS month
        |FROM orders""".stripMargin,

    "q31_append_load" ->
      """WITH m AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)
        |SELECT event_id, user_id, round(value,2) AS value,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS date_part
        |FROM events, m
        |WHERE CAST(ts AS DATE) <= d0 + INTERVAL 1 DAY""".stripMargin,

    "q32_delta_load" ->
      """WITH active AS (
        |  SELECT event_id, user_id, round(value,2) AS value, event_type
        |  FROM events WHERE event_id % 5 <> 0),
        |delta AS (
        |  SELECT event_id, user_id, round(value+10,2) AS value,
        |    CASE WHEN event_id % 20 = 0 THEN 'D' ELSE 'N' END AS recordmode,
        |    event_type
        |  FROM events WHERE event_id % 4 = 0)
        |SELECT a.event_id, a.user_id, a.value, a.event_type FROM active a
        |WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.event_id=a.event_id)
        |UNION ALL
        |SELECT event_id, user_id, value, event_type FROM delta
        |WHERE recordmode <> 'D'""".stripMargin,

    "q33_materialization" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem WHERE l_linestatus='F' GROUP BY l_returnflag""".stripMargin,

    "q34_sqlrunner" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",

    "q35_transpose_first" ->
      """WITH latest AS (
        |  SELECT user_id, event_type, round(value,2) AS value FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                             ORDER BY event_id DESC) = 1)
        |SELECT user_id,
        | max(CASE WHEN event_type='click' THEN value END) AS click,
        | max(CASE WHEN event_type='view' THEN value END) AS view,
        | max(CASE WHEN event_type='purchase' THEN value END) AS purchase,
        | max(CASE WHEN event_type='signup' THEN value END) AS signup,
        | max(CASE WHEN event_type='error' THEN value END) AS error
        |FROM latest GROUP BY user_id""".stripMargin,

    "q36_gzip_load" ->
      "SELECT r_regionkey, r_name FROM region",

    "q38_catalog_table" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    // mirrors TableWriter.saveToTable overwrite: final content is the
    // second (re-ordered, +100) frame, landed in the right columns
    "q50_table_writer" ->
      """SELECT c_custkey, c_name,
        | round(round(c_acctbal,2)+100,2) AS c_acctbal
        |FROM customer""".stripMargin,

    // mirrors writeToTableLocation: F partition keeps source quantities,
    // O partition was installed with +1
    "q51_table_location_writer" ->
      """SELECT l_linestatus, count(*) AS n,
        | round(sum(CASE WHEN l_linestatus='O' THEN l_quantity+1
        |           ELSE l_quantity END),2) AS qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    // mirrors compaction: a pure physical rewrite — content identical to
    // the source aggregation
    "q52_compaction" ->
      """SELECT event_type, count(*) AS n,
        | round(sum(round(value,2)),2) AS sum_v
        |FROM events GROUP BY event_type""".stripMargin,

    // mirrors the JSON round-trip: content identical to the source
    "q57_json_load" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang""".stripMargin,

    // mirrors DeltaMerge.condense(initOrder=true): ver DESC, recordmode
    // ASC; tied winners carry identical projected content
    "q58_init_condense" ->
      """WITH d AS (
        |  SELECT user_id, event_type, event_id % 100 AS ver,
        |    CASE WHEN event_id % 3 = 0 THEN 'X'
        |         WHEN event_id % 3 = 1 THEN 'N' ELSE 'D' END AS recordmode
        |  FROM events)
        |SELECT user_id, event_type, ver, recordmode FROM d
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ver DESC, recordmode) = 1""".stripMargin,

    // mirrors Quantize.withQuantized: scale = max|x|/127 in double,
    // codes floor(x/scale + 0.5) — floor, not round/CAST, so the tie
    // handling is engine-independent
    "q59_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, scale,
        |  CASE WHEN scale = 0 THEN
        |    array_to_string(list_transform(embedding, x -> 0), ',')
        |  ELSE array_to_string(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER)),
        |    ',') END AS q_str
        |FROM m""".stripMargin,

    // mirrors SchemaOps.lowercaseColumns — names normalized, values as-is
    "q60_lowercase_cols" ->
      "SELECT r_regionkey AS r_regionkey, r_name AS r_name FROM region",

    // mirrors SchemaOps.flattenMap over a map keyed by event_type: one
    // discovered column per key (sorted), null where the row lacks it
    "q70_map_flatten" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click' THEN value END AS props__click,
        |  CASE WHEN event_type = 'error' THEN value END AS props__error,
        |  CASE WHEN event_type = 'purchase' THEN value END AS props__purchase,
        |  CASE WHEN event_type = 'signup' THEN value END AS props__signup,
        |  CASE WHEN event_type = 'view' THEN value END AS props__view
        |FROM events""".stripMargin,

    // mirrors q91 from_json: DuckDB's json_extract_string on the same
    // path; absent/malformed keys are NULL in both engines
    "q91_json_extract" ->
      """WITH p AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n_rows, count(k) AS n_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
        |FROM p GROUP BY event_type""".stripMargin,

    // mirrors the q89 SQL-function surface: DuckDB's nfc_normalize is the
    // same Unicode NFC; the shingle-hash count equals the distinct
    // shingle-string count (the repo-wide 2^-64 collision convention)
    "q89_sql_functions" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents)
        |SELECT doc_id, md5(nfc_normalize(text)) AS norm_digest,
        |  CAST(len(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' ')))) AS INTEGER)
        |    AS n_shingles
        |FROM tk""".stripMargin,

    // mirrors the q88 sorted export read-back: layout changes the files,
    // never the rows
    "q88_sorted_export" ->
      """SELECT lang, count(*) AS n FROM documents
        |WHERE n_chars BETWEEN 100 AND 300 GROUP BY lang""".stripMargin,

    "q37_schema_enforce" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name, c_acctbal,
        | CAST(NULL AS VARCHAR) AS loyalty_tier
        |FROM customer""".stripMargin
  )
}
