package graft

import graft.algos._
import graft.core.Tables
import graft.expr.{DateComponents, PartitionCriteria, SchemaOps}
import graft.catalog.{CatalogOps, TableWriter}
import graft.fsops.FsOps
import graft.io.{DataFormat, LoadMode}
import graft.operators._
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] exercises an operator from SURVEY.md §2 (or an
  * LLM-pipeline extension) through the graft library; [[oracleSql]] holds the
  * DuckDB-equivalent SQL the driver compares against at sf0.01.
  * Cross-engine determinism rules used throughout:
  *  - double aggregates are round()ed in BOTH engines;
  *  - integer sums are CAST(.. AS BIGINT) in DuckDB (it sums ints to
  *    HUGEINT, Spark to long);
  *  - rankings always carry an id tie-break;
  *  - timestamps leave result sets as epoch millis/seconds (BIGINT).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fsOps(s: SparkSession): FsOps =
    new FsOps(s.sparkContext.hadoopConfiguration)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A5-style hash aggregate (TPC-H q1 shape): partial agg map-side,
    // 6-wide shuffle rows only.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // P1: OR-of-ANDs partition criteria compiled to a Column (pruning-friendly)
    "q02_partition_filter" -> ((s, dir) => {
      val crit: PartitionCriteria.Criteria = Seq(
        Seq("l_returnflag" -> "R", "l_linestatus" -> "F"),
        Seq("l_returnflag" -> "A", "l_linestatus" -> "F"))
      t(s, dir, "lineitem").filter(PartitionCriteria.toColumn(crit))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    // J1 + A: 3-way join + deterministic top-N. No forced broadcast on
    // customer: it scales with sf, so the hint would override Spark's size
    // check and OOM the build side at cluster scale; size-based planning /
    // AQE still broadcasts it while it is genuinely small (PlanAuditSpec).
    "q03_top_revenue_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      rev.orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }),

    // left-semi join (EXISTS)
    "q04_priority_exists" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // 5-way join: fixed-cardinality dims (nation/region) keep their
    // broadcast hint; customer grows with sf so it is left to size-based
    // planning (same rationale as q03/q43-q46).
    "q05_region_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // pushdown-friendly scan-heavy filter + single agg
    "q06_revenue_forecast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    // anti join (NOT EXISTS)
    "q07_customers_no_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J2: full-outer merge of two aggregates
    "q08_full_outer_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderkey") % 2 === 0).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt_a"),
          round(sum(col("o_totalprice")), 2).as("sum_a"))
      val b = o.filter(col("o_orderkey") % 3 === 0).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt_b"),
          round(sum(col("o_totalprice")), 2).as("sum_b"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
          coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
          col("sum_a"), col("sum_b"))
    }),

    // U1/P5: schema-aligned union (addMissingColumns + unionByName)
    "q09_union_align" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        round(col("c_acctbal"), 2).as("bal"), lit("c").as("src"))
      val p = t(s, dir, "part").select(
        col("p_partkey").as("id"), col("p_name").as("name"),
        lit("p").as("src"))
      SchemaOps.addMissingColumns(p, c.schema).unionByName(c)
    }),

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

    // A2: pivot with explicit values (no extra distinct-scan job)
    "q12_event_pivot" -> ((s, dir) => {
      Transpose(t(s, dir, "events"), Seq("user_id"), "event_type",
        Seq("click", "view", "purchase", "signup", "error"), "value",
        c => round(sum(c), 2))
    }),

    // F3: date component derivation with 9999/99 sentinels + aligned week
    "q13_date_components" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("datestr",
        when(col("o_orderkey") % 97 === 0, lit("1x"))
          .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")))
      DateComponents.withComponents(o, "datestr", "yyyyMMdd",
          Seq("year", "month", "day", "week"))
        .select(col("o_orderkey"), col("year"), col("month"), col("day"),
          col("week"))
    }),

    // F4: fixed-width field extraction, pure Column expressions
    "q14_fixed_width" -> ((s, dir) => {
      import FixedSizeStringExtractor.FieldSpec
      val packed = t(s, dir, "part").withColumn("packed",
        concat(rpad(col("p_brand"), 12, " "),
          lpad(col("p_size").cast("string"), 4, " "),
          rpad(col("p_type"), 26, " ")))
      FixedSizeStringExtractor(packed, "packed",
        Seq(FieldSpec("brand_x", 1, 12, StringType),
          FieldSpec("size_x", 13, 16, IntegerType),
          FieldSpec("type_x", 17, 42, StringType)),
        keepCols = Seq("p_partkey"))
    }),

    // F5-F8: nested flattening (struct expansion + array explode)
    "q15_nested_flatten" -> ((s, dir) => {
      val nested = t(s, dir, "orders").select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority")).as("meta"),
        // +10.5 / *2 are exact double ops — no round() half-way hazards
        array(col("o_totalprice") + 10.5,
          col("o_totalprice") * 2).as("amounts"))
      NestedFlattener(nested)
    }),

    // beyond-reference agg: rollup with grouping id
    "q16_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // gap sessionization (lag + cumulative sum windows)
    "q17_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Sessionize(e, "user_id", unix_millis(col("ts")), "event_id",
          gapMillis = 1800000L)
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // behavioral: session-shape summary — sessions per user, bounce
    // share, events per session in one row ("how many and how shallow"
    // before q144's "how long")
    "q171_session_summary" -> ((s, dir) => {
      Sessionize.sessionSummary(t(s, dir, "events"), "user_id",
        unix_millis(col("ts")), "event_id", gapMillis = 1800000L)
    }),

    // abuse QA: per-type distinct-user intensity — events per distinct
    // user ("is purchase volume broad or three users deep")
    "q172_distinct_intensity" -> ((s, dir) => {
      Stats.distinctIntensity(t(s, dir, "events"), "event_type",
        "user_id")
    }),

    // profiling: robust per-lang length scale — median + MAD via two
    // histogram-quantile passes (a 100k-char outlier can't inflate it)
    "q173_mad_per_group" -> ((s, dir) => {
      Sampling.madPerGroup(t(s, dir, "documents"), "lang", "n_chars")
    }),

    // profiling: length-decile calibration — mean token count per
    // n_chars decile ("does char length actually track token count")
    "q174_score_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.scoreBucketsReport(docs, "n_chars", "n_tokens",
        nBuckets = 10)
    }),

    // tumbling-window agg (same transform powers the streaming path)
    "q18_windowed_counts" -> ((s, dir) => {
      EventStream.windowedCounts(t(s, dir, "events"), "5 minutes")
    }),

    // dedup: exact duplicate groups by content digest
    "q19_exact_dedup" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
    }),

    // data QA: metadata conflicts on identical text — every 50th doc is
    // re-landed under lang 'xx' (deterministic fixture, mirrored in the
    // oracle; the synthetic corpus itself has no exact dups), and the
    // audit reports each conflicted digest's per-label doc split
    "q154_metadata_clash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val relanded = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
          lit("xx").as("lang"), col("source"), col("n_chars"))
      Dedup.conflictingMetadata(docs.unionByName(relanded), "text", "lang")
    }),

    // dedup: exact n-gram Jaccard pairs via shingle inverted index
    "q20_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 10 < 3)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.55)
    }),

    // dedup: MinHash-LSH candidates + exact verify (portable md5 family)
    "q21_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      Dedup.jaccardVerify(cand, docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // dedup: SimHash banded candidates (portable md5 family)
    "q22_simhash" -> ((s, dir) => {
      Dedup.simhashCandidates(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 7)
    }),

    // similarity: brute-force cosine top-k (exact baseline)
    "q23_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // similarity: sign-LSH bucketed ANN (scale path; native signature expr)
    "q24_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.annTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // text: language id + quality features
    "q25_lang_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(
          t(s, dir, "documents").withColumn("lang_pred",
            TextAnalysis.langId(col("text"))), "text")
        .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
          col("avg_token_len"), col("punct_ratio"), col("stopword_ratio"),
          col("quality_score"))
    }),

    // text: order-insensitive content fingerprint
    "q26_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // text: token counting (whitespace + BPE-ish regex)
    "q27_token_counts" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"))
    }),

    // multimodal: binary payload + metadata plumbing (decode stubbed)
    "q28_multimodal_meta" -> ((s, dir) => {
      Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text",
          "text/plain")
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("content_sha256"))
    }),

    // multimodal: frame sampling stub (md5-derived offsets, oracle-matched)
    "q29_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.fakeDecode(
          Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text",
            "text/plain")),
        "doc_id", nFrames = 3)
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

    // dedup: embedding near-dup pairs — sign-LSH candidates + exact cosine
    // verify (native exprs; no all-pairs product in the plan)
    "q39_embedding_dedup" -> ((s, dir) => {
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.4, bits = 8, tables = 4)
    }),

    // as-of join: latest click at or before each purchase, per user
    "q40_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      AsOfJoin(purchases, clicks, col("user_id"), col("c_user"),
          col("p_ts"), col("c_ts"), col("p_id"), col("click_id"))
        .select(col("p_id"), col("user_id"), col("click_id"),
          unix_millis(col("c_ts")).as("click_ts_ms"))
    }),

    // stateful sessionization (flatMapGroupsWithState) on the batch frame —
    // the same code path Structured Streaming runs with per-key state
    "q41_stateful_sessions" -> ((s, dir) => {
      import graft.streaming.StatefulSessionize
      import s.implicits._
      implicit val sp: SparkSession = s
      val events = t(s, dir, "events")
        .select(col("user_id").as("userId"), col("event_id").as("eventId"),
          unix_millis(col("ts")).as("tsMillis"))
        .as[StatefulSessionize.Event]
      StatefulSessionize(events, gapMillis = 1800000L)
        .groupBy(col("userId").as("user_id"))
        .agg(max(col("sessionId")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_sessions"), col("n_events"))
    }),

    // similarity: IVF ANN (sampled centroids + nprobe cells + exact re-rank)
    "q42_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // TPC-H q9 shape: 5-way join, three broadcast dims, fact shuffled once,
    // two-level aggregate (nation × year).
    // q43-q46 round revenue sums to 4 (not 2): price×(1−discount) values
    // live on a 4-decimal grid, so their true sums sit ON .xx5 ties at
    // 2 decimals — engine sum-order noise (~1e-9) then flips the rounding
    // (observed on q45). At 4 decimals the sum is on-grid, 5e-5 from any
    // tie, and both engines round identically.
    "q43_profit_by_nation" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val o = t(s, dir, "orders")
      // part/supplier unhinted — they scale with sf, so a forced broadcast
      // would OOM at 100x; AQE broadcasts them while they are small.
      // nation stays hinted (25 rows at any sf).
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("profit"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H q10 shape: returned-item revenue per customer, deterministic
    // top 20
    "q44_returned_customers" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      // customer is NOT hinted: it is 15k rows at sf0.1 but 15M at sf100 —
      // a forced broadcast would override Spark's size check and OOM at
      // scale. AQE still broadcasts it when it is actually small (the
      // PlanAuditSpec asserts this at test scale); nation is genuinely
      // bounded (25 rows at any sf) so its hint stays.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    }),

    // TPC-H q7 shape: customer-nation × supplier-nation trade flows —
    // the nation dim joins twice under different roles
    "q45_trade_flows" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      // customer/supplier unhinted (unbounded at scale — AQE decides);
      // the two nation roles keep their hints (25 rows at any sf)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .filter(col("cust_nation") =!= col("supp_nation"))
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("volume"))
    }),

    // TPC-H q8 shape: one nation's share of region revenue per year —
    // conditional aggregation over a 6-way join; the share divides the two
    // ROUNDED sums so both engines divide identical operands
    "q46_market_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      // customer/supplier unhinted (unbounded at scale — AQE decides);
      // nation/region keep their hints (bounded dims at any sf)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_7", rev)
            .otherwise(lit(0.0))), 4).as("nation_rev"),
          round(sum(rev), 4).as("total_rev"))
        .select(col("o_year"), col("nation_rev"), col("total_rev"),
          round(col("nation_rev") / col("total_rev"), 6).as("share"))
    }),

    // corpus curation: end-to-end dedup pipeline (exact → LSH candidates →
    // Jaccard verify → greedy higher-id drop)
    "q48_dedup_corpus" -> ((s, dir) => {
      Dedup.dedupCorpus(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5)
        .select(col("doc_id"), col("lang"))
    }),

    // corpus curation: concat-and-chunk sequence packing (distributed
    // prefix sum — no single-task global window)
    "q49_sequence_packing" -> ((s, dir) => {
      Packing.packDocuments(t(s, dir, "documents"), "doc_id", "text",
          budgetTokens = 4096)
        .frame
        .select(col("doc_id"), col("n_tokens"), col("chunk_id"),
          col("offset_in_chunk"))
    }),

    // corpus curation: deterministic stratified down-sampling (md5-derived
    // selection — stable under retries, reproducible cross-engine)
    "q47_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.3, "de" -> 0.5))
        .select(col("doc_id"), col("lang"), col("source"))
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

    // curation: benchmark decontamination — corpus docs sharing 5-gram
    // shingles with a (broadcast) eval set; the eval set here is built
    // from token snippets of every 40th doc, so sources and their
    // near-dups must surface
    // curation: per-doc novelty of the odd-id half against the even-id
    // half — 1 - (matched distinct 3-shingles / total), the "is this
    // delivery new material or a re-crawl" triage; the reference side is
    // deliberately NOT broadcast (corpus-sized regime)
    "q157_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.noveltyScores(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"),
          col("n_matched"), col("novelty"))
    }),

    "q53_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 40 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 3, 12)).as("qtext"))
      Decontaminate.overlaps(docs, "doc_id", "text", bench, "qtext",
          n = 5, minOverlap = 2)
        .select(col("id").as("doc_id"), col("n_matched"),
          col("n_shingles"), col("overlap_ratio"))
    }),

    // curation: Gopher-style repetition signals (dup lines, dup 2-grams,
    // top-2-gram mass) — the boilerplate/spam quality filters
    "q54_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_lines"), col("dup_line_fraction"),
          col("n_2grams"), col("dup_2gram_fraction"),
          col("top_2gram_fraction"))
    }),

    // curation: PII redaction — synthetic PII is injected deterministically
    // (same CASE logic both engines) so the gate exercises real matches,
    // not an all-zero pass over clean testdata
    // compliance: per-source PII exposure report — doc and match counts
    // per category over the q55 injection fixture, before any rewrite
    "q165_pii_stats" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        col("source"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" reach me at user"), col("doc_id"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), col("doc_id") % 256, lit(".17")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))).as("text"))
      Redact.piiStats(withPii, "source", "text")
    }),

    // monitoring: day-of-week x hour-of-day seasonality heat map —
    // counts and shares over at most 168 cells
    "q164_seasonality" -> ((s, dir) => {
      Stats.seasonalityProfile(t(s, dir, "events"), "ts")
    }),

    "q55_pii_redaction" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" reach me at user"), col("doc_id"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), col("doc_id") % 256, lit(".17")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))).as("text"))
      Redact.withRedactions(withPii, "text")
        .select(col("doc_id"), col("red_text"), col("n_email"),
          col("n_ipv4"), col("n_phone"))
    }),

    // curation: deterministic training-order shuffle into shards
    "q56_corpus_shuffle" -> ((s, dir) => {
      Shuffling.shuffleIntoShards(t(s, dir, "documents"), "doc_id",
          numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos_in_shard"))
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

    // curation: near-dup CLUSTER labels — connected components over the
    // verified minhash pair graph (iterative min-label propagation)
    "q61_dedup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(docs, "doc_id", "text"),
          docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs)
    }),

    // curation: unigram log-prob quality score against the corpus's own
    // distribution (vocab capped at 20 of the corpus's 31 tokens so the
    // truncation + OOV-floor paths are exercised, not just the happy path)
    "q62_unigram_quality" -> ((s, dir) => {
      TextAnalysis.unigramLogProbScore(t(s, dir, "documents"), "doc_id",
        "text", vocabSize = 20)
    }),

    // streaming: the batch face of EventStream.intervalJoin — the SAME
    // expression runs under dual watermarks as a stream-stream join
    // (streaming spec asserts stream==batch row-for-row); this gate
    // oracles the join's interval semantics against DuckDB
    "q63_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"))
      EventStream.intervalJoin(purchases, clicks, "p_user", "c_user",
          "p_ts", "c_ts", lookback = "2 hours", horizon = "30 minutes")
        .select(col("p_event_id"), col("c_event_id"),
          col("p_user").as("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    }),

    // curation: cluster-level corpus dedup — exactly one survivor per
    // connected near-dup component (vs q48's greedy pairwise drop)
    "q64_dedup_clusters" -> ((s, dir) => {
      Dedup.dedupCorpusByComponents(t(s, dir, "documents"), "doc_id",
          "text", threshold = 0.5)
        .frame.select(col("doc_id"), col("lang"))
    }),

    // curation: SemDeDup-style embedding cluster dedup — the cluster keep
    // policy composed with the sign-LSH cosine pair graph (one survivor
    // per semantic near-dup component, labels from the same
    // connectedComponents loop as q61/q64)
    "q65_embedding_clusters" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, bits = 8, tables = 4)
        .select(col("id_a"), col("id_b"))
      Dedup.keepPerComponent(emb, "vec_id", pairs)
        .frame.select(col("vec_id"))
    }),

    // curation: deterministic train/val/test split — md5-bucket label,
    // stable across runs/retries/engines (no row ever migrates splits)
    "q66_hash_split" -> ((s, dir) => {
      Sampling.hashSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("lang"), col("split"))
    }),

    // curation: deterministic per-source cap (domain balancing — at most
    // N docs per source, survivors chosen by hash rank)
    "q67_source_cap" -> ((s, dir) => {
      Sampling.capPerGroup(t(s, dir, "documents"), "doc_id", "source",
          maxPerGroup = 10)
        .select(col("doc_id"), col("source"))
    }),

    // skew tooling: salted equi-join — results identical to the unsalted
    // join (the oracle IS the plain join), hot keys spread over
    // saltFactor partitions
    "q68_salted_join" -> ((s, dir) => {
      val probe = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      val build = t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedJoin(probe, build, "custkey",
        saltFactor = 8)
    }),

    // streaming: EventStream.dedupStream run as a REAL streaming query
    // (AvailableNow over the events parquet, memory sink) — not a batch
    // stand-in: dropDuplicatesWithinWatermark has no batch face (Spark
    // rejects it on batch frames). The horizon exceeds the table's whole
    // time range, so no state is ever evicted and the settled output is
    // exactly one row per key REGARDLESS of how the source splits into
    // micro-batches; projected to the key columns the result is
    // deterministic (which duplicate survives a batch is arrival-order)
    "q69_stream_dedup" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      // the test table is a single parquet FILE: a non-glob file path makes
      // FileStreamSource inject basePath=<the file> and fail ("must be a
      // directory"); a glob skips that injection (production streams read
      // directories and never hit this)
      EventStream.runDedupOnce(s, raw, s"$dir/events*.parquet",
          keyCols = Seq("user_id", "event_type"), watermarkCol = "ts",
          horizon = "3650 days", queryName = "q69_sink",
          prepare = graft.core.Tables.normalizeEventTs)
        .select(col("user_id"), col("event_type"))
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

    // curation: decontamination for eval sets too big to broadcast — the
    // corpus-side prefilter is Spark's bloom pair (narrow might_contain
    // literal, no join), exactness restored by the shingle semi-join on
    // survivors; row-identical to q53's broadcast path by construction,
    // so the oracle is the same shingle-overlap SQL (different params)
    "q71_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 2, 12)).as("qtext"))
      Decontaminate.overlapsBloom(docs, "doc_id", "text", bench, "qtext",
          n = 6, minOverlap = 1)
        .select(col("id").as("doc_id"), col("n_matched"),
          col("n_shingles"), col("overlap_ratio"))
    }),

    // streaming: Dedup.dedupStreamAgainst run as a REAL streaming query —
    // each micro-batch anti-joins the landed artifacts' digests (stream-
    // static join, stateless), the on-arrival exact-dedup of an ingest
    // pipeline; the landed set is every 7th doc's artifacts
    "q73_stream_increment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val arts = Dedup.dedupArtifacts(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      val raw = s.read.parquet(s"$dir/documents.parquet").schema
      EventStream.runStreamAgainstOnce(s, raw, s"$dir/documents*.parquet",
          arts, "text", "q73_sink")
        .select(col("doc_id"), col("lang"))
    }),

    // curation: token-budget mixture sampling — each source keeps the
    // head of its deterministic-sample ordering until 800 tokens land
    // (the crossing row kept); the weighted two-phase cap, so a dominant
    // source's histogram, not its rows, meets the threshold window
    "q74_token_budget_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.capPerGroupWeighted(docs, "doc_id", "source", "n_tokens",
          budgetPerGroup = 800.0)
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),

    // curation: incremental dedup — a delta batch (every 5th doc) against
    // the already-landed corpus: exact digest anti-join, then cross-side
    // banded-minhash near-dups; within-batch dups deliberately survive
    "q72_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val existing = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      Dedup.dedupIncrement(existing, incoming, "doc_id", "text",
          threshold = 0.5)
        .select(col("doc_id"), col("lang"))
    }),

    // streaming: the NEAR-DUP increment run as a real foreachBatch query —
    // the incoming delta (every 5th doc) staged as 4 files, streamed at
    // maxFilesPerTrigger=1 → 4 micro-batches, each running the full
    // dedupIncrement (digest prune + cross-side banded minhash + Jaccard
    // verify) against the landed corpus's persisted artifacts and
    // appending survivors to the sink dir. Cross-side-only pairs make the
    // union of per-batch survivors identical to q72's single shot — the
    // oracle is q72's restricted to the same incoming set
    "q75_stream_neardup_increment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val existing = docs.filter(col("doc_id") % 5 =!= 0)
      val inDir = tmpDir("graft_q75_in")
      docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val arts = Dedup.dedupArtifacts(existing, "doc_id", "text")
      val outDir = tmpDir("graft_q75_out") + "/out"
      EventStream.runNearDupIncrementOnce(s, s.read.parquet(inDir).schema,
          inDir, existing, arts, "doc_id", "text", threshold = 0.5,
          outDir, "q75_sink", maxFilesPerTrigger = Some(1))
        .select(col("doc_id"), col("lang"))
    }),

    // the end-to-end PARAMS-ONLY pipeline gate: five registered algorithms
    // chained purely through JobRunner params files — the reference's
    // acon-driven product shape composed into a full curation pipeline:
    // DedupArtifacts → IncrementalDedup → Decontaminate → TokenBudgetMix
    // → HashSplit. Each stage reads the previous stage's target_dir via
    // the params surface only (no DataFrame passes between stages); the
    // oracle replays the whole chain in SQL
    "q76_params_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q76")
      def p(sub: String) = s"$base/$sub"
      docs.filter(col("doc_id") % 5 =!= 0).write.parquet(p("landed"))
      docs.filter(col("doc_id") % 5 === 0).write.parquet(p("incoming"))
      docs.filter(col("doc_id") % 40 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 3, 12)).as("qtext"))
        .write.parquet(p("bench"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("DedupArtifacts",
        s"""{"source_dir": "${p("landed")}", "target_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text"}""".stripMargin)
      run("IncrementalDedup",
        s"""{"source_dir": "${p("incoming")}",
           | "target_dir": "${p("deduped")}",
           | "existing_dir": "${p("landed")}",
           | "artifacts_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text",
           | "threshold": 0.5}""".stripMargin)
      run("Decontaminate",
        s"""{"source_dir": "${p("deduped")}", "target_dir": "${p("clean")}",
           | "benchmark_dir": "${p("bench")}",
           | "benchmark_text_column": "qtext",
           | "id_column": "doc_id", "text_column": "text",
           | "ngram_size": 5, "min_overlap": 2}""".stripMargin)
      run("TokenBudgetMix",
        s"""{"source_dir": "${p("clean")}", "target_dir": "${p("mixed")}",
           | "id_column": "doc_id", "group_column": "source",
           | "weight_column": "n_chars",
           | "budget_per_group": 1500}""".stripMargin)
      run("HashSplit",
        s"""{"source_dir": "${p("mixed")}", "target_dir": "${p("final")}",
           | "id_column": "doc_id",
           | "splits": [{"name": "train", "weight": 0.8},
           |            {"name": "val", "weight": 0.1},
           |            {"name": "test", "weight": 0.1}]}""".stripMargin)
      s.read.parquet(p("final"))
        .select(col("doc_id"), col("source"), col("split"))
    }),

    // multimodal: exact media dedup — one survivor (min id) per distinct
    // payload byte content, elected on (sha256, id) pairs so the blobs
    // never shuffle. Duplicate blobs are synthesized deterministically
    // (doc_id % 137 keys 137 distinct payloads) like q55's injected PII
    "q77_media_dedup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("MEDIA:"), (col("doc_id") % 137).cast("string"))
            .as("blob")),
        "doc_id", "blob", "application/octet-stream")
      Multimodal.dedupExactMedia(media, "doc_id", "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("payload").cast("string").as("payload_str"))
    }),

    // curation: per-language quantile-band length filter — keep docs whose
    // n_chars percent_rank within their language lies in [0.1, 0.9] (trim
    // both distribution tails). The operator's window runs over the
    // per-(lang, n_chars) histogram, never the raw rows
    "q78_quantile_band" -> ((s, dir) => {
      Sampling.filterByQuantileBand(t(s, dir, "documents"), "lang",
          "n_chars", lo = 0.1, hi = 0.9)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // curation: CROSS-document boilerplate — per doc, the share of its
    // distinct 3-grams occurring in >=5 distinct documents (corpus
    // document frequency; the recurring-chrome signal q54's per-doc
    // repetition stats cannot see)
    "q79_boilerplate" -> ((s, dir) => {
      TextAnalysis.boilerplateSignals(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minDocs = 5)
    }),

    // curation: sliding-window text chunking — 32-token windows every 24
    // tokens (overlapping context windows, the RAG/long-context prep
    // step); narrow end to end, tokenizer staged once per doc
    "q80_chunk_text" -> ((s, dir) => {
      Packing.chunkText(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, stride = 24)
    }),

    // dedup: chunk-granularity novelty — non-overlapping 16-token chunks,
    // counting per doc the chunks already present in a smaller-id doc.
    // Recycled text is synthesized deterministically (every 6th doc's
    // first 40 tokens re-landed under id+100000) like q55's injected PII:
    // full chunks of a copy match its source, the short tail does not
    "q81_chunk_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val copies = docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat_ws(" ", slice(Dedup.tokens(col("text")), 1, 40)).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(copies)
      Dedup.chunkNovelty(corpus, "doc_id", "text", chunkTokens = 16)
    }),

    // dedup: cross-source exact-duplicate matrix — which acquisition
    // pipelines re-crawl each other. Cross-source dups are synthesized
    // deterministically (every 5th doc re-landed under source
    // src(doc_id%3)); pairs count per unordered source pair
    "q82_cross_source_dups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val copies = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
          concat(lit("src"), (col("doc_id") % 3).cast("string"))
            .as("source"))
      val corpus = docs.select(col("doc_id"), col("text"), col("source"))
        .unionByName(copies)
      Dedup.crossSourceDupMatrix(corpus, "doc_id", "text", "source")
    }),

    // curation: canonical text normalization — Unicode NFC (native
    // Catalyst expression; Spark has no built-in), lowercase, whitespace
    // collapse. Denormalized unicode is injected deterministically
    // (combining accents, runs of spaces, a tab) so the gate proves real
    // recomposition: the digests match DuckDB's nfc_normalize output
    // byte-for-byte
    "q84_normalize_text" -> ((s, dir) => {
      // DECOMPOSED sequences (e+U+0301, i+U+0308): NFC must recompose
      // them ahead of the digest — precomposed literals would only ever
      // take the isNormalized fast path
      val messy = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 9 === 0,
            lit("  Cafe\u0301   nai\u0308ve \tE\u0301cole "))
            .otherwise(lit(""))).as("text"))
      val norm = TextAnalysis.normalizeText(col("text"))
      messy.select(col("doc_id"), md5(norm).as("norm_digest"),
        length(norm).as("n_chars_norm"))
    }),

    // curation: top-k frequent terms per language — the rank window runs
    // over the per-group distinct vocabulary (histogram), never the
    // corpus rows
    "q85_top_terms" -> ((s, dir) => {
      TextAnalysis.topTermsPerGroup(t(s, dir, "documents"), "lang",
        "text", k = 10)
    }),

    // dedup: n-gram containment pairs — the partial-copy regime Jaccard
    // misses (a 12-token quote of a 60-token doc has jaccard ~0.2 but
    // containment 1.0). Quotes are synthesized deterministically (first
    // 12 tokens of every 30th subset doc re-landed under id+200000)
    "q86_containment" -> ((s, dir) => {
      val docs0 = t(s, dir, "documents").filter(col("doc_id") % 10 < 3)
      val quotes = docs0.filter(col("doc_id") % 30 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat_ws(" ", slice(Dedup.tokens(col("text")), 1, 12)).as("text"))
      val corpus = docs0.select(col("doc_id"), col("text"))
        .unionByName(quotes)
      Dedup.ngramContainmentPairs(corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.6)
    }),

    // analytics: ordered funnel — view → click → purchase per user,
    // greedy earliest-match (each step strictly after the previous);
    // one min-aggregation per step joined on the user key, no per-user
    // window over raw events
    // analytics: funnel drop-off curve — per step the users reaching at
    // least it, survival vs step 1, and step-over-step conversion
    "q160_conversion_curve" -> ((s, dir) => {
      Funnel.conversionCurve(t(s, dir, "events"), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
    }),

    // analytics: funnel completion latency — p50/p90 whole-second
    // first-view -> purchase time over completing users
    "q177_funnel_latency" -> ((s, dir) => {
      Funnel.stepLatency(t(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), ps = Seq(0.5, 0.9))
    }),

    "q105_funnel" -> ((s, dir) => {
      Funnel.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .select(col("user_id"),
          unix_millis(col("step_ts_1")).as("t_view"),
          unix_millis(col("step_ts_2")).as("t_click"),
          unix_millis(col("step_ts_3")).as("t_purchase"),
          col("n_completed"))
    }),

    // the full TEXT → VECTOR → ANN-dedup pipeline in one gate: feature-
    // hash docs to 64-dim count vectors (native expression), sign-LSH
    // bucket candidates, exact-cosine verify at 0.95, one survivor per
    // connected component — corpus dedup with no model and no
    // all-pairs product anywhere
    "q108_text_vector_dedup" -> ((s, dir) => {
      val vecs = t(s, dir, "documents")
        .select(col("doc_id").as("vec_id"),
          Dedup.tokens(col("text")).as("__tk"))
        .select(col("vec_id"),
          graft.functions.FeatureHashExpr.featureHash(col("__tk"), 64)
            .as("embedding"))
      // bits = 16 / tables = 2, not q65's 8/4: small-vocab BoW vectors
      // are ALL correlated, so coarse buckets collapse much of the corpus
      // into candidate-heavy cells (measured: 8/4 tables->8.1 s, 16/4 ->
      // 1.0M candidates for 833 true pairs, 6.3 s). At the 0.95
      // near-identical bar a vector pair that close collides in a table
      // with prob ~1, so two tables keep recall while halving candidates
      val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
          threshold = 0.95, bits = 16, tables = 2)
        .select(col("id_a"), col("id_b"))
      Dedup.keepPerComponent(vecs, "vec_id", pairs)
        .frame.select(col("vec_id").as("doc_id"))
    }),

    // sketches: KMV distinct-count estimate per event type — the
    // deterministic alternative to approx_count_distinct (HLL registers
    // are partitioning-dependent; KMV over the portable md5-60 family is
    // a pure function of the data, so DuckDB reproduces the exact
    // estimate). k=64: the sketch fills (150 distinct users per type),
    // exercising the estimator path; sketch_rows pins the fill level
    "q109_kmv_distinct" -> ((s, dir) => {
      DistinctSketch.kmvDistinct(t(s, dir, "events"),
        "event_type", "user_id", k = 64)
    }),

    // curation: quality-aware cluster dedup — same pair graph as q64,
    // but each near-dup cluster keeps its LONGEST member (n_chars desc,
    // id tie) instead of the min id: the survivor policy that retains
    // the best copy and drops degraded variants
    "q117_best_survivor" -> ((s, dir) => {
      val docs0 = Dedup.exactDedup(t(s, dir, "documents"), "doc_id",
        "text")
      val cand = Dedup.minhashCandidates(docs0, "doc_id", "text",
        shingleSize = 3, k = 32, bands = 8)
      val near = Dedup.jaccardVerify(cand, docs0, "doc_id", "text",
          shingleSize = 3)
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      val kept = Dedup.keepBestPerComponent(docs0, "doc_id", near,
        "n_chars")
      val out = kept.frame.select(col("doc_id"), col("lang"),
        col("n_chars"))
      out
    }),

    // curation: weighted Bernoulli sampling — keep each doc with
    // probability min(1, n_chars/400): full-length docs always survive,
    // short ones proportionally to size. Pure narrow filter, no shuffle.
    "q118_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
          "n_chars", threshold = 400.0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // behavioral analytics: market-basket association rules over
    // user-level event-type baskets — support/confidence/lift per
    // directed rule; pair product keyed on the user, never cross-user
    "q131_association_rules" -> ((s, dir) => {
      Funnel.associationRules(t(s, dir, "events"), "user_id",
        "event_type", minPairUsers = 2)
    }),

    // profiling: pairwise Pearson correlation of the doc-feature trio
    // (chars, tokens, punct) — one scan, map-combinable moment sums,
    // pair fan-out on the single agg row
    "q132_feature_corr" -> ((s, dir) => {
      val f = t(s, dir, "documents").select(
        col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^.,;:!?]", ""))
          .cast("long").as("n_punct"))
      Stats.corrPairs(f, Seq("n_chars", "n_tokens", "n_punct"))
    }),

    // profiling: lang x source independence — χ² + Cramér's V, the float
    // sum made run-deterministic by a sorted left-fold over the cells
    "q133_contingency" -> ((s, dir) => {
      Stats.contingencyAssociation(t(s, dir, "documents"), "lang", "source")
    }),

    // profiling: lang x source information profile — entropies, mutual
    // information, and normalized MI (the "how redundant are these two
    // labels" score) via the q133 sorted-fold float discipline
    "q149_mutual_info" -> ((s, dir) => {
      Stats.mutualInformation(t(s, dir, "documents"), "lang", "source")
    }),

    // profiling: Cohen's kappa between the declared lang column and the
    // q25 language-id prediction — chance-corrected label agreement
    "q158_label_agreement" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      Stats.cohenKappa(docs, "lang", "lang_pred")
    }),

    // profiling: the confusion matrix behind q158's kappa — per
    // (declared, predicted) cell the count and recall/precision shares
    "q161_confusion_matrix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      Stats.confusionMatrix(docs, "lang", "lang_pred")
    }),

    // curation: corpus-mixture report — per lang the doc/token counts,
    // shares, and cumulative token share in token-mass order
    "q162_mixture_report" -> ((s, dir) => {
      TextAnalysis.mixtureReport(t(s, dir, "documents"), "lang", "text")
    }),

    // profiling: per-lang doc-length histogram at 100-char bins — the
    // distribution SHAPE next to the quantile machinery
    "q163_length_histogram" -> ((s, dir) => {
      Stats.groupedHistogram(t(s, dir, "documents"), "lang", "n_chars",
        binWidth = 100)
    }),

    // profiling: top-3 sources per lang by doc count — the mode report
    // with deterministic (count desc, value) ranking
    "q166_top_values" -> ((s, dir) => {
      Stats.topValuesPerGroup(t(s, dir, "documents"), "lang", "source",
        k = 3)
    }),

    // profiling: does length track token count per lang — q132's exact
    // moment tree sliced by group
    "q167_corr_per_group" -> ((s, dir) => {
      val f = t(s, dir, "documents").select(col("lang"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Stats.corrPerGroup(f, "lang", "n_chars", "n_tokens")
    }),

    // monitoring: KS distance between the even- and odd-id halves'
    // length distributions — the bin-free single-number drift score
    "q168_ks_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Stats.ksDistance(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars")
    }),

    // abuse QA: event-mass concentration across users — a Gini near 1
    // says a handful of bots own the stream (q148's operator pointed at
    // the behavioral table)
    "q169_user_gini" -> ((s, dir) => {
      Stats.giniConcentration(t(s, dir, "events"), "user_id")
    }),

    // abuse QA: the Lorenz curve behind q169's Gini — cumulative user
    // and event shares per distinct activity level
    "q175_lorenz_curve" -> ((s, dir) => {
      Stats.lorenzCurve(t(s, dir, "events"), "user_id")
    }),

    // behavioral: inter-event gap histogram per event type — whole-second
    // gaps in 60s bins (the think-time SHAPE next to q126's quantiles)
    "q170_gap_histogram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = t(s, dir, "events")
        .withColumn("__pts", lag(col("ts"), 1).over(w))
        .filter(col("__pts").isNotNull)
        .select(col("event_type"),
          floor((unix_micros(col("ts")) - unix_micros(col("__pts")))
            / 1000000).cast("long").as("gap_s"))
      Stats.groupedHistogram(gaps, "event_type", "gap_s", binWidth = 60)
    }),

    // text QA: Zipf-slope fit over the top-20 term frequencies — OLS of
    // ln(freq) on ln(rank); natural text sits near -1, template spam
    // flattens it (topK=20 < vocab so the truncation path is exercised)
    "q150_zipf_slope" -> ((s, dir) => {
      TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", topK = 20)
    }),

    // monitoring: daily-volume anomaly flags — each day's event count
    // z-scored against all days, |z| >= 2 flagged
    "q138_daily_anomaly" -> ((s, dir) => {
      Stats.volumeAnomalies(t(s, dir, "events"), "ts", zThreshold = 2.0)
    }),

    // profiling: does source determine lang — per source the distinct
    // lang count, dominant lang (ties to smallest), and its share
    "q139_func_dependency" -> ((s, dir) => {
      Stats.functionalDependency(t(s, dir, "documents"), "source", "lang")
    }),

    // profiling: source concentration — Gini of docs across sources
    // (0 = even corpus, ->1 = one crawl wearing many labels)
    "q148_source_gini" -> ((s, dir) => {
      Stats.giniConcentration(t(s, dir, "documents"), "source")
    }),

    // curation QA: split-balance audit — per (split, lang) share vs the
    // corpus share after the 0.8/0.1/0.1 hash split
    "q147_split_balance" -> ((s, dir) => {
      val split = Sampling.hashSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Sampling.splitBalance(split, "split", "lang")
    }),

    // curation: token-weighted length quantiles per language — the doc
    // length below which half the TOKEN MASS lives (a budget planner's
    // median, not the doc-count median)
    "q146_weighted_quantiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.weightedQuantilesPerGroup(docs, "lang", "n_chars",
        "n_tokens", ps = Seq(0.5, 0.9))
    }),

    // text QA: per-language charset profile — corpus-weighted ascii /
    // digit / space fractions (is the zh feed actually CJK)
    "q145_charset_profile" -> ((s, dir) => {
      TextAnalysis.charsetProfile(t(s, dir, "documents"), "lang", "text")
    }),

    // behavioral: session-duration quantiles — 30-min-gap sessions
    // reduced to whole-second durations, exact type-1 p50/p90/p99
    "q144_session_stats" -> ((s, dir) => {
      Sessionize.sessionStats(t(s, dir, "events"), "user_id",
        unix_micros(col("ts")), "event_id", gapMicros = 1800000000L,
        ps = Seq(0.5, 0.9, 0.99))
    }),

    // monitoring: vocabulary drift — appeared/vanished terms between
    // the even-id and odd-id halves, with deterministic injected
    // fixture terms on each side (the real corpus shares one vocab)
    "q143_vocab_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" zzzlegacy"))).otherwise(col("text")))
      val nw = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" zzznovel"))).otherwise(col("text")))
      TextAnalysis.vocabDiff(old, nw, "text", minCount = 2)
    }),

    // text: per-source vocabulary concentration — TTR + Simpson repeat
    // probability; high simpson/low ttr = template-heavy source
    "q142_vocab_concentration" -> ((s, dir) => {
      TextAnalysis.vocabConcentration(t(s, dir, "documents"),
        "source", "text")
    }),

    // monitoring: per-type daily anomaly — each event type's days
    // z-scored against that type's own history ("which feed broke")
    "q141_anomaly_per_type" -> ((s, dir) => {
      Stats.volumeAnomaliesPerGroup(t(s, dir, "events"), "ts",
        "event_type", zThreshold = 2.0)
    }),

    // monitoring: per-type burstiness — Fano factor + CV of each event
    // type's daily counts ("is this feed steady or bursty at all",
    // next to q141's per-day flags)
    "q152_burstiness" -> ((s, dir) => {
      Stats.burstiness(t(s, dir, "events"), "ts", "event_type")
    }),

    // monitoring: rolling daily volume — trailing 7-observed-day moving
    // average + day-over-day percent change (the trend line next to
    // q138's spike flags)
    "q155_rolling_volume" -> ((s, dir) => {
      Stats.rollingDailyVolume(t(s, dir, "events"), "ts", window = 7)
    }),

    // data QA: column-profile report — null rates + exact distinct
    // counts per column, the first table of any data review
    "q176_column_profile" -> ((s, dir) => {
      graft.operators.Checks.columnProfile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
    }),

    // data QA: doc/embedding key reconciliation — the embeddings side is
    // deterministically mangled (every 10th id dropped, every 25th
    // re-landed shifted) so both orphan directions are exercised
    "q156_key_reconcile" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val mangled = emb.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id"))
        .unionByName(emb.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 900000L).as("vec_id")))
      graft.operators.Checks.keyReconciliation(
        t(s, dir, "documents"), mangled, "doc_id", "vec_id")
    }),

    // text: language-id confidence margin — best stopword score minus
    // runner-up; 0 flags the ambiguous docs a reviewer should see
    "q140_langid_margin" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.langIdMargin(col("text")).as("margin"))
    }),

    // embeddings: label-centroid cosine matrix — which classes sit
    // close in embedding space; exact integer quantized sums, the 1/n
    // factors cancel so sum-vector cosine IS centroid cosine
    "q137_label_centroids" -> ((s, dir) => {
      Similarity.labelCentroidSimilarity(t(s, dir, "embeddings"),
        "embedding", "label")
    }),

    // embedding QA: per-label null/zero-vector counts, dimensionality
    // range, and L2-norm range — the sanity report before any
    // similarity pass trusts the column
    "q153_norm_stats" -> ((s, dir) => {
      Similarity.embeddingNormStats(t(s, dir, "embeddings"),
        "embedding", "label")
    }),

    // monitoring: numeric drift — n_chars distribution of the even-id
    // half vs the odd-id half over fixed [0,500)x10 bins + overflow
    "q136_numeric_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Reconcile.numericDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars",
        lo = 0L, hi = 500L, nBins = 10)
    }),

    // curation: cross-source score calibration — each doc's n_chars
    // replaced by the global value at its within-source percent rank
    "q135_quantile_norm" -> ((s, dir) => {
      Sampling.quantileNormalize(t(s, dir, "documents"), "source", "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("n_chars_qn"))
    }),

    // sketches: count-min token frequencies at a width that forces real
    // collisions, next to the exact counts — est >= exact always, and
    // the oracle reproduces every counter via the portable md5 family
    "q134_cms_counts" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val sketch = FreqSketch.cmsBuild(toks, "tok", depth = 4, width = 16)
      val qs = toks.filter(pmod(FreqSketch.hash60(col("tok")), lit(7L)) === 0)
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      FreqSketch.cmsEstimate(sketch, qs, "tok", depth = 4, width = 16)
        .join(exact, col("item") === col("tok"))
        .select(col("item").as("token"), col("est"), col("exact"))
    }),

    // monitoring: categorical drift — the event-type mix of the odd-id
    // half vs the even-id half, per-value chi-square contributions
    "q130_category_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Reconcile.categoryDrift(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), "event_type")
    }),

    // curation telemetry: dup-graph SHAPE — wedge/triangle counts and
    // the global clustering coefficient of q64's near-dup graph (high =
    // templated boilerplate families, low = incremental-edit chains);
    // triangles via the degree-ordered orientation (outdeg <= O(sqrt(m)))
    "q129_graph_stats" -> ((s, dir) => {
      val docs0 = Dedup.exactDedup(t(s, dir, "documents"), "doc_id",
        "text")
      val cand = Dedup.minhashCandidates(docs0, "doc_id", "text",
        shingleSize = 3, k = 32, bands = 8)
      val near = Dedup.jaccardVerify(cand, docs0, "doc_id", "text",
          shingleSize = 3)
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      Dedup.graphStats(near)
    }),

    // streaming: quality monitoring — q112's row-level rules per
    // micro-batch (foreachBatch report appends); per-batch violation
    // counts SUM to the global report, the identity the oracle checks
    "q128_stream_quality" -> ((s, dir) => {
      val inDir = tmpDir("graft_q128_in")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q128_out") + "/out"
      EventStream.runQualityChecksOnce(s, s.read.parquet(inDir).schema,
          inDir, Seq("not_null:user_id", "in_range:value:0:50",
            "matches:event_type:^[a-z]{1,5}$"),
          outDir, "q128_sink", maxFilesPerTrigger = Some(1))
        .groupBy(col("check_name"))
        .agg(sum(col("violations")).as("violations"),
          sum(col("total")).as("total"))
        .withColumn("passed", col("violations") === 0)
    }),

    // telemetry: KMV overlap — per event type, how many users the two
    // event-id-parity halves of the log share, estimated purely from the
    // halves' sketch artifacts via inclusion-exclusion on a true merge
    "q127_kmv_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = DistinctSketch.kmvHashes(
        ev.filter(col("event_id") % 2 === 0), "event_type", "user_id", 64)
      val b = DistinctSketch.kmvHashes(
        ev.filter(col("event_id") % 2 === 1), "event_type", "user_id", 64)
      DistinctSketch.kmvIntersectEstimate(a, b, "event_type", 64)
    }),

    // analytics: think-time — exact median gap (µs) per consecutive
    // event-type transition; per-user lag window + histogram quantile
    "q126_transition_times" -> ((s, dir) => {
      Funnel.transitionTimes(t(s, dir, "events"), "user_id",
        "event_type", "ts", "event_id", p = 0.5)
    }),

    // behavioral: first-order Markov transition matrix — per (from, to)
    // event-type step the count and row-normalized probability ("where
    // do users go next"), transitions never crossing users
    "q151_transition_matrix" -> ((s, dir) => {
      Funnel.transitionMatrix(t(s, dir, "events"), "user_id",
        "event_type", "ts", "event_id")
    }),

    // text: vocab coverage curve — token-occurrence coverage of the
    // top-V terms at V=100/1000/4000 (4000 exceeds the vocab: clamp
    // branch); runs on the frequency HISTOGRAM, never a vocab-sized sort
    "q125_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text",
        Seq(100, 1000, 4000))
    }),

    // analytics: path mining — the corpus-wide top-10 event-type
    // trigrams from per-user (ts, event_id)-ordered sequences; n-gram
    // fan-out is map-side, counts map-side-combinable, top-k TakeOrdered
    "q124_event_paths" -> ((s, dir) => {
      Funnel.pathNgrams(t(s, dir, "events"), "user_id", "event_type",
        "ts", "event_id", n = 3, k = 10)
    }),

    // cleaning: per-language winsorization — doc length clipped into the
    // [p05, p95] exact quantile band (clamp, don't drop); bounds off the
    // q116 histogram machinery, clamp is a narrow broadcast-join map
    "q123_winsorize" -> ((s, dir) => {
      Sampling.winsorizePerGroup(t(s, dir, "documents"), "lang",
          "n_chars", pLo = 0.05, pHi = 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("n_chars_w"))
    }),

    // curation: split-leakage audit — near-dup pairs (q64's graph, built
    // on the RAW corpus so exact dups leak too) that straddle q66's
    // train/val/test hash split; each row is contamination eval can't see
    "q122_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleSize = 3, k = 32, bands = 8)
      val near = Dedup.jaccardVerify(cand, docs, "doc_id", "text",
          shingleSize = 3)
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      val splits = Sampling.hashSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Dedup.crossSplitPairs(near, splits, "doc_id")
    }),

    // curation: embedding outliers — per label, the 5 vectors farthest
    // from the label centroid (mislabel/garbage detector). Integer-exact:
    // quantized coords, distance*n^2 = sum((n*x_i - S_i)^2), no float mean
    "q121_embedding_outliers" -> ((s, dir) => {
      Similarity.embeddingOutliers(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", k = 5)
    }),

    // curation telemetry: the cluster-size histogram of q64's near-dup
    // pair graph — how much duplication exists and whether it is a long
    // tail of pairs or a few giant templates
    "q120_dedup_stats" -> ((s, dir) => {
      val docs0 = Dedup.exactDedup(t(s, dir, "documents"), "doc_id",
        "text")
      val cand = Dedup.minhashCandidates(docs0, "doc_id", "text",
        shingleSize = 3, k = 32, bands = 8)
      val near = Dedup.jaccardVerify(cand, docs0, "doc_id", "text",
          shingleSize = 3)
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      Dedup.clusterStats(near).frame
    }),

    // text: PMI collocations — top adjacent-token pairs by pointwise
    // mutual information (rational ranking, no libm); bigrams built
    // map-side from the token array, counts map-side-combinable
    "q119_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minCount = 3, k = 20)
    }),

    // analytics: full quantile summary per group in ONE histogram pass —
    // p25/p50/p75/p95 of doc length per language; the p fan-out explodes
    // the cumulated histogram (distinct scores), never the raw rows
    "q116_quantile_summary" -> ((s, dir) => {
      Sampling.quantilesPerGroup(t(s, dir, "documents"), "lang",
        "n_chars", Seq(0.25, 0.5, 0.75, 0.95))
    }),

    // warehouse: SCD2 history — compress each user's event-type change
    // log into validity ranges (value runs with valid_from/valid_to,
    // open row flagged current); both windows share one key partition
    "q115_scd2_history" -> ((s, dir) => {
      Reconcile.scd2Compress(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("valid_from")).as("from_us"),
          unix_micros(col("valid_to")).as("to_us"),
          col("is_current"))
    }),

    // sketches: KMV mergeability — sketch two disjoint halves of the
    // event log separately, merge the sketch ARTIFACTS, estimate.
    // The oracle computes the estimate over the whole table directly:
    // merge-of-parts == sketch-of-union, exactly, which is what lets
    // per-load sketch artifacts answer cross-load distinct counts
    // without re-reading any load
    "q114_kmv_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = DistinctSketch.kmvHashes(
        ev.filter(col("event_id") % 2 === 0), "event_type", "user_id", 64)
      val b = DistinctSketch.kmvHashes(
        ev.filter(col("event_id") % 2 =!= 0), "event_type", "user_id", 64)
      DistinctSketch.kmvEstimate(
        DistinctSketch.kmvMerge(Seq(a, b), "event_type", 64),
        "event_type", 64)
    }),

    // layout: Morton z-values — the interleaved-bits clustering key
    // behind two-dimensional data skipping (each z-sorted file covers an
    // (x,y) rectangle, so footer stats skip files for predicates on
    // EITHER column); the gate pins the exact bit chain cross-engine
    "q113_zorder_key" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        Layout.zValue(col("l_partkey"), col("l_suppkey"), bits = 16)
          .as("zval"))
    }),

    // validation: declarative quality checks — all row-level rules fold
    // into ONE aggregation pass; uniqueness is a keys-only hash agg;
    // the FK check is a left-anti join vs distinct dim keys. The tight
    // l_discount band is deliberately violated so the gate pins a
    // passed=false row alongside the green ones
    "q112_quality_checks" -> ((s, dir) => {
      Checks.run(t(s, dir, "lineitem"), Seq(
        Checks.notNull("l_orderkey"),
        Checks.inRange("l_quantity", 1, 50),
        Checks.inRange("l_discount", 0.0, 0.05),
        Checks.matches("l_returnflag", "^[ARN]$"),
        Checks.unique("l_orderkey", "l_linenumber"),
        Checks.referential("l_orderkey", t(s, dir, "orders"),
          "o_orderkey")))
    }),

    // text: per-doc top-3 TF-IDF terms — rational idf (N/df, same
    // ranking as log-idf, no libm in the path) keeps the score a single
    // division of exact integer products; rank ties break on unrounded
    // score then term, WindowGroupLimit prunes map-side
    "q111_tfidf_terms" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"),
        "doc_id", "text", k = 3)
    }),

    // analytics: rolling engagement — DAU and 7-day rolling WAU per
    // activity day; activity dedupes to (day, user) BEFORE the window
    // fan-out, so the x7 explode multiplies the deduped frame, never the
    // raw event log, and no per-day window state exists anywhere
    "q110_rolling_active" -> ((s, dir) => {
      Funnel.rollingActive(t(s, dir, "events"), "user_id", "ts",
        windowDays = 7)
    }),

    // functions: feature hashing — raw text folds into fixed-dim count
    // vectors in one native loop (the doc → vector step feeding the
    // similarity stack, no model, no vocab table); md5 bucketing mirrors
    // in DuckDB, counts are exact ints — the gate emits the nonzero
    // (dim, count) pairs
    "q107_feature_hash" -> ((s, dir) => {
      val vecs = t(s, dir, "documents")
        .select(col("doc_id"), Dedup.tokens(col("text")).as("__tk"))
        .select(col("doc_id"),
          graft.functions.FeatureHashExpr.featureHash(col("__tk"), 64)
            .as("v"))
      vecs.select(col("doc_id"),
          posexplode(col("v")).as(Seq("dim", "value")))
        .filter(col("value") =!= 0)
        .select(col("doc_id"), col("dim"),
          col("value").cast("long").as("count"))
    }),

    // analytics: weekly cohort retention — distinct users per
    // (first-activity cohort week, week offset); activity dedupes to
    // (user, week) before the matrix count
    "q106_retention" -> ((s, dir) => {
      Funnel.retentionMatrix(t(s, dir, "events"), "user_id", "ts")
        .select(col("cohort_week").cast("string").as("cohort_week"),
          col("week_offset"), col("n_users"))
    }),

    // compliance: salted pseudonymization — user ids replaced by
    // sha256(salt || id), referentially consistent so the per-user
    // aggregate still groups correctly on the tokenized key
    "q103_pseudonymize" -> ((s, dir) => {
      Redact.pseudonymize(t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type")),
        Seq("user_id"), salt = "graft-salt-v1")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
    }),

    // reconciliation: snapshot diff — the new delivery modifies every
    // 11th doc's text, drops every 13th, and adds 20 fresh ids (all
    // deterministic); every key classifies as added/removed/changed/
    // unchanged on fixed-width digests, content never shuffled
    "q104_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val newDf = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(lit("edited "), col("text"))).otherwise(col("text")))
        .unionByName(
          docs.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
              col("lang")))
      Reconcile.diffFrames(docs, newDf, "doc_id")
    }),

    // analytics: exact per-group median WITHOUT sorting raw rows — the
    // ordered window runs over the per-(lang, n_chars) count histogram
    // (q78's machinery, value extraction instead of band filter); the
    // type-1 rule (smallest score with cum >= ceil(p*n)) is stated
    // explicitly and replayed identically in the oracle
    "q101_group_median" -> ((s, dir) => {
      Sampling.quantilePerGroup(t(s, dir, "documents"), "lang", "n_chars",
        p = 0.5)
    }),

    // analytics: top-k rows per group by a metric — the built-in
    // WindowGroupLimit regime: Spark 4 map-side prunes a row_number<=k
    // filter, so each reduce task reads ~(#map partitions * k) rows per
    // group, not the group (the capPerGroup scaladoc contrasts when that
    // bound stops being enough)
    "q102_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))
    }),

    // the end-to-end TRAINING-PREP params pipeline (q76's analog for the
    // round-9 algorithms): NormalizeText → ChunkText → HashSplit chained
    // purely through JobRunner params files; splitting on doc_id keeps
    // every chunk of a document in ONE split (no eval leakage across the
    // doc boundary); the oracle replays the whole chain in SQL
    "q100_prep_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q100")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.parquet(p("src"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("NormalizeText",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("norm")}",
           | "text_column": "text"}""".stripMargin)
      run("ChunkText",
        s"""{"source_dir": "${p("norm")}", "target_dir": "${p("chunks")}",
           | "id_column": "doc_id", "text_column": "norm_text",
           | "chunk_tokens": 32}""".stripMargin)
      run("HashSplit",
        s"""{"source_dir": "${p("chunks")}", "target_dir": "${p("final")}",
           | "id_column": "doc_id",
           | "splits": [{"name": "train", "weight": 0.8},
           |            {"name": "val", "weight": 0.1},
           |            {"name": "test", "weight": 0.1}]}""".stripMargin)
      s.read.parquet(p("final"))
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          col("split"))
    }),

    // packing: the assembled training sequences — q49's exact chunk-id
    // prefix sum, then per-chunk text concatenation in id order
    // (array_sort on (id, text) structs: deterministic, window-free);
    // chunk sizes are budget-bounded so no group outgrows its task
    // curation: packing-efficiency report — mean fill + p50/p90 of the
    // per-chunk assigned token mass at a 512-token budget (the "does the
    // budget match the length distribution" number)
    "q159_packing_stats" -> ((s, dir) => {
      val packed = Packing.packDocuments(t(s, dir, "documents"), "doc_id",
        "text", budgetTokens = 512)
      Packing.packingStats(packed.frame, "n_tokens", budgetTokens = 512,
        ps = Seq(0.5, 0.9))
    }),

    "q98_packed_sequences" -> ((s, dir) => {
      val packed = Packing.packDocuments(t(s, dir, "documents"), "doc_id",
        "text", budgetTokens = 4096)
      packed.frame.groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("seq_tokens"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text"))).as("seq_text"))
    }),

    // analytics: per-group standardization (z-score) from EXACT integer
    // moments — count/sum/sum-of-squares are BIGINT-exact, so the double
    // arithmetic is the same expression tree in both engines and the
    // z-scores hash-match at round 6; stats broadcast, corpus unshuffled
    "q99_zscore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s1"),
          sum(col("n_chars") * col("n_chars")).as("s2"))
      docs.join(broadcast(stats), Seq("lang"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("variance",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n")) /
            (col("n") - 1))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round((col("n_chars") - col("mean")) / sqrt(col("variance")), 6)
            .as("z"))
    }),

    // aggregation: DYNAMIC pivot — values discovered from the data (the
    // driver-bounded distinct is Spark's own pivot machinery), vs q12's
    // explicit-value Transpose; one row per source, one count column per
    // discovered language
    "q95_dynamic_pivot" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang")
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // window analytics: share-of-total WITHOUT ordering — each source's
    // token share within its language via an unordered partition window
    // (no sort, no running state; the window is a per-partition total)
    "q96_share_report" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
      t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("chars"))
        .withColumn("share",
          round(col("chars").cast("double") / sum(col("chars")).over(w), 6))
    }),

    // curation: fuzzy key canonicalization — unordered source-name pairs
    // within levenshtein distance 1 (typo/variant detection over the
    // DISTINCT key domain, never the corpus rows; both engines ship the
    // same edit-distance metric)
    "q97_fuzzy_keys" -> ((s, dir) => {
      val names = t(s, dir, "documents").select(col("source")).distinct()
      names.as("a").join(names.as("b"),
          col("a.source") < col("b.source") &&
          levenshtein(col("a.source"), col("b.source")) <= 1)
        .select(col("a.source").as("source_a"),
          col("b.source").as("source_b"),
          levenshtein(col("a.source"), col("b.source")).as("dist"))
    }),

    // aggregation: ROLLUP corpus report — per-(lang, source) counts with
    // per-lang and grand-total subtotal rows, the standard curation
    // dashboard aggregate (grouping-set nulls coalesced to 'ALL' so the
    // sentinel survives the hash compare in both engines)
    "q93_rollup_report" -> ((s, dir) => {
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("n_chars"))
    }),

    // multimodal: frame-level dedup — duplicated payloads (doc_id % 97
    // keys the blob, q77's convention) sample identical frames; each
    // distinct (payload digest, frame_no) survives once under its
    // min-id owner
    "q94_frame_dedup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("FRAMES:"), (col("doc_id") % 97).cast("string"),
            lit(":PAYLOAD")).as("blob")),
        "doc_id", "blob", "video/fake")
      Multimodal.dedupSampledFrames(media, "doc_id", nFrames = 4)
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

    // streaming: trending terms per window — a REAL append-mode windowed
    // aggregation (only watermark-closed windows emit; the open tail
    // window is absent by streaming semantics, and the oracle excludes
    // it identically), then top-3 per window over the settled histogram
    "q92_trending_stream" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      val counts = EventStream.runWindowedOnce(s, raw,
        s"$dir/events*.parquet", "5 minutes", "0 seconds", "q92_sink",
        prepare = graft.core.Tables.normalizeEventTs)
      EventStream.trendingPerWindow(counts, k = 3)
    }),

    // curation: mixture reweighting to a GLOBAL token budget — 4000
    // tokens split en:fr:es = 2:1:1 (per-group budgets through the same
    // two-phase weighted cap); zh and de are not named, so they are kept
    // whole and never enter the exact window
    "q90_mixture_reweight" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.mixToBudget(docs, "doc_id", "lang", "n_tokens",
          Map("en" -> 0.5, "fr" -> 0.25, "es" -> 0.25),
          totalBudget = 4000.0)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
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

    // layout: co-bucketed join — both sides hash-clustered by doc_id at
    // write time, so the join (and every future join on the key) plans
    // with no exchange; the landing shuffle is paid once, amortized over
    // all downstream jobs
    "q87_bucketed_join" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // external tables at a fresh tmp location: a managed table's
      // warehouse dir outlives the session's catalog and blocks the next
      // session's saveAsTable (LOCATION_ALREADY_EXISTS)
      val base = tmpDir("graft_q87")
      Layout.writeBucketed(docs.select(col("doc_id"), col("lang")),
        "graft_q87_docs", Seq("doc_id"), 8, Seq("doc_id"),
        path = Some(s"$base/docs"))
      Layout.writeBucketed(
        docs.select(col("doc_id"), (col("n_chars") % 7).as("score")),
        "graft_q87_scores", Seq("doc_id"), 8, Seq("doc_id"),
        path = Some(s"$base/scores"))
      s.table("graft_q87_docs")
        .join(s.table("graft_q87_scores"), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("score")).as("sum_score"))
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

    // streaming: benchmark decontamination on the ingest stream — the
    // corpus staged as 4 files streamed at maxFilesPerTrigger=1 → 4 real
    // micro-batches, each a stateless prepared-benchmark filter (bloom
    // prefilter + exact semi-join verify); the benchmark (q71's: every
    // 25th doc's tokens 2..13, n=6) is prepared ONCE for the query
    "q83_stream_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 2, 12)).as("qtext"))
      val inDir = tmpDir("graft_q83_in")
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q83_out") + "/out"
      EventStream.runDecontaminateOnce(s, s.read.parquet(inDir).schema,
          inDir, bench, "qtext", "doc_id", "text", outDir, "q83_sink",
          n = 6, minOverlap = 1, maxFilesPerTrigger = Some(1))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // privacy: k-anonymity audit over quasi-identifiers — (lang, source,
    // coarse length bucket) as the quasi tuple; min_class_size >= k IS
    // the anonymity property, risky classes/rows quantify the exposure
    "q178_k_anonymity" -> ((s, dir) => {
      graft.operators.Checks.kAnonymityReport(
        t(s, dir, "documents").withColumn("len_bucket",
          floor(col("n_chars") / 100).cast("long")),
        Seq("lang", "source", "len_bucket"), k = 5)
    }),

    // monitoring: exponential time-decay engagement per user — events a
    // half-life (3 days) older than the newest event count half as much;
    // the recency-weighted activity rank next to q169's lifetime gini
    "q179_decayed_engagement" -> ((s, dir) => {
      Stats.decayedScore(t(s, dir, "events"), "ts", "user_id", "value",
        halfLifeDays = 3.0)
    }),

    // curation: bigram-LM cross-entropy quality score (token ORDER now
    // matters, vs q62's unigram) — model truncated to 500 bigrams / 25
    // histories of the corpus's 31 tokens so the smoothing-floor and
    // truncated-history paths are exercised, not just the happy path
    "q180_bigram_quality" -> ((s, dir) => {
      TextAnalysis.bigramLogProbScore(t(s, dir, "documents"), "doc_id",
        "text", modelSize = 500, historySize = 25, addK = 0.5)
    }),

    // curation: zlib compression-ratio quality bands — template spam
    // deflates toward 0, noise toward 1. No SQL engine mirrors zlib, so
    // the gate writes the deflate sizes to a prepared side parquet
    // (hive-partitioned by corpus size: each SF owns its partition,
    // dynamic overwrite — Verify at sf0.01 and Bench at sf0.1 never
    // clobber each other) and the oracle reads them back as shared
    // input; what the gate checks is the raw-byte count, the exact
    // integer ppm ratio, and the banding math
    "q181_compression_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      TextAnalysis.compressionSignals(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_deflated"), lit(n).as("n_corpus"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("n_corpus").parquet("/tmp/graft_q181_sizes")
      val sizes = s.read.parquet("/tmp/graft_q181_sizes")
        .filter(col("n_corpus") === n).select("doc_id", "n_deflated")
      TextAnalysis.compressionBands(
        docs.select(col("doc_id"),
            octet_length(col("text")).as("n_bytes"))
          .join(sizes, Seq("doc_id")),
        "doc_id")
    }),

    // curation: C4-style blocklist blast-radius report — doc and
    // occurrence counts per blocked term, zero-hit terms kept as (0,0)
    // rows (the misspelled-blocklist-entry bug made visible)
    "q182_blocklist" -> ((s, dir) => {
      TextAnalysis.blocklistReport(t(s, dir, "documents"), "doc_id",
        "text", Seq("slow", "big", "vector", "zzz_unused"))
    }),

    // web-corpus: URL domain mix — every 3rd doc gets deterministic
    // URLs appended (the q156 mangle convention: the corpus has none),
    // then per-domain doc/url counts from the RE2-simple extraction
    "q183_url_domains" -> ((s, dir) => {
      val withUrls = t(s, dir, "documents").withColumn("text",
        concat(col("text"), when(col("doc_id") % 3 === 0,
          concat(lit(" https://site"), col("doc_id") % 7,
            lit(".example/p x http://cdn.example/a")))
          .otherwise(lit(""))))
      TextAnalysis.urlDomains(withUrls, "doc_id", "text")
    }),

    // curation: Flesch reading-ease — deterministic word/sentence/vowel-
    // group counts in a fixed association (the classic quality feature
    // next to q26's ratio heuristics)
    "q184_readability" -> ((s, dir) => {
      TextAnalysis.readabilityScores(t(s, dir, "documents"), "doc_id",
        "text")
    }),

    // composition: the quality-pipeline params chain — train the bigram
    // model on the FULL corpus, blocklist-filter, score survivors
    // against the saved model, all through registered JobRunner algos
    // (q100's analog for the round-9 quality operators)
    "q185_quality_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q185")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.parquet(p("src"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BigramModel",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("model")}",
           | "text_column": "text", "model_size": 500,
           | "history_size": 25}""".stripMargin)
      run("BlocklistFilter",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("clean")}",
           | "text_column": "text",
           | "terms": ["slow", "big"]}""".stripMargin)
      run("BigramScore",
        s"""{"source_dir": "${p("clean")}", "target_dir": "${p("scored")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "add_k": 0.5}""".stripMargin)
      s.read.parquet(p("scored"))
    }),

    // embeddings: dimension covariance matrix (upper triangle) — the
    // whitening/PCA input and dead/collinear-dim audit; exact quantized
    // integer sums (q137's determinism device), fixed double association
    "q186_embedding_covariance" -> ((s, dir) => {
      Similarity.embeddingCovariance(t(s, dir, "embeddings"),
        "embedding", scale = 1024)
    }),

    // warehouse QA: star-schema-wide FK orphan matrix — every edge in
    // one report; lineitem's supplier edge is deterministically mangled
    // (every 50th row's key shifted, the q156 convention) so the orphan
    // path is exercised, not just all-zeros
    "q187_fk_matrix" -> ((s, dir) => {
      import graft.operators.Checks
      val li = t(s, dir, "lineitem").withColumn("l_suppkey",
        when(col("l_orderkey") % 50 === 0, col("l_suppkey") + 900000L)
          .otherwise(col("l_suppkey")))
      Checks.fkMatrix(Seq(
        Checks.FkEdge("nation->region", t(s, dir, "nation"),
          "n_regionkey", t(s, dir, "region"), "r_regionkey"),
        Checks.FkEdge("customer->nation", t(s, dir, "customer"),
          "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
        Checks.FkEdge("orders->customer", t(s, dir, "orders"),
          "o_custkey", t(s, dir, "customer"), "c_custkey"),
        Checks.FkEdge("lineitem->supplier", li,
          "l_suppkey", t(s, dir, "supplier"), "s_suppkey")))
    }),

    // streaming ops: measured watermark sizing — lateness of each event
    // behind its user's running max in event_id (arrival) order; the
    // p99 row IS the withWatermark number, measured instead of guessed
    "q188_watermark_lateness" -> ((s, dir) => {
      Stats.watermarkLateness(t(s, dir, "events"), "ts", "event_id",
        "user_id", ps = Seq(0.5, 0.95, 0.99))
    }),

    // plan hygiene: join-key skew report — max/p50/p99 of the user_id
    // group sizes; the measured saltFactor input for q68's SkewJoin
    "q189_key_skew" -> ((s, dir) => {
      Stats.keySkewReport(t(s, dir, "events"), "user_id")
    }),

    // privacy: ε-DP released group counts — deterministic seeded
    // Laplace noise (the PortableHash convention, so the release
    // replays bit-for-bit); only noised values leave the aggregation
    "q190_dp_counts" -> ((s, dir) => {
      graft.operators.Privacy.dpCounts(t(s, dir, "documents"),
        Seq("lang", "source"), epsilon = 1.0)
    }),

    // privacy: ε-DP noised per-type value sums with per-row clipping
    // at 100 (the bounded-sensitivity recipe), independent draw from
    // q190's count release (seed suffix)
    "q191_dp_sums" -> ((s, dir) => {
      graft.operators.Privacy.dpSum(t(s, dir, "events"),
        Seq("event_type"), "value", clip = 100.0, epsilon = 1.0)
    }),

    // sketch: Misra-Gries heavy hitters over the token stream — k=64
    // exceeds the corpus's 31-token vocabulary, so the one-pass sketch
    // is provably EXACT here and the oracle is the plain count (the
    // approximate regime is spec-bounded instead)
    "q192_heavy_hitters" -> ((s, dir) => {
      Stats.heavyHitters(
        t(s, dir, "documents")
          .select(explode(Dedup.tokens(col("text"))).as("token")),
        "token", k = 64)
    }),

    // streaming sketch: the q192 heavy hitters as a complete-mode
    // streaming aggregate — the corpus staged as 4 files streamed at
    // maxFilesPerTrigger=2, so the MG state MERGES across real
    // micro-batches; k=64 >= vocab keeps it exact, same oracle shape
    "q193_stream_heavy_hitters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val inDir = tmpDir("graft_q193_in")
      docs.repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runHeavyHittersOnce(s, s.read.parquet(inDir).schema,
        inDir, "token", k = 64, "q193_sink",
        prepare = df => df.select(
          explode(Dedup.tokens(col("text"))).as("token")),
        maxFilesPerTrigger = Some(2))
    }),

    // sketch: per-source heavy hitters — the grouped MG face (one
    // k-counter sketch per source group), exact at k=64 >= vocab
    "q194_group_heavy_hitters" -> ((s, dir) => {
      Stats.heavyHittersPerGroup(
        t(s, dir, "documents")
          .select(col("source"),
            explode(Dedup.tokens(col("text"))).as("token")),
        "source", "token", k = 64)
    }),

    // ML: one Lloyd iteration from the deterministic hash-sampled init —
    // the k-means training kernel (literal-centroid assignment argmax +
    // exact fixed-point centroid means via VectorSumAgg), emitted tall
    "q195_kmeans_step" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.kmeansStep(emb, "vec_id", "embedding",
          Similarity.selectCentroids(emb, "vec_id", "embedding", 8))
        .select(col("cid"), col("n"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("mean"), col("n"))
    }),

    // tokenizer training: BPE round-1 pair counts over the corpus
    // vocabulary (the only corpus-sized pass of BPE learning), top 30
    // with full tie-break so the LIMIT edge is deterministic
    "q196_bpe_pairs" -> ((s, dir) => {
      Bpe.pairCounts(
        Bpe.wordCounts(t(s, dir, "documents"), "text")
          .select(col("freq"), Bpe.initialSymbols(col("word")).as("syms")))
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(30)
    }),

    // tokenizer training: two full BPE merge rounds, oracle-unrolled —
    // text pre-normalized to [a-z0-9 ] so the oracle's round-2 regex
    // atom (the round-1 winner as a literal alternation) is regex-safe
    "q197_bpe_learn" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.learnMerges(docs, "text", nMerges = 2)
    }),

    // graph: one PageRank iteration over the customer -> supplier
    // purchase graph (suppliers are all dangling — the redistribution
    // path is live); fixed-point quantized contributions make the rank
    // doubles bit-identical to the oracle's
    "q198_pagerank_step" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      GraphRank.pageRankStep(GraphRank.initRanks(edges), edges)
    }),

    // streaming ML scoring: nearest-centroid assignment per micro-batch
    // (centroid artifact as a plan literal — stateless, no stream-static
    // join; 4 staged files at maxFilesPerTrigger=2 force real batches)
    "q199_stream_kmeans_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.selectCentroids(emb, "vec_id", "embedding", 8)
      val inDir = tmpDir("graft_q199_in")
      emb.select(col("vec_id"), col("embedding"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runKMeansAssignOnce(s, s.read.parquet(inDir).schema,
        inDir, cent, "vec_id", "embedding", "q199_sink",
        maxFilesPerTrigger = Some(2))
    }),

    // sketch: per-type value quantiles via the mergeable KLL-style
    // aggregate, pinned in its EXACT regime (k=65536 >= any per-type
    // count here — no compaction fires, the MG-gate convention); the
    // approximate regime is spec-bounded instead
    "q200_quantile_sketch" -> ((s, dir) => {
      Stats.sketchQuantilesPerGroup(t(s, dir, "events"), "event_type",
        "value", Seq(0.1, 0.5, 0.9, 0.99), k = 65536)
    }),

    // sketch: q200's streaming face — the quantile sketch state merges
    // across real micro-batches (4 files, maxFilesPerTrigger=2); exact
    // regime, so the settled output equals the batch quantiles
    "q201_stream_quantiles" -> ((s, dir) => {
      val inDir = tmpDir("graft_q201_in")
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runQuantileSketchOnce(s, s.read.parquet(inDir).schema,
        inDir, "event_type", "value", Seq(0.1, 0.5, 0.9, 0.99),
        k = 65536, "q201_sink", maxFilesPerTrigger = Some(2))
    }),

    // training data: deterministic negative sampling — 3 md5-addressed
    // negatives per (customer, part) positive from the part universe
    "q202_negative_samples" -> ((s, dir) => {
      val pos = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("user_id"),
          col("l_partkey").cast("long").as("item_id"))
        .distinct()
        .filter(col("user_id") % 10 === 0)
      Sampling.negativeSamples(pos, "user_id", "item_id",
        t(s, dir, "part").select(col("p_partkey").cast("long")
          .as("item")), "item", k = 3)
    }),

    // training data: class-balanced upsampling of documents by language
    "q203_upsample_balanced" -> ((s, dir) => {
      Sampling.upsampleBalanced(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "lang")
    }),

    // tokenizer: segmentVocabulary replaying a freshly-learned 1-rule
    // merge table — the learn -> segment artifact handoff, end to end
    "q204_bpe_segment" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.segmentVocabulary(docs, "text",
          Bpe.learnMerges(docs, "text", nMerges = 1))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // ML: the kmeansCentroids LOOP at maxIters=1 — init, one step, and
    // the driver-side centroid-table rebuild, gated with q195's oracle
    "q205_kmeans_train" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8,
          maxIters = 1)
        .select(col("cid"), col("n"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("mean"), col("n"))
    }),

    // multimodal: byte-level near-dup pairs without decoding — 97
    // payload families whose members differ only in a '::v2' suffix on
    // every 5th id (the tweaked-header/extended-tail case exact media
    // dedup misses); simhash over non-overlapping 4-byte hex chunks
    "q206_media_neardup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("HDR:"),
            repeat(md5((col("doc_id") % 97).cast("string")), 6),
            when(col("doc_id") % 5 === 0, lit("::v2")).otherwise(lit("")))
            .as("blob")),
        "doc_id", "blob", "application/octet-stream")
      Multimodal.mediaNearDupPairs(media, "doc_id", "payload")
    }),

    // training data: hard-negative mining — 5 nearest different-label
    // vectors per query (closest-but-wrong contrastive examples)
    "q207_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") % 50 === 0), emb,
        "vec_id", "embedding", "label", k = 5)
    }),

    // training data: temperature mixture sampling (alpha=0.5 — the
    // sqrt regime whose weight arithmetic is IEEE-identical in DuckDB)
    "q208_temperature_sample" -> ((s, dir) => {
      Sampling.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", alpha = 0.5)
    }),

    // ANN: IVF retrieval over TRAINED centroids (one Lloyd iteration) —
    // the full train-then-retrieve chain, float-exact end to end
    "q209_ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 8, maxIters = 1)
      Similarity.ivfTopKWith(emb.filter(col("vec_id") % 50 === 0), emb,
          "vec_id", "embedding", k = 5, centroidsDf = cent)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // training data: leakage-safe split — near-dup components share one
    // split key, so no near-duplicate pair straddles train/val/test
    "q210_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(docs, "doc_id", "text"),
          docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.leakageSafeSplit(docs.select(col("doc_id"), col("lang")),
        "doc_id", pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    }),

    // embedding dedup, SemDeDup regime: within-k-means-cluster
    // candidates (trained centroids, one Lloyd iteration), exact cosine
    "q211_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 8, maxIters = 1)
      Dedup.semDedupPairs(emb, "vec_id", "embedding", cent,
        threshold = 0.4)
    }),

    // tokenizer: MULTI-rule replay — learn 2 merges, replay both in
    // rank order (the sequential-application semantics q204's 1-rule
    // gate could not pin; the oracle re-encodes round-1 symbols with
    // paren delimiters so round-2's regex replace IS the fold)
    "q212_bpe_replay2" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      Bpe.segmentVocabulary(docs, "text",
          Bpe.learnMerges(docs, "text", nMerges = 2))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // labeling QA: k-NN label consistency — majority label of the 5
    // nearest neighbors vs the row's own label (neighborhood-vote
    // mislabel detector; complements the centroid-distance one)
    "q213_knn_labels" -> ((s, dir) => {
      Similarity.knnLabelCheck(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", k = 5)
    }),

    // tokenizer-training pipeline through the PARAMS surface only (the
    // q76 convention): BpeVocab learns the merges to a table, BpeSegment
    // replays them from merges_dir — no DataFrame passes between stages
    "q214_bpe_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q214")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents")
        .select(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")
          .as("text"))
        .write.parquet(p("docs"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BpeVocab",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("merges")}",
           | "text_column": "text", "n_merges": 2}""".stripMargin)
      run("BpeSegment",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("seg")}",
           | "text_column": "text",
           | "merges_dir": "${p("merges")}"}""".stripMargin)
      s.read.parquet(p("seg"))
        .select(col("word"), col("freq"),
          concat_ws(" ", col("syms")).as("segmented"))
    }),

    // sketch: join-size estimation from two CMS artifacts (AMS inner
    // product, min over depth rows) — size orders ⋈ customer on custkey
    // WITHOUT running the join; alongside the true size for context
    "q215_cms_join_size" -> ((s, dir) => {
      val sa = FreqSketch.cmsBuild(
        t(s, dir, "orders").select(col("o_custkey")), "o_custkey",
        depth = 4, width = 2048)
      val sb = FreqSketch.cmsBuild(
        t(s, dir, "customer").select(col("c_custkey")), "c_custkey",
        depth = 4, width = 2048)
      val est = FreqSketch.cmsJoinSizeEstimate(sa, sb)
      val exact = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("true_join_size"))
      est.crossJoin(exact)
    }),

    // tokenizer -> packing bridge: per-doc subword counts under the
    // 2-merge segmented vocabulary (the packing budget unit)
    "q216_bpe_token_counts" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ").as("text"))
      val seg = Bpe.segmentVocabulary(docs, "text",
        Bpe.learnMerges(docs, "text", nMerges = 2))
      Bpe.subwordCounts(docs, "doc_id", "text", seg)
    }),

    // decontamination via SAVED benchmark artifacts: build the shingle
    // table once, parquet round-trip, rebuild the bloom at load — the
    // per-release/per-shard amortization face of q71
    "q217_bloom_artifacts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 2, 12)).as("qtext"))
      val artsDir = tmpDir("graft_q217_arts")
      Decontaminate.benchmarkArtifacts(bench, "qtext", n = 6)
        .write.mode("overwrite").parquet(artsDir)
      val pb = Decontaminate.prepareFromArtifacts(s.read.parquet(artsDir))
      val out = Decontaminate.overlapsPrepared(docs, "doc_id", "text", pb,
          minOverlap = 1)
        .select(col("id").as("doc_id"), col("n_matched"),
          col("n_shingles"), col("overlap_ratio"))
      out.persist(); out.count(); pb.release() // settle before release
      out
    }),

    // streaming ML training state: the k-means centroid update as a
    // complete-mode aggregate merging VectorSumAgg state across real
    // micro-batches — exact integer sums, so batching cannot change the
    // result; oracle = q195's one-step update
    "q218_stream_kmeans_update" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.selectCentroids(emb, "vec_id", "embedding", 8)
      val inDir = tmpDir("graft_q218_in")
      emb.select(col("vec_id"), col("embedding"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runKMeansUpdateOnce(s, s.read.parquet(inDir).schema,
          inDir, cent, "embedding", "q218_sink",
          maxFilesPerTrigger = Some(2))
        .select(col("cid"), col("n"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("mean"), col("n"))
    }),

    // sketch artifacts: two per-shard quantile sketches merged by
    // weighted re-ingest (QuantileSketchMergeAgg) — the kmvMerge
    // convention for quantiles; exact regime, whole-table oracle
    "q219_quantile_merge" -> ((s, dir) => {
      import graft.functions.QuantileSketchAgg
      val ev = t(s, dir, "events")
      def part(f: Column) = ev.filter(f)
        .groupBy(col("event_type"))
        .agg(QuantileSketchAgg.sketch(col("value").cast("double"), 65536)
          .as("__sk"))
        .select(col("event_type"), explode(col("__sk")("items")).as("it"))
      val merged = part(col("event_id") % 2 === 0)
        .unionByName(part(col("event_id") % 2 =!= 0))
        .groupBy(col("event_type"))
        .agg(QuantileSketchAgg.mergeSketch(col("it"), 65536).as("__sk"))
      Stats.quantilesFromSketches(merged, "event_type",
        Seq(0.1, 0.5, 0.9, 0.99))
    }),

    // sketch artifacts: two per-shard Misra-Gries summaries merged by
    // count re-ingest — exact at k >= vocab, whole-corpus oracle
    "q220_heavy_hitter_merge" -> ((s, dir) => {
      import graft.functions.MisraGriesAgg
      val docs = t(s, dir, "documents")
      def part(f: Column) = docs.filter(f)
        .select(explode(Dedup.tokens(col("text"))).as("token"))
        .filter(col("token").isNotNull)
        .agg(MisraGriesAgg.heavyHitters(col("token"), 64).as("hh"))
        .select(explode(col("hh")).as("it"))
      part(col("doc_id") % 2 === 0)
        .unionByName(part(col("doc_id") % 2 =!= 0))
        .agg(MisraGriesAgg.mergeHeavyHitters(col("it"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.count_low").as("count_low"))
    }),

    // reporting: the dataset card — exact one-table corpus summary
    // (docs, tokens, source mix, dup rate) published beside the data
    "q221_dataset_card" -> ((s, dir) => {
      DatasetCard.report(t(s, dir, "documents"), "doc_id", "text",
        "source")
    }),

    // ML: greedy farthest-point centroid init (k=3) — the deterministic
    // k-means++-style spread seeding, two unrolled argmin rounds
    "q222_kmeans_farthest_init" -> ((s, dir) => {
      Similarity.selectCentroidsFarthest(t(s, dir, "embeddings"),
          "vec_id", "embedding", 3)
        .select(col("sel"), col("cid"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("sel"), col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("val"))
    }),

    // retrieval eval: recall@5 + MRR of IVF retrieval against the exact
    // nearest neighbor — the ANN stack's evaluation face as a gate
    "q223_retrieval_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(q, emb, "vec_id",
          "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("relevant_id"))
      val results = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        k = 5)
      Similarity.retrievalEval(results, truth)
    }),

    // retrieval eval over TRAINED centroids: one Lloyd iteration lifts
    // IVF recall@5 from 0.4 to 0.6 at the same candidate budget — the
    // measured value of k-means training, now oracle-gated
    "q224_retrieval_eval_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(q, emb, "vec_id",
          "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("relevant_id"))
      Similarity.retrievalEval(
        Similarity.ivfTopKWith(q, emb, "vec_id", "embedding", k = 5,
          Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 128,
            maxIters = 1)),
        truth)
    }),

    // graph: WEIGHTED PageRank step — edge weight = order lines per
    // (customer, supplier) pair, so heavy trade routes carry more rank
    "q225_weighted_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .agg(count(lit(1)).as("w"))
      GraphRank.pageRankStep(GraphRank.initRanks(edges), edges,
        weightCol = Some("w"))
    }),

    // graph: personalized PageRank step — teleport confined to every
    // 10th customer, rank becomes relevance relative to that seed set
    "q226_personalized_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      val seeds = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 10 === 0)
      GraphRank.pageRankStepSeeded(GraphRank.initRanks(edges), edges,
        seeds)
    }),

    // graph: HITS hubs/authorities on the bipartite purchase graph —
    // two mutual-reinforcement rounds in EXACT integer arithmetic
    "q227_hits" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      GraphRank.hitsScores(edges, iters = 2)
    }),

    // weak supervision: near-dups of labeled docs inherit the majority
    // neighbor label — every 3rd doc's lang is masked, then propagated
    "q228_label_propagation" -> ((s, dir) => {
      val docs0 = t(s, dir, "documents")
      val masked = docs0.select(col("doc_id"), col("text"),
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"))
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(docs0, "doc_id", "text"),
          docs0, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.propagateLabels(masked, "doc_id", "lang", pairs)
        .select(col("doc_id"), col("lang"), col("label_source"))
    }),

    // streaming monitoring: per-type distinct users via KMV sketches
    // merging across real micro-batches — a pure set function, so the
    // settled estimate equals q109's batch computation exactly
    "q229_stream_distinct" -> ((s, dir) => {
      val inDir = tmpDir("graft_q229_in")
      t(s, dir, "events").select(col("event_id"), col("event_type"),
          col("user_id"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runKmvDistinctOnce(s, s.read.parquet(inDir).schema,
        inDir, "event_type", "user_id", k = 64, "q229_sink",
        maxFilesPerTrigger = Some(2))
    }),

    // reporting: per-source dataset cards (the mixture-monitoring face)
    "q230_source_cards" -> ((s, dir) => {
      DatasetCard.reportPerGroup(t(s, dir, "documents"), "doc_id",
        "text", "source")
    }),

    // curation: the fasttext-style seed classifier — multinomial Naive
    // Bayes trained on the doc_id%5 labeled slice (labels = lang),
    // scored over the FULL corpus with prediction-vs-actual audit.
    // Counts-based training (no random init), so the model is a pure
    // function of the seed; scores round to 6 decimals (q62 convention)
    "q231_naive_bayes" -> ((s, dir) => {
      Classify.naiveBayesClassify(t(s, dir, "documents"), "doc_id",
        "text", "lang", col("doc_id") % 5 === 0, vocabSize = 30)
    }),

    // substring-level dedup signal (Lee et al. 2022, arXiv:2107.06499):
    // per-doc coverage by 4-token spans that occur more than once in the
    // corpus — the span-removal footprint, relational instead of a
    // suffix array
    "q232_repeated_spans" -> ((s, dir) => {
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 4)
    }),

    // the transformation face of q232: duplicated spans REMOVED and the
    // document reassembled (position-sorted inside the collected array —
    // collect_list order alone is not deterministic)
    "q233_span_removal" -> ((s, dir) => {
      Dedup.removeRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 4)
    }),

    // classifier artifacts through the PARAMS surface only (the q76/q214
    // convention): NaiveBayesModel fits on the doc_id%5 seed slice and
    // writes the model frame; NaiveBayesScore replays it from model_dir
    // over the FULL corpus — train once, score many, no DataFrame passes
    // between stages
    "q234_nb_artifacts" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q234")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .write.parquet(p("seed"))
      t(s, dir, "documents").write.parquet(p("docs"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("NaiveBayesModel",
        s"""{"source_dir": "${p("seed")}", "target_dir": "${p("model")}",
           | "text_column": "text", "label_column": "lang",
           | "vocab_size": 30}""".stripMargin)
      run("NaiveBayesScore",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("scored")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text"}""".stripMargin)
      s.read.parquet(p("scored"))
    }),

    // streaming semantic decontamination: q238's check per micro-batch
    // against the once-prepared benchmark signatures (4 files,
    // maxFilesPerTrigger=1 -> 4 real triggers); stateless, so per-batch
    // outputs union to the batch result — q238's oracle gates it
    // BM25 lexical retrieval, framed as more-like-this: every 97th doc
    // is a query against the whole corpus. The synthetic vocabulary is
    // 31 terms with min df ≈ 5%, so the df-pruning default would empty
    // most queries — the gate runs at maxDfFraction=0.9 (all terms
    // participate; pruning semantics are spec-pinned on a crafted
    // corpus where rare vs stopword terms actually differ)
    "q249_bm25_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Similarity.bm25TopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 5,
        maxDfFraction = 0.9)
    }),

    // the amortized BM25 regime: corpus statistics saved once as a
    // (term, df, n, sdl) artifact (parquet round-trip), the batch then
    // scored against the SAVED table — value-identical to the inline
    // scores, which is what the shared oracle gates
    "q251_bm25_artifacts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val artDir = tmpDir("graft_q251") + "/arts"
      Similarity.bm25Artifacts(docs, "doc_id", "text")
        .write.parquet(artDir)
      Similarity.bm25ScoreAgainst(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
        s.read.parquet(artDir), maxDfFraction = 0.9)
    }),

    // the streaming face: per-micro-batch stateless scoring against the
    // frozen artifact + query set (4 real triggers); batch outputs
    // union to the whole-corpus score table — same oracle as q251
    "q252_stream_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val inDir = tmpDir("graft_q252_in")
      docs.repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q252_out") + "/out"
      EventStream.runBm25ScoreOnce(s, s.read.parquet(inDir).schema,
        inDir, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
        Similarity.bm25Artifacts(docs, "doc_id", "text"), "doc_id",
        "text", outDir, "q252_sink", maxDfFraction = 0.9,
        maxFilesPerTrigger = Some(1))
    }),

    // hybrid retrieval: the BM25 list over documents and the brute
    // cosine list over embeddings (vec_id aligned with doc_id in the
    // synthetic tables, self kept on both sides) fused by reciprocal
    // rank — rank fusion needs no score calibration between the
    // heterogeneous retrievers
    "q250_hybrid_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lex = Similarity.bm25TopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 5,
        maxDfFraction = 0.9)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val vec = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 97 === 0), emb, "vec_id",
          "embedding", k = 5, excludeSelf = false)
        .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Similarity.fuseRankings(Seq(lex, vec), k = 5)
    }),

    // eval: ROUGE-2 overlap between adjacent-document pairs — the
    // summarization/distillation fidelity metric (clipped n-gram
    // MULTISET matches: precision over candidate grams, recall over
    // reference grams, F1); fixed-width gram-hash shuffle keys
    "q253_rouge_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = docs.as("a")
        .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .filter(col("a.doc_id") % 5 === 0)
        .select(col("a.doc_id").as("pair_id"), col("a.text").as("cand"),
          col("b.text").as("ref"))
      TextAnalysis.rougeN(pairs, "pair_id", "cand", "ref", n = 2)
    }),

    // pipeline gate: the retrieval family composed through the params
    // surface ONLY — Bm25Artifacts -> Bm25Score (amortized scoring
    // against the saved table) -> consumer rank -> FuseRankings; RRF
    // self-fusion is order-preserving (2/(60+r) is strictly decreasing
    // in r), so the oracle is the q249 ranking with the fused score
    "q268_retrieval_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q268")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 97 === 0).write.parquet(p("queries"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("Bm25Artifacts",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text"}""".stripMargin)
      run("Bm25Score",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("scores")}",
           | "id_column": "doc_id", "text_column": "text",
           | "queries_dir": "${p("queries")}",
           | "query_id_column": "doc_id", "query_text_column": "text",
           | "artifacts_dir": "${p("arts")}",
           | "max_df_fraction": 0.9}""".stripMargin)
      s.read.parquet(p("scores"))
        .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("doc_id"), col("rank"))
        .write.parquet(p("lex"))
      run("FuseRankings",
        s"""{"source_dir": "${p("lex")}", "target_dir": "${p("fused")}",
           | "other_rankings_dirs": ["${p("lex")}"],
           | "k": 5}""".stripMargin)
      s.read.parquet(p("fused"))
    }),

    // mixing: UniMax waterfill allocation report (Chung et al. 2023) —
    // per-source token budgets at max 2 epochs under a 52k total: the
    // 9 smallest sources contribute their full 2 epochs, the other 11
    // share the waterline (B − Σ caps of capped) / 11
    "q269_unimax_alloc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.unimaxAllocate(docs, "source", "n_tokens",
        totalBudget = 52000L, maxEpochs = 2)
    }),

    // mixing: the apply face — one-epoch selection under the
    // waterfilled allocation (B=24k, E=1: the two smallest sources are
    // kept whole, the rest trim to the ~1206-token waterline), same
    // deterministic hash-bucket ordering and crossing-row rule as q74
    "q270_unimax_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      Sampling.unimaxSelect(docs, "doc_id", "source", "n_tokens",
        totalBudget = 24000L, maxEpochs = 1)
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),

    // ANN: product-quantization code artifact (Jégou et al. 2011) — 64
    // float dims become 8 codes over 16 hash-sampled codewords per
    // subspace (a 32x memory cut); the compressed table the ADC scan
    // joins instead of reading vectors
    "q271_pq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqEncode(emb, "vec_id", "embedding", dim = 64, m = 8,
        Similarity.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 16))
    }),

    // ANN: PQ asymmetric-distance top-5 — every 50th vector queries the
    // compressed corpus; per-cell distances fixed-point quantized so
    // the 8-term sums are exact BIGINT under any aggregation order
    "q272_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16)
    }),

    // pipeline gate: the CCNet regime (Wenzek et al. 2020) through the
    // params surface — LM trained on a REFERENCE subset (every 3rd
    // doc), the FULL corpus scored against the frozen model, then the
    // per-language perplexity band keeps the head+middle (drops the
    // worst-logprob quartile per lang); one glue join attaches lang to
    // the scored table between registered stages
    "q274_ccnet_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q274")
      def p(sub: String) = s"$base/$sub"
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      docs.write.parquet(p("src"))
      docs.filter(col("doc_id") % 3 === 0).write.parquet(p("ref"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BigramModel",
        s"""{"source_dir": "${p("ref")}", "target_dir": "${p("model")}",
           | "text_column": "text", "model_size": 500,
           | "history_size": 25}""".stripMargin)
      run("BigramScore",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("scored")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "add_k": 0.5}""".stripMargin)
      s.read.parquet(p("scored"))
        .join(s.read.parquet(p("src")).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .write.parquet(p("scored_lang"))
      run("QuantileBand",
        s"""{"source_dir": "${p("scored_lang")}",
           | "target_dir": "${p("kept")}", "group_column": "lang",
           | "score_column": "bigram_logprob",
           | "lo": 0.25, "hi": 1.0}""".stripMargin)
      s.read.parquet(p("kept"))
        .select(col("doc_id"), col("lang"), col("bigram_logprob"))
    }),

    // governance: confident-joint label-noise estimate (Northcutt et
    // al. 2021) — per-class thresholds from self-class mean scores,
    // confident (given, suggested) counts; off-diagonal mass is the
    // estimated label-error rate of the lang column
    "q280_confident_joint" -> ((s, dir) => {
      Classify.confidentJoint(t(s, dir, "documents"), "doc_id", "text",
        "lang", col("doc_id") % 5 === 0, vocabSize = 30)
    }),

    // ANN: two-stage PQ retrieval — ADC shortlist of 25 from the
    // compressed scan, exact cosine re-rank to top-5; full vectors
    // touched only for the shortlist
    "q279_pq_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopKRerank(emb.filter(col("vec_id") % 50 === 0), emb,
          "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16,
          shortlist = 25)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // embeddings: JL random projection — 64 dims onto 16 md5-derived
    // planes (the LSH planes family, raw coordinates instead of sign
    // bits); exploded long-format for the gate
    "q278_random_projection" -> ((s, dir) => {
      Similarity.randomProjection(t(s, dir, "embeddings"), "vec_id",
          "embedding", dOut = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("b", "p")))
        .select(col("vec_id"), col("b"), round(col("p"), 6).as("p"))
    }),

    // governance: Min-K% Prob membership signal — mean logprob of each
    // doc's 20% least likely transitions under the LM trained on the
    // reference subset (every 3rd doc); the contamination triage that
    // mean perplexity washes out
    "q277_mink_prob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = TextAnalysis.bigramModel(
        docs.filter(col("doc_id") % 3 === 0), "text",
        modelSize = 500, historySize = 25)
      TextAnalysis.minKProbScore(docs, "doc_id", "text", model,
        kFrac = 0.2)
    }),

    // sampling: deterministic bootstrap resample (the bagging /
    // data-ablation face) — each doc draws Poisson(1) replicas from
    // its hash bucket compared against integer-quantized CDF cutoffs
    // (no query-time libm); tag "b0" names the replicate set
    "q276_bootstrap_sample" -> ((s, dir) => {
      Sampling.bootstrapReplicas(t(s, dir, "documents"), "doc_id",
          lambda = 1.0, tag = "b0")
        .select(col("doc_id"), col("lang"), col("replica"))
    }),

    // streaming: PQ encode as a real foreachBatch query — every 4th
    // vector staged as 3 files, streamed at maxFilesPerTrigger=1 → 3
    // micro-batches, each encoded against the codebook FROZEN from the
    // landed corpus; stateless encode makes the per-batch union
    // identical to q271 restricted to the streamed ids
    "q275_stream_pq_encode" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val inDir = tmpDir("graft_q275_in")
      emb.filter(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding"))
        .repartition(3).write.mode("overwrite").parquet(inDir)
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        64, 8, 16)
      val outDir = tmpDir("graft_q275_out") + "/out"
      EventStream.runPqEncodeOnce(s, s.read.parquet(inDir).schema, inDir,
        cb, "vec_id", "embedding", 64, 8, outDir, "q275_sink",
        maxFilesPerTrigger = Some(1))
    }),

    // ANN: IVF-PQ — 32 L2-assigned cells prune WHICH codes are
    // scanned, PQ compresses WHAT is scanned (the FAISS-style 100 TB
    // configuration); queries probe their 4 nearest cells
    "q273_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16,
        centroids = 32, nprobe = 4)
    }),

    // ANN: IVF-PQ through the PREPARED-artifact params surface (q273's
    // amortized face): PqCodebooks + IvfCentroids + IvfPqCodes write
    // the release artifacts (codes partitioned by cid — the probe join
    // IS partition pruning), IvfPqSearchPrepared replays them; the
    // result must be IDENTICAL to the one-shot q273, which is the gate
    "q281_ivfpq_prepared" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q281")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "embeddings").write.parquet(p("emb"))
      t(s, dir, "embeddings").filter(col("vec_id") % 50 === 0)
        .write.parquet(p("queries"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("PqCodebooks",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("cb")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "dim": 64, "m": 8, "ks": 16}""".stripMargin)
      run("IvfCentroids",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("cent")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "centroids": 32}""".stripMargin)
      run("IvfPqCodes",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("codes")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "dim": 64, "m": 8,
           | "codebooks_dir": "${p("cb")}",
           | "centroids_dir": "${p("cent")}"}""".stripMargin)
      run("IvfPqSearchPrepared",
        s"""{"source_dir": "${p("codes")}", "target_dir": "${p("topk")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "queries_dir": "${p("queries")}",
           | "codebooks_dir": "${p("cb")}",
           | "centroids_dir": "${p("cent")}",
           | "k": 5, "dim": 64, "m": 8, "nprobe": 4}""".stripMargin)
      s.read.parquet(p("topk"))
    }),

    // report: tokenizer fertility per language — subword tokens per
    // whitespace token, the per-language token-budget multiplier
    "q266_fertility" -> ((s, dir) => {
      TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "lang",
        "text")
    }),

    // report: writing-system profile per source on the q261-style
    // confusable-injected fixture — the mislabeled-vs-evasion signal
    "q267_script_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val injected = docs.select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 1, translate(col("text"), "aeo", "аео"))
          .when(col("doc_id") % 3 === 2, translate(col("text"), "cpx", "срх"))
          .otherwise(col("text")).as("t"))
      TextAnalysis.scriptProfile(injected, "source", "t")
    }),

    // curation: mixed-language (code-switching) report — the fixture
    // appends a 20-token German block to half the docs (both engines
    // identically); per-chunk langId, per-doc language mix
    "q265_mixed_language" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 5 < 2)
      val mixed = docs.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"),
          lit(" der die das und ist von mit ein der die das und ist" +
            " von mit ein der die das und")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.mixedLanguageReport(mixed, "doc_id", "text",
        chunkTokens = 20)
    }),

    // sketch: b-bit minhash estimates (b=8) on the q21 candidate pairs —
    // the 8x-smaller persisted-signature regime with the collision
    // baseline corrected out
    "q264_bbit_minhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.bbitEstimatePairs(
        Dedup.minhashCandidates(docs, "doc_id", "text"),
        docs, "doc_id", "text")
    }),

    // instrument: LSH candidate quality — minhash (k=32, bands=8)
    // candidates evaluated against the exact >= 0.55 Jaccard pairs on
    // the same subset: recall = missed near-dups, precision = wasted
    // verify work
    "q263_candidate_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 10 < 3)
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.55)
        .select(col("id_a"), col("id_b"))
      Dedup.pairSetEval(Dedup.minhashCandidates(docs, "doc_id", "text"),
        truth)
    }),

    // curation: quality-nucleus selection — per source keep the
    // highest-scored docs until 50% of the char mass (crossing row
    // kept); the top-p idea as a corpus trim, two-phase so the dominant
    // source never funnels through one sort task
    "q262_nucleus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("score", (col("doc_id") % 97).cast("double") / 97.0)
      Sampling.nucleusPerGroup(docs, "doc_id", "source", "n_chars",
        "score", p = 0.5)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("score"), 6).as("score"))
    }),

    // augmentation: T5-style span masking (rate 0.3, block 5, seed s1) —
    // masked blocks collapse to one positional <extra_id_b> sentinel
    "q260_span_mask" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 1)
      TextAnalysis.augmentSpanMask(docs, "doc_id", "text",
        rate = 0.3, blockSize = 5, seed = "s1")
    }),

    // normalization: homoglyph folding — the fixture injects Cyrillic
    // look-alikes deterministically (both engines build it identically),
    // the operator must count and fold them back
    "q261_homoglyphs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val injected = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 1, translate(col("text"), "aeo", "аео"))
          .when(col("doc_id") % 3 === 2, translate(col("text"), "cpx", "срх"))
          .otherwise(col("text")).as("t"))
      injected.select(col("doc_id"),
        TextAnalysis.normalizeHomoglyphs(col("t")).as("text_norm"),
        TextAnalysis.homoglyphCount(col("t")).as("n_homoglyphs"))
    }),

    // privacy: l-diversity over the q178 quasi classes with user-ish
    // sensitive buckets — the homogeneity-attack audit k-anonymity
    // leaves open
    "q259_l_diversity" -> ((s, dir) => {
      graft.operators.Checks.lDiversityReport(
        t(s, dir, "events").withColumn("hour_bucket",
          hour(col("ts")).cast("long")),
        Seq("event_type", "hour_bucket"), "user_id", l = 3)
    }),

    // dedup: winnowing fingerprint candidates (MOSS scheme) — local
    // partial overlap (a shared token run >= w+k-1) guarantees a shared
    // selected fingerprint; pairs from the fp inverted index
    "q258_winnow_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 10 < 3)
      Dedup.winnowCandidates(docs, "doc_id", "text",
        shingleSize = 3, window = 4, minShared = 2)
    }),

    // augmentation: replayable token dropout (rate 0.1, seed "s1") —
    // positional md5 keeps/drops each token identically in both engines;
    // no RNG state, zero shuffle
    "q256_token_dropout" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
      TextAnalysis.augmentTokenDropout(docs, "doc_id", "text",
        rate = 0.1, seed = "s1")
    }),

    // the streaming face of q256: the same replayable dropout applied
    // per micro-batch through the generic stateless-transform runner
    // (4 real triggers); batch outputs union to the whole-corpus result,
    // so the gate shares q256's oracle
    "q257_stream_dropout" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
      val inDir = tmpDir("graft_q257_in")
      docs.repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q257_out") + "/out"
      EventStream.runTransformOnce(s, s.read.parquet(inDir).schema,
        inDir, outDir, "q257_sink", maxFilesPerTrigger = Some(1)) {
        batch => TextAnalysis.augmentTokenDropout(batch, "doc_id",
          "text", rate = 0.1, seed = "s1")
      }
    }),

    // URL-level dedup: canonicalization collapses case/www/default-port/
    // tracking-param/fragment surface variants onto one key. The synthetic
    // corpus has no URLs, so the gate synthesizes deterministic messy
    // variants from table columns (both engines build the identical
    // fixture) — doc_id%3 picks utm-prefix / utm-suffix+gclid / fragment
    // noise, all of which must collapse
    "q255_url_canonical" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val urls = docs.select(col("doc_id"), concat(
        lit("HTTPS://WWW."), col("source"), lit(".example.com:443/"),
        col("lang"), lit("/item"), (col("doc_id") % 10).cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=x&id="), (col("doc_id") % 7).cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?id="), (col("doc_id") % 7).cast("string"),
            lit("&utm_campaign=y&gclid=z")))
        .otherwise(lit("/#frag"))).as("url"))
      TextAnalysis.canonicalUrlReport(urls, "doc_id", "url")
    }),

    // retrieval: MMR diversity re-rank of brute-force top-8 candidates
    // (lambda=0.7, k=3) — greedy argmax of relevance minus max-sim to
    // the already-picked set; score rounded to 6 before each argmax so
    // the greedy choice is engine-reproducible
    "q254_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cand = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0), emb, "vec_id",
          "embedding", k = 8)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          round(col("cosine"), 6).as("rel"))
        .join(emb.select(col("vec_id").as("doc_id"),
          col("embedding").as("vec")), Seq("doc_id"))
      Similarity.mmrRerank(cand, "query_id", "doc_id", "rel", "vec",
        k = 3, lambda = 0.7)
    }),

    "q248_stream_semantic_decon" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
      val bench = vecs.filter(col("vec_id") % 25 === 0)
      val inDir = tmpDir("graft_q248_in")
      vecs.select(col("vec_id"), col("embedding"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q248_out") + "/out"
      EventStream.runSemanticDeconOnce(s, s.read.parquet(inDir).schema,
        inDir, bench, "vec_id", "embedding", "vec_id", "embedding",
        threshold = 0.9, outDir, "q248_sink",
        maxFilesPerTrigger = Some(1))
    }),

    // source format: the raw text reader (one record per line) — the
    // log/plain-corpus ingest path: lines land as `value`, fields
    // recovered by a first-tab split, tokenization downstream. The
    // synthetic texts are single-line (no tabs/newlines), which the
    // writer side relies on — the delimiter contract of any line format
    "q247_text_source" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 50 === 0)
      val base = tmpDir("graft_q247")
      val lines = docs.collect()
        .map(r => s"${r.getLong(0)}\t${r.getString(1)}")
      JFiles.write(Paths.get(base, "corpus.txt"),
        lines.mkString("\n").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      s.read.text(base)
        .select(
          substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
          expr("substring(value, instr(value, '\t') + 1)").as("text"))
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("text")).as("digest"))
    }),

    // source format: the binaryFile reader — the real ingest path for
    // opaque media payloads (S-category): per-doc files written to a
    // landing dir, read back as (path, length, content) with the doc id
    // recovered from the path and the payload digested; the oracle pins
    // byte-level round-trip fidelity (octet length + md5 of content ==
    // the text the files were written from)
    "q246_binary_source" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 50 === 0) // a bounded landing batch
      val base = tmpDir("graft_q246")
      docs.collect().foreach { r =>
        JFiles.write(Paths.get(base, s"doc_${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      s.read.format("binaryFile").load(base)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("digest"))
    }),

    // curation: character-trigram language ID — the fasttext-langid
    // feature regime as a tokenizer variant of the NB machinery
    // (trigrams include spaces, so word boundaries carry signal);
    // vocab 200 over the trigram space
    "q245_charngram_langid" -> ((s, dir) => {
      Classify.naiveBayesClassify(t(s, dir, "documents"), "doc_id",
        "text", "lang", col("doc_id") % 5 === 0, vocabSize = 200,
        tokenizer = Classify.charTrigrams)
    }),

    // DSIR via SAVED artifacts through the params surface: DsirArtifacts
    // writes the (bucket, diff) model table once, DsirScore replays it —
    // per-release amortization, q217's convention for the DSIR family.
    // The parquet round-trip is value-identity on doubles, so q236's
    // oracle gates it
    "q243_dsir_artifacts" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q243")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 25 === 0).write.parquet(p("target"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("DsirArtifacts",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("model")}",
           | "target_corpus_dir": "${p("target")}", "id_column": "doc_id",
           | "text_column": "text", "buckets": 512}""".stripMargin)
      run("DsirScore",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("weights")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "buckets": 512}""".stripMargin)
      s.read.parquet(p("weights"))
    }),

    // streaming DSIR: the q236 weights computed per micro-batch against
    // the fixed artifact (4 files, maxFilesPerTrigger=1 -> 4 real
    // triggers); stateless, so per-batch outputs union to the batch
    // result — q236's oracle gates the identity
    "q244_stream_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val diff = Dsir.diffArtifacts(docs,
        docs.filter(col("doc_id") % 25 === 0), "doc_id", "text", 512)
      val inDir = tmpDir("graft_q244_in")
      docs.select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q244_out") + "/out"
      EventStream.runDsirScoreOnce(s, s.read.parquet(inDir).schema, inDir,
        diff, "doc_id", "text", 512, outDir, "q244_sink",
        maxFilesPerTrigger = Some(1))
    }),

    // curation: the incremental face of q232 — span-count artifacts
    // built over the landed corpus (doc_id%5 != 0), the delivery batch
    // checked against batch + landed occurrences; landed text is never
    // re-read. Oracle identity: the whole-corpus q232 chain restricted
    // to the batch docs
    "q242_span_increment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val arts = Dedup.spanArtifacts(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", width = 4)
      Dedup.repeatedSpansIncrement(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
        width = 4, arts)
    }),

    // curation: the GOPHER quality ruleset (Rae et al. 2021 §A1.1) —
    // per-doc measured signals + one boolean per rule + the pass
    // conjunction, pure Columns, zero shuffle; the 50-word floor and
    // the stopword rule both split this corpus
    "q241_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherFlags(t(s, dir, "documents"), "doc_id", "text")
    }),

    // the round-9 curation chain through the PARAMS surface only (the
    // q76 convention, over the NEW algorithm families): span-level
    // dedup cleans the corpus, DSIR selects the 100 docs most like the
    // raw %25 target, the NB artifact pair labels the survivors — every
    // stage a JobRunner params file, no DataFrame passes between stages
    "q240_curation_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q240")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), col("text").as("clean_text"))
        .write.parquet(p("target"))
      docs.filter(col("doc_id") % 5 === 0).write.parquet(p("seed"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("RemoveRepeatedSpans",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("cleaned")}",
           | "id_column": "doc_id", "text_column": "text",
           | "width": 4}""".stripMargin)
      run("DsirSelect",
        s"""{"source_dir": "${p("cleaned")}",
           | "target_dir": "${p("selected")}",
           | "target_corpus_dir": "${p("target")}",
           | "id_column": "doc_id", "text_column": "clean_text",
           | "buckets": 512, "k": 100}""".stripMargin)
      run("NaiveBayesModel",
        s"""{"source_dir": "${p("seed")}", "target_dir": "${p("model")}",
           | "text_column": "text", "label_column": "lang",
           | "vocab_size": 30}""".stripMargin)
      run("NaiveBayesScore",
        s"""{"source_dir": "${p("selected")}",
           | "target_dir": "${p("labeled")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "clean_text"}""".stripMargin)
      s.read.parquet(p("labeled"))
        .join(s.read.parquet(p("selected"))
          .select(col("doc_id"), col("log_weight"), col("rank")),
          Seq("doc_id"))
        .select(col("doc_id"), col("log_weight"), col("rank"),
          col("predicted"), col("score"))
    }),

    // curation: fuzzy dedup with an EDIT-DISTANCE verifier — minhash
    // candidates re-checked by exact Levenshtein (the short-text regime
    // where shingle Jaccard is too coarse); O(len^2) per pair is paid
    // only on the candidate sliver
    "q239_editdist_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.editDistanceVerify(
        Dedup.minhashCandidates(docs, "doc_id", "text"),
        docs, "doc_id", "text", maxDist = 30)
    }),

    // curation: SEMANTIC decontamination — corpus vectors within cosine
    // 0.9 of any benchmark vector (the vec_id%25 slice), sign-LSH
    // bucketed candidates with the benchmark side broadcast; catches
    // the paraphrase the n-gram families (q53/q71) cannot
    "q238_semantic_decontaminate" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
      Decontaminate.overlapsSemantic(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") % 25 === 0), "vec_id", "embedding",
        threshold = 0.9, bits = 8, tables = 4)
    }),

    // curation: DSIR importance weights (Xie et al. 2023) — every doc
    // scored by the hashed-ngram log-likelihood ratio of the doc_id%25
    // target slice over the whole corpus; buckets=512 keeps both models
    // literal-sized while leaving the bucket space unsaturated
    "q236_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dsir.importanceWeights(docs, docs.filter(col("doc_id") % 25 === 0),
        "doc_id", "text", buckets = 512)
    }),

    // the selection face: Gumbel-top-200 under md5-derived noise —
    // sampling w/o replacement ∝ exp(log_weight) as a pure function of
    // the data (TakeOrdered, never a global sort); the gate projects the
    // score columns, q240 consumes the carried document columns
    "q237_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dsir.select(docs, docs.filter(col("doc_id") % 25 === 0),
          "doc_id", "text", buckets = 512, k = 200)
        .select(col("doc_id"), col("log_weight"), col("sample_key"),
          col("rank"))
    }),

    // streaming classification: q231's model applied per micro-batch
    // (4 input files, maxFilesPerTrigger=1 -> 4 real triggers); scores
    // are stateless per document, so the union of per-batch outputs IS
    // the single-shot batch result — q234's oracle gates that identity
    "q235_stream_classify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Classify.naiveBayesModel(
        docs.filter(col("doc_id") % 5 === 0), "text", "lang",
        vocabSize = 30)
      val inDir = tmpDir("graft_q235_in")
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val outDir = tmpDir("graft_q235_out") + "/out"
      EventStream.runClassifyOnce(s, s.read.parquet(inDir).schema, inDir,
        model, "doc_id", "text", outDir, "q235_sink",
        maxFilesPerTrigger = Some(1))
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

  // ------------------------------------------------------------- oracle SQL

  private val stopAll: String = TextAnalysis.stopwords.flatMap(_._2).distinct
    .map(w => s"'$w'").mkString(", ")
  private def stopList(lang: String): String =
    TextAnalysis.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")

  // ---- portable-hash SQL fragments (mirrors of graft.functions.PortableHash;
  // the LSH/fingerprint pipelines derive all randomness from md5 so DuckDB
  // reproduces the exact candidate sets — no rows-only gates) ----

  import graft.functions.PortableHash

  /** q256/q257 shared oracle: replayable token dropout (rate 0.1, seed
    * s1) — mirrors TextAnalysis.augmentTokenDropout.
    */
  private def dropoutSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE doc_id % 4 = 0),
      |kept AS (SELECT doc_id, tk,
      |  list_filter(tk, (x, i) ->
      |    CAST('0x' || substr(md5('s1_' || CAST(doc_id AS VARCHAR)
      |      || '_' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 1000 >= 100) AS kp
      |  FROM tok)
      |SELECT doc_id, array_to_string(kp, ' ') AS text_aug,
      |  CAST(len(tk) AS INTEGER) AS n_tokens,
      |  CAST(len(kp) AS INTEGER) AS n_kept
      |FROM kept""".stripMargin

  // mirrors Similarity.ivfPqTopK (centroids=32, nprobe=4, k=5):
  // the q272 encode/distance-table CTEs gated by L2 cell assignment
  // and the probed-cell join; shared by q273 (one-shot) and q281
  // (prepared artifacts), whose results are identical by design
  private def ivfPqSql: String =
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2Sql("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce2
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 32),
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2Sql("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM embeddings e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2Sql("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM embeddings e CROSS JOIN cent c
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

  /** Sequential-accumulation cosine — the same operation order as the native
    * CosineSimilarityExpr loop, so doubles match bit-for-bit.
    */
  /** Squared L2 mirror of [[graft.functions.SquaredL2Expr]]: sequential
    * double accumulation over float inputs in array order.
    */
  private def l2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |      i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |         * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(1, len($a)+1),
       |         i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(range(1, len($b)+1),
       |         i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** The k MinHash minima as a SQL list literal over `hl` (60-bit md5 base
    * hashes mod P), with the exact per-seed (a, b) coefficients the native
    * expression uses.
    */
  private def minhashSigSql(k: Int): String = (0 until k).map { s =>
    s"list_min(list_transform(hl, h -> (${PortableHash.minhashA(s)}*h + " +
      s"${PortableHash.minhashB(s)}) % ${PortableHash.P}))"
  }.mkString("[\n    ", ",\n    ", "]")

  /** The multinomial-NB train+score CTE body (no leading WITH, so it
    * composes into pipelines like q240): `seedRel` supplies (label,
    * text) training rows, `scoreRel` supplies (doc_id, text) rows to
    * score. Top-30 vocab over the seed, add-one likelihoods over the
    * 31-token space, per-(doc,label) log-prob sums rounded to 6. Ends
    * with `best(doc_id, predicted, score, rk)` — rk=1 is the argmax
    * with label-asc tie-break.
    */
  /** DuckDB list expression mirroring [[Classify.charTrigrams]]. */
  private val charTrigramsSql: String =
    """CASE WHEN length(lower(text)) >= 3
      |  THEN list_transform(range(1, length(lower(text)) - 1),
      |         i -> substring(lower(text), i, 3))
      |  ELSE [] END""".stripMargin

  private def nbChainBodySql(seedRel: String, scoreRel: String,
      tokSql: String = "string_split_regex(trim(lower(text)), '\\s+')",
      vocabSize: Int = 30): String =
    s"""nb_seed AS ($seedRel),
       |nb_score_docs AS ($scoreRel),
       |seedtk AS (
       |  SELECT label,
       |    unnest($tokSql) AS token
       |  FROM nb_seed),
       |vocab AS (
       |  SELECT token FROM seedtk GROUP BY token
       |  ORDER BY count(*) DESC, token LIMIT $vocabSize),
       |b AS (
       |  SELECT s.label,
       |    CASE WHEN v.token IS NOT NULL THEN s.token
       |         ELSE '<unk>' END AS token
       |  FROM seedtk s LEFT JOIN vocab v ON s.token = v.token),
       |counts AS (SELECT label, token, CAST(count(*) AS BIGINT) AS n_tok
       |           FROM b GROUP BY 1, 2),
       |ctot AS (SELECT label, CAST(count(*) AS BIGINT) AS n_class
       |         FROM b GROUP BY 1),
       |dc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM nb_seed GROUP BY 1),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM nb_seed),
       |fullv AS (SELECT token FROM vocab UNION ALL SELECT '<unk>'),
       |model AS (
       |  SELECT ct.label, fv.token,
       |    ln(CAST(COALESCE(c.n_tok, 0) + 1 AS DOUBLE)
       |       / (CAST(ct.n_class AS DOUBLE) + ${vocabSize + 1}.0)) AS loglik,
       |    ln(CAST(dc.n_docs AS DOUBLE)
       |       / CAST((SELECT nd FROM nd) AS DOUBLE)) AS logprior
       |  FROM ctot ct CROSS JOIN fullv fv
       |  LEFT JOIN counts c ON c.label = ct.label AND c.token = fv.token
       |  JOIN dc ON dc.label = ct.label),
       |stk AS (
       |  SELECT doc_id,
       |    unnest($tokSql) AS token
       |  FROM nb_score_docs),
       |dtk AS (
       |  SELECT t.doc_id,
       |    CASE WHEN v.token IS NOT NULL THEN t.token
       |         ELSE '<unk>' END AS token
       |  FROM stk t LEFT JOIN vocab v ON t.token = v.token),
       |scored AS (
       |  SELECT doc_id, m.label,
       |    round(m.logprior + sum(m.loglik), 6) AS score
       |  FROM dtk JOIN model m ON dtk.token = m.token
       |  GROUP BY doc_id, m.label, m.logprior),
       |best AS (
       |  SELECT doc_id, label AS predicted, score,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, label) AS rk
       |  FROM scored)""".stripMargin

  /** q231/q234/q235's instantiation: seed = the doc_id%5 lang-labeled
    * slice, scored corpus = all documents.
    */
  private def nbChainSql: String =
    "WITH " + nbChainBodySql(
      "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
      "SELECT doc_id, text FROM documents")

  /** The DSIR weight CTE body (no leading WITH): `rawRel` and
    * `targetRel` each supply (doc_id, text); md5-60 hashed
    * unigram+bigram buckets (mod 512), add-one models over both, per-doc
    * log-ratio sums rounded to 6. Ends with `w(doc_id, log_weight)`.
    */
  private def dsirChainBodySql(rawRel: String, targetRel: String): String =
    s"""dsr_raw AS ($rawRel),
       |dsr_tgt AS ($targetRel),
       |dsr_rtk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM dsr_raw),
       |dsr_ttk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM dsr_tgt),
       |feats AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")} % 512),
       |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |      i -> ${PortableHash.sqlHash60("tk[i] || ' ' || tk[i+1]")}
       |        % 512)
       |    ELSE [] END)) AS b
       |  FROM dsr_rtk),
       |tfeats AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")} % 512),
       |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |      i -> ${PortableHash.sqlHash60("tk[i] || ' ' || tk[i+1]")}
       |        % 512)
       |    ELSE [] END)) AS b
       |  FROM dsr_ttk),
       |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tfeats
       |       GROUP BY b),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tfeats),
       |rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM feats
       |       GROUP BY b),
       |rt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM feats),
       |d AS (
       |  SELECT g.range AS b,
       |    ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
       |       / CAST((SELECT t FROM tt) + 512 AS DOUBLE))
       |    - ln(CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE)
       |       / CAST((SELECT t FROM rt) + 512 AS DOUBLE)) AS diff
       |  FROM range(512) g
       |  LEFT JOIN tc ON tc.b = g.range
       |  LEFT JOIN rc ON rc.b = g.range),
       |w AS (
       |  SELECT doc_id, round(sum(d.diff), 6) AS log_weight
       |  FROM feats JOIN d ON feats.b = d.b
       |  GROUP BY doc_id)""".stripMargin

  /** The whole-corpus repeated-span report (q232's chain) with a final
    * doc predicate — q232 passes TRUE, q242 restricts to the batch.
    */
  private def spanReportSql(docPred: String): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, g AS pos,
       |    CAST('0x' || substr(md5(array_to_string(tk[g+1:g+4], ' ')),
       |      1, 15) AS BIGINT) AS hv
       |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-4)) AS g
       |        FROM tk WHERE len(tk) >= 4)),
       |dup AS (SELECT hv FROM sp GROUP BY hv HAVING count(*) > 1),
       |st AS (SELECT doc_id, pos, 1 AS dup FROM sp JOIN dup USING (hv)),
       |posn AS (
       |  SELECT p.doc_id, p.n_tokens, p.pos, COALESCE(s.dup, 0) AS dup
       |  FROM (SELECT doc_id, len(tk) AS n_tokens,
       |          unnest(generate_series(0, len(tk)-1)) AS pos
       |        FROM tk) p
       |  LEFT JOIN st s ON s.doc_id = p.doc_id AND s.pos = p.pos),
       |cov AS (
       |  SELECT doc_id, n_tokens, dup,
       |    CASE WHEN max(dup) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) = 1
       |      THEN 1 ELSE 0 END AS covered
       |  FROM posn)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(greatest(n_tokens - 3, 0) AS BIGINT) AS n_spans,
       |  CAST(sum(dup) AS BIGINT) AS n_dup_spans,
       |  CAST(sum(covered) AS BIGINT) AS covered_tokens,
       |  round(CAST(sum(covered) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
       |    AS dup_fraction
       |FROM cov WHERE $docPred GROUP BY doc_id, n_tokens""".stripMargin

  /** The span-removal CTE body (no leading WITH): `srcRel` supplies
    * (doc_id, text); the q232 coverage chain carrying the token itself,
    * uncovered tokens reassembled position-ordered. Ends with
    * `cleaned(doc_id, n_tokens, kept_tokens, clean_text)`.
    */
  private def spanCleanBodySql(srcRel: String): String =
    s"""sr_src AS ($srcRel),
       |sr_tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM sr_src),
       |sp AS (
       |  SELECT doc_id, g AS pos,
       |    CAST('0x' || substr(md5(array_to_string(tk[g+1:g+4], ' ')),
       |      1, 15) AS BIGINT) AS hv
       |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-4)) AS g
       |        FROM sr_tk WHERE len(tk) >= 4)),
       |dup AS (SELECT hv FROM sp GROUP BY hv HAVING count(*) > 1),
       |st AS (SELECT doc_id, pos, 1 AS dup FROM sp JOIN dup USING (hv)),
       |posn AS (
       |  SELECT q.doc_id, q.n_tokens, q.pos, q.tk[q.pos+1] AS t,
       |    COALESCE(s.dup, 0) AS dup
       |  FROM (SELECT doc_id, tk, len(tk) AS n_tokens,
       |          unnest(generate_series(0, len(tk)-1)) AS pos
       |        FROM sr_tk) q
       |  LEFT JOIN st s ON s.doc_id = q.doc_id AND s.pos = q.pos),
       |cov AS (
       |  SELECT doc_id, n_tokens, pos, t,
       |    CASE WHEN max(dup) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) = 1
       |      THEN 1 ELSE 0 END AS covered
       |  FROM posn),
       |cleaned AS (
       |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST(sum(1 - covered) AS BIGINT) AS kept_tokens,
       |    COALESCE(string_agg(CASE WHEN covered = 0 THEN t END, ' '
       |      ORDER BY pos), '') AS clean_text
       |  FROM cov GROUP BY doc_id, n_tokens)""".stripMargin

  /** q236/q237's instantiation: raw = all documents, target = the
    * doc_id%25 slice.
    */
  /** BM25 oracle CTE body (q249, reused by q250's hybrid fusion):
    * exact tf/df/dl/N, Lucene positive idf, k1=1.2 b=0.75, query terms
    * pruned at df > maxDf·N, per-pair score rounded to 6 BEFORE ranking.
    * Ends at `sc` (query_id, doc_id, score); constants written as the
    * same IEEE expressions the Spark side computes ((1.2 + 1.0), not
    * 2.2). */
  private def bm25BodySql(queryPred: String, maxDf: Double): String =
    s"""tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+')
       |    AS tk
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, CAST(dl AS BIGINT) AS dl, term,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM tk)
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |       FROM tf GROUP BY 1),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dl) AS DOUBLE) AS sdl
       |  FROM (SELECT doc_id, any_value(dl) AS dl FROM tf GROUP BY 1)),
       |qt AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT doc_id AS query_id, unnest(tk) AS term
       |    FROM tk WHERE $queryPred)),
       |qp AS (
       |  SELECT q.query_id, q.term, f.df FROM qt q
       |  JOIN df f USING (term), st
       |  WHERE CAST(f.df AS DOUBLE) <= CAST(st.n AS DOUBLE) * $maxDf),
       |sc AS (
       |  SELECT q.query_id, t.doc_id,
       |    round(sum(
       |      ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
       |            / (CAST(q.df AS DOUBLE) + 0.5))
       |      * CAST(t.tf AS DOUBLE) * (1.2 + 1.0)
       |      / (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |         + 0.75 * CAST(t.dl AS DOUBLE)
       |           / (st.sdl / CAST(st.n AS DOUBLE))))), 6) AS score
       |  FROM qp q JOIN tf t USING (term), st
       |  GROUP BY 1, 2)""".stripMargin

  /** The rank-free BM25 score table (q251/q252's shared oracle). */
  private def bm25ScoresSql: String =
    s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)}
       |SELECT query_id, doc_id, score FROM sc""".stripMargin

  private def dsirChainSql: String =
    "WITH " + dsirChainBodySql(
      "SELECT doc_id, text FROM documents",
      "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0")

  private def dsirWeightsSql: String =
    s"""$dsirChainSql
       |SELECT doc_id, log_weight FROM w""".stripMargin

  /** q238/q248's oracle: the sign-LSH semantic-decontamination check
    * over the embeddings table with the vec_id%25 benchmark.
    */
  private def semanticDeconSql: String =
    s"""WITH ${lshSigsSql(4, 8, 64)},
       |cand AS (
       |  SELECT DISTINCT c.vec_id AS cid, b.vec_id AS bid
       |  FROM sigs c JOIN sigs b
       |    ON c.t = b.t AND c.sig = b.sig AND b.vec_id % 25 = 0),
       |scored AS (
       |  SELECT cid, bid, ${cosSql("vc.embedding", "vb.embedding")}
       |    AS cos
       |  FROM cand
       |  JOIN v vc ON vc.vec_id = cid
       |  JOIN v vb ON vb.vec_id = bid)
       |SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS n_matched,
       |  round(max(cos), 6) AS best_cosine
       |FROM scored WHERE cos >= 0.9 GROUP BY cid""".stripMargin

  /** The full MinHash-LSH candidate + Jaccard-verify CTE chain over a
    * source relation with (doc_id, text) — shared by the q21 gate and the
    * q48 end-to-end dedup gate. Ends with `j(id_a, id_b, inter, uni)`.
    */
  private def minhashChainSql(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(0, greatest(len(tk)-3, 0)+1),
       |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id, shl,
       |    list_transform(shl, s -> ${PortableHash.sqlHash60("s")}
       |      % ${PortableHash.P}) AS hl
       |  FROM sh),
       |sig AS (SELECT doc_id, ${minhashSigSql(32)} AS sg FROM hs),
       |banded AS (
       |  SELECT doc_id, b.range AS band,
       |    array_to_string(sg[b.range*4+1 : b.range*4+4], '_') AS bucket
       |  FROM sig, range(8) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |j AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(sa.shl, sb.shl)) AS inter,
       |    len(sa.shl) + len(sb.shl) - len(list_intersect(sa.shl, sb.shl))
       |      AS uni
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin

  /** 60-bit SimHash majority vote over `hl`/`n` as one SQL expression. */
  private val simhashSql: String =
    (0 until graft.functions.SimHashExpr.BITS).map { b =>
      s"(CASE WHEN 2*len(list_filter(hl, h -> ((h >> $b) & 1) = 1)) >= n " +
        s"THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" +\n  ")

  /** (band, shift, mask) rows matching Dedup.simhashCandidates' banding. */
  private def simhashBandsSql(maxHamming: Int): String = {
    val bits = graft.functions.SimHashExpr.BITS
    val bands = maxHamming + 1
    val cb = bits / bands
    (0 until bands).map { i =>
      val start = i * cb
      val width = if (i == bands - 1) bits - start else cb
      s"($i, $start, ${(1L << width) - 1})"
    }.mkString(", ")
  }

  /** Shared CTE chain: hyperplanes → per-(vec,table) sign signatures over
    * the embeddings table, mirroring LshSignatureExpr (sequential-order dot
    * products, identical md5-derived weights).
    */
  private def lshSigsSql(tables: Int, bits: Int, dims: Int): String =
    lshSigsSqlOver("SELECT vec_id, embedding FROM embeddings",
      tables, bits, dims)

  /** The KMV distinct-count oracle over the whole events table — shared
    * by q109 (inline sketch) and q114 (merge of per-half sketch
    * artifacts), which must produce the identical estimate.
    */
  private val kmvOracleSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    ${PortableHash.sqlHash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |t AS (
       |  SELECT event_type, count(*) AS m, max(h) AS kth
       |  FROM r WHERE rn <= 64 GROUP BY event_type)
       |SELECT event_type,
       |  round(CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
       |    ELSE CAST(63 AS DOUBLE) * power(2.0, 60) / CAST(kth AS DOUBLE)
       |    END, 6) AS est_distinct,
       |  CAST(m AS BIGINT) AS sketch_rows
       |FROM t""".stripMargin

  /** One KMV part sketch (≤64 smallest distinct user-id hashes per
    * event_type) over a filtered slice of events — q127's oracle builds
    * two and their exact merge.
    */
  private def kmvPartSql(alias: String, pred: String): String =
    s"""h_$alias AS (
       |  SELECT DISTINCT event_type,
       |    ${PortableHash.sqlHash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events WHERE $pred),
       |s_$alias AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM h_$alias) WHERE rn <= 64)""".stripMargin

  /** The KMV estimator over a sketch relation (mirrors kmvEstimate). */
  private def kmvEstSql(name: String, src: String): String =
    s"""$name AS (
       |  SELECT event_type,
       |    round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
       |      ELSE CAST(63 AS DOUBLE) * power(2.0, 60)
       |           / CAST(max(h) AS DOUBLE)
       |      END, 6) AS est
       |  FROM $src GROUP BY event_type)""".stripMargin

  /** The sign-LSH signature chain over an arbitrary (vec_id, embedding)
    * SQL source — q65 runs it over the embeddings table, q108 over
    * feature-hashed document vectors.
    */
  private def lshSigsSqlOver(vSql: String, tables: Int, bits: Int,
      dims: Int): String =
    s"""planes AS (${PortableHash.sqlPlanes(tables, bits, dims)}),
       |pl AS (SELECT t, b, list(w ORDER BY d) AS ws FROM planes GROUP BY t, b),
       |v AS ($vSql),
       |dots AS (
       |  SELECT v.vec_id, pl.t, pl.b,
       |    list_sum(list_transform(range(1, ${dims + 1}),
       |      i -> CAST(v.embedding[i] AS DOUBLE) * pl.ws[i])) AS dot
       |  FROM v, pl),
       |sigs AS (
       |  SELECT vec_id, t,
       |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END) AS INTEGER)
       |      AS sig
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  // q212 and q214 compute the same segmentation (direct API vs the
  // params surface), so they share one oracle body
  private val bpeReplay2Sql: String =
    """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |syms2 AS (SELECT freq, regexp_extract_all(w || '</w>',
        |            '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |            '|</w>|.)') AS s FROM words),
        |p2 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms2 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r2 AS (SELECT l, r FROM p2
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |seg1 AS (SELECT w, freq, regexp_extract_all(w || '</w>',
        |           '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |           '|</w>|.)') AS s FROM words),
        |enc AS (SELECT w, freq,
        |          '(' || array_to_string(s, ')(') || ')' AS j FROM seg1),
        |rep AS (SELECT w, freq, regexp_replace(j,
        |          '\(' || (SELECT l FROM r2) || '\)\(' ||
        |            (SELECT r FROM r2) || '\)',
        |          '(' || (SELECT l FROM r2) || (SELECT r FROM r2) || ')',
        |          'g') AS j2 FROM enc)
        |SELECT w AS word, freq,
        |  array_to_string(regexp_extract_all(j2, '\(([^)]*)\)', 1), ' ')
        |    AS segmented
        |FROM rep""".stripMargin

  // q71 and q217 compute the same decontamination (in-query bloom vs
  // the saved-artifact round trip), so they share one oracle body
  private val bloomDecontaminateSql: String =
    """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bench AS (
        |  SELECT array_to_string(tk[2:13], ' ') AS qt FROM tk
        |  WHERE doc_id % 25 = 0),
        |btk AS (
        |  SELECT string_split_regex(trim(lower(qt)), '\s+') AS tk FROM bench),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' ')))) AS s
        |  FROM btk),
        |csh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' '))) AS shl
        |  FROM tk),
        |csh AS (
        |  SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
        |    unnest(shl) AS s
        |  FROM csh0)
        |SELECT doc_id, count(*) AS n_matched, n_shingles,
        |  round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS overlap_ratio
        |FROM csh JOIN bsh USING (s)
        |GROUP BY doc_id, n_shingles
        |HAVING count(*) >= 1""".stripMargin

  // q195 (direct step), q205 (maxIters=1 loop) and q218 (streaming
  // mini-batch update) are the same centroid update — one oracle body
  private val kmeansStepSql: String =
    s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 8),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |q AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM q)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent))
         |SELECT cd.cid, cd.dim,
         |  CASE WHEN s.n IS NULL
         |    THEN round(CAST(cd.ce[cd.dim + 1] AS DOUBLE), 6)
         |    ELSE round(CAST(CAST(CAST(s.s AS DOUBLE)
         |      / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) AS DOUBLE), 6)
         |  END AS mean,
         |  CAST(COALESCE(s.n, 0) AS BIGINT) AS n
         |FROM centd cd LEFT JOIN sums s
         |  ON s.cid = cd.cid AND s.dim = cd.dim""".stripMargin

  // q200 (batch), q201 (streaming) and q219 (artifact merge) pin the
  // quantile sketch in its exact regime — one oracle body
  private val eventQuantileSql: String =
    """WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS value,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY value) AS rk,
        |             count(*) OVER (PARTITION BY event_type) AS n
        |           FROM events WHERE value IS NOT NULL),
        |ps AS (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)])
        |         AS p)
        |SELECT v.event_type, ps.p, min(v.value) AS q_value,
        |  CAST(max(v.n) AS BIGINT) AS n
        |FROM v CROSS JOIN ps
        |WHERE v.rk >= greatest(CAST(1 AS BIGINT),
        |                       CAST(ceil(ps.p * v.n) AS BIGINT))
        |GROUP BY v.event_type, ps.p""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_partition_filter" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice),2) AS sum_price
        |FROM lineitem
        |WHERE (l_returnflag='R' AND l_linestatus='F')
        |   OR (l_returnflag='A' AND l_linestatus='F')
        |GROUP BY l_returnflag""".stripMargin,

    "q03_top_revenue_orders" ->
      """SELECT o_orderkey, revenue FROM (
        |  SELECT o_orderkey,
        |    round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey=o_orderkey
        |  JOIN customer ON o_custkey=c_custkey
        |  WHERE c_mktsegment='BUILDING'
        |  GROUP BY o_orderkey)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey=o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' AND year(o_orderdate)=1996
        |GROUP BY n_name""".stripMargin,

    "q06_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,

    "q08_full_outer_merge" ->
      """WITH a AS (SELECT o_custkey, count(*) AS cnt_a,
        |             round(sum(o_totalprice),2) AS sum_a
        |           FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey),
        |     b AS (SELECT o_custkey, count(*) AS cnt_b,
        |             round(sum(o_totalprice),2) AS sum_b
        |           FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_custkey)
        |SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b,
        |  sum_a, sum_b
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""".stripMargin,

    "q09_union_align" ->
      """SELECT p_partkey AS id, p_name AS name,
        |  CAST(NULL AS DOUBLE) AS bal, 'p' AS src FROM part
        |UNION ALL
        |SELECT c_custkey, c_name, round(c_acctbal,2), 'c' FROM customer""".stripMargin,

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

    "q12_event_pivot" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type='click' THEN value END),2) AS click,
        | round(sum(CASE WHEN event_type='view' THEN value END),2) AS view,
        | round(sum(CASE WHEN event_type='purchase' THEN value END),2) AS purchase,
        | round(sum(CASE WHEN event_type='signup' THEN value END),2) AS signup,
        | round(sum(CASE WHEN event_type='error' THEN value END),2) AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "q13_date_components" ->
      """SELECT o_orderkey,
        | CAST(CASE WHEN o_orderkey % 97 = 0 THEN 9999
        |           ELSE year(o_orderdate) END AS SMALLINT) AS year,
        | CAST(CASE WHEN o_orderkey % 97 = 0 THEN 99
        |           ELSE month(o_orderdate) END AS SMALLINT) AS month,
        | CAST(CASE WHEN o_orderkey % 97 = 0 THEN 99
        |           ELSE dayofmonth(o_orderdate) END AS SMALLINT) AS day,
        | CAST(CASE WHEN o_orderkey % 97 = 0 THEN 99
        |           ELSE ((dayofyear(o_orderdate)-1)//7)+1 END AS SMALLINT) AS week
        |FROM orders""".stripMargin,

    "q14_fixed_width" ->
      """WITH p AS (SELECT p_partkey,
        |  rpad(p_brand,12,' ') || lpad(CAST(p_size AS VARCHAR),4,' ')
        |    || rpad(p_type,26,' ') AS packed FROM part)
        |SELECT p_partkey,
        | NULLIF(trim(substr(packed,1,12)),'') AS brand_x,
        | CAST(NULLIF(trim(substr(packed,13,4)),'') AS INTEGER) AS size_x,
        | NULLIF(trim(substr(packed,17,26)),'') AS type_x
        |FROM p""".stripMargin,

    "q15_nested_flatten" ->
      """SELECT o_orderkey, o_orderstatus AS meta__status,
        | o_orderpriority AS meta__priority,
        | unnest([o_totalprice + 10.5, o_totalprice * 2]) AS amounts
        |FROM orders""".stripMargin,

    "q16_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q17_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |s AS (SELECT user_id,
        |  CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |       WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin,

    // mirrors q171: q17's session labeling, (user, session) sizes, one
    // summary row of exact counts + three quotients
    "q171_session_summary" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |l AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |         WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0
        |    END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT user_id,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM l),
        |g AS (
        |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n
        |  FROM s GROUP BY 1, 2),
        |a AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_sessions,
        |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bounce,
        |    CAST(sum(n) AS BIGINT) AS ev
        |  FROM g)
        |SELECT n_users, n_sessions, n_bounce,
        |  round(CAST(n_sessions AS DOUBLE) / n_users, 6)
        |    AS sessions_per_user,
        |  round(CAST(n_bounce AS DOUBLE) / n_sessions, 6) AS bounce_rate,
        |  round(CAST(ev AS DOUBLE) / n_sessions, 6) AS events_per_session
        |FROM a""".stripMargin,

    // mirrors q172: exact distinct per group, one quotient
    "q172_distinct_intensity" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
        |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id), 6)
        |    AS rows_per_distinct
        |FROM events
        |WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q18_windowed_counts" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes',
        |   CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q19_exact_dedup" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_dups,
        | min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // mirrors q154: the same every-50th-doc 'xx' re-landing fixture,
    // then (digest, lang) cells joined to digests with >1 value
    "q154_metadata_clash" ->
      """WITH base AS (
        |  SELECT text, lang FROM documents
        |  UNION ALL
        |  SELECT text, 'xx' AS lang FROM documents WHERE doc_id % 50 = 0),
        |c AS (
        |  SELECT md5(text) AS digest, lang,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM base WHERE text IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |k AS (SELECT digest, CAST(count(*) AS BIGINT) AS n_values
        |  FROM c GROUP BY 1)
        |SELECT c.digest, c.lang, c.n_docs, k.n_values
        |FROM c JOIN k USING (digest) WHERE k.n_values > 1""".stripMargin,

    "q20_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 10 < 3),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
        |  FROM toks),
        |inv AS (SELECT doc_id, len(shl) AS n, unnest(shl) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
        |    count(*) AS inter
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE)/(n_a+n_b-inter),6) AS jaccard
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE)/(n_a+n_b-inter) >= 0.55""".stripMargin,

    // mirrors Dedup.minhashCandidates (k=32, bands=8, r=4) + jaccardVerify:
    // identical md5-derived seed family → identical candidate pairs
    "q21_minhash_lsh" ->
      s"""WITH ${minhashChainSql("documents")}
         |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/uni, 6) AS jaccard
         |FROM j WHERE CAST(inter AS DOUBLE)/uni >= 0.5""".stripMargin,

    // mirrors Dedup.simhashDF + simhashCandidates(maxHamming=7): 60-bit
    // md5-derived fingerprint, pigeonhole banding, hamming verify
    "q22_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |hs AS (
         |  SELECT doc_id, len(tk) AS n,
         |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")}) AS hl
         |  FROM toks),
         |fp AS (SELECT doc_id,
         |  $simhashSql AS simhash
         |  FROM hs),
         |banded AS (
         |  SELECT doc_id, simhash, band,
         |    (simhash >> shft) & mask AS chunk
         |  FROM fp, (VALUES ${simhashBandsSql(7)}) AS bands(band, shft, mask)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS fa, b.simhash AS fb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 7""".stripMargin,

    // mirrors Similarity.annTopK (bits=8, tables=4): identical hyperplane
    // weights and dot-product order → identical buckets → identical top-k
    "q24_ann_lsh" ->
      s"""WITH ${lshSigsSql(tables = 4, bits = 8, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
         |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qv.embedding", "cv.embedding")} AS cosine
         |  FROM cand
         |  JOIN v qv ON qv.vec_id = query_id
         |  JOIN v cv ON cv.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    "q23_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qv)+1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv)+1),
        |         i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, round(cosine,6) AS cosine FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    "q25_lang_quality" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |sc AS (SELECT doc_id, text, tk,
         |  $scores,
         |  CAST(len(tk) AS INTEGER) AS n_tokens,
         |  length(text) AS n_chars,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  len(list_filter(tk, x -> x IN ($stopAll))) AS n_stop
         |  FROM t),
         |f AS (SELECT doc_id,
         |  greatest(s_en, s_de, s_es, s_fr, s_zh) AS best,
         |  s_en, s_de, s_es, s_fr, s_zh, n_tokens,
         |  round(CAST(n_chars AS DOUBLE)/greatest(n_tokens,1),4) AS avg_token_len,
         |  round(CAST(n_punct AS DOUBLE)/greatest(n_chars,1),4) AS punct_ratio,
         |  round(CAST(n_stop AS DOUBLE)/greatest(n_tokens,1),4) AS stopword_ratio
         |  FROM sc)
         |SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang_pred,
         |  n_tokens, avg_token_len, punct_ratio, stopword_ratio,
         |  round(CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 0.4 ELSE 0.0 END
         |    + CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
         |    + CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END
         |    + CASE WHEN stopword_ratio >= 0.05 THEN 0.2 ELSE 0.0 END, 2)
         |    AS quality_score
         |FROM f""".stripMargin
    },

    "q26_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |  string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin,

    "q27_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS n_ws,
        | CAST(len(regexp_extract_all(lower(text),
        |   '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe
        |FROM documents""".stripMargin,

    "q28_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | sha256(text) AS content_sha256
        |FROM documents""".stripMargin,

    // mirrors Multimodal.asMedia → fakeDecode → sampleFrames(nFrames=3):
    // md5-derived per-frame offsets reproduce exactly
    "q29_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |  CAST(f.range AS INTEGER) AS frame_no,
         |  ${PortableHash.sqlHash60("concat_ws('_', sha256(text), f.range)")}
         |    % CAST(octet_length(encode(text)) AS INTEGER) AS frame_offset
         |FROM documents, range(3) f""".stripMargin,

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

    "q41_stateful_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |s AS (SELECT user_id,
        |  CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |       WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id))
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin,

    "q38_catalog_table" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    // mirrors Dedup.embeddingNearDupPairs' LSH-bucketed path (bits=8,
    // tables=4): identical buckets → identical candidate pairs → exact
    // cosine filter (round 1's all-pairs oracle gated an all-pairs plan;
    // both sides are bucketed now)
    "q39_embedding_dedup" ->
      s"""WITH ${lshSigsSql(tables = 4, bits = 8, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b
         |    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("va.embedding", "vb.embedding")} AS cosine
         |  FROM cand
         |  JOIN v va ON va.vec_id = id_a
         |  JOIN v vb ON vb.vec_id = id_b)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine FROM scored
         |WHERE cosine >= 0.4""".stripMargin,

    "q40_asof_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        |           FROM events WHERE event_type='purchase'),
        |c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
        |      FROM events WHERE event_type='click')
        |SELECT p.p_id, p.user_id, c.click_id, epoch_ms(c.c_ts) AS click_ts_ms
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.p_ts""".stripMargin,

    // mirrors Similarity.ivfTopK (centroids=128, nprobe=3): identical
    // fixed-count hash-sampled centroid set, assignment argmax, probe set,
    // and re-rank
    "q42_ann_ivf" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 128),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN emb qe ON qe.vec_id = query_id
         |  JOIN emb ne ON ne.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    "q43_profit_by_nation" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS profit,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'PROMO'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,

    "q44_returned_customers" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q45_trade_flows" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        | CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name AND year(o_orderdate) IN (1996, 1997)
        |GROUP BY n1.n_name, n2.n_name, year(o_orderdate)""".stripMargin,

    "q46_market_share" ->
      """WITH agg AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    round(sum(CASE WHEN n2.n_name = 'NATION_7'
        |      THEN l_extendedprice*(1-l_discount) ELSE 0.0 END),4) AS nation_rev,
        |    round(sum(l_extendedprice*(1-l_discount)),4) AS total_rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY year(o_orderdate))
        |SELECT o_year, nation_rev, total_rev,
        |  round(nation_rev / total_rev, 6) AS share
        |FROM agg""".stripMargin,

    // mirrors Dedup.dedupCorpus: exact keeper per md5 digest, then the
    // shared MinHash chain over the survivors, greedy higher-id drop
    "q48_dedup_corpus" ->
      s"""WITH docs0 AS (
         |  SELECT doc_id, text, lang FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")}
         |SELECT doc_id, lang FROM docs0 d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5 AND j.id_b = d.doc_id)""".stripMargin,

    // mirrors Packing.packDocuments (budget 4096): token counts as q27,
    // cumulative-before offsets in doc_id order — integer-exact, so the
    // oracle's plain ordered window reproduces the distributed prefix sum
    "q49_sequence_packing" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk)
        |SELECT doc_id, n_tokens,
        |  CAST(before // 4096 AS BIGINT) AS chunk_id,
        |  CAST(before % 4096 AS BIGINT) AS offset_in_chunk
        |FROM c""".stripMargin,

    // mirrors Sampling.stratifiedSample(en→0.3, de→0.5, default 1.0)
    "q47_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |  < CASE WHEN lang = 'en' THEN 300000
         |         WHEN lang = 'de' THEN 500000
         |         ELSE 1000000 END""".stripMargin,

    "q37_schema_enforce" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name, c_acctbal,
        | CAST(NULL AS VARCHAR) AS loyalty_tier
        |FROM customer""".stripMargin,

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

    // mirrors Decontaminate.overlaps(n=5, minOverlap=2) with the snippet
    // benchmark built from every 40th doc's tokens 3..14
    // mirrors q157: q53's shingle-string chain at n=3 on both halves;
    // every doc emits >= 1 shingle (the greatest(len-3,0)+1 window), so
    // the per-doc counts cover all odd docs
    "q157_novelty" ->
      """WITH rtk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 2 = 0),
        |rsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' ')))) AS s
        |  FROM rtk),
        |ttk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 2 = 1),
        |tsh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
        |  FROM ttk),
        |tsh AS (SELECT doc_id, unnest(shl) AS s FROM tsh0)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(r.s) AS BIGINT) AS n_matched,
        |  round(1.0 - CAST(count(r.s) AS DOUBLE) / count(*), 6) AS novelty
        |FROM tsh t LEFT JOIN rsh r ON t.s = r.s
        |GROUP BY t.doc_id""".stripMargin,

    "q53_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bench AS (
        |  SELECT array_to_string(tk[3:14], ' ') AS qt FROM tk
        |  WHERE doc_id % 40 = 0),
        |btk AS (
        |  SELECT string_split_regex(trim(lower(qt)), '\s+') AS tk FROM bench),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-5, 0)+1),
        |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
        |  FROM btk),
        |csh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-5, 0)+1),
        |    i -> array_to_string(tk[i+1:i+5], ' '))) AS shl
        |  FROM tk),
        |csh AS (
        |  SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
        |    unnest(shl) AS s
        |  FROM csh0)
        |SELECT doc_id, count(*) AS n_matched, n_shingles,
        |  round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS overlap_ratio
        |FROM csh JOIN bsh USING (s)
        |GROUP BY doc_id, n_shingles
        |HAVING count(*) >= 2""".stripMargin,

    // mirrors TextAnalysis.repetitionSignals: line stats are per-row array
    // ops; 2-gram stats group by the gram itself (Spark groups by its
    // 8-byte hash — identical counts)
    "q54_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, greatest(len(tk)-2, 0)+1),
        |    i -> array_to_string(tk[i+1:i+2], ' '))) AS g
        |  FROM tk),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM g0 GROUP BY doc_id, g),
        |ga AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
        |    count(*) AS n_distinct, max(c) AS top
        |  FROM gc GROUP BY doc_id),
        |ln AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_lines,
        |    round(1.0 - CAST(len(list_distinct(string_split(text, chr(10))))
        |      AS DOUBLE) / len(string_split(text, chr(10))), 6)
        |      AS dup_line_fraction
        |  FROM documents)
        |SELECT ln.doc_id, n_lines, dup_line_fraction, n_2grams,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_2grams, 6)
        |    AS dup_2gram_fraction,
        |  round(CAST(top AS DOUBLE) / n_2grams, 6) AS top_2gram_fraction
        |FROM ln JOIN ga USING (doc_id)""".stripMargin,

    // mirrors Redact.withRedactions over the same injected PII; patterns
    // interpolated from the Redact constants so the two engines can never
    // drift (DuckDB regexp_replace needs the explicit 'g' flag)
    // mirrors q165: q55's injection fixture, per-source doc/match counts
    "q165_pii_stats" ->
      s"""WITH pii AS (
         |  SELECT source, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567'
         |      ELSE '' END AS text
         |  FROM documents
         |  WHERE source IS NOT NULL AND text IS NOT NULL),
         |h AS (
         |  SELECT source,
         |    len(regexp_extract_all(text, '${Redact.emailPattern}'))
         |      AS he,
         |    len(regexp_extract_all(text, '${Redact.ipv4Pattern}'))
         |      AS hi,
         |    len(regexp_extract_all(text, '${Redact.phonePattern}'))
         |      AS hp
         |  FROM pii)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN he > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_email,
         |  CAST(sum(he) AS BIGINT) AS n_email,
         |  CAST(sum(CASE WHEN hi > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_ipv4,
         |  CAST(sum(hi) AS BIGINT) AS n_ipv4,
         |  CAST(sum(CASE WHEN hp > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_phone,
         |  CAST(sum(hp) AS BIGINT) AS n_phone
         |FROM h GROUP BY source""".stripMargin,

    // mirrors q164: DuckDB's 0-based dayofweek maps to Spark's 1-based
    "q164_seasonality" ->
      """WITH c AS (
        |  SELECT
        |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INTEGER) AS dow,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
        |SELECT dow, hour, n,
        |  round(CAST(n AS DOUBLE) / tt, 6) AS share
        |FROM c CROSS JOIN t""".stripMargin,

    "q55_pii_redaction" ->
      s"""WITH pii AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567'
         |      ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Redact.emailPattern}', '<EMAIL>', 'g'),
         |    '${Redact.ipv4Pattern}', '<IP>', 'g'),
         |    '${Redact.phonePattern}', '<PHONE>', 'g') AS red_text,
         |  CAST(len(regexp_extract_all(text, '${Redact.emailPattern}'))
         |    AS INTEGER) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${Redact.ipv4Pattern}'))
         |    AS INTEGER) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '${Redact.phonePattern}'))
         |    AS INTEGER) AS n_phone
         |FROM pii""".stripMargin,

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

    // mirrors Dedup.connectedComponents over the same verified minhash
    // pair graph: component = min id transitively reachable (recursive
    // closure — fine at oracle scale; Spark runs label propagation)
    "q61_dedup_components" ->
      s"""WITH RECURSIVE ${minhashChainSql("documents")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst)
         |SELECT src AS id, least(src, min(dst)) AS component
         |FROM reach GROUP BY src""".stripMargin,

    // mirrors TextAnalysis.unigramLogProbScore(vocabSize=20): same
    // count/total division, natural log, OOV floor ln(0.5/total);
    // round(…,6) absorbs any last-ulp libm difference between engines
    "q62_unigram_quality" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |c AS (SELECT t, count(*) AS c FROM tk GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM c),
        |v AS (
        |  SELECT t, ln(c / total) AS lp FROM c CROSS JOIN tot
        |  QUALIFY row_number() OVER (ORDER BY c DESC, t) <= 20)
        |SELECT doc_id,
        |  round(avg(COALESCE(lp, ln(0.5 / total))), 6) AS unigram_logprob
        |FROM tk LEFT JOIN v USING (t) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    // mirrors Shuffling.shuffleIntoShards(numShards=8): identical md5
    // position keys, shard assignment, within-shard rank
    "q56_corpus_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents)
         |SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard,
         |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
         |    AS INTEGER) AS pos_in_shard
         |FROM h""".stripMargin,

    // mirrors EventStream.intervalJoin (batch face): purchases join the
    // clicks of the same user in [p_ts − 2h, p_ts]; event ts values are
    // microsecond-aligned so Spark (micros) and DuckDB (nanos) agree
    // exactly on the interval boundary
    "q63_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_event_id, user_id AS p_user, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS c_event_id, user_id AS c_user, ts AS c_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p_event_id, c_event_id, p_user AS user_id,
        |  epoch_us(p_ts) - epoch_us(c_ts) AS gap_us
        |FROM p JOIN c ON p_user = c_user
        |  AND c_ts >= p_ts - INTERVAL 2 HOUR AND c_ts <= p_ts""".stripMargin,

    // mirrors Dedup.dedupCorpusByComponents: exact keeper per md5 digest,
    // the shared MinHash chain over the survivors, then min-id components
    // over the thresholded pair graph (recursive closure — oracle scale);
    // survivors are the docs that ARE their own component label
    "q64_dedup_clusters" ->
      s"""WITH RECURSIVE docs0 AS (
         |  SELECT doc_id, text, lang FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src)
         |SELECT d.doc_id, d.lang FROM docs0 d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c
         |  WHERE c.id = d.doc_id AND c.component <> d.doc_id)""".stripMargin,

    // mirrors keepPerComponent over embeddingNearDupPairs: q39's sign-LSH
    // cosine pair graph, min-id components (recursive closure), survivors
    // are vectors that are their own component label
    "q65_embedding_clusters" ->
      s"""WITH RECURSIVE ${lshSigsSql(tables = 4, bits = 8, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b
         |    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("va.embedding", "vb.embedding")} AS cosine
         |  FROM cand
         |  JOIN v va ON va.vec_id = id_a
         |  JOIN v vb ON vb.vec_id = id_b),
         |pairs AS (SELECT id_a, id_b FROM scored WHERE cosine >= 0.4),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src)
         |SELECT vv.vec_id FROM v vv
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c
         |  WHERE c.id = vv.vec_id AND c.component <> vv.vec_id)""".stripMargin,

    // mirrors Sampling.hashSplit(0.8/0.1/0.1): identical md5 bucket
    // (same family as q47/q56) and cumulative bounds (800000, 900000, tail)
    "q66_hash_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin,

    // mirrors Sampling.capPerGroup(source, 10): identical md5-bucket rank
    // within each source (ties by doc_id)
    "q67_source_cap" ->
      s"""SELECT doc_id, source FROM documents
         |QUALIFY row_number() OVER (
         |  PARTITION BY source
         |  ORDER BY ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")}
         |             % 1000000, doc_id) <= 10""".stripMargin,

    // mirrors SkewJoin.saltedJoin — salting is semantics-preserving, so
    // the oracle is the PLAIN join (that identity is the whole point)
    "q68_salted_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // mirrors EventStream.dedupStream with a horizon wider than the
    // table's time range: no state eviction, so the settled streaming
    // output projected to the keys is exactly the distinct key set
    "q69_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

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

    // mirrors Decontaminate.overlapsBloom(n=6, minOverlap=1) with the
    // snippet benchmark from every 25th doc's tokens 2..13 — the bloom
    // prefilter is exactness-preserving, so the oracle is the plain
    // shingle overlap (same shape as q53, different params)
    "q71_bloom_decontaminate" -> bloomDecontaminateSql,

    // q217 decontaminates via SAVED benchmark artifacts (parquet round
    // trip + bloom rebuild at load) — same computation as q71
    "q217_bloom_artifacts" -> bloomDecontaminateSql,

    // mirrors Dedup.dedupIncrement: exact digests pruned first, then the
    // shared minhash chain over existing ∪ pruned-incoming; only pairs
    // whose OTHER side is landed disqualify an incoming doc
    "q72_incremental_dedup" ->
      s"""WITH existing AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         |inc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         |inp AS (
         |  SELECT i.doc_id, i.text FROM inc i
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text))),
         |docs0 AS (
         |  SELECT doc_id, text FROM existing
         |  UNION ALL SELECT doc_id, text FROM inp),
         |${minhashChainSql("docs0")},
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
         |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // replays the entire five-stage params pipeline: q72's incremental
    // dedup, q53-shaped decontamination (n=5, minOverlap=2, bench = every
    // 40th doc's tokens 3..14), q74-shaped char-budget mixing (1500 per
    // source), q66-shaped hash split
    "q76_params_pipeline" ->
      s"""WITH existing AS (
         |  SELECT * FROM documents WHERE doc_id % 5 <> 0),
         |inc AS (
         |  SELECT * FROM documents WHERE doc_id % 5 = 0),
         |inp AS (
         |  SELECT i.* FROM inc i
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text))),
         |docs0 AS (
         |  SELECT doc_id, text FROM existing
         |  UNION ALL SELECT doc_id, text FROM inp),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |dbad AS (
         |  SELECT id_b AS doc_id FROM pairs
         |  WHERE id_a IN (SELECT doc_id FROM existing)
         |  UNION
         |  SELECT id_a AS doc_id FROM pairs
         |  WHERE id_b IN (SELECT doc_id FROM existing)),
         |deduped AS (
         |  SELECT * FROM inp
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dbad)),
         |qtk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |qbench AS (
         |  SELECT array_to_string(tk[3:14], ' ') AS qt FROM qtk
         |  WHERE doc_id % 40 = 0),
         |qbtk AS (
         |  SELECT string_split_regex(trim(lower(qt)), '\\s+') AS tk
         |  FROM qbench),
         |qbsh AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |    range(0, greatest(len(tk)-5, 0)+1),
         |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
         |  FROM qbtk),
         |qdtk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM deduped),
         |qcsh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(tk)-5, 0)+1),
         |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
         |  FROM qdtk),
         |contaminated AS (
         |  SELECT doc_id FROM qcsh JOIN qbsh USING (s)
         |  GROUP BY doc_id HAVING count(*) >= 2),
         |clean AS (
         |  SELECT * FROM deduped
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |mix AS (
         |  SELECT doc_id, source, n_chars,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS bkt
         |  FROM clean),
         |mixed AS (
         |  SELECT doc_id, source FROM mix
         |  QUALIFY SUM(CAST(n_chars AS DOUBLE)) OVER (
         |      PARTITION BY source ORDER BY bkt, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - n_chars < 1500)
         |SELECT doc_id, source,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, source,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM mixed) m""".stripMargin,

    // mirrors Sampling.filterByQuantileBand: the operator's histogram
    // construction reproduces percent_rank exactly (rank ties share a
    // rank; pr = (rank-1)/(n-1); both engines divide the same integers)
    "q78_quantile_band" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |QUALIFY percent_rank() OVER (
        |  PARTITION BY lang ORDER BY n_chars) BETWEEN 0.1 AND 0.9"""
        .stripMargin,

    // mirrors Multimodal.dedupExactMedia: min-id survivor per distinct
    // payload bytes (digest equality ⟺ byte equality within each engine)
    "q77_media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST('MEDIA:' || CAST(doc_id % 137 AS VARCHAR) AS BLOB)
        |      AS payload
        |  FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM m GROUP BY payload)
        |SELECT m.doc_id, CAST(octet_length(m.payload) AS BIGINT) AS n_bytes,
        |  CAST(m.payload AS VARCHAR) AS payload_str
        |FROM m WHERE m.doc_id IN (SELECT doc_id FROM keep)""".stripMargin,

    // q75 streams the SAME incoming set through per-micro-batch
    // dedupIncrement; cross-side-only candidate generation makes the
    // batched union equal the single shot, so the oracle is q72's
    "q75_stream_neardup_increment" ->
      s"""WITH existing AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         |inc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         |inp AS (
         |  SELECT i.doc_id, i.text FROM inc i
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text))),
         |docs0 AS (
         |  SELECT doc_id, text FROM existing
         |  UNION ALL SELECT doc_id, text FROM inp),
         |${minhashChainSql("docs0")},
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
         |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // mirrors dedupStreamAgainst over the landed sample's digests: the
    // settled streaming output is the content-level anti-join (digest
    // equality ⟺ text equality, evaluated within each engine). NOT EXISTS
    // rather than NOT IN: a NULL text would make NOT IN unknown and drop
    // the row while the left-anti join keeps it (q72's convention)
    "q73_stream_increment" ->
      """SELECT d.doc_id, d.lang FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents x
        |  WHERE x.doc_id % 7 = 0 AND md5(x.text) = md5(d.text))""".stripMargin,

    // mirrors Sampling.capPerGroupWeighted(source, n_tokens, 800): keep
    // rows while the running token sum BEFORE the row is under budget
    // (identical md5-bucket ordering; integer weights sum exactly in
    // doubles, so the < comparison is engine-exact)
    "q74_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
         |      AS INTEGER) AS n_tokens,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS bkt
         |  FROM documents)
         |SELECT doc_id, source, n_tokens FROM t
         |QUALIFY SUM(CAST(n_tokens AS DOUBLE)) OVER (
         |    PARTITION BY source ORDER BY bkt, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  - n_tokens < 800""".stripMargin,

    // mirrors TextAnalysis.boilerplateSignals(n=3, minDocs=5): document
    // frequency of per-doc-DISTINCT 3-grams (Spark groups by the 8-byte
    // shingle hash, DuckDB by the gram text — identical counts, q54's
    // convention)
    "q79_boilerplate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' ')))) AS s
        |  FROM tk),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_common,
        |  round(CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS common_fraction
        |FROM sh JOIN df USING (s)
        |GROUP BY doc_id""".stripMargin,

    // mirrors Packing.chunkText(32, 24): window starts step the token
    // index by the stride; both engines slice the same 1-based token
    // array, trailing windows shorter than the chunk
    "q80_chunk_text" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk)-1, 0)+1, 24)) AS s
        |  FROM tk)
        |SELECT doc_id, CAST(s // 24 AS INTEGER) AS chunk_idx,
        |  array_to_string(tk[s+1:s+32], ' ') AS chunk_text,
        |  CAST(least(32, len(tk)-s) AS INTEGER) AS n_tokens
        |FROM st""".stripMargin,

    // mirrors Dedup.chunkNovelty(16) over documents ∪ the synthesized
    // 40-token-prefix copies: first-seen is the min doc_id per chunk
    // digest (digest equality ⟺ text equality within each engine)
    "q81_chunk_novelty" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |    array_to_string(
        |      string_split_regex(trim(lower(text)), '\s+')[1:40], ' ')
        |      AS text
        |  FROM documents WHERE doc_id % 6 = 0),
        |tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM base),
        |st AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, greatest(len(tk)-1, 0)+1, 16)) AS s
        |  FROM tk),
        |c AS (
        |  SELECT doc_id, md5(array_to_string(tk[s+1:s+16], ' ')) AS dig
        |  FROM st),
        |fs AS (SELECT dig, min(doc_id) AS first FROM c GROUP BY dig)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN first < doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_seen_chunks,
        |  round(1.0 - CAST(sum(CASE WHEN first < doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS novel_fraction
        |FROM c JOIN fs USING (dig)
        |GROUP BY doc_id""".stripMargin,

    // mirrors Dedup.crossSourceDupMatrix over documents ∪ the synthesized
    // re-sourced copies: per-(digest, source) counts first, then the pair
    // product per unordered source pair
    "q82_cross_source_dups" ->
      """WITH base AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text,
        |    'src' || CAST(doc_id % 3 AS VARCHAR) AS source
        |  FROM documents WHERE doc_id % 5 = 0),
        |c AS (
        |  SELECT md5(text) AS dig, source, count(*) AS n
        |  FROM base GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(sum(a.n * b.n) AS BIGINT) AS n_dup_pairs
        |FROM c a JOIN c b ON a.dig = b.dig AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // q83 streams the corpus through the per-micro-batch prepared-
    // benchmark filter; statelessness makes the batched union equal the
    // single shot, so the oracle is the batch decontamination: survivors
    // of q71's overlap predicate (NOT EXISTS — n>=1 ⟺ any shared shingle)
    "q83_stream_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bench AS (
        |  SELECT array_to_string(tk[2:13], ' ') AS qt FROM tk
        |  WHERE doc_id % 25 = 0),
        |btk AS (
        |  SELECT string_split_regex(trim(lower(qt)), '\s+') AS tk
        |  FROM bench),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' ')))) AS s
        |  FROM btk),
        |csh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' ')))) AS s
        |  FROM tk)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM csh c JOIN bsh b USING (s)
        |  WHERE c.doc_id = d.doc_id)""".stripMargin,

    // mirrors TextAnalysis.normalizeText with the injected decomposed
    // suffix (chr(769)=U+0301 combining acute, chr(776)=U+0308 combining
    // diaeresis, chr(9)=tab): both engines NFC-recompose, lowercase,
    // collapse whitespace — digests match byte-for-byte
    "q84_normalize_text" ->
      """WITH messy AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 9 = 0 THEN
        |      '  Cafe' || chr(769) || '   nai' || chr(776) || 've ' ||
        |      chr(9) || 'E' || chr(769) || 'cole '
        |    ELSE '' END AS text
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(lower(nfc_normalize(text))), '\s+', ' ',
        |      'g') AS nt
        |  FROM messy)
        |SELECT doc_id, md5(nt) AS norm_digest,
        |  CAST(length(nt) AS INTEGER) AS n_chars_norm
        |FROM norm""".stripMargin,

    // mirrors TextAnalysis.topTermsPerGroup(lang, 10): counts group
    // map-side in Spark, rank ties break on the token in both engines
    "q85_top_terms" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2)
        |SELECT lang, token, n,
        |  CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS rank
        |FROM c
        |QUALIFY rank <= 10""".stripMargin,

    // mirrors Dedup.ngramContainmentPairs(3, 0.6) over the subset ∪ the
    // synthesized 12-token quotes: containment = inter / min(|A|, |B|)
    "q86_containment" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 3
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id,
        |    array_to_string(
        |      string_split_regex(trim(lower(text)), '\s+')[1:12], ' ')
        |      AS text
        |  FROM documents WHERE doc_id % 10 < 3 AND doc_id % 30 = 1),
        |toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM base),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-3, 0)+1),
        |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
        |  FROM toks),
        |inv AS (SELECT doc_id, len(shl) AS n, unnest(shl) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a,
        |    b.n AS n_b, count(*) AS inter
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  round(CAST(inter AS DOUBLE) / least(n_a, n_b), 6) AS containment
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE) / least(n_a, n_b) >= 0.6""".stripMargin,

    // mirrors the q87 bucketed join: the join is 1:1 on doc_id, so the
    // aggregate reads straight off documents
    "q87_bucketed_join" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars % 7) AS BIGINT) AS sum_score
        |FROM documents GROUP BY lang""".stripMargin,

    // mirrors the q88 sorted export read-back: layout changes the files,
    // never the rows
    "q88_sorted_export" ->
      """SELECT lang, count(*) AS n FROM documents
        |WHERE n_chars BETWEEN 100 AND 300 GROUP BY lang""".stripMargin,

    // mirrors q105: the same greedy chained-min construction — every ts
    // compared at microsecond precision (CAST truncates the ns parquet
    // type exactly like the Spark loader)
    // mirrors q177: q105's greedy funnel chain, floored whole-second
    // latency for completers, q101's type-1 histogram quantiles
    "q177_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id),
        |lat AS (
        |  SELECT CAST(floor(CAST(epoch_us(t3) - epoch_us(s1.t1)
        |    AS DOUBLE) / 1000000) AS BIGINT) AS latency_s
        |  FROM s3 JOIN s1 USING (user_id)),
        |h AS (SELECT latency_s, count(*) AS c FROM lat GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
        |cum AS (
        |  SELECT latency_s, n, sum(c) OVER (ORDER BY latency_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h CROSS JOIN t)
        |SELECT p, min(latency_s) AS latency_s,
        |  CAST(min(n) AS BIGINT) AS n_users
        |FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS p)
        |WHERE cm >= ceil(p * n) GROUP BY p""".stripMargin,

    // mirrors q160: q105's greedy funnel chain, n_completed histogram,
    // reached = Σ c over n_completed >= step, rates as exact quotients
    "q160_conversion_curve" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id),
        |f AS (
        |  SELECT CASE WHEN t3 IS NOT NULL THEN 3
        |              WHEN t2 IS NOT NULL THEN 2
        |              ELSE 1 END AS n_completed
        |  FROM s1
        |  LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s2.user_id = s3.user_id),
        |h AS (SELECT n_completed, CAST(count(*) AS BIGINT) AS c
        |  FROM f GROUP BY 1),
        |st AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS step,
        |  unnest(['view', 'click', 'purchase']) AS step_name),
        |r AS (
        |  SELECT st.step, st.step_name,
        |    CAST(coalesce(sum(h.c), 0) AS BIGINT) AS n_users
        |  FROM st LEFT JOIN h ON h.n_completed >= st.step
        |  GROUP BY 1, 2),
        |x AS (SELECT step, step_name, n_users,
        |  max(CASE WHEN step = 1 THEN n_users END) OVER () AS n1,
        |  lag(n_users) OVER (ORDER BY step) AS prev FROM r)
        |SELECT step, step_name, n_users,
        |  CASE WHEN n1 = 0 THEN NULL
        |    ELSE round(CAST(n_users AS DOUBLE) / n1, 6) END
        |    AS rate_vs_first,
        |  CASE WHEN prev IS NULL OR prev = 0 THEN NULL
        |    ELSE round(CAST(n_users AS DOUBLE) / prev, 6) END
        |    AS rate_vs_prev
        |FROM x""".stripMargin,

    "q105_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT s1.user_id,
        |  CAST(epoch_ms(t1) AS BIGINT) AS t_view,
        |  CAST(epoch_ms(t2) AS BIGINT) AS t_click,
        |  CAST(epoch_ms(t3) AS BIGINT) AS t_purchase,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            ELSE 1 END AS INTEGER) AS n_completed
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s2.user_id = s3.user_id""".stripMargin,

    // mirrors q108: feature-hash vectors (q107's buckets as a dense
    // 64-dim list), then q65's LSH/cosine/transitive-closure chain over
    // them — same planes, same candidate set, same survivor rule
    "q108_text_vector_dedup" ->
      s"""WITH RECURSIVE tk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |${lshSigsSqlOver(
        s"""SELECT doc_id AS vec_id,
           |    list_transform(range(0, 64), dd -> CAST(
           |      len(list_filter(tk, tt ->
           |        CAST(${PortableHash.sqlHash60("tt")} % 64 AS INTEGER)
           |          = dd)) AS DOUBLE)) AS embedding
           |  FROM tk""".stripMargin, tables = 2, bits = 16, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b
         |    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("va.embedding", "vb.embedding")}
         |    AS cosine
         |  FROM cand
         |  JOIN v va ON va.vec_id = id_a
         |  JOIN v vb ON vb.vec_id = id_b),
         |pairs AS (SELECT id_a, id_b FROM scored WHERE cosine >= 0.95),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src)
         |SELECT vv.vec_id AS doc_id FROM v vv
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c
         |  WHERE c.id = vv.vec_id AND c.component <> vv.vec_id)""".stripMargin,

    // mirrors q109: distinct (type, md5-60(user)) pairs, k smallest per
    // type, the classic (k-1)*2^60/kth KMV estimator — every step a pure
    // function of the data, so the ESTIMATE itself hash-matches.
    // (k-1)*2^60 is exact in a double (1023 < 2^53, 2^60 a power of two),
    // then a single division — identical IEEE bits both engines
    "q109_kmv_distinct" -> kmvOracleSql,

    // mirrors q114: the ORACLE is q109's whole-table computation — the
    // gate's merge-of-half-sketches must land the identical estimate,
    // pinning sketch mergeability cross-engine
    "q114_kmv_merge" -> kmvOracleSql,

    // q229 streams the SAME computation (KmvAgg state merges across
    // micro-batches; a pure set function) — q109's oracle again
    "q229_stream_distinct" -> kmvOracleSql,

    // mirrors q117: q64's pair graph and closure, survivor = argmax
    // (n_chars, min id) within each component; unpaired docs survive
    "q117_best_survivor" ->
      s"""WITH RECURSIVE docs0 AS (
         |  SELECT doc_id, text, lang, n_chars FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src),
         |best AS (
         |  SELECT id FROM (
         |    SELECT c.id,
         |      row_number() OVER (PARTITION BY c.component
         |        ORDER BY d.n_chars DESC, c.id) AS rk
         |    FROM comp c JOIN docs0 d ON d.doc_id = c.id)
         |  WHERE rk = 1)
         |SELECT d.doc_id, d.lang, d.n_chars FROM docs0 d
         |WHERE NOT EXISTS (SELECT 1 FROM comp c WHERE c.id = d.doc_id)
         |   OR EXISTS (SELECT 1 FROM best b WHERE b.id = d.doc_id)"""
        .stripMargin,

    // mirrors Sampling.weightedSample(doc_id, n_chars, 400): inclusion
    // iff hash bucket < floor(min-capped probability * 1e6). floor (not a
    // bare cast) because double->int CASTs truncate in Spark but round in
    // DuckDB; the arithmetic itself is IEEE-identical
    "q118_weighted_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")}
         |    % 1000000
         |  < LEAST(1000000, CAST(floor(
         |      CAST(n_chars AS DOUBLE) / 400.0 * 1000000) AS BIGINT))"""
        .stripMargin,

    // mirrors q131: baskets = distinct (user, type); both directions of
    // each unordered pair; metrics are left-assoc quotients of BIGINTs
    "q131_association_rules" ->
      """WITH it AS (
        |  SELECT DISTINCT user_id AS u, event_type AS item FROM events),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM it
        |  GROUP BY 1),
        |nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu FROM it),
        |pc AS (
        |  SELECT a.item AS ia, b.item AS ib,
        |    CAST(count(*) AS BIGINT) AS pair_users
        |  FROM it a JOIN it b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (
        |  SELECT ia AS antecedent, ib AS consequent, pair_users FROM pc
        |  UNION ALL
        |  SELECT ib, ia, pair_users FROM pc)
        |SELECT r.antecedent, r.consequent, r.pair_users,
        |  ca.n AS n_antecedent, cc.n AS n_consequent,
        |  round(CAST(r.pair_users AS DOUBLE) / nu.nu, 6) AS support,
        |  round(CAST(r.pair_users AS DOUBLE) / ca.n, 6) AS confidence,
        |  round(CAST(r.pair_users AS DOUBLE) * nu.nu / ca.n / cc.n, 6)
        |    AS lift
        |FROM r JOIN ic ca ON ca.item = r.antecedent
        |  JOIN ic cc ON cc.item = r.consequent CROSS JOIN nu""".stripMargin,

    // mirrors q132: same feature trio, exact BIGINT moments, identical
    // double association (n·Σxy − Σx·Σy) / (√v_x · √v_y), null on zero
    // variance
    "q132_feature_corr" ->
      """WITH f AS (
        |  SELECT n_chars AS c,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS t,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        |      AS BIGINT) AS p
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c*c) AS BIGINT) AS qc,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(t*t) AS BIGINT) AS qt,
        |    CAST(sum(p) AS BIGINT) AS sp, CAST(sum(p*p) AS BIGINT) AS qp,
        |    CAST(sum(c*t) AS BIGINT) AS pct,
        |    CAST(sum(c*p) AS BIGINT) AS pcp,
        |    CAST(sum(t*p) AS BIGINT) AS ptp
        |  FROM f),
        |v AS (
        |  SELECT *,
        |    CAST(n AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc AS vc,
        |    CAST(n AS DOUBLE) * qt - CAST(st AS DOUBLE) * st AS vt,
        |    CAST(n AS DOUBLE) * qp - CAST(sp AS DOUBLE) * sp AS vp
        |  FROM m)
        |SELECT 'n_chars' AS x, 'n_tokens' AS y, n,
        |  CASE WHEN vc <= 0 OR vt <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * pct - CAST(sc AS DOUBLE) * st) /
        |      (sqrt(vc) * sqrt(vt)), 6) END AS r FROM v
        |UNION ALL
        |SELECT 'n_chars', 'n_punct', n,
        |  CASE WHEN vc <= 0 OR vp <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * pcp - CAST(sc AS DOUBLE) * sp) /
        |      (sqrt(vc) * sqrt(vp)), 6) END FROM v
        |UNION ALL
        |SELECT 'n_tokens', 'n_punct', n,
        |  CASE WHEN vt <= 0 OR vp <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * ptp - CAST(st AS DOUBLE) * sp) /
        |      (sqrt(vt) * sqrt(vp)), 6) END FROM v""".stripMargin,

    // mirrors q148: ascending (size, source) rank, exact Σi·x, the
    // same double formula tree
    "q148_source_gini" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS x
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM s),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS BIGINT) AS tot,
        |    CAST(sum(i * x) AS BIGINT) AS ix
        |  FROM r)
        |SELECT k AS n_groups, tot AS total_rows,
        |  round(2.0 * ix / (CAST(k AS DOUBLE) * tot)
        |    - CAST(k + 1 AS DOUBLE) / k, 6) AS gini
        |FROM a""".stripMargin,

    // mirrors q147: q66's split labeling, then cell counts + three
    // re-aggregated totals and the share quotients
    "q147_split_balance" ->
      s"""WITH h AS (
         |  SELECT lang,
         |    CASE WHEN ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")}
         |        % 1000000 < 800000 THEN 'train'
         |      WHEN ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")}
         |        % 1000000 < 900000 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM documents WHERE lang IS NOT NULL),
         |c AS (SELECT split, lang, CAST(count(*) AS BIGINT) AS n
         |  FROM h GROUP BY 1, 2),
         |s AS (SELECT split, CAST(sum(n) AS BIGINT) AS ns
         |  FROM c GROUP BY 1),
         |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nt
         |  FROM c GROUP BY 1),
         |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c)
         |SELECT c.split, c.lang, c.n,
         |  round(CAST(c.n AS DOUBLE) / s.ns, 6) AS share_in_split,
         |  round(CAST(t.nt AS DOUBLE) / g.nn, 6) AS share_overall,
         |  round(CAST(c.n AS DOUBLE) / s.ns
         |    - CAST(t.nt AS DOUBLE) / g.nn, 6) AS deviation
         |FROM c JOIN s USING (split) JOIN t USING (lang)
         |  CROSS JOIN g""".stripMargin,

    // mirrors q146: q116's quantile form with weight sums for counts
    "q146_weighted_quantiles" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS w
        |  FROM documents),
        |f AS (SELECT * FROM d WHERE w IS NOT NULL AND w > 0),
        |hist AS (
        |  SELECT lang, n_chars, CAST(sum(w) AS BIGINT) AS c
        |  FROM f GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(sum(w) AS BIGINT) AS n FROM f
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.5, 0.9]) AS p)
        |SELECT cum.lang, ps.p, min(cum.n_chars) AS quantile, tot.n AS w
        |FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY cum.lang, ps.p, tot.n""".stripMargin,

    // mirrors q145: same keep-class regex counts, BIGINT sums, one
    // quotient per ratio
    "q145_charset_profile" ->
      """WITH a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    CAST(sum(length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')))
        |      AS BIGINT) AS n_ascii,
        |    CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))
        |      AS BIGINT) AS n_digit,
        |    CAST(sum(length(text) - length(replace(text, ' ', '')))
        |      AS BIGINT) AS n_space
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL GROUP BY 1)
        |SELECT lang, n_docs, n_chars,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_ascii AS DOUBLE) / n_chars, 6) END
        |    AS ascii_ratio,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_digit AS DOUBLE) / n_chars, 6) END
        |    AS digit_ratio,
        |  CASE WHEN n_chars = 0 THEN NULL
        |    ELSE round(CAST(n_space AS DOUBLE) / n_chars, 6) END
        |    AS space_ratio
        |FROM a""".stripMargin,

    // mirrors q144: lag+cumsum sessionize, floor'd whole-second
    // durations, the type-1 ceil(p*n) quantile rule on the histogram
    "q144_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    event_id FROM events),
        |l AS (
        |  SELECT user_id, tsu, event_id,
        |    CASE WHEN lag(tsu) OVER w IS NULL THEN 1
        |         WHEN tsu - lag(tsu) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT user_id, tsu,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS session_id
        |  FROM l),
        |g AS (
        |  SELECT user_id, session_id,
        |    CAST(floor((max(tsu) - min(tsu)) / 1000000) AS BIGINT)
        |      AS duration_s
        |  FROM s GROUP BY 1, 2),
        |hist AS (SELECT duration_s, count(*) AS c FROM g GROUP BY 1),
        |cum AS (SELECT duration_s,
        |  sum(c) OVER (ORDER BY duration_s) AS cm FROM hist),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
        |ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
        |SELECT ps.p, min(cum.duration_s) AS duration_s,
        |  tot.n AS n_sessions
        |FROM cum CROSS JOIN tot CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY ps.p, tot.n""".stripMargin,

    // mirrors q143: same fixture injection and tokenizer, full-outer
    // vocab join with the frontier filter
    "q143_vocab_drift" ->
      """WITH o AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' zzzlegacy'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL),
        |n AS (
        |  SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' zzznovel'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        |co AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM o),
        |cn AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM n),
        |go AS (SELECT term, CAST(count(*) AS BIGINT) AS n_old
        |  FROM co GROUP BY 1),
        |gn AS (SELECT term, CAST(count(*) AS BIGINT) AS n_new
        |  FROM cn GROUP BY 1)
        |SELECT coalesce(go.term, gn.term) AS term,
        |  coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
        |  CASE WHEN coalesce(n_old, 0) = 0 THEN 'appeared'
        |    ELSE 'vanished' END AS status
        |FROM go FULL OUTER JOIN gn USING (term)
        |WHERE (coalesce(n_old, 0) = 0 AND coalesce(n_new, 0) >= 2)
        |   OR (coalesce(n_new, 0) = 0 AND coalesce(n_old, 0) >= 2)"""
        .stripMargin,

    // mirrors q142: shared tokenizer, exact BIGINT count quotients
    "q142_vocab_concentration" ->
      """WITH tk AS (
        |  SELECT source AS g,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (SELECT g, term, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c * (c - 1)) AS BIGINT) AS rep FROM c GROUP BY 1)
        |SELECT g AS source, n_tokens, n_types,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  CASE WHEN n_tokens < 2 THEN NULL
        |    ELSE round(CAST(rep AS DOUBLE) /
        |      (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6)
        |  END AS simpson
        |FROM a""".stripMargin,

    // mirrors q153: per-row norm via the q23 list_sum element-order
    // fold (coalesce(…, 0.0) matches aggregate's 0.0 seed on empties);
    // min/max/counts are exact over identical doubles
    "q153_norm_stats" ->
      """WITH e AS (
        |  SELECT label, embedding,
        |    CASE WHEN embedding IS NULL THEN NULL ELSE
        |      sqrt(coalesce(list_sum(list_transform(
        |        range(1, len(embedding) + 1),
        |        i -> CAST(embedding[i] AS DOUBLE)
        |          * CAST(embedding[i] AS DOUBLE))), 0.0))
        |    END AS nrm
        |  FROM embeddings WHERE label IS NOT NULL)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN embedding IS NULL THEN 1 END) AS BIGINT)
        |    AS n_null,
        |  CAST(count(CASE WHEN nrm = 0.0 THEN 1 END) AS BIGINT) AS n_zero,
        |  CAST(min(CASE WHEN embedding IS NOT NULL
        |    THEN len(embedding) END) AS INTEGER) AS dims_min,
        |  CAST(max(CASE WHEN embedding IS NOT NULL
        |    THEN len(embedding) END) AS INTEGER) AS dims_max,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm
        |FROM e GROUP BY label""".stripMargin,

    // mirrors q176: one UNION ALL branch per profiled column
    "q176_column_profile" -> {
      val branch = (c: String) =>
        s"""SELECT '$c' AS column, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CASE WHEN count(*) = 0 THEN NULL
           |    ELSE round(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0
           |      END) AS DOUBLE) / count(*), 6) END AS null_rate
           |FROM documents""".stripMargin
      Seq("doc_id", "lang", "source", "n_chars").map(branch)
        .mkString("", "\nUNION ALL\n", "")
    },

    // mirrors q156: distinct keys per side (same mangle fixture), one
    // full join, conditional counts
    "q156_key_reconcile" ->
      """WITH l AS (
        |  SELECT DISTINCT doc_id AS k FROM documents
        |  WHERE doc_id IS NOT NULL),
        |r0 AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0
        |  UNION ALL
        |  SELECT vec_id + 900000 FROM embeddings WHERE vec_id % 25 = 0),
        |r AS (SELECT DISTINCT vec_id AS k FROM r0 WHERE vec_id IS NOT NULL),
        |j AS (SELECT l.k AS lk, r.k AS rk
        |  FROM l FULL JOIN r ON l.k = r.k)
        |SELECT CAST(count(lk) AS BIGINT) AS n_left_keys,
        |  CAST(count(rk) AS BIGINT) AS n_right_keys,
        |  CAST(count(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
        |    THEN 1 END) AS BIGINT) AS n_shared,
        |  CAST(count(CASE WHEN rk IS NULL THEN 1 END) AS BIGINT)
        |    AS n_left_only,
        |  CAST(count(CASE WHEN lk IS NULL THEN 1 END) AS BIGINT)
        |    AS n_right_only
        |FROM j""".stripMargin,

    // mirrors q155: observed-day counts, trailing 7-row window, single
    // IEEE quotients; first day's pct_change is null
    "q155_rolling_volume" ->
      """WITH d AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
        |SELECT day, n,
        |  CAST(count(*) OVER w AS BIGINT) AS win_days,
        |  CAST(sum(n) OVER w AS BIGINT) AS win_total,
        |  round(CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w, 6)
        |    AS win_avg,
        |  CASE WHEN lag(n) OVER (ORDER BY day) IS NULL THEN NULL
        |    ELSE round((CAST(n AS DOUBLE) - lag(n) OVER (ORDER BY day))
        |      / lag(n) OVER (ORDER BY day), 6)
        |  END AS pct_change
        |FROM d
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |""".stripMargin,

    // mirrors q152: per-type day counts, exact BIGINT moments, the q138
    // variance tree divided by the unrounded mean; k=1 nulls out
    "q152_burstiness" ->
      """WITH d AS (
        |  SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS k_days,
        |    CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM d GROUP BY 1)
        |SELECT event_type, k_days, total,
        |  round(CAST(total AS DOUBLE) / k_days, 6) AS mean,
        |  CASE WHEN k_days = 1 THEN NULL
        |    ELSE round(((CAST(s2 AS DOUBLE)
        |      - CAST(total AS DOUBLE) * total / k_days) / (k_days - 1))
        |      / (CAST(total AS DOUBLE) / k_days), 6)
        |  END AS fano,
        |  CASE WHEN k_days = 1 THEN NULL
        |    ELSE round(sqrt((CAST(s2 AS DOUBLE)
        |      - CAST(total AS DOUBLE) * total / k_days) / (k_days - 1))
        |      / (CAST(total AS DOUBLE) / k_days), 6)
        |  END AS cv
        |FROM m""".stripMargin,

    // mirrors q141: q138's z tree per event type's own day history
    "q141_anomaly_per_type" ->
      """WITH d AS (
        |  SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS s1,
        |  CAST(sum(n * n) AS BIGINT) AS s2 FROM d GROUP BY 1)
        |SELECT d.event_type, day, n,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE round((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1)), 6) END AS z,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE abs((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1))) >= 2.0 END AS is_burst
        |FROM d JOIN m USING (event_type)""".stripMargin,

    // mirrors q140: q25's score/pick conventions + a 5-element DESC
    // sort for the margin (INT both sides)
    "q140_langid_margin" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      val arr = TextAnalysis.stopwords.map { case (lang, _) => s"s_$lang" }
        .mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |sc AS (SELECT doc_id, $scores FROM t),
         |b AS (SELECT *, greatest($arr) AS best FROM sc)
         |SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang_pred,
         |  CAST(list_sort([$arr], 'DESC')[1]
         |    - list_sort([$arr], 'DESC')[2] AS INTEGER) AS margin
         |FROM b""".stripMargin
    },

    // mirrors q139: same cells, rank by (count desc, lang), INT window
    // count cast to BIGINT
    "q139_func_dependency" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, n,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n DESC, lang) AS rk,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_rows,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
        |      AS n_distinct_b
        |  FROM c)
        |SELECT source, n_rows, n_distinct_b, lang AS dominant_b,
        |  n AS dominant_n,
        |  round(CAST(n AS DOUBLE) / n_rows, 6) AS dominant_frac,
        |  n_distinct_b = 1 AS is_functional
        |FROM r WHERE rk = 1""".stripMargin,

    // mirrors q138: q99's z tree over the day-count frame; the flag
    // compares the unrounded z; one day or zero variance -> nulls
    "q138_daily_anomaly" ->
      """WITH d AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS s1,
        |  CAST(sum(n * n) AS BIGINT) AS s2 FROM d)
        |SELECT day, n,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE round((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1)), 6) END AS z,
        |  CASE WHEN k = 1 OR (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) <= 0 THEN NULL
        |    ELSE abs((n - CAST(s1 AS DOUBLE) / k) /
        |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
        |        / (k - 1))) >= 2.0 END AS is_burst
        |FROM d, m""".stripMargin,

    // mirrors q137: q121's floor(x*1024) codes, per-(label, dim) BIGINT
    // sums, dot/norms exact, one identical double cosine at the end
    "q137_label_centroids" ->
      """WITH q AS (
        |  SELECT label,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (
        |  SELECT label, i, xq[i] AS x
        |  FROM q, unnest(generate_series(1, len(xq))) AS u(i)),
        |s AS (
        |  SELECT label, i, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2),
        |d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(sum(a.s * b.s) AS BIGINT) AS dot
        |  FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2),
        |nr AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS nrm
        |  FROM s GROUP BY 1)
        |SELECT d.label_a, d.label_b,
        |  CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN NULL
        |    ELSE round(CAST(d.dot AS DOUBLE) /
        |      (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
        |      6) END AS cosine
        |FROM d JOIN nr na ON na.label = d.label_a
        |       JOIN nr nb ON nb.label = d.label_b""".stripMargin,

    // mirrors q136: same fixed-bin floor arithmetic (integer operands
    // through one double division), q130's expected/contrib convention
    "q136_numeric_drift" ->
      """WITH o AS (
        |  SELECT CAST(CASE WHEN n_chars < 0 THEN -1
        |      WHEN n_chars >= 500 THEN 10
        |      ELSE floor((n_chars - 0) * 10 / 500) END AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_old
        |  FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY 1),
        |nw AS (
        |  SELECT CAST(CASE WHEN n_chars < 0 THEN -1
        |      WHEN n_chars >= 500 THEN 10
        |      ELSE floor((n_chars - 0) * 10 / 500) END AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_new
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL GROUP BY 1),
        |t AS (
        |  SELECT (SELECT CAST(sum(n_old) AS BIGINT) FROM o) AS tot_o,
        |         (SELECT CAST(sum(n_new) AS BIGINT) FROM nw) AS tot_n)
        |SELECT coalesce(o.bin, nw.bin) AS bin,
        |  coalesce(o.n_old, 0) AS n_old, coalesce(nw.n_new, 0) AS n_new,
        |  round(CAST(coalesce(o.n_old, 0) AS DOUBLE) * t.tot_n / t.tot_o,
        |    6) AS expected_new,
        |  round(CASE WHEN coalesce(o.n_old, 0) > 0 THEN
        |    (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    * (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    / (CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o) END, 6)
        |    AS chisq
        |FROM o FULL OUTER JOIN nw USING (bin), t""".stripMargin,

    // mirrors q135: percent rank from the per-(source, score) histogram
    // ((cum − own)/(n−1), single-row group → 0.0), global lookup =
    // smallest score with cumulative count >= ceil(p·N)
    "q135_quantile_norm" ->
      """WITH b AS (
        |  SELECT source AS g, n_chars AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |pr AS (
        |  SELECT h.g, h.v,
        |    CASE WHEN t.n = 1 THEN 0.0
        |      ELSE CAST(sum(h.c) OVER (PARTITION BY h.g ORDER BY h.v)
        |        - h.c AS DOUBLE) / (t.n - 1) END AS p
        |  FROM h JOIN t USING (g)),
        |gh AS (SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY 1),
        |gc AS (SELECT v AS gv,
        |  CAST(sum(gc) OVER (ORDER BY v) AS BIGINT) AS gcum,
        |  (SELECT CAST(sum(gc) AS BIGINT) FROM gh) AS gn FROM gh),
        |map AS (
        |  SELECT pr.g, pr.v, min(gc.gv) AS qn
        |  FROM pr JOIN gc
        |    ON gc.gcum >= CAST(ceil(pr.p * gc.gn) AS BIGINT)
        |  GROUP BY 1, 2)
        |SELECT d.doc_id, d.source, d.n_chars, map.qn AS n_chars_qn
        |FROM documents d LEFT JOIN map
        |  ON map.g = d.source AND map.v = d.n_chars""".stripMargin,

    // mirrors q134: same md5-60 bucket arithmetic per (row, token), min
    // over the four counters with absent cells as zero
    "q134_cms_counts" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
         |    AS it FROM documents),
         |rws AS (SELECT unnest([0, 1, 2, 3]) AS rw),
         |cms AS (
         |  SELECT rw,
         |    ${PortableHash.sqlHash60(
                 "'cms_' || CAST(rw AS VARCHAR) || '_' || it")} % 16
         |      AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks, rws GROUP BY 1, 2),
         |q AS (SELECT DISTINCT it FROM toks
         |  WHERE ${PortableHash.sqlHash60("it")} % 7 = 0),
         |qe AS (
         |  SELECT q.it, rws.rw,
         |    ${PortableHash.sqlHash60(
                 "'cms_' || CAST(rws.rw AS VARCHAR) || '_' || q.it")} % 16
         |      AS bucket
         |  FROM q, rws),
         |est AS (
         |  SELECT qe.it, CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS est
         |  FROM qe LEFT JOIN cms USING (rw, bucket) GROUP BY 1),
         |ex AS (SELECT it, CAST(count(*) AS BIGINT) AS exact
         |  FROM toks GROUP BY 1)
         |SELECT est.it AS token, est.est, ex.exact
         |FROM est JOIN ex USING (it)""".stripMargin,

    // mirrors q133: identical expected-count tree per cell and the SAME
    // sorted-fold summation order (list_reduce over list_sort; the
    // init-less fold equals Spark's 0.0-init fold — +0.0 + x == x)
    "q133_contingency" ->
      """WITH base AS (
        |  SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS obs
        |  FROM base GROUP BY 1, 2),
        |at AS (SELECT a, CAST(sum(obs) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1),
        |bt AS (SELECT b, CAST(sum(obs) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |j AS (
        |  SELECT c.a, c.b, nt.n,
        |    (CAST(nt.n AS DOUBLE) * (CAST(c.obs AS DOUBLE) * CAST(c.obs AS DOUBLE)))
        |      / (CAST(ra AS DOUBLE) * cb) AS contrib
        |  FROM cells c JOIN at USING (a) JOIN bt USING (b) CROSS JOIN nt),
        |f AS (
        |  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT b) AS BIGINT) AS kb,
        |    list_reduce(list_transform(
        |      list_sort(list({'a': a, 'b': b, 'c': contrib})), s -> s.c),
        |      (x, y) -> x + y) AS fold
        |  FROM j)
        |SELECT n, n_cells, (ka - 1) * (kb - 1) AS dof,
        |  round(fold - n, 6) AS chi2,
        |  CASE WHEN (ka - 1) * (kb - 1) = 0 THEN NULL
        |    ELSE round(sqrt(greatest(fold - n, 0.0) /
        |      (CAST(n AS DOUBLE) * least(ka - 1, kb - 1))), 6)
        |  END AS v
        |FROM f""".stripMargin,

    // mirrors q161: q158's prediction chain, cells + both marginals
    "q161_confusion_matrix" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (
         |  SELECT lang,
         |    string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents WHERE lang IS NOT NULL),
         |sc AS (SELECT lang, $scores FROM t),
         |pr AS (SELECT lang,
         |  greatest(s_en, s_de, s_es, s_fr, s_zh) AS best,
         |  s_en, s_de, s_es, s_fr, s_zh FROM sc),
         |base AS (SELECT CAST(lang AS VARCHAR) AS actual,
         |  CASE $pickCases ELSE 'und' END AS predicted FROM pr),
         |cells AS (
         |  SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
         |  FROM base GROUP BY 1, 2),
         |at AS (SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual
         |  FROM cells GROUP BY 1),
         |pt AS (SELECT predicted, CAST(sum(n) AS BIGINT) AS n_predicted
         |  FROM cells GROUP BY 1)
         |SELECT c.actual, c.predicted, c.n, at.n_actual, pt.n_predicted,
         |  round(CAST(c.n AS DOUBLE) / at.n_actual, 6) AS recall,
         |  round(CAST(c.n AS DOUBLE) / pt.n_predicted, 6) AS precision
         |FROM cells c JOIN at USING (actual)
         |JOIN pt USING (predicted)""".stripMargin
    },

    // mirrors q162: per-lang doc/token sums, shares, cumulative in
    // (token mass desc, lang) order
    "q162_mixture_report" ->
      """WITH g AS (
        |  SELECT lang,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
        |  CAST(sum(n_tokens) AS BIGINT) AS tt FROM g),
        |c AS (SELECT lang, n_docs, n_tokens,
        |  CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM g)
        |SELECT lang, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / td, 6) AS doc_share,
        |  round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
        |  round(CAST(cum AS DOUBLE) / tt, 6) AS cum_token_share
        |FROM c CROSS JOIN t""".stripMargin,

    // mirrors q174: type-1 decile thresholds from the cumulated score
    // histogram, bucket = 1 + count of thresholds strictly below
    "q174_score_buckets" ->
      """WITH d AS (
        |  SELECT n_chars AS s,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS m
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT s, count(*) AS c FROM d GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |cum AS (
        |  SELECT s, n, sum(c) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h CROSS JOIN t),
        |th AS (
        |  SELECT p, min(s) AS q
        |  FROM cum CROSS JOIN (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5,
        |    0.6, 0.7, 0.8, 0.9]) AS p)
        |  WHERE cm >= ceil(p * n) GROUP BY p),
        |b AS (
        |  SELECT d.s, d.m,
        |    1 + (SELECT CAST(count(*) AS INTEGER) FROM th
        |         WHERE d.s > th.q) AS bucket
        |  FROM d)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(s) AS score_min, max(s) AS score_max,
        |  round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mean_stat
        |FROM b GROUP BY bucket""".stripMargin,

    // mirrors q173: q101's type-1 rule twice, the median frame joined
    // back for the deviation histogram
    "q173_mad_per_group" ->
      """WITH d AS (
        |  SELECT lang, n_chars FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
        |h AS (SELECT lang, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |cum AS (
        |  SELECT h.lang, n_chars, n,
        |    sum(c) OVER (PARTITION BY h.lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h JOIN t USING (lang)),
        |med AS (
        |  SELECT lang, min(n_chars) AS median, CAST(min(n) AS BIGINT) AS n
        |  FROM cum WHERE cm >= ceil(0.5 * n) GROUP BY lang),
        |dev AS (
        |  SELECT d.lang, abs(d.n_chars - med.median) AS dv
        |  FROM d JOIN med USING (lang)),
        |h2 AS (SELECT lang, dv, count(*) AS c FROM dev GROUP BY 1, 2),
        |cum2 AS (
        |  SELECT h2.lang, dv, med.n,
        |    sum(c) OVER (PARTITION BY h2.lang ORDER BY dv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h2 JOIN med USING (lang)),
        |mad AS (
        |  SELECT lang, min(dv) AS mad FROM cum2
        |  WHERE cm >= ceil(0.5 * n) GROUP BY lang)
        |SELECT med.lang, med.n, med.median, mad.mad
        |FROM med JOIN mad USING (lang)""".stripMargin,

    // mirrors q175: activity histogram, exact cumulatives, one quotient
    // per vertex
    "q175_lorenz_curve" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |h AS (
        |  SELECT n AS activity, CAST(count(*) AS BIGINT) AS n_entities
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n_entities) AS BIGINT) AS te,
        |  CAST(sum(activity * n_entities) AS BIGINT) AS tv FROM h),
        |cum AS (
        |  SELECT activity, n_entities,
        |    CAST(sum(n_entities) OVER w AS BIGINT) AS cume,
        |    CAST(sum(activity * n_entities) OVER w AS BIGINT) AS cumv
        |  FROM h
        |  WINDOW w AS (ORDER BY activity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT activity, n_entities,
        |  round(CAST(cume AS DOUBLE) / te, 6) AS cum_entity_share,
        |  round(CAST(cumv AS DOUBLE) / tv, 6) AS cum_event_share
        |FROM cum CROSS JOIN t""".stripMargin,

    // mirrors q169: q148's rank identity over per-user event counts
    "q169_user_gini" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM s),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(x) AS BIGINT) AS tot,
        |    CAST(sum(i * x) AS BIGINT) AS ix
        |  FROM r)
        |SELECT k AS n_groups, tot AS total_rows,
        |  round(2.0 * ix / (CAST(k AS DOUBLE) * tot)
        |    - CAST(k + 1 AS DOUBLE) / k, 6) AS gini
        |FROM a""".stripMargin,

    // mirrors q170: per-user lag gaps floored to whole seconds (q144's
    // floor-not-CAST rule), then q163's floor bins at 60s width
    "q170_gap_histogram" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    CAST(floor(CAST(tsu - pts AS DOUBLE) / 1000000) AS BIGINT)
        |      AS gap_s
        |  FROM e WHERE pts IS NOT NULL)
        |SELECT event_type,
        |  CAST(floor(CAST(gap_s AS DOUBLE) / 60) AS BIGINT) * 60
        |    AS bin_lo,
        |  (CAST(floor(CAST(gap_s AS DOUBLE) / 60) AS BIGINT) + 1) * 60
        |    AS bin_hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY 1, 2, 3""".stripMargin,

    // mirrors q166: (count desc, value)-ranked cells, group totals
    "q166_top_values" ->
      """WITH cells AS (
        |  SELECT lang, CAST(source AS VARCHAR) AS value,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, value, n,
        |    CAST(row_number() OVER (
        |      PARTITION BY lang ORDER BY n DESC, value) AS INTEGER)
        |      AS rank,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |  FROM cells)
        |SELECT lang, value, n, rank,
        |  round(CAST(n AS DOUBLE) / tot, 6) AS share
        |FROM r WHERE rank <= 3""".stripMargin,

    // mirrors q167: q132's exact moment tree per lang
    "q167_corr_per_group" ->
      """WITH f AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS y
        |  FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |    AND text IS NOT NULL),
        |m AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM f GROUP BY 1),
        |v AS (SELECT *,
        |  CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
        |  CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy
        |  FROM m)
        |SELECT lang, n,
        |  CASE WHEN vx <= 0 OR vy <= 0 THEN NULL ELSE
        |    round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (sqrt(vx) * sqrt(vy)), 6) END AS r
        |FROM v""".stripMargin,

    // mirrors q168: exact cumulative counts over the value union, one
    // quotient per value, order-independent max
    "q168_ks_distance" ->
      """WITH ha AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL GROUP BY 1),
        |hb AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ha.v, hb.v) AS v,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ha FULL JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v,
        |  sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM j
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |  CAST(sum(cb) AS BIGINT) AS n_b FROM j)
        |SELECT n_a, n_b,
        |  round(max(abs(CAST(cuma AS DOUBLE) / n_a
        |    - CAST(cumb AS DOUBLE) / n_b)), 6) AS ks
        |FROM c CROSS JOIN t GROUP BY n_a, n_b""".stripMargin,

    // mirrors q163: floor(value/width) bins through doubles
    "q163_length_histogram" ->
      """SELECT lang,
        |  CAST(floor(CAST(n_chars AS DOUBLE) / 100) AS BIGINT) * 100
        |    AS bin_lo,
        |  (CAST(floor(CAST(n_chars AS DOUBLE) / 100) AS BIGINT) + 1) * 100
        |    AS bin_hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents
        |WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,

    // mirrors q158: q25's stopword scores + tie-break pick rebuild the
    // prediction; diagonal mass is an exact BIGINT; pe's Σ ra·cb folds
    // in shared-value order; the kappa tree repeats the po/pe trees
    "q158_label_agreement" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(tk, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (
         |  SELECT lang,
         |    string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents WHERE lang IS NOT NULL),
         |sc AS (SELECT lang, $scores FROM t),
         |pr AS (SELECT lang,
         |  greatest(s_en, s_de, s_es, s_fr, s_zh) AS best,
         |  s_en, s_de, s_es, s_fr, s_zh FROM sc),
         |base AS (SELECT CAST(lang AS VARCHAR) AS a,
         |  CASE $pickCases ELSE 'und' END AS b FROM pr),
         |cells AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS obs
         |  FROM base GROUP BY 1, 2),
         |ab AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
         |  CAST(coalesce(sum(CASE WHEN a = b THEN obs END), 0) AS BIGINT)
         |    AS n_agree
         |  FROM cells),
         |ma AS (SELECT a AS v, CAST(sum(obs) AS BIGINT) AS ra
         |  FROM cells GROUP BY 1),
         |mb AS (SELECT b AS v, CAST(sum(obs) AS BIGINT) AS cb
         |  FROM cells GROUP BY 1),
         |fe AS (SELECT coalesce(list_reduce(list_transform(list_sort(
         |    list({'v': v, 'x': CAST(ra AS DOUBLE) * cb})), s -> s.x),
         |    (x, y) -> x + y), 0.0) AS f
         |  FROM ma JOIN mb USING (v))
         |SELECT n, n_agree,
         |  round(CAST(n_agree AS DOUBLE) / n, 6) AS po,
         |  round(f / n / n, 6) AS pe,
         |  CASE WHEN f / n / n = 1.0 THEN NULL ELSE
         |    round((CAST(n_agree AS DOUBLE) / n - f / n / n)
         |      / (1.0 - f / n / n), 6)
         |  END AS kappa
         |FROM ab CROSS JOIN fe""".stripMargin
    },

    // mirrors q149: the three Σ c·ln c folds in sorted-key order (the
    // q133 list_reduce-over-list_sort discipline), entropies as
    // ln(n) − fold/n, MI composed from the unrounded entropy trees in
    // the same fixed association as the Spark side
    "q149_mutual_info" ->
      """WITH base AS (
        |  SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS obs
        |  FROM base GROUP BY 1, 2),
        |ab AS (
        |  SELECT CAST(sum(obs) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT b) AS BIGINT) AS kb,
        |    list_reduce(list_transform(
        |      list_sort(list({'a': a, 'b': b, 'c': CAST(obs AS DOUBLE)})),
        |      s -> s.c * ln(s.c)), (x, y) -> x + y) AS fab
        |  FROM cells),
        |ma AS (SELECT a, CAST(sum(obs) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(obs) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1),
        |fa AS (SELECT list_reduce(list_transform(
        |    list_sort(list({'a': a, 'c': CAST(ra AS DOUBLE)})),
        |    s -> s.c * ln(s.c)), (x, y) -> x + y) AS fa FROM ma),
        |fb AS (SELECT list_reduce(list_transform(
        |    list_sort(list({'b': b, 'c': CAST(cb AS DOUBLE)})),
        |    s -> s.c * ln(s.c)), (x, y) -> x + y) AS fb FROM mb)
        |SELECT n, ka, kb,
        |  round(ln(CAST(n AS DOUBLE)) - fa / n, 6) AS h_a,
        |  round(ln(CAST(n AS DOUBLE)) - fb / n, 6) AS h_b,
        |  round(ln(CAST(n AS DOUBLE)) - fab / n, 6) AS h_ab,
        |  round((ln(CAST(n AS DOUBLE)) - fa / n)
        |    + (ln(CAST(n AS DOUBLE)) - fb / n)
        |    - (ln(CAST(n AS DOUBLE)) - fab / n), 6) AS mi,
        |  CASE WHEN ka = 1 OR kb = 1 THEN NULL
        |    ELSE round(((ln(CAST(n AS DOUBLE)) - fa / n)
        |      + (ln(CAST(n AS DOUBLE)) - fb / n)
        |      - (ln(CAST(n AS DOUBLE)) - fab / n)) /
        |      sqrt((ln(CAST(n AS DOUBLE)) - fa / n)
        |        * (ln(CAST(n AS DOUBLE)) - fb / n)), 6)
        |  END AS nmi
        |FROM ab CROSS JOIN fa CROSS JOIN fb""".stripMargin,

    // mirrors q150: rank by (freq desc, term), the four OLS sums folded
    // in rank order (q133 list_reduce discipline), slope/intercept trees
    // repeated textually so the doubles associate identically
    "q150_zipf_slope" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
        |  FROM tk GROUP BY 1),
        |top AS (
        |  SELECT term, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
        |      AS rank
        |  FROM tf ORDER BY freq DESC, term LIMIT 20),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE))})), s -> s.v),
        |    (x, y) -> x + y) AS sx,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(freq AS DOUBLE))})), s -> s.v),
        |    (x, y) -> x + y) AS sy,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE))})),
        |    s -> s.v), (x, y) -> x + y) AS sxy,
        |  list_reduce(list_transform(list_sort(list({'r': rank,
        |    'v': ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))})),
        |    s -> s.v), (x, y) -> x + y) AS sxx
        |  FROM top)
        |SELECT n_terms,
        |  CASE WHEN n_terms < 2 THEN NULL ELSE
        |    round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN n_terms < 2 THEN NULL ELSE
        |    round((sy
        |      - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
        |      / n_terms, 6)
        |  END AS intercept
        |FROM f""".stripMargin,

    // mirrors q130: expected = share_old * total_new; contribution =
    // (obs - E)^2 / E, null when the category is new (E = 0)
    "q130_category_drift" ->
      """WITH o AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_old
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |nw AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_new
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |t AS (
        |  SELECT (SELECT CAST(sum(n_old) AS BIGINT) FROM o) AS tot_o,
        |         (SELECT CAST(sum(n_new) AS BIGINT) FROM nw) AS tot_n)
        |SELECT coalesce(o.event_type, nw.event_type) AS event_type,
        |  coalesce(o.n_old, 0) AS n_old, coalesce(nw.n_new, 0) AS n_new,
        |  round(CAST(coalesce(o.n_old, 0) AS DOUBLE) * t.tot_n / t.tot_o,
        |    6) AS expected_new,
        |  round(CASE WHEN coalesce(o.n_old, 0) > 0 THEN
        |    (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    * (coalesce(nw.n_new, 0)
        |      - CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o)
        |    / (CAST(o.n_old AS DOUBLE) * t.tot_n / t.tot_o) END, 6)
        |    AS chisq
        |FROM o FULL OUTER JOIN nw USING (event_type), t""".stripMargin,

    // mirrors q129: the same degree-ordered orientation (row-value
    // comparisons mirror Spark's struct ordering), triangles from the
    // lowest-degree corner, wedges = sum(deg*(deg-1))/2
    "q129_graph_stats" ->
      s"""WITH docs0 AS (
         |  SELECT doc_id, text FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
         |  FROM pairs WHERE id_a <> id_b GROUP BY 1, 2),
         |deg AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
         |              THEN e.u ELSE e.v END AS src,
         |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
         |              THEN e.v ELSE e.u END AS dst
         |  FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
         |r AS (SELECT o.src, o.dst, d.deg AS dd
         |      FROM o JOIN deg d ON d.id = o.dst),
         |p AS (
         |  SELECT a.src, a.dst AS b, c.dst AS c
         |  FROM r a JOIN r c ON a.src = c.src
         |  WHERE (a.dd, a.dst) < (c.dd, c.dst)),
         |tri AS (
         |  SELECT count(*) AS t FROM p
         |  WHERE EXISTS (SELECT 1 FROM o
         |                WHERE o.src = p.b AND o.dst = p.c)),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         |nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |    CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
         |  FROM deg)
         |SELECT nd.n_nodes, ne.n_edges, nd.n_wedges,
         |  CAST(tri.t AS BIGINT) AS n_triangles,
         |  CASE WHEN nd.n_wedges > 0
         |       THEN 3.0 * tri.t / nd.n_wedges END AS clustering
         |FROM nd, ne, tri""".stripMargin,

    // mirrors q128: global row-level counts — per-batch reports are
    // batch-decomposable so their sums equal the whole-table check
    "q128_stream_quality" ->
      """SELECT 'not_null(user_id)' AS check_name,
        |  CAST(count(*) FILTER (user_id IS NULL) AS BIGINT) AS violations,
        |  CAST(count(*) AS BIGINT) AS total,
        |  count(*) FILTER (user_id IS NULL) = 0 AS passed
        |FROM events
        |UNION ALL
        |SELECT 'in_range(value,0.0,50.0)',
        |  CAST(count(*) FILTER (value IS NULL OR value < 0 OR value > 50)
        |    AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  count(*) FILTER (value IS NULL OR value < 0 OR value > 50) = 0
        |FROM events
        |UNION ALL
        |SELECT 'matches(event_type)',
        |  CAST(count(*) FILTER (event_type IS NULL
        |    OR NOT regexp_matches(event_type, '^[a-z]{1,5}$')) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  count(*) FILTER (event_type IS NULL
        |    OR NOT regexp_matches(event_type, '^[a-z]{1,5}$')) = 0
        |FROM events""".stripMargin,

    // mirrors q127: two part sketches, their exact merge (union + re-take
    // 64 smallest), three estimates, inclusion-exclusion clamped at 0
    "q127_kmv_intersect" ->
      s"""WITH ${kmvPartSql("a", "event_id % 2 = 0")},
         |${kmvPartSql("b", "event_id % 2 = 1")},
         |m AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h,
         |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |    FROM (SELECT event_type, h FROM s_a
         |          UNION SELECT event_type, h FROM s_b))
         |  WHERE rn <= 64),
         |${kmvEstSql("ea", "s_a")},
         |${kmvEstSql("eb", "s_b")},
         |${kmvEstSql("eu", "m")}
         |SELECT ea.event_type, ea.est AS est_a, eb.est AS est_b,
         |  eu.est AS est_union,
         |  greatest(round(ea.est + eb.est - eu.est, 6), 0.0)
         |    AS est_intersect
         |FROM ea JOIN eb USING (event_type) JOIN eu USING (event_type)"""
        .stripMargin,

    // mirrors q126: lag gaps per user (ORDER BY ts, event_id), then the
    // q101 discrete-quantile rule per transition
    // mirrors q151: per-user lag ordered by (ts, event_id), (from, to)
    // cell counts, from-totals re-aggregated, one exact quotient
    "q151_transition_matrix" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, f.n_from,
        |  round(CAST(c.n AS DOUBLE) / f.n_from, 6) AS prob
        |FROM c JOIN f USING (from_type)""".stripMargin,

    "q126_transition_times" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    lag(event_type) OVER w AS pt,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS pts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT pt || '>' || event_type AS transition, tsu - pts AS gap_us
        |  FROM e WHERE pt IS NOT NULL),
        |h AS (SELECT transition, gap_us, count(*) AS c FROM g
        |  GROUP BY 1, 2),
        |t AS (SELECT transition, count(*) AS n FROM g GROUP BY 1),
        |cum AS (
        |  SELECT h.transition, gap_us, n,
        |    sum(c) OVER (PARTITION BY h.transition ORDER BY gap_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h JOIN t ON h.transition = t.transition)
        |SELECT transition, min(gap_us) AS quantile,
        |  CAST(min(n) AS BIGINT) AS n
        |FROM cum WHERE cm >= ceil(0.5 * n)
        |GROUP BY transition""".stripMargin,

    // mirrors q125 via the rank form (covered(V) = sum of top-V counts;
    // the engine's frequency-class formula is tie-break-invariant, so
    // the two forms agree exactly)
    "q125_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS term FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok
        |  GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk
        |  FROM c),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |vs AS (SELECT unnest([100, 1000, 4000]) AS v)
        |SELECT vs.v AS vocab_size,
        |  CAST(coalesce(sum(CASE WHEN r.rk <= vs.v THEN r.c END), 0)
        |    AS BIGINT) AS covered,
        |  CAST(coalesce(sum(CASE WHEN r.rk <= vs.v THEN r.c END), 0)
        |    AS DOUBLE) / tot.n AS coverage
        |FROM vs CROSS JOIN r CROSS JOIN tot
        |GROUP BY vs.v, tot.n""".stripMargin,

    // mirrors q124: per-user ordered sequences (ORDER BY ts, event_id —
    // the q115 tie convention), 3-windows, count, top-10
    "q124_event_paths" ->
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT array_to_string(seq[i:i+2], '>') AS path
        |  FROM seqs, unnest(generate_series(1, len(seq) - 2)) AS u(i)
        |  WHERE len(seq) >= 3)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_paths
        |FROM g GROUP BY 1
        |ORDER BY n_paths DESC, path LIMIT 10""".stripMargin,

    // mirrors q123: q116's discrete-quantile rule at p05/p95 per lang,
    // then clamp each doc's length into the band
    "q123_winsorize" ->
      """WITH hist AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.05, 0.95]) AS p),
        |q AS (
        |  SELECT cum.lang, ps.p, min(cum.n_chars) AS qv
        |  FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |  WHERE cum.cm >= ceil(ps.p * tot.n)
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT lang, min(CASE WHEN p = 0.05 THEN qv END) AS lo,
        |         max(CASE WHEN p = 0.95 THEN qv END) AS hi
        |  FROM q GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  least(greatest(d.n_chars, b.lo), b.hi) AS n_chars_w
        |FROM documents d JOIN b USING (lang)""".stripMargin,

    // mirrors q122: the minhash chain on RAW documents, q66's split CASE,
    // pairs whose endpoints land in different splits
    "q122_split_leakage" ->
      s"""WITH ${minhashChainSql("documents")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN hv < 800000 THEN 'train'
         |         WHEN hv < 900000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv FROM documents))
         |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
         |FROM pairs p
         |JOIN sp sa ON sa.doc_id = p.id_a
         |JOIN sp sb ON sb.doc_id = p.id_b
         |WHERE sa.split <> sb.split""".stripMargin,

    // mirrors Similarity.embeddingOutliers(k=5, scale=1024): quantize to
    // floor(x*1024), per-label elementwise sums S and counts n, rank by
    // the integer sum((n*x - S)^2) desc (ties to vec_id)
    "q121_embedding_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id, label, i, xq[i] AS x
        |  FROM q, unnest(generate_series(1, len(xq))) AS u(i)),
        |s AS (
        |  SELECT label, i, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2),
        |n AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
        |d AS (
        |  SELECT e.vec_id, e.label,
        |    CAST(sum((n.n * e.x - s.s) * (n.n * e.x - s.s)) AS BIGINT)
        |      AS d_n2
        |  FROM e JOIN s ON s.label = e.label AND s.i = e.i
        |         JOIN n ON n.label = e.label
        |  GROUP BY 1, 2)
        |SELECT vec_id, label, d_n2, rank FROM (
        |  SELECT vec_id, label, d_n2,
        |    row_number() OVER (PARTITION BY label
        |                       ORDER BY d_n2 DESC, vec_id) AS rank
        |  FROM d)
        |WHERE rank <= 5""".stripMargin,

    // mirrors q120: q64's pair graph and closure, then sizes per
    // component and the histogram; docs_removed = sum(size) - count
    "q120_dedup_stats" ->
      s"""WITH RECURSIVE docs0 AS (
         |  SELECT doc_id, text, lang FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src),
         |sizes AS (
         |  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM comp GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(cluster_size) - count(*) AS BIGINT) AS docs_removed
         |FROM sizes GROUP BY 1""".stripMargin,

    // mirrors TextAnalysis.collocations(minCount=3, k=20): the ratio
    // chain is mirrored left-assoc op by op (each step one IEEE double
    // operation on exact integer counts — bit-identical, no libm)
    "q119_collocations" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bi AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |pc AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count FROM bi
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi)
        |SELECT w1, w2, pair_count, round(ratio, 6) AS pmi_ratio
        |FROM (
        |  SELECT pc.w1, pc.w2, pc.pair_count,
        |    CAST(pc.pair_count AS DOUBLE) * tot.n * tot.n / btot.b
        |      / u1.c / u2.c AS ratio
        |  FROM pc JOIN uni u1 ON u1.w = pc.w1
        |          JOIN uni u2 ON u2.w = pc.w2, tot, btot)
        |ORDER BY ratio DESC, w1, w2 LIMIT 20""".stripMargin,

    // mirrors q116: the q101 discrete-quantile rule (smallest score whose
    // cumulative count reaches ceil(p*n)) per p, off one cumulated
    // histogram
    "q116_quantile_summary" ->
      """WITH hist AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars,
        |    sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cm
        |  FROM hist),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |  GROUP BY 1),
        |ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p)
        |SELECT cum.lang, ps.p, min(cum.n_chars) AS quantile, tot.n
        |FROM cum JOIN tot USING (lang) CROSS JOIN ps
        |WHERE cum.cm >= ceil(ps.p * tot.n)
        |GROUP BY cum.lang, ps.p, tot.n""".stripMargin,

    // mirrors q115: run starts where the value differs from its
    // predecessor (or at the first observation); valid_to = next run's
    // start within the key
    "q115_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP))
        |      AS tsu, event_id,
        |    lag(event_type) OVER w AS prev,
        |    lag(event_id) OVER w IS NULL AS first
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type, tsu, event_id FROM e
        |  WHERE first OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, tsu AS from_us,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
        |    AS to_us,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
        |    IS NULL AS is_current
        |FROM runs""".stripMargin,

    // mirrors q113: the identical unrolled interleave chain (generated by
    // the same Scala code that builds the Spark expression)
    "q113_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${Layout.zValueSql("l_partkey", "l_suppkey", bits = 16)}
         |  AS zval
         |FROM lineitem""".stripMargin,

    // mirrors q112: one SELECT per rule, unioned; rule names match the
    // operator's generated labels exactly
    "q112_quality_checks" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem),
        |rules AS (
        |  SELECT 'not_null(l_orderkey)' AS check_name,
        |    CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0
        |      END), 0) AS BIGINT) AS violations FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_quantity,1.0,50.0)',
        |    CAST(coalesce(sum(CASE WHEN l_quantity IS NULL
        |      OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_discount,0.0,0.05)',
        |    CAST(coalesce(sum(CASE WHEN l_discount IS NULL
        |      OR l_discount < 0.0 OR l_discount > 0.05 THEN 1 ELSE 0
        |      END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'matches(l_returnflag)',
        |    CAST(coalesce(sum(CASE WHEN l_returnflag IS NULL
        |      OR NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1
        |      ELSE 0 END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey,l_linenumber)',
        |    CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
        |      SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'referential(l_orderkey)',
        |    CAST(count(*) AS BIGINT) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_orderkey = l.l_orderkey))
        |SELECT r.check_name, r.violations, t.total,
        |  r.violations = 0 AS passed
        |FROM rules r CROSS JOIN t""".stripMargin,

    // mirrors q111: tf over the shared tokenizer, df counted off the tf
    // frame, N = distinct docs with >=1 token; rank ordered by the
    // UNROUNDED score (identical IEEE bits both engines) then term
    "q111_tfidf_terms" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tk GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |  GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS sc,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term)
        |      AS INTEGER) AS rank
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, round(sc, 6) AS tfidf, rank
        |FROM s WHERE rank <= 3""".stripMargin,

    // mirrors q110: a day d credits the windows ending on d..d+6; BETWEEN
    // range join against observed days replaces the explode; dau is the
    // distinct count restricted to d = end day (CASE → NULL ignored by
    // count distinct in both engines)
    "q110_rolling_active" ->
      """WITH au AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d AS day FROM au)
        |SELECT days.day,
        |  CAST(count(DISTINCT CASE WHEN au.d = days.day THEN au.user_id
        |    END) AS BIGINT) AS dau,
        |  CAST(count(DISTINCT au.user_id) AS BIGINT) AS wau
        |FROM au JOIN days ON days.day BETWEEN au.d AND au.d + 6
        |GROUP BY days.day""".stripMargin,

    // mirrors q107: the same md5-60 bucket per token (multiset counts —
    // every occurrence lands)
    "q107_feature_hash" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS t FROM tk)
         |SELECT doc_id,
         |  CAST(${PortableHash.sqlHash60("t")} % 64 AS INTEGER) AS dim,
         |  count(*) AS count
         |FROM tok GROUP BY 1, 2""".stripMargin,

    // mirrors q106: both engines truncate to Monday-start weeks; offsets
    // are exact day differences between week starts divided by 7
    "q106_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |c AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY user_id),
        |x AS (
        |  SELECT DISTINCT e.user_id,
        |    CAST(date_trunc('week', d0) AS DATE) AS cohort_week,
        |    CAST(date_diff('day', date_trunc('week', d0),
        |      date_trunc('week', d)) // 7 AS INTEGER) AS week_offset
        |  FROM e JOIN c ON e.user_id = c.user_id)
        |SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM x GROUP BY 1, 2""".stripMargin,

    // mirrors q103: sha256 over the same salt||id string in both engines
    "q103_pseudonymize" ->
      """WITH p AS (
        |  SELECT sha256('graft-salt-v1' || CAST(user_id AS VARCHAR))
        |    AS user_id, event_type
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM p GROUP BY user_id""".stripMargin,

    // mirrors q104: the same deterministic delivery (drop %13, edit %11,
    // add %25 under id+500000), classified by content digest
    "q104_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, text, lang FROM documents),
        |new_df AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN 'edited ' || text
        |         ELSE text END AS text,
        |    lang
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text, lang
        |  FROM documents WHERE doc_id % 25 = 0),
        |o AS (SELECT doc_id, md5(text || lang) AS dg FROM old),
        |n AS (SELECT doc_id, md5(text || lang) AS dg FROM new_df)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.dg IS NULL THEN 'added'
        |       WHEN n.dg IS NULL THEN 'removed'
        |       WHEN o.dg = n.dg THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // mirrors q101's explicit type-1 quantile rule — no engine
    // quantile_disc convention involved
    "q101_group_median" ->
      """WITH h AS (
        |  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT h.lang, n_chars, n,
        |    sum(c) OVER (PARTITION BY h.lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h JOIN t ON h.lang = t.lang)
        |SELECT lang, min(n_chars) AS quantile, CAST(min(n) AS BIGINT) AS n
        |FROM cum WHERE cm >= ceil(0.5 * n)
        |GROUP BY lang""".stripMargin,

    // mirrors q102 top-k per group (count desc, id tie-break)
    "q102_topk_per_group" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank
        |FROM documents
        |QUALIFY rank <= 3""".stripMargin,

    // mirrors the q100 params chain: normalize (nfc + lower + collapse),
    // chunk the normalized text at 32/32, split by doc_id hash (q66's
    // formula) — whole-doc split assignment, chunk rows inherit
    "q100_prep_pipeline" ->
      s"""WITH norm AS (
         |  SELECT doc_id,
         |    regexp_replace(trim(lower(nfc_normalize(text))), '\\s+', ' ',
         |      'g') AS nt
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(nt)), '\\s+') AS tk
         |  FROM norm),
         |st AS (
         |  SELECT doc_id, tk,
         |    unnest(range(0, greatest(len(tk)-1, 0)+1, 32)) AS s
         |  FROM tk),
         |ch AS (
         |  SELECT doc_id, CAST(s // 32 AS INTEGER) AS chunk_idx,
         |    CAST(least(32, len(tk)-s) AS INTEGER) AS n_tokens
         |  FROM st),
         |h AS (
         |  SELECT doc_id,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM documents)
         |SELECT c.doc_id, c.chunk_idx, c.n_tokens,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM ch c JOIN h ON c.doc_id = h.doc_id""".stripMargin,

    // mirrors q98: q49's chunk-id prefix sum, then ordered string_agg
    // per chunk
    // mirrors q159: q98's ordered cumsum assigns chunks, per-chunk mass
    // histogram-cumulated for the type-1 quantiles, one exact quotient
    "q159_packing_stats" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk),
        |s AS (
        |  SELECT CAST(before // 512 AS BIGINT) AS chunk_id,
        |    CAST(sum(n_tokens) AS BIGINT) AS ct
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(ct) AS BIGINT) AS total_tokens FROM s),
        |h AS (SELECT ct, count(*) AS hc FROM s GROUP BY 1),
        |cum AS (SELECT ct, sum(hc) OVER (ORDER BY ct
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM h),
        |q AS (
        |  SELECT p, min(ct) AS chunk_tokens
        |  FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS p)
        |  CROSS JOIN t
        |  WHERE cm >= ceil(p * n_chunks)
        |  GROUP BY p)
        |SELECT q.p, q.chunk_tokens, t.n_chunks, t.total_tokens,
        |  round(CAST(t.total_tokens AS DOUBLE)
        |    / (CAST(t.n_chunks AS DOUBLE) * 512), 6) AS mean_fill
        |FROM q CROSS JOIN t""".stripMargin,

    "q98_packed_sequences" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM tk),
        |a AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(before // 4096 AS BIGINT) AS chunk_id
        |  FROM c)
        |SELECT chunk_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text
        |FROM a GROUP BY chunk_id""".stripMargin,

    // mirrors q99: identical double expression tree over BIGINT-exact
    // moments — same parenthesization, same rounding
    "q99_zscore" ->
      """WITH s AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |  round((n_chars - CAST(s1 AS DOUBLE) / n) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) /
        |      (n - 1)), 6) AS z
        |FROM documents d JOIN s ON d.lang = s.lang""".stripMargin,

    // mirrors q95 dynamic pivot: the discovered value set is exactly the
    // five languages, one explicit sum per column
    "q95_dynamic_pivot" ->
      """SELECT source,
        |  CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source""".stripMargin,

    // mirrors q96: unordered partition window = per-language total
    "q96_share_report" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, source, chars,
        |  round(CAST(chars AS DOUBLE) /
        |    sum(chars) OVER (PARTITION BY lang), 6) AS share
        |FROM c""".stripMargin,

    // mirrors q97: both engines ship the same Levenshtein metric over
    // the distinct key domain
    "q97_fuzzy_keys" ->
      """WITH n AS (SELECT DISTINCT source FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
        |FROM n a JOIN n b
        |  ON a.source < b.source
        |  AND levenshtein(a.source, b.source) <= 1""".stripMargin,

    // mirrors q93 rollup: GROUP BY ROLLUP with the same ALL-sentinel
    // coalesce
    "q93_rollup_report" ->
      """SELECT coalesce(lang, 'ALL') AS lang,
        |  coalesce(source, 'ALL') AS source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

    // mirrors q94: q29's md5-derived offset arithmetic per frame, then
    // min-id election on the (payload digest, frame index) identity
    "q94_frame_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    'FRAMES:' || CAST(doc_id % 97 AS VARCHAR) || ':PAYLOAD'
         |      AS blob
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, sha256(blob) AS sha,
         |    CAST(r.range AS INTEGER) AS frame_no,
         |    ${PortableHash.sqlHash60("concat_ws('_', sha256(blob), r.range)")}
         |      % CAST(octet_length(encode(blob)) AS INTEGER)
         |      AS frame_offset,
         |    CAST(octet_length(encode(blob)) AS INTEGER) AS n_bytes
         |  FROM m, range(4) r),
         |k AS (
         |  SELECT sha, frame_no, min(doc_id) AS doc_id
         |  FROM f GROUP BY 1, 2)
         |SELECT f.doc_id, f.frame_no, f.frame_offset, f.n_bytes
         |FROM f JOIN k USING (doc_id, sha, frame_no)""".stripMargin,

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

    // mirrors q92: only windows the watermark passed emit in append mode
    // — windows with end <= max event time (integer-second window ends
    // make the floor'd comparison exact); rank over the closed windows
    "q92_trending_stream" ->
      """WITH w AS (
        |  SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes',
        |      CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
        |    event_type, count(*) AS n_events,
        |    round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |mx AS (
        |  SELECT CAST(floor(epoch(CAST(max(ts) AS TIMESTAMP))) AS BIGINT)
        |    AS wm
        |  FROM events)
        |SELECT win_start, event_type, n_events, sum_value,
        |  CAST(row_number() OVER (PARTITION BY win_start
        |    ORDER BY n_events DESC, event_type) AS INTEGER) AS rank
        |FROM w
        |WHERE win_start + 300 <= (SELECT wm FROM mx)
        |QUALIFY rank <= 3""".stripMargin,

    // mirrors Sampling.mixToBudget(en 0.5, fr 0.25, es 0.25; total 4000):
    // per-lang budgets en 2000 / fr 1000 / es 1000; unnamed langs kept
    // whole (budget NULL); q74's running-sum convention otherwise
    "q90_mixture_reweight" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
         |      AS INTEGER) AS n_tokens,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS bkt
         |  FROM documents),
         |b AS (SELECT * FROM (VALUES ('en', 2000.0), ('fr', 1000.0),
         |  ('es', 1000.0)) AS v(lang, budget))
         |SELECT doc_id, lang, n_tokens FROM t LEFT JOIN b USING (lang)
         |QUALIFY budget IS NULL OR
         |  SUM(CAST(n_tokens AS DOUBLE)) OVER (
         |    PARTITION BY lang ORDER BY bkt, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  - n_tokens < budget""".stripMargin,

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

    // mirrors q178: class sizes over the same quasi tuple (nulls group
    // together in both engines), then one-row risk summary at k=5
    "q178_k_anonymity" ->
      """WITH c AS (
        |  SELECT count(*) AS sz FROM (
        |    SELECT lang, source,
        |      CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket
        |    FROM documents)
        |  GROUP BY lang, source, len_bucket)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(sz) AS BIGINT) AS min_class_size,
        |  CAST(count(CASE WHEN sz < 5 THEN 1 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(COALESCE(sum(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
        |    AS n_risky_rows,
        |  CASE WHEN sum(sz) = 0 THEN NULL
        |    ELSE round(CAST(COALESCE(sum(CASE WHEN sz < 5 THEN sz END), 0)
        |      AS DOUBLE) / sum(sz), 6) END AS risky_rate
        |FROM c""".stripMargin,

    // mirrors q179: whole-day ages against the frame's max ts, weight
    // 0.5^(age/3), identical double association (value * weight summed)
    "q179_decayed_engagement" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    CAST(floor(CAST(
        |      (SELECT max(epoch_us(ts)) FROM events
        |       WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |         AND value IS NOT NULL) - epoch_us(ts)
        |      AS DOUBLE) / 86400000000) AS DOUBLE) AS age_days
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS raw_value,
        |  round(sum(value * pow(0.5, age_days / 3.0)), 6)
        |    AS decayed_value
        |FROM r GROUP BY user_id""".stripMargin,

    // mirrors q180: same bigram fan-out (1-indexed list slices), counts
    // truncated at 500 bigrams / 25 histories with identical tie-breaks,
    // denominators and V from the UNTRUNCATED counts, add-0.5 smoothing
    "q180_bigram_quality" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM tk)),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts,
        |      unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(
        |    (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |    (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |    AS bigram_logprob
        |FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin,

    // mirrors q181: the zlib deflate sizes are SHARED INPUT (the gate
    // writes them to /tmp/graft_q181_sizes, hive-partitioned by corpus
    // size so this SF's partition is unambiguous); the oracle re-derives
    // raw UTF-8 bytes, the exact integer ppm ratio, and the band
    "q181_compression_quality" ->
      """WITH sz AS (
        |  SELECT doc_id, n_deflated
        |  FROM read_parquet('/tmp/graft_q181_sizes/*/*.parquet',
        |                    hive_partitioning = true)
        |  WHERE n_corpus = (SELECT count(*) FROM documents)),
        |b AS (
        |  SELECT d.doc_id,
        |    CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |    CAST(s.n_deflated AS BIGINT) AS n_deflated
        |  FROM documents d JOIN sz s USING (doc_id))
        |SELECT doc_id, n_bytes, n_deflated,
        |  CASE WHEN n_bytes IS NULL OR n_bytes = 0 THEN NULL
        |       ELSE (n_deflated * 1000000) // n_bytes END AS ratio_ppm,
        |  CASE WHEN n_bytes IS NULL OR n_bytes = 0 THEN 'empty'
        |       WHEN (n_deflated * 1000000) // n_bytes < 300000
        |         THEN 'template'
        |       WHEN (n_deflated * 1000000) // n_bytes <= 700000
        |         THEN 'natural'
        |       ELSE 'incompressible' END AS band
        |FROM b""".stripMargin,

    // mirrors q182: same tokenization, IN-list prefilter, zero-hit
    // terms preserved by the VALUES-frame left join
    "q182_blocklist" ->
      """WITH terms(term) AS (
        |  VALUES ('slow'), ('big'), ('vector'), ('zzz_unused')),
        |tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |h AS (
        |  SELECT t AS term, count(DISTINCT doc_id) AS nd, count(*) AS no
        |  FROM tk WHERE t IN ('slow', 'big', 'vector', 'zzz_unused')
        |  GROUP BY t)
        |SELECT term, CAST(COALESCE(nd, 0) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(no, 0) AS BIGINT) AS n_occurrences
        |FROM terms LEFT JOIN h USING (term)""".stripMargin,

    // mirrors q183: identical URL fixture, RE2-simple extraction
    "q183_url_domains" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN text || ' https://site' || (doc_id % 7)
        |      || '.example/p x http://cdn.example/a'
        |    ELSE text END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    regexp_extract(unnest(
        |      regexp_extract_all(text, 'https?://[^\s]+')),
        |      'https?://([^/\s]+)', 1) AS domain
        |  FROM d)
        |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_urls
        |FROM u GROUP BY domain""".stripMargin,

    // mirrors q184: same three regex counts, same text-level syllable
    // floor, same fixed double association
    "q184_readability" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(lower(text)), '\s+'))
        |    END AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS g
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
        |  CAST(s AS BIGINT) AS n_sentences,
        |  CAST(greatest(g, w) AS BIGINT) AS n_syllables,
        |  CASE WHEN w = 0 THEN NULL
        |    ELSE round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
        |      - 84.6 * (CAST(greatest(g, w) AS DOUBLE) / w), 6)
        |  END AS flesch
        |FROM b""".stripMargin,

    // mirrors q185: model CTEs over the FULL corpus (q180's shapes),
    // scoring restricted to the blocklist survivors
    "q185_quality_pipeline" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM tk)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |clean AS (
        |  SELECT doc_id, ts FROM tk
        |  WHERE NOT list_has_any(ts, ['slow', 'big'])),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM clean WHERE len(ts) >= 2))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(
        |    (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |    (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |    AS bigram_logprob
        |FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin,

    // mirrors q186: identical floor(x*1024) quantization, exact integer
    // sums, the same fixed double association for the cov cell
    "q186_embedding_covariance" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |e AS (
        |  SELECT vec_id, CAST(g - 1 AS INTEGER) AS i, qv[g] AS x FROM (
        |    SELECT vec_id, qv,
        |      unnest(generate_series(1, len(qv))) AS g
        |    FROM q)),
        |lin AS (
        |  SELECT i, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY i),
        |cells AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS sp
        |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT c.i, c.j, CAST(l1.n AS BIGINT) AS n,
        |  round((CAST(l1.n AS DOUBLE) * CAST(c.sp AS DOUBLE)
        |    - CAST(l1.s AS DOUBLE) * CAST(l2.s AS DOUBLE))
        |    / (CAST(l1.n AS DOUBLE) * CAST(l1.n AS DOUBLE) * 1048576.0),
        |    6) + 0.0 AS cov
        |FROM cells c JOIN lin l1 ON c.i = l1.i
        |  JOIN lin l2 ON c.j = l2.i""".stripMargin,

    // mirrors q187: per-edge child key counts + anti-join orphans, same
    // every-50th-order suppkey mangle
    "q187_fk_matrix" -> {
      def edge(name: String, childSql: String, parent: String,
          parentKey: String) =
        s"""SELECT '$name' AS edge,
           |  CAST(COALESCE(sum(rws), 0) AS BIGINT) AS n_child_rows,
           |  CAST(count(*) AS BIGINT) AS n_child_keys,
           |  CAST(COALESCE(sum(CASE WHEN orphan THEN 1 END), 0) AS BIGINT)
           |    AS n_orphan_keys,
           |  CAST(COALESCE(sum(CASE WHEN orphan THEN rws END), 0)
           |    AS BIGINT) AS n_orphan_rows
           |FROM (
           |  SELECT k, count(*) AS rws,
           |    NOT EXISTS (SELECT 1 FROM $parent p
           |                WHERE p.$parentKey = c.k) AS orphan
           |  FROM ($childSql) c WHERE k IS NOT NULL GROUP BY k)""".stripMargin
      Seq(
        edge("nation->region",
          "SELECT n_regionkey AS k FROM nation", "region", "r_regionkey"),
        edge("customer->nation",
          "SELECT c_nationkey AS k FROM customer", "nation", "n_nationkey"),
        edge("orders->customer",
          "SELECT o_custkey AS k FROM orders", "customer", "c_custkey"),
        edge("lineitem->supplier",
          """SELECT CASE WHEN l_orderkey % 50 = 0
            |  THEN l_suppkey + 900000 ELSE l_suppkey END AS k
            |FROM lineitem""".stripMargin, "supplier", "s_suppkey"))
        .mkString("", "\nUNION ALL\n", "")
    },

    // mirrors q188: per-user running max over event_id order, floored
    // whole-second lateness, histogram quantiles
    "q188_watermark_lateness" ->
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_id IS NOT NULL
        |    AND user_id IS NOT NULL),
        |l AS (
        |  SELECT CAST(floor(greatest(COALESCE(
        |    max(t) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), t)
        |    - t, 0) / 1000000.0) AS BIGINT) AS lat
        |  FROM r),
        |tot AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN lat > 0 THEN 1 END) AS nl FROM l),
        |h AS (
        |  SELECT lat, count(*) AS c FROM l GROUP BY lat),
        |cum AS (
        |  SELECT lat, sum(c) OVER (ORDER BY lat) AS cumc FROM h)
        |SELECT p, min(lat) AS lateness_s, CAST(n AS BIGINT) AS n_events,
        |  CAST(nl AS BIGINT) AS n_late,
        |  CASE WHEN n = 0 THEN NULL
        |    ELSE round(CAST(nl AS DOUBLE) / n, 6) END AS late_share
        |FROM cum CROSS JOIN tot
        |  CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS p)
        |WHERE cumc >= ceil(p * n)
        |GROUP BY p, n, nl""".stripMargin,

    // mirrors q189: key-size histogram quantiles + one-row skew summary
    "q189_key_skew" ->
      """WITH g AS (
        |  SELECT user_id, count(*) AS sz FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |t AS (
        |  SELECT CAST(sum(sz) AS BIGINT) AS nrows, count(*) AS nkeys,
        |    max(sz) AS mx FROM g),
        |h AS (SELECT sz, count(*) AS c FROM g GROUP BY sz),
        |cum AS (SELECT sz, sum(c) OVER (ORDER BY sz) AS cumc FROM h),
        |q AS (
        |  SELECT p, min(sz) AS qv
        |  FROM cum CROSS JOIN t
        |    CROSS JOIN (SELECT unnest([0.5, 0.99]) AS p)
        |  WHERE cumc >= ceil(p * nkeys) GROUP BY p)
        |SELECT nrows AS n_rows, CAST(nkeys AS BIGINT) AS n_keys,
        |  CAST(mx AS BIGINT) AS max_group,
        |  CAST(p50.qv AS BIGINT) AS p50_group,
        |  CAST(p99.qv AS BIGINT) AS p99_group,
        |  round(CAST(mx AS DOUBLE) / nrows, 6) AS max_key_share,
        |  round(CAST(mx AS DOUBLE) / p50.qv, 6) AS skew_factor
        |FROM t, (SELECT qv FROM q WHERE p = 0.5) p50,
        |  (SELECT qv FROM q WHERE p = 0.99) p99""".stripMargin,

    // mirrors q190: identical md5-seeded inverse-CDF Laplace draw per
    // group, same clamp, same double association
    "q190_dp_counts" ->
      s"""WITH c AS (
         |  SELECT lang, source, count(*) AS n FROM documents
         |  GROUP BY lang, source),
         |k AS (
         |  SELECT lang, source, n,
         |    ${PortableHash.sqlHash60(
        "'dp' || '|' || COALESCE(CAST(lang AS VARCHAR), ' null') " +
        "|| '|' || COALESCE(CAST(source AS VARCHAR), ' null')")} AS h
         |  FROM c),
         |u AS (
         |  SELECT lang, source, n,
         |    CAST(h AS DOUBLE) / 1152921504606846976.0 - 0.5 AS uu
         |  FROM k),
         |d AS (
         |  SELECT lang, source,
         |    round(CAST(n AS DOUBLE) + (-(1.0) * sign(uu)
         |      * ln(greatest(1.0 - 2.0 * abs(uu), 0.000000000001))), 6)
         |      AS dp_count
         |  FROM u)
         |SELECT lang, source, dp_count,
         |  CAST(greatest(round(dp_count, 0), 0.0) AS BIGINT)
         |    AS dp_released
         |FROM d""".stripMargin,

    // mirrors q191: identical clip-then-sum, md5 draw with the "sum"
    // seed suffix, Laplace scale clip/epsilon
    "q191_dp_sums" ->
      s"""WITH s AS (
         |  SELECT event_type,
         |    sum(least(greatest(COALESCE(CAST(value AS DOUBLE), 0.0),
         |      -100.0), 100.0)) AS sv
         |  FROM events GROUP BY event_type),
         |k AS (
         |  SELECT event_type, sv,
         |    ${PortableHash.sqlHash60(
        "'dp' || '|' || 'sum' || '|' || " +
        "COALESCE(CAST(event_type AS VARCHAR), ' null')")} AS h
         |  FROM s),
         |u AS (
         |  SELECT event_type, sv,
         |    CAST(h AS DOUBLE) / 1152921504606846976.0 - 0.5 AS uu
         |  FROM k)
         |SELECT event_type,
         |  round(sv + (-(100.0) * sign(uu)
         |    * ln(greatest(1.0 - 2.0 * abs(uu), 0.000000000001))), 6)
         |    AS dp_sum
         |FROM u""".stripMargin,

    // mirrors q192: k >= vocab makes Misra-Gries exact == plain counts
    "q192_heavy_hitters" ->
      """SELECT t AS item, CAST(count(*) AS BIGINT) AS count_low
        |FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents)
        |WHERE t IS NOT NULL
        |GROUP BY t""".stripMargin,

    // q220 merges two per-shard MG summaries by count re-ingest — exact
    // at k >= vocab, so the combined counts equal the plain counts
    "q220_heavy_hitter_merge" ->
      """SELECT t AS item, CAST(count(*) AS BIGINT) AS count_low
        |FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents)
        |WHERE t IS NOT NULL
        |GROUP BY t""".stripMargin,

    // mirrors q193: the streamed MG sketch stays exact at k >= vocab,
    // so the oracle is q192's plain count
    "q193_stream_heavy_hitters" ->
      """SELECT t AS item, CAST(count(*) AS BIGINT) AS count_low
        |FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents)
        |WHERE t IS NOT NULL
        |GROUP BY t""".stripMargin,

    // mirrors q194: exact per-source counts at k >= vocab
    "q194_group_heavy_hitters" ->
      """SELECT source, t AS item, CAST(count(*) AS BIGINT) AS count_low
        |FROM (
        |  SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents)
        |WHERE t IS NOT NULL
        |GROUP BY source, t""".stripMargin,

    // mirrors q195: identical 8-centroid hash-sampled init, (cos DESC,
    // cid ASC) assignment argmax, and EXACT fixed-point integer sums —
    // the double->REAL->double cast chain reproduces kmeansStep's float
    // centroid storage bit-for-bit, so round(…,6) can never straddle a
    // tie. Empty clusters (LEFT JOIN miss) carry the old centroid, n=0.
    "q195_kmeans_step" -> kmeansStepSql,

    // mirrors q196: same whitespace tokenization, char+</w> symbol
    // split, freq-weighted adjacent pair counts, same full tie-break
    "q196_bpe_pairs" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(lower(text)),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms AS (SELECT freq, list_append(list_transform(
        |           generate_series(1, length(w)),
        |           i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |pr AS (SELECT s[g] AS left_sym, s[g+1] AS right_sym, freq
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms WHERE len(s) >= 2))
        |SELECT left_sym, right_sym,
        |  CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM pr GROUP BY 1, 2
        |ORDER BY pair_count DESC, left_sym, right_sym LIMIT 30""".stripMargin,

    // mirrors q197: two unrolled BPE rounds. Round 2 re-derives the
    // symbol split in the STRING domain: leftmost-first alternation
    // '(<round-1 merged>|</w>|.)' is exactly the leftmost
    // non-overlapping fold applyMerge performs (alnum-only tokens keep
    // the atom literal-safe; '<', '>', '/' are not RE2 metacharacters)
    "q197_bpe_learn" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r, pair_count FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |syms2 AS (SELECT freq, regexp_extract_all(w || '</w>',
        |            '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |            '|</w>|.)') AS s FROM words),
        |p2 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms2 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r2 AS (SELECT l, r, pair_count FROM p2
        |       ORDER BY pair_count DESC, l, r LIMIT 1)
        |SELECT CAST(1 AS INTEGER) AS rank, l AS left_sym, r AS right_sym,
        |  l || r AS merged, pair_count FROM r1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), l, r, l || r, pair_count FROM r2""".stripMargin,

    // mirrors q198 pageRankStep arithmetic VERBATIM (operand order
    // included): quantized long contribution sums are exact in both
    // engines; every literal is CAST to DOUBLE because DuckDB parses
    // bare decimal literals as DECIMAL, whose division is not IEEE
    "q198_pagerank_step" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |srcq AS (SELECT deg.src, CAST(floor(CAST(1000000000 AS DOUBLE)
        |             * r0.r / deg.deg) AS BIGINT) AS q
        |         FROM r0 JOIN deg ON r0.id = deg.src),
        |contrib AS (SELECT e.dst, CAST(sum(srcq.q) AS BIGINT) AS qin
        |            FROM e JOIN srcq ON e.src = srcq.src GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE))
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST((SELECT q FROM dm) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE) / (SELECT n FROM nn)) AS rank
        |FROM nodes nd LEFT JOIN contrib c ON nd.id = c.dst""".stripMargin,

    // mirrors q199: the q195 assignment argmax (8 hash-sampled
    // centroids, cos DESC / cid ASC) — micro-batching must not change a
    // stateless map, so the oracle is the plain batch assignment
    "q199_stream_kmeans_assign" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 8)
         |SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |  FROM emb e CROSS JOIN cent c) WHERE rk = 1""".stripMargin,

    // mirrors q200 in the exact regime: the sketch estimator is type-1
    // (smallest value whose cumulative weight >= max(1, ceil(p·n)));
    // with unit weights that is the value at sorted rank ceil(p·n).
    // The ceil runs on DOUBLE arithmetic in both engines (literals
    // CAST — DuckDB would otherwise use DECIMAL and round differently)
    "q200_quantile_sketch" -> eventQuantileSql,

    // mirrors q201: micro-batched sketch merges stay exact below k, so
    // the oracle is q200's batch quantile SQL
    "q201_stream_quantiles" -> eventQuantileSql,

    // q219 merges two PART sketches via weighted re-ingest — exact below
    // k, so the combined quantiles equal the whole-table oracle
    "q219_quantile_merge" -> eventQuantileSql,

    // mirrors q206: the q22 simhash pipeline over hex-chunk tokens of
    // the synthesized payload blobs (DuckDB hex() is uppercase like
    // Spark's; both lowercase before tokenizing)
    "q206_media_neardup" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST('HDR:' ||
         |      repeat(md5(CAST(doc_id % 97 AS VARCHAR)), 6) ||
         |      CASE WHEN doc_id % 5 = 0 THEN '::v2' ELSE '' END
         |      AS BLOB) AS payload
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(
         |    regexp_replace(hex(payload), '(.{8})', '\\1 ', 'g'))),
         |    '\\s+') AS tk
         |  FROM m),
         |hs AS (
         |  SELECT doc_id, len(tk) AS n,
         |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")}) AS hl
         |  FROM toks),
         |fp AS (SELECT doc_id,
         |  $simhashSql AS simhash
         |  FROM hs),
         |banded AS (
         |  SELECT doc_id, simhash, band,
         |    (simhash >> shft) & mask AS chunk
         |  FROM fp, (VALUES ${simhashBandsSql(7)}) AS bands(band, shft, mask)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS fa, b.simhash AS fb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 7""".stripMargin,

    // mirrors q207: q23's exact-cosine ranking with the label-mismatch
    // filter before the rank window
    "q207_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
        |             label AS ql
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
        |      FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qv)+1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv)+1),
        |         i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM q JOIN c ON ql <> cl)
        |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors q208: identical count/sqrt-weight/probability arithmetic
    // (operand order preserved), md5 hash-bucket selection
    "q208_temperature_sample" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |           FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt,
         |          sum(sqrt(CAST(n AS DOUBLE))) AS sw FROM c),
         |p AS (SELECT lang,
         |        least(CAST(1.0 AS DOUBLE),
         |          tot.nt * sqrt(CAST(c.n AS DOUBLE)) / tot.sw
         |            / CAST(c.n AS DOUBLE)) AS prob
         |      FROM c CROSS JOIN tot)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN p ON d.lang = p.lang
         |WHERE ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      < CAST(floor(prob * 1000000) AS BIGINT)""".stripMargin,

    // mirrors q209: q195's one-iteration centroid update (exact integer
    // sums, double->REAL float storage) rebuilt as vectors, then q42's
    // assignment/probe/re-rank pipeline over the TRAINED centroids
    "q209_ann_ivf_trained" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |          ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |          LIMIT 8),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent0 c) WHERE rk = 1),
         |qz AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign0 a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM qz)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent0)),
         |cent AS (
         |  SELECT cd.cid, list(
         |      CASE WHEN s.n IS NULL THEN cd.ce[cd.dim + 1]
         |           ELSE CAST(CAST(s.s AS DOUBLE)
         |             / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) END
         |      ORDER BY cd.dim) AS ce
         |  FROM centd cd LEFT JOIN sums s
         |    ON s.cid = cd.cid AND s.dim = cd.dim
         |  GROUP BY cd.cid),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN emb qe ON qe.vec_id = query_id
         |  JOIN emb ne ON ne.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors q210: q61's recursive component labels -> component (or
    // own-id) split key -> q66's hash buckets on that key
    "q210_leakage_safe_split" ->
      s"""WITH RECURSIVE ${minhashChainSql("documents")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src),
         |k AS (
         |  SELECT d.doc_id, d.lang,
         |    COALESCE(c.component, d.doc_id) AS skey
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |h AS (
         |  SELECT doc_id, lang,
         |    ${PortableHash.sqlHash60("CAST(skey AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM k)
         |SELECT doc_id, lang,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin,

    // mirrors q211: q209's trained-centroid CTEs, q42-style assignment,
    // within-cluster pair join, exact cosine threshold
    "q211_semdedup" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |          ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |          LIMIT 8),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent0 c) WHERE rk = 1),
         |qz AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign0 a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM qz)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent0)),
         |cent AS (
         |  SELECT cd.cid, list(
         |      CASE WHEN s.n IS NULL THEN cd.ce[cd.dim + 1]
         |           ELSE CAST(CAST(s.s AS DOUBLE)
         |             / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) END
         |      ORDER BY cd.dim) AS ce
         |  FROM centd cd LEFT JOIN sums s
         |    ON s.cid = cd.cid AND s.dim = cd.dim
         |  GROUP BY cd.cid),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |av AS (SELECT a.vec_id, a.cid, e.embedding
         |       FROM assign a JOIN emb e USING (vec_id))
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |  round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
         |FROM av x JOIN av y
         |  ON x.cid = y.cid AND x.vec_id < y.vec_id
         |WHERE ${cosSql("x.embedding", "y.embedding")} >= 0.4""".stripMargin,

    // mirrors q212: q197's two learned rules; rule 1 applied in the
    // string domain (leftmost-first alternation); symbols then
    // paren-encoded '(s1)(s2)…' so rule 2's global regexp_replace has
    // exact symbol boundaries and leftmost non-overlapping scan —
    // verified equal to the fold incl. odd identical runs ((a)(a)(a)
    // with rule (a,a) -> (aa)(a))
    "q212_bpe_replay2" -> bpeReplay2Sql,

    // q214 runs the SAME computation through JobRunner params files
    "q214_bpe_pipeline" -> bpeReplay2Sql,

    // mirrors q216: the q212 segmentation as a nested CTE; per-doc word
    // explode joins it, subword length = symbols in the segmented string
    "q216_bpe_token_counts" ->
      s"""WITH seg AS ($bpeReplay2Sql),
         |dtk AS (SELECT doc_id, unnest(string_split_regex(trim(
         |          regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
         |          '\\s+')) AS word FROM documents),
         |tw AS (SELECT doc_id, word FROM dtk
         |       WHERE word IS NOT NULL AND word <> '')
         |SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(COALESCE(len(string_split(seg.segmented, ' ')),
         |    length(tw.word) + 1)) AS BIGINT) AS n_subwords
         |FROM tw LEFT JOIN seg ON tw.word = seg.word
         |GROUP BY tw.doc_id""".stripMargin,

    // mirrors q213: q23's exact top-5 neighbor list -> per-label vote
    // counts -> (votes DESC, label ASC) argmax
    "q213_knn_labels" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label
         |           FROM embeddings),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        label AS nl FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, nl,
         |    ${cosSql("qv", "cv")} AS cosine
         |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
         |top AS (
         |  SELECT query_id, neighbor_id, nl FROM scored
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) <= 5),
         |votes AS (
         |  SELECT query_id, nl, CAST(count(*) AS BIGINT) AS v
         |  FROM top GROUP BY query_id, nl),
         |win AS (
         |  SELECT query_id, nl AS predicted, v AS n_agree FROM votes
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY v DESC, nl) = 1)
         |SELECT w.query_id AS vec_id, e.label, w.predicted, w.n_agree,
         |  e.label <> w.predicted AS flagged
         |FROM win w JOIN embeddings e ON e.vec_id = w.query_id""".stripMargin,

    // mirrors q215: same md5 cell addressing as q134, inner product per
    // depth row, min across rows, plus the true join count
    "q215_cms_join_size" ->
      s"""WITH rws AS (SELECT unnest([0, 1, 2, 3]) AS rw),
         |sa AS (
         |  SELECT rw,
         |    ${PortableHash.sqlHash60(
        "'cms_' || CAST(rw AS VARCHAR) || '_' || CAST(o_custkey AS VARCHAR)")}
         |      % 2048 AS bucket,
         |    CAST(count(*) AS BIGINT) AS ca
         |  FROM orders, rws WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
         |sb AS (
         |  SELECT rw,
         |    ${PortableHash.sqlHash60(
        "'cms_' || CAST(rw AS VARCHAR) || '_' || CAST(c_custkey AS VARCHAR)")}
         |      % 2048 AS bucket,
         |    CAST(count(*) AS BIGINT) AS cb
         |  FROM customer, rws WHERE c_custkey IS NOT NULL GROUP BY 1, 2),
         |ip AS (SELECT sa.rw, CAST(sum(sa.ca * sb.cb) AS BIGINT) AS p
         |       FROM sa JOIN sb USING (rw, bucket) GROUP BY sa.rw),
         |est AS (SELECT CAST(min(p) AS BIGINT) AS est_join_size FROM ip),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS true_join_size
         |       FROM orders JOIN customer ON o_custkey = c_custkey)
         |SELECT est.est_join_size, ex.true_join_size
         |FROM est CROSS JOIN ex""".stripMargin,

    // mirrors q221: same token split, digest distinct, source shares
    "q221_dataset_card" ->
      """WITH b AS (SELECT doc_id, text, source FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        |  FROM b),
        |shr AS (
        |  SELECT CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mss
        |  FROM (SELECT count(*) AS n FROM b GROUP BY source))
        |SELECT metric, value FROM agg CROSS JOIN shr CROSS JOIN (VALUES
        |  ('n_docs'), ('n_tokens'), ('n_sources'), ('mean_doc_tokens'),
        |  ('exact_dup_fraction'), ('max_source_share')) AS m(metric)
        |CROSS JOIN LATERAL (SELECT CASE metric
        |  WHEN 'n_docs' THEN CAST(n_docs AS DOUBLE)
        |  WHEN 'n_tokens' THEN CAST(n_tokens AS DOUBLE)
        |  WHEN 'n_sources' THEN CAST(n_sources AS DOUBLE)
        |  WHEN 'mean_doc_tokens'
        |    THEN round(CAST(n_tokens AS DOUBLE) / n_docs, 6)
        |  WHEN 'exact_dup_fraction'
        |    THEN round(CAST(1.0 AS DOUBLE)
        |      - CAST(n_distinct AS DOUBLE) / n_docs, 6)
        |  ELSE round(mss, 6) END AS value) v""".stripMargin,

    // mirrors q222: hash-min seed, then two argmin-of-max-cosine rounds
    // with (similarity ASC, id ASC) tie-breaks
    "q222_kmeans_farthest_init" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |c1 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |       ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |       LIMIT 1),
         |c2 AS (
         |  SELECT e.vec_id AS cid, e.embedding AS ce
         |  FROM emb e CROSS JOIN c1
         |  ORDER BY ${cosSql("e.embedding", "c1.ce")} ASC, e.vec_id
         |  LIMIT 1),
         |c3 AS (
         |  SELECT e.vec_id AS cid, e.embedding AS ce
         |  FROM emb e CROSS JOIN c1 CROSS JOIN c2
         |  ORDER BY greatest(${cosSql("e.embedding", "c1.ce")},
         |                    ${cosSql("e.embedding", "c2.ce")}) ASC,
         |    e.vec_id
         |  LIMIT 1),
         |sel AS (
         |  SELECT 1 AS sel, cid, ce FROM c1
         |  UNION ALL SELECT 2, cid, ce FROM c2
         |  UNION ALL SELECT 3, cid, ce FROM c3)
         |SELECT CAST(sel AS INTEGER) AS sel, cid,
         |  CAST(g - 1 AS INTEGER) AS dim,
         |  round(CAST(ce[g] AS DOUBLE), 6) AS val
         |FROM (SELECT sel, cid, ce,
         |        unnest(generate_series(1, len(ce))) AS g FROM sel)""".stripMargin,

    // mirrors q223: brute top-1 truth + q42's IVF pipeline, reciprocal
    // rank of the first relevant hit (every literal CAST to DOUBLE)
    "q223_retrieval_eval" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id, embedding FROM emb WHERE vec_id % 50 = 0),
         |truth AS (
         |  SELECT vec_id AS query_id, cid2 AS relevant_id FROM (
         |    SELECT q.vec_id, c.vec_id AS cid2,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
         |          c.vec_id) AS rk
         |    FROM qs q JOIN emb c ON q.vec_id <> c.vec_id) x
         |  WHERE x.rk = 1),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 128),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |res AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM (
         |    SELECT query_id, neighbor_id,
         |      ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |    FROM cand
         |    JOIN emb qe ON qe.vec_id = query_id
         |    JOIN emb ne ON ne.vec_id = neighbor_id) s
         |  QUALIFY rk <= 5),
         |firsts AS (
         |  SELECT t.query_id, min(r.rk) AS frk
         |  FROM truth t LEFT JOIN res r
         |    ON r.query_id = t.query_id AND r.neighbor_id = t.relevant_id
         |  GROUP BY t.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(CASE WHEN frk IS NOT NULL THEN CAST(1 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS recall_at_k,
         |  round(avg(CASE WHEN frk IS NOT NULL
         |    THEN CAST(1 AS DOUBLE) / frk
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS mrr
         |FROM firsts""".stripMargin,

    // mirrors q224: q223's metrics with the retrieval side running over
    // ONE-iteration-trained centroids (the q209 update chain at k=128)
    "q224_retrieval_eval_trained" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id, embedding FROM emb WHERE vec_id % 50 = 0),
         |truth AS (
         |  SELECT vec_id AS query_id, cid2 AS relevant_id FROM (
         |    SELECT q.vec_id, c.vec_id AS cid2,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
         |          c.vec_id) AS rk
         |    FROM qs q JOIN emb c ON q.vec_id <> c.vec_id) x
         |  WHERE x.rk = 1),
         |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |          ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |          LIMIT 128),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent0 c) WHERE rk = 1),
         |qz AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign0 a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM qz)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent0)),
         |cent AS (
         |  SELECT cd.cid, list(
         |      CASE WHEN s.n IS NULL THEN cd.ce[cd.dim + 1]
         |           ELSE CAST(CAST(s.s AS DOUBLE)
         |             / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) END
         |      ORDER BY cd.dim) AS ce
         |  FROM centd cd LEFT JOIN sums s
         |    ON s.cid = cd.cid AND s.dim = cd.dim
         |  GROUP BY cd.cid),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |res AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM (
         |    SELECT query_id, neighbor_id,
         |      ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |    FROM cand
         |    JOIN emb qe ON qe.vec_id = query_id
         |    JOIN emb ne ON ne.vec_id = neighbor_id) s
         |  QUALIFY rk <= 5),
         |firsts AS (
         |  SELECT t.query_id, min(r.rk) AS frk
         |  FROM truth t LEFT JOIN res r
         |    ON r.query_id = t.query_id AND r.neighbor_id = t.relevant_id
         |  GROUP BY t.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(CASE WHEN frk IS NOT NULL THEN CAST(1 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS recall_at_k,
         |  round(avg(CASE WHEN frk IS NOT NULL
         |    THEN CAST(1 AS DOUBLE) / frk
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS mrr
         |FROM firsts""".stripMargin,

    // mirrors q225: weighted out-mass (sum of line counts per source),
    // per-edge floor(scale·r·w / srcW) contributions — exact longs
    "q225_weighted_pagerank" ->
      """WITH e AS (SELECT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst,
        |             CAST(count(*) AS BIGINT) AS w
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |           GROUP BY 1, 2),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |contrib AS (
        |  SELECT e.dst, CAST(sum(CAST(floor(CAST(1000000000 AS DOUBLE)
        |      * r0.r * e.w / deg.deg) AS BIGINT)) AS BIGINT) AS qin
        |  FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE))
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST((SELECT q FROM dm) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE) / (SELECT n FROM nn)) AS rank
        |FROM nodes nd LEFT JOIN contrib c ON nd.id = c.dst""".stripMargin,

    // mirrors q226: teleport + dangling mass confined to the seed set
    "q226_personalized_pagerank" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 10 = 0),
        |ss AS (SELECT CAST(count(*) AS BIGINT) AS s FROM seeds),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |srcq AS (SELECT deg.src, CAST(floor(CAST(1000000000 AS DOUBLE)
        |             * r0.r / deg.deg) AS BIGINT) AS q
        |         FROM r0 JOIN deg ON r0.id = deg.src),
        |contrib AS (SELECT e.dst, CAST(sum(srcq.q) AS BIGINT) AS qin
        |            FROM e JOIN srcq ON e.src = srcq.src GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  CASE WHEN sd.id IS NOT NULL THEN
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT s FROM ss)
        |    + CAST(0.85 AS DOUBLE)
        |      * (CAST((SELECT q FROM dm) AS DOUBLE)
        |         / CAST(1000000000 AS DOUBLE) / (SELECT s FROM ss))
        |  ELSE CAST(0 AS DOUBLE) END
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE)) AS rank
        |FROM nodes nd
        |LEFT JOIN contrib c ON nd.id = c.dst
        |LEFT JOIN seeds sd ON nd.id = sd.id""".stripMargin,

    // mirrors q227: two unrolled HITS rounds (a1=indeg, h1=Σa1, a2=Σh1,
    // h2=Σa2) — integer sums throughout, L1 normalization at the end
    "q227_hits" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |a1 AS (SELECT nd.id,
        |         CAST(COALESCE(x.a, 0) AS BIGINT) AS a
        |       FROM nodes nd LEFT JOIN (
        |         SELECT dst AS id, CAST(count(*) AS BIGINT) AS a
        |         FROM e GROUP BY dst) x ON nd.id = x.id),
        |h1 AS (SELECT nd.id,
        |         CAST(COALESCE(x.h, 0) AS BIGINT) AS h
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h
        |         FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src) x
        |         ON nd.id = x.id),
        |a2 AS (SELECT nd.id,
        |         CAST(COALESCE(x.a, 0) AS BIGINT) AS a
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a
        |         FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst) x
        |         ON nd.id = x.id),
        |h2 AS (SELECT nd.id,
        |         CAST(COALESCE(x.h, 0) AS BIGINT) AS h
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h
        |         FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src) x
        |         ON nd.id = x.id),
        |tot AS (SELECT CAST((SELECT sum(a) FROM a2) AS DOUBLE) AS at,
        |               CAST((SELECT sum(h) FROM h2) AS DOUBLE) AS ht)
        |SELECT a2.id, a2.a AS authority_raw, h2.h AS hub_raw,
        |  round(CAST(a2.a AS DOUBLE) / tot.at, 9) AS authority,
        |  round(CAST(h2.h AS DOUBLE) / tot.ht, 9) AS hub
        |FROM a2 JOIN h2 ON a2.id = h2.id CROSS JOIN tot""".stripMargin,

    // mirrors q228: q61's near-dup pair chain, symmetric neighbor votes
    // from the UNMASKED-labeled side, (count DESC, label ASC) majority
    "q228_label_propagation" ->
      s"""WITH RECURSIVE ${minhashChainSql("documents")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |masked AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang
         |  FROM documents),
         |sym AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |votes AS (
         |  SELECT u, nl, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT s.u, m.lang AS nl
         |    FROM sym s JOIN masked m ON s.v = m.doc_id
         |    WHERE m.lang IS NOT NULL) x
         |  GROUP BY u, nl),
         |win AS (
         |  SELECT u, nl AS prop FROM votes
         |  QUALIFY row_number() OVER (PARTITION BY u
         |    ORDER BY c DESC, nl) = 1)
         |SELECT m.doc_id, COALESCE(m.lang, w.prop) AS lang,
         |  CASE WHEN m.lang IS NOT NULL THEN 'own'
         |       WHEN w.prop IS NOT NULL THEN 'propagated'
         |       ELSE 'none' END AS label_source
         |FROM masked m LEFT JOIN win w ON m.doc_id = w.u""".stripMargin,

    // mirrors q230: q221's metric arithmetic per source group
    "q230_source_cards" ->
      """WITH agg AS (
        |  SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        |  FROM documents GROUP BY source)
        |SELECT grp AS "group", metric,
        |  CASE metric
        |    WHEN 'n_docs' THEN CAST(n_docs AS DOUBLE)
        |    WHEN 'n_tokens' THEN CAST(n_tokens AS DOUBLE)
        |    WHEN 'mean_doc_tokens'
        |      THEN round(CAST(n_tokens AS DOUBLE) / n_docs, 6)
        |    ELSE round(CAST(1.0 AS DOUBLE)
        |      - CAST(n_distinct AS DOUBLE) / n_docs, 6) END AS value
        |FROM agg CROSS JOIN (VALUES
        |  ('n_docs'), ('n_tokens'), ('mean_doc_tokens'),
        |  ('exact_dup_fraction')) AS m(metric)""".stripMargin,

    // mirrors q202: identical dense item index (row_number over sorted
    // part keys), md5 slot hash mod |items|, own-positive collision drop
    "q202_negative_samples" ->
      s"""WITH pos AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS user_id,
         |               CAST(l_partkey AS BIGINT) AS item_id
         |             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |p10 AS (SELECT * FROM pos WHERE user_id % 10 = 0),
         |idx AS (SELECT item, row_number() OVER (ORDER BY item) - 1 AS ix
         |        FROM (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS item
         |              FROM part)),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM idx),
         |draws AS (SELECT user_id, item_id, j,
         |            ${PortableHash.sqlHash60(
      "CAST(user_id AS VARCHAR) || ':' || CAST(item_id AS VARCHAR) " +
        "|| ':' || CAST(j AS VARCHAR)")}
         |              % (SELECT m FROM m) AS ix
         |          FROM p10 CROSS JOIN
         |            (SELECT unnest(generate_series(1, 3)) AS j))
         |SELECT d.user_id, d.item_id, CAST(d.j AS INTEGER) AS j,
         |  idx.item AS neg_item
         |FROM draws d JOIN idx ON d.ix = idx.ix
         |WHERE idx.item <> d.item_id""".stripMargin,

    // mirrors q203: ceil copy count via the identical (mx + n - 1) / n
    // double division in both engines
    "q203_upsample_balanced" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |mx AS (SELECT CAST(max(n) AS BIGINT) AS mx FROM c)
        |SELECT d.doc_id, d.lang, CAST(g AS INTEGER) AS replica
        |FROM documents d
        |JOIN c ON d.lang = c.lang
        |CROSS JOIN mx
        |CROSS JOIN unnest(generate_series(1,
        |  CAST(floor(CAST(mx.mx + c.n - 1 AS DOUBLE)
        |             / CAST(c.n AS DOUBLE)) AS BIGINT))) AS t(g)""".stripMargin,

    // mirrors q204: learn round 1 (q197's r1 CTE), then segment every
    // vocabulary word with the single learned rule via the same
    // leftmost-first alternation, symbols joined by spaces
    "q204_bpe_segment" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1)
        |SELECT w AS word, freq,
        |  array_to_string(regexp_extract_all(w || '</w>',
        |    '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |    '|</w>|.)'), ' ') AS segmented
        |FROM words""".stripMargin,

    // mirrors q231: identical vocab (top-30 by count desc, token asc over
    // the doc_id%5 seed), add-one likelihoods over the 31-token space as
    // the same double ratios, per-(doc,label) log-prob sums rounded to 6,
    // argmax tie-broken by label asc
    "q231_naive_bayes" ->
      s"""$nbChainSql
         |SELECT b.doc_id, b.predicted, d.lang AS actual,
         |  b.predicted = d.lang AS correct, b.score
         |FROM best b JOIN documents d ON b.doc_id = d.doc_id
         |WHERE b.rk = 1""".stripMargin,

    // mirrors q241: identical signal arithmetic (integer sums, one
    // division each), flags on the UNROUNDED values, ratios rounded 6
    "q241_gopher_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE)
        |      / CAST(len(tk) AS DOUBLE) AS mean_len,
        |    CAST((length(text) - length(replace(text, '#', '')))
        |      + (length(text) - length(replace(text, '...', ''))) / 3
        |      AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS sym,
        |    CAST(len(list_filter(tk, t -> regexp_matches(t, '[a-z]')))
        |      AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS alpha,
        |    CAST(len(list_filter(tk, t -> t IN ('the', 'be', 'to', 'of',
        |      'and', 'that', 'have', 'with'))) AS BIGINT) AS n_stop
        |  FROM tk)
        |SELECT doc_id, n_words,
        |  round(mean_len, 6) AS mean_word_len,
        |  round(sym, 6) AS symbol_ratio,
        |  round(alpha, 6) AS alpha_word_ratio,
        |  n_stop AS n_stopwords,
        |  n_words >= 50 AND n_words <= 100000 AS word_count_ok,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_len_ok,
        |  sym <= 0.1 AS symbol_ok,
        |  alpha >= 0.8 AS alpha_ok,
        |  n_stop >= 2 AS stopword_ok,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND sym <= 0.1 AND alpha >= 0.8 AND n_stop >= 2 AS pass
        |FROM m""".stripMargin,

    // mirrors q240: the three parameterized chains composed exactly as
    // the params stages run them — span cleaning over documents, DSIR
    // over the cleaned text against the raw %25 target, Gumbel-top-100,
    // NB seeded on the raw %5 slice scoring the selected clean text
    "q240_curation_pipeline" ->
      s"""WITH ${spanCleanBodySql("SELECT doc_id, text FROM documents")},
         |${dsirChainBodySql(
        "SELECT doc_id, clean_text AS text FROM cleaned",
        "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0")},
         |keyed AS (
         |  SELECT doc_id, log_weight,
         |    round(log_weight - ln(-ln(
         |      (CAST(${PortableHash.sqlHash60(
        "CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5)
         |        / 1000000.0)), 6) AS sample_key
         |  FROM w),
         |sel AS (
         |  SELECT doc_id, log_weight, CAST(rank AS INTEGER) AS rank
         |  FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC,
         |          doc_id) AS rank FROM keyed)
         |  WHERE rank <= 100),
         |${nbChainBodySql(
        "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
        "SELECT s.doc_id, c.clean_text AS text FROM sel s " +
          "JOIN cleaned c ON c.doc_id = s.doc_id")}
         |SELECT s.doc_id, s.log_weight, s.rank,
         |  b.predicted, b.score
         |FROM sel s JOIN best b ON b.doc_id = s.doc_id AND b.rk = 1""".stripMargin,

    // mirrors q239: q21's candidate chain, then exact Levenshtein on
    // the pair texts (integer distance — no rounding anywhere)
    "q239_editdist_dedup" ->
      s"""WITH ${minhashChainSql("documents")}
         |SELECT c.id_a, c.id_b,
         |  CAST(levenshtein(da.text, db.text) AS INTEGER)
         |    AS edit_distance
         |FROM cand c
         |JOIN documents da ON da.doc_id = c.id_a
         |JOIN documents db ON db.doc_id = c.id_b
         |WHERE levenshtein(da.text, db.text) <= 30""".stripMargin,

    // mirrors q238: identical sign-LSH signatures (4 tables x 8 bits
    // over the md5-derived hyperplanes), benchmark = vec_id%25,
    // candidates from bucket equality, sequential-order cosine, matched
    // rows grouped to (count, rounded max)
    "q238_semantic_decontaminate" -> semanticDeconSql,

    // q248 streams the same stateless check per micro-batch against the
    // once-prepared benchmark — q238's oracle again
    "q248_stream_semantic_decon" -> semanticDeconSql,

    // mirrors TextAnalysis.rougeN (n=2): clipped bigram MULTISET
    // matches per adjacent-doc pair; Spark's short-row guard (texts
    // with < n tokens yield ZERO grams, no truncated tail) is the CASE
    // WHEN; zero-overlap pairs survive via the totals LEFT JOIN
    "q253_rouge_eval" ->
      """WITH p AS (
        |  SELECT a.doc_id AS pair_id, a.text AS cand, b.text AS ref
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 5 = 0),
        |tok AS (SELECT pair_id,
        |  string_split_regex(trim(lower(cand)), '\s+') AS ct,
        |  string_split_regex(trim(lower(ref)), '\s+') AS rt FROM p),
        |g AS (SELECT pair_id,
        |  CASE WHEN len(ct) >= 2 THEN list_transform(range(0, len(ct)-1),
        |    i -> array_to_string(ct[i+1:i+2], ' ')) ELSE [] END AS cg,
        |  CASE WHEN len(rt) >= 2 THEN list_transform(range(0, len(rt)-1),
        |    i -> array_to_string(rt[i+1:i+2], ' ')) ELSE [] END AS rg
        |  FROM tok),
        |cc AS (SELECT pair_id, gg AS gram, count(*) AS c
        |  FROM (SELECT pair_id, unnest(cg) AS gg FROM g) GROUP BY 1, 2),
        |rc AS (SELECT pair_id, gg AS gram, count(*) AS r
        |  FROM (SELECT pair_id, unnest(rg) AS gg FROM g) GROUP BY 1, 2),
        |m AS (SELECT pair_id, CAST(sum(least(c, r)) AS BIGINT) AS mt
        |  FROM cc JOIN rc USING (pair_id, gram) GROUP BY 1),
        |tot AS (SELECT pair_id, len(cg) AS cand_total,
        |  len(rg) AS ref_total FROM g)
        |SELECT t.pair_id, coalesce(mt, 0) AS match_count,
        |  cand_total, ref_total,
        |  round(CASE WHEN cand_total > 0
        |    THEN CAST(coalesce(mt, 0) AS DOUBLE) / cand_total
        |    ELSE 0 END, 6) AS precision,
        |  round(CASE WHEN ref_total > 0
        |    THEN CAST(coalesce(mt, 0) AS DOUBLE) / ref_total
        |    ELSE 0 END, 6) AS recall,
        |  round(CASE WHEN coalesce(mt, 0) > 0 THEN
        |    2.0 * (CAST(mt AS DOUBLE) / cand_total)
        |        * (CAST(mt AS DOUBLE) / ref_total)
        |    / ((CAST(mt AS DOUBLE) / cand_total)
        |        + (CAST(mt AS DOUBLE) / ref_total))
        |    ELSE 0 END, 6) AS f1
        |FROM tot t LEFT JOIN m USING (pair_id)""".stripMargin,

    // mirrors q268: q249's CTEs -> lex rank -> self-fused RRF score
    // (2/(60+rank), rounded 6) with the rank re-derived from it —
    // identical to the lex rank because the fused score is strictly
    // decreasing in rank
    "q268_retrieval_pipeline" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)},
         |lex AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, doc_id)
         |      AS INTEGER) AS rank
         |  FROM sc
         |  QUALIFY rank <= 5)
         |SELECT query_id, doc_id,
         |  round(2 * (1.0 / (60 + CAST(rank AS DOUBLE))), 6) AS rrf_score,
         |  rank
         |FROM lex""".stripMargin,

    // mirrors Sampling.unimaxAllocate(source, n_tokens, B=52000, E=2):
    // ascending-cap prefix test in exact BIGINT (cap·remaining ≤
    // B−prior), capped groups take their cap, the rest share one
    // IEEE-exact waterline division
    "q269_unimax_alloc" ->
      s"""WITH t AS (
         |  SELECT source,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
         |      AS INTEGER) AS n_tokens
         |  FROM documents),
         |g AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS gw
         |  FROM t GROUP BY source),
         |r AS (SELECT source, gw, gw * 2 AS cap,
         |    row_number() OVER (ORDER BY gw * 2, source) AS rn,
         |    count(*) OVER () AS n,
         |    COALESCE(CAST(SUM(gw * 2) OVER (ORDER BY gw * 2, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS prior
         |  FROM g),
         |f AS (SELECT r.*, cap * (n - rn + 1) <= 52000 - prior AS capped
         |  FROM r),
         |a AS (SELECT
         |    CAST(COALESCE(SUM(cap) FILTER (WHERE capped), 0) AS BIGINT)
         |      AS csum,
         |    CAST(COALESCE(SUM(CASE WHEN capped THEN 0 ELSE 1 END), 0)
         |      AS BIGINT) AS un
         |  FROM f)
         |SELECT source, gw AS group_weight, cap,
         |  round(CASE WHEN capped THEN CAST(cap AS DOUBLE)
         |    ELSE (52000 - csum) / CAST(un AS DOUBLE) END, 6) AS allocated,
         |  round(CASE WHEN gw = 0 THEN 0.0
         |    ELSE (CASE WHEN capped THEN CAST(cap AS DOUBLE)
         |      ELSE (52000 - csum) / CAST(un AS DOUBLE) END)
         |      / CAST(gw AS DOUBLE) END, 6) AS epochs
         |FROM f, a""".stripMargin,

    // mirrors Sampling.unimaxSelect(doc_id, source, n_tokens, B=24000,
    // E=1): the q269 allocation CTE feeding q74's running-sum
    // crossing-row rule, against the UNROUNDED waterline
    "q270_unimax_select" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
         |      AS INTEGER) AS n_tokens,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS bkt
         |  FROM documents),
         |g AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS gw
         |  FROM t GROUP BY source),
         |r AS (SELECT source, gw, gw * 1 AS cap,
         |    row_number() OVER (ORDER BY gw * 1, source) AS rn,
         |    count(*) OVER () AS n,
         |    COALESCE(CAST(SUM(gw * 1) OVER (ORDER BY gw * 1, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS prior
         |  FROM g),
         |f AS (SELECT r.*, cap * (n - rn + 1) <= 24000 - prior AS capped
         |  FROM r),
         |a AS (SELECT
         |    CAST(COALESCE(SUM(cap) FILTER (WHERE capped), 0) AS BIGINT)
         |      AS csum,
         |    CAST(COALESCE(SUM(CASE WHEN capped THEN 0 ELSE 1 END), 0)
         |      AS BIGINT) AS un
         |  FROM f),
         |alloc AS (SELECT source,
         |    CASE WHEN capped THEN CAST(cap AS DOUBLE)
         |      ELSE (24000 - csum) / CAST(un AS DOUBLE) END AS budget
         |  FROM f, a)
         |SELECT doc_id, source, n_tokens
         |FROM t JOIN alloc USING (source)
         |QUALIFY SUM(CAST(n_tokens AS DOUBLE)) OVER (PARTITION BY source
         |  ORDER BY bkt, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  - n_tokens < budget""".stripMargin,

    // mirrors Similarity.pqCodebooks + pqEncode (dim 64, m=8, ks=16):
    // identical hash-ordered codeword ranks, list-slice subvectors, and
    // squared-L2 argmin with ties to the smaller code
    "q271_pq_codes" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j))
         |SELECT vec_id, j, code FROM (
         |  SELECT v.vec_id, v.j, c.code,
         |    row_number() OVER (PARTITION BY v.vec_id, v.j
         |      ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |  FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1""".stripMargin,

    // mirrors Similarity.pqTopK (k=5): the q271 encode CTEs + per-query
    // fixed-point distance tables; approximate distance is the exact
    // BIGINT sum of 8 table lookups
    "q272_ann_pq" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2Sql("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |ad AS (
         |  SELECT t.query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(t.qd) AS BIGINT) AS adfix
         |  FROM enc e JOIN qt t ON e.j = t.j AND e.code = t.code
         |  WHERE t.query_id <> e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id,
         |  round(adfix / 1048576.0, 6) AS pq_dist
         |FROM ad
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adfix, neighbor_id) <= 5""".stripMargin,

    // mirrors q274: q185's bigram CTEs with the model CTEs restricted
    // to the reference subset (doc_id % 3 = 0, incl. the vocab size v),
    // all docs scored, then q78's percent_rank band per lang
    "q274_ccnet_pipeline" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |ref AS (SELECT doc_id, ts FROM tk WHERE doc_id % 3 = 0),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM ref)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM ref WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |scored AS (
        |  SELECT doc_id,
        |    round(avg(ln(
        |      (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |      (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |      AS bigram_logprob
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |    CROSS JOIN vv
        |  GROUP BY doc_id)
        |SELECT s.doc_id, k.lang, s.bigram_logprob
        |FROM scored s JOIN tk k USING (doc_id)
        |QUALIFY percent_rank() OVER (
        |  PARTITION BY k.lang ORDER BY s.bigram_logprob)
        |  BETWEEN 0.25 AND 1.0""".stripMargin,

    // mirrors q280: q231's NB chain, per-class mean-self-score
    // thresholds (rounded 6), threshold-cleared argmax, joint counts
    "q280_confident_joint" ->
      s"""$nbChainSql,
         |thr AS (
         |  SELECT s.label, round(avg(s.score), 6) AS thr
         |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE s.label = d.lang
         |  GROUP BY s.label),
         |pass AS (
         |  SELECT s.doc_id, s.label, s.score FROM scored s
         |  JOIN thr t ON t.label = s.label
         |  WHERE s.score >= t.thr),
         |jh AS (
         |  SELECT doc_id, label FROM (
         |    SELECT doc_id, label,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, label) AS rk
         |    FROM pass) WHERE rk = 1)
         |SELECT d.lang AS given_label, j.label AS suggested_label,
         |  CAST(count(*) AS BIGINT) AS n,
         |  d.lang <> j.label AS off_diagonal
         |FROM jh j JOIN documents d ON d.doc_id = j.doc_id
         |GROUP BY 1, 2""".stripMargin,

    // mirrors Similarity.pqTopKRerank (shortlist=25, k=5): q272's ADC
    // CTEs shortlist by (adfix, neighbor_id), exact cosine re-ranks
    "q279_pq_rerank" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2Sql("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT t.query_id, e.vec_id AS neighbor_id,
         |      CAST(SUM(t.qd) AS BIGINT) AS adfix
         |    FROM enc e JOIN qt t ON e.j = t.j AND e.code = t.code
         |    WHERE t.query_id <> e.vec_id
         |    GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY adfix, neighbor_id) <= 25),
         |scored AS (
         |  SELECT s.query_id, s.neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM short s
         |  JOIN embeddings qe ON qe.vec_id = s.query_id
         |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors Similarity.randomProjection(dOut=16, table=0): the SAME
    // md5-derived planes (PortableHash.sqlPlanes), sequential-order
    // double dot products
    "q278_random_projection" ->
      s"""WITH planes AS (${PortableHash.sqlPlanes(1, 16, 64)}),
         |pl AS (SELECT b, list(w ORDER BY d) AS ws FROM planes
         |  WHERE t = 0 GROUP BY b)
         |SELECT e.vec_id, CAST(pl.b AS INTEGER) AS b,
         |  round(list_sum(list_transform(range(1, 65),
         |    i -> CAST(e.embedding[i] AS DOUBLE) * pl.ws[i])), 6) AS p
         |FROM embeddings e, pl""".stripMargin,

    // mirrors q277: q274's reference-trained model CTEs, per-bigram
    // logprobs, rank window (lp, w1, w2), ceil(0.2·n) slice, mean
    "q277_mink_prob" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |ref AS (SELECT doc_id, ts FROM tk WHERE doc_id % 3 = 0),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM ref)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM ref WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |lps AS (
        |  SELECT doc_id, w1, w2,
        |    ln((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |       (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v)) AS lp
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |    CROSS JOIN vv),
        |ranked AS (
        |  SELECT doc_id, lp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY lp, w1, w2) AS rn,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM lps)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_bigrams,
        |  round(avg(lp), 6) AS mink_logprob
        |FROM ranked
        |WHERE rn <= greatest(1, CAST(ceil(0.2 * n) AS BIGINT))
        |GROUP BY doc_id""".stripMargin,

    // mirrors Sampling.bootstrapReplicas(lambda=1, tag=b0): the SAME
    // Sampling.poissonCutoffs integers rendered as a CASE chain — the
    // CDF is quantized once in Scala, both engines compare integers
    "q276_bootstrap_sample" -> {
      val cuts = Sampling.poissonCutoffs(1.0, 8)
      val whens = cuts.zipWithIndex.map { case (c, i) =>
        s"WHEN bkt < $c THEN $i" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR) || ':b0'")}
         |      % 1000000 AS bkt
         |  FROM documents),
         |k AS (SELECT doc_id, lang,
         |  CASE $whens ELSE 8 END AS n FROM d)
         |SELECT doc_id, lang,
         |  CAST(unnest(generate_series(1, n)) AS INTEGER) AS replica
         |FROM k WHERE n >= 1""".stripMargin
    },

    // q275 streams the SAME vectors through per-micro-batch pqEncode
    // against the frozen full-corpus codebook; stateless encode makes
    // the batched union equal q271's single shot restricted to the
    // streamed subset
    "q275_stream_pq_encode" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)
         |  WHERE e.vec_id % 4 = 0)
         |SELECT vec_id, j, code FROM (
         |  SELECT v.vec_id, v.j, c.code,
         |    row_number() OVER (PARTITION BY v.vec_id, v.j
         |      ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |  FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1""".stripMargin,

    // mirrors Similarity.ivfPqTopK (centroids=32, nprobe=4, k=5): the
    // q272 encode/distance-table CTEs gated by L2 cell assignment and
    // the probed-cell join
    "q273_ann_ivfpq" -> ivfPqSql,

    // q281 runs the SAME search through the prepared-artifact params
    // surface (codebooks/centroids/cid-partitioned codes written once,
    // IvfPqSearchPrepared replays them) — prepared ≡ one-shot is the
    // identity being gated, so the oracle IS q273's
    "q281_ivfpq_prepared" -> ivfPqSql,


    // mirrors TextAnalysis.tokenizerFertility: the q27 token mirrors
    // aggregated per language
    "q266_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |    AS BIGINT) AS n_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_subword_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CASE WHEN sum(len(string_split_regex(trim(lower(text)),
        |      '\s+'))) > 0
        |    THEN round(CAST(sum(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS DOUBLE)
        |      / sum(len(string_split_regex(trim(lower(text)), '\s+'))), 6)
        |    END AS fertility,
        |  CASE WHEN sum(len(string_split_regex(trim(lower(text)),
        |      '\s+'))) > 0
        |    THEN round(CAST(sum(length(text)) AS DOUBLE)
        |      / sum(len(string_split_regex(trim(lower(text)), '\s+'))), 6)
        |    END AS chars_per_token
        |FROM documents GROUP BY lang""".stripMargin,

    // mirrors TextAnalysis.scriptProfile over the q261-style fixture:
    // the deletion-count trick per script range ('g' flag — Spark's
    // regexp_replace is always global)
    "q267_script_profile" ->
      """WITH inj AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', 'аео')
        |    WHEN doc_id % 3 = 2 THEN translate(text, 'cpx', 'срх')
        |    ELSE text END AS t
        |  FROM documents),
        |g AS (SELECT source,
        |  CAST(sum(length(t)) AS BIGINT) AS n_chars,
        |  sum(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')))
        |    AS lat,
        |  sum(length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g')))
        |    AS cyr,
        |  sum(length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g')))
        |    AS cjk,
        |  sum(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))
        |    AS dig,
        |  sum(length(t) - length(regexp_replace(t, '[\s]', '', 'g')))
        |    AS spc
        |  FROM inj GROUP BY 1)
        |SELECT source, n_chars,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(lat AS DOUBLE) / n_chars, 6) END AS latin_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(cyr AS DOUBLE) / n_chars, 6) END
        |    AS cyrillic_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(cjk AS DOUBLE) / n_chars, 6) END AS cjk_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(dig AS DOUBLE) / n_chars, 6) END AS digit_frac,
        |  CASE WHEN n_chars > 0
        |    THEN round(CAST(spc AS DOUBLE) / n_chars, 6) END AS space_frac
        |FROM g""".stripMargin,

    // mirrors q265: same fixture, q25's per-chunk stopword-vote langId
    // (en-first tie CASE), then the doc x lang count + rank rollup
    "q265_mixed_language" -> {
      val scores = TextAnalysis.stopwords.map { case (lang, _) =>
        s"len(list_filter(ct, x -> x IN (${stopList(lang)}))) AS s_$lang"
      }.mkString(",\n  ")
      val pickCases = TextAnalysis.stopwords.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text
         |    || ' der die das und ist von mit ein der die das und ist'
         |    || ' von mit ein der die das und'
         |    ELSE text END AS text
         |  FROM documents WHERE doc_id % 5 < 2),
         |toks AS (SELECT doc_id,
         |  string_split_regex(trim(lower(text)), '\\s+') AS tk FROM base),
         |st AS (SELECT doc_id, tk,
         |  unnest(range(0, greatest(len(tk)-1, 0)+1, 20)) AS s FROM toks),
         |cts AS (SELECT doc_id, tk[s+1:s+20] AS ct FROM st),
         |sc AS (SELECT doc_id, $scores FROM cts),
         |pick AS (SELECT doc_id,
         |  CASE $pickCases ELSE 'und' END AS lang
         |  FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best
         |        FROM sc)),
         |bl AS (SELECT doc_id, lang, count(*) AS c
         |  FROM pick GROUP BY 1, 2),
         |rk AS (SELECT doc_id, lang, c, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY
         |      CASE WHEN lang = 'und' THEN 1 ELSE 0 END,
         |      c DESC, lang) AS rk FROM bl)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
         |  CAST(count(CASE WHEN lang <> 'und' THEN 1 END) AS BIGINT)
         |    AS n_langs,
         |  max(CASE WHEN rk = 1 THEN lang END) AS dominant_lang,
         |  round(CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
         |    / sum(c), 6) AS dominant_share
         |FROM rk GROUP BY doc_id""".stripMargin
    },

    // mirrors q264: the q21 chain's candidates + signatures; per pair
    // m = matching low-8-bit fraction, est = (m - 1/256)/(1 - 1/256)
    // clamped at 0
    "q264_bbit_minhash" ->
      s"""WITH ${minhashChainSql("documents")},
         |p AS (SELECT c.id_a, c.id_b, sa.sg AS ga, sb.sg AS gb
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b),
         |m AS (SELECT id_a, id_b,
         |  CAST(len(list_filter(range(1, 33),
         |    i -> (ga[i] % 256) = (gb[i] % 256))) AS DOUBLE) / 32 AS mf
         |  FROM p)
         |SELECT id_a, id_b,
         |  round(greatest((mf - 1.0/256) / (1 - 1.0/256), 0), 6)
         |    AS bbit_jaccard
         |FROM m""".stripMargin,

    // mirrors q263: the q21 minhash chain's raw candidates (cand CTE)
    // against the exact inverted-index pairs derived from the SAME
    // shingle sets; INTERSECT for the overlap
    "q263_candidate_recall" ->
      s"""WITH ${minhashChainSql(
            "(SELECT * FROM documents WHERE doc_id % 10 < 3)")},
         |inv2 AS (SELECT doc_id, len(shl) AS n, unnest(shl) AS s FROM sh),
         |tp AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM inv2 a JOIN inv2 b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, a.n, b.n
         |  HAVING CAST(count(*) AS DOUBLE)
         |    / (a.n + b.n - count(*)) >= 0.55),
         |gp AS (SELECT id_a, id_b FROM cand)
         |SELECT CAST(ng AS BIGINT) AS n_got, CAST(nt AS BIGINT) AS n_truth,
         |  CAST(nb AS BIGINT) AS n_both,
         |  round(CASE WHEN ng > 0
         |    THEN CAST(nb AS DOUBLE) / ng ELSE 0 END, 6) AS precision,
         |  round(CASE WHEN nt > 0
         |    THEN CAST(nb AS DOUBLE) / nt ELSE 0 END, 6) AS recall
         |FROM (SELECT count(*) AS ng FROM gp),
         |  (SELECT count(*) AS nt FROM tp),
         |  (SELECT count(*) AS nb FROM
         |    (SELECT * FROM gp INTERSECT SELECT * FROM tp))""".stripMargin,

    // mirrors Sampling.nucleusPerGroup: score-desc (rounded, id
    // tie-break) running char sum per source, keep while the
    // before-row sum is under half the source total (crossing row kept)
    "q262_nucleus" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |    CAST(doc_id % 97 AS DOUBLE) / 97.0 AS score
        |  FROM documents),
        |b AS (SELECT source, sum(n_chars) * 0.5 AS budget
        |  FROM d GROUP BY 1),
        |r AS (SELECT d.doc_id, d.source, d.n_chars, d.score, b.budget,
        |    sum(n_chars) OVER (PARTITION BY d.source
        |      ORDER BY -round(score, 6), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
        |      AS cumbefore
        |  FROM d JOIN b USING (source))
        |SELECT doc_id, source, n_chars, round(score, 6) AS score
        |FROM r WHERE coalesce(cumbefore, 0) < budget""".stripMargin,

    // mirrors TextAnalysis.augmentSpanMask: block b = floor((i-1)/5),
    // masked iff md5_60("s1_m_{id}_{b}") mod 1000 < 300; first token of
    // a masked block becomes <extra_id_b>, the rest drop
    "q260_span_mask" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE doc_id % 4 = 1),
        |m AS (SELECT doc_id, tk,
        |  list_transform(tk, (x, i) ->
        |    CASE WHEN CAST('0x' || substr(md5('s1_m_'
        |        || CAST(doc_id AS VARCHAR) || '_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)),
        |        1, 15) AS BIGINT) % 1000 >= 300 THEN x
        |      WHEN (i-1) % 5 = 0 THEN '<extra_id_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)
        |        || '>'
        |      ELSE '' END) AS mp,
        |  len(list_filter(tk, (x, i) ->
        |    CAST('0x' || substr(md5('s1_m_'
        |        || CAST(doc_id AS VARCHAR) || '_'
        |        || CAST(CAST(floor((i-1) / 5.0) AS BIGINT) AS VARCHAR)),
        |        1, 15) AS BIGINT) % 1000 < 300)) AS n_masked
        |  FROM tok)
        |SELECT doc_id,
        |  array_to_string(list_filter(mp, x -> x <> ''), ' ')
        |    AS text_masked,
        |  CAST(len(tk) AS INTEGER) AS n_tokens,
        |  CAST(n_masked AS INTEGER) AS n_masked
        |FROM m""".stripMargin,

    // mirrors q261: the same deterministic confusable injection, then
    // translate-based folding and the deletion-count signal
    "q261_homoglyphs" ->
      s"""WITH inj AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', 'аео')
         |    WHEN doc_id % 3 = 2 THEN translate(text, 'cpx', 'срх')
         |    ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  translate(t, '${TextAnalysis.homoglyphFrom}',
         |    '${TextAnalysis.homoglyphTo}') AS text_norm,
         |  CAST(length(t) - length(translate(t,
         |    '${TextAnalysis.homoglyphFrom}', '')) AS INTEGER)
         |    AS n_homoglyphs
         |FROM inj""".stripMargin,

    // mirrors Checks.lDiversityReport: per-class (size, distinct
    // sensitive), risky when diversity < 3; hour() matches Spark's hour
    "q259_l_diversity" ->
      """WITH c AS (
        |  SELECT count(*) AS sz, count(DISTINCT user_id) AS div FROM (
        |    SELECT event_type,
        |      CAST(extract(hour FROM ts) AS BIGINT) AS hour_bucket,
        |      user_id
        |    FROM events)
        |  GROUP BY event_type, hour_bucket)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(div) AS BIGINT) AS min_diversity,
        |  CAST(count(CASE WHEN div < 3 THEN 1 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(COALESCE(sum(CASE WHEN div < 3 THEN sz END), 0) AS BIGINT)
        |    AS n_risky_rows,
        |  CASE WHEN sum(sz) = 0 THEN NULL
        |    ELSE round(CAST(COALESCE(sum(CASE WHEN div < 3 THEN sz END), 0)
        |      AS DOUBLE) / sum(sz), 6) END AS risky_rate
        |FROM c""".stripMargin,

    // mirrors Dedup.winnowCandidates (k=3, w=4): positional 3-gram md5-60
    // hashes, per-window min with RIGHTMOST tie position (list_max over
    // the matching-position CASE — later positions overwrite), distinct
    // selected (doc, fp), df>1 prefilter, pair counts
    "q258_winnow_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id % 10 < 3),
        |sl AS (SELECT doc_id,
        |  CASE WHEN len(tk) >= 3 THEN list_transform(range(0, len(tk)-2),
        |    i -> array_to_string(tk[i+1:i+3], ' ')) ELSE [] END AS sl
        |  FROM tok),
        |hl0 AS (SELECT doc_id, list_transform(sl, s ->
        |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hl,
        |    len(sl) AS m FROM sl),
        |ok AS (SELECT doc_id, hl, m FROM hl0 WHERE m >= 4),
        |wm AS (SELECT doc_id, hl, list_transform(range(1, m-4+2),
        |    j -> list_min(hl[j:j+3])) AS wm FROM ok),
        |ps AS (SELECT doc_id, hl,
        |  list_distinct(list_transform(range(1, len(wm)+1), j ->
        |    list_max(list_transform(range(j, j+4),
        |      p -> CASE WHEN hl[p] = wm[j] THEN p ELSE 0 END)))) AS pos
        |  FROM wm),
        |f AS (SELECT DISTINCT doc_id, hl[p] AS fp
        |  FROM (SELECT doc_id, hl, unnest(pos) AS p FROM ps)),
        |d AS (SELECT doc_id, fp FROM f
        |  QUALIFY count(*) OVER (PARTITION BY fp) > 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // mirrors TextAnalysis.augmentTokenDropout: 1-based list_filter
    // index, the PortableHash 60-bit md5 of "{seed}_{id}_{pos}"
    "q256_token_dropout" -> dropoutSql,

    // q257 streams the same stateless dropout per micro-batch; batch
    // outputs union to the whole corpus — the identical oracle
    "q257_stream_dropout" -> dropoutSql,

    // mirrors TextAnalysis.canonicalUrl over the same synthesized messy
    // variants: fragment -> scheme/host lower -> www -> default port ->
    // tracking params + separator tidy -> trailing slash
    "q255_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || source || '.example.com:443/' || lang
        |      || '/item' || CAST(doc_id % 10 AS VARCHAR)
        |      || CASE WHEN doc_id % 3 = 0
        |           THEN '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR)
        |         WHEN doc_id % 3 = 1
        |           THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
        |             || '&utm_campaign=y&gclid=z'
        |         ELSE '/#frag' END AS url
        |  FROM documents),
        |st AS (SELECT doc_id, url,
        |  regexp_replace(url, '#.*$', '', 'g') AS nofrag FROM u),
        |parts AS (SELECT doc_id, url,
        |  lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_extract(nofrag,
        |    '^[A-Za-z]+://([^/?]+)', 1)), '^www\.', '', 'g') AS nowww,
        |  regexp_extract(nofrag, '^[A-Za-z]+://[^/?]+(.*)$', 1) AS pathq
        |  FROM st),
        |canon AS (SELECT doc_id, url,
        |  CASE WHEN scheme = '' THEN NULL ELSE
        |    scheme || '://' ||
        |    (CASE WHEN scheme = 'http'
        |        THEN regexp_replace(nowww, ':80$', '')
        |      WHEN scheme = 'https'
        |        THEN regexp_replace(nowww, ':443$', '')
        |      ELSE nowww END) ||
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(pathq,
        |        '([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&]*', '\1', 'g'),
        |      '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g'),
        |      '/+$', '', 'g')
        |  END AS canonical_url FROM parts)
        |SELECT canonical_url, count(*) AS n_urls,
        |  count(DISTINCT url) AS n_variants, min(doc_id) AS first_id
        |FROM canon GROUP BY 1""".stripMargin,

    // mirrors Similarity.mmrRerank (k=3, lambda=0.7): the greedy loop
    // unrolled to 3 rounds; each argmax orders by the MMR score rounded
    // to 6 (doc_id tie-break), msim accumulates via greatest over the
    // bit-identical cosSql; 0.7/0.3 written as DOUBLE subtraction so the
    // constants are the same IEEE doubles Scala computes
    "q254_mmr_rerank" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings),
         |cand AS (
         |  SELECT query_id, doc_id, round(cosine, 6) AS rel, cv
         |  FROM (SELECT query_id, doc_id, cv,
         |    ${cosSql("qv", "cv")} AS cosine
         |    FROM q CROSS JOIN c WHERE query_id <> doc_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, doc_id) <= 8),
         |s1 AS (SELECT query_id, doc_id, rel, cv FROM cand
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(rel, 6) DESC, doc_id) = 1),
         |m1 AS (SELECT cand.query_id, cand.doc_id, cand.rel, cand.cv,
         |    ${cosSql("cand.cv", "s1.cv")} AS msim
         |  FROM cand JOIN s1 ON cand.query_id = s1.query_id
         |    AND cand.doc_id <> s1.doc_id),
         |s2 AS (SELECT query_id, doc_id, rel, cv, msim FROM m1
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(CAST(0.7 AS DOUBLE) * rel
         |      - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim, 6)
         |      DESC, doc_id) = 1),
         |m2 AS (SELECT m1.query_id, m1.doc_id, m1.rel,
         |    greatest(m1.msim, ${cosSql("m1.cv", "s2.cv")}) AS msim
         |  FROM m1 JOIN s2 ON m1.query_id = s2.query_id
         |    AND m1.doc_id <> s2.doc_id),
         |s3 AS (SELECT query_id, doc_id, rel FROM m2
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(CAST(0.7 AS DOUBLE) * rel
         |      - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim, 6)
         |      DESC, doc_id) = 1)
         |SELECT query_id, doc_id, round(rel, 6) AS rel, 1 AS mmr_rank
         |FROM s1
         |UNION ALL SELECT query_id, doc_id, round(rel, 6), 2 FROM s2
         |UNION ALL SELECT query_id, doc_id, round(rel, 6), 3 FROM s3""".stripMargin,

    // q251 scores against the SAVED artifact and q252 streams the same
    // stateless scoring per micro-batch — both are value-identities on
    // the inline score table (no rank: ranking is the consumer's window)
    "q251_bm25_artifacts" -> bm25ScoresSql,
    "q252_stream_bm25" -> bm25ScoresSql,

    // mirrors q249 — see bm25BodySql
    "q249_bm25_retrieval" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)}
         |SELECT query_id, doc_id, score,
         |  CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id)
         |    AS INTEGER) AS rank
         |FROM sc
         |QUALIFY rank <= 5""".stripMargin,

    // mirrors q250: the BM25 list (q249's CTEs) and the brute-cosine
    // list (q23's math, self kept) fused by reciprocal rank — both
    // engines rank each list independently (score DESC, id) then sum
    // 1/(60 + rank) per (query, doc), rounded to 6 before the fused rank
    "q250_hybrid_retrieval" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)},
         |lex AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, doc_id)
         |      AS INTEGER) AS rank
         |  FROM sc
         |  QUALIFY rank <= 5),
         |vq AS (SELECT vec_id AS query_id, embedding AS qv
         |       FROM embeddings WHERE vec_id % 97 = 0),
         |vc AS (SELECT vec_id AS neighbor_id, embedding AS cv
         |       FROM embeddings),
         |vscored AS (
         |  SELECT query_id, neighbor_id,
         |    list_sum(list_transform(range(1, len(qv)+1),
         |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
         |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(range(1, len(cv)+1),
         |         i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
         |      AS cosine
         |  FROM vq CROSS JOIN vc),
         |vec AS (
         |  SELECT query_id, neighbor_id AS doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
         |      AS INTEGER) AS rank
         |  FROM vscored
         |  QUALIFY rank <= 5),
         |u AS (SELECT query_id, doc_id, rank FROM lex
         |      UNION ALL SELECT query_id, doc_id, rank FROM vec),
         |f AS (
         |  SELECT query_id, doc_id,
         |    round(sum(1.0 / (60.0 + CAST(rank AS DOUBLE))), 6)
         |      AS rrf_score
         |  FROM u GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_score,
         |  CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id)
         |    AS INTEGER) AS rank
         |FROM f
         |QUALIFY rank <= 5""".stripMargin,

    // mirrors q236: identical md5-60 unigram+bigram bucket hashing
    // (mod 512), add-one bucket models over target (doc_id%25) and raw,
    // per-doc log-ratio sums rounded to 6
    "q236_dsir_weights" -> dsirWeightsSql,

    // mirrors q247: the same token count + digest straight off the
    // documents the lines were written from
    "q247_text_source" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |    AS BIGINT) AS n_tokens,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    // mirrors q246: byte-level round-trip — octet length and md5 of the
    // UTF-8 text the files were written from
    "q246_binary_source" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    // mirrors q245: the NB chain with char-trigram tokenization and a
    // 200-entry vocabulary
    "q245_charngram_langid" ->
      s"""WITH ${nbChainBodySql(
        "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
        "SELECT doc_id, text FROM documents",
        charTrigramsSql, vocabSize = 200)}
         |SELECT b.doc_id, b.predicted, d.lang AS actual,
         |  b.predicted = d.lang AS correct, b.score
         |FROM best b JOIN documents d ON b.doc_id = d.doc_id
         |WHERE b.rk = 1""".stripMargin,

    // q243 replays the identical diff table from its parquet artifact
    // (value-identity round-trip) — q236's oracle again
    "q243_dsir_artifacts" -> dsirWeightsSql,

    // q244 streams the same scoring per micro-batch (stateless) —
    // q236's oracle again
    "q244_stream_dsir" -> dsirWeightsSql,

    // mirrors q237: q236's weights + the md5-derived Gumbel key,
    // top-200 by (key desc, doc_id)
    "q237_dsir_resample" ->
      s"""$dsirChainSql,
         |keyed AS (
         |  SELECT doc_id, log_weight,
         |    round(log_weight - ln(-ln(
         |      (CAST(${PortableHash.sqlHash60(
        "CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5)
         |        / 1000000.0)), 6) AS sample_key
         |  FROM w)
         |SELECT doc_id, log_weight, sample_key,
         |  CAST(rank AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC,
         |        doc_id) AS rank FROM keyed)
         |WHERE rank <= 200""".stripMargin,

    // mirrors q234 (artifact round-trip is value-identity on the model
    // frame) and q235 (stateless per-batch scores union to the batch
    // result): the q231 chain without the audit columns
    "q234_nb_artifacts" ->
      s"""$nbChainSql
         |SELECT doc_id, predicted, score FROM best WHERE rk = 1""".stripMargin,

    "q235_stream_classify" ->
      s"""$nbChainSql
         |SELECT doc_id, predicted, score FROM best WHERE rk = 1""".stripMargin,

    // mirrors q232: identical 4-token span md5-60 hashes, >1-occurrence
    // dup set, coverage = sliding max of dup-start flags over the
    // preceding width-1 positions
    "q232_repeated_spans" -> spanReportSql("TRUE"),

    // mirrors q242: the q232 whole-corpus chain restricted to the batch
    // docs — the incremental identity (batch + artifact counts ==
    // global counts because batch ∪ landed IS the corpus)
    "q242_span_increment" -> spanReportSql("doc_id % 5 = 0"),

    // mirrors q233: the q232 coverage chain carrying the token itself,
    // uncovered tokens reassembled position-ordered (string_agg skips
    // the CASE NULLs; fully-covered docs coalesce to '')
    "q233_span_removal" ->
      s"""WITH ${spanCleanBodySql("SELECT doc_id, text FROM documents")}
         |SELECT doc_id, n_tokens, kept_tokens, clean_text
         |FROM cleaned""".stripMargin,

    // q205 = q195's oracle: the maxIters=1 training loop returns exactly
    // one step from the hash-sampled init (the driver rebuild is an
    // identity on values)
    "q205_kmeans_train" -> kmeansStepSql,

    // q218 merges the same update across micro-batches (exact integer
    // sums: batching is invisible) — q195's oracle again
    "q218_stream_kmeans_update" -> kmeansStepSql
  )
}
