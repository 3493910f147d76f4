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

/** Gates: Structured Streaming gates. */
object StreamGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // streaming: STREAM-STREAM watermarked interval join run as a real
    // two-sided streaming query (q63's batch predicate, both sides
    // streamed; the horizon exceeds the table's range so no state evicts
    // and the settled append output equals the batch join exactly)
    "q290_stream_interval_join" -> ((s, dir) => {
      val e = graft.core.Tables(s, dir, "events")
      val pDir = tmpDir("q290_p"); val cDir = tmpDir("q290_c")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"))
      purchases.write.mode("overwrite").parquet(pDir)
      clicks.write.mode("overwrite").parquet(cDir)
      EventStream.runIntervalJoinOnce(s, purchases.schema, pDir,
          clicks.schema, cDir, "p_user", "c_user", "p_ts", "c_ts",
          lookback = "2 hours", horizon = "3650 days",
          queryName = "q290_sink")
        .select(col("p_event_id"), col("c_event_id"),
          col("p_user").as("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
            .as("gap_us"))
    }),

    // streaming as-of enrichment: purchases stream in 4 micro-batches,
    // each matched per-row against the PINNED click history (persisted
    // once, released after) — per-row decisions are batching-independent,
    // so the settled output equals the batch as-of (q40's oracle)
    "q296_stream_asof" -> ((s, dir) => {
      val e = graft.core.Tables(s, dir, "events")
      val pDir = tmpDir("q296_p"); val outDir = tmpDir("q296_out")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      purchases.repartition(4).write.mode("overwrite").parquet(pDir)
      EventStream.runAsOfEnrichOnce(s,
          s.read.parquet(pDir).schema, pDir, clicks,
          "user_id", "c_user", "p_ts", "c_ts", "click_id",
          outDir, "q296_sink", maxFilesPerTrigger = Some(1))
        .select(col("p_id"), col("user_id"), col("click_id"),
          unix_millis(col("c_ts")).as("click_ts_ms"))
    }),

    // streaming: NATIVE session_window aggregation (engine-side gap-merge
    // state, vs q282's flatMapGroupsWithState) — append mode, zero
    // lateness: a session emits when the watermark passes last_ts + gap,
    // so the settled table is every session except those still open at
    // end-of-input (the oracle applies the same eviction predicate)
    "q299_stream_session_window" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      EventStream.runSessionWindowOnce(s, raw, s"$dir/events*.parquet",
          "user_id", "30 minutes", "q299_sink",
          prepare = graft.core.Tables.normalizeEventTs)
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("sess_start_ms"),
          col("n_events"), unix_millis(col("last_ts")).as("last_ms"))
    }),

    // streaming: SLIDING window counts (each event lands in two
    // overlapping 10-minute windows, 5-minute slide) — same zero-lateness
    // emission rule; window ends are 5-minute-aligned so the eviction
    // predicate is exact at second precision
    "q300_stream_sliding_window" -> ((s, dir) => {
      val raw = s.read.parquet(s"$dir/events.parquet").schema
      EventStream.runSlidingWindowOnce(s, raw, s"$dir/events*.parquet",
          "10 minutes", "5 minutes", "q300_sink",
          prepare = graft.core.Tables.normalizeEventTs)
        .select(unix_seconds(col("window.start")).as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
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

    // streaming ops: measured watermark sizing — lateness of each event
    // behind its user's running max in event_id (arrival) order; the
    // p99 row IS the withWatermark number, measured instead of guessed
    "q188_watermark_lateness" -> ((s, dir) => {
      Stats.watermarkLateness(t(s, dir, "events"), "ts", "event_id",
        "user_id", ps = Seq(0.5, 0.95, 0.99))
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

    // streaming STATEFUL sessionization: flatMapGroupsWithState carrying
    // per-user (lastTs, sessionId) state across 4 REAL micro-batches.
    // The corpus is staged as 4 ts-RANGE slices written oldest-first
    // (the file source triggers by modification time), so each user's
    // events arrive time-ordered across batches and the settled
    // per-event assignments equal the batch gap sessionization — the
    // identity the oracle checks. Exact integer state: no rounding
    // anywhere
    "q282_stream_sessions" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_millis"))
      val cuts = e.selectExpr(
        "percentile(ts_millis, array(0.25, 0.5, 0.75)) AS c")
        .head.getSeq[Double](0)
      val inDir = tmpDir("graft_q282_in")
      val bounds = Seq(Long.MinValue.toDouble) ++ cuts ++
        Seq(Long.MaxValue.toDouble)
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        e.filter(col("ts_millis") >= lo && col("ts_millis") < hi)
          .repartition(1).write.mode("append").parquet(inDir)
      }
      EventStream.runSessionizeOnce(s, s.read.parquet(inDir).schema,
        inDir, gapMillis = 1800000L, "q282_sink",
        maxFilesPerTrigger = Some(1))
    }),

    // streaming monitoring: per-type distinct users via HLL registers
    // max-merging across real micro-batches — register max is a pure
    // set function, so the settled report equals q284's batch sketch
    // exactly (q229's KMV face with fixed 2^p-byte state per group)
    "q286_stream_hll" -> ((s, dir) => {
      val inDir = tmpDir("graft_q286_in")
      t(s, dir, "events").select(col("event_id"), col("event_type"),
          col("user_id"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      EventStream.runHllDistinctOnce(s, s.read.parquet(inDir).schema,
        inDir, "event_type", "user_id", p = 8, "q286_sink",
        maxFilesPerTrigger = Some(2))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // mirrors EventStream.dedupStream with a horizon wider than the
    // table's time range: no state eviction, so the settled streaming
    // output projected to the keys is exactly the distinct key set
    "q69_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // mirrors the stream-stream watermarked interval join: horizon wider
    // than the table's range -> settled output equals the batch
    // predicate join (the q63 oracle shape)
    "q290_stream_interval_join" ->
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

    // mirrors the streaming as-of enrichment: per-row decisions are
    // batching-independent, so the oracle is the batch ASOF join (q40)
    "q296_stream_asof" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        |           FROM events WHERE event_type='purchase'),
        |c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
        |      FROM events WHERE event_type='click')
        |SELECT p.p_id, p.user_id, c.click_id, epoch_ms(c.c_ts) AS click_ts_ms
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.p_ts""".stripMargin,

    // mirrors the native session_window aggregation: gap-merged islands
    // (strict: an event exactly gap after the previous starts a NEW
    // session — the window end is exclusive), evicted by the same
    // watermark rule. Spark's watermark is MILLISECOND-FLOORED while
    // session ends keep microseconds, and the comparison is inclusive:
    // a session emits iff last_us + gap_us <= floor_ms(max event)·1000
    // (pinned empirically by the sub-millisecond eviction spec — an
    // exact-micros oracle would wrongly emit sessions ending in the
    // watermark's sub-ms residue)
    "q299_stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
        |  FROM events),
        |s AS (
        |  SELECT user_id, tsu,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |         OR tsu - lag(tsu) OVER w >= 1800000000 THEN 1
        |         ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
        |i AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tsu
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s),
        |g AS (
        |  SELECT user_id, min(tsu) AS start_us, count(*) AS n_events,
        |    max(tsu) AS last_us
        |  FROM i GROUP BY user_id, sid)
        |SELECT user_id, CAST(floor(start_us / 1000) AS BIGINT)
        |    AS sess_start_ms,
        |  n_events, CAST(floor(last_us / 1000) AS BIGINT) AS last_ms
        |FROM g
        |WHERE last_us + 1800000000 <=
        |  CAST(floor((SELECT max(tsu) FROM e) / 1000) AS BIGINT) * 1000"""
        .stripMargin,

    // mirrors the sliding window: each event contributes to its 5-min
    // slot's window and the previous slot's; windows whose end the final
    // watermark never passes are excluded (exact at second precision —
    // ends are 300 s multiples)
    "q300_stream_sliding_window" ->
      """WITH e AS (
        |  SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes',
        |      CAST(ts AS TIMESTAMP))) AS BIGINT) AS slot,
        |    event_type, value
        |  FROM events),
        |w AS (
        |  SELECT slot AS win_start, event_type, value FROM e
        |  UNION ALL
        |  SELECT slot - 300 AS win_start, event_type, value FROM e),
        |mx AS (
        |  SELECT CAST(floor(epoch(CAST(max(ts) AS TIMESTAMP))) AS BIGINT)
        |    AS wm
        |  FROM events)
        |SELECT win_start, event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM w
        |WHERE win_start + 600 <= (SELECT wm FROM mx)
        |GROUP BY win_start, event_type""".stripMargin,

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

    // mirrors q193: the streamed MG sketch stays exact at k >= vocab,
    // so the oracle is q192's plain count
    "q193_stream_heavy_hitters" ->
      """SELECT t AS item, CAST(count(*) AS BIGINT) AS count_low
        |FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents)
        |WHERE t IS NOT NULL
        |GROUP BY t""".stripMargin,

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

    // mirrors q201: micro-batched sketch merges stay exact below k, so
    // the oracle is q200's batch quantile SQL
    "q201_stream_quantiles" -> eventQuantileSql,

    // q218 merges the same update across micro-batches (exact integer
    // sums: batching is invisible) — q195's oracle again
    "q218_stream_kmeans_update" -> kmeansStepSql,

    // q229 streams the SAME computation (KmvAgg state merges across
    // micro-batches; a pure set function) — q109's oracle again
    "q229_stream_distinct" -> kmvOracleSql,

    "q252_stream_bm25" -> bm25ScoresSql,

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

    // q257 streams the same stateless dropout per micro-batch; batch
    // outputs union to the whole corpus — the identical oracle
    "q257_stream_dropout" -> dropoutSql,

    // q248 streams the same stateless check per micro-batch against the
    // once-prepared benchmark — q238's oracle again
    "q248_stream_semantic_decon" -> semanticDeconSql,

    // q244 streams the same scoring per micro-batch (stateless) —
    // q236's oracle again
    "q244_stream_dsir" -> dsirWeightsSql,

    "q235_stream_classify" ->
      s"""$nbChainSql
         |SELECT doc_id, predicted, score FROM best WHERE rk = 1""".stripMargin,

    // q282: the settled per-event stream assignments must equal batch
    // gap sessionization — per user, a session starts at the first event
    // or after a >30 min gap; session_id is the running start count in
    // (ts, event_id) order (StatefulSessionize's sort)
    "q282_stream_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |s AS (
        |  SELECT user_id, event_id, tsm,
        |    CASE WHEN lag(tsm) OVER w IS NULL THEN 1
        |         WHEN tsm - lag(tsm) OVER w > 1800000 THEN 1 ELSE 0
        |    END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id))
        |SELECT user_id, event_id,
        |  CAST(sum(ns) OVER (PARTITION BY user_id
        |                     ORDER BY tsm, event_id) AS BIGINT)
        |    AS session_id
        |FROM s""".stripMargin,

    // q286 streams the SAME registers (max-merge across micro-batches is
    // a pure set function) — q284's whole-table oracle again
    "q286_stream_hll" -> hllOracleSql
  )
}
