package graft.tools

import graft.operators.Sampling
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew probe for [[Sampling.capPerGroup]]: one group holds ~50% of the
  * corpus — the exact case a per-source cap exists for — and the question
  * is whether any single task's input stays BOUNDED (by the 10⁶ bucket
  * space and by cap+ties) or grows with the dominant group (the naive
  * single-phase rank funnels the whole group through one task's sort).
  *
  * Measures, for the two-phase operator vs the naive rank on the same
  * corpus: wall time, the MAX records any one task reads off a shuffle
  * (the scale-limiting quantity — at 100 TB the naive plan's number is the
  * group size and the job dies; two-phase is capped by the bucket-space
  * histogram), and the phase-3 exact-rank window's per-group input
  * (cap + hash ties, recomputed via the operator's own construction).
  *
  * Weighted mode probes [[Sampling.capPerGroupWeighted]] the same way
  * (one source holding ~50% of the tokens): the naive comparison is the
  * full running-sum window, which — unlike `row_number ≤ cap` — Spark
  * CANNOT map-side prune (`WindowGroupLimit` only fires on rank-family
  * functions), so the naive plan funnels the dominant group's entire row
  * set through one sort task at any scale.
  *
  * Quantile mode probes [[Sampling.filterByQuantileBand]]: the naive
  * percent_rank window sorts every ROW of the dominant group in one task;
  * the histogram construction's window reads one row per DISTINCT
  * (group, score) — bounded by score cardinality, not group size.
  *
  * Usage: runMain graft.tools.CapProbe [rows] [cap]
  *        runMain graft.tools.CapProbe weighted [rows] [budget]
  *        runMain graft.tools.CapProbe quantile [rows]
  *        runMain graft.tools.CapProbe nucleus [rows] [p]
  */
object CapProbe {

  private final class MaxShuffleRead extends SparkListener {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        max.updateAndGet(x => math.max(x, m.shuffleReadMetrics.recordsRead))
    }
  }

  private def timedWithMax(spark: SparkSession)(f: => Long): (Long, Double, Long) = {
    val l = new MaxShuffleRead
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val rows = f
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the async listener bus drain
    spark.sparkContext.removeSparkListener(l)
    (rows, sec, l.max.get)
  }

  private def weighted(spark: SparkSession, n: Long, budget: Double): Unit = {
    // 50% of rows (and ~50% of tokens) in one source; 997 others, each
    // also over budget so every group takes the threshold path. Weight =
    // a deterministic 1..19 "token count" per row.
    val df = spark.range(n).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'dominant' ELSE concat('g', id % 997) END AS grp",
      "CAST(id % 19 + 1 AS INT) AS w")
      .persist()
    df.count()

    val twoFrame = Sampling.capPerGroupWeighted(df, "id", "grp", "w", budget)
    val (rTwo, tTwo, mTwo) = timedWithMax(spark) { twoFrame.count() }
    val plan = twoFrame.queryExecution.executedPlan.toString
    val joinKind =
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sortmerge"
      else "other"
    // naive: exact running sum over EVERY row of every group — no
    // WindowGroupLimit rescue for sum(), the dominant group is one task
    val (rNaive, tNaive, mNaive) = timedWithMax(spark) {
      df.withColumn("__cb", sum(col("w").cast("double")).over(
          Window.partitionBy(col("grp"))
            .orderBy(Sampling.hashBucket(col("id")), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("w"))
        .filter(col("__cb") < budget).count()
    }
    require(rTwo == rNaive, s"result mismatch: $rTwo vs $rNaive")

    // exact-phase window input per group = bucket-prefilter survivors,
    // recomputed via the operator's construction (weight histogram →
    // running threshold → bucket filter)
    val bkt = coalesce(Sampling.hashBucket(col("id")), lit(-1L))
    val hist = df.groupBy(col("grp"), bkt.as("b"))
      .agg(sum(col("w").cast("double")).as("ws"))
    val thr = hist
      .withColumn("cum",
        sum(col("ws")).over(Window.partitionBy(col("grp")).orderBy(col("b"))))
      .filter(col("cum") >= budget)
      .groupBy(col("grp")).agg(min(col("b")).as("bstar"))
    val surv = df.withColumn("b", bkt)
      .join(thr, Seq("grp")).filter(col("b") <= col("bstar"))
      .groupBy(col("grp")).count()
      .agg(max(col("count")).as("maxSurv"), avg(col("count")).as("avgSurv"))
      .head()
    val dominantRows = df.filter(col("grp") === "dominant").count()

    println(f"""{"probe":"cap_weighted","rows":$n,"budget":$budget%.0f,"dominant_rows":$dominantRows,"join":"$joinKind",""" +
      f""""two_phase":{"sec":$tTwo%.2f,"max_task_shuffle_records":$mTwo},""" +
      f""""naive":{"sec":$tNaive%.2f,"max_task_shuffle_records":$mNaive},""" +
      f""""window_input":{"max_per_group":${surv.getLong(0)},"avg_per_group":${surv.getDouble(1)}%.1f},""" +
      f""""survivors":$rTwo}""")
  }

  private def nucleus(spark: SparkSession, n: Long, p: Double): Unit = {
    // 50% of rows (and weight mass) in one group; ties-heavy int scores
    // (~1013 distinct per group — the quality-score shape) and 1..19
    // token weights. The exact-phase input must be bounded by the
    // score-bucket boundary, never the dominant group's row count.
    val df = spark.range(n).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'dominant' ELSE concat('g', id % 997) END AS grp",
      "CAST(id % 1013 AS INT) AS score",
      "CAST(id % 19 + 1 AS INT) AS w")
      .persist()
    df.count()

    val two = Sampling.nucleusPerGroup(df, "id", "grp", "w", "score", p)
    val (rTwo, tTwo, mTwo) = timedWithMax(spark) { two.count() }
    // naive: score-ordered running sum over EVERY row of every group
    val (rNaive, tNaive, mNaive) = timedWithMax(spark) {
      val W = Window.partitionBy(col("grp"))
      df.join(broadcast(df.groupBy(col("grp"))
          .agg((sum(col("w").cast("double")) * p).as("bud"))), Seq("grp"))
        .withColumn("__cb", sum(col("w").cast("double")).over(
          W.orderBy((-round(col("score").cast("double"), 6)).asc, col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("w"))
        .filter(col("__cb") < col("bud")).count()
    }
    require(rTwo == rNaive, s"result mismatch: $rTwo vs $rNaive")

    // exact-phase window input per group = the BOUNDARY BUCKET's rows
    // (ties at the threshold score — the operator keeps strictly-better
    // buckets outright and only ranks the boundary), recomputed via the
    // operator's construction
    val bkt = -round(col("score").cast("double"), 6)
    val buds = df.groupBy(col("grp"))
      .agg((sum(col("w").cast("double")) * p).as("bud"))
    val thr = df.groupBy(col("grp"), bkt.as("b"))
      .agg(sum(col("w").cast("double")).as("ws"))
      .join(buds, Seq("grp"))
      .withColumn("cum",
        sum(col("ws")).over(Window.partitionBy(col("grp")).orderBy(col("b"))))
      .filter(col("cum") >= col("bud"))
      .groupBy(col("grp")).agg(min(col("b")).as("bstar"))
    val surv = df.withColumn("b", bkt)
      .join(thr, Seq("grp")).filter(col("b") === col("bstar"))
      .groupBy(col("grp")).count()
      .agg(max(col("count")).as("maxSurv"), avg(col("count")).as("avgSurv"))
      .head()
    val dominantRows = df.filter(col("grp") === "dominant").count()

    println(f"""{"probe":"nucleus","rows":$n,"p":$p%.2f,"dominant_rows":$dominantRows,""" +
      f""""two_phase":{"sec":$tTwo%.2f,"max_task_shuffle_records":$mTwo},""" +
      f""""naive":{"sec":$tNaive%.2f,"max_task_shuffle_records":$mNaive},""" +
      f""""window_input":{"max_per_group":${surv.getLong(0)},"avg_per_group":${surv.getDouble(1)}%.1f},""" +
      f""""survivors":$rTwo}""")
  }

  private def quantile(spark: SparkSession, n: Long): Unit = {
    // 50% of rows in one group; scores are ties-heavy ints (the quality-
    // score shape): ~1013 distinct values per group
    val df = spark.range(n).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'dominant' ELSE concat('g', id % 997) END AS grp",
      "CAST(id % 1013 AS INT) AS score")
      .persist()
    df.count()

    val band = Sampling.filterByQuantileBand(df, "grp", "score", 0.1, 0.9)
    val (rHist, tHist, mHist) = timedWithMax(spark) { band.count() }
    val (rNaive, tNaive, mNaive) = timedWithMax(spark) {
      df.withColumn("__pr", percent_rank().over(
          Window.partitionBy(col("grp")).orderBy(col("score"))))
        .filter(col("__pr") >= 0.1 && col("__pr") <= 0.9).count()
    }
    require(rHist == rNaive, s"result mismatch: $rHist vs $rNaive")

    // the histogram window's input per group = distinct scores
    val histRows = df.groupBy(col("grp"), col("score")).count()
      .groupBy(col("grp")).count()
      .agg(max(col("count")).as("mx"), avg(col("count")).as("av")).head()
    val dominantRows = df.filter(col("grp") === "dominant").count()

    println(f"""{"probe":"quantile_band","rows":$n,"dominant_rows":$dominantRows,""" +
      f""""hist":{"sec":$tHist%.2f,"max_task_shuffle_records":$mHist},""" +
      f""""naive":{"sec":$tNaive%.2f,"max_task_shuffle_records":$mNaive},""" +
      f""""window_input":{"max_per_group":${histRows.getLong(0)},"avg_per_group":${histRows.getDouble(1)}%.1f},""" +
      f""""survivors":$rHist}""")
  }

  def main(args: Array[String]): Unit = {
    val isWeighted = args.headOption.contains("weighted")
    val isQuantile = args.headOption.contains("quantile")
    val isNucleus = args.headOption.contains("nucleus")
    val rest =
      if (isWeighted || isQuantile || isNucleus) args.drop(1) else args
    val n = rest.headOption.map(_.toLong).getOrElse(10000000L)
    // lazy: the weighted/nucleus modes read rest(1) as a double instead
    lazy val cap = if (rest.length > 1) rest(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-capprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (isWeighted) {
      val budget = if (rest.length > 1) rest(1).toDouble else 10000.0
      weighted(spark, n, budget)
      spark.stop()
      return
    }
    if (isNucleus) {
      val p = if (rest.length > 1) rest(1).toDouble else 0.4
      nucleus(spark, n, p)
      spark.stop()
      return
    }
    if (isQuantile) {
      quantile(spark, n)
      spark.stop()
      return
    }

    // 50% of rows in one group; the rest spread over 997 groups, each of
    // which also exceeds the cap so every group takes the threshold path
    val df = spark.range(n).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'dominant' ELSE concat('g', id % 997) END AS grp")
      .persist()
    df.count() // materialize outside the timings

    val twoFrame = Sampling.capPerGroup(df, "id", "grp", cap)
    val (rTwo, tTwo, mTwo) = timedWithMax(spark) { twoFrame.count() }
    val plan = twoFrame.queryExecution.executedPlan.toString
    val joinKind =
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sortmerge"
      else "other"
    // the opt-out path: no hint → SMJ on the skewed group key (the rank
    // window pins the distribution, so AQE cannot skew-split it)
    val (rNb, tNb, mNb) = timedWithMax(spark) {
      Sampling.capPerGroup(df, "id", "grp", cap,
        broadcastThresholds = false).count()
    }
    // naive rank: on Spark 4, WindowGroupLimit map-side prunes
    // row_number<=cap, so its reduce task reads ~(#maps × cap) per group
    val (rNaive, tNaive, mNaive) = timedWithMax(spark) {
      df.withColumn("__r", row_number().over(
          Window.partitionBy(col("grp"))
            .orderBy(Sampling.hashBucket(col("id")), col("id"))))
        .filter(col("__r") <= cap).count()
    }
    require(rTwo == rNaive && rTwo == rNb,
      s"result mismatch: $rTwo vs $rNb vs $rNaive")

    // phase-3 window input per group = prefilter survivors (cap + ties at
    // the threshold bucket), recomputed via the operator's construction
    val bkt = coalesce(Sampling.hashBucket(col("id")), lit(-1L))
    val hist = df.groupBy(col("grp"), bkt.as("b")).agg(count(lit(1)).as("c"))
    val thr = hist
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("grp")).orderBy(col("b"))))
      .filter(col("cum") >= cap)
      .groupBy(col("grp")).agg(min(col("b")).as("bstar"))
    val surv = df.withColumn("b", bkt)
      .join(thr, Seq("grp")).filter(col("b") <= col("bstar"))
      .groupBy(col("grp")).count()
      .agg(max(col("count")).as("maxSurv"), avg(col("count")).as("avgSurv"))
      .head()
    val dominantRows = df.filter(col("grp") === "dominant").count()

    println(f"""{"probe":"cap","rows":$n,"cap":$cap,"dominant_rows":$dominantRows,"join":"$joinKind",""" +
      f""""two_phase":{"sec":$tTwo%.2f,"max_task_shuffle_records":$mTwo},""" +
      f""""two_phase_no_bcast":{"sec":$tNb%.2f,"max_task_shuffle_records":$mNb},""" +
      f""""naive":{"sec":$tNaive%.2f,"max_task_shuffle_records":$mNaive},""" +
      f""""window_input":{"max_per_group":${surv.getLong(0)},"avg_per_group":${surv.getDouble(1)}%.1f},""" +
      f""""survivors":$rTwo}""")
    spark.stop()
  }
}
