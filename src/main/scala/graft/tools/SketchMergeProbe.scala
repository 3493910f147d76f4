package graft.tools

import graft.functions.QuantileSketchAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Artifact-amortization probe for the sketch family: replicate the
  * sf0.1 events table into N disjoint "deliveries", build ONE quantile
  * sketch per delivery (the per-landing artifact a load pipeline saves),
  * and compare answering per-type quantiles by
  *  - MERGING the N saved sketch-item tables (reads only sketch rows,
  *    ≤ k·log(n/k) items each), vs
  *  - RESCANNING the whole N× corpus with a fresh sketch.
  * The merge cost is bounded by N·sketch-size regardless of corpus
  * size — the reason per-delivery artifacts exist. Also reports the
  * worst rank disagreement between the two answers (both are valid
  * sketches of the same stream).
  * Writes under /tmp only. Usage: runMain graft.tools.SketchMergeProbe [n]
  */
object SketchMergeProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val deliveries = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark: SparkSession = graft.core.Session.builder("graft-smprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev1 = graft.core.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val stride = ev1.agg(max(col("event_id"))).head.getLong(0) + 1
    val base = s"/tmp/graft_smprobe"
    // the N× corpus + one sketch-artifact table per delivery
    (0 until deliveries).foreach { r =>
      ev1.select((col("event_id") + lit(r * stride)).as("event_id"),
        col("event_type"), (col("value") + lit(r * 0.001)).as("value"))
        .write.mode("overwrite").parquet(s"$base/corpus/d=$r")
    }
    val corpusN = spark.read.parquet(s"$base/corpus")
    (0 until deliveries).foreach { r =>
      spark.read.parquet(s"$base/corpus/d=$r")
        .groupBy(col("event_type"))
        .agg(QuantileSketchAgg.sketch(col("value").cast("double"), 256)
          .as("__sk"))
        .select(col("event_type"), explode(col("__sk")("items")).as("it"))
        .write.mode("overwrite").parquet(s"$base/arts/d=$r")
    }
    val ps = Seq(0.5, 0.99)
    def fromMerge(): Array[(String, Double, Double)] =
      graft.operators.Stats.quantilesFromSketches(
        spark.read.parquet(s"$base/arts")
          .groupBy(col("event_type"))
          .agg(QuantileSketchAgg.mergeSketch(col("it"), 256).as("__sk")),
        "event_type", ps)
        .select(col("event_type"), col("p"), col("q_value"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def fromScan(): Array[(String, Double, Double)] =
      graft.operators.Stats.sketchQuantilesPerGroup(corpusN,
        "event_type", "value", ps, 256)
        .select(col("event_type"), col("p"), col("q_value"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    fromMerge(); fromScan() // warm
    val (qm, tm) = time(fromMerge())
    val (qsc, ts) = time(fromScan())
    // rank disagreement in value space (value tracks rank in this data)
    val n = corpusN.count()
    val worst = qm.map { case (t, p, v) =>
      val o = qsc.find(r => r._1 == t && r._2 == p).get._3
      math.abs(v - o)
    }.max
    println(f"""{"probe":"sketch_merge","deliveries":$deliveries,""" +
      f""""rows":$n,"merge_sec":$tm%.2f,"rescan_sec":$ts%.2f,""" +
      f""""speedup":${ts / tm}%.1f,"worst_value_gap":$worst%.3f}""")
    spark.stop()
  }
}
