package graft.tools

import graft.operators.{Decontaminate, Funnel, Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-9 profiling operators: replicate the
  * sf0.1 documents AND events tables by a factor (disjoint ids /
  * users, mutated text — the [[ScaleProbe]] recipe) and time mutual
  * information, the Zipf-slope fit, the Markov transition matrix, and
  * per-doc novelty at 1x vs Nx. MI and Zipf reduce to bounded frames
  * after one scan (cells / topK), the transition matrix is a per-user
  * window into a type²-bounded cell count, and novelty is a
  * hash-keyed equi-join — all four should scale near-linearly
  * (ratio ≲ factor) with no quadratic term. Writes derived data under
  * /tmp only.
  *
  * Usage: runMain graft.tools.ProfileScaleProbe [factor]
  */
object ProfileScaleProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark: SparkSession = graft.core.Session.builder("graft-profprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_profprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    val ev1 = graft.core.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val ustride = ev1.agg(max(col("user_id"))).head.getLong(0) + 1
    val estride = ev1.agg(max(col("event_id"))).head.getLong(0) + 1
    val evDir = s"/tmp/graft_profprobe_ev_$factor"
    (0 until factor).map { r =>
      // distinct users per replica: per-user streams replicate intact,
      // so the lag window's partition count grows with the factor while
      // per-partition work stays constant — the production shape
      ev1.select((col("event_id") + lit(r * estride)).as("event_id"),
        (col("user_id") + lit(r * ustride)).as("user_id"),
        col("event_type"), col("ts"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(evDir)
    val evN = spark.read.parquet(evDir)

    def mi(d: DataFrame): Long =
      Stats.mutualInformation(d, "lang", "source").count()
    def zipf(d: DataFrame): Long =
      TextAnalysis.zipfSlope(d, "text", topK = 1000).count()
    def trans(d: DataFrame): Long =
      Funnel.transitionMatrix(d, "user_id", "event_type", "ts",
        "event_id").count()
    def novelty(d: DataFrame): Long =
      Decontaminate.noveltyScores(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        d.filter(col("doc_id") % 2 === 0), "text", n = 3).count()

    docs1.count(); docsN.count(); ev1.count(); evN.count()
    mi(docs1); zipf(docs1); trans(ev1); novelty(docs1)

    val (m1, tm1) = time(mi(docs1)); val (mN, tmN) = time(mi(docsN))
    val (z1, tz1) = time(zipf(docs1)); val (zN, tzN) = time(zipf(docsN))
    val (t1, tt1) = time(trans(ev1)); val (tN, ttN) = time(trans(evN))
    val (n1, tn1) = time(novelty(docs1))
    val (nN, tnN) = time(novelty(docsN))
    // invariants: MI stays one row; the transition cell count is bounded
    // by the (unchanged) event-type domain squared, not by volume
    require(m1 == 1L && mN == 1L, s"mi row count: $m1 -> $mN")
    require(tN <= t1.toDouble * 1.001 + 1,
      s"transition cells grew with volume: $t1 -> $tN")

    println(f"""{"probe":"profile_scale","factor":$factor,""" +
      f""""mutual_info":{"t1":$tm1%.2f,"tN":$tmN%.2f,"ratio":${tmN / tm1}%.1f},""" +
      f""""zipf_slope":{"t1":$tz1%.2f,"tN":$tzN%.2f,"ratio":${tzN / tz1}%.1f,"terms1":$z1,"termsN":$zN},""" +
      f""""transition_matrix":{"t1":$tt1%.2f,"tN":$ttN%.2f,"ratio":${ttN / tt1}%.1f,"cells1":$t1,"cellsN":$tN},""" +
      f""""novelty":{"t1":$tn1%.2f,"tN":$tnN%.2f,"ratio":${tnN / tn1}%.1f,"rows1":$n1,"rowsN":$nN}}""")
    spark.stop()
  }
}
