package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost-scaling probe for the incremental repeated-span regime (q242):
  * does the per-delivery cost scale with the BATCH or with the landed
  * corpus? Landed corpora at 1x / Nx (replicated with disjoint ids and
  * replica-marker mutation), span-count artifacts built once per landed
  * size (the amortized cost, recorded separately), then a FIXED batch's
  * increment is timed against each artifact. The increment reads only
  * batch text plus the artifact table — its wall should grow with the
  * artifact's distinct-span count, never with landed text volume; the
  * whole-corpus recompute it replaces re-reads everything.
  *
  * Usage: runMain graft.tools.SpanIncProbe [factor]
  */
object SpanIncProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-spanprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val landed1 = docs.filter(col("doc_id") % 5 =!= 0)
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1

    def landedAt(f: Int): DataFrame = {
      val dir = s"/tmp/graft_spanprobe_${f}"
      (0 until f).map { r =>
        landed1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
          concat(lit(s"replica$r marker "), col("text")).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    def artifactsOf(landed: DataFrame, tag: String): DataFrame = {
      val dir = s"/tmp/graft_spanprobe_arts_$tag"
      val (_, tb) = time(
        Dedup.spanArtifacts(landed, "doc_id", "text", 4)
          .write.mode("overwrite").parquet(dir))
      println(f"[spanprobe] artifacts($tag) build $tb%.2f s")
      spark.read.parquet(dir)
    }

    def inc(arts: DataFrame): Long =
      Dedup.repeatedSpansIncrement(batch, "doc_id", "text", 4, arts)
        .agg(sum(col("n_dup_spans"))).head.getLong(0)

    val landedN = landedAt(factor)
    val arts1 = artifactsOf(landed1, "1x")
    val artsN = artifactsOf(landedN, s"${factor}x")
    batch.count(); inc(arts1) // warmup

    val (d1, t1) = time(inc(arts1))
    val (dN, tN) = time(inc(artsN))
    val a1 = arts1.count(); val aN = artsN.count()
    println(f"""{"probe":"span_increment","factor":$factor,""" +
      f""""inc_1x":{"sec":$t1%.2f,"dup_spans":$d1,"artifact_rows":$a1},""" +
      f""""inc_${factor}x":{"sec":$tN%.2f,"dup_spans":$dN,"artifact_rows":$aN},""" +
      f""""ratio":${tN / t1}%.1f}""")
    spark.stop()
  }
}
