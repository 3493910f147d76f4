package graft.tools

import graft.operators.RangeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the bucketed range join (round 10): Spark plans a raw
  * non-equi range predicate as BroadcastNestedLoopJoin — every point
  * tested against every interval — so the baseline cost is
  * |points| × |intervals| regardless of how few pairs actually match.
  * The bucketed formulation equi-joins on the bucket id; its candidate
  * volume is per-bucket local density. This probe grows both sides and
  * times the two shapes (result equality require()d at the small size);
  * the BNLJ leg is skipped past 1e9 pair-tests where it stops being
  * measurable in a sane wall-clock budget — which is itself the result.
  *
  * Usage: runMain graft.tools.RangeProbe
  */
object RangeProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Points over [0, span); intervals of mean width ~40 over the same
    * span — deterministic xxhash positions, no RNG state.
    */
  private def pts(spark: SparkSession, n: Int, span: Long): DataFrame =
    spark.range(n.toLong).select(col("id").as("p_id"),
      pmod(xxhash64(col("id")), lit(span)).as("p"))

  private def ivs(spark: SparkSession, m: Int, span: Long): DataFrame =
    spark.range(m.toLong).select(col("id").as("iv_id"),
      pmod(xxhash64(col("id") + 7), lit(span)).as("lo"))
      .withColumn("hi", col("lo") + pmod(xxhash64(col("iv_id") + 13),
        lit(80L)))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-rangeprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // agreement at the small size
    val sp = pts(spark, 5000, 100000L).persist(); sp.count()
    val si = ivs(spark, 500, 100000L).persist(); si.count()
    val a = RangeJoin.pointInInterval(sp, si, "p", "lo", "hi", 64L)
      .select(col("p_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = sp.join(si, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("p_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    require(a.sameElements(b), s"agreement: ${a.length} vs ${b.length}")
    println(s"""{"probe":"range_agreement","pairs":${a.length},"ok":true}""")
    sp.unpersist(); si.unpersist()

    for ((n, m) <- Seq((20000, 2000), (100000, 10000), (1000000, 100000))) {
      val span = n.toLong * 5 // keep density ~constant as sides grow
      val p = pts(spark, n, span).persist(); p.count()
      val iv = ivs(spark, m, span).persist(); iv.count()
      val (nb, tBucket) = time(
        RangeJoin.pointInInterval(p, iv, "p", "lo", "hi", 64L).count())
      val pairTests = n.toLong * m
      val tLoop = if (pairTests <= 1000000000L) {
        val (_, t) = time(
          p.join(iv, col("p") >= col("lo") && col("p") <= col("hi")).count())
        "%.2f".format(t)
      } else "null"
      println(s"""{"probe":"range_scale","points":$n,"intervals":$m,""" +
        s""""matches":$nb,"bucketed_sec":${"%.2f".format(tBucket)},""" +
        s""""loop_sec":$tLoop}""")
      p.unpersist(); iv.unpersist()
    }
    spark.stop()
  }
}
