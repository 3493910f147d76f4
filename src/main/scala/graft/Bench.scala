package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JVM/codegen/scan-index startup outside the timings
    graft.core.Tables(spark, sfDir, "lineitem").count()
    graft.core.Tables(spark, sfDir, "events").groupBy("event_type").count()
      .collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // a crashed query must not read as a fast success
        }
      }
      val t1 = once()
      // median-of-3 for EVERY query: the box intermittently spikes a
      // single sample 3-5x (round 11 adjudication: q54 printed 3.32 s
      // against a 0.94 s fresh-JVM median — one spiked sample, not a
      // regression; even min-of-2 lost to a spike spanning both
      // back-to-back samples). ANY crashed sample reports -1: an
      // intermittent failure must surface, not hide behind the
      // survivors (whose "median" would also skew toward the max).
      val t = if (t1 < 0) t1 else {
        val samples = Seq(t1, once(), once())
        if (samples.exists(_ < 0)) -1.0 else samples.sorted.apply(1)
      }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
