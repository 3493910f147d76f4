package graft.tools

import graft.operators.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketing probe: does [[Layout.writeBucketed]] actually eliminate the
  * join shuffle? Joins two copies of a 2M-row frame on the key — once as
  * co-bucketed tables, once as plain parquet — with broadcast disabled,
  * and reports total shuffle WRITE bytes per query (executor task
  * metrics). The bucketed join must plan no Exchange at all, so its
  * shuffle volume is zero; the plain join shuffles both sides whole.
  *
  * Usage: runMain graft.tools.BucketProbe [rows] [buckets]
  */
object BucketProbe {

  private def shuffleBytesOf(spark: SparkSession)(action: => Long): (Long, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        acc.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = action
      Thread.sleep(500) // listener bus is asynchronous
      (n, acc.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-bucketprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = s"/tmp/graft_bucketprobe_$rows"
    val left = spark.range(rows).select(col("id"),
      concat(lit("left-payload-"), col("id")).as("l"))
    val right = spark.range(rows).select(col("id"), (col("id") % 97).as("v"))
    Layout.writeBucketed(left, "bucketprobe_l", Seq("id"), buckets,
      Seq("id"), path = Some(s"$base/l"))
    Layout.writeBucketed(right, "bucketprobe_r", Seq("id"), buckets,
      Seq("id"), path = Some(s"$base/r"))
    left.write.mode("overwrite").parquet(s"$base/pl")
    right.write.mode("overwrite").parquet(s"$base/pr")

    def bucketedJoin(): Long =
      spark.table("bucketprobe_l").join(spark.table("bucketprobe_r"), "id")
        .count()
    def plainJoin(): Long =
      spark.read.parquet(s"$base/pl")
        .join(spark.read.parquet(s"$base/pr"), "id").count()

    bucketedJoin(); plainJoin() // warmup
    val (nB, sB) = shuffleBytesOf(spark)(bucketedJoin())
    val (nP, sP) = shuffleBytesOf(spark)(plainJoin())
    require(nB == nP && nB == rows, s"row mismatch: $nB vs $nP vs $rows")

    println(f"""{"probe":"bucket","rows":$rows,"buckets":$buckets,""" +
      f""""bucketed_shuffle_bytes":$sB,"plain_shuffle_bytes":$sP}""")
    try {
      spark.sql("DROP TABLE IF EXISTS bucketprobe_l")
      spark.sql("DROP TABLE IF EXISTS bucketprobe_r")
    } finally spark.stop()
  }
}
