package graft.tools

import graft.SparkEntry

/** Repeated end-to-end timing of one SparkEntry query CLOSURE (including
  * any side-effect writes the closure performs — Explain only times the
  * returned frame's count). Usage:
  * runMain graft.tools.BenchOne <query> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-benchone")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables(spark, sfDir, "lineitem").count()
    graft.core.Tables(spark, sfDir, "events").groupBy("event_type").count()
      .collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] $name rep$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
