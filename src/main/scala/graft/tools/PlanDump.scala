package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Batch plan + timing capture for the optimization rounds: for each named
  * query, write `explain("formatted")` to `<outDir>/<query>_<suffix>.txt`
  * and print a BenchOne-style median over `reps` end-to-end closure runs —
  * one JVM for the whole list (per-query sbt startup would dominate the
  * wall of a 15-query sweep). Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <reps> <sfDir> <q>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val reps = args(2).toInt
    val sfDir = args(3); val names = args.drop(4).toSeq
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-plandump")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // warmup (same as Bench)
    graft.core.Tables(spark, sfDir, "lineitem").count()
    graft.core.Tables(spark, sfDir, "events").groupBy("event_type").count()
      .collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      val secs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[plandump] $name rep$i rows=$n sec=$s%.2f")
        s
      }.sorted
      val median = if (reps % 2 == 1) secs(reps / 2)
        else (secs(reps / 2 - 1) + secs(reps / 2)) / 2
      println(f"[plandump] $name MEDIAN sec=$median%.2f " +
        f"min=${secs.head}%.2f max=${secs.last}%.2f reps=$reps")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
