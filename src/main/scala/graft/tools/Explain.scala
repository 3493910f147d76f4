package graft.tools

import graft.SparkEntry

/** Diagnostic runner: print the formatted physical plan, row count and wall
  * time of one SparkEntry query. Usage: runMain graft.tools.Explain <query> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.Session.builder("graft-explain")
      .master(s"local[${graft.core.Session.cpus}]")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows: ${df.count()}")
    println(f"sec: ${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
