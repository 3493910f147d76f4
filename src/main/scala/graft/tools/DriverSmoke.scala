package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the grading driver's smoke check: a PLAIN Spark 4 session
  * (default configs — ANSI on, no nanos flag, 200 shuffle partitions) calls
  * SparkEntry.entry and requires rows > 0. Guards against entry() relying
  * on graft.core.Session's config surface.
  */
object DriverSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    require(n > 0, "entry() returned no rows under a default session")
    spark.stop()
  }
}
