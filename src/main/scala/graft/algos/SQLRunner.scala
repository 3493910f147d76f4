package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequential SQL pass-through (reference: src/main/scala/com/adidas/analytics/algo/SQLRunner.scala:8-19):
  * run numbered SQL steps; each goes through the full Catalyst pipeline;
  * a failing step aborts the remainder. Returns the last step's result
  * instead of `show`-ing it (the caller decides the action).
  */
object SQLRunner {
  def run(spark: SparkSession, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "SQLRunner needs at least one step")
    steps.init.foreach(spark.sql(_).collect())
    spark.sql(steps.last)
  }
}
