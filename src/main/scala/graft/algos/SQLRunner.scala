package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequential SQL pass-through (reference: src/main/scala/com/adidas/analytics/algo/SQLRunner.scala:8-19):
  * run numbered SQL steps; each goes through the full Catalyst pipeline;
  * a failing step aborts the remainder. Returns the last step's result
  * instead of `show`-ing it (the caller decides the action).
  *
  * Intermediate steps run under a BOUNDED action — `limit(1000).collect()`,
  * the same cap as the reference's `show(1000)`. An unbounded collect on an
  * intermediate `SELECT * FROM big_table` would materialize the whole table
  * on the driver; with the limit, Catalyst plans a CollectLimit that stops
  * scanning after 1000 rows. Side-effecting steps (CTAS, INSERT, CREATE
  * VIEW) are unaffected — their work happens regardless of how many result
  * rows are fetched.
  */
object SQLRunner {
  val IntermediateRowCap = 1000

  def run(spark: SparkSession, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "SQLRunner needs at least one step")
    // the graft SQL surface (nfc_normalize, shingle_hashes, simhash64, …)
    // is available to every step: registration is idempotent and
    // session-scoped, so an acon SQL job can use the native codegen
    // primitives without a Scala entry point
    graft.functions.GraftFunctions.register(spark)
    steps.init.foreach(spark.sql(_).limit(IntermediateRowCap).collect())
    spark.sql(steps.last)
  }
}
