package graft.core

import graft.config.JsonConfig
import graft.fsops.FsOps
import org.apache.spark.sql.SparkSession

/** spark-submit entry point — the reference's single public surface
  * (reference: src/main/scala/com/adidas/analytics/AlgorithmFactory.scala:16-32):
  *
  * {{{
  * spark-submit --class graft.core.JobRunner graft.jar <AlgoName> <params-location>
  * }}}
  *
  * Builds the session, reads the JSON parameter file from DFS (the params
  * path is a Hadoop path — HDFS/S3/file all work through FsOps), dispatches
  * by algorithm name through [[AlgoRegistry]], runs the
  * read → transform → write → stats template, and closes the session.
  */
object JobRunner {

  /** Testable core: resolve config, dispatch, run — on a caller-owned
    * session.
    */
  def execute(spark: SparkSession, name: String, paramsPath: String): Unit = {
    val fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)
    AlgoRegistry.create(name, spark, fsOps,
      JsonConfig.fromFile(fsOps, paramsPath)).run()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      Console.err.println(
        "usage: graft.core.JobRunner <AlgorithmName> <params-location>")
      sys.exit(2)
    }
    val Array(name, paramsPath) = args.take(2)
    // own the session only if none exists (spark-submit path); under a test
    // harness main() must not tear down the suite's shared session. Hive
    // support matches the reference entry point (AlgorithmFactory.scala:34-55)
    // — required for the CREATE TABLE .. LIKE metastore swap.
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = Session.builder(s"graft-$name", hive = true).getOrCreate()
    try execute(spark, name, paramsPath)
    finally if (!preexisting) spark.close()
  }
}
