package graft.tools

import org.apache.spark.sql.functions._

/** Piecewise timing of the Naive-Bayes classify path (q245's shape):
  * model fit+collect vs corpus scoring, with the executed plan of the
  * model collect — the single-task broadcast job StageProfile surfaced.
  * Usage: runMain graft.tools.NbProbe [sfDir]
  */
object NbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-nbprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables(spark, sfDir, "documents")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[nbprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      val model = graft.operators.Classify.naiveBayesModel(
        docs.filter(col("doc_id") % 5 === 0), "text", "lang", 200,
        graft.operators.Classify.charTrigrams)
      val rows = time(s"rep$rep prepareModel(collect)") {
        graft.operators.Classify.prepareModel(model)
      }
      time(s"rep$rep scoreWithModel.count") {
        graft.operators.Classify.scoreWithModel(docs, rows, "doc_id",
          "text", graft.operators.Classify.charTrigrams).count()
      }
      if (rep == 2) println(model.queryExecution.executedPlan.toString
        .linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
