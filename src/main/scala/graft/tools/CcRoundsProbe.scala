package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Settles the large-star/small-star question with a measurement: how many
  * label rounds does [[Dedup.connectedComponents]] actually take on the
  * production-shaped near-dup graph (the 20× corpus's verified pair graph
  * — wide, shallow components)? Star-contraction variants (CC-MR) cut
  * ROUND COUNT on high-diameter graphs at the price of ~2 joins per round;
  * if the real graph already converges in a handful of rounds, they are a
  * net loss. Round count is found as the minimal converging maxIter
  * (failOnNonConvergence throws below it — no operator changes needed).
  *
  * Usage: runMain graft.tools.CcRoundsProbe [factor]
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-ccprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsN = (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    val pairs = Dedup.jaccardVerify(
        Dedup.minhashCandidates(docsN, "doc_id", "text"),
        docsN, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .persist()
    val nPairs = pairs.count()

    var rounds = -1
    var m = 2
    while (rounds < 0 && m <= 20) {
      try {
        val r = Dedup.connectedComponents(pairs, maxIter = m)
        r.count(); r.unpersist()
        rounds = m
      } catch { case _: IllegalStateException => m += 1 }
    }
    pairs.unpersist()
    println(s"""{"probe":"cc_rounds","factor":$factor,"pairs":$nPairs,""" +
      s""""rounds_to_converge":$rounds}""")
    spark.stop()
  }
}
