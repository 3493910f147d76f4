package graft.tools

import graft.core.{Session, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object Profile21 {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("p21").master(s"local[${Session.cpus}]")
      .config("spark.sql.ansi.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingleDF")(Dedup.shingleDF(docs, "doc_id", "text", 3).count())
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
    println("candidates: " + time("candidates")(cand.count()))
    val ver = Dedup.jaccardVerify(cand, docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
    println("verified: " + time("verify")(ver.count()))
    spark.stop()
  }
}
