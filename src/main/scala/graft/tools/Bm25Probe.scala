package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost-scaling probe for the BM25 family (q249/q251): two questions.
  * (1) Retrieval: with a FIXED query set, how does `bm25TopK` wall
  * grow as the corpus replicates Nx? Expected ~linear — the postings
  * join is corpus-sized; that is inherent to lexical retrieval and the
  * reason the df-pruning knob exists. (2) The amortized regime: a FIXED
  * batch scored via `bm25ScoreAgainst` against artifacts built from a
  * 1x vs Nx landed corpus — expected FLAT, because the batch pays tf/dl
  * work on itself plus a join against the terms-sized artifact (which
  * only grows with vocabulary, not corpus volume).
  *
  * Usage: runMain graft.tools.Bm25Probe [factor]
  */
object Bm25Probe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark: SparkSession = graft.core.Session.builder("graft-bm25probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val queries = docs.filter(col("doc_id") % 97 === 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1

    def corpusAt(f: Int): DataFrame = {
      val dir = s"/tmp/graft_bm25probe_$f"
      (0 until f).map { r =>
        docs.select((col("doc_id") + lit(r * stride)).as("doc_id"),
          concat(lit(s"replica$r marker "), col("text")).as("text"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    def artifactsOf(corpus: DataFrame, tag: String): DataFrame = {
      val dir = s"/tmp/graft_bm25probe_arts_$tag"
      val (_, tb) = time(
        Similarity.bm25Artifacts(corpus, "doc_id", "text")
          .write.mode("overwrite").parquet(dir))
      println(f"[bm25probe] artifacts($tag) build $tb%.2f s")
      spark.read.parquet(dir)
    }

    def retrieve(corpus: DataFrame): Long =
      Similarity.bm25TopK(corpus, "doc_id", "text",
        queries, "doc_id", "text", k = 5, maxDfFraction = 1.0).count()

    def score(arts: DataFrame): Long =
      Similarity.bm25ScoreAgainst(batch, "doc_id", "text",
        queries, "doc_id", "text", arts, maxDfFraction = 1.0).count()

    val c1 = corpusAt(1); val cN = corpusAt(factor)
    retrieve(c1) // warmup
    val (r1, tr1) = time(retrieve(c1))
    val (rN, trN) = time(retrieve(cN))
    val arts1 = artifactsOf(c1, "1x")
    val artsN = artifactsOf(cN, s"${factor}x")
    score(arts1) // warmup
    val (s1, ts1) = time(score(arts1))
    val (sN, tsN) = time(score(artsN))
    val a1 = arts1.count(); val aN = artsN.count()
    println(f"""{"probe":"bm25","factor":$factor,""" +
      f""""retrieve_1x":{"sec":$tr1%.2f,"rows":$r1},""" +
      f""""retrieve_${factor}x":{"sec":$trN%.2f,"rows":$rN},""" +
      f""""retrieve_ratio":${trN / tr1}%.1f,""" +
      f""""score_1x":{"sec":$ts1%.2f,"rows":$s1,"artifact_rows":$a1},""" +
      f""""score_${factor}x":{"sec":$tsN%.2f,"rows":$sN,"artifact_rows":$aN},""" +
      f""""score_ratio":${tsN / ts1}%.1f}""")
    spark.stop()
  }
}
