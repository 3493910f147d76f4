package graft.tools

import graft.operators.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-9 analysis operators: replicate the sf0.1
  * documents AND embeddings tables by a factor (disjoint ids, mutated
  * text — the [[ScaleProbe]] recipe) and time PMI collocations,
  * per-label embedding outliers, and weighted Bernoulli sampling at 1x
  * vs Nx. Collocations is two map-side-combinable aggs + vocab-sized
  * joins; outliers is one posexplode agg + a broadcast join + a
  * WindowGroupLimit window; weightedSample is a pure narrow filter — all
  * three should scale near-linearly (ratio ≲ factor), with NO quadratic
  * term and no group-sized window input. Writes derived data under /tmp
  * only.
  *
  * Usage: runMain graft.tools.AnalysisScaleProbe [factor]
  */
object AnalysisScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-anaprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_anaprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"),
        col("n_chars"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    val emb1 = graft.core.Tables(spark, sfDir, "embeddings")
    val estride = emb1.agg(max(col("vec_id"))).head.getLong(0) + 1
    val embDir = s"/tmp/graft_anaprobe_emb_$factor"
    (0 until factor).map { r =>
      emb1.select((col("vec_id") + lit(r * estride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(embDir)
    val embN = spark.read.parquet(embDir)

    def colloc(d: DataFrame): Long =
      TextAnalysis.collocations(d, "text", minCount = 3, k = 20).count()
    def outliers(d: DataFrame): Long =
      Similarity.embeddingOutliers(d, "vec_id", "embedding", "label",
        k = 5).count()
    def wsample(d: DataFrame): Long =
      Sampling.weightedSample(d, "doc_id", "n_chars", 400.0).count()

    // warmup at 1x so the timed 1x run is not paying codegen/JIT cost
    // the Nx run then gets for free
    docs1.count(); docsN.count(); emb1.count(); embN.count()
    colloc(docs1); outliers(emb1); wsample(docs1)

    val (c1, tc1) = time(colloc(docs1)); val (cN, tcN) = time(colloc(docsN))
    val (o1, to1) = time(outliers(emb1)); val (oN, toN) = time(outliers(embN))
    val (w1, tw1) = time(wsample(docs1)); val (wN, twN) = time(wsample(docsN))
    // sanity: outliers output stays labels*k; the weighted sample scales
    // exactly with the replicas (selection is a pure function of the id)
    require(o1 == oN, s"outlier row count changed: $o1 -> $oN")

    println(f"""{"probe":"analysis_scale","factor":$factor,""" +
      f""""collocations":{"t1":$tc1%.2f,"tN":$tcN%.2f,"ratio":${tcN / tc1}%.1f,"rows1":$c1,"rowsN":$cN},""" +
      f""""embedding_outliers":{"t1":$to1%.2f,"tN":$toN%.2f,"ratio":${toN / to1}%.1f,"rows1":$o1,"rowsN":$oN},""" +
      f""""weighted_sample":{"t1":$tw1%.2f,"tN":$twN%.2f,"ratio":${twN / tw1}%.1f,"rows1":$w1,"rowsN":$wN}}""")
    spark.stop()
  }
}
