package graft.tools

import graft.operators.{Bpe, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-9 training operators: replicate the
  * sf0.1 embeddings / documents tables by a factor (disjoint ids, the
  * [[ScaleProbe]] recipe) and measure
  *
  *  - one k-means Lloyd iteration (k = 64): assignment is a narrow
  *    per-row map over the k-element centroid literal and the update
  *    shuffle is k-wide, so wall ratio ≲ factor (pure scan scaling)
  *    and NOTHING grows with the corpus except the scan;
  *  - the two phases of BPE learning, separately: the corpus →
  *    vocabulary collapse (the ONE corpus-sized pass, ratio ≲ factor)
  *    vs a merge round on the materialized vocabulary (pair counts +
  *    top-1), whose cost tracks the VOCABULARY (Heaps-law sublinear),
  *    not the corpus — the property that makes 100s of merge rounds
  *    affordable at 100 TB.
  *
  * Writes derived data under /tmp only.
  * Usage: runMain graft.tools.TrainScaleProbe [factor]
  */
object TrainScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-trainprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- k-means step at 1x vs Nx ----
    val emb1 = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val estride = emb1.agg(max(col("vec_id"))).head.getLong(0) + 1
    val embDir = s"/tmp/graft_trainprobe_emb_$factor"
    (0 until factor).map { r =>
      emb1.select((col("vec_id") + lit(r * estride)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(embDir)
    val embN = spark.read.parquet(embDir)

    def step(df: DataFrame): Long =
      Similarity.kmeansStep(df, "vec_id", "embedding",
        Similarity.selectCentroids(df, "vec_id", "embedding", 64))
        .agg(sum(col("n"))).head.getLong(0)
    step(emb1); step(embN) // warm both paths once (file listing, codegen)
    val (n1, t1) = time(step(emb1))
    val (nN, tN) = time(step(embN))

    // ---- BPE phases at 1x vs Nx ----
    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dstride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_trainprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * dstride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    def vocab(d: DataFrame, path: String): Long = {
      Bpe.wordCounts(d, "text")
        .select(col("freq"), Bpe.initialSymbols(col("word")).as("syms"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path).count()
    }
    def round(path: String): String = {
      val w = spark.read.parquet(path)
      val top = Bpe.pairCounts(w)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()(0)
      s"${top.getString(0)}+${top.getString(1)}"
    }
    val v1Path = s"/tmp/graft_trainprobe_vocab1"
    val vNPath = s"/tmp/graft_trainprobe_vocabN"
    vocab(docs1, v1Path); vocab(docsN, vNPath) // warm (first parquet write)
    val (v1, tv1) = time(vocab(docs1, v1Path))
    val (vN, tvN) = time(vocab(docsN, vNPath))
    round(v1Path); round(vNPath) // warm
    val (p1, tp1) = time(round(v1Path))
    val (pN, tpN) = time(round(vNPath))

    println(f"""{"probe":"train_scale","factor":$factor,""" +
      f""""kmeans_rows":[$n1,$nN],"kmeans_sec":[$t1%.2f,$tN%.2f],""" +
      f""""kmeans_ratio":${tN / t1}%.2f,""" +
      f""""vocab_words":[$v1,$vN],"vocab_build_sec":[$tv1%.2f,$tvN%.2f],""" +
      f""""vocab_build_ratio":${tvN / tv1}%.2f,""" +
      f""""bpe_round_top":["$p1","$pN"],""" +
      f""""bpe_round_sec":[$tp1%.2f,$tpN%.2f],""" +
      f""""bpe_round_ratio":${tpN / tp1}%.2f}""")
    spark.stop()
  }
}
