package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the sketch/LSH paths: blow the sf0.1 corpus up by a
  * factor (disjoint id ranges, mutated text so replicas are near- but not
  * exact duplicates) and measure the scale-path operators at 1x vs Nx.
  * The point is the RATIO: bucketed LSH pipelines should grow
  * near-linearly in corpus size while the exact all-pairs forms grow
  * quadratically. Writes the derived corpus under /tmp only.
  *
  * Usage: runMain graft.tools.ScaleProbe [factor]
  */
object ScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-scaleprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
    val emb1 = graft.core.Tables(spark, sfDir, "embeddings")
    val nDocs = docs1.count()

    // replicate with disjoint ids: stride past the observed max id so
    // replicas can never collide with real ids (a fixed 10M stride would
    // silently corrupt the dedup/ANN counts once source ids reach it)
    val stride = math.max(
      docs1.agg(max(col("doc_id"))).head.getLong(0),
      emb1.agg(max(col("vec_id"))).head.getLong(0)) + 1
    val docsDir = s"/tmp/graft_scaleprobe_docs_$factor"
    val embDir = s"/tmp/graft_scaleprobe_emb_$factor"
    val replicas = (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    replicas.write.mode("overwrite").parquet(docsDir)
    val embN = (0 until factor).map { r =>
      emb1.select((col("vec_id") + lit(r * stride)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)
    embN.write.mode("overwrite").parquet(embDir)
    val docsN = spark.read.parquet(docsDir)
    val embNr = spark.read.parquet(embDir)

    def lshDedup(d: DataFrame): Long =
      Dedup.jaccardVerify(Dedup.minhashCandidates(d, "doc_id", "text"),
        d, "doc_id", "text").filter(col("jaccard") >= 0.5).count()
    def embDedup(e: DataFrame): Long =
      Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.4).count()
    def ann(e: DataFrame): Long =
      Similarity.annTopK(e.filter(col("vec_id") % 5000 === 0), e,
        "vec_id", "embedding", k = 5).count()

    // warmup
    docs1.count(); embNr.count(); docsN.count()

    val (c1, t1) = time(lshDedup(docs1))
    val (cN, tN) = time(lshDedup(docsN))
    val (e1, u1) = time(embDedup(emb1))
    val (eN, uN) = time(embDedup(embNr))
    val (a1, v1) = time(ann(emb1))
    val (aN, vN) = time(ann(embNr))

    // connected-components depth scaling on path graphs (worst-case
    // diameter). Two properties under test: (a) per-round cost stays FLAT
    // as depth grows — the per-round localCheckpoint keeps the plan at
    // one leaf regardless of depth; before the lineage cut the plan
    // doubled every round and the driver OOMed during analysis around
    // round 10, so finishing the deep chain AT ALL is a datapoint;
    // (b) pointer-jumping makes round count O(log diameter), so DOUBLING
    // the diameter (14 -> 28) should cost roughly one extra round, not 2x
    // the wall time.
    // breadth: label the 20x corpus's REAL near-dup pair graph (~1M
    // verified pairs at factor 20 — wide, shallow components, the shape
    // production dedup actually sees). Wall time here is dominated by the
    // per-round edge join, which shuffles only (id, label) pairs.
    val (ccN, wB) = time {
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(docsN, "doc_id", "text"),
          docsN, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val r = Dedup.connectedComponents(pairs)
      val n = r.count(); r.unpersist(); n
    }

    val (_, w14) = time {
      val r = Dedup.connectedComponents(
        spark.range(1, 15).select(col("id").as("id_a"),
          (col("id") + 1).as("id_b")), maxIter = 14)
      r.count(); r.unpersist()
    }
    val (_, w28) = time {
      val r = Dedup.connectedComponents(
        spark.range(1, 29).select(col("id").as("id_a"),
          (col("id") + 1).as("id_b")), maxIter = 28)
      r.count(); r.unpersist()
    }

    // winnowing: fingerprint CONSTRUCTION is per-doc native loops and
    // must scale ~linearly in corpus size; the candidate JOIN is Σ df²
    // over shared fingerprints (documented inherent bound — on this
    // replica corpus every fingerprint repeats ~factor times, so pair
    // volume grows ~factor² by construction; that regime is what the
    // minShared threshold and an exact-dedup prepass exist for).
    val (f1c, wf1) = time(
      Dedup.winnowFingerprints(docs1, "doc_id", "text").count())
    val (fNc, wfN) = time(
      Dedup.winnowFingerprints(docsN, "doc_id", "text").count())

    println(f"""{"probe":"scale","factor":$factor,"docs_1x":$nDocs,""" +
      f""""winnow_fp":{"t1":$wf1%.2f,"tN":$wfN%.2f,"ratio":${wfN / wf1}%.1f,"rows1":$f1c,"rowsN":$fNc},""" +
      f""""minhash_dedup":{"t1":$t1%.2f,"tN":$tN%.2f,"ratio":${tN / t1}%.1f,"pairs1":$c1,"pairsN":$cN},""" +
      f""""embedding_dedup":{"t1":$u1%.2f,"tN":$uN%.2f,"ratio":${uN / u1}%.1f,"pairs1":$e1,"pairsN":$eN},""" +
      f""""ann_topk":{"t1":$v1%.2f,"tN":$vN%.2f,"ratio":${vN / v1}%.1f,"rows1":$a1,"rowsN":$aN},""" +
      f""""cc_depth":{"secDiam14":$w14%.2f,"secDiam28":$w28%.2f,"doubleDiamRatio":${w28 / w14}%.2f},""" +
      f""""cc_breadth":{"nodesLabeled":$ccN,"sec":$wB%.2f}}""")
    spark.stop()
  }
}
