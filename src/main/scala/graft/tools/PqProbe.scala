package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost-scaling probe for the PQ family (q271-q273): three questions.
  * (1) Encode: one narrow pass — wall should grow ~linearly with the
  * corpus and never worse (broadcast codebook, map-side argmin).
  * (2) ADC scan ([[Similarity.pqTopK]]) with a FIXED query set: the
  * compressed exhaustive scan is linear in code rows BY DESIGN — the
  * probe records the constant (codes are 3 narrow ints, so the slope
  * should be far below any vector-reading scan).
  * (3) IVF-PQ pruning: how many (query, candidate) pairs does the cell
  * filter actually admit vs the full scan's |Q|·(n−1) — the measured
  * counterpart of the nprobe/centroids back-of-envelope.
  *
  * Usage: runMain graft.tools.PqProbe [factor]
  */
object PqProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark: SparkSession = graft.core.Session.builder("graft-pqprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val stride = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head.getInt(0)

    // 10 replicas = the 1x base (so even the base is off the toy scale),
    // 10·factor = the Nx corpus
    def corpusAt(f: Int): DataFrame = {
      val dir = s"/tmp/graft_pqprobe_$f"
      (0 until 10 * f).map { r =>
        emb.select((col("vec_id") + lit(r * stride)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    val queries = emb.filter(col("vec_id") % 400 === 0) // fixed, small
    val c1 = corpusAt(1); val cN = corpusAt(factor)
    val n1 = c1.count(); val nN = cN.count()
    val nq = queries.count()

    def encode(corpus: DataFrame): Long = {
      val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
        dim, 8, 16)
      Similarity.pqEncode(corpus, "vec_id", "embedding", dim, 8, cb)
        .count()
    }
    def scan(corpus: DataFrame): Long =
      Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
        k = 5, dim, 8, 16).count()
    def ivfCand(corpus: DataFrame): Long =
      Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
        k = Int.MaxValue, dim, 8, 16, centroids = 32, nprobe = 4).count()

    encode(c1); scan(c1) // warmup
    val (_, te1) = time(encode(c1))
    val (_, teN) = time(encode(cN))
    val (_, ts1) = time(scan(c1))
    val (_, tsN) = time(scan(cN))
    val (cand, tiN) = time(ivfCand(cN))
    val full = nq * (nN - 1)
    println(f"[pqprobe] n1=$n1 nN=$nN queries=$nq dim=$dim")
    println(f"[pqprobe] encode 1x $te1%.2f s, ${factor}x $teN%.2f s, " +
      f"ratio ${teN / te1}%.1f (factor $factor)")
    println(f"[pqprobe] adc-scan 1x $ts1%.2f s, ${factor}x $tsN%.2f s, " +
      f"ratio ${tsN / ts1}%.1f (factor $factor)")
    println(f"[pqprobe] ivfpq candidates $cand of $full " +
      f"(${100.0 * cand / full}%.1f%%, nprobe/centroids = 12.5%%), " +
      f"wall $tiN%.2f s")

    // VERDICT r9 #4: with the cell assignment moved to ENCODE time
    // (ivfPqEncodeWith written partitioned by cid), does the prepared
    // IVF-PQ query beat the full ADC scan at the same corpus size?
    // Round 9's one-shot form did NOT (assignment re-ran per query:
    // 5.75 s vs 3.59 s at 200k) — the artifacts amortize it away.
    val artDir = s"/tmp/graft_pqprobe_art_$factor"
    val cb = Similarity.pqCodebooks(cN, "vec_id", "embedding", dim, 8, 16)
    val cent = Similarity.selectCentroids(cN, "vec_id", "embedding", 32)
    Similarity.ivfPqEncodeWith(cN, "vec_id", "embedding", dim, 8, cb, cent)
      .write.mode("overwrite").partitionBy("cid").parquet(artDir)
    val codes = spark.read.parquet(artDir)
    def prepared(): Long =
      Similarity.ivfPqTopKPrepared(queries, codes, cb, cent,
        "vec_id", "embedding", k = 5, dim, 8, nprobe = 4).count()
    prepared() // warmup (scan index, codegen)
    val (_, tp1) = time(prepared())
    val (_, tp2) = time(prepared())
    val tp = math.min(tp1, tp2)
    val (_, tsN2) = time(scan(cN))
    val tsBest = math.min(tsN, tsN2)
    println(f"[pqprobe] PREPARED ivfpq query $tp%.2f s vs full adc-scan " +
      f"$tsBest%.2f s at n=$nN (speedup ${tsBest / tp}%.1fx; " +
      f"encode-time assignment amortized into the artifact)")
    spark.stop()
  }
}
