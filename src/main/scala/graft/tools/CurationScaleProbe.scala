package graft.tools

import graft.operators.{Dedup, Packing, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-9 curation operators: blow the sf0.1
  * corpus up by a factor (disjoint ids, mutated text — the
  * [[ScaleProbe]] recipe) and measure boilerplate document frequency,
  * chunk novelty, sliding-window chunking, and per-group top terms at 1x
  * vs Nx. All four are aggregation/join pipelines on fixed-width keys
  * with map-side combine — the RATIO should track the factor
  * near-linearly (no quadratic pair blowup, no per-key window over raw
  * rows). Writes derived data under /tmp only.
  *
  * Usage: runMain graft.tools.CurationScaleProbe [factor]
  */
object CurationScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-curprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_curprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"),
        col("lang"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    def boiler(d: DataFrame): Long =
      TextAnalysis.boilerplateSignals(d, "doc_id", "text", 3, 5).count()
    def novelty(d: DataFrame): Long =
      Dedup.chunkNovelty(d, "doc_id", "text", 16).count()
    def chunks(d: DataFrame): Long =
      Packing.chunkText(d, "doc_id", "text", 32, 24).count()
    def terms(d: DataFrame): Long =
      TextAnalysis.topTermsPerGroup(d, "lang", "text", 10).count()

    // warmup: run every operator once at 1x first, so the timed 1x run
    // is not paying the pipeline's codegen/JIT cost that the Nx run then
    // gets for free (ratios < 1 otherwise)
    docs1.count(); docsN.count()
    boiler(docs1); novelty(docs1); chunks(docs1); terms(docs1)

    val (b1, tb1) = time(boiler(docs1)); val (bN, tbN) = time(boiler(docsN))
    val (n1, tn1) = time(novelty(docs1)); val (nN, tnN) = time(novelty(docsN))
    val (c1, tc1) = time(chunks(docs1)); val (cN, tcN) = time(chunks(docsN))
    val (s1, ts1) = time(terms(docs1)); val (sN, tsN) = time(terms(docsN))
    // replicas carry a 2-token prefix, which can push each doc across one
    // stride boundary: ×factor up to one extra chunk per replica doc
    val nDocs1 = docs1.count()
    require(cN >= factor * c1 && cN <= factor * (c1 + nDocs1),
      s"chunk count out of band: $c1 -> $cN (docs $nDocs1, factor $factor)")

    println(f"""{"probe":"curation_scale","factor":$factor,""" +
      f""""boilerplate":{"t1":$tb1%.2f,"tN":$tbN%.2f,"ratio":${tbN / tb1}%.1f,"rows1":$b1,"rowsN":$bN},""" +
      f""""chunk_novelty":{"t1":$tn1%.2f,"tN":$tnN%.2f,"ratio":${tnN / tn1}%.1f,"rows1":$n1,"rowsN":$nN},""" +
      f""""chunk_text":{"t1":$tc1%.2f,"tN":$tcN%.2f,"ratio":${tcN / tc1}%.1f,"rows1":$c1,"rowsN":$cN},""" +
      f""""top_terms":{"t1":$ts1%.2f,"tN":$tsN%.2f,"ratio":${tsN / ts1}%.1f,"rows1":$s1,"rowsN":$sN}}""")
    spark.stop()
  }
}
