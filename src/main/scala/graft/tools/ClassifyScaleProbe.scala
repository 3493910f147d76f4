package graft.tools

import graft.operators.{Classify, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the classifier + span-dedup operators: blow the
  * sf0.1 corpus up by a factor (disjoint ids, replica-marker text
  * mutation — the [[ScaleProbe]] recipe) and measure NB scoring against
  * a FIXED model, repeatedSpans, and removeRepeatedSpans at 1x vs Nx.
  *
  * Expected shapes: NB scoring is a per-row explode + broadcast join +
  * per-doc aggregate (no corpus-sized state) — ratio ≈ factor or below;
  * the span pipelines shuffle span hashes with map-side combine and run
  * doc-partitioned windows — ratio ≈ factor (span multiplicity grows
  * with replication but the hash groupBy collapses it map-side).
  * Writes derived data under /tmp only.
  *
  * Usage: runMain graft.tools.ClassifyScaleProbe [factor]
  */
object ClassifyScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-clsprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_clsprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"),
        col("lang"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    // the model is the FIXED artifact: trained once on the 1x seed and
    // collected once — scoring cost is what scales
    val model = Classify.prepareModel(Classify.naiveBayesModel(
      docs1.filter(col("doc_id") % 5 === 0), "text", "lang", 30))

    // DSIR: the fixed target is the 1x %25 slice; raw side scales
    val target = docs1.filter(col("doc_id") % 25 === 0)

    def nb(d: DataFrame): Long =
      Classify.scoreWithModel(d, model, "doc_id", "text").count()
    def spans(d: DataFrame): Long =
      Dedup.repeatedSpans(d, "doc_id", "text", 4).count()
    def removal(d: DataFrame): Long =
      Dedup.removeRepeatedSpans(d, "doc_id", "text", 4)
        .agg(sum(col("kept_tokens"))).head.getLong(0)
    def dsir(d: DataFrame): Long =
      graft.operators.Dsir.importanceWeights(d, target, "doc_id", "text",
        512).count()

    // warmup at 1x so the timed 1x run is not paying codegen/JIT costs
    docs1.count(); docsN.count()
    nb(docs1); spans(docs1); removal(docs1); dsir(docs1)

    val (n1, tn1) = time(nb(docs1)); val (nN, tnN) = time(nb(docsN))
    val (s1, ts1) = time(spans(docs1)); val (sN, tsN) = time(spans(docsN))
    val (r1, tr1) = time(removal(docs1)); val (rN, trN) = time(removal(docsN))
    val (d1, td1) = time(dsir(docs1)); val (dN, tdN) = time(dsir(docsN))
    require(nN == factor * n1, s"nb rows out of band: $n1 -> $nN")
    require(sN == factor * s1, s"span rows out of band: $s1 -> $sN")
    require(dN == factor * d1, s"dsir rows out of band: $d1 -> $dN")

    println(f"""{"probe":"classify_scale","factor":$factor,""" +
      f""""nb_score":{"t1":$tn1%.2f,"tN":$tnN%.2f,"ratio":${tnN / tn1}%.1f,"rows1":$n1,"rowsN":$nN},""" +
      f""""repeated_spans":{"t1":$ts1%.2f,"tN":$tsN%.2f,"ratio":${tsN / ts1}%.1f,"rows1":$s1,"rowsN":$sN},""" +
      f""""span_removal":{"t1":$tr1%.2f,"tN":$trN%.2f,"ratio":${trN / tr1}%.1f,"kept1":$r1,"keptN":$rN},""" +
      f""""dsir_weights":{"t1":$td1%.2f,"tN":$tdN%.2f,"ratio":${tdN / td1}%.1f,"rows1":$d1,"rowsN":$dN}}""")
    spark.stop()
  }
}
