package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-9 quality operators: replicate the sf0.1
  * documents table by a factor (disjoint ids, mutated text — the
  * [[ScaleProbe]] recipe) and time the bigram-LM scorer, the deflate
  * compression signal, and the blocklist report at 1x vs Nx.
  *
  * What must hold: all three are one-scan linear operators — wall ratio
  * ≲ factor with no quadratic term; the bigram MODEL stays bounded by
  * its size parameters at both scales (the broadcast never grows with
  * the corpus); blocklist output stays terms-sized. Writes derived data
  * under /tmp only.
  *
  * Usage: runMain graft.tools.QualityScaleProbe [factor]
  */
object QualityScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-qualprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val docsDir = s"/tmp/graft_qualprobe_docs_$factor"
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(docsDir)
    val docsN = spark.read.parquet(docsDir)

    def bigram(d: DataFrame): Long =
      TextAnalysis.bigramLogProbScore(d, "doc_id", "text",
        modelSize = 500, historySize = 64).count()
    // .head-read the aggregated VALUE: a bare count() over a global agg
    // can shortcut without evaluating the deflate column
    def deflate(d: DataFrame): Long =
      TextAnalysis.compressionSignals(d, "doc_id", "text")
        .agg(sum(col("n_deflated"))).head.getLong(0)
    def blocklist(d: DataFrame): Long =
      TextAnalysis.blocklistReport(d, "doc_id", "text",
        Seq("slow", "big", "vector", "zzz_unused"))
        .agg(count(lit(1)), sum(col("n_occurrences"))).head.getLong(0)

    // heavy hitters vs exact count on a HIGH-CARDINALITY domain
    // (token x doc-bucket: ~3M distinct) — the regime where the MG
    // sketch's k-counters-per-partition shuffle beats shuffling the
    // whole term domain
    def items(d: DataFrame) = d
      .select((col("doc_id") % 100000).cast("string").as("__b"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("__t"))
      .select(concat_ws("_", col("__t"), col("__b")).as("item"))
    def mg(d: DataFrame): Long =
      graft.operators.Stats.heavyHitters(items(d), "item", 64).count()
    def exactTop(d: DataFrame): Long =
      items(d).groupBy(col("item")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("item")).limit(64).count()

    docs1.count(); docsN.count()
    bigram(docs1); deflate(docs1); blocklist(docs1); mg(docs1)
    exactTop(docs1) // warmup

    val (b1, tb1) = time(bigram(docs1))
    val (bN, tbN) = time(bigram(docsN))
    val (_, td1) = time(deflate(docs1))
    val (_, tdN) = time(deflate(docsN))
    val (l1, tl1) = time(blocklist(docs1))
    val (lN, tlN) = time(blocklist(docsN))
    // invariants: blocklist output is terms-sized at both scales; the
    // bigram output is docs-sized (scales with the corpus, never more)
    require(l1 == 4L && lN == 4L, s"blocklist rows: $l1 -> $lN")
    require(bN <= b1 * factor, s"bigram rows grew superlinearly: $b1 -> $bN")

    val (_, tm1) = time(mg(docs1))
    val (_, tmN) = time(mg(docsN))
    val (_, tx1) = time(exactTop(docs1))
    val (_, txN) = time(exactTop(docsN))

    println(f"""{"probe":"quality_scale","factor":$factor,""" +
      f""""bigram_lm":{"t1":$tb1%.2f,"tN":$tbN%.2f,"ratio":${tbN / tb1}%.1f,"docs1":$b1,"docsN":$bN},""" +
      f""""deflate":{"t1":$td1%.2f,"tN":$tdN%.2f,"ratio":${tdN / td1}%.1f},""" +
      f""""blocklist":{"t1":$tl1%.2f,"tN":$tlN%.2f,"ratio":${tlN / tl1}%.1f},""" +
      f""""mg_sketch":{"t1":$tm1%.2f,"tN":$tmN%.2f,"ratio":${tmN / tm1}%.1f},""" +
      f""""exact_topk":{"t1":$tx1%.2f,"tN":$txN%.2f,"ratio":${txN / tx1}%.1f}}""")
    spark.stop()
  }
}
