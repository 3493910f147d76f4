package graft.tools

import graft.core.JobRunner
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Round-10 end-to-end scale rehearsal (VERDICT r9 #7): the per-operator
  * probes argue each stage scales; this one composes the FLAGSHIP curation
  * chain through the params surface — the same JobRunner/JSON-config path a
  * cluster submit would use —
  *
  *   CorpusDedup → Decontaminate → GopherFilter → TokenBudgetMix →
  *   SequencePacking
  *
  * on the sf0.1 corpus at 1x vs Nx (ScaleProbe's replica recipe: disjoint
  * id ranges, mutated text) and records per-stage wall, end-to-end wall,
  * and the MAX TASK INPUT BYTES seen anywhere in the chain. The composed
  * claim is stronger than the per-stage ones: intermediate parquet
  * round-trips between stages must not concentrate rows (the max-task
  * bound is the "would a 1000-executor cluster see a straggler" check),
  * and the end-to-end ratio should track the factor near-linearly.
  *
  * Usage: runMain graft.tools.PipelineScaleProbe [factor]
  */
object PipelineScaleProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Max per-task input bytes across everything run since the last reset —
    * the straggler bound: a composed chain whose stages all partition
    * correctly keeps this flat-ish as the corpus grows (bounded by split
    * size), while any stage that funnels rows into one task shows up as a
    * factor-proportional spike.
    */
  private final class MaxTaskInput extends SparkListener {
    val max = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val in = Option(t.taskMetrics).map(_.inputMetrics.bytesRead)
        .getOrElse(0L)
      max.getAndUpdate(m => math.max(m, in)); ()
    }
    def reset(): Unit = max.set(0L)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark: SparkSession = graft.core.Session.builder("graft-pipeprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTaskInput
    spark.sparkContext.addSparkListener(listener)

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val base = Files.createTempDirectory("graft_pipeprobe").toString
    def p(sub: String) = s"$base/$sub"

    // 1x corpus and the benchmark (a fixed slice of REAL docs, so the
    // decontamination stage has genuine hits at both scales)
    docs1.write.mode("overwrite").parquet(p("docs_1x"))
    docs1.filter(col("doc_id") % 97 === 0).select(col("text"))
      .write.mode("overwrite").parquet(p("bench"))
    // Nx corpus: ScaleProbe's replica recipe (disjoint ids, near-dup text
    // — the dedup stage sees real cross-replica candidate pressure)
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"replica$r marker "), col("text")).as("text"),
        col("lang"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(p(s"docs_${factor}x"))

    def run(algo: String, tag: String, json: String): Unit = {
      val f = Paths.get(base, s"$algo-$tag.json")
      Files.writeString(f, json)
      JobRunner.execute(spark, algo, f.toString)
    }

    /** The flagship chain over `srcDir`; returns per-stage seconds and the
      * packed-row count. budgetPerGroup scales with the corpus so the mix
      * stage selects a comparable FRACTION at both scales.
      */
    def chain(tag: String, srcDir: String, budget: Double)
        : (Seq[(String, Double)], Long) = {
      val stages = Seq(
        ("dedup", () => run("CorpusDedup", tag,
          s"""{"source_dir": "$srcDir", "target_dir": "${p(s"$tag-dd")}",
             | "id_column": "doc_id", "text_column": "text"}"""
            .stripMargin)),
        ("decontaminate", () => run("Decontaminate", tag,
          s"""{"source_dir": "${p(s"$tag-dd")}",
             | "target_dir": "${p(s"$tag-dc")}",
             | "benchmark_dir": "${p("bench")}",
             | "benchmark_text_column": "text",
             | "id_column": "doc_id", "text_column": "text",
             | "ngram_size": 8, "min_overlap": 1, "use_bloom": false}"""
            .stripMargin)),
        ("quality", () => run("GopherFilter", tag,
          s"""{"source_dir": "${p(s"$tag-dc")}",
             | "target_dir": "${p(s"$tag-q")}",
             | "id_column": "doc_id", "text_column": "text",
             | "min_words": 5, "max_words": 100000,
             | "min_mean_len": 2.0, "max_mean_len": 12.0,
             | "max_symbol_ratio": 0.5, "min_alpha_ratio": 0.3,
             | "min_stopwords": 0}""".stripMargin)),
        // weight derivation between stages (narrow, zero-shuffle): the
        // mix stage caps on token mass, so attach n_tokens to each row
        ("weights", () => {
          val q = spark.read.parquet(p(s"$tag-q"))
          q.withColumn("n_tokens",
              size(split(trim(col("text")), "\\s+")).cast("long"))
            .write.mode("overwrite").parquet(p(s"$tag-w")); ()
        }),
        ("mix", () => run("TokenBudgetMix", tag,
          s"""{"source_dir": "${p(s"$tag-w")}",
             | "target_dir": "${p(s"$tag-mx")}",
             | "id_column": "doc_id", "group_column": "lang",
             | "weight_column": "n_tokens",
             | "budget_per_group": $budget}""".stripMargin)),
        ("pack", () => run("SequencePacking", tag,
          s"""{"source_dir": "${p(s"$tag-mx")}",
             | "target_dir": "${p(s"$tag-pk")}",
             | "id_column": "doc_id", "text_column": "text",
             | "budget_tokens": 2048}""".stripMargin)))
      val walls = stages.map { case (name, f) =>
        val (_, sec) = time(f()); (name, sec)
      }
      (walls, spark.read.parquet(p(s"$tag-pk")).count())
    }

    val nDocs = docs1.count()
    // per-group token budget ~ a third of the 1x per-lang token mass,
    // scaled by the factor on the Nx side (same selected fraction)
    val budget1 = 60000.0

    // warmup: full chain once at 1x so the timed 1x run is not paying
    // codegen/JIT that the Nx run then gets for free
    chain("warm", p("docs_1x"), budget1)

    listener.reset()
    val (w1, packed1) = chain("x1", p("docs_1x"), budget1)
    val maxIn1 = listener.max.get()
    listener.reset()
    val (wN, packedN) = chain(s"x$factor", p(s"docs_${factor}x"),
      budget1 * factor)
    val maxInN = listener.max.get()

    val t1 = w1.map(_._2).sum
    val tN = wN.map(_._2).sum
    val stageJson = w1.zip(wN).map { case ((n, a), (_, b)) =>
      f""""$n":{"t1":$a%.2f,"tN":$b%.2f,"ratio":${b / a}%.1f}"""
    }.mkString(",")
    println(f"""{"probe":"pipeline_scale","factor":$factor,""" +
      f""""docs_1x":$nDocs,"packed_1x":$packed1,"packed_Nx":$packedN,""" +
      f""""total":{"t1":$t1%.2f,"tN":$tN%.2f,"ratio":${tN / t1}%.2f},""" +
      f""""max_task_input_kb":{"x1":${maxIn1 / 1024.0}%.1f,""" +
      f""""xN":${maxInN / 1024.0}%.1f,""" +
      f""""ratio":${maxInN.toDouble / math.max(1L, maxIn1)}%.2f},""" +
      stageJson + "}")
    spark.stop()
  }
}
