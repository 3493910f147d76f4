package graft.tools

import graft.operators.Decontaminate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-decontamination cost probe: N micro-batches filtered against
  * a LARGE benchmark (factor× replicated eval snippets). The claim under
  * test: without [[Decontaminate.prepareBenchmark]], every micro-batch
  * re-shingles, re-distincts, and re-folds the benchmark into a fresh
  * bloom (per-batch cost grows with the benchmark); prepared, the
  * benchmark work is paid once before the query starts and each trigger
  * pays only the stateless batch-sized filter.
  *
  * Usage: runMain graft.tools.DeconStreamProbe [factor] [nBatches]
  */
object DeconStreamProbe {

  private def runOnce(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, glob: String,
      outDir: String, body: DataFrame => DataFrame): (Long, Double, Seq[Long]) = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(glob)
    val t0 = System.nanoTime()
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        body(batch).write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val perBatch = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.get("triggerExecution").longValue())
    q.stop()
    (spark.read.parquet(outDir).count(), wall, perBatch)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-deconprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = s"/tmp/graft_deconprobe_$factor"
    val inDir = s"$base/in"
    val benchDir = s"$base/bench"
    // benchmark: factor× replicas of every 25th doc's token snippet, each
    // replica prefixed so its shingles are distinct — benchmark SIZE
    // grows with factor while the corpus's true-hit rate stays fixed
    val snippets = docs.filter(col("doc_id") % 25 === 0)
      .select(concat_ws(" ",
        slice(graft.operators.Dedup.tokens(col("text")), 2, 12)).as("qt"))
    (0 until factor).map { r =>
      if (r == 0) snippets
      else snippets.select(concat(lit(s"replica$r marker "), col("qt")).as("qt"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(benchDir)
    val bench = spark.read.parquet(benchDir)
    // corpus: 1×, split into nBatches files
    docs.repartition(nBatches).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    val (nUnprep, wUnprep, pbUnprep) = runOnce(spark, schema, inDir,
      s"$base/out_unprep",
      b => Decontaminate.decontaminate(b, "doc_id", "text", bench, "qt",
        n = 6, minOverlap = 1, bloom = true))
    val pb = Decontaminate.prepareBenchmark(bench, "qt", n = 6)
    val (nPrep, wPrep, pbPrep) =
      try runOnce(spark, schema, inDir, s"$base/out_prep",
        b => Decontaminate.decontaminatePrepared(b, "doc_id", "text", pb))
      finally pb.release()
    require(nUnprep == nPrep, s"survivor mismatch: $nUnprep vs $nPrep")

    def tail(xs: Seq[Long]): Double = // steady-state: skip the first batch
      if (xs.size <= 1) Double.NaN else xs.tail.sum.toDouble / xs.tail.size
    println(f"""{"probe":"decon_stream","factor":$factor,""" +
      f""""n_batches":${pbUnprep.size},"survivors":$nPrep,""" +
      f""""unprepared_wall_sec":$wUnprep%.2f,"prepared_wall_sec":$wPrep%.2f,""" +
      f""""unprepared_batch_ms":[${pbUnprep.mkString(",")}],""" +
      f""""prepared_batch_ms":[${pbPrep.mkString(",")}],""" +
      f""""unprepared_steady_ms":${tail(pbUnprep)}%.0f,""" +
      f""""prepared_steady_ms":${tail(pbPrep)}%.0f}""")
    spark.stop()
  }
}
