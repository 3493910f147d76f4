package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static dedup cost probe: N micro-batches anti-joining a LARGE
  * landed corpus's digests (factor× the sf docs table). The claim under
  * test: stream-static joins re-evaluate the static plan EVERY micro-batch,
  * so the unpinned path re-scans + re-distincts the landed artifacts per
  * trigger (per-batch cost ∝ corpus), while [[Dedup.pinDigests]] pays the
  * distinct once — later batches hit the cache (per-batch cost ∝ batch).
  *
  * Usage: runMain graft.tools.StreamProbe [factor] [nBatches]
  */
object StreamProbe {

  private def runOnce(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      glob: String, plan: DataFrame => DataFrame,
      sink: String): (Long, Double, Seq[Long]) = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(glob)
    val t0 = System.nanoTime()
    val q = plan(stream).writeStream
      .outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val perBatch = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.get("triggerExecution").longValue())
    q.stop()
    (spark.table(sink).count(), wall, perBatch)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-streamprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val exDir = s"/tmp/graft_streamprobe_ex_$factor"
    val artDir = s"/tmp/graft_streamprobe_art_$factor"
    val inDir = s"/tmp/graft_streamprobe_in_$factor"
    // landed corpus: factor replicas, disjoint ids, mutated text
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"landed$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(exDir)
    Dedup.dedupArtifacts(spark.read.parquet(exDir), "doc_id", "text")
      .write.mode("overwrite").parquet(artDir)
    val arts = spark.read.parquet(artDir)
    // incoming: 1x, half exact replicas of landed0 — split into nBatches
    // files so maxFilesPerTrigger=1 yields nBatches micro-batches
    docs1.select(
        (col("doc_id") + lit(factor.toLong * stride)).as("doc_id"),
        when(col("doc_id") % 2 === 0,
            concat(lit("landed0 marker "), col("text")))
          .otherwise(concat(lit("fresh material "), col("text"))).as("text"))
      .repartition(nBatches).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    val (nUnpinned, wUnpinned, pbUnpinned) = runOnce(spark, schema, inDir,
      s => Dedup.dedupStreamAgainst(s, arts, "text"), "probe_unpinned")
    val pinned = Dedup.pinDigests(arts)
    val (nPinned, wPinned, pbPinned) =
      try runOnce(spark, schema, inDir,
        s => Dedup.dedupStreamAgainst(s, pinned, "text"), "probe_pinned")
      finally pinned.release()
    require(nUnpinned == nPinned, s"mismatch: $nUnpinned vs $nPinned")

    def tail(xs: Seq[Long]): Double = // steady-state: skip the first batch
      if (xs.size <= 1) Double.NaN else xs.tail.sum.toDouble / xs.tail.size
    println(f"""{"probe":"stream_static","factor":$factor,""" +
      f""""n_batches":${pbUnpinned.size},"survivors":$nPinned,""" +
      f""""unpinned_wall_sec":$wUnpinned%.2f,"pinned_wall_sec":$wPinned%.2f,""" +
      f""""unpinned_batch_ms":[${pbUnpinned.mkString(",")}],""" +
      f""""pinned_batch_ms":[${pbPinned.mkString(",")}],""" +
      f""""unpinned_steady_ms":${tail(pbUnpinned)}%.0f,""" +
      f""""pinned_steady_ms":${tail(pbPinned)}%.0f}""")
    spark.stop()
  }
}
