package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental-dedup scaling probe: a SMALL batch against a LARGE landed
  * corpus (factor× the sf docs table, disjoint ids, mutated text — the
  * ScaleProbe construction). The claim under test: with persisted
  * [[Dedup.dedupArtifacts]], the increment's cost is driven by the BATCH,
  * the landed side contributing a narrow artifact scan — while the
  * self-contained path re-digests and re-signs the whole landed corpus
  * every increment.
  *
  * Usage: runMain graft.tools.IncProbe [factor]
  */
object IncProbe {

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
    val spark = graft.core.Session.builder("graft-incprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val stride = docs1.agg(max(col("doc_id"))).head.getLong(0) + 1
    val exDir = s"/tmp/graft_incprobe_ex_$factor"
    val artDir = s"/tmp/graft_incprobe_art_$factor"
    // landed corpus: factor replicas with disjoint ids, mutated text
    (0 until factor).map { r =>
      docs1.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"landed$r marker "), col("text")).as("text"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(exDir)
    val existing = spark.read.parquet(exDir)
    // incoming batch: 1x — half exact replicas of landed0 (the digest
    // path), half prefix-mutated near-dups of landed content (the banded
    // join + verify path); only docs short enough that the prefix shifts
    // jaccard below threshold survive
    val incoming = docs1.select(
      (col("doc_id") + lit(factor.toLong * stride)).as("doc_id"),
      when(col("doc_id") % 2 === 0,
          concat(lit("landed0 marker "), col("text")))
        .otherwise(concat(lit("fresh material "), col("text"))).as("text"))
    incoming.count(); existing.count() // warm the scans

    val (_, tArtBuild) = time {
      Dedup.dedupArtifacts(existing, "doc_id", "text")
        .write.mode("overwrite").parquet(artDir)
    }
    val arts = spark.read.parquet(artDir)

    val (nSelf, tSelf) = time {
      Dedup.dedupIncrement(existing, incoming, "doc_id", "text").count()
    }
    val (nArts, tArts) = time {
      Dedup.dedupIncrement(existing, incoming, "doc_id", "text",
        artifacts = Some(arts)).count()
    }
    require(nSelf == nArts, s"result mismatch: $nSelf vs $nArts")

    println(f"""{"probe":"increment","factor":$factor,""" +
      f""""landed_docs":${existing.count()},"batch_docs":${incoming.count()},""" +
      f""""survivors":$nSelf,""" +
      f""""self_contained_sec":$tSelf%.2f,"with_artifacts_sec":$tArts%.2f,""" +
      f""""artifact_build_sec":$tArtBuild%.2f,""" +
      f""""speedup":${tSelf / tArts}%.1f}""")
    spark.stop()
  }
}
