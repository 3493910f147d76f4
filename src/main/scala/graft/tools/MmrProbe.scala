package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[Similarity.mmrRerank]]: the operator's claim is that
  * the greedy loop runs k−1 DataFrame rounds regardless of how many
  * queries re-rank — per-query work is a one-row join + a rank window,
  * all keyed by query_id — so wall time should grow ~linearly (never
  * quadratically) in the QUERY count at fixed k, and the round count is
  * structural. Measures mmrRerank wall at 1x vs 20x queries (fixed 8
  * candidates per query, 16-dim vectors) and reports the ratio.
  *
  * Usage: runMain graft.tools.MmrProbe [queries1x] [k]
  */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val q1x = if (args.length > 0) args(0).toLong else 20000L
    val k = if (args.length > 1) args(1).toInt else 5
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-mmr-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def candidates(nQueries: Long) = {
      // 8 candidates per query; deterministic pseudo-vectors from the
      // (query, cand) index so both scales draw the same geometry
      val base = spark.range(nQueries * 8)
        .select((col("id") / 8).cast("long").as("query_id"),
          col("id").as("doc_id"),
          (hash(col("id")).cast("double") / 2147483647.0).as("rel"))
      base.withColumn("vec",
        transform(sequence(lit(1), lit(16)),
          i => ((hash(col("doc_id") * i) % 1000) / lit(1000.0))
            .cast("float")))
    }

    def timed(nQueries: Long): (Long, Double) = {
      val cand = candidates(nQueries)
      val t0 = System.nanoTime()
      val rows = Similarity.mmrRerank(cand, "query_id", "doc_id", "rel",
        "vec", k = k).count()
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    timed(q1x) // warm JIT/codegen once
    val (r1, s1) = timed(q1x)
    val (r20, s20) = timed(q1x * 20)
    println(f"[mmrprobe] k=$k queries=$q1x rows=$r1 sec=$s1%.2f")
    println(f"[mmrprobe] k=$k queries=${q1x * 20} rows=$r20 sec=$s20%.2f " +
      f"ratio=${s20 / s1}%.1f (20x queries; <=20 means no superlinear term)")
    spark.stop()
  }
}
