package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-vs-exact probe for the KLL-style quantile aggregate:
  * replicate the sf0.1 events table N× (disjoint event ids, values
  * jittered deterministically so the domain grows) and time per-type
  * median/p99 via
  *  - the quantile sketch at k=256 (bounded state: ≤ k·log(n/k)
  *    (value, weight) pairs per partition-group cross the shuffle), vs
  *  - the exact window path (row_number + count over the partition —
  *    every VALUE crosses the shuffle and sorts).
  * Also reports the sketch's worst rank error vs the exact answer.
  * Writes under /tmp only. Usage: runMain graft.tools.QuantileSketchProbe [factor]
  */
object QuantileSketchProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-qsprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev1 = graft.core.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val stride = ev1.agg(max(col("event_id"))).head.getLong(0) + 1
    val dir = s"/tmp/graft_qsprobe_$factor"
    (0 until factor).map { r =>
      ev1.select((col("event_id") + lit(r * stride)).as("event_id"),
        col("event_type"),
        (col("value") + lit(r * 0.001)).as("value"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
    val evN = spark.read.parquet(dir)

    val ps = Seq(0.5, 0.99)
    def sketch(d: DataFrame): Array[(String, Double, Double)] =
      graft.operators.Stats
        .sketchQuantilesPerGroup(d, "event_type", "value", ps, k = 256)
        .select(col("event_type"), col("p"), col("q_value"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def exact(d: DataFrame): Map[(String, Double), (Double, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val ranked = d
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("event_type"))))
      ps.flatMap { p =>
        ranked.filter(col("rk") >= greatest(lit(1L),
            ceil(lit(p) * col("n")).cast("long")))
          .groupBy(col("event_type"))
          .agg(min(col("value")).as("q"), max(col("n")).as("n"))
          .collect().map(r => (r.getString(0), p) ->
            ((r.getDouble(1), r.getLong(2))))
      }.toMap
    }
    sketch(ev1); exact(ev1) // warm
    val (s1, ts1) = time(sketch(ev1))
    val (sN, tsN) = time(sketch(evN))
    val (e1, te1) = time(exact(ev1))
    val (eN, teN) = time(exact(evN))
    // worst rank error of the Nx sketch vs the Nx exact values, in
    // rank space: |#(values <= est) - ceil(p*n)| / n per (type, p)
    val errs = sN.map { case (t, p, est) =>
      val n = eN((t, p))._2
      val below = evN.filter(col("event_type") === t &&
        col("value") <= est).count()
      math.abs(below - math.max(1, math.ceil(p * n).toLong)).toDouble / n
    }
    println(f"""{"probe":"quantile_sketch","factor":$factor,""" +
      f""""sketch_sec":[$ts1%.2f,$tsN%.2f],"sketch_ratio":${tsN / ts1}%.2f,""" +
      f""""exact_sec":[$te1%.2f,$teN%.2f],"exact_ratio":${teN / te1}%.2f,""" +
      f""""max_rank_err":${errs.max}%.4f}""")
    spark.stop()
  }
}
