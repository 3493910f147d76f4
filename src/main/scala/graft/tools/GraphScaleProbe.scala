package graft.tools

import graft.operators.GraphRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for PageRank: build the customer→supplier purchase
  * graph from sf0.1, replicate it N× as DISJOINT copies (both endpoints
  * offset per replica), and time 3 fixed Lloyd… Jacobi iterations at 1×
  * vs N×. Per iteration the plan is two bounded shuffles (edges ⋈ ranks
  * on src, aggregate by dst) plus one driver scalar (dangling mass) —
  * wall should scale ≲ N with no superlinear term and identical
  * per-iteration shape at both scales.
  *
  * Writes under /tmp only. Usage: runMain graft.tools.GraphScaleProbe [factor]
  */
object GraphScaleProbe {

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
    val spark: SparkSession = graft.core.Session.builder("graft-graphprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e1 = graft.core.Tables(spark, sfDir, "orders")
      .join(graft.core.Tables(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
      .distinct()
    val dir1 = "/tmp/graft_graphprobe_e1"
    e1.write.mode("overwrite").parquet(dir1)
    val base = spark.read.parquet(dir1)
    val stride = 10000000L
    val dirN = s"/tmp/graft_graphprobe_e$factor"
    (0 until factor).map { r =>
      base.select((col("src") + lit(r * stride)).as("src"),
        (col("dst") + lit(r * stride)).as("dst"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(dirN)
    val eN = spark.read.parquet(dirN)

    def run(e: DataFrame): Double =
      GraphRank.pageRank(e, maxIters = 3, tol = 0.0)
        .agg(sum(col("rank"))).head.getDouble(0)
    run(base); run(eN) // warm
    val (s1, t1) = time(run(base))
    val (sN, tN) = time(run(eN))
    println(f"""{"probe":"graph_scale","factor":$factor,""" +
      f""""edges":[${base.count()},${eN.count()}],""" +
      f""""mass":[$s1%.6f,$sN%.6f],""" +
      f""""pr3_sec":[$t1%.2f,$tN%.2f],"pr3_ratio":${tN / t1}%.2f}""")
    spark.stop()
  }
}
