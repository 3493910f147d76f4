package graft.tools

import graft.core.Tables
import graft.operators.GraphRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Interleaved A/B adjudication of the single-step PageRank layout
  * (VERDICT r13 next-item 5): q198's exact step shape, run in ONE warmed
  * JVM with the variants ALTERNATING (A B A B …) so box drift cancels.
  *
  * A = the round-13 layout, reimplemented here verbatim: dangling mass
  * as a driver action, the node-sized contribution aggregate eagerly
  * checkpointed mid-plan (so the returned plan held no edge lineage).
  * B = the shipped round-14 layout ([[GraphRank.pageRankStep]]): dangling
  * mass as a 1-row broadcast, no mid-plan checkpoint, the OUTPUT eagerly
  * checkpointed — one big action instead of three.
  *
  * Round-14 measurement (5 reps each, alternating): A median 2.41 s /
  * 2.39 s (unweighted/weighted), B-core median 1.76 s / 1.72 s — the
  * mid-plan checkpoint's extra actions cost ~0.6 s/step more than their
  * subtree dedup saved. Usage:
  *   runMain graft.tools.GraphAbProbe [sfDir] [repsPerVariant]
  */
object GraphAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-graphab")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()

    def edgesOf(weighted: Boolean): DataFrame = {
      val base = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      if (weighted) base.groupBy(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .agg(count(lit(1)).as("w"))
      else base.select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
    }

    // the round-13 layout, frozen here for the A side
    def r13Step(ranks: DataFrame, e: DataFrame,
        weightCol: Option[String]): DataFrame = {
      val damping = 0.85; val scale = 1000000000L
      val r = ranks.localCheckpoint()
      val nD = r.count().toDouble
      val deg = weightCol match {
        case None => e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
        case Some(w) =>
          e.groupBy(col("src")).agg(sum(col(w).cast("long")).as("__deg"))
      }
      val dmQ = r.join(deg, r("id") === deg("src"), "left_anti")
        .agg(coalesce(sum(floor(lit(scale.toDouble) * col("rank"))),
          lit(0L)))
        .head.getLong(0)
      val contrib = (weightCol match {
        case None =>
          val srcQ = r.join(deg, r("id") === deg("src"))
            .select(col("src"),
              floor(lit(scale.toDouble) * col("rank") / col("__deg"))
                .as("__q"))
          e.join(srcQ, "src")
            .groupBy(col("dst")).agg(sum(col("__q")).as("__qin"))
        case Some(w) =>
          val srcW = r.join(deg, r("id") === deg("src"))
            .select(col("src"), col("rank").as("__r"), col("__deg"))
          e.join(srcW, "src")
            .select(col("dst"),
              floor(lit(scale.toDouble) * col("__r")
                * col(w).cast("long") / col("__deg")).as("__q"))
            .groupBy(col("dst")).agg(sum(col("__q")).as("__qin"))
      }).localCheckpoint()
      r.select(col("id"))
        .join(contrib, r("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / nD)
            + lit(damping)
              * (coalesce(col("__qin"), lit(0L)).cast("double")
                 / lit(scale.toDouble))
            + lit(damping * (dmQ.toDouble / scale.toDouble / nD)))
            .as("rank"))
    }

    def onceA(weighted: Boolean): Double = {
      val edges = edgesOf(weighted)
      val t0 = System.nanoTime()
      val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
      val out = r13Step(GraphRank.initRanks(e), e,
        if (weighted) Some("w") else None)
      out.count()
      e.unpersist()
      (System.nanoTime() - t0) / 1e9
    }
    def onceB(weighted: Boolean): Double = {
      val edges = edgesOf(weighted)
      val t0 = System.nanoTime()
      GraphRank.pageRankStep(GraphRank.initRanks(edges), edges,
        weightCol = if (weighted) Some("w") else None).count()
      (System.nanoTime() - t0) / 1e9
    }

    Seq(false, true).foreach { weighted =>
      val name = if (weighted) "q225-shape" else "q198-shape"
      onceB(weighted) // warm
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        a += onceA(weighted)
        b += onceB(weighted)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[graphab] $name r13-layout median=${med(a.toSeq)}%.3f " +
        a.map(x => f"$x%.2f").mkString("[", ",", "]"))
      println(f"[graphab] $name r14-layout median=${med(b.toSeq)}%.3f " +
        b.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
