package graft.tools

import graft.algos.{DeltaLoad, DeltaLoadParams}
import graft.io.DataFormat
import org.apache.spark.sql.functions._

/** Phase-level timing of the q32_delta_load closure on a fresh session —
  * the bench regression shows up only on the FIRST execution in a session,
  * so this isolates which phase pays the warmup.
  * Usage: runMain graft.tools.Profile32 [sfDir]
  */
object Profile32 {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile32] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-profile32")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    time("warmup_lineitem") {
      graft.core.Tables(spark, sfDir, "lineitem").count()
    }
    time("warmup_events") {
      graft.core.Tables(spark, sfDir, "events").groupBy("event_type").count()
        .collect()
    }
    val base = java.nio.file.Files.createTempDirectory("graft_p32").toString
    val activeD = base + "/active/t"
    val deltaD = base + "/delta/t"
    val e = graft.core.Tables(spark, sfDir, "events")
    time("write_active") {
      e.filter(col("event_id") % 5 =!= 0)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"), col("event_type"))
        .write.partitionBy("event_type").parquet(activeD)
    }
    time("write_delta") {
      e.filter(col("event_id") % 4 === 0)
        .select(col("event_id"), col("user_id"),
          round(col("value") + 10, 2).as("value"),
          when(col("event_id") % 20 === 0, "D").otherwise("N")
            .as("recordmode"), col("event_type"))
        .write.parquet(deltaD)
    }
    val load = new DeltaLoad(spark,
      new graft.fsops.FsOps(spark.sparkContext.hadoopConfiguration),
      DeltaLoadParams(
      activeDir = activeD, deltaDir = deltaD,
      format = DataFormat.Parquet,
      businessKey = Seq("event_id"), technicalKey = Seq("user_id"),
      recordsToDelete = Seq("D"),
      targetPartitions = Seq("event_type")))
    val dfs = time("dl_read") { load.read() }
    val out = time("dl_transform") { load.transform(dfs) }
    time("dl_write") { load.write(out) }
    time("final_read_count") {
      spark.read.option("basePath", activeD).parquet(activeD).count()
    }
    spark.stop()
  }
}
