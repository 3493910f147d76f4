package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Where does a gate's wall time actually go? Runs one SparkEntry query
  * closure with a listener recording every job's wall span, task count and
  * description, then prints the jobs sorted by wall — separating Spark-job
  * execution time from the CLOSURE's non-job time (driver-side planning,
  * streaming-harness machinery, file IO), which is the number the guide's
  * empirical loop needs before touching any operator. Usage:
  *   runMain graft.tools.StageProfile <query> [sfDir] [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = graft.core.Session.cpus
    val spark = graft.core.Session.builder("graft-stageprofile")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables(spark, sfDir, "lineitem").count()
    graft.core.Tables(spark, sfDir, "events").groupBy("event_type").count()
      .collect()

    final case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
      var tasks: Int = 0, var stages: Int = 0, var desc: String = "",
      var names: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, start = e.time)
        r.stages = e.stageInfos.size
        r.tasks = e.stageInfos.map(_.numTasks).sum
        r.names = e.stageInfos.map(_.name.takeWhile(_ != '\n').take(60))
          .mkString(" | ")
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = r }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
    }

    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm run: JIT + page cache, not profiled
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ => fn(spark, sfDir).count() }
    val wallMs = (System.nanoTime() - t0) / 1e6 / reps
    spark.sparkContext.removeSparkListener(listener)

    val done = jobs.values.filter(_.end > 0).toSeq
    val jobMs = done.map(j => j.end - j.start).sum.toDouble / reps
    println(f"[stageprofile] $name wall=${wallMs / 1000}%.2f s/rep " +
      f"jobs=${done.size / reps} jobwall=${jobMs / 1000}%.2f s/rep " +
      f"nonjob=${(wallMs - jobMs) / 1000}%.2f s/rep " +
      f"tasks=${done.map(_.tasks).sum / reps}/rep")
    println("[stageprofile] top jobs by wall (all reps):")
    done.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
      println(f"[stageprofile]   job=${j.id}%4d ${(j.end - j.start)}%6d ms " +
        f"stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(40)} " +
        f"[${j.names.take(140)}]")
    }
    spark.stop()
  }
}
