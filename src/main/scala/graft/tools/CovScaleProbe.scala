package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Width-scaling probe for the covariance path (VERDICT r9 #5): the
  * round-9 in-row pair explode materialized dims²/2 structs PER ROW —
  * fine at the gate's dims=64, a scale-killer at real embedding widths.
  * This probe times the moments-aggregate formulation (the shipped
  * [[Similarity.embeddingCovariance]]) against the old explode shape at
  * dims 64 vs 512 on the same row count, and checks the two agree
  * cell-for-cell at 64. The number to read is the WIDTH ratio: explode
  * cost grows ~dims² in materialized structs, the aggregate's corpus
  * pass grows ~dims² in ALU only (one buffer per partition, no row
  * fan-out) — at 100 TB the explode shape is also a shuffle-volume
  * cliff, which local wall-time understates.
  *
  * Usage: runMain graft.tools.CovScaleProbe [rows]
  */
object CovScaleProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The round-9 formulation, kept verbatim for the comparison. */
  private def explodeCovariance(emb: DataFrame, vecCol: String,
      scale: Int): DataFrame = {
    val xq = transform(col(s"`$vecCol`"),
      x => floor(x.cast("double") * scale).cast("long"))
    val base = emb.filter(col(s"`$vecCol`").isNotNull).select(xq.as("__q"))
    val lin = base.select(posexplode(col("__q")).as(Seq("__i", "__x")))
      .groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val cells = base.select(explode(flatten(transform(col("__q"),
        (x, i) => transform(
          slice(col("__q"), i + 1, size(col("__q")) - i),
          (y, j0) => struct(i.as("i"), (i + j0).as("j"),
            (x * y).as("p")))))).as("__c"))
      .groupBy(col("__c.i").as("i"), col("__c.j").as("j"))
      .agg(sum(col("__c.p")).as("__sp"))
    val den = col("__n").cast("double") * col("__n").cast("double") *
      lit(scale.toDouble * scale)
    cells
      .join(broadcast(lin.select(col("__i").as("i"),
        col("__s").as("__si"), col("__n"))), Seq("i"))
      .join(broadcast(lin.select(col("__i").as("j"),
        col("__s").as("__sj"))), Seq("j"))
      .select(col("i"), col("j"), col("__n").as("n"),
        (round((col("__n").cast("double") * col("__sp").cast("double")
          - col("__si").cast("double") * col("__sj").cast("double"))
          / den, 6) + lit(0.0)).as("cov"))
  }

  /** Deterministic synthetic float vectors: value = pseudo-hash of
    * (id, dim) scaled to [-0.5, 0.5) — no RNG state, reproducible.
    */
  private def synth(spark: SparkSession, rows: Int, dims: Int): DataFrame =
    spark.range(rows.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => ((pmod(xxhash64(col("id"), d), lit(1000000L))
          .cast("double") / 1000000.0) - 0.5).cast("float"))
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-covscaleprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // agreement check at dims=64: the aggregate path must reproduce the
    // explode path cell-for-cell (same integer moments, same double math)
    val small = synth(spark, math.min(rows, 2000), 64)
      .persist(); small.count()
    val a = Similarity.embeddingCovariance(small, "embedding", 1024)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val b = explodeCovariance(small, "embedding", 1024)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    require(a == b, s"agreement failure: ${a.size} vs ${b.size} cells")
    println(s"""{"probe":"cov_agreement","cells":${a.size},"ok":true}""")
    small.unpersist()

    for (dims <- Seq(64, 512)) {
      val emb = synth(spark, rows, dims).persist()
      emb.count() // materialize outside the timings
      val (_, tAgg) = time(
        Similarity.embeddingCovariance(emb, "embedding", 1024).count())
      val (_, tExp) = time(
        explodeCovariance(emb, "embedding", 1024).count())
      println(s"""{"probe":"cov_width","rows":$rows,"dims":$dims,""" +
        s""""agg_sec":${"%.2f".format(tAgg)},""" +
        s""""explode_sec":${"%.2f".format(tExp)},""" +
        s""""ratio":${"%.1f".format(tExp / tAgg)}}""")
      emb.unpersist()
    }
    spark.stop()
  }
}
