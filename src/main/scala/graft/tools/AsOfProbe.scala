package graft.tools

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** History-depth scaling probe for the as-of join (round 10): the round-9
  * formulation equi-joined on the key with the temporal predicate and
  * ranked matches per left row — the intermediate is |left| ×
  * matches-per-key, which grows with history depth even though the answer
  * (one row per left row) does not. The shipped sort-fill formulation
  * unions the two sides and fills through one window: intermediate is
  * |left| + |right|, one exchange, no join node.
  *
  * This probe holds the left side constant and grows the per-key right
  * history; the number to read is how the two walls scale with depth —
  * sort-fill should stay ~flat (history-linear scan), pair-expansion
  * should grow ~linearly in depth from the candidate fan-out. Agreement
  * is require()d at the smallest depth.
  *
  * Usage: runMain graft.tools.AsOfProbe [keys] [leftPerKey]
  */
object AsOfProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Force the MATCH column: a bare count() lets Catalyst prune the
    * fill window away entirely (the filter only reads the side tag), so
    * timings must aggregate over the matched right id.
    */
  private def force(df: DataFrame): Long =
    df.agg(count(col("r_id"))).collect()(0).getLong(0)

  /** Deterministic synthetic series: `n` rows per key, pseudo-random
    * timestamps in [0, 1e9) from xxhash — no RNG state.
    */
  private def synth(spark: SparkSession, keys: Int, perKey: Int,
      idCol: String, tsCol: String, keyCol: String): DataFrame =
    spark.range(keys.toLong * perKey).select(
      col("id").as(idCol),
      pmod(col("id"), lit(keys.toLong)).as(keyCol),
      pmod(xxhash64(col("id")), lit(1000000000L)).as(tsCol))

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(100)
    val leftPerKey = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      graft.core.Session.cpus.toString)
    val spark = graft.core.Session.builder("graft-asofprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val left = synth(spark, keys, leftPerKey, "p_id", "p_ts", "k")
      .persist(); left.count()

    for (depth <- Seq(100, 1000, 10000, 50000)) {
      val right = synth(spark, keys, depth, "r_id", "r_ts", "rk")
        .persist(); right.count()
      val fill = AsOfJoin(left, right, col("k"), col("rk"),
        col("p_ts"), col("r_ts"), col("r_id"))
      val pair = AsOfJoin.pairExpansion(left, right, col("k"), col("rk"),
        col("p_ts"), col("r_ts"), col("p_id"), col("r_id"))
      if (depth == 100) {
        val a = fill.select(col("p_id"), col("r_id")).collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
        val b = pair.select(col("p_id"), col("r_id")).collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
        require(a == b, s"agreement failure at depth=$depth")
        println(s"""{"probe":"asof_agreement","rows":${a.size},"ok":true}""")
      }
      val (_, tFill) = time(force(fill))
      val (_, tPair) = time(force(pair))
      println(s"""{"probe":"asof_depth","keys":$keys,""" +
        s""""left_per_key":$leftPerKey,"right_per_key":$depth,""" +
        s""""sortfill_sec":${"%.2f".format(tFill)},""" +
        s""""pair_sec":${"%.2f".format(tPair)},""" +
        s""""ratio":${"%.1f".format(tPair / tFill)}}""")
      right.unpersist()
    }

    // hot-key scenario: ONE key owns the whole table — plain sort-fill
    // serializes into a single task; the bucketed variant spreads the
    // sort over time buckets (seeds carry the cross-bucket dependency).
    // Agreement is checked at 1M rows (the spec also pins it); the
    // timing leg runs at 16M, where the single-task sort stops being
    // free (at 1M an in-memory one-task sort wins on stage overhead —
    // the crossover is task-capacity, not a constant factor)
    val aLeft = synth(spark, 1, 20000, "p_id", "p_ts", "k")
      .persist(); aLeft.count()
    val aRight = synth(spark, 1, 1000000, "r_id", "r_ts", "rk")
      .persist(); aRight.count()
    val pa = AsOfJoin(aLeft, aRight, col("k"), col("rk"),
        col("p_ts"), col("r_ts"), col("r_id"))
      .select(col("p_id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val pb = AsOfJoin.bucketed(aLeft, aRight, col("k"), col("rk"),
        col("p_ts"), col("r_ts"), col("r_id"), bucketWidth = 16000000L)
      .select(col("p_id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    require(pa == pb, "hot-key agreement failure")
    aLeft.unpersist(); aRight.unpersist()
    val hotLeft = synth(spark, 1, 100000, "p_id", "p_ts", "k")
      .persist(); hotLeft.count()
    val hotRight = synth(spark, 1, 16000000, "r_id", "r_ts", "rk")
      .persist(); hotRight.count()
    val plain = AsOfJoin(hotLeft, hotRight, col("k"), col("rk"),
      col("p_ts"), col("r_ts"), col("r_id"))
    val buck = AsOfJoin.bucketed(hotLeft, hotRight, col("k"), col("rk"),
      col("p_ts"), col("r_ts"), col("r_id"), bucketWidth = 16000000L)
    val (_, tPlain) = time(force(plain))
    val (_, tBuck) = time(force(buck))
    println(s"""{"probe":"asof_hotkey","left":100000,"right":16000000,""" +
      s""""buckets":63,"plain_sec":${"%.2f".format(tPlain)},""" +
      s""""bucketed_sec":${"%.2f".format(tBuck)},""" +
      s""""ratio":${"%.1f".format(tPlain / tBuck)}}""")
    spark.stop()
  }
}
