package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("floorDiv: exact long floor division at any sign and magnitude") {
    val df = Seq(-15L, -7L, -1L, 0L, 6L, 7L, 13L, 14L,
      3000000000000000021L).toDF("v")
    df.select(RangeJoin.floorDiv($"v", 7L)).as[Long].collect() shouldBe
      Array(-3L, -1L, -1L, 0L, 0L, 1L, 1L, 2L, 428571428571428574L)
  }

  test("pointInInterval: bucket-spanning intervals, boundary points, keys") {
    val pts = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 11L), (5L, 25L))
      .toDF("p_id", "p")
    val ivs = Seq((10L, 0L, 10L), (11L, 5L, 24L), (12L, 26L, 30L))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 4L)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().sorted
    got shouldBe Array((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L),
      (3L, 11L), (4L, 11L)).sorted // 25 hits nothing; hi inclusive at 10
    // half-open variant drops the hi-boundary match
    val ho = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 4L,
        inclusiveEnd = false)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().sorted
    ho shouldBe Array((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (4L, 11L)).sorted
    // keyed: same ranges only meet within the key
    val kp = Seq(("a", 1L, 5L), ("b", 2L, 5L)).toDF("k", "p_id", "p")
    val ki = Seq(("a", 10L, 0L, 9L)).toDF("k", "iv_id", "lo", "hi")
    RangeJoin.pointInInterval(kp, ki, "p", "lo", "hi", 4L,
        keyCols = Seq("k"))
      .select($"p_id").as[Long].collect() shouldBe Array(1L)
  }

  test("pointInInterval matches the plain inequality join on random data") {
    val pts = spark.range(0, 500).select($"id".as("p_id"),
      (pmod(hash($"id"), lit(1000))).cast("long").as("p"))
    val ivs = spark.range(0, 80).select($"id".as("iv_id"),
      pmod(hash($"id" + 7), lit(950)).cast("long").as("lo"))
      .withColumn("hi", $"lo" + pmod(hash($"iv_id" + 13), lit(60)).cast("long"))
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 16L)
      .select($"p_id", $"iv_id")
    val exp = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"p_id", $"iv_id")
    assertSameRows(got, exp)
  }

  test("intervalOverlap: multi-bucket pairs counted exactly once") {
    // two long intervals sharing MANY buckets must emit ONE pair
    val a = Seq((1L, 0L, 100L), (2L, 200L, 210L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((7L, 50L, 150L), (8L, 300L, 310L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    got shouldBe Array((1L, 7L))
    // touching endpoints overlap under closed semantics
    val t1 = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val t2 = Seq((2L, 10L, 20L)).toDF("b_id", "b_lo", "b_hi")
    RangeJoin.intervalOverlap(t1, t2, "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .count() shouldBe 1L
  }

  test("intervalOverlap matches the plain join on random keyed data") {
    def wins(tag: String) = spark.range(0, 300).select(
      pmod($"id", lit(20)).as("k"), ($"id" + 1000).as(s"${tag}_id"),
      pmod(hash($"id" * 31), lit(500)).cast("long").as(s"${tag}_lo"))
      .withColumn(s"${tag}_hi",
        col(s"${tag}_lo") + pmod(hash(col(s"${tag}_id")), lit(40)).cast("long"))
    val got = RangeJoin.intervalOverlap(wins("a"), wins("b"),
        "a_lo", "a_hi", "b_lo", "b_hi", 16L, keyCols = Seq("k"))
      .select($"k", $"a_id", $"b_id")
    val l = wins("a"); val r = wins("b")
    val exp = l.join(r, Seq("k"))
      .filter($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"k", $"a_id", $"b_id")
    assertSameRows(got, exp)
  }

  test("mergeIntervals: islands, touching merge, absorbed counts") {
    val df = Seq(
      ("u", 0L, 5L), ("u", 3L, 7L), ("u", 7L, 9L), // one island (touching)
      ("u", 11L, 12L),                             // gap -> new island
      ("v", 2L, 2L))
      .toDF("k", "lo", "hi")
    val got = RangeJoin.mergeIntervals(df, Seq("k"), "lo", "hi")
      .as[(String, Long, Long, Long)].collect().sorted
    got shouldBe Array(("u", 0L, 9L, 3L), ("u", 11L, 12L, 1L),
      ("v", 2L, 2L, 1L))
  }

  test("range-join plans are bucket equi-joins: no nested-loop, no product") {
    val pts = spark.range(10).select($"id".as("p_id"),
      ($"id" * 3).as("p"))
    val ivs = spark.range(5).select($"id".as("iv_id"), ($"id" * 5).as("lo"),
      ($"id" * 5 + 4).as("hi"))
    val plan1 = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    plan1 should not include "BroadcastNestedLoopJoin"
    plan1 should not include "CartesianProduct"
    val a = ivs.select($"iv_id".as("a_id"), $"lo".as("a_lo"), $"hi".as("a_hi"))
    val b = ivs.select($"iv_id".as("b_id"), $"lo".as("b_lo"), $"hi".as("b_hi"))
    val plan2 = RangeJoin.intervalOverlap(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .queryExecution.executedPlan.toString
    plan2 should not include "BroadcastNestedLoopJoin"
    plan2 should not include "CartesianProduct"
  }

  test("NULL interval endpoints drop silently (the plain-join contract), " +
      "never raise; null points fall out of the bucket join") {
    val pts = Seq((1L, Some(5L)), (2L, Option.empty[Long]))
      .toDF("p_id", "p")
    val ivs = Seq((10L, Some(0L), Some(9L)), (11L, Option.empty[Long], Some(9L)),
      (12L, Some(0L), Option.empty[Long]))
      .toDF("iv_id", "lo", "hi")
    RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 4L)
      .select($"p_id", $"iv_id").as[(Long, Long)]
      .collect() shouldBe Array((1L, 10L))
    RangeJoin.mergeIntervals(ivs, Seq.empty, "lo", "hi")
      .select($"lo", $"hi", $"n_merged").as[(Long, Long, Long)]
      .collect() shouldBe Array((0L, 9L, 1L))
  }

  test("malformed or over-wide intervals fail fast instead of exploding") {
    def chainMessage(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    val pts = Seq((1L, 5L)).toDF("p_id", "p")
    val bad = Seq((1L, 10L, 5L)).toDF("iv_id", "lo", "hi") // hi < lo
    val e = intercept[Throwable] {
      RangeJoin.pointInInterval(pts, bad, "p", "lo", "hi", 4L).collect()
    }
    chainMessage(e) should include("malformed or spans")
    val wide = Seq((1L, 0L, 100000L)).toDF("iv_id", "lo", "hi")
    val e2 = intercept[Throwable] {
      RangeJoin.pointInInterval(pts, wide, "p", "lo", "hi", 4L,
        maxBucketsPerInterval = 100).collect()
    }
    chainMessage(e2) should include("malformed or spans")
  }
}
