package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("debounce keeps the first event of each burst (chain semantics)") {
    val e = Seq(
      ("u", 1L, 0L), ("u", 2L, 5L), ("u", 3L, 10L), // one chain at gap 7
      ("u", 4L, 20L),                               // 10 > 7: new burst
      ("v", 5L, 6L))
      .toDF("k", "event_id", "tsu")
    Sessionize.debounce(e, "k", $"tsu", "event_id", gap = 7L)
      .select($"event_id").as[Long].collect().sorted shouldBe
      Array(1L, 4L, 5L)
    // chain semantics: a long burst collapses to ONE row even though its
    // ends are far apart (0..10 spans > gap but every link is <= gap)
    Sessionize.debounce(e.filter($"event_id" <= 3), "k", $"tsu",
        "event_id", gap = 7L)
      .select($"event_id").as[Long].collect() shouldBe Array(1L)
  }

  test("timeWeightedAverage: step-hold weighting, exact BIGINT numerator") {
    val e = Seq(
      ("u", 1L, 0L, Some(1.0)), ("u", 2L, 10L, Some(3.0)),
      ("u", 3L, 30L, Some(2.0)),
      ("v", 4L, 5L, Some(9.0)), // single observation: span 0, twa null
      ("w", 5L, 1L, None))      // null value filtered: no output row
      .toDF("k", "event_id", "tsu", "value")
    val got = Sessionize.timeWeightedAverage(e, "k", $"tsu", $"value",
        "event_id")
      .as[(String, Long, Long, Option[Double])].collect().sortBy(_._1)
    got shouldBe Array(
      ("u", 100L * 10 + 300L * 20, 30L, Some(2.333333)),
      ("v", 0L, 0L, None))
  }

  test("interpolate: lerp between brackets, exact hits, one-sided, empty") {
    val probes = Seq((1L, "u", 5L), (2L, "u", 0L), (3L, "u", -5L),
      (4L, "u", 99L), (5L, "w", 5L))
      .toDF("p_id", "k", "p_ts")
    val obs = Seq((10L, "u", 0L, 10.0), (11L, "u", 10L, 20.0))
      .toDF("o_id", "ok", "o_ts", "v")
    val got = AsOfJoin.interpolate(probes, obs, "k", "ok", "p_ts", "o_ts",
        "v", "o_id")
      .select($"p_id", $"v_interp").as[(Long, Option[Double])]
      .collect().sortBy(_._1)
    got shouldBe Array(
      (1L, Some(15.0)),  // midpoint of 10..20
      (2L, Some(10.0)),  // exact hit: t_prev = t_next
      (3L, Some(10.0)),  // before first: forward value only
      (4L, Some(20.0)),  // after last: backward value only
      (5L, None))        // no observations for the key
  }
}
