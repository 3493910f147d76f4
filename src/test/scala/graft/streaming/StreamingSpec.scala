package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._
  import StatefulSessionize._

  test("flatMapGroupsWithState sessions match the batch window formulation") {
    implicit val s = spark
    val events = Seq(
      Event(1L, 1L, 0L), Event(1L, 2L, 60000L), Event(1L, 3L, 4000000L),
      Event(2L, 4L, 0L)).toDS()
    val out = StatefulSessionize(events, gapMillis = 1800000L)
      .collect().sortBy(_.eventId)
    out.map(a => (a.userId, a.eventId, a.sessionId)) shouldBe Array(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L))
    // agrees with the batch operator
    val batch = graft.operators.Sessionize(
        events.toDF(), "userId", org.apache.spark.sql.functions.col("tsMillis"),
        "eventId", 1800000L)
      .select($"eventId", $"session_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    batch.map(_._2) shouldBe out.map(_.sessionId)
  }
}

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch transform (stream/batch unification)") {
    val dir = tmp("stream_in")
    val batch = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "view", 3.0))
      .toDF("ts", "event_type", "value")
    batch.write.parquet(dir + "/p")
    val streamed = EventStream.runOnce(spark, batch.schema, dir + "/p",
      "5 minutes", "es_test")
    assertSameRows(streamed, EventStream.windowedCounts(batch, "5 minutes"))
    streamed.filter($"event_type" === "click")
      .select($"n_events", $"sum_value").as[(Long, Double)]
      .collect() shouldBe Array((2L, 3.0))
  }
}
