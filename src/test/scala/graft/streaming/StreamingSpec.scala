package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

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
