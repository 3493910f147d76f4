package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right row at or before each left time, per key") {
    val left = Seq((100L, 1L, 50L), (101L, 1L, 5L), (102L, 2L, 50L))
      .toDF("p_id", "user_id", "p_ts")
    val right = Seq((9L, 1L, 10L), (10L, 1L, 40L), (11L, 1L, 60L))
      .toDF("click_id", "c_user", "c_ts")
    val out = AsOfJoin(left, right, col("user_id"), col("c_user"),
        col("p_ts"), col("c_ts"), col("p_id"), col("click_id"))
      .select($"p_id", $"click_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    out shouldBe Array(
      (100L, Some(10L)), // 40 <= 50, latest
      (101L, None),      // nothing at or before 5
      (102L, None))      // key 2 has no right rows
  }

  test("embedding near-dup pairs at threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    out shouldBe Array((1L, 2L))
  }
}
