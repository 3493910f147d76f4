package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the unsalted join's result") {
    val probe = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val build = Seq((1L, "one"), (2L, "two"), (500L, "x")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(probe, build, "k", saltFactor = 8)
      .select($"k", $"v", $"name").as[(Long, Int, String)].collect().sorted
    val plain = probe.join(build, Seq("k"))
      .select($"k", $"v", $"name").as[(Long, Int, String)].collect().sorted
    salted shouldBe plain
  }
}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bk_a")
    spark.range(500).selectExpr("id AS k", "id * 3 AS vb")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bk_b")
    val joined = spark.table("bk_a").join(spark.table("bk_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    // the equi-join rides the bucketing: no ShuffleExchange anywhere
    plan should not include "Exchange hashpartitioning"
    joined.count() shouldBe 500
    spark.sql("DROP TABLE bk_a"); spark.sql("DROP TABLE bk_b")
  }
}

class MultimodalPartitionSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("partition-batched decode streams rows with per-partition init") {
    val media = (1L to 100L)
      .map(i => MediaRow(i, s"payload-$i".getBytes("UTF-8")))
      .toDS().repartition(4)
    val out = decodePartitions(media)
    out.rdd.getNumPartitions shouldBe 4
    val rows = out.collect().sortBy(_.id)
    rows.length shouldBe 100
    rows.head.n_bytes shouldBe "payload-1".length
    all(rows.map(_.width)) should (be >= 1 and be <= 1920)
    // deterministic across evaluations
    out.collect().sortBy(_.id) shouldBe rows
  }
}
