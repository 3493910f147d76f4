package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-nucleus selection ([[Sampling.nucleusPerGroup]], gate q262):
  * greedy-by-score semantics, the crossing-row rule, group
  * independence, and identity to the naive running-sum window.
  */
class NucleusSpec extends SparkSpec {
  import spark.implicits._

  test("keeps best-first until the crossing row, per group") {
    val df = Seq(
      // group a: total 100, budget 50 — scores pick order c,b,a,d
      (1L, "a", 30L, 0.2), (2L, "a", 30L, 0.8), (3L, "a", 30L, 0.9),
      (4L, "a", 10L, 0.1),
      // group b: one row crosses alone
      (9L, "b", 99L, 0.5))
      .toDF("id", "g", "w", "score")
    val kept = Sampling.nucleusPerGroup(df, "id", "g", "w", "score",
      p = 0.5).select($"id").as[Long].collect().toSet
    // a: take id 3 (score .9, cum-before 0 < 50), id 2 (cum-before 30
    // < 50, crossing row kept at cum 60), stop; b: its only row kept
    kept shouldBe Set(3L, 2L, 9L)
  }

  test("p = 1 keeps everything") {
    val df = Seq((1L, "a", 5L, 0.3), (2L, "a", 7L, 0.6))
      .toDF("id", "g", "w", "score")
    Sampling.nucleusPerGroup(df, "id", "g", "w", "score", 1.0)
      .count() shouldBe 2
  }

  test("matches the naive running-sum window on a random-ish corpus") {
    val df = (1L to 3000L).map { i =>
      (i, s"src${i % 7}", (i * 13 % 40) + 1, ((i * 31) % 101) / 101.0)
    }.toDF("id", "g", "w", "score")
    val got = Sampling.nucleusPerGroup(df, "id", "g", "w", "score", 0.4)
      .select($"id").as[Long].collect().toSet
    val W = org.apache.spark.sql.expressions.Window
    val naive = df
      .join(df.groupBy($"g").agg((sum($"w") * 0.4).as("bud")), Seq("g"))
      .withColumn("cb", sum($"w").over(W.partitionBy($"g")
        .orderBy((-round($"score", 6)).asc, $"id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)) - $"w")
      .filter($"cb" < $"bud")
      .select($"id").as[Long].collect().toSet
    got shouldBe naive
  }

  test("null scores sort last; null weights count zero") {
    val df = Seq(
      (1L, "a", Some(10L), Some(0.9)),
      (2L, "a", Some(10L), None), // worst rank
      (3L, "a", None, Some(0.5))) // weight 0 — free to keep
      .toDF("id", "g", "w", "score")
    val kept = Sampling.nucleusPerGroup(df, "id", "g", "w", "score", 0.5)
      .select($"id").as[Long].collect().toSet
    // budget 10: id 1 (cb 0 < 10, crossing), id 3 (w 0, cb 10? comes
    // after 1 by score .5: cb = 10, not < 10 -> dropped), id 2 last
    kept shouldBe Set(1L)
  }

  test("NucleusSelect runs through the params surface") {
    val base = tmp("nucleus_params")
    Seq((1L, "a", 10L, 0.9), (2L, "a", 10L, 0.1))
      .toDF("id", "g", "w", "score").write.parquet(s"$base/rows")
    val f = java.nio.file.Paths.get(base, "NucleusSelect.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/rows", "target_dir": "$base/out",
         | "id_column": "id", "group_column": "g",
         | "weight_column": "w", "score_column": "score",
         | "p": 0.5}""".stripMargin)
    graft.core.JobRunner.execute(spark, "NucleusSelect", f.toString)
    spark.read.parquet(s"$base/out").select($"id").as[Long]
      .collect().toSeq shouldBe Seq(1L)
  }
}
