package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-dropout augmentation ([[TextAnalysis.augmentTokenDropout]],
  * gate q256): replayability, independence across seeds, the rate
  * bound, and case/order preservation.
  */
class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, (1 to 50).map(j => s"tok${(i + j) % 17}").mkString(" ")))
    .toDF("doc_id", "text")

  private def aug(rate: Double, seed: String) =
    TextAnalysis.augmentTokenDropout(docs, "doc_id", "text", rate, seed)

  test("same seed replays the identical corpus") {
    assertSameRows(aug(0.1, "s1"), aug(0.1, "s1"))
  }

  test("different seeds draw different corpora") {
    val a = aug(0.2, "s1").select($"doc_id", $"text_aug")
    val b = aug(0.2, "s2").select($"doc_id", $"text_aug")
    a.join(b, Seq("doc_id"))
      .filter(a("text_aug") =!= b("text_aug")).count() should be > 0L
  }

  test("empirical drop rate tracks the parameter") {
    val r = aug(0.3, "s1")
      .agg(sum($"n_tokens").cast("double").as("t"),
        sum($"n_kept").cast("double").as("k"))
      .select(($"k" / $"t")).head.getDouble(0)
    r shouldBe 0.7 +- 0.05
  }

  test("rate 0 keeps every token and the exact original text") {
    val got = aug(0.0, "s1")
    got.filter($"n_kept" =!= $"n_tokens").count() shouldBe 0
    // single-space rejoin of a single-space corpus is the identity
    got.join(docs, Seq("doc_id"))
      .filter($"text_aug" =!= $"text").count() shouldBe 0
  }

  test("token case and relative order are preserved") {
    val one = Seq((1L, "Alpha BETA gamma DELTA epsilon ZETA eta THETA"))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.augmentTokenDropout(one, "doc_id", "text",
      0.4, "s9").select($"text_aug").head.getString(0).split(" ").toSeq
    val orig = "Alpha BETA gamma DELTA epsilon ZETA eta THETA".split(" ")
    // kept must be a subsequence of the original
    kept.foldLeft(0) { (from, tok) =>
      val i = orig.indexOf(tok, from)
      i should be >= 0
      i + 1
    }
  }

  test("runTransformOnce: micro-batched dropout equals the batch result") {
    val base = tmp("aug_stream")
    docs.limit(40).repartition(4).write.parquet(s"$base/in")
    val streamed = graft.streaming.EventStream.runTransformOnce(spark,
      spark.read.parquet(s"$base/in").schema, s"$base/in", s"$base/out",
      "aug_stream_spec", maxFilesPerTrigger = Some(1)) { b =>
      TextAnalysis.augmentTokenDropout(b, "doc_id", "text", 0.1, "s1")
    }
    assertSameRows(streamed,
      TextAnalysis.augmentTokenDropout(docs.limit(40), "doc_id", "text",
        0.1, "s1"))
  }

  test("AugmentTokenDropout runs through the params surface") {
    val base = tmp("aug_params")
    docs.limit(10).write.parquet(s"$base/docs")
    val f = java.nio.file.Paths.get(base, "AugmentTokenDropout.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/out",
         | "id_column": "doc_id", "text_column": "text",
         | "rate": 0.2, "seed": "s1"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "AugmentTokenDropout", f.toString)
    spark.read.parquet(s"$base/out").count() shouldBe 10
  }
}
