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

  test("span mask: replayable, masked blocks collapse to one positional " +
      "sentinel, unmasked text is untouched") {
    val one = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    def mask(rate: Double, seed: String) =
      TextAnalysis.augmentSpanMask(one, "doc_id", "text", rate, 5, seed)
    assertSameRows(mask(0.5, "s1"), mask(0.5, "s1"))
    val got = mask(0.5, "s1")
      .select($"text_masked", $"n_tokens", $"n_masked")
      .as[(String, Int, Int)].head()
    got._2 shouldBe 25
    got._3 % 5 shouldBe 0 // whole blocks only
    val toks = got._1.split(" ")
    // every sentinel is <extra_id_b> with b a block index; surviving
    // real tokens keep their form
    toks.foreach { t =>
      assert(t.matches("<extra_id_[0-4]>") || t.matches("w\\d+"), t)
    }
    toks.count(_.startsWith("<extra_id_")) shouldBe (got._3 / 5)
    // rate 0 is the identity
    mask(0.0, "s1").select($"text_masked").head.getString(0) shouldBe
      (1 to 25).map(i => s"w$i").mkString(" ")
  }

  test("span mask: empirical masked fraction tracks the rate") {
    val masked = TextAnalysis.augmentSpanMask(docs, "doc_id", "text",
      0.3, 5, "s1")
      .agg(sum($"n_masked").cast("double").as("m"),
        sum($"n_tokens").cast("double").as("t"))
      .select($"m" / $"t").head.getDouble(0)
    masked shouldBe 0.3 +- 0.06
  }

  test("homoglyphs: folding restores confusable-injected text exactly") {
    val clean = Seq((1L, "paypal secure checkout example"))
      .toDF("doc_id", "text")
    val dirty = clean.select($"doc_id",
      translate($"text", "aeo", "аео").as("text"))
    // injection changed the string...
    dirty.select($"text").head.getString(0) should not be
      "paypal secure checkout example"
    // ...counting sees every injected char, folding restores the original
    val got = dirty.select(
      TextAnalysis.homoglyphCount($"text").as("n"),
      TextAnalysis.normalizeHomoglyphs($"text").as("norm"))
      .as[(Int, String)].head()
    got._1 shouldBe "paypal secure checkout example".count("aeo".contains(_))
    got._2 shouldBe "paypal secure checkout example"
    // clean text: zero count, identity fold
    clean.select(TextAnalysis.homoglyphCount($"text")).head.getInt(0) shouldBe 0
  }

  test("homoglyph table is a well-formed duplicate-free pairing") {
    TextAnalysis.homoglyphFrom.length shouldBe TextAnalysis.homoglyphTo.length
    TextAnalysis.homoglyphFrom.toSeq.distinct.length shouldBe
      TextAnalysis.homoglyphFrom.length
    // every source char is non-ASCII (we never fold real Latin text)
    all(TextAnalysis.homoglyphFrom.toSeq.map(_.toInt)) should be > 127
  }

  test("AugmentSpanMask and NormalizeHomoglyphs run through the params " +
      "surface") {
    val base = tmp("aug2_params")
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    val f1 = java.nio.file.Paths.get(base, "AugmentSpanMask.json")
    java.nio.file.Files.writeString(f1,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/m",
         | "id_column": "doc_id", "text_column": "text",
         | "rate": 0.5, "block_size": 5, "seed": "s1"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "AugmentSpanMask", f1.toString)
    spark.read.parquet(s"$base/m").count() shouldBe 1
    val f2 = java.nio.file.Paths.get(base, "NormalizeHomoglyphs.json")
    java.nio.file.Files.writeString(f2,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/h",
         | "text_column": "text"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "NormalizeHomoglyphs", f2.toString)
    val h = spark.read.parquet(s"$base/h")
    h.select($"n_homoglyphs").head.getInt(0) shouldBe 0
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
