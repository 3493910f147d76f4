package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixed-language report ([[TextAnalysis.mixedLanguageReport]], gate
  * q265): the code-switching flag the doc-level langId hides.
  */
class LangMixSpec extends SparkSpec {
  import spark.implicits._

  private val en = "the cat sat on the mat and that is the story of"
  private val de = "der hund ist von der stadt und das ist ein gutes tier"

  private def report(rows: (Long, String)*) =
    TextAnalysis.mixedLanguageReport(rows.toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 12)
      .select($"doc_id", $"n_chunks", $"n_langs", $"dominant_lang",
        $"dominant_share")
      .as[(Long, Long, Long, String, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("a bilingual doc reports two languages; doc-level langId sees one") {
    val bilingual = s"$en $de $de" // 1 en chunk, 2 de chunks at 12 toks
    val got = report((1L, bilingual))(1L)
    got._3 shouldBe 2 // n_langs: the code-switching flag
    got._4 shouldBe "de"
    got._5 shouldBe BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc-level langId on the same text: ONE answer, the mix invisible
    Seq(bilingual).toDF("text")
      .select(TextAnalysis.langId($"text")).head.getString(0) should
      (be("de") or be("en"))
  }

  test("a monolingual doc reports one language at share 1.0") {
    val got = report((1L, s"$en $en"))(1L)
    got._3 shouldBe 1
    got._4 shouldBe "en"
    got._5 shouldBe 1.0
  }

  test("stopword-free text is und throughout and counts zero languages") {
    val got = report((1L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp"))(1L)
    got._3 shouldBe 0
    got._4 shouldBe "und"
  }

  test("und never outranks a real language for dominance, even as the " +
      "chunk majority (round-9 advisor finding)") {
    // 2 und chunks + 1 en chunk at 12 tokens: majority is und, but the
    // dominant_lang contract (like n_langs) excludes the sentinel
    val noise = "zzz qqq www rrr ttt yyy uuu iii ooo ppp aaa bbb"
    val got = report((1L, s"$noise $noise $en"))(1L)
    got._3 shouldBe 1
    got._4 shouldBe "en"
    got._5 shouldBe BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("tokenizerFertility: hand-computed counts; zero-token group null") {
    val docs = Seq(
      ("en", "abc de-f 12"), // ws 3; bpe: abc,de,-,f,12 = 5; chars 11
      ("en", "x"),           // ws 1; bpe 1; chars 1
      ("zz", ""))            // ws 1 ("" token); bpe 0; chars 0
      .toDF("lang", "text")
    val got = TextAnalysis.tokenizerFertility(docs, "lang", "text")
      .select($"lang", $"n_docs", $"n_ws_tokens", $"n_subword_tokens",
        $"n_chars", $"fertility", $"chars_per_token")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    got("en") shouldBe (("en", 2L, 4L, 6L, 12L, Some(1.5), Some(3.0)))
    got("zz")._4 shouldBe 0L
  }

  test("scriptProfile: fractions sum over the known classes; injected " +
      "Cyrillic shows up exactly") {
    val docs = Seq(
      ("a", "abc деф 123"), // 3 latin, 3 cyrillic, 3 digit, 2 space = 11
      ("b", "中文 ok"))      // 2 cjk, 2 latin, 1 space = 5
      .toDF("src", "text")
    val got = TextAnalysis.scriptProfile(docs, "src", "text")
      .select($"src", $"n_chars", $"latin_frac", $"cyrillic_frac",
        $"cjk_frac", $"digit_frac", $"space_frac")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = got("a")
    a._2 shouldBe 11L
    a._3 shouldBe round6(3.0 / 11)
    a._4 shouldBe round6(3.0 / 11)
    a._6 shouldBe round6(3.0 / 11)
    a._7 shouldBe round6(2.0 / 11)
    val b = got("b")
    b._5 shouldBe round6(2.0 / 5)
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("TokenizerFertility and ScriptProfile run through the params " +
      "surface") {
    val base = tmp("report_params")
    Seq(("en", "hello world")).toDF("lang", "text")
      .write.parquet(s"$base/docs")
    val f1 = java.nio.file.Paths.get(base, "TokenizerFertility.json")
    java.nio.file.Files.writeString(f1,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/f",
         | "group_column": "lang", "text_column": "text"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "TokenizerFertility", f1.toString)
    spark.read.parquet(s"$base/f").count() shouldBe 1
    val f2 = java.nio.file.Paths.get(base, "ScriptProfile.json")
    java.nio.file.Files.writeString(f2,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/s",
         | "group_column": "lang", "text_column": "text"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "ScriptProfile", f2.toString)
    spark.read.parquet(s"$base/s").select($"cyrillic_frac")
      .head.getDouble(0) shouldBe 0.0
  }

  test("MixedLanguageReport runs through the params surface") {
    val base = tmp("langmix_params")
    Seq((1L, s"$en $de")).toDF("doc_id", "text")
      .write.parquet(s"$base/docs")
    val f = java.nio.file.Paths.get(base, "MixedLanguageReport.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/out",
         | "id_column": "doc_id", "text_column": "text",
         | "chunk_tokens": 12}""".stripMargin)
    graft.core.JobRunner.execute(spark, "MixedLanguageReport", f.toString)
    spark.read.parquet(s"$base/out")
      .select($"n_langs").head.getLong(0) shouldBe 2L
  }
}
