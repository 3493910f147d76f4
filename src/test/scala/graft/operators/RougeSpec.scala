package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ROUGE-n overlap eval ([[TextAnalysis.rougeN]], gate q253). The oracle
  * gate pins cross-engine identity on the synthetic table; these specs
  * pin the SEMANTICS — clipped multiset counting, the short-row zero-gram
  * guard, and the zero-overlap survival path — on crafted pairs.
  */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def rouge(rows: Seq[(Long, String, String)], n: Int) =
    TextAnalysis.rougeN(rows.toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref", n)
      .select($"pair_id", $"match_count", $"cand_total", $"ref_total",
        $"precision", $"recall", $"f1")
      .as[(Long, Long, Int, Int, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("identical texts score 1.0 everywhere") {
    val got = rouge(Seq((1L, "the cat sat on the mat",
      "the cat sat on the mat")), n = 2)(1L)
    got shouldBe ((1L, 5L, 5, 5, 1.0, 1.0, 1.0))
  }

  test("disjoint texts score 0 with zero matches") {
    val got = rouge(Seq((1L, "alpha beta gamma", "delta epsilon zeta")),
      n = 2)(1L)
    got shouldBe ((1L, 0L, 2, 2, 0.0, 0.0, 0.0))
  }

  test("clipped MULTISET counting: repeats match up to the min count") {
    // cand bigrams: {a b: 2, b a: 2} (4 total)
    // ref  bigrams: {a b: 2, b c: 1, c a: 1} (4 total)
    // matches = min(2,2) = 2; P = R = F1 = 0.5
    val got = rouge(Seq((1L, "a b a b a", "a b c a b")), n = 2)(1L)
    got shouldBe ((1L, 2L, 4, 4, 0.5, 0.5, 0.5))
  }

  test("rows shorter than n yield zero grams, not a truncated tail") {
    // 1-token ref has NO bigrams: ref_total = 0 and recall/f1 = 0 (not
    // NaN); 1-token cand likewise on the precision side
    val got = rouge(Seq(
      (1L, "a b", "a"),
      (2L, "a", "a b")), n = 2)
    got(1L) shouldBe ((1L, 0L, 1, 0, 0.0, 0.0, 0.0))
    got(2L) shouldBe ((2L, 0L, 0, 1, 0.0, 0.0, 0.0))
  }

  test("asymmetric precision vs recall (candidate shorter than reference)") {
    // cand "a b c": bigrams {a b, b c} (2); ref "a b c d e": bigrams
    // {a b, b c, c d, d e} (4); matches 2 -> P=1.0, R=0.5, F1=2/3
    val got = rouge(Seq((1L, "a b c", "a b c d e")), n = 2)(1L)
    got._5 shouldBe 1.0
    got._6 shouldBe 0.5
    got._7 shouldBe BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("ROUGE-1 is token-level overlap") {
    // cand tokens {x:1, y:1}, ref {x:2, z:1}: matches min(1,2)=1
    val got = rouge(Seq((1L, "x y", "x x z")), n = 1)(1L)
    got shouldBe ((1L, 1L, 2, 3, 0.5, round6(1.0 / 3.0),
      round6(2.0 * 0.5 * (1.0 / 3.0) / (0.5 + 1.0 / 3.0))))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("zero-overlap pairs survive (totals left join, no inner-join drop)") {
    val out = TextAnalysis.rougeN(
      Seq((1L, "p q r", "p q r"), (2L, "a b", "c d"))
        .toDF("pair_id", "cand", "ref"), "pair_id", "cand", "ref", 2)
    out.count() shouldBe 2
  }

  test("RougeEval runs through the params surface") {
    val base = tmp("rouge_params")
    Seq((1L, "a b c", "a b c"), (2L, "a b", "c d"))
      .toDF("pair_id", "cand", "ref").write.parquet(s"$base/pairs")
    val f = java.nio.file.Paths.get(base, "RougeEval.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/pairs", "target_dir": "$base/out",
         | "id_column": "pair_id", "candidate_column": "cand",
         | "reference_column": "ref", "ngram_size": 2}""".stripMargin)
    graft.core.JobRunner.execute(spark, "RougeEval", f.toString)
    val got = spark.read.parquet(s"$base/out")
    got.count() shouldBe 2
    got.filter($"pair_id" === 1L).select($"f1").head.getDouble(0) shouldBe 1.0
  }
}
