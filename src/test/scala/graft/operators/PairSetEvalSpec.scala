package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pair-set evaluation ([[Dedup.pairSetEval]], gate q263): orientation
  * normalization, dedup, the precision/recall arithmetic, and the
  * empty-side guards.
  */
class PairSetEvalSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(p: (Long, Long)*) = p.toDF("id_a", "id_b")

  private def eval(g: org.apache.spark.sql.DataFrame,
      t: org.apache.spark.sql.DataFrame) =
    Dedup.pairSetEval(g, t)
      .as[(Long, Long, Long, Double, Double)].head()

  test("hand-computed precision and recall") {
    // got {12, 13, 14}; truth {12, 13, 15} -> both 2, P=2/3, R=2/3
    val got = eval(pairs((1, 2), (1, 3), (1, 4)),
      pairs((1, 2), (1, 3), (1, 5)))
    got._1 shouldBe 3
    got._2 shouldBe 3
    got._3 shouldBe 2
    got._4 shouldBe BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got._5 shouldBe got._4
  }

  test("orientation and duplicates are normalized away") {
    // (2,1) == (1,2); the duplicate row counts once
    val got = eval(pairs((2, 1), (1, 2)), pairs((1, 2)))
    got shouldBe ((1L, 1L, 1L, 1.0, 1.0))
  }

  test("empty sides score 0, not NaN") {
    val e = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    eval(e, pairs((1, 2))) shouldBe ((0L, 1L, 0L, 0.0, 0.0))
    eval(pairs((1, 2)), e) shouldBe ((1L, 0L, 0L, 0.0, 0.0))
  }

  test("minhash candidates achieve full recall on near-identical docs") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"t$i").mkString(" ") + " extra"),
      (3L, (100 to 140).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b")
    val got = eval(Dedup.minhashCandidates(docs, "doc_id", "text"), truth)
    got._5 shouldBe 1.0 // recall
  }

  test("b-bit minhash: identical docs estimate 1.0, disjoint docs ~0") {
    val docs = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (3L, (100 to 150).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val est = Dedup.bbitEstimatePairs(
      pairs((1, 2), (1, 3)), docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    est((1L, 2L)) shouldBe 1.0
    est((1L, 3L)) should be < 0.2 // collision baseline corrected out
  }

  test("b-bit estimate tracks the exact Jaccard on a near-dup pair") {
    val base = (1 to 60).map(i => s"t$i")
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (base.take(45) ++ (200 to 214).map(i => s"x$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .select($"jaccard").head.getDouble(0)
    val est = Dedup.bbitEstimatePairs(pairs((1, 2)), docs,
      "doc_id", "text").select($"bbit_jaccard").head.getDouble(0)
    est shouldBe exact +- 0.2 // k=32 sampling variance
  }

  test("b-bit truncation matches mod arithmetic on the full signature") {
    val docs = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"s$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val fromSigs = Dedup.bbitEstimateFromSigs(pairs((1, 2)), sigs)
      .select($"bbit_jaccard").head.getDouble(0)
    // recompute by hand from the collected signatures
    val m = sigs.select($"id", $"sig").as[(Long, Seq[Long])]
      .collect().toMap
    val mf = m(1L).zip(m(2L)).count { case (x, y) =>
      x % 256 == y % 256 }.toDouble / 32
    val c = 1.0 / 256
    val hand = BigDecimal(math.max((mf - c) / (1 - c), 0.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    fromSigs shouldBe hand
  }

  test("PairSetEval runs through the params surface") {
    val base = tmp("pse_params")
    pairs((1, 2), (1, 3)).write.parquet(s"$base/got")
    pairs((1, 2)).write.parquet(s"$base/truth")
    val f = java.nio.file.Paths.get(base, "PairSetEval.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/got", "truth_dir": "$base/truth",
         | "target_dir": "$base/out"}""".stripMargin)
    graft.core.JobRunner.execute(spark, "PairSetEval", f.toString)
    spark.read.parquet(s"$base/out").select($"recall")
      .head.getDouble(0) shouldBe 1.0
  }
}
