package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints ([[Dedup.winnowFingerprints]] /
  * [[Dedup.winnowCandidates]], gate q258): the selection guarantee, the
  * density bound, the short-doc window edge, and the local-overlap
  * detection the scheme exists for.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("identical docs select identical fingerprint sets") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
    val a = fp.filter($"doc_id" === 1L).select($"pos", $"fp")
    val b = fp.filter($"doc_id" === 2L).select($"pos", $"fp")
    assertSameRows(a, b)
  }

  test("a shared run of >= w+k-1 tokens guarantees a shared fingerprint") {
    // w=4, k=3: any shared run of 6 tokens shares >= 1 selected fp.
    // Doc 2 embeds doc 1's 6-token run inside unrelated text.
    val docs = Seq(
      (1L, "p1 p2 common1 common2 common3 common4 common5 common6 p3 p4"),
      (2L, "x1 x2 x3 common1 common2 common3 common4 common5 common6 y1 y2 y3"))
      .toDF("doc_id", "text")
    val shared = Dedup.winnowCandidates(docs, "doc_id", "text", 3, 4,
      minShared = 1)
    shared.count() shouldBe 1
    shared.select($"id_a", $"id_b").as[(Long, Long)].head() shouldBe ((1L, 2L))
  }

  test("unrelated docs share nothing") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.winnowCandidates(docs, "doc_id", "text", 3, 4, 1).count() shouldBe 0
  }

  test("selected positions are in range and density is bounded") {
    val docs = Seq((1L, (1 to 200).map(i => s"t${i % 91}").mkString(" ")))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
    val m = 200 - 3 + 1
    val pos = fp.select($"pos").as[Int].collect()
    all(pos.toSeq) should (be >= 1 and be <= m)
    // winnowing selects ~2/(w+1) of positions; allow generous slack but
    // require far fewer than every position
    pos.length should be < (m * 2) / 3
    pos.length should be >= (m / (3 + 1)) / 2
  }

  test("docs with fewer than w k-grams emit nothing") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"))
      .toDF("doc_id", "text") // m = 2 and 0 k-grams, both < w = 4
    Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4).count() shouldBe 0
  }

  test("fp equals the k-gram hash at the selected position") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
    val toks = "alpha beta gamma delta epsilon zeta eta".split(" ")
    fp.select($"pos", $"fp").as[(Int, Long)].collect().foreach {
      case (p, h) =>
        val gram = toks.slice(p - 1, p + 2).mkString(" ")
        h shouldBe graft.functions.PortableHash.md5Long60(gram)
    }
  }

  test("WinnowCandidates runs through the params surface") {
    val base = tmp("winnow_params")
    Seq(
      (1L, "p1 p2 common1 common2 common3 common4 common5 common6 p3 p4"),
      (2L, "x1 x2 common1 common2 common3 common4 common5 common6 y1 y2"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    val f = java.nio.file.Paths.get(base, "WinnowCandidates.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/docs", "target_dir": "$base/out",
         | "id_column": "doc_id", "text_column": "text",
         | "shingle_size": 3, "window": 4, "min_shared": 1}""".stripMargin)
    graft.core.JobRunner.execute(spark, "WinnowCandidates", f.toString)
    spark.read.parquet(s"$base/out").count() shouldBe 1
  }
}
