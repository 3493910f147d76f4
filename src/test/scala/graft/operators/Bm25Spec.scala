package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 more-like-this retrieval ([[Similarity.bm25TopK]], gate q249).
  * The oracle gate pins engine identity on the synthetic table; these
  * specs pin the SEMANTICS on crafted corpora where vocabulary actually
  * discriminates (the synthetic table's 31-term vocab cannot).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // six docs with distinctive vocabularies plus the shared stopword "the"
  private val docs = Seq(
    (1L, "the zebra quagga savanna zebra grazing"),
    (2L, "the quantum entanglement qubit decoherence"),
    (3L, "the sourdough levain crumb fermentation"),
    (4L, "the telescope nebula parallax occultation"),
    (5L, "the monsoon cyclone isobar anemometer"),
    (6L, "the ledger actuarial annuity amortization"))
    .toDF("doc_id", "text")

  test("each doc retrieves itself at rank 1 (distinctive vocab)") {
    val top = Similarity.bm25TopK(docs, "doc_id", "text",
      docs, "doc_id", "text", k = 3, maxDfFraction = 0.5)
    val self = top.filter($"rank" === 1)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toMap
    self shouldBe (1L to 6L).map(i => i -> i).toMap
  }

  test("score matches the hand-computed BM25 formula") {
    // 3 docs, query "apple": df(apple)=2, N=3, dl: 2/3/2, avgdl=7/3
    val corpus = Seq(
      (1L, "apple banana"),
      (2L, "apple apple cherry"),
      (3L, "durian elderberry"))
      .toDF("doc_id", "text")
    val q = Seq((10L, "apple")).toDF("doc_id", "text")
    val got = Similarity.bm25TopK(corpus, "doc_id", "text",
      q, "doc_id", "text", k = 3, maxDfFraction = 1.0)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * (1.2 + 1.0) /
          (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (7.0 / 3.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got shouldBe Map(1L -> s(1.0, 2.0), 2L -> s(2.0, 3.0))
  }

  test("query terms above maxDfFraction are pruned before scoring") {
    // "the" is in every doc (df = N); a query of only stopwords finds
    // nothing, and a mixed query's score comes from the rare term alone
    val stopQuery = Seq((20L, "the the")).toDF("doc_id", "text")
    Similarity.bm25TopK(docs, "doc_id", "text",
      stopQuery, "doc_id", "text", k = 3, maxDfFraction = 0.5)
      .count() shouldBe 0L
    val mixed = Seq((21L, "the qubit")).toDF("doc_id", "text")
    val hits = Similarity.bm25TopK(docs, "doc_id", "text",
      mixed, "doc_id", "text", k = 3, maxDfFraction = 0.5)
    hits.select($"doc_id").as[Long].collect() shouldBe Array(2L)
  }

  test("fuseRankings matches the hand-computed RRF combination") {
    // query 1: lexical list [10, 11], vector list [11, 12] — doc 11
    // appears in both and must fuse to the top
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Similarity.fuseRankings(Seq(lex, vec), k = 3)
      .select($"doc_id", $"rrf_score", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got shouldBe Array(
      (11L, r6(1.0 / 61 + 1.0 / 62), 1),
      (10L, r6(1.0 / 61), 2),
      (12L, r6(1.0 / 62), 3))
  }

  test("fuseRankings ties break on doc_id and k bounds the output") {
    // both docs rank 1 in exactly one list each → identical scores
    val a = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 19L, 1)).toDF("query_id", "doc_id", "rank")
    val got = Similarity.fuseRankings(Seq(a, b), k = 1)
      .select($"doc_id", $"rank").as[(Long, Int)].collect()
    got shouldBe Array((19L, 1))
  }

  test("scoring against saved artifacts is value-identical to inline") {
    val base = tmp("bm25_arts")
    Similarity.bm25Artifacts(docs, "doc_id", "text")
      .write.parquet(s"$base/arts")
    val fromArts = Similarity.bm25ScoreAgainst(docs, "doc_id", "text",
      docs, "doc_id", "text", spark.read.parquet(s"$base/arts"),
      maxDfFraction = 1.0)
    val inline = Similarity.bm25TopK(docs, "doc_id", "text",
      docs, "doc_id", "text", k = Int.MaxValue, maxDfFraction = 1.0)
      .select($"query_id", $"doc_id", $"score")
    assertSameRows(fromArts, inline)
  }

  test("artifact scoring of a batch slice restricts the corpus scores") {
    // batch = docs 1-3 scored with FULL-corpus statistics: exactly the
    // whole-corpus score rows for those docs (the streaming identity)
    val base = tmp("bm25_slice")
    Similarity.bm25Artifacts(docs, "doc_id", "text")
      .write.parquet(s"$base/arts")
    val arts = spark.read.parquet(s"$base/arts")
    val full = Similarity.bm25ScoreAgainst(docs, "doc_id", "text",
      docs, "doc_id", "text", arts, maxDfFraction = 1.0)
    val slice = Similarity.bm25ScoreAgainst(
      docs.filter($"doc_id" <= 3), "doc_id", "text",
      docs, "doc_id", "text", arts, maxDfFraction = 1.0)
    assertSameRows(slice, full.filter($"doc_id" <= 3))
  }

  test("plan: query side broadcasts onto the postings; rank window " +
      "map-side pruned; no cartesian product") {
    val plan = Similarity.bm25TopK(docs, "doc_id", "text",
      docs, "doc_id", "text", k = 3, maxDfFraction = 0.5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("WindowGroupLimit")
    plan should not include "CartesianProduct"
  }
}
