package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR diversity re-ranking ([[Similarity.mmrRerank]], gate q254). The
  * oracle gate pins cross-engine identity; these specs pin the greedy
  * SEMANTICS on crafted geometry where diversity actually changes the
  * answer vs plain relevance order.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // one query; candidates: two near-identical high-relevance vectors
  // (10, 11) and one orthogonal lower-relevance vector (12). Pure
  // relevance order is 10, 11, 12 — MMR must demote the near-duplicate
  // 11 below the diverse 12.
  private val cands = Seq(
    (1L, 10L, 0.95, Array(1.0f, 0.0f)),
    (1L, 11L, 0.94, Array(0.999f, 0.01f)),
    (1L, 12L, 0.80, Array(0.0f, 1.0f)))
    .toDF("query_id", "doc_id", "rel", "vec")

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"mmr_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq

  test("demotes the near-duplicate below the diverse candidate") {
    val got = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel",
      "vec", k = 3, lambda = 0.5)
    ranks(got) shouldBe Seq(10L, 12L, 11L)
  }

  test("lambda = 1 reduces to pure relevance order") {
    val got = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel",
      "vec", k = 3, lambda = 1.0)
    ranks(got) shouldBe Seq(10L, 11L, 12L)
  }

  test("k bounds the output; ranks are 1..k") {
    val got = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel",
      "vec", k = 2, lambda = 0.5)
    got.count() shouldBe 2
    ranks(got) shouldBe Seq(10L, 12L)
  }

  test("queries with fewer than k candidates emit all of them") {
    val two = cands.filter($"doc_id" =!= 12L)
    val got = Similarity.mmrRerank(two, "query_id", "doc_id", "rel",
      "vec", k = 5, lambda = 0.5)
    got.count() shouldBe 2
    ranks(got) shouldBe Seq(10L, 11L)
  }

  test("queries re-rank independently") {
    val multi = cands.unionByName(
      Seq((2L, 20L, 0.9, Array(0.0f, 1.0f)),
        (2L, 21L, 0.7, Array(1.0f, 0.0f)))
        .toDF("query_id", "doc_id", "rel", "vec"))
    val got = Similarity.mmrRerank(multi, "query_id", "doc_id", "rel",
      "vec", k = 2, lambda = 0.5)
    got.filter($"query_id" === 2L).count() shouldBe 2
    got.filter($"query_id" === 1L).count() shouldBe 2
    got.filter($"query_id" === 2L && $"mmr_rank" === 1)
      .select($"doc_id").head.getLong(0) shouldBe 20L
  }

  test("hand-computed MMR scores pick the argmax (lambda 0.7)") {
    // round 2 scores: doc 11: .7*.94 - .3*cos(11,10)≈.658-.3*~1 ≈ .358
    //                 doc 12: .7*.80 - .3*cos(12,10)=.56 - 0 = .56
    // argmax is 12; round 3 leaves only 11
    val got = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel",
      "vec", k = 3, lambda = 0.7)
    ranks(got) shouldBe Seq(10L, 12L, 11L)
  }

  test("MmrRerank runs through the params surface") {
    val base = tmp("mmr_params")
    cands.write.parquet(s"$base/cand")
    val f = java.nio.file.Paths.get(base, "MmrRerank.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/cand", "target_dir": "$base/out",
         | "query_id_column": "query_id", "doc_id_column": "doc_id",
         | "relevance_column": "rel", "vector_column": "vec",
         | "k": 2, "lambda": 0.5}""".stripMargin)
    graft.core.JobRunner.execute(spark, "MmrRerank", f.toString)
    val got = spark.read.parquet(s"$base/out")
    got.count() shouldBe 2
  }
}
