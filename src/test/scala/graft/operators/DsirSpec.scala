package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: half "science" vocabulary, half "spam" vocabulary;
  // target corpus is pure science
  private val raw = Seq(
    (1L, "quantum physics experiment results"),
    (2L, "physics theory quantum model"),
    (3L, "buy cheap pills now"),
    (4L, "cheap pills buy discount now"),
    (5L, "quantum experiment model theory"))
    .toDF("doc_id", "text")
  private val target = Seq(
    (100L, "quantum physics theory"),
    (101L, "physics experiment model"))
    .toDF("doc_id", "text")

  test("importanceWeights ranks target-like docs above off-target ones") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w.size shouldBe 5
    // every science doc outweighs every spam doc
    val science = Seq(1L, 2L, 5L).map(w); val spam = Seq(3L, 4L).map(w)
    science.min should be > spam.max
  }

  test("bucketLogProbs is dense, normalized over the smoothed space") {
    val lp = Dsir.bucketLogProbs(target, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    lp.length shouldBe 64
    // probabilities sum to < 1 only by the mass on unused buckets'
    // smoothing; the full smoothed space sums to exactly 1
    lp.map { case (_, l) => math.exp(l) }.sum shouldBe 1.0 +- 1e-9
  }

  test("resampleTopK: deterministic Gumbel keys, rank is dense 1..k") {
    val sel = Dsir.select(raw, target, "doc_id", "text", 256, k = 3)
      .collect()
    sel.length shouldBe 3
    sel.map(_.getAs[Int]("rank")).sorted shouldBe Array(1, 2, 3)
    // replay-stable: a second run lands the identical selection
    val again = Dsir.select(raw, target, "doc_id", "text", 256, k = 3)
    assertSameRows(again,
      Dsir.select(raw, target, "doc_id", "text", 256, k = 3))
    // high-weight science docs dominate the selection despite noise
    sel.map(_.getLong(0)).toSet.intersect(Set(3L, 4L)).size should be <= 1
  }

  test("diffArtifacts round-trips through parquet with identical weights") {
    val dir = tmp("dsir_arts")
    Dsir.diffArtifacts(raw, target, "doc_id", "text", 256)
      .write.mode("overwrite").parquet(dir)
    val replayed = Dsir.scoreWithDiff(raw, spark.read.parquet(dir),
      "doc_id", "text", 256)
    assertSameRows(replayed,
      Dsir.importanceWeights(raw, target, "doc_id", "text", 256))
  }

  test("streaming DSIR equals the single-shot batch weights") {
    val diff = Dsir.diffArtifacts(raw, target, "doc_id", "text", 256)
    val inDir = tmp("dsir_in")
    raw.repartition(3).write.mode("overwrite").parquet(inDir)
    val outDir = tmp("dsir_out") + "/out"
    val streamed = graft.streaming.EventStream.runDsirScoreOnce(spark,
      spark.read.parquet(inDir).schema, inDir, diff, "doc_id", "text",
      256, outDir, "dsir_spec", maxFilesPerTrigger = Some(1))
    assertSameRows(streamed,
      Dsir.importanceWeights(raw, target, "doc_id", "text", 256))
  }

  test("native FeatureBucketsExpr is byte-identical to the composed built-ins") {
    val docs = Seq("alpha beta gamma", "one", "", "x y",
      "the quick brown fox the quick").toDF("text")
    import org.apache.spark.sql.functions.{size => ssize}
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val toks = Dedup.tokens($"text")
    val composed = docs.select(concat(
      transform(toks, t => h60(t) % 64),
      when(ssize(toks) >= 2,
        transform(sequence(lit(0), ssize(toks) - 2),
          i => h60(concat_ws(" ", slice(toks, i + 1, lit(2)))) % 64))
        .otherwise(array().cast("array<bigint>"))).as("fb"))
    val native = docs.select(
      Dsir.featureBuckets(Dedup.tokens($"text"), 64).as("fb"))
    assertSameRows(native, composed)
  }

  test("featureBuckets preserves occurrences and bigram adjacency") {
    val f = raw.filter($"doc_id" === 1L)
      .select(Dsir.featureBuckets(Dedup.tokens($"text"), 1000000)
        .as("f")).as[Seq[Long]].head
    f.length shouldBe 7 // 4 unigrams + 3 bigrams
    f.distinct.length shouldBe 7 // all distinct at 1e6 buckets
  }
}
