package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    (1L, "good great good", "pos"),
    (2L, "great good nice", "pos"),
    (3L, "bad awful bad", "neg"),
    (4L, "awful bad nasty", "neg"))
    .toDF("doc_id", "text", "label")

  test("naiveBayesModel: exact add-one likelihoods and priors over vocab+unk") {
    val m = Classify.naiveBayesModel(labeled, "text", "label", vocabSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // 6 distinct tokens + <unk>, 2 classes -> dense 14-row grid
    m.size shouldBe 14
    // add-one smoothing over the EFFECTIVE token space (6 distinct + unk
    // = 7, not the declared vocabSize 10): class pos has 6 tokens total,
    // count(good)=3 -> ln((3+1)/(6+7))
    m(("pos", "good"))._1 shouldBe math.log(4.0 / 13.0) +- 1e-12
    // absent cell (pos, bad) gets the smoothed floor ln(1/13)
    m(("pos", "bad"))._1 shouldBe math.log(1.0 / 13.0) +- 1e-12
    m(("pos", "<unk>"))._1 shouldBe math.log(1.0 / 13.0) +- 1e-12
    // priors: 2 docs of 4 each
    m(("pos", "good"))._2 shouldBe math.log(0.5) +- 1e-12
    m(("neg", "bad"))._2 shouldBe math.log(0.5) +- 1e-12
  }

  test("naiveBayesScore: separable classes predict correctly, OOV hits <unk>") {
    val model = Classify.naiveBayesModel(labeled, "text", "label", 10)
    val docs = Seq(
      (10L, "good great nice"),
      (11L, "bad awful nasty"),
      (12L, "zebra unseen words")) // all OOV: prior + 3x unk, tie by label
      .toDF("doc_id", "text")
    val out = Classify.naiveBayesScore(docs, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(10L) shouldBe "pos"
    out(11L) shouldBe "neg"
    // identical priors and identical unk likelihoods -> exact tie,
    // broken deterministically by label asc
    out(12L) shouldBe "neg"
  }

  test("naiveBayesClassify: train-on-seed scores every row with audit columns") {
    val docs = labeled.union(Seq(
      (5L, "good nice great", "pos"),
      (6L, "nasty awful bad", "neg")).toDF("doc_id", "text", "label"))
    val out = Classify.naiveBayesClassify(docs, "doc_id", "text", "label",
      col("doc_id") <= 4, vocabSize = 10)
    out.count() shouldBe 6 // scores ALL rows, not just the seed
    out.filter(col("correct")).count() shouldBe 6
    out.columns.toSeq shouldBe
      Seq("doc_id", "predicted", "actual", "correct", "score")
  }

  test("naiveBayesModel: vocab truncation folds the tail into <unk>") {
    // vocabSize=1 keeps only the most frequent token (count desc, token
    // asc): bad appears 3x like good but 'bad' < 'good' -> ties to bad...
    // counts: good 3, bad 3, great 2, awful 2, nice 1, nasty 1
    val m = Classify.naiveBayesModel(labeled, "text", "label", vocabSize = 1)
    val toks = m.select("token").distinct().as[String].collect().sorted
    toks shouldBe Array("<unk>", "bad")
  }
}

class ConfidentJointSpec extends SparkSpec {
  import spark.implicits._

  // seed docs 1-4 are cleanly labeled; doc 6 is MISLABELED neg (its text
  // is unambiguously pos-shaped); docs 2 and 5 score below both class
  // thresholds (mean self-class score) and must be dropped entirely
  private val docs = Seq(
    (1L, "good great good", "pos"),
    (2L, "great good nice", "pos"),
    (3L, "bad awful bad", "neg"),
    (4L, "awful bad nasty", "neg"),
    (5L, "good great nice", "pos"),
    (6L, "good good great", "neg"))
    .toDF("doc_id", "text", "lang")

  test("confidentJoint: mislabeled doc lands off-diagonal, sub-threshold docs drop") {
    val out = Classify.confidentJoint(docs, "doc_id", "text", "lang",
        col("doc_id") <= 4, vocabSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // hand-computed with ln-scores over the 6-token vocab (see scaladoc):
    // t_pos = mean(ln48, ln24, ln24) - doc 1 and the mislabeled doc 6
    // clear it; docs 2/5 (ln24 products) fall below BOTH thresholds
    out shouldBe Map(
      ("pos", "pos") -> ((1L, false)),
      ("neg", "neg") -> ((2L, false)),
      ("neg", "pos") -> ((1L, true)))
  }

  test("confidentJoint: clean separable labels are purely diagonal") {
    val clean = docs.filter(col("doc_id") =!= 6L)
    val out = Classify.confidentJoint(clean, "doc_id", "text", "lang",
        col("doc_id") <= 4, vocabSize = 10)
    out.filter(col("off_diagonal")).count() shouldBe 0L
    // off-diagonal estimate of the label-error mass is zero
    out.agg(sum(when(col("off_diagonal"), col("n")).otherwise(lit(0L))))
      .head.getLong(0) shouldBe 0L
  }
}

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c d e f"), // exact dup of 1: every span duplicated
    (3L, "x y z w"), // unique spans
    (4L, "p q"), // shorter than width
    (5L, "m n o m n o m n o"), // within-doc repetition
    (6L, "a b c q r s t"), // shares only the "a b c" span
    (7L, "a b c z9"))
    .toDF("doc_id", "text")

  private def rows = Dedup.repeatedSpans(docs, "doc_id", "text", width = 3)
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toMap

  test("exact-dup docs are fully covered; unique docs untouched") {
    val m = rows
    m(1L) shouldBe ((6L, 4L, 4L, 6L, 1.0))
    m(2L) shouldBe ((6L, 4L, 4L, 6L, 1.0))
    m(3L) shouldBe ((4L, 2L, 0L, 0L, 0.0))
  }

  test("docs shorter than width have zero spans and zero coverage") {
    rows(4L) shouldBe ((2L, 0L, 0L, 0L, 0.0))
  }

  test("within-doc repetition counts: all spans of a cyclic doc duplicate") {
    // spans m n o / n o m / o m n each occur >= 2 times inside doc 5
    rows(5L) shouldBe ((9L, 7L, 7L, 9L, 1.0))
  }

  test("partial overlap covers exactly the union of duplicated windows") {
    // docs 6 and 7 share only "a b c": positions 0..2 covered in both
    val m = rows
    m(6L) shouldBe ((7L, 5L, 1L, 3L, 0.428571))
    m(7L) shouldBe ((4L, 2L, 1L, 3L, 0.75))
  }

  test("repeatedSpansIncrement equals the whole-corpus report on the batch") {
    // landed = odd ids, batch = even ids; the increment must reproduce
    // the global report rows for the batch docs exactly, at ANY split
    val landed = docs.filter($"doc_id" % 2 === 1)
    val batch = docs.filter($"doc_id" % 2 === 0)
    val arts = Dedup.spanArtifacts(landed, "doc_id", "text", 3)
    val inc = Dedup.repeatedSpansIncrement(batch, "doc_id", "text", 3, arts)
    assertSameRows(inc,
      Dedup.repeatedSpans(docs, "doc_id", "text", 3)
        .filter($"doc_id" % 2 === 0))
    // a batch-only span never seen in the landed corpus stays clean:
    // doc 2's spans all exist in landed doc 1, so doc 2 is fully dup
    inc.filter($"doc_id" === 2L).select($"dup_fraction")
      .head.getDouble(0) shouldBe 1.0
  }

  test("removeRepeatedSpans reassembles exactly the uncovered tokens in order") {
    val m = Dedup.removeRepeatedSpans(docs, "doc_id", "text", width = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    m(1L) shouldBe ((6L, 0L, "")) // fully duplicated -> empty survivor
    m(2L) shouldBe ((6L, 0L, ""))
    m(3L) shouldBe ((4L, 4L, "x y z w")) // untouched
    m(4L) shouldBe ((2L, 2L, "p q")) // shorter than width: untouched
    m(6L) shouldBe ((7L, 4L, "q r s t")) // "a b c" removed, order kept
    m(7L) shouldBe ((4L, 1L, "z9"))
  }
}

class CharTrigramsSpec extends SparkSpec {
  import spark.implicits._

  test("native CharTrigramsExpr is byte-identical to the composed built-ins") {
    val docs = Seq("The Quick fox", "ab", "", "ABC", "mixed Case str")
      .toDF("text")
    import org.apache.spark.sql.functions.{length => slen, lower => slower}
    val lowered = slower($"text")
    val composed = docs.select(
      when(slen(lowered) >= 3,
        transform(sequence(lit(1), slen(lowered) - 2),
          i => lowered.substr(i, lit(3))))
        .otherwise(array().cast("array<string>")).as("tg"))
    val native = docs.select(Classify.charTrigrams($"text").as("tg"))
    assertSameRows(native, composed)
  }

  test("char-trigram NB classifies by character composition") {
    val labeled = Seq(
      (1L, "aaaa bbbb aaaa", "a"), (2L, "abab baba abba", "a"),
      (3L, "zzzz yyyy zzzz", "z"), (4L, "zyzy yzyz zyyz", "z"))
      .toDF("doc_id", "text", "label")
    val out = Classify.naiveBayesClassify(
        labeled.union(Seq((5L, "aabb bbaa", "a"), (6L, "zzyy yyzz", "z"))
          .toDF("doc_id", "text", "label")),
        "doc_id", "text", "label", col("doc_id") <= 4, vocabSize = 50,
        tokenizer = Classify.charTrigrams)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(5L) shouldBe "a"
    out(6L) shouldBe "z"
  }
}

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopherFlags: each rule trips on its own pathological document") {
    val docs = Seq(
      (1L, ("the data " * 30).trim + " of and that"), // clean: passes
      (2L, "too short but the text of and that here"), // word-count fail
      (3L, ("a b " * 40).trim + " the of and"), // mean word length < 3
      (4L, ("ok#tag " * 30).trim + " the of and"), // symbol ratio 1/word
      (5L, ("123 456 " * 30).trim + " the of and"), // mostly non-alpha
      (6L, ("word list here item " * 15).trim)) // zero gopher stopwords
      .toDF("doc_id", "text")
    val m = TextAnalysis.gopherFlags(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    m(1L).getAs[Boolean]("pass") shouldBe true
    m(2L).getAs[Boolean]("word_count_ok") shouldBe false
    m(3L).getAs[Boolean]("mean_len_ok") shouldBe false
    m(4L).getAs[Boolean]("symbol_ok") shouldBe false
    m(5L).getAs[Boolean]("alpha_ok") shouldBe false
    m(6L).getAs[Boolean]("stopword_ok") shouldBe false
    Seq(2L, 3L, 4L, 5L, 6L).foreach { id =>
      m(id).getAs[Boolean]("pass") shouldBe false }
  }

  test("gopherFilter keeps exactly the passing docs with original columns") {
    val docs = Seq(
      (1L, ("the data " * 30).trim + " of and that", "web"),
      (2L, "short the of and", "web"))
      .toDF("doc_id", "text", "source")
    val kept = TextAnalysis.gopherFilter(docs, "doc_id", "text")
    kept.columns.toSeq shouldBe Seq("doc_id", "text", "source")
    kept.select($"doc_id").as[Long].collect() shouldBe Array(1L)
  }
}

class EditDistanceVerifySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different text about spark engines and shuffles here"))
    .toDF("doc_id", "text")

  test("editDistanceVerify computes exact Levenshtein on candidates only") {
    val out = Dedup.editDistanceVerify(
        Dedup.minhashCandidates(docs, "doc_id", "text"),
        docs, "doc_id", "text", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    out((1L, 2L)) shouldBe 0 // exact duplicate
    out((1L, 3L)) shouldBe 3 // dog -> cat: 3 substitutions
    out.keySet should not contain ((1L, 4L))
  }

  test("maxDist filters strictly above the threshold") {
    val out = Dedup.editDistanceVerify(
        Dedup.minhashCandidates(docs, "doc_id", "text"),
        docs, "doc_id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe Set((1L, 2L)) // the distance-3 pair drops
  }
}

class StreamClassifySpec extends SparkSpec {
  import spark.implicits._

  test("streaming classification equals the single-shot batch scoring") {
    val labeled = Seq(
      (1L, "good great good", "pos"), (2L, "great good nice", "pos"),
      (3L, "bad awful bad", "neg"), (4L, "awful bad nasty", "neg"))
      .toDF("doc_id", "text", "label")
    val model = Classify.naiveBayesModel(labeled, "text", "label", 10)
    val docs = (1L to 40L).map(i =>
        (i, if (i % 2 == 0) s"good great row $i" else s"bad nasty row $i"))
      .toDF("doc_id", "text")
    val inDir = tmp("sc_in")
    docs.repartition(4).write.mode("overwrite").parquet(inDir)
    val outDir = tmp("sc_out") + "/out"
    val streamed = graft.streaming.EventStream.runClassifyOnce(spark,
      spark.read.parquet(inDir).schema, inDir, model, "doc_id", "text",
      outDir, "sc_spec", maxFilesPerTrigger = Some(1))
    // 4 files x 1 per trigger -> multiple real micro-batches, and the
    // union of per-batch scores is the batch result row-for-row
    assertSameRows(streamed,
      Classify.naiveBayesScore(spark.read.parquet(inDir), model,
        "doc_id", "text"))
    streamed.filter($"doc_id" % 2 === 0)
      .select($"predicted").distinct().as[String]
      .collect() shouldBe Array("pos")
  }
}
