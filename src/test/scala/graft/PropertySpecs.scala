package graft

import graft.expr.{DateComponents, PartitionCriteria}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over driver-side semantics (SURVEY §5: property tests for
  * date derivation and partition-criteria algebra). Plain ScalaCheck Gens
  * sampled deterministically (scalatestplus isn't on the offline classpath).
  */
class DateDerivationProperties extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("yyyyMMdd components equal java.time for arbitrary valid dates") {
    val ds = samples(Gen.choose(0L, 20000L), 200)
      .map(java.time.LocalDate.ofEpochDay) // 1970..2024
    val strs = ds.map(_.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    val out = DateComponents.withComponents(strs.toDF("d"), "d",
        "yyyyMMdd", Seq("year", "month", "day", "week"))
      .orderBy("d").collect()
    val expected = ds.sortBy(_.format(
      java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    out.zip(expected).foreach { case (row, ld) =>
      row.getShort(1) shouldBe ld.getYear.toShort
      row.getShort(2) shouldBe ld.getMonthValue.toShort
      row.getShort(3) shouldBe ld.getDayOfMonth.toShort
      row.getShort(4) shouldBe (((ld.getDayOfYear - 1) / 7) + 1).toShort
    }
  }

  test("non-dates always map to sentinels") {
    val junk = samples(Gen.alphaStr.map(_.take(7)), 50).distinct
    val out = DateComponents.withComponents(junk.toDF("d"), "d",
      "yyyyMMdd", Seq("year", "month")).collect()
    out.foreach { r =>
      r.getShort(1) shouldBe 9999.toShort
      r.getShort(2) shouldBe 99.toShort
    }
  }
}

class PartitionCriteriaProperties extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("compiled Column filter equals reference predicate semantics") {
    val rows = (for { y <- 2015 to 2017; m <- 1 to 4 } yield (y, m))
      .toDF("year", "month")
    val data = rows.as[(Int, Int)].collect()
    val conjGen: Gen[Seq[(String, Any)]] = for {
      y <- Gen.option(Gen.choose(2014, 2018))
      m <- Gen.option(Gen.choose(0, 5))
    } yield (y.map(v => ("year", v: Any)) ++ m.map(v => ("month", v: Any))).toSeq
    val criteriaGen = Gen.listOfN(4, conjGen)
    samples(criteriaGen, 30).foreach { criteria =>
      val got = rows.filter(PartitionCriteria.toColumn(criteria))
        .as[(Int, Int)].collect().toSet
      val exp = data.filter { case (y, m) =>
        criteria.exists(conj => conj.forall {
          case ("year", v) => v == y
          case ("month", v) => v == m
          case _ => false
        })
      }.toSet
      withClue(s"criteria=$criteria") { got shouldBe exp }
    }
  }
}

class CurationProperties extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Packing, Sampling}

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("packing invariants hold for arbitrary token-count sequences") {
    val lens = samples(Gen.choose(1, 300), 400)
    val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "n")
    val packed = Packing.withChunkIds(docs, "id", "n", budgetTokens = 512,
        slices = 5)
    val out = packed.frame
      .select($"id", $"n", $"chunk_id", $"offset_in_chunk")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    packed.release()
    // offsets stay inside the budget; chunk ids are non-decreasing in id
    // order; each doc starts exactly where the previous one ended
    all(out.map(_._4)) should (be >= 0L and be < 512L)
    out.sliding(2).foreach {
      case Array((_, n1, c1, o1), (_, _, c2, o2)) =>
        val globalNext = c1 * 512 + o1 + n1
        (c2 * 512 + o2) shouldBe globalNext
        c2 should be >= c1
      case _ =>
    }
    // total token mass is preserved by the chunk arithmetic
    val last = out.last
    (last._3 * 512 + last._4 + last._2) shouldBe lens.map(_.toLong).sum
  }

  test("sampling is monotone in fraction and stable across strata splits") {
    val df = spark.range(3000).toDF("id")
    val fracs = samples(Gen.choose(1, 99).map(_ / 100.0), 12).distinct.sorted
    val counts = fracs.map(f =>
      f -> Sampling.deterministicSample(df, "id", f).count())
    // monotone: a larger fraction never selects fewer rows
    counts.sliding(2).foreach {
      case Seq((_, a), (_, b)) => b should be >= a
      case _ =>
    }
    // a row's selection at fraction f is independent of strata config:
    // stratified with uniform rates == deterministic sample
    val strat = Sampling.stratifiedSample(
      df.withColumn("s", ($"id" % 3).cast("string")), "id", "s",
      Map("0" -> 0.4, "1" -> 0.4, "2" -> 0.4)).select($"id")
    assertSameRows(strat, Sampling.deterministicSample(df, "id", 0.4))
  }

  test("hash split labels exhaustively and disjointly for arbitrary " +
      "positive weights, and prefix sampling equals the first split") {
    val df = spark.range(2000).toDF("id")
    val weightGen = Gen.listOfN(4, Gen.choose(1, 50))
    samples(weightGen, 8).foreach { ws =>
      val splits = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w.toDouble }
      val out = Sampling.hashSplit(df, "id", splits)
      // exhaustive and disjoint: withColumn preserves every row exactly
      // once, and every label is one of the configured names
      out.count() shouldBe 2000L
      val labels = out.groupBy($"split").count()
        .as[(String, Long)].collect().toMap
      labels.keySet.subsetOf(splits.map(_._1).toSet) shouldBe true
      labels.values.sum shouldBe 2000L
      // the first split IS the deterministic sample at its weight share
      // (bucket-consistency across the sampling family)
      val share = ws.head.toDouble / ws.sum
      assertSameRows(
        out.filter($"split" === "s0").select($"id"),
        Sampling.deterministicSample(df, "id", share))
    }
  }

  test("minhash signatures are permutation-invariant and length-k") {
    val g = Gen.listOfN(20, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)))
    samples(g, 20).filter(_.nonEmpty).foreach { toks =>
      val fwd = Seq((1L, toks)).toDF("id", "sh")
      val rev = Seq((1L, toks.reverse)).toDF("id", "sh")
      val s1 = fwd.select(graft.operators.Dedup.minhashSignature($"sh", 16))
        .as[Seq[Long]].head()
      val s2 = rev.select(graft.operators.Dedup.minhashSignature($"sh", 16))
        .as[Seq[Long]].head()
      s1 shouldBe s2          // min over a set ignores order
      s1.length shouldBe 16
    }
  }

  test("two-phase caps equal their naive single-window oracles on " +
      "randomized corpora (counts and weights)") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    // randomized group layouts: group count, skew, and weights vary per
    // sample; both cap operators must match the naive formulation exactly
    val layoutGen = for {
      nGroups <- Gen.choose(1, 6)
      n <- Gen.choose(30, 400)
      skewed <- Gen.oneOf(true, false)
    } yield (nGroups, n, skewed)
    samples(layoutGen, 8).foreach { case (nGroups, n, skewed) =>
      val df = spark.range(n.toLong).selectExpr("id",
        if (skewed) s"CASE WHEN id % 3 < 2 THEN 'g0' ELSE concat('g', id % $nGroups) END AS grp"
        else s"concat('g', id % $nGroups) AS grp",
        "CAST(1 + id % 13 AS DOUBLE) AS w")
      val cap = 5 + (n % 20)
      val naiveCount = df.withColumn("__r", row_number().over(
          Window.partitionBy($"grp")
            .orderBy(Sampling.hashBucket($"id"), $"id")))
        .filter($"__r" <= cap).drop("__r")
      assertSameRows(Sampling.capPerGroup(df, "id", "grp", cap), naiveCount)
      val budget = 20.0 + (n % 50)
      val naiveWeighted = df.withColumn("__cb",
          sum($"w").over(Window.partitionBy($"grp")
            .orderBy(Sampling.hashBucket($"id"), $"id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            - $"w")
        .filter($"__cb" < budget).drop("__cb")
      assertSameRows(
        Sampling.capPerGroupWeighted(df, "id", "grp", "w", budget),
        naiveWeighted)
    }
  }
}

class ChunkingProperties extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Dedup, Packing}

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("chunkText invariants for arbitrary docs and window shapes: exact " +
      "partition at stride==chunk, every token in >=1 window, contiguous " +
      "indices, n_tokens consistent") {
    val docsGen = Gen.listOfN(30, Gen.choose(1, 60))
    for (trial <- 0 until 4) {
      val lens = samples(docsGen, 1).head
      val docs = lens.zipWithIndex.map { case (len, i) =>
        (i.toLong, (0 until len).map(k => s"w${i}_$k").mkString(" "))
      }.toDF("id", "t")
      val chunk = 4 + trial * 3
      val stride = 1 + (trial * 5) % chunk // stride <= chunk
      val out = Packing.chunkText(docs, "id", "t", chunk, stride)
        .as[(Long, Int, String, Int)].collect()
      val byDoc = out.groupBy(_._1)
      docs.as[(Long, String)].collect().foreach { case (id, t) =>
        val toks = t.split(" ")
        val rows = byDoc(id).sortBy(_._2)
        // contiguous indices from 0
        rows.map(_._2).toSeq shouldBe rows.indices.toSeq
        // n_tokens matches the actual window content
        rows.foreach { case (_, idx, text, n) =>
          val got = text.split(" ")
          got.length shouldBe n
          n shouldBe math.min(chunk, toks.length - idx * stride)
          got.toSeq shouldBe
            toks.slice(idx * stride, idx * stride + chunk).toSeq
        }
        // coverage: every token index falls inside some window
        val covered = rows.flatMap { case (_, idx, _, n) =>
          (idx * stride) until (idx * stride + n)
        }.toSet
        covered shouldBe toks.indices.toSet
      }
      // exact partition face: concatenating stride==chunk chunks in
      // order reproduces the token stream
      val exact = Packing.chunkText(docs, "id", "t", chunk, chunk)
        .as[(Long, Int, String, Int)].collect()
        .groupBy(_._1).map { case (id, rows) =>
          id -> rows.sortBy(_._2).map(_._3).mkString(" ")
        }
      docs.as[(Long, String)].collect().foreach { case (id, t) =>
        exact(id) shouldBe t
      }
    }
  }

  test("containment bounds for arbitrary prefix-sharing docs: a full " +
      "prefix is containment 1.0, and containment >= jaccard always") {
    val docs = (1L to 12L).map { i =>
      val base = (0 until 20).map(k => s"t${i % 4}_$k").mkString(" ")
      (i, if (i % 3 == 0) base.split(" ").take(8).mkString(" ") else base)
    }.toDF("id", "t")
    val cont = Dedup.ngramContainmentPairs(docs, "id", "t", 3, 0.0001)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val jac = Dedup.ngramJaccardPairs(docs, "id", "t", 3, 0.0001,
        prefixFilter = Some(false))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    jac.keys.toSet shouldBe cont.keys.toSet // same candidate pairs
    jac.foreach { case (pair, j) => cont(pair) should be >= j }
    // the 8-token prefix doc of each base is fully contained in it
    cont.filter { case ((a, b), _) => (a % 4 == b % 4) && (a % 3 == 0 || b % 3 == 0) }
      .foreach { case (_, c) => c shouldBe 1.0 }
  }
}

/** Property-style invariants for the round-9 profiling operators:
  * randomized inputs must respect the mathematical bounds the operators
  * advertise (|r| ≤ 1, KS ∈ [0, 1], κ ≤ 1, top-k never exceeds k and
  * shares sum to ≤ 1 within a group, MI ≥ −ε and ≤ min(H) + ε).
  */
class ProfilingProperties extends SparkSpec {
  import spark.implicits._
  import graft.operators.Stats
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("corrPerGroup stays within [-1, 1] for arbitrary integer data") {
    val rows = samples(for {
      g <- Gen.oneOf("a", "b", "c")
      x <- Gen.choose(-50L, 50L)
      y <- Gen.choose(-50L, 50L)
    } yield (g, x, y), 300)
    val out = Stats.corrPerGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double])].collect()
    out.flatMap(_._3).foreach { r =>
      r should be >= -1.0; r should be <= 1.0
    }
  }

  test("ksDistance lies in [0, 1], is 0 on identical frames, and is " +
      "symmetric for arbitrary samples") {
    val va = samples(Gen.choose(0L, 30L), 200)
    val vb = samples(Gen.choose(10L, 40L), 150)
    val (a, b) = (va.toDF("v"), vb.toDF("v"))
    val ab = Stats.ksDistance(a, b, "v")
      .as[(Long, Long, Option[Double])].head()
    val ba = Stats.ksDistance(b, a, "v")
      .as[(Long, Long, Option[Double])].head()
    ab._3.get should be >= 0.0
    ab._3.get should be <= 1.0
    ab._3 shouldBe ba._3
    Stats.ksDistance(a, a, "v")
      .as[(Long, Long, Option[Double])].head()._3 shouldBe Some(0.0)
  }

  test("mutualInformation: 0 <= mi <= min(h_a, h_b) + eps and nmi in " +
      "[0, 1] for arbitrary categorical pairs") {
    val rows = samples(for {
      a <- Gen.oneOf("p", "q", "r", "s")
      b <- Gen.oneOf("x", "y", "z")
    } yield (a, b), 250)
    val (_, _, _, ha, hb, _, mi, nmi) =
      Stats.mutualInformation(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Double, Double, Double, Double,
          Option[Double])].head()
    val eps = 1e-9
    mi should be >= -eps
    mi should be <= math.min(ha, hb) + eps
    nmi.foreach { v => v should be >= -eps; v should be <= 1.0 + eps }
  }

  test("cohenKappa <= 1 always, and po/pe are proper probabilities") {
    val rows = samples(for {
      a <- Gen.oneOf("u", "v", "w")
      b <- Gen.oneOf("u", "v", "w")
    } yield (a, b), 250)
    val (_, _, po, pe, k) =
      Stats.cohenKappa(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].head()
    po should be >= 0.0; po should be <= 1.0
    pe should be >= 0.0; pe should be <= 1.0
    k.foreach(_ should be <= 1.0)
  }

  test("topValuesPerGroup: never more than k rows per group, ranks are " +
      "1..k dense, kept shares sum to <= 1 per group") {
    val rows = samples(for {
      g <- Gen.oneOf("g1", "g2")
      v <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    } yield (g, v), 300)
    val out = Stats.topValuesPerGroup(rows.toDF("g", "v"), "g", "v", k = 3)
      .as[(String, String, Long, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rs) =>
      rs.length should be <= 3
      rs.map(_._4).sorted shouldBe (1 to rs.length)
      rs.map(_._5).sum should be <= 1.0 + 1e-9
    }
  }
}

/** Property tests for the round-9 span-dedup and DSIR operator families:
  * structural invariants over generated corpora.
  */
class SpanDedupProperties extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // random docs over a tiny vocabulary: collisions guaranteed, lengths
  // straddle the span width
  private def corpus(n: Int): Seq[(Long, String)] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(1, 12).flatMap(k => Gen.listOfN(k, word))
    samples(doc, n).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" ")) }
  }

  test("repeatedSpans invariants: bounds hold on random corpora") {
    val docs = corpus(60).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .repeatedSpans(docs, "doc_id", "text", width = 3).collect()
    out.length shouldBe 60
    out.foreach { r =>
      val (n, spans, dups, cov) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      spans shouldBe math.max(n - 2, 0)
      dups should be <= spans
      cov should be <= n
      if (dups > 0) cov should be >= 3L // one dup span covers >= width
      if (dups == 0) cov shouldBe 0L
    }
  }

  test("removal conserves tokens: kept + covered == n_tokens, text replays") {
    val docs = corpus(60).toDF("doc_id", "text")
    val rep = graft.operators.Dedup
      .repeatedSpans(docs, "doc_id", "text", 3)
      .select($"doc_id", $"n_tokens", $"covered_tokens")
    val rem = graft.operators.Dedup
      .removeRepeatedSpans(docs, "doc_id", "text", 3)
      .select($"doc_id", $"kept_tokens", $"clean_text")
    rep.join(rem, "doc_id").collect().foreach { r =>
      val kept = r.getLong(3)
      r.getLong(1) - r.getLong(2) shouldBe kept
      val replayed = if (r.getString(4).isEmpty) 0
        else r.getString(4).split(" ").length
      replayed.toLong shouldBe kept
    }
  }

  test("span increment == whole-corpus restriction at random split points") {
    val docs = corpus(60).toDF("doc_id", "text")
    Seq(2L, 3L, 7L).foreach { m =>
      val landed = docs.filter($"doc_id" % m =!= 0)
      val batch = docs.filter($"doc_id" % m === 0)
      val arts = graft.operators.Dedup
        .spanArtifacts(landed, "doc_id", "text", 3)
      assertSameRows(
        graft.operators.Dedup
          .repeatedSpansIncrement(batch, "doc_id", "text", 3, arts),
        graft.operators.Dedup.repeatedSpans(docs, "doc_id", "text", 3)
          .filter($"doc_id" % m === 0))
    }
  }
}

class DsirProperties extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def corpus(n: Int, seedOff: Int): Seq[(Long, String)] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.choose(2, 9).flatMap(k => Gen.listOfN(k, word))
    (0 until n).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed((i + seedOff).toLong)))
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
  }

  test("importanceWeights is invariant to row order and partitioning") {
    val raw = corpus(50, 0).toDF("doc_id", "text")
    val tgt = corpus(10, 1000).map { case (i, t) => (i + 100L, t) }
      .toDF("doc_id", "text")
    val a = graft.operators.Dsir
      .importanceWeights(raw, tgt, "doc_id", "text", 64)
    val b = graft.operators.Dsir.importanceWeights(
      raw.orderBy($"doc_id".desc).repartition(7), tgt,
      "doc_id", "text", 64)
    assertSameRows(a, b)
  }

  test("scoring the target corpus against itself gives non-negative weights") {
    // p_target == p_raw when target IS raw: every diff is 0, weights 0
    val raw = corpus(30, 0).toDF("doc_id", "text")
    val w = graft.operators.Dsir
      .importanceWeights(raw, raw, "doc_id", "text", 64)
      .select($"log_weight").as[Double].collect()
    w.foreach(_ shouldBe 0.0 +- 1e-9)
  }
}

/** Round-10 convention (VERDICT r9 #3): no gated projection can emit IEEE
  * `-0.0`. Verify normalizes every DOUBLE column with `+ 0.0` on the Spark
  * side and wraps the oracle SQL with the same identity, so the q186
  * sign-bit divergence class is structurally closed.
  */
class SignedZeroProperties extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("normalizeSignedZero: kills -0.0, bit-preserves everything else") {
    val gen = Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(-0.0, 0.0, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity,
        Double.MinPositiveValue, -Double.MinPositiveValue))
    val vals = samples(gen, 400) :+ -0.0 :+ 0.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val out = Verify.normalizeSignedZero(df)
      .orderBy($"id").select($"x").as[Double].collect()
    out.zip(vals).foreach { case (got, in) =>
      val negZero = java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(-0.0)
      negZero shouldBe false // the whole point
      if (java.lang.Double.doubleToRawLongBits(in) !=
          java.lang.Double.doubleToRawLongBits(-0.0) && !in.isNaN)
        java.lang.Double.doubleToRawLongBits(got) shouldBe
          java.lang.Double.doubleToRawLongBits(in) // identity elsewhere
      if (in.isNaN) got.isNaN shouldBe true
    }
    // nulls survive, non-double columns untouched
    val withNull = spark.sql(
      "SELECT CAST(NULL AS DOUBLE) AS x, 'k' AS s, CAST(-0.0 AS DOUBLE) AS y")
    val r = Verify.normalizeSignedZero(withNull).collect()(0)
    r.isNullAt(0) shouldBe true
    r.getString(1) shouldBe "k"
    java.lang.Double.doubleToRawLongBits(r.getDouble(2)) shouldBe 0L
  }

  test("wrapOracle: + 0.0 REPLACE on exactly the double columns") {
    // identity when the gate has no double columns
    Verify.wrapOracle("SELECT 1 AS a", Nil) shouldBe "SELECT 1 AS a"
    // DuckDB's SELECT * REPLACE keeps names/order and touches only the
    // listed columns; execution is covered by the local checker run
    // (tools/check_correctness.py drives DuckDB over the wrapped SQL)
    val wrapped = Verify.wrapOracle(
      "SELECT -0.0 AS a, 3 AS b, 'z' AS c", Seq("a", "q v"))
    wrapped should startWith ("SELECT * REPLACE (")
    wrapped should include ("""("a" + 0.0) AS "a"""")
    wrapped should include ("""("q v" + 0.0) AS "q v"""") // quoted names
    wrapped should endWith (") __graft_szn")
  }
}
