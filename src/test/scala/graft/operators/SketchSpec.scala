package graft.operators

import graft.SparkSpec

/** [[DistinctSketch]] — KMV distinct-count estimation. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact below k and unaffected by duplication") {
    val df = (1L to 10L).flatMap(i => Seq.fill(17)(("a", i)))
      .toDF("g", "id")
    val out = DistinctSketch.kmvDistinct(df, "g", "id", k = 64).collect()
    out.length shouldBe 1
    out.head.getDouble(1) shouldBe 10.0
    out.head.getLong(2) shouldBe 10L
  }

  test("kmvDistinct estimates large cardinalities within ~3/sqrt(k)") {
    val df = (1L to 20000L).map(i => ("a", i)).toDF("g", "id")
    val est = DistinctSketch.kmvDistinct(df, "g", "id", k = 256)
      .collect().head.getDouble(1)
    // relative error of KMV is ~1/sqrt(k) = 6.25% at k=256; 3 sigma
    math.abs(est - 20000.0) / 20000.0 should be < 0.19
  }

  test("kmvDistinct per-group: mixed exact and estimated groups") {
    val big = (1L to 5000L).map(i => ("big", i))
    val small = (1L to 7L).map(i => ("small", i))
    val out = DistinctSketch
      .kmvDistinct((big ++ small).toDF("g", "id"), "g", "id", k = 128)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    out("small") shouldBe ((7.0, 7L))
    out("big")._2 shouldBe 128L
    math.abs(out("big")._1 - 5000.0) / 5000.0 should be < 0.27
  }

  test("kmvMerge of part sketches equals the sketch of the union — " +
      "exactly, including overlapping ids") {
    val a = (1L to 3000L).map(i => ("g", i)).toDF("g", "id")
    val b = (2000L to 6000L).map(i => ("g", i)).toDF("g", "id") // overlap
    val merged = DistinctSketch.kmvMerge(
      Seq(DistinctSketch.kmvHashes(a, "g", "id", 64),
        DistinctSketch.kmvHashes(b, "g", "id", 64)), "g", 64)
    val whole = DistinctSketch.kmvHashes(a.union(b), "g", "id", 64)
    assertSameRows(merged, whole)
    // and therefore the estimates agree bit-for-bit
    assertSameRows(
      DistinctSketch.kmvEstimate(merged, "g", 64),
      DistinctSketch.kmvDistinct(a.union(b), "g", "id", 64))
  }

  test("sketch artifacts survive a parquet round-trip") {
    val df = (1L to 5000L).map(i => ("g", i)).toDF("g", "id")
    val dir = tmp("kmv_artifact") + "/sk"
    DistinctSketch.kmvHashes(df, "g", "id", 64)
      .write.parquet(dir)
    assertSameRows(
      DistinctSketch.kmvEstimate(spark.read.parquet(dir), "g", 64),
      DistinctSketch.kmvDistinct(df, "g", "id", 64))
  }

  test("kmvIntersectEstimate: exact under k, near-true overlap when " +
      "estimated, clamped at 0 on disjoint sets") {
    // under k on all three sketches: estimates are exact counts, so
    // the inclusion-exclusion overlap is exact: |A|=30, |B|=30, |A∩B|=10
    val a = (1L to 30L).map(("g", _)).toDF("g", "id")
    val b = (21L to 50L).map(("g", _)).toDF("g", "id")
    val sa = DistinctSketch.kmvHashes(a, "g", "id", 64)
    val sb = DistinctSketch.kmvHashes(b, "g", "id", 64)
    val r = DistinctSketch.kmvIntersectEstimate(sa, sb, "g", 64)
      .select($"est_a", $"est_b", $"est_union", $"est_intersect")
      .as[(Double, Double, Double, Double)].collect().head
    r shouldBe ((30.0, 30.0, 50.0, 10.0))
    // estimated regime: 5000-id halves overlapping by 2500, k=64 ->
    // overlap within the sketches' error envelope
    val bigA = (1L to 5000L).map(("g", _)).toDF("g", "id")
    val bigB = (2501L to 7500L).map(("g", _)).toDF("g", "id")
    val est = DistinctSketch.kmvIntersectEstimate(
      DistinctSketch.kmvHashes(bigA, "g", "id", 64),
      DistinctSketch.kmvHashes(bigB, "g", "id", 64), "g", 64)
      .select($"est_intersect").as[Double].collect().head
    est should be (2500.0 +- 1500.0)
    // disjoint sets: the estimate never goes negative
    val dA = (1L to 3000L).map(("g", _)).toDF("g", "id")
    val dB = (3001L to 6000L).map(("g", _)).toDF("g", "id")
    val dj = DistinctSketch.kmvIntersectEstimate(
      DistinctSketch.kmvHashes(dA, "g", "id", 64),
      DistinctSketch.kmvHashes(dB, "g", "id", 64), "g", 64)
      .select($"est_intersect").as[Double].collect().head
    dj should be >= 0.0
  }

  test("Misra-Gries heavy hitters: exact and partition-order-invariant " +
      "when k >= distinct; approximate regime keeps the guarantees") {
    val items = (Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 80).map(i => s"cold$i")).map(Tuple1(_))
    val df = items.toDF("item")
    // exact regime: k >= 82 distinct -> identical to groupBy counts,
    // under ANY partitioning
    val exact = Stats.heavyHitters(df, "item", k = 128)
      .as[(String, Long)].collect().toMap
    val truth = df.groupBy($"item").count()
      .as[(String, Long)].collect().toMap
    exact shouldBe truth
    Stats.heavyHitters(df.repartition(7), "item", 128)
      .as[(String, Long)].collect().toMap shouldBe truth
    // approximate regime at k=4: n=700, undercount bound n/(k+1)=140;
    // "hot" (500 > 140) MUST survive with a count in [360, 500]
    val approx = Stats.heavyHitters(df.repartition(5), "item", 4)
      .as[(String, Long)].collect().toMap
    approx.size should be <= 4
    approx.keySet should contain ("hot")
    approx("hot") should be <= 500L
    approx("hot") should be >= 360L
    approx.foreach { case (item, low) =>
      low should be <= truth(item) // counts are lower bounds
    }
    // null items are ignored
    val withNull = df.unionByName(
      Seq(Option.empty[String]).toDF("item"))
    Stats.heavyHitters(withNull, "item", 128)
      .as[(String, Long)].collect().toMap shouldBe truth
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("hh_items")
    spark.sql(
      "SELECT explode(heavy_hitters(item, 128)) AS e FROM hh_items")
      .select($"e.item", $"e.count_low").as[(String, Long)]
      .collect().toMap shouldBe truth
  }

  test("the k-smallest filter map-side prunes (WindowGroupLimit)") {
    val df = (1L to 1000L).map(i => ("a", i)).toDF("g", "id")
    val plan = DistinctSketch.kmvDistinct(df, "g", "id", k = 16)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }
}

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("exact regime (n < k): per-group sketch quantiles equal the " +
      "type-1 sorted-rank values, duplicates included, partition-" +
      "order-invariant") {
    val vals = Seq.tabulate(100)(i => ("a", (i % 25).toDouble)) ++
      Seq.tabulate(30)(i => ("b", i.toDouble))
    def run(parts: Int) =
      Stats.sketchQuantilesPerGroup(
        vals.toDF("g", "v").repartition(parts), "g", "v",
        Seq(0.0, 0.25, 0.5, 0.9, 1.0), k = 4096)
        .as[(String, Double, Double, Long)].collect()
        .sortBy(r => (r._1, r._2))
    val out = run(1)
    def exact(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s((math.max(1, math.ceil(p * s.length).toLong) - 1).toInt)
    }
    val aVals = vals.filter(_._1 == "a").map(_._2)
    val bVals = vals.filter(_._1 == "b").map(_._2)
    out.foreach { case (g, p, q, n) =>
      val xs = if (g == "a") aVals else bVals
      n shouldBe xs.length
      q shouldBe exact(xs, p)
    }
    run(7) shouldBe out
  }

  test("approximate regime: bounded memory and bounded rank error on " +
      "10k adversarially-sorted values at k=256") {
    val n = 10000
    val df = (0 until n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val sk = df.groupBy($"g")
      .agg(graft.functions.QuantileSketchAgg.sketch($"v", 256).as("sk"))
      .select(org.apache.spark.sql.functions.size($"sk.items").as("sz"),
        $"sk.n".as("n"))
      .head
    sk.getLong(1) shouldBe n
    sk.getInt(0) should be < 1024 // ~k·log2(n/k) items, never n
    val qs = Stats.sketchQuantilesPerGroup(df, "g", "v",
      Seq(0.1, 0.5, 0.9), k = 256)
      .as[(String, Double, Double, Long)].collect()
    qs.foreach { case (_, p, q, _) =>
      // value == true rank here (v = index), so rank error is |q - p·n|
      math.abs(q - p * n) should be < (0.05 * n)
    }
    // deterministic: same input -> same sketch estimates
    val qs2 = Stats.sketchQuantilesPerGroup(df, "g", "v",
      Seq(0.1, 0.5, 0.9), k = 256)
      .as[(String, Double, Double, Long)].collect()
    qs2.sortBy(_._2) shouldBe qs.sortBy(_._2)
  }

  test("weight conservation: cumulative sketch weight equals n in the " +
      "compacted regime, odd-sized levels included") {
    // 999 values with k=16 forces many odd-size compactions
    val df = (0 until 999).map(i => ("g", (i * 37 % 999).toDouble))
      .toDF("g", "v")
    val total = df.groupBy($"g")
      .agg(graft.functions.QuantileSketchAgg.sketch($"v", 16).as("sk"))
      .select(aggregate($"sk.items", lit(0L), (a, it) => a + it("w"))
        .as("tw"), $"sk.n".as("n")).head
    total.getLong(0) shouldBe total.getLong(1)
  }
}

class CmsJoinSizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("cmsJoinSizeEstimate: never underestimates the true join size, " +
      "and is exact when cells do not collide") {
    val a = Seq(1, 1, 1, 2, 2, 3, 7, 7).toDF("k") // fA: 1->3, 2->2, 3->1, 7->2
    val b = Seq(1, 2, 2, 3, 3, 3, 9).toDF("k")    // fB: 1->1, 2->2, 3->3
    val trueSize = a.join(b, "k").count()         // 3 + 4 + 3 = 10
    val sa = FreqSketch.cmsBuild(a, "k", depth = 4, width = 4096)
    val sb = FreqSketch.cmsBuild(b, "k", depth = 4, width = 4096)
    val est = FreqSketch.cmsJoinSizeEstimate(sa, sb)
      .as[Long].collect().head
    est should be >= trueSize
    // 5+4 distinct keys in 4096 buckets: the md5 cells are collision-free
    // for this fixture (deterministic — pinned, not probabilistic)
    est shouldBe trueSize
  }
}

class QuantileSketchMergeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.QuantileSketchAgg

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(QuantileSketchAgg.sketch($"v", k).as("__sk"))

  test("artifact merge in the APPROXIMATE regime: weighted re-ingest of " +
      "two compacted part sketches is a valid sketch (weight = n, rank " +
      "error bounded) after a parquet round trip") {
    val n = 8000
    val a = (0 until n / 2).map(i => ("g", i.toDouble)).toDF("g", "v")
    val b = (n / 2 until n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val dir = tmp("qs_arts")
    sketchOf(a, 64).select($"g", explode($"__sk.items").as("it"))
      .write.parquet(s"$dir/a")
    sketchOf(b, 64).select($"g", explode($"__sk.items").as("it"))
      .write.parquet(s"$dir/b")
    val merged = spark.read.parquet(s"$dir/a")
      .unionByName(spark.read.parquet(s"$dir/b"))
      .groupBy($"g")
      .agg(QuantileSketchAgg.mergeSketch($"it", 64).as("__sk"))
    merged.select($"__sk.n").as[Long].collect().head shouldBe n
    val qs = graft.operators.Stats.quantilesFromSketches(merged, "g",
      Seq(0.25, 0.5, 0.75)).as[(String, Double, Double, Long)].collect()
    qs.foreach { case (_, p, q, nn) =>
      nn shouldBe n
      math.abs(q - p * n) should be < (0.08 * n) // value == rank here
    }
  }

  test("artifact merge in the exact regime equals the whole-data sketch") {
    val a = (0 until 40).map(i => ("g", i.toDouble)).toDF("g", "v")
    val b = (40 until 90).map(i => ("g", i.toDouble)).toDF("g", "v")
    val merged = sketchOf(a, 4096)
      .select($"g", explode($"__sk.items").as("it"))
      .unionByName(sketchOf(b, 4096)
        .select($"g", explode($"__sk.items").as("it")))
      .groupBy($"g")
      .agg(QuantileSketchAgg.mergeSketch($"it", 4096).as("__sk"))
    assertSameRows(
      graft.operators.Stats.quantilesFromSketches(merged, "g",
        Seq(0.1, 0.5, 1.0)),
      graft.operators.Stats.sketchQuantilesPerGroup(
        a.unionByName(b), "g", "v", Seq(0.1, 0.5, 1.0), 4096))
  }
}

class MisraGriesMergeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.MisraGriesAgg

  test("artifact merge: exact-regime part summaries recombine to the " +
      "true counts; approximate regime keeps the survival guarantee") {
    val items = (Seq.fill(300)("hot") ++ Seq.fill(90)("warm") ++
      (1 to 60).map(i => s"cold$i")).zipWithIndex
      .map { case (it, i) => (i, it) }
    val df = items.toDF("i", "item")
    def part(f: org.apache.spark.sql.Column, k: Int) = df.filter(f)
      .agg(MisraGriesAgg.heavyHitters($"item", k).as("hh"))
      .select(explode($"hh").as("it"))
    def merged(k: Int) =
      part($"i" % 2 === 0, k).unionByName(part($"i" % 2 =!= 0, k))
        .agg(MisraGriesAgg.mergeHeavyHitters($"it", k).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.count_low").as[(String, Long)]
        .collect().toMap
    val truth = df.groupBy($"item").count().as[(String, Long)]
      .collect().toMap
    merged(128) shouldBe truth // k >= 62 distinct: exact end to end
    // approximate artifacts (k=4 per shard): counts stay lower bounds
    // and "hot" (300 > n/(k+1) even after shard-level shed) survives
    val approx = merged(4)
    approx.keySet should contain ("hot")
    approx.foreach { case (it, low) => low should be <= truth(it) }
  }
}

class KmvAggSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("KmvAgg equals the frame-level kmvHashes sketch exactly — " +
      "approximate regime, any partitioning — and the estimates agree") {
    val df = (1L to 5000L).map(i => ("g", i)).toDF("g", "id")
    val hash = conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
      .cast("long")
    def viaAgg(parts: Int) = df.repartition(parts).groupBy($"g")
      .agg(graft.functions.KmvAgg.kmvSketch(hash, 64).as("sk"))
      .select(explode($"sk").as("__h")).as[Long].collect().sorted.toSeq
    val frame = DistinctSketch.kmvHashes(df, "g", "id", 64)
      .select($"__h").as[Long].collect().sorted.toSeq
    viaAgg(1) shouldBe frame
    viaAgg(7) shouldBe frame
    // estimate formula agrees with the frame path
    val estAgg = df.groupBy($"g")
      .agg(graft.functions.KmvAgg.kmvSketch(hash, 64).as("sk"))
      .select(DistinctSketch.kmvEstimateFromArray($"sk", 64))
      .as[Double].collect().head
    val estFrame = DistinctSketch.kmvDistinct(df, "g", "id", 64)
      .collect().head.getDouble(1)
    estAgg shouldBe estFrame
  }
}

class HllSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.PortableHash

  /** Driver-side reference registers, straight from the definition. */
  private def refRegisters(ids: Seq[Long], p: Int): Array[Int] = {
    val q = 60 - p
    val regs = new Array[Int](1 << p)
    ids.foreach { id =>
      val h = PortableHash.md5Long60(id.toString)
      val idx = (h >>> q).toInt
      val low = h & ((1L << q) - 1)
      val rho = if (low == 0L) q + 1
        else q + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs
  }

  test("hllSketch registers match the per-id definition; duplicates and " +
      "partitioning are invisible") {
    val ids = (1L to 500L)
    val df = (ids ++ ids).map(i => ("g", i)).toDF("g", "id").repartition(7)
    val got = DistinctSketch.hllSketch(df, "g", "id", p = 8)
      .select($"registers").as[Seq[Int]].head
    got.toArray shouldBe refRegisters(ids, 8)
  }

  test("hllMerge of part sketches equals the sketch of the union; " +
      "merge is idempotent; groups missing from one side survive") {
    val a = (1L to 300L).map(i => ("g", i)).toDF("g", "id")
      .union(Seq(("only_a", 1L)).toDF("g", "id"))
    val b = (200L to 600L).map(i => ("g", i)).toDF("g", "id")
    val merged = DistinctSketch.hllMerge(
      Seq(DistinctSketch.hllSketch(a, "g", "id", 8),
        DistinctSketch.hllSketch(b, "g", "id", 8),
        DistinctSketch.hllSketch(b, "g", "id", 8)), "g", 8)
    val whole = DistinctSketch.hllSketch(a.union(b), "g", "id", 8)
    assertSameRows(merged, whole)
    assertSameRows(
      DistinctSketch.hllEstimate(merged, "g", 8),
      DistinctSketch.hllEstimate(whole, "g", 8))
  }

  test("hll estimate lands within ~3/sqrt(m) of truth at 20k distinct; " +
      "harmonic denom is the exact fixed-point integer") {
    val n = 20000L
    val df = (1L to n).map(i => ("g", i)).toDF("g", "id")
    val row = DistinctSketch.hllEstimate(
      DistinctSketch.hllSketch(df, "g", "id", 8), "g", 8).collect()(0)
    val est = row.getAs[Double]("est_distinct")
    math.abs(est - n) / n.toDouble should be < (3.0 / math.sqrt(256.0))
    // denom replays from the reference registers exactly
    val regs = refRegisters(1L to n, 8)
    val expectDenom = regs.map(r => 1L << (53 - r)).sum
    row.getAs[Long]("harmonic_denom") shouldBe expectDenom
    row.getAs[Long]("n_registers_set") shouldBe regs.count(_ > 0).toLong
  }

  test("hllCorrected: linear counting takes over in the small range and " +
      "is near-exact there") {
    val df = (1L to 40L).map(i => ("g", i)).toDF("g", "id")
    val row = DistinctSketch.hllCorrected(
      DistinctSketch.hllSketch(df, "g", "id", 8), "g", 8).collect()(0)
    val corrected = row.getAs[Double]("est_corrected")
    // 40 distinct into 256 registers: LC error is a fraction of a count
    math.abs(corrected - 40.0) should be < 2.0
  }

  test("hll sketch artifact round-trips through parquet and keeps merging") {
    val dir = tmp("hll_artifact") + "/sk"
    val a = (1L to 250L).map(i => ("g", i)).toDF("g", "id")
    val b = (251L to 500L).map(i => ("g", i)).toDF("g", "id")
    DistinctSketch.hllSketch(a, "g", "id", 8)
      .write.parquet(dir)
    val merged = DistinctSketch.hllMerge(
      Seq(spark.read.parquet(dir),
        DistinctSketch.hllSketch(b, "g", "id", 8)), "g", 8)
    assertSameRows(merged,
      DistinctSketch.hllSketch(a.union(b), "g", "id", 8))
  }
}
