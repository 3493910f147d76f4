package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic fact rows: (key, long measure)
  private def fact(n: Int): DataFrame =
    (1 to n).map(i => (s"k${i % 5}", (i * 37 % 101).toLong, i.toLong))
      .toDF("k", "m", "id")

  private def recompute(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("m").as("sum_m"))

  test("refresh with inserts+deletes equals a full recompute") {
    val all = fact(200)
    val base = all.filter($"id" % 3 =!= 0)
    val inserts = all.filter($"id" % 3 === 0).withColumn("w", lit(1L))
    val deletes = base.filter($"id" % 11 === 0).withColumn("w", lit(-1L))
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"))
    val got = IncrementalAgg.refresh(state, inserts.unionByName(deletes),
      Seq("k"), Seq("m"), weightCol = Some("w"))
    val want = recompute(
      all.filter(!($"id" % 3 =!= 0 && $"id" % 11 === 0)))
    assertSameRows(got.select("k", "n_rows", "sum_m"), want)
  }

  test("a fully-retracted group leaves the view") {
    val base = Seq(("solo", 5L, 1L), ("keep", 7L, 2L)).toDF("k", "m", "id")
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"))
    val del = Seq(("solo", 5L, 1L)).toDF("k", "m", "id")
      .withColumn("w", lit(-1L))
    val got = IncrementalAgg.refresh(state, del, Seq("k"), Seq("m"),
      weightCol = Some("w"))
    assert(got.select("k").as[String].collect().toSeq === Seq("keep"))
  }

  test("refresh is associative: one big delta equals two sequential ones") {
    val all = fact(120)
    val base = all.filter($"id" <= 40)
    val d1 = all.filter($"id" > 40 && $"id" <= 80).withColumn("w", lit(1L))
    val d2 = all.filter($"id" > 80).withColumn("w", lit(1L))
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"))
    val oneShot = IncrementalAgg.refresh(state, d1.unionByName(d2),
      Seq("k"), Seq("m"), weightCol = Some("w"))
    val twoStep = IncrementalAgg.refresh(
      IncrementalAgg.refresh(state, d1, Seq("k"), Seq("m"),
        weightCol = Some("w")),
      d2, Seq("k"), Seq("m"), weightCol = Some("w"))
    assertSameRows(oneShot, twoStep)
    assertSameRows(oneShot.select("k", "n_rows", "sum_m"), recompute(all))
  }

  test("min/max maintained for insert-only deltas; rejected with weights") {
    val base = fact(50)
    val delta = fact(80).filter($"id" > 50)
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"),
      minCols = Seq("m"), maxCols = Seq("m"))
    val got = IncrementalAgg.refresh(state, delta, Seq("k"), Seq("m"),
      minCols = Seq("m"), maxCols = Seq("m"))
    val want = fact(80).groupBy("k").agg(count(lit(1)).as("n_rows"),
      sum("m").as("sum_m"), min("m").as("min_m"), max("m").as("max_m"))
    assertSameRows(got, want)
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(state, delta.withColumn("w", lit(-1L)),
        Seq("k"), Seq("m"), minCols = Seq("m"), weightCol = Some("w"))
    }
    assert(e.getMessage.contains("not retractable"))
  }

  test("serve derives exact averages from sum/count") {
    val base = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("b", 5L, 3L))
      .toDF("k", "m", "id")
    val served = IncrementalAgg.serve(
      IncrementalAgg.init(base, Seq("k"), Seq("m")), Seq("m"))
    val got = served.select("k", "avg_m").as[(String, Double)]
      .collect().toMap
    assert(got === Map("a" -> 15.0, "b" -> 5.0))
  }

  test("refresh plan shuffles partials, not delta rows: union of two " +
      "pre-aggregated sides") {
    val all = fact(200)
    val state = IncrementalAgg.init(all.filter($"id" <= 100), Seq("k"),
      Seq("m"))
    val plan = IncrementalAgg.refresh(state,
      all.filter($"id" > 100).withColumn("w", lit(1L)),
      Seq("k"), Seq("m"), weightCol = Some("w"))
      .queryExecution.executedPlan.toString
    // both union inputs carry partial_sum before the final exchange —
    // the delta is map-side combined, never shuffled row-by-row
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"expected partial aggregation below the union:\n$plan")
  }

  test("refreshFromChanges folds a CDC feed: update retracts preimage " +
      "and adds postimage, matching a full recompute") {
    val state = IncrementalAgg.init(
      Seq(("a", 10L, 1L), ("a", 20L, 2L), ("b", 5L, 3L))
        .toDF("k", "m", "id"), Seq("k"), Seq("m"))
    // id=2 moves 20→25 (update), id=3 deleted, id=4 inserted under "a"
    val feed = Seq(
      ("update_preimage", "a", 20L, 2L),
      ("update_postimage", "a", 25L, 2L),
      ("delete", "b", 5L, 3L),
      ("insert", "a", 7L, 4L)
    ).toDF("change_type", "k", "m", "id")
    val got = IncrementalAgg.refreshFromChanges(state, feed, Seq("k"),
      Seq("m"))
    val want = recompute(Seq(("a", 10L, 1L), ("a", 25L, 2L), ("a", 7L, 4L))
      .toDF("k", "m", "id"))
    assertSameRows(got.select("k", "n_rows", "sum_m"), want)
  }

  test("refreshFromChanges raises on an unknown change_type") {
    val state = IncrementalAgg.init(
      Seq(("a", 1L, 1L)).toDF("k", "m", "id"), Seq("k"), Seq("m"))
    val bad = Seq(("upsert", "a", 2L, 2L)).toDF("change_type", "k", "m", "id")
    val e = intercept[Exception] {
      IncrementalAgg.refreshFromChanges(state, bad, Seq("k"), Seq("m"))
        .collect()
    }
    assert(e.getMessage.contains("unknown change_type")
      || Option(e.getCause).exists(_.getMessage.contains(
        "unknown change_type")))
  }

  test("refreshWithRecompute: a delete that removes a group's max " +
      "recomputes it from the touched group only") {
    val base = Seq(
      ("a", 10L, 1L), ("a", 90L, 2L), ("a", 40L, 3L),
      ("b", 7L, 4L), ("b", 3L, 5L)).toDF("k", "m", "id")
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"),
      minCols = Seq("m"), maxCols = Seq("m"))
    // delete a's max (90) and its min (10); insert a 55
    val delta = Seq(
      ("a", 90L, 2L, -1L), ("a", 10L, 1L, -1L), ("a", 55L, 6L, 1L)
    ).toDF("k", "m", "id", "w")
    val newBase = Seq(
      ("a", 40L, 3L), ("a", 55L, 6L), ("b", 7L, 4L), ("b", 3L, 5L)
    ).toDF("k", "m", "id")
    val got = IncrementalAgg.refreshWithRecompute(state, delta, newBase,
      Seq("k"), Seq("m"), Seq("m"), Seq("m"), Some("w"))
    val want = newBase.groupBy("k").agg(
      count(lit(1)).as("n_rows"), sum("m").as("sum_m"),
      min("m").as("min_m"), max("m").as("max_m"))
    assertSameRows(
      got.select("k", "n_rows", "sum_m", "min_m", "max_m"), want)
  }

  test("refreshWithRecompute keeps NULL-keyed groups: the key joins are " +
      "null-safe whether or not the delta touches the NULL group") {
    val base = Seq((Some("a"), 10L, 1L), (None, 7L, 2L), (None, 3L, 3L),
      (Some("b"), 5L, 4L)).toDF("k", "m", "id")
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"),
      maxCols = Seq("m"))
    // case 1: delta does NOT touch the NULL group — it must survive
    val d1 = Seq((Some("a"), 20L, 5L, 1L)).toDF("k", "m", "id", "w")
    val nb1 = base.unionByName(d1.drop("w"))
    val got1 = IncrementalAgg.refreshWithRecompute(state, d1, nb1,
      Seq("k"), Seq("m"), Seq.empty, Seq("m"), Some("w"))
    assertSameRows(got1.select("k", "n_rows", "sum_m", "max_m"),
      nb1.groupBy("k").agg(count(lit(1)).as("n_rows"),
        sum("m").as("sum_m"), max("m").as("max_m")))
    // case 2: delta DELETES the NULL group's max — it must recompute
    val d2 = Seq((Option.empty[String], 7L, 2L, -1L))
      .toDF("k", "m", "id", "w")
    val nb2 = base.filter($"id" =!= 2L)
    val got2 = IncrementalAgg.refreshWithRecompute(state, d2, nb2,
      Seq("k"), Seq("m"), Seq.empty, Seq("m"), Some("w"))
    assertSameRows(got2.select("k", "n_rows", "sum_m", "max_m"),
      nb2.groupBy("k").agg(count(lit(1)).as("n_rows"),
        sum("m").as("sum_m"), max("m").as("max_m")))
  }

  test("refreshWithRecompute plan: base scan is semi-join-pruned on the " +
      "broadcast touched-key set; untouched groups never read the base") {
    val base = fact(500)
    val state = IncrementalAgg.init(base, Seq("k"), Seq("m"),
      maxCols = Seq("m"))
    val delta = base.filter($"k" === "k1" && $"id" % 7 === 0)
      .withColumn("w", lit(-1L))
    val newBase = base.except(delta.drop("w"))
    val plan = IncrementalAgg.refreshWithRecompute(state, delta, newBase,
      Seq("k"), Seq("m"), Seq.empty, Seq("m"), Some("w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi-pruned recompute + anti-pruned state carry:\n$plan")
    assert(plan.contains("Broadcast"),
      s"touched-key set must broadcast, not shuffle the base:\n$plan")
    // behavior: untouched group k2's max survives verbatim from state
    val got = IncrementalAgg.refreshWithRecompute(state, delta, newBase,
      Seq("k"), Seq("m"), Seq.empty, Seq("m"), Some("w"))
    val want = newBase.groupBy("k").agg(count(lit(1)).as("n_rows"),
      sum("m").as("sum_m"), max("m").as("max_m"))
    assertSameRows(got.select("k", "n_rows", "sum_m", "max_m"), want)
  }
}
