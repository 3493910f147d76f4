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
}
