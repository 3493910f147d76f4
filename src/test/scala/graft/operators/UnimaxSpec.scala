package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UniMax waterfill allocation ([[Sampling.unimaxAllocate]] /
  * [[Sampling.unimaxSelect]], gates q269/q270): the ascending-cap
  * prefix rule, budget conservation, equal uncapped shares, and
  * select-face identity to a driver-computed naive waterfill.
  */
class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(rows: Seq[(Long, String, Long)], b: Long, e: Int) =
    Sampling.unimaxAllocate(
      rows.toDF("id", "g", "w"), "g", "w", b, e)
      .select($"g", $"group_weight", $"cap", $"allocated", $"epochs")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("mixed capped/uncapped: caps bind small groups, the rest share " +
      "the waterline") {
    // weights a=10 b=20 c=100, E=2 -> caps 20/40/200; B=100:
    // a capped (20*3 <= 100), b capped (40*2 <= 80), c gets the rest
    val m = alloc(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 100L)),
      b = 100L, e = 2)
    m("a") shouldBe ("a", 10L, 20L, 20.0, 2.0)
    m("b") shouldBe ("b", 20L, 40L, 40.0, 2.0)
    m("c") shouldBe ("c", 100L, 200L, 40.0, 0.4)
  }

  test("budget above total caps: every group contributes maxEpochs") {
    val m = alloc(Seq((1L, "a", 10L), (2L, "b", 20L)), b = 1000L, e = 3)
    m("a")._4 shouldBe 30.0
    m("b")._4 shouldBe 60.0
    m.values.map(_._5).toSet shouldBe Set(3.0)
  }

  test("budget below every cap: pure equal split, no group capped") {
    val m = alloc(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 100L)),
      b = 30L, e = 2)
    m.values.map(_._4).toSet shouldBe Set(10.0)
    m("b")._5 shouldBe 0.5
  }

  test("zero-weight group: allocated 0, epochs 0, nothing selected") {
    val df = Seq((1L, "a", 0L), (2L, "b", 5L)).toDF("id", "g", "w")
    val m = alloc(Seq((1L, "a", 0L), (2L, "b", 5L)), b = 100L, e = 1)
    m("a") shouldBe ("a", 0L, 0L, 0.0, 0.0)
    Sampling.unimaxSelect(df, "id", "g", "w", 100L, 1)
      .select($"id").as[Long].collect().toSet shouldBe Set(2L)
  }

  test("invariants on a skewed corpus: conservation, cap bound, one " +
      "waterline, capped set is the ascending-cap prefix") {
    val rows = (1L to 4000L).map { i =>
      (i, s"src${i % 13}", (i * 17 % 50) + 1)
    }
    val b = 60000L
    val m = alloc(rows, b, e = 3)
    val caps = m.values.map(_._3).sum
    // conservation: allocations spend min(B, sum caps) (up to the
    // report's round-to-6 on each of the uncapped shares)
    m.values.map(_._4).sum shouldBe math.min(b, caps).toDouble +- 1e-3
    // no group exceeds its cap (rounded report values)
    m.values.foreach { case (_, _, cap, a, _) =>
      a should be <= cap.toDouble + 1e-6 }
    // uncapped groups share ONE waterline, above every capped cap
    val capped = m.values.filter(v => v._4 == v._3.toDouble)
    val un = m.values.filterNot(v => v._4 == v._3.toDouble)
    un.map(_._4).toSet.size should be <= 1
    for (t <- un.headOption.map(_._4); c <- capped.map(_._3))
      t should be >= c.toDouble
  }

  test("select face matches the driver-computed naive waterfill + " +
      "running-sum window") {
    val df = (1L to 3000L).map { i =>
      (i, s"src${i % 9}", (i * 13 % 40) + 1)
    }.toDF("id", "g", "w")
    val (b, e) = (30000L, 2)
    // naive waterfill on collected group sums — same exact arithmetic:
    // BIGINT prefix test, one IEEE division for the waterline. NOTE:
    // prior accumulates ALL preceding caps, capped or not — that is
    // what makes cap·remaining + prior nondecreasing along the
    // ascending-cap order (so the capped set is a prefix); adding only
    // capped caps lets the test flip back to true at the tail and
    // wrongly "caps" the LARGEST groups
    val sizes = df.groupBy($"g").agg(sum($"w").as("gw"))
      .as[(String, Long)].collect().sortBy(x => (x._2 * e, x._1))
    val n = sizes.length
    var prior = 0L
    val cappedSet = scala.collection.mutable.Set[String]()
    for (((g, gw), i) <- sizes.zipWithIndex) {
      val cap = gw * e
      if (cap * (n - i) <= b - prior) cappedSet += g
      prior += cap
    }
    val cappedSum = sizes.collect {
      case (g, gw) if cappedSet(g) => gw * e }.sum
    val t = (b - cappedSum).toDouble / (n - cappedSet.size).toDouble
    val budget = sizes.map { case (g, gw) =>
      g -> (if (cappedSet(g)) (gw * e).toDouble else t) }.toMap
    val W = org.apache.spark.sql.expressions.Window
    val naive = df
      .join(budget.toSeq.toDF("g", "bud"), Seq("g"))
      .withColumn("bkt", Sampling.hashBucket($"id"))
      .withColumn("cb", sum($"w".cast("double")).over(
        W.partitionBy($"g").orderBy($"bkt", $"id")) - $"w")
      .filter($"cb" < $"bud")
      .select($"id").as[Long].collect().toSet
    Sampling.unimaxSelect(df, "id", "g", "w", b, e)
      .select($"id").as[Long].collect().toSet shouldBe naive
  }
}
