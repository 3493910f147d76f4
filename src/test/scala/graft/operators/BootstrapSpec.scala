package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic bootstrap resampling ([[Sampling.bootstrapReplicas]],
  * gate q276): Poisson draw distribution, replica-index shape,
  * replayability, and tag independence.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 20000L).toDF("id")

  test("cutoffs quantize the Poisson CDF: lambda=1 head probabilities") {
    val cuts = Sampling.poissonCutoffs(1.0, 8)
    cuts.length shouldBe 8
    // P(X<=0)=P(X<=1)-P(1)=e^-1=0.367879..., P(X<=1)=0.735758...
    cuts.head shouldBe 367879L
    cuts(1) shouldBe 735758L
    cuts shouldBe cuts.sorted
  }

  test("draw distribution matches the Poisson pmf on 20k ids") {
    val counts = Sampling.bootstrapReplicas(ids, "id", 1.0)
      .groupBy($"id").agg(max($"replica").as("k"))
      .groupBy($"k").count().as[(Int, Long)].collect().toMap
    val n = 20000.0
    val e = math.exp(-1.0)
    // zero-draw rows vanish: ~e^-1 of ids absent
    val absent = n - counts.values.sum
    absent / n shouldBe e +- 0.02
    counts(1) / n shouldBe e +- 0.02
    counts(2) / n shouldBe e / 2 +- 0.01
    // mean replica count over all ids ~ lambda
    val total = counts.map { case (k, c) => k * c }.sum
    total / n shouldBe 1.0 +- 0.03
  }

  test("replica indexes are 1..k contiguous and runs replay exactly") {
    val a = Sampling.bootstrapReplicas(ids, "id", 0.7, tag = "t")
    val bad = a.groupBy($"id")
      .agg(count(lit(1)).as("n"), max($"replica").as("mx"),
        min($"replica").as("mn"))
      .filter($"n" =!= $"mx" || $"mn" =!= 1).count()
    bad shouldBe 0L
    val b = Sampling.bootstrapReplicas(ids.repartition(7), "id", 0.7,
      tag = "t")
    a.as[(Long, Int)].collect().toSet shouldBe
      b.as[(Long, Int)].collect().toSet
  }

  test("different tags draw independently") {
    def kOf(tag: String) = Sampling.bootstrapReplicas(ids, "id", 1.0, tag)
      .groupBy($"id").agg(max($"replica").as("k"))
      .as[(Long, Int)].collect().toMap
    val (k0, k1) = (kOf("b0"), kOf("b1"))
    // the two replicate sets must disagree on a substantial share of ids
    val all = (k0.keySet ++ k1.keySet)
    val differ = all.count(i => k0.getOrElse(i, 0) != k1.getOrElse(i, 0))
    differ.toDouble / 20000.0 should be > 0.3
  }
}
