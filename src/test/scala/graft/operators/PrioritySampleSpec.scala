package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def u(id: Long): Double =
    (PortableHash.md5Long60(id.toString) + 1).toDouble /
      1152921504606846976.0 // 2^60

  test("prioritySample: exact size k per group, τ = (k+1)-th priority, " +
      "estimator max(w, τ), small groups pass through exactly") {
    val rows = (1L to 40L).map(i => (i, "big", (i % 7 + 1) * 100.0)) ++
      Seq((101L, "small", 500.0), (102L, "small", 300.0))
    val df = rows.toDF("id", "grp", "w")
    val k = 10
    val out = Sampling.prioritySample(df, "id", "grp", "w", k)
      .as[(String, Long, Double, Double)].collect()

    // exact sizes: min(k, |group|)
    out.count(_._1 == "big") shouldBe k
    out.count(_._1 == "small") shouldBe 2

    // reference computation: top-k by q = w/u desc (id tiebreak), τ = the
    // (k+1)-th priority
    val qs = rows.filter(_._2 == "big")
      .map { case (id, _, w) => (id, w, w / u(id)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val expectIds = qs.take(k).map(_._1).toSet
    out.filter(_._1 == "big").map(_._2).toSet shouldBe expectIds
    val tau = qs(k)._3
    out.filter(_._1 == "big").foreach { case (_, id, w, est) =>
      val expect = math.max(w, tau)
      est shouldBe (math.rint(expect * 1e6) / 1e6 +- 1e-9)
      est should be >= w // the DLT estimator never shrinks a kept weight
    }
    // group smaller than k+1: no τ, the sample is the group, ŵ = w exact
    out.filter(_._1 == "small").foreach { case (_, _, w, est) =>
      est shouldBe w
    }
  }

  test("prioritySample: selection shuffles narrow rows only (payload " +
      "columns projected away before the rank window)") {
    val df = (1L to 100L)
      .map(i => (i, "g", 1.0 + i, "x" * 10)).toDF("id", "grp", "w", "text")
    val out = Sampling.prioritySample(df, "id", "grp", "w", 5)
    out.columns.toSeq shouldBe Seq("grp", "id", "weight", "est_weight")
    // the physical plan's exchange carries only the narrow projection:
    // no `text` attribute at or below the window's shuffle
    val plan = out.queryExecution.executedPlan.toString
    plan should include ("Exchange") // the rank window does shuffle…
    plan.split("Exchange").drop(1).foreach { post =>
      post should not include "text#" // …but never the payload
    }
    out.count() shouldBe 5
  }
}
