package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Invariants of the per-family gate split (round 10): the driver-facing
  * concatenation in [[SparkEntry]] must be lossless — no family may shadow
  * another's key, and every gated query must carry a DuckDB oracle (the
  * q181 "no_oracle" class is a standing zero).
  */
class GateFamiliesSpec extends AnyFunSuite with Matchers {

  test("family query keys are pairwise disjoint (concatenation is lossless)") {
    val perFamily = SparkEntry.families.map(_.queries.keySet)
    perFamily.map(_.size).sum shouldBe SparkEntry.queries.keySet.size
    val perFamilyOracle = SparkEntry.families.map(_.oracleSql.keySet)
    perFamilyOracle.map(_.size).sum shouldBe SparkEntry.oracleSql.keySet.size
  }

  test("every query has an oracle and every oracle has a query") {
    SparkEntry.queries.keySet shouldBe SparkEntry.oracleSql.keySet
  }

  test("each family pairs its queries with its own oracles") {
    SparkEntry.families.foreach { f =>
      f.queries.keySet shouldBe f.oracleSql.keySet
    }
  }
}
