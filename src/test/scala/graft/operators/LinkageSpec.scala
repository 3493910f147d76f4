package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._
  import Linkage.FieldRule

  test("scorePairs: agreement/disagreement weights, nulls carry zero " +
      "evidence, levenshtein band") {
    val pairs = Seq(
      ("ann", "ann", Some(10L), Some(10L)),  // both agree: 300 + 100
      ("ann", "anx", Some(10L), Some(11L)),  // lev 1 agrees, bal no: 300-50
      ("ann", "xyz", Some(10L), Some(10L)),  // lev 3 no, bal yes: -200+100
      ("ann", null, Some(10L), None))        // both null-sided: 0 + 0
      .toDF("l_name", "r_name", "l_bal", "r_bal")
    Linkage.scorePairs(pairs, Seq(
        FieldRule("l_name", "r_name", 300L, -200L, "levenshtein", 1),
        FieldRule("l_bal", "r_bal", 100L, -50L)))
      .select($"match_score").as[Long].collect() shouldBe
      Array(400L, 250L, -100L, 0L)
  }

  test("linkTable: blocked pairs only, thresholds split match/possible, " +
      "sub-lower pairs dropped") {
    val left = Seq((1L, "b1", "ann", 10L), (2L, "b1", "bob", 20L),
      (3L, "b2", "cat", 30L)).toDF("l_id", "blk", "l_name", "l_bal")
    val right = Seq((11L, "b1", "ann", 10L), (12L, "b1", "zzz", 99L),
      (13L, "b3", "cat", 30L)).toDF("r_id", "blk", "r_name", "r_bal")
    val got = Linkage.linkTable(left, right, Seq("blk"), Seq(
        FieldRule("l_name", "r_name", 300L, -200L),
        FieldRule("l_bal", "r_bal", 100L, -50L)),
        upper = 350L, lower = 0L)
      .select($"l_id", $"r_id", $"match_score", $"decision")
      .as[(Long, Long, Long, String)].collect().sortBy(t => (t._1, t._2))
    // (1,11): 400 match; (1,12)/(2,11): -250 dropped; (2,12): -250
    // dropped; block b2/b3 never pair despite identical fields
    got shouldBe Array((1L, 11L, 400L, "match"))
    // lowering the floor surfaces the possibles
    Linkage.linkTable(left, right, Seq("blk"), Seq(
        FieldRule("l_name", "r_name", 300L, -200L)),
        upper = 300L, lower = -1000L)
      .filter($"decision" === "possible").count() shouldBe 3L
  }

  test("linkage plan: one blocking equi-join, no all-pairs product") {
    val left = Seq((1L, "b", "x")).toDF("l_id", "blk", "l_name")
    val right = Seq((2L, "b", "x")).toDF("r_id", "blk", "r_name")
    val plan = Linkage.linkTable(left, right, Seq("blk"),
        Seq(FieldRule("l_name", "r_name", 1L, -1L)), 1L, 0L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
