package graft

/** Executable versions of the PLANS.md audits: the plan properties that
  * make these queries scale are asserted here, so a regression (a filter
  * that stops reaching the scan, a join that degrades to an all-pairs
  * product, a window that collapses to one task) fails the suite instead
  * of silently surviving until someone re-reads an explain dump.
  */
class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: partition criteria reach the parquet scan as pushed filters") {
    val p = plan("q02_partition_filter")
    p should include("PushedFilters")
    // the OR-of-ANDs arrived at the source, not as a post-scan Filter only
    p should include regex "PushedFilters: \\[.*l_returnflag.*\\]"
  }

  test("q06: column pruning — the scan reads only the needed columns") {
    val p = plan("q06_revenue_forecast")
    p should include("ReadSchema")
    // 4 of 11 lineitem columns
    p should include regex
      "ReadSchema: struct<l_quantity.*l_extendedprice.*l_discount.*l_shipdate"
    (p should not).include("l_orderkey")
  }

  test("q05: all four dimensions broadcast; the fact is never re-shuffled") {
    val p = plan("q05_region_revenue")
    "BroadcastHashJoin".r.findAllIn(p).size should be >= 4
    (p should not).include("SortMergeJoin")
  }

  test("q39: no all-pairs product anywhere in the dedup plan") {
    val p = plan("q39_embedding_dedup")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q49: the prefix sum plans no single-partition global window") {
    (plan("q49_sequence_packing") should not).include("SinglePartition")
  }
}
