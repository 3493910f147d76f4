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
    // customer carries no broadcast() hint (it grows with sf) — this
    // asserts size-based planning still picks broadcast for all four dims
    val p = plan("q05_region_revenue")
    "BroadcastHashJoin".r.findAllIn(p).size should be >= 4
    (p should not).include("SortMergeJoin")
  }

  test("q03: unhinted customer still broadcasts via size-based planning") {
    val p = plan("q03_top_revenue_orders")
    "BroadcastHashJoin".r.findAllIn(p).size should be >= 1
    (p should not).include("SortMergeJoin")
  }

  test("q39: no all-pairs product anywhere in the dedup plan") {
    val p = plan("q39_embedding_dedup")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q44-q46: unhinted dims still broadcast when actually small " +
      "(size-based planning, no forced hint on scale-growing tables)") {
    // customer/supplier/part carry no broadcast() hint anymore (they grow
    // with sf — a forced hint would OOM at 100x); Spark's size estimate /
    // AQE must still pick broadcast joins at this scale
    Seq("q44_returned_customers", "q45_trade_flows", "q46_market_share")
      .foreach { q =>
        val p = plan(q)
        withClue(q) {
          "BroadcastHashJoin".r.findAllIn(p).size should be >= 3
          (p should not).include("SortMergeJoin")
        }
      }
  }

  test("q49: the prefix sum plans no single-partition global window") {
    (plan("q49_sequence_packing") should not).include("SinglePartition")
  }

  test("q53: the benchmark shingle set is the broadcast side — the corpus " +
      "is never shuffled for candidate generation") {
    val p = plan("q53_decontaminate")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("q56: the training-order shuffle plans no single-task global sort") {
    (plan("q56_corpus_shuffle") should not).include("SinglePartition")
  }

  test("q63: event-type filters reach the scan; the interval join is an " +
      "equi-join on the key with the time range as residual, never a " +
      "nested-loop product") {
    val p = plan("q63_interval_join")
    p should include regex "PushedFilters: \\[.*event_type,purchase.*\\]"
    p should include regex "PushedFilters: \\[.*event_type,click.*\\]"
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }

  test("q64: cluster dedup plans no all-pairs product and drops " +
      "non-representatives with an anti join") {
    val p = plan("q64_dedup_clusters")
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
    p should include("LeftAnti")
  }

  test("q151: the transition matrix's from-totals join is a broadcast, " +
      "and no all-pairs product appears") {
    val p = plan("q151_transition_matrix")
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("q154: the metadata-clash audit shuffles digests, never bodies — " +
      "the text column stays out of every exchange") {
    val p = plan("q154_metadata_clash")
    // every Exchange row must carry only digest/attr/count columns
    p.linesIterator.filter(_.contains("Exchange")).foreach { l =>
      withClue(l) { l should not include "text#" }
    }
  }

  test("q157: novelty's reference match is a hash equi-join on the " +
      "shingle hash, never a nested-loop product") {
    val p = plan("q157_novelty")
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }

  test("packing: slice offsets stay a broadcast join, not a CASE chain, " +
      "at production slice counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Packing
    // 1024 slices used to generate a 1024-deep nested-when expression —
    // past Janino's 64KB method limit at real shuffle-partition counts,
    // falling out of whole-stage codegen. The offsets must arrive via a
    // broadcast join (one BroadcastExchange, zero CASE WHEN) and the
    // arithmetic must stay integer-exact.
    val docs = (1L to 2000L).map(i => (i, (i % 53 + 1).toInt)).toDF("id", "n")
    val packed = Packing.withChunkIds(docs, "id", "n", budgetTokens = 257,
      slices = 1024)
    val out = packed.frame
    val p = out.queryExecution.executedPlan.toString
    (p should not).include("CASE WHEN")
    p should include("BroadcastExchange")
    val got = out.select(col("id"), col("chunk_id"), col("offset_in_chunk"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    val exp = (1L to 2000L).map { i =>
      val before = cum; cum += (i % 53 + 1)
      (i, before / 257, before % 257)
    }
    got shouldBe exp.toArray
    packed.release()
  }

  test("q284: the HLL sketch is ONE narrow aggregation — no distinct " +
      "pre-shuffle, no window (the 100 TB edge over the KMV path)") {
    val p = plan("q284_hll_distinct")
    (p should not).include("Window")
    // exactly one aggregation pair (partial + final) over the scan: a
    // pre-distinct would add a second HashAggregate/Exchange layer
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    (p should not).include("CartesianProduct")
  }

  test("q40/q291: the as-of fill is JOIN-FREE — one union, one window, " +
      "no join node of any kind") {
    for (q <- Seq("q40_asof_join", "q291_asof_forward")) {
      val p = plan(q)
      (p should not).include("Join")
      (p should not).include("CartesianProduct")
    }
  }

  test("q287/q288: range joins are bucket EQUI-joins — the non-equi " +
      "predicate never degrades to a nested-loop product") {
    for (q <- Seq("q287_range_join_points", "q288_interval_overlap")) {
      val p = plan(q)
      (p should not).include("BroadcastNestedLoopJoin")
      (p should not).include("CartesianProduct")
    }
  }

  test("q289: both interval-merge window steps share ONE sort (single " +
      "window exchange before the island aggregate)") {
    val p = plan("q289_merge_intervals")
    "Window".r.findAllIn(p).size should be >= 1
    // one exchange for the windows + one for the (key, island) aggregate
    "Exchange hashpartitioning".r.findAllIn(p).size should be <= 2
    (p should not).include("CartesianProduct")
  }

  test("q292: the bucketed as-of shuffles summaries, not a second copy " +
      "of the data — no join on the two data sides, no product") {
    val p = plan("q292_asof_bucketed")
    // the only joins are the bucket-seed plumbing over per-bucket
    // SUMMARIES (allBuckets left-join perBucket); never a nested loop
    (p should not).include("BroadcastNestedLoopJoin")
    (p should not).include("CartesianProduct")
  }
}
