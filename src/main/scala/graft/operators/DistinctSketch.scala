package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — cardinality estimation
  * whose result is a pure function of the data, reproducible across
  * engines.
  *
  * Spark's `approx_count_distinct` (HyperLogLog++) answers the same
  * question but its register merges depend on partitioning, so two runs —
  * let alone two engines — need not agree bit-for-bit, which makes it
  * un-oracle-able and un-diffable between pipeline versions. KMV over the
  * portable 60-bit md5 family ([[graft.functions.PortableHash]]) is
  * deterministic: keep the k smallest hashes of the distinct ids per
  * group; the k-th smallest of n uniform draws on [0, 2^60) sits near
  * k/n · 2^60, so n̂ = (k−1) · 2^60 / kth (the classic unbiased KMV
  * estimator, Bar-Yossef et al. 2002). With fewer than k distinct ids the
  * sketch IS the exact answer.
  *
  * Scale shape: the per-group k-smallest filter is a `row_number() ≤ k`
  * window, which Spark 4 rewrites to WindowGroupLimit — each map task
  * keeps only its local k smallest per group BEFORE the shuffle, so the
  * exchange carries ≤ k·partitions rows per group, never the group. The
  * preceding `distinct` is the one full-width shuffle; at 100 TB replace
  * it with the same expression over pre-bucketed ids, or drop it when ids
  * are known unique. Relative error is ~1/√k (k=64 → ~12%); k is the
  * accuracy/size dial, the shuffle shape does not change with it.
  */
object DistinctSketch {

  /** 60-bit md5 hash of the id (mirrors
    * `CAST('0x'||substr(md5(id),1,15) AS BIGINT)` in SQL).
    */
  private def hash60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-`groupCol` KMV estimate of `count(distinct idCol)`.
    *
    * Output: (groupCol, est_distinct: double, sketch_rows: bigint) —
    * `sketch_rows` = min(k, true distinct count), the sketch's fill
    * level; `est_distinct` is exact when the sketch is not full.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame =
    kmvEstimate(kmvHashes(df, groupCol, idCol, k), groupCol, k)

  /** The sketch ITSELF as data: per group, the ≤ k smallest distinct
    * hashes, one row each — a frame you can parquet out as a load's
    * sketch artifact. Sketches are MERGEABLE ([[kmvMerge]]): the sketch
    * of a union is recoverable from the sketches of the parts, so
    * per-load artifacts answer distinct-count questions over any
    * combination of loads without ever re-reading them.
    */
  def kmvHashes(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    smallestK(df
      .select(col(s"`$groupCol`"), hash60(col(s"`$idCol`")).as("__h"))
      .distinct(), groupCol, k)
  }

  /** Merge sketch frames from [[kmvHashes]]: union, dedupe (the same id
    * lands the same hash in every part), keep the k smallest per group.
    * sketch(A ∪ B) == kmvMerge(sketch(A), sketch(B)) — exactly, not
    * approximately, which is what makes the artifact regime sound.
    */
  def kmvMerge(sketches: Seq[DataFrame], groupCol: String,
      k: Int): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    require(k >= 2, s"k must be >= 2: $k")
    smallestK(sketches.reduce(_.unionByName(_)).distinct(), groupCol, k)
  }

  /** Estimate from a sketch frame (inline-built or reloaded artifact). */
  def kmvEstimate(hashes: DataFrame, groupCol: String, k: Int): DataFrame =
    hashes.groupBy(col(s"`$groupCol`"))
      .agg(count(lit(1)).as("__m"), max(col("__h")).as("__kth"))
      .select(col(s"`$groupCol`"),
        round(when(col("__m") < k, col("__m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
            col("__kth").cast("double")), 6).as("est_distinct"),
        col("__m").as("sketch_rows"))

  /** Estimate from the [[graft.functions.KmvAgg]] sketch ARRAY (the
    * aggregate/streaming face): identical formula to [[kmvEstimate]] —
    * exact below k, (k−1)·2⁶⁰/kth when full. The array is ascending,
    * so the kth value is its last element.
    */
  def kmvEstimateFromArray(arr: Column, k: Int): Column =
    round(
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
          element_at(arr, -1).cast("double")), 6)

  /** Overlap estimation from two sketch frames via inclusion–exclusion:
    * |A∩B| ≈ n̂(A) + n̂(B) − n̂(A∪B), with the union estimate off the
    * MERGED sketch ([[kmvMerge]] is exact, so n̂(A∪B) is a true KMV
    * estimate, not a heuristic). The pre-join cardinality question —
    * "how many ids do these two loads share?" — answered from per-load
    * sketch artifacts without re-reading either load. Clamped at 0
    * (inclusion–exclusion of three ±1/√k estimates can go slightly
    * negative on disjoint sets). Inner-joins on the group: a group
    * sketched on only one side has no overlap question to answer.
    */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val g = col(s"`$groupCol`")
    val ea = kmvEstimate(a, groupCol, k)
      .select(g, col("est_distinct").as("est_a"))
    val eb = kmvEstimate(b, groupCol, k)
      .select(g, col("est_distinct").as("est_b"))
    val eu = kmvEstimate(kmvMerge(Seq(a, b), groupCol, k), groupCol, k)
      .select(g, col("est_distinct").as("est_union"))
    ea.join(eb, Seq(groupCol)).join(eu, Seq(groupCol))
      .withColumn("est_intersect",
        greatest(round(col("est_a") + col("est_b") - col("est_union"), 6),
          lit(0.0)))
  }

  private def smallestK(hashes: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy(col(s"`$groupCol`")).orderBy(col("__h")))
    hashes.withColumn("__rn", rn).filter(col("__rn") <= k).drop("__rn")
  }
}
