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

  // -------------------------------------------------------------------- HLL

  /** Per-group HyperLogLog registers over the portable hash family
    * ([[graft.functions.HllAgg]]): the fixed-2^p-byte sibling of
    * [[kmvHashes]] — unlike Spark's built-in `approx_count_distinct`
    * (HLL++), whose register merges are not bit-reproducible across
    * partitionings, these registers are a pure per-id function max-merged,
    * so the sketch (and its estimate) replays exactly in the oracle. No
    * pre-`distinct` needed: duplicate ids land identical (idx, ρ) pairs
    * and max() absorbs them — ONE narrow aggregation, no distinct
    * shuffle, which is the 100 TB advantage over the KMV path.
    *
    * Output: (groupCol, registers: array<int> of length 2^p).
    */
  def hllSketch(df: DataFrame, groupCol: String, idCol: String,
      p: Int): DataFrame =
    df.groupBy(col(s"`$groupCol`"))
      .agg(graft.functions.HllAgg
        .hllSketch(hash60(col(s"`$idCol`")), p).as("registers"))

  /** Max-merge register frames from [[hllSketch]]:
    * sketch(A ∪ B) == hllMerge(sketch(A), sketch(B)) exactly (register
    * max is associative/commutative/idempotent), so per-load artifacts
    * answer cross-load distinct counts without re-reading any load.
    * Groups missing from one side keep the other side's registers.
    */
  def hllMerge(sketches: Seq[DataFrame], groupCol: String,
      p: Int): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    val m = 1 << p
    val empty = array_repeat(lit(0), m)
    sketches.reduce { (a, b) =>
      a.select(col(s"`$groupCol`"), col("registers").as("__ra"))
        .join(b.select(col(s"`$groupCol`"), col("registers").as("__rb")),
          Seq(groupCol), "full_outer")
        .select(col(s"`$groupCol`"),
          zip_with(coalesce(col("__ra"), empty),
            coalesce(col("__rb"), empty),
            (x, y) => greatest(x, y)).as("registers"))
    }
  }

  /** The gated estimate constant α_m·m²·2^(Q+1) for precision `p`
    * (Q = 60−p): embedded as a decimal literal in the oracle SQL
    * (shortest round-trip repr, so DuckDB parses back the identical
    * double) — no cross-engine arithmetic-order concerns.
    */
  def hllAlphaM2Q(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1 + 1.079 / m) * m * m * math.pow(2.0, 61 - p)
  }

  /** Raw HLL estimate from a register array, cross-engine exact: the
    * harmonic denominator Σ 2^(Q+1−M_j) accumulates as a BIGINT (fixed
    * point — p ≥ 8 keeps every term ≤ 2^53 and the sum ≤ 2^61, so there
    * is no float-summation order to disagree on), and the estimate is
    * one correctly-rounded double division. The small-range
    * linear-counting branch is deliberately NOT here (`ln` is libm, not
    * bit-portable) — see [[hllCorrected]].
    */
  def hllEstimateFromArray(arr: Column, p: Int): Column =
    round(lit(hllAlphaM2Q(p)) / harmonicDenom(arr, p).cast("double"), 4)

  /** Exact fixed-point Σ 2^(Q+1−M_j) as a BIGINT: register values index a
    * powers-of-two literal array (Spark's `shiftleft` wants a literal
    * shift count; the lookup is branch-free and codegen-friendly).
    */
  private def harmonicDenom(arr: Column, p: Int): Column = {
    val q1 = 61 - p
    val powers = array((0 to q1).map(i => lit(1L << (q1 - i))): _*)
    aggregate(arr, lit(0L), (acc, r) => acc + element_at(powers, r + 1))
  }

  /** Estimate report from a sketch frame (inline-built or reloaded
    * artifact): (group, n_registers_set, harmonic_denom, est_distinct).
    * `harmonic_denom` is the exact fixed-point BIGINT (the integer the
    * estimate derives from — the oracle pins it too, so a register-level
    * divergence cannot hide behind the rounded double).
    */
  def hllEstimate(sketch: DataFrame, groupCol: String, p: Int): DataFrame = {
    val s = harmonicDenom(col("registers"), p)
    sketch.select(col(s"`$groupCol`"),
      size(filter(col("registers"), r => r > 0)).cast("long")
        .as("n_registers_set"),
      s.as("harmonic_denom"),
      hllEstimateFromArray(col("registers"), p).as("est_distinct"))
  }

  /** Library-side corrected estimate (NOT gated — `ln` is libm): the
    * standard small-range linear-counting branch, m·ln(m/V) when the raw
    * estimate is under 2.5m and empty registers remain (Flajolet et al.
    * §4); the raw branch otherwise.
    */
  def hllCorrected(sketch: DataFrame, groupCol: String, p: Int): DataFrame = {
    val m = (1 << p).toDouble
    val est = hllEstimate(sketch, groupCol, p)
    val zeros = lit(m) - col("n_registers_set").cast("double")
    est.withColumn("est_corrected",
      when(col("est_distinct") <= lit(2.5 * m) && zeros > 0,
        round(lit(m) * log(lit(m) / zeros), 4))
        .otherwise(col("est_distinct")))
  }
}
