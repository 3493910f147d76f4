package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed range joins: point-in-interval and interval-overlap joins
  * without a cartesian product, plus the interval-merge (gaps-and-islands)
  * flatten. An extension family — Spark plans a non-equi join condition as
  * BroadcastNestedLoopJoin (all-pairs against the broadcast side) and the
  * reference has no temporal-join operator at all.
  *
  * The device is the standard spatial-binning one: quantize the range
  * dimension into fixed-width buckets, explode each interval to the
  * buckets it covers, and equi-join on the bucket id (plus any key
  * columns), so Catalyst plans an ordinary hash/sort-merge join; the exact
  * range predicate then filters the bucket-local candidates. Candidate
  * volume is sum over buckets of |points_b| × |intervals_b| — local
  * density, never |points| × |intervals|. Each (point, interval) pair
  * meets in exactly one bucket (the point's), so no dedup is needed;
  * overlap pairs dedup on the deterministic "first shared bucket" rule.
  *
  * Bucket width is the operator's one tuning knob: ~the median interval
  * length is right (intervals then explode to ~2 buckets). A width far
  * below the interval length multiplies the explode; far above it
  * degrades candidate locality. [[assertMaxSpan]] fails fast on the
  * former instead of silently materializing a giant explode.
  *
  * All range columns are integer-typed (epoch days/seconds/micros or any
  * long dimension); callers cast dates/timestamps first, which keeps the
  * bucket arithmetic exact (`div`, not double division).
  */
object RangeJoin {

  /** Exact floor-division of a long column by a positive width: subtract
    * the non-negative `pmod` remainder, then integral `div` — no double
    * rounding at any magnitude.
    */
  def floorDiv(c: Column, width: Long): Column =
    call_function("div", c - pmod(c, lit(width)), lit(width)).cast("long")

  /** Per-row fail-fast guard: interval well-formed (lo <= hi) and its
    * bucket span bounded. `assert_true` must survive column pruning, so it
    * is applied as an always-true filter, not a dropped column. NULL
    * endpoints are dropped FIRST (a null bound can never satisfy
    * lo <= point <= hi, so the plain inequality join these operators are
    * equivalent to excludes such rows silently — raising on them would
    * diverge from the contract, and null points already fall out of the
    * bucket equi-join the same way).
    */
  private def assertMaxSpan(df: DataFrame, loCol: String, hiCol: String,
      width: Long, maxBuckets: Int): DataFrame =
    df.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .filter(assert_true(
        col(loCol) <= col(hiCol) &&
          floorDiv(col(hiCol), width) - floorDiv(col(loCol), width)
            < lit(maxBuckets.toLong),
        concat(lit(s"RangeJoin: interval [$loCol, $hiCol] malformed or spans "
          + s">= $maxBuckets buckets at width $width on row lo="),
          col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string"))
      ).isNull)

  /** Join points to the intervals containing them: every (point, interval)
    * pair with lo <= point <= hi (or < hi when `inclusiveEnd` is false),
    * equal on `keyCols` when given. Output: all point columns, then all
    * interval columns (names must not collide except `keyCols`).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, bucketWidth: Long,
      keyCols: Seq[String] = Nil, inclusiveEnd: Boolean = true,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth: $bucketWidth")
    val p = points.withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    val iv = assertMaxSpan(intervals, loCol, hiCol, bucketWidth,
      maxBucketsPerInterval)
      .withColumn("__b", explode(sequence(
        floorDiv(col(loCol), bucketWidth),
        floorDiv(col(hiCol), bucketWidth))))
    val hiPred =
      if (inclusiveEnd) col(pointCol) <= col(hiCol)
      else col(pointCol) < col(hiCol)
    p.join(iv, (keyCols :+ "__b").toIndexedSeq)
      .filter(col(pointCol) >= col(loCol) && hiPred)
      .drop("__b")
  }

  /** All overlapping (left interval, right interval) pairs — closed
    * intervals, overlap iff lLo <= rHi && rLo <= lHi — equal on `keyCols`
    * when given. Both sides explode to covered buckets; a pair can then
    * meet in several buckets, so it is counted only in the FIRST bucket
    * both cover (`greatest` of the two start buckets) — a deterministic
    * dedup that costs one comparison instead of a distinct. For self-joins
    * pass the same frame twice (with renamed columns) and filter the
    * orientation afterwards (e.g. left id < right id).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      bucketWidth: Long, keyCols: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth: $bucketWidth")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      assertMaxSpan(df, lo, hi, bucketWidth, maxBucketsPerInterval)
        .withColumn("__b", explode(sequence(
          floorDiv(col(lo), bucketWidth), floorDiv(col(hi), bucketWidth))))
    exploded(left, lLoCol, lHiCol)
      .join(exploded(right, rLoCol, rHiCol), (keyCols :+ "__b").toIndexedSeq)
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .filter(col("__b") === greatest(
        floorDiv(col(lLoCol), bucketWidth), floorDiv(col(rLoCol), bucketWidth)))
      .drop("__b")
  }

  /** Merge overlapping/touching closed intervals per key (gaps-and-islands
    * flatten): the union of [lo, hi] ranges as disjoint rows, with the
    * count of source intervals each merged range absorbed.
    *
    * One window pass (running max of prior ends marks island starts, a
    * running sum numbers the islands) over rows clustered by key — both
    * windows share one partitioning and sort — then a hash aggregate on
    * (key, island). Output: `keyCols`, loCol, hiCol, n_merged.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], loCol: String,
      hiCol: String): DataFrame = {
    val part = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(col(loCol), col(hiCol))
    val priorMax = max(col(hiCol))
      .over(part.rowsBetween(Window.unboundedPreceding, -1))
    val isStart = when(priorMax.isNull || col(loCol) > priorMax, 1L)
      .otherwise(0L)
    df.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .filter(assert_true(col(loCol) <= col(hiCol),
        lit(s"mergeIntervals: $loCol > $hiCol")).isNull)
      // two window steps (a window function may not nest inside another):
      // same partitioning and sort, so Catalyst plans ONE exchange + sort
      .withColumn("__start", isStart)
      .withColumn("__island", sum(col("__start"))
        .over(part.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start")
      .groupBy((keyCols.map(col) :+ col("__island")).toIndexedSeq: _*)
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
