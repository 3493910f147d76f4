package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two table versions as
  * added / removed / changed / unchanged — the diff report behind every
  * re-crawl, re-ingest, or backfill review ("what did this delivery
  * actually change?").
  *
  * 100 TB shape: each side collapses to (key, md5-of-content) BEFORE the
  * join, so the full-outer join carries two fixed-width columns per row
  * whatever the row width — the content never shuffles, same discipline
  * as [[Dedup.exactGroups]]. The join is a key-partitioned equi-join
  * (co-partitioned exchanges, AQE-skew-splittable); the classification
  * is a per-row map over the join output.
  */
object Reconcile {

  /** (idCol, status) for every key present in either frame, with status
    * in {added, removed, changed, unchanged}. `contentCols` defaults to
    * every non-key column of `newDf` (which must match `oldDf`'s schema
    * for the digest comparison to be meaningful — enforced).
    */
  def diffFrames(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String] = Seq.empty): DataFrame = {
    val cols =
      if (contentCols.nonEmpty) contentCols
      else newDf.columns.filterNot(_ == idCol).toSeq
    require(cols.nonEmpty, s"no content columns besides $idCol")
    val missing = cols.filterNot(oldDf.columns.contains)
    require(missing.isEmpty,
      s"content columns absent from the old frame: ${missing.mkString(", ")}")
    def digested(df: DataFrame, dg: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("", cols.map(c => col(c).cast("string")): _*))
          .as(dg))
    val o = digested(oldDf, "__dg_old")
    val n = digested(newDf, "__dg_new")
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__dg_old").isNull, lit("added"))
          .when(col("__dg_new").isNull, lit("removed"))
          .when(col("__dg_old") === col("__dg_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Compress an append-only attribute log into SCD type-2 validity
    * ranges: one row per VALUE RUN of `valueCol` within `keyCol`,
    * `valid_from` = first observation of the run, `valid_to` = start of
    * the next run (null while current), `is_current` on the open row —
    * the warehouse history-table shape, built from a raw change log in
    * two window passes.
    *
    * Observations are ordered by (`tsCol`, `tieCol`); repeated
    * observations of the same value extend the run (no new row). Scale
    * shape: both windows partition by the key, so Catalyst plans ONE
    * exchange — the run filter preserves the clustering and the second
    * (lead) window reuses it without re-shuffling; no per-key state
    * beyond the sort.
    */
  /** Categorical distribution drift between two deliveries: per value of
    * `catCol`, both counts, the expected new count under the OLD
    * distribution (E = share_old · total_new), and the value's χ²
    * contribution ((observed−E)²/E) — Pearson's χ² is their sum, the
    * monitoring number a pipeline alerts on ("this load's language mix
    * shifted"). Values absent from the old delivery get a
    * null contribution (χ² is undefined at E=0) but still report their
    * counts — a NEW category is exactly what the report must surface.
    *
    * Exactness: counts are integers; E and the contribution are fixed
    * left-assoc IEEE chains over them, mirrored in the oracle.
    *
    * Scale shape: two map-side-combinable count aggregations (the
    * category domain, not the rows, survives them), one value-keyed
    * join of those tiny tables, one scalar total.
    */
  def categoryDrift(oldDf: DataFrame, newDf: DataFrame,
      catCol: String): DataFrame = {
    val c = col(s"`$catCol`")
    val oldC = oldDf.groupBy(c).agg(count(lit(1)).as("n_old"))
    val newC = newDf.groupBy(c).agg(count(lit(1)).as("n_new"))
    val totals = oldC.agg(sum(col("n_old")).as("__to")).crossJoin(
      newC.agg(sum(col("n_new")).as("__tn")))
    val joined = oldC.join(newC, Seq(catCol), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
      .crossJoin(broadcast(totals))
    val e = col("n_old").cast("double") * col("__tn") / col("__to")
    val contrib = when(col("n_old") > 0,
      (col("n_new") - e) * (col("n_new") - e) / e)
    joined.select(c, col("n_old"), col("n_new"),
      round(e, 6).as("expected_new"), round(contrib, 6).as("chisq"))
  }

  /** Numeric sibling of [[categoryDrift]]: the χ² drift report over a
    * FIXED equal-width binning of `valueCol` — "did the length/score
    * distribution shift between deliveries". Bins are `[lo, hi)` split
    * `nBins` ways plus an underflow bin (−1) and an overflow bin
    * (`nBins`); fixed explicit edges (not data-derived quantiles) so
    * the binning never moves between deliveries — a drift monitor with
    * drifting bins measures itself. Per appearing bin:
    * (bin, n_old, n_new, expected_new, chisq), the q130 conventions
    * (expected = old share × new total, null contribution for a bin
    * with no old mass). Null values are excluded.
    *
    * Bin arithmetic is floor((v−lo)·nBins/(hi−lo)) on exact integer
    * operands through one double division — deterministic and
    * oracle-identical (both engines' `/` on integers is IEEE double).
    *
    * 100 TB shape: two map-side-combinable counts into ≤ nBins+2 rows
    * each, a full-outer join of the two tiny histograms, totals as a
    * broadcast cross join — nothing after the first agg touches
    * data-sized input.
    */
  def numericDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(lo < hi, s"need lo < hi: $lo, $hi")
    require(nBins >= 1 && nBins <= 100000, s"nBins out of range: $nBins")
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val v = col(s"`$valueCol`").cast("long")
      df.filter(v.isNotNull)
        .select(when(v < lo, lit(-1L))
          .when(v >= hi, lit(nBins.toLong))
          .otherwise(floor((v - lo) * nBins / (hi - lo))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    }
    val oldB = binned(oldDf, "n_old")
    val newB = binned(newDf, "n_new")
    val totals = oldB.agg(sum(col("n_old")).as("__to")).crossJoin(
      newB.agg(sum(col("n_new")).as("__tn")))
    val joined = oldB.join(newB, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
      .crossJoin(broadcast(totals))
    val e = col("n_old").cast("double") * col("__tn") / col("__to")
    val contrib = when(col("n_old") > 0,
      (col("n_new") - e) * (col("n_new") - e) / e)
    joined.select(col("bin"), col("n_old"), col("n_new"),
      round(e, 6).as("expected_new"), round(contrib, 6).as("chisq"))
  }

  def scd2Compress(log: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(s"`$keyCol`"))
      .orderBy(col(s"`$tsCol`"), col(s"`$tieCol`"))
    log.select(col(s"`$keyCol`"), col(s"`$valueCol`"), col(s"`$tsCol`"),
        col(s"`$tieCol`"))
      .withColumn("__prev", lag(col(s"`$valueCol`"), 1).over(byTime))
      // first-row detection via the (non-null) tie column, so a null
      // VALUE is still a legal run of its own
      .withColumn("__first",
        lag(col(s"`$tieCol`"), 1).over(byTime).isNull)
      // run starts: the first observation, or a value different from
      // the previous one (null-safe comparison)
      .filter(col("__first") || !(col(s"`$valueCol`") <=> col("__prev")))
      .withColumn("valid_to", lead(col(s"`$tsCol`"), 1).over(byTime))
      .select(col(s"`$keyCol`"), col(s"`$valueCol`"),
        col(s"`$tsCol`").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
