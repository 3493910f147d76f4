package graft.operators

import org.apache.spark.sql.DataFrame
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
}
