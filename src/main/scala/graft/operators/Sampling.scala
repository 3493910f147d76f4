package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — the down-sampling step of
  * a training-data pipeline (per-source/per-language rate control).
  *
  * Unlike `df.sample`, selection is a pure function of the ID, so it is
  * stable under retries/recomputation (no SPARK-23207-class divergence),
  * reproducible across runs and engines, and consistent across derived
  * tables (the same id samples in or out everywhere). The hash is the
  * md5-derived [[graft.functions.PortableHash]] family, so the DuckDB
  * oracle reproduces the exact sample.
  *
  * Scale: a narrow filter — no shuffle, fully pushdown-compatible with
  * whatever the scan already prunes.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform hash bucket in [0, 1e6) for a column (matches
    * `CAST('0x'||substr(md5(x),1,15) AS BIGINT) % 1000000` in SQL).
    */
  def hashBucket(c: Column): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(Buckets))

  /** Keep a deterministic `fraction` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction: $fraction")
    df.filter(hashBucket(col(idCol)) < (fraction * Buckets).toLong)
  }

  /** Per-strata sampling rates (e.g. keep 100% of rare languages, 10% of
    * the dominant one). Strata with no configured rate keep
    * `defaultFraction`. The rate lookup compiles to a CASE expression —
    * no join, no shuffle; selection stays a narrow map.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val threshold = fractions.foldLeft(
      lit((defaultFraction * Buckets).toLong)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
