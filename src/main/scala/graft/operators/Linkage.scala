package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (the Fellegi–Sunter decision model):
  * candidate pairs from a blocking equi-join are scored by summing
  * per-field agreement weights — log-likelihood ratios in practice,
  * passed here as INTEGER-SCALED weights so the total score is an exact
  * BIGINT and the decision thresholds are engine-independent — then cut
  * into match / possible / non-match. The entity-resolution face the
  * repo's primitives (minhash blocking, Levenshtein verification) were
  * built to feed.
  *
  * Missing fields (null on either side) contribute ZERO weight — the
  * standard F-S treatment: an unobserved comparison carries no evidence
  * either way.
  *
  * 100 TB shape: one blocking equi-join (hash-partitioned on the block
  * key; candidate volume = per-block density, the blocking designer's
  * knob) and a narrow per-pair expression — no all-pairs product, no
  * driver state. Skewed blocks ride AQE or pre-salting like any hot
  * equi-join.
  */
object Linkage {

  /** One field comparison: `kind` is "exact" (plain equality — nulls are
    * handled UPSTREAM as zero evidence, so a both-null pair scores 0,
    * NOT agreement; do not "simplify" to a null-safe `<=>`) or
    * "levenshtein" (edit distance <= maxDist). Weights are caller-scaled
    * integers (e.g. log-ratio × 1000).
    */
  case class FieldRule(leftCol: String, rightCol: String, agree: Long,
      disagree: Long, kind: String = "exact", maxDist: Int = 0) {
    require(Seq("exact", "levenshtein").contains(kind),
      s"kind must be exact|levenshtein: $kind")
  }

  /** Per-pair total match score over already-paired rows. */
  def scorePairs(pairs: DataFrame, rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "at least one field rule")
    val score = rules.map { r =>
      val l = col(r.leftCol); val rr = col(r.rightCol)
      val agrees = r.kind match {
        case "exact" => l === rr
        // thresholded levenshtein: O(maxDist·len) with early exit —
        // returns -1 once the distance provably exceeds the bound, so
        // the band check never pays the full O(len²) matrix (the oracle
        // keeps the plain function: same band, different cost)
        case "levenshtein" =>
          val d = levenshtein(l, rr, r.maxDist)
          d >= 0 && d <= r.maxDist
      }
      when(l.isNull || rr.isNull, lit(0L))
        .when(agrees, lit(r.agree)).otherwise(lit(r.disagree))
    }.reduce(_ + _)
    pairs.withColumn("match_score", score)
  }

  /** Block, score, decide: pairs sharing `blockCols` values are scored
    * by `rules` and labeled `match` (score >= upper), `possible`
    * (lower <= score < upper), or dropped (score < lower — emitting
    * non-matches would materialize the whole candidate set downstream).
    * Left/right column names must be disjoint apart from `blockCols`.
    */
  def linkTable(left: DataFrame, right: DataFrame, blockCols: Seq[String],
      rules: Seq[FieldRule], upper: Long, lower: Long): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required")
    require(lower <= upper, s"lower $lower > upper $upper")
    scorePairs(left.join(right, blockCols.toIndexedSeq), rules)
      .filter(col("match_score") >= lower)
      .withColumn("decision",
        when(col("match_score") >= upper, lit("match"))
          .otherwise(lit("possible")))
  }
}
