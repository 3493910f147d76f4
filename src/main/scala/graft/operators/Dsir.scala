package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) re-expressed relationally: score every raw document
  * by the log-likelihood ratio of a TARGET hashed-n-gram bag-of-features
  * model over a RAW one, then resample the top-k under deterministic
  * Gumbel noise — "pick raw data that looks like the target corpus",
  * the importance-sampling answer to quality filtering.
  *
  * Features are unigrams + bigrams hashed to a FIXED bucket count with
  * the portable md5-60 family (occurrence-preserving, unlike the dedup
  * shingle helpers, because DSIR weights are count-weighted). Both
  * models and their difference are bucket-sized artifacts — bounded by
  * the `buckets` parameter, never by the corpus — so the per-bucket
  * log-ratio table collects once and broadcasts; scoring is one
  * corpus-side explode + broadcast join + per-doc sum (the same shape
  * the classify probe measured at ratio 2.5 for 20x rows, PLANS.md).
  *
  * Everything is cross-engine deterministic: counts are exact, the
  * log-ratio sums round to 6 decimals (the q62 float convention), and
  * the Gumbel noise derives from md5 of the document id — the same
  * −ln(−ln(u)) computed by DuckDB from the same rational u.
  */
object Dsir {

  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Occurrence-preserving unigram+bigram feature buckets of a token
    * array (md5-60 mod buckets; docs with one token have no bigrams).
    * Backed by the native [[graft.functions.FeatureBucketsExpr]] — the
    * composed transform/md5/conv form is an interpreted HOF running an
    * expression tree per element, measured 4.6 s warm for the sf0.1
    * corpus explode vs ~sub-second native (PLANS.md).
    */
  def featureBuckets(toks: Column, buckets: Int): Column =
    graft.functions.FeatureBucketsExpr.featureBuckets(toks, buckets)

  /** (id, exploded feature bucket) — one row per feature OCCURRENCE. */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(featureBuckets(col("__tk"), buckets)).as("__b"))

  /** Collected per-bucket occurrence counts and their total — a
    * bucket-bounded artifact (ONE corpus pass; computing the total from
    * the counts frame would otherwise re-run the explode lineage).
    */
  private def countsMap(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): (Map[Long, Long], Long) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = features(docs, idCol, textCol, buckets)
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .as[(Long, Long)].collect()
    (rows.toMap, rows.map(_._2).sum)
  }

  /** Dense per-bucket add-one log-probabilities of a corpus:
    * (bucket, logprob) for EVERY bucket in [0, buckets) —
    * ln((count+1)/(total+buckets)), absent buckets at the smoothed
    * floor. A buckets-sized literal frame whatever the corpus size.
    */
  def bucketLogProbs(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val (c, t) = countsMap(docs, idCol, textCol, buckets)
    (0L until buckets).map { b =>
      (b, math.log((c.getOrElse(b, 0L) + 1).toDouble / (t + buckets)))
    }.toDF("bucket", "logprob")
  }

  /** The per-bucket log-ratio table ln p_target − ln p_raw as a
    * buckets-sized frame: (bucket, diff) — the DSIR model ARTIFACT.
    * Saved once per (target, raw-reference) pair, it amortizes across
    * corpus shards and ingest micro-batches; scoring needs nothing
    * else.
    */
  def diffArtifacts(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = raw.sparkSession
    import spark.implicits._
    val (tc, tt) = countsMap(target, idCol, textCol, buckets)
    val (rc, rt) = countsMap(raw, idCol, textCol, buckets)
    (0L until buckets).map { b =>
      val lt = math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tt + buckets))
      val lr = math.log((rc.getOrElse(b, 0L) + 1).toDouble / (rt + buckets))
      (b, lt - lr)
    }.toDF("bucket", "diff")
  }

  /** Score a corpus against an already-built (bucket, diff) table —
    * the per-batch workhorse shared by [[importanceWeights]], the
    * artifact-replay regime, and the streaming face. `buckets` must
    * match the artifact's bucket space.
    */
  def scoreWithDiff(docs: DataFrame, diff: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    features(docs, idCol, textCol, buckets)
      .join(broadcast(diff), col("__b") === col("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("diff")), 6).as("log_weight"))

  /** Per-document DSIR importance weight: sum over feature occurrences
    * of ln p_target(bucket) − ln p_raw(bucket), rounded to 6. The
    * per-bucket log-ratio table is a bounded literal (buckets rows)
    * broadcast to the scoring join — the raw corpus pays one explode +
    * map-side join + per-doc aggregate (plus one counting pass per
    * model).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    scoreWithDiff(raw,
      diffArtifacts(raw, target, idCol, textCol, buckets),
      idCol, textCol, buckets)

  /** Gumbel-top-k resampling of the weighted corpus: sample_key =
    * round(log_weight + g, 6) with g = −ln(−ln(u)) and u the md5-derived
    * uniform of the id — equivalent to sampling k docs without
    * replacement with probability ∝ exp(log_weight), but a pure function
    * of the data. Output: (idCol, log_weight, sample_key, rank), rank
    * 1..k by (key desc, id asc).
    */
  def resampleTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (pmod(hash60(col(idCol).cast("string")), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val key = round(col("log_weight") - log(-log(u)), 6)
    // TakeOrderedAndProject first (distributed per-partition top-k +
    // driver merge of k-sized heads — never a global sort of the
    // corpus); the rank window then runs over k rows, bounded by the
    // parameter, not the data
    val top = weights
      .withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
    val w = Window.orderBy(col("sample_key").desc, col(idCol))
    top.withColumn("rank", row_number().over(w))
  }

  /** The full DSIR selection: weight every raw doc against the target,
    * keep the Gumbel-top-k — WITH the document columns carried through
    * (the selection feeds downstream pipeline stages, not just a
    * scoreboard). The top-k frame is k rows, so it broadcasts to the
    * re-join; the corpus pays one more map-side semi-pass, never a
    * shuffle.
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, k: Int): DataFrame = {
    val top = resampleTopK(
      importanceWeights(raw, target, idCol, textCol, buckets), idCol, k)
    raw.join(broadcast(top), Seq(idCol))
  }
}
