package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling statistics that reduce to one global agg row —
  * the "is this feature redundant / is this signal real" numbers a
  * curation pipeline reads before trusting a quality score.
  *
  * 100 TB shape: every statistic here is a sum/count moment, so the
  * whole computation is ONE full scan with map-side partial
  * aggregation into a single row — no shuffle wider than the
  * one-row exchange, no window, no join. The pairwise fan-out
  * (k features → k(k−1)/2 pairs) happens on that single row via an
  * explode, never against the data.
  */
object Stats {

  /** Pearson correlation for every unordered pair of `cols` (emitted
    * once as x < y in `cols` order): one row per pair with the shared
    * non-null count and r. Rows where ANY of the feature columns is
    * null are dropped first, so every pair sees the same n and the
    * moment sums stay mutually consistent.
    *
    * Exactness: all moments are exact BIGINT sums (caller supplies
    * integer-typed features); r is the textbook
    * (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²)) evaluated in
    * a fixed double association and round(…, 6), so an oracle writing
    * the same tree reproduces the bits. Zero-variance features yield
    * null r (guarded before the sqrt), never NaN.
    */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns: $cols")
    require(cols.distinct == cols, s"duplicate columns: $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // one pass, one row: count + per-column sum/sum-of-squares +
    // per-pair cross sum, all map-side combinable
    val moments = df.na.drop(cols)
      .agg(count(lit(1)).as("__n"),
        cols.flatMap(c => Seq(
          sum(col(c)).cast("long").as(s"__s_$c"),
          sum(col(c) * col(c)).cast("long").as(s"__q_$c"))) ++
        pairs.map { case (a, b) =>
          sum(col(a) * col(b)).cast("long").as(s"__p_${a}__$b") }: _*)
    val nD = col("__n").cast("double")
    def sD(c: String) = col(s"__s_$c").cast("double")
    def varN(c: String) = nD * col(s"__q_$c") - sD(c) * sD(c)
    val withVars = cols.foldLeft(moments) { (d, c) =>
      d.withColumn(s"__v_$c", varN(c)) }
    val rows = pairs.map { case (a, b) =>
      val cov = nD * col(s"__p_${a}__$b") - sD(a) * sD(b)
      struct(lit(a).as("x"), lit(b).as("y"), col("__n").as("n"),
        when(col(s"__v_$a") <= 0 || col(s"__v_$b") <= 0, lit(null))
          .otherwise(round(
            cov / (sqrt(col(s"__v_$a")) * sqrt(col(s"__v_$b"))), 6))
          .cast("double").as("r"))
    }
    withVars.select(explode(array(rows: _*)).as("__pr")).select(col("__pr.*"))
  }
}
