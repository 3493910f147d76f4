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

  /** Daily-volume anomaly flags: bucket rows by day, z-score each
    * day's count against the mean/std of ALL daily counts, and flag
    * |z| ≥ `zThreshold` — the "ingestion spiked / collection gap"
    * alert for an event feed. One row per observed day:
    * (day, n, z, is_burst). A single observed day, or zero variance
    * (every day identical), yields null z and flag — no anomaly
    * baseline exists.
    *
    * Exactness: day counts are integers; the moments (k, Σn, Σn²) are
    * exact BIGINT sums over the DAYS frame, and z is the q99 tree
    * ((n − Σn/k) / √((Σn² − Σn·Σn/k)/(k−1))) rounded to 6. The flag
    * compares the UNROUNDED z so the boolean is the same decision the
    * z column reports.
    *
    * 100 TB shape: one map-side-combinable count into days-sized
    * rows; the moments collapse that frame to one broadcast row;
    * everything after the first agg is day-domain only.
    */
  def volumeAnomalies(df: DataFrame, tsCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val days = df.filter(col(tsCol).isNotNull)
      .groupBy(date_format(col(tsCol), "yyyyMMdd").as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = days.agg(count(lit(1)).as("__k"),
      sum(col("n")).as("__s1"), sum(col("n") * col("n")).as("__s2"))
    def varE = (col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1") / col("__k")) /
      (col("__k") - 1)
    def zE = (col("n") - col("__s1").cast("double") / col("__k")) /
      sqrt(varE)
    val undefined = col("__k") === 1 || varE <= 0
    days.crossJoin(broadcast(moments))
      .select(col("day"), col("n"),
        when(undefined, lit(null).cast("double"))
          .otherwise(round(zE, 6)).as("z"),
        when(undefined, lit(null).cast("boolean"))
          .otherwise(abs(zE) >= zThreshold).as("is_burst"))
  }

  /** Rolling daily-volume report: per observed day the event count, the
    * trailing `window`-day moving window (days present, total, average)
    * and the day-over-day percent change — the smoothed trend line next
    * to [[volumeAnomalies]]' spike flags (an anomaly check answers "is
    * today broken", this answers "which way is the feed drifting").
    * The window spans the last `window` OBSERVED days, not calendar
    * days — a silent day shortens the window rather than padding it
    * with zeros (documented choice; calendar padding needs a generated
    * day spine and a policy for the corpus's first week).
    *
    * Exactness: counts and window totals are exact BIGINTs; win_avg
    * and pct_change are single IEEE quotients, round(…, 6), mirrored
    * verbatim; the first day's pct_change is null.
    *
    * 100 TB shape: one map-side-combinable day count; both windows run
    * over the DAYS frame (bounded by the corpus's time span, hence the
    * acceptable unpartitioned window).
    */
  def rollingDailyVolume(df: DataFrame, tsCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 2, s"window must be at least 2 days: $window")
    import org.apache.spark.sql.expressions.Window
    val days = df.filter(col(tsCol).isNotNull)
      .groupBy(date_format(col(tsCol), "yyyyMMdd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val prev = lag(col("n"), 1).over(Window.orderBy(col("day")))
    days
      .withColumn("win_days", count(lit(1)).over(w))
      .withColumn("win_total", sum(col("n")).over(w))
      .withColumn("__prev", prev)
      .select(col("day"), col("n"), col("win_days"), col("win_total"),
        round(col("win_total").cast("double") / col("win_days"), 6)
          .as("win_avg"),
        when(col("__prev").isNull, lit(null).cast("double"))
          .otherwise(round(
            (col("n").cast("double") - col("__prev")) / col("__prev"), 6))
          .as("pct_change"))
  }

  /** Exponential time-decay engagement score per entity — the
    * recency-weighted activity rank a curation pipeline uses to pick
    * "currently active" users/sources without a hard cutoff date: an
    * event `d` whole days older than the newest event in the frame
    * contributes `value · 0.5^(d / halfLifeDays)`. The reference
    * instant is the frame's own max timestamp (deterministic — no
    * wall clock), and ages are floored to WHOLE days so the weight
    * set is small and exactly reproducible. One row per entity:
    * (key, n_events, raw_value, decayed_value), rounded to 6 places.
    *
    * 100 TB shape: one 1-row max-ts aggregate broadcast back as a
    * literal-sized cross join, then ONE map-side-combinable sum per
    * entity — no window, no content shuffle; the decay weight is a
    * per-row codegen'd expression.
    */
  def decayedScore(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, halfLifeDays: Double = 7.0): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive: $halfLifeDays")
    val rows = df.filter(col(s"`$tsCol`").isNotNull &&
      col(s"`$keyCol`").isNotNull && col(s"`$valueCol`").isNotNull)
    val ref = rows.agg(max(unix_micros(col(s"`$tsCol`"))).as("__ref"))
    val ageDays = floor((col("__ref") - unix_micros(col(s"`$tsCol`")))
      / lit(86400000000L)).cast("double")
    val weight = pow(lit(0.5), ageDays / lit(halfLifeDays))
    rows.crossJoin(broadcast(ref))
      .groupBy(col(s"`$keyCol`"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(s"`$valueCol`")), 6).as("raw_value"),
        round(sum(col(s"`$valueCol`") * weight), 6).as("decayed_value"))
  }

  /** Watermark-sizing report: how LATE do events actually arrive?
    * Lateness of an event = how far its event time sits behind the
    * per-key running maximum in ARRIVAL order (`seqCol` — an ingestion
    * sequence like event_id), floored to whole seconds; in-order events
    * score 0. Output: one row per requested quantile
    * (p, lateness_s, n_events, n_late, late_share) — "a watermark of
    * p99 lateness_s seconds would admit 99% of events", THE number the
    * streaming operators' `withWatermark` needs, measured instead of
    * guessed.
    *
    * 100 TB shape: the running max is a per-key window in seq order
    * (partition count grows with keys, per-partition work constant —
    * the production shape); quantiles run over the LATENESS HISTOGRAM
    * (bounded by distinct observed whole-second values), never over
    * events; the counts ride one map-side-combinable aggregate and
    * broadcast back onto the quantile rows.
    */
  def watermarkLateness(df: DataFrame, tsCol: String, seqCol: String,
      keyCol: String,
      ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(ps.nonEmpty, "ps must be non-empty")
    ps.foreach(p => require(0 < p && p <= 1, s"p must be in (0, 1]: $p"))
    require(ps.distinct.size == ps.size, s"duplicate quantiles: $ps")
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(col(s"`$tsCol`").isNotNull &&
        col(s"`$seqCol`").isNotNull && col(s"`$keyCol`").isNotNull)
      .select(col(s"`$keyCol`").as("__k"), col(s"`$seqCol`").as("__q"),
        unix_micros(col(s"`$tsCol`")).as("__t"))
    val prevMax = max(col("__t")).over(
      Window.partitionBy(col("__k")).orderBy(col("__q"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val lat = rows
      .select(floor(greatest(coalesce(prevMax, col("__t")) - col("__t"),
        lit(0L)) / lit(1000000L)).as("__lat"))
    val totals = lat.agg(count(lit(1)).as("__n"),
      count(when(col("__lat") > 0, lit(1))).as("__nl"))
    val hist = lat.groupBy(col("__lat")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c"))
        .over(Window.orderBy(col("__lat"))))
    hist.crossJoin(broadcast(totals))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("__cum") >= ceil(col("p") * col("__n")))
      .groupBy(col("p"))
      .agg(min(col("__lat")).as("lateness_s"),
        first(col("__n")).as("n_events"),
        first(col("__nl")).as("n_late"))
      .withColumn("late_share",
        when(col("n_events") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_late").cast("double")
            / col("n_events"), 6)))
  }

  /** Join-key skew report — the measured input to a salting decision
    * (how big is the hottest key, how far above the typical key): one
    * row (n_rows, n_keys, max_group, p50_group, p99_group,
    * max_key_share, skew_factor) where the quantiles are exact type-1
    * over the KEY-SIZE distribution (each key one observation) and
    * skew_factor = max_group / p50_group. A skew_factor in the
    * thousands is the "one task reads 7M rows" plan smell before it
    * happens — [[graft.operators.SkewJoin]]'s saltFactor gets sized
    * from this number instead of guessed. Null keys are excluded (they
    * don't join anyway).
    *
    * 100 TB shape: one map-side-combinable key count; everything after
    * runs over the GROUP-SIZE HISTOGRAM (bounded by distinct observed
    * sizes), never over rows or keys.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = df.filter(col(s"`$keyCol`").isNotNull)
      .groupBy(col(s"`$keyCol`")).agg(count(lit(1)).as("__sz"))
    val totals = groups.agg(
      coalesce(sum(col("__sz")), lit(0L)).as("__rows"),
      count(lit(1)).as("__keys"), max(col("__sz")).as("__max"))
    val hist = groups.groupBy(col("__sz")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c"))
        .over(Window.orderBy(col("__sz"))))
    val q = hist.crossJoin(broadcast(totals))
      .withColumn("__p", explode(array(lit(0.5), lit(0.99))))
      .filter(col("__cum") >= ceil(col("__p") * col("__keys")))
      .groupBy(col("__p")).agg(min(col("__sz")).as("__q"))
    val p50 = q.filter(col("__p") === 0.5).select(col("__q").as("__p50"))
    val p99 = q.filter(col("__p") === 0.99).select(col("__q").as("__p99"))
    totals.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .select(col("__rows").as("n_rows"), col("__keys").as("n_keys"),
        col("__max").as("max_group"), col("__p50").as("p50_group"),
        col("__p99").as("p99_group"),
        round(col("__max").cast("double") / col("__rows"), 6)
          .as("max_key_share"),
        round(col("__max").cast("double") / col("__p50"), 6)
          .as("skew_factor"))
  }

  /** One-pass bounded-memory heavy hitters over a string item column —
    * the native Misra-Gries aggregate
    * ([[graft.functions.MisraGriesAgg]]): at most `k` counters per
    * partition partial, associative merge, so the shuffle carries k
    * counters per partition instead of the whole item domain (what a
    * groupBy count pays). Every item with frequency > n/(k+1)
    * survives; counts are lower bounds undercounting by at most
    * n/(k+1), and are EXACT (order-independent) whenever k ≥ the
    * distinct-item count. One row per surviving item:
    * (item, count_low).
    */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame =
    df.filter(col(s"`$itemCol`").isNotNull)
      .agg(graft.functions.MisraGriesAgg
        .heavyHitters(col(s"`$itemCol`"), k).as("__hh"))
      .select(explode(col("__hh")).as("__e"))
      .select(col("__e.item").as("item"),
        col("__e.count_low").as("count_low"))

  /** Grouped face of [[heavyHitters]]: one k-counter sketch per group
    * (k counters per (partition, group) partial — bounded by
    * k·|groups| total state, not by the item domain). One row per
    * surviving (group, item): (group, item, count_low).
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame =
    df.filter(col(s"`$itemCol`").isNotNull)
      .groupBy(col(s"`$groupCol`"))
      .agg(graft.functions.MisraGriesAgg
        .heavyHitters(col(s"`$itemCol`"), k).as("__hh"))
      .select(col(s"`$groupCol`"), explode(col("__hh")).as("__e"))
      .select(col(s"`$groupCol`"), col("__e.item").as("item"),
        col("__e.count_low").as("count_low"))

  /** Gini coefficient of row mass across groups — 0 when every group
    * contributes equally, →1 when one group owns the corpus ("is this
    * dataset one crawl wearing twenty source labels"). One output row:
    * (n_groups, total_rows, gini), computed from the rank identity
    * G = 2·Σ(i·x_i)/(k·Σx) − (k+1)/k over ascending-sorted group
    * sizes. Ties in size are rank-order-invariant for the sum (equal
    * x over consecutive ranks contributes the same total), so the
    * (size, group) tie-break is for determinism of the intermediate,
    * not the result.
    *
    * 100 TB shape: one map-side-combinable group count; the rank
    * window and the final moment run over the GROUPS frame only.
    */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__x"))
    // the groups frame is bounded, so the unpartitioned rank is fine
    val ranked = sizes.withColumn("__i",
      row_number().over(Window.orderBy(col("__x"), col(groupCol))))
    ranked.agg(count(lit(1)).as("n_groups"),
        sum(col("__x")).as("total_rows"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col("n_groups"), col("total_rows"),
        round(lit(2.0) * col("__ix") /
            (col("n_groups").cast("double") * col("total_rows")) -
          (col("n_groups") + 1).cast("double") / col("n_groups"), 6)
          .as("gini"))
  }

  /** Per-group [[volumeAnomalies]]: each group's daily counts z-scored
    * against THAT group's own day history — "which feed broke" rather
    * than "did total volume move" (a spike in one source that another
    * source's dip cancels is invisible to the global check). One row
    * per (group, day); groups with one observed day or zero variance
    * report null z and flag.
    *
    * 100 TB shape: one map-side-combinable (group, day) count; the
    * per-group moments re-aggregate that frame (groups-sized) and join
    * back as a broadcast — day-domain work only after the first agg.
    */
  def volumeAnomaliesPerGroup(df: DataFrame, tsCol: String,
      groupCol: String, zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val days = df.filter(col(tsCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        date_format(col(tsCol), "yyyyMMdd").as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = days.groupBy(col("__g")).agg(count(lit(1)).as("__k"),
      sum(col("n")).as("__s1"), sum(col("n") * col("n")).as("__s2"))
    def varE = (col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1") / col("__k")) /
      (col("__k") - 1)
    def zE = (col("n") - col("__s1").cast("double") / col("__k")) /
      sqrt(varE)
    val undefined = col("__k") === 1 || varE <= 0
    days.join(broadcast(moments), Seq("__g"))
      .select(col("__g").as(groupCol), col("day"), col("n"),
        when(undefined, lit(null).cast("double"))
          .otherwise(round(zE, 6)).as("z"),
        when(undefined, lit(null).cast("boolean"))
          .otherwise(abs(zE) >= zThreshold).as("is_burst"))
  }

  /** Per-group fixed-width histogram of a numeric column — the
    * length-distribution glance ("are zh docs short because the feed
    * truncates") next to the quantile machinery (quantiles answer
    * "where is the mass", the histogram shows the SHAPE). One row per
    * observed (group, bin): (group, bin_lo, bin_hi, n); empty bins emit
    * nothing. Bins are `floor(value / width)` through doubles — exact
    * for |value| < 2^53 and identical floor semantics in both engines
    * (integer `div` would truncate toward zero and disagree with SQL
    * `//` on negatives). Null groups/values are excluded.
    *
    * 100 TB shape: one map-side-combinable (group, bin) count — output
    * bounded by groups × occupied bins, never by row count.
    */
  def groupedHistogram(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val bin = floor(col(valueCol).cast("double") / binWidth).cast("long")
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), bin.as("__bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), (col("__bin") * binWidth).as("bin_lo"),
        ((col("__bin") + 1) * binWidth).as("bin_hi"), col("n"))
  }

  /** Day-of-week × hour-of-day seasonality profile: the weekly heat-map
    * behind capacity planning and anomaly thresholds ("is Monday 9am
    * supposed to be 4× Sunday 3am") — [[volumeAnomalies]] flags days
    * against a flat baseline; this is the structured baseline. One row
    * per observed (dow, hour) cell with count and share of total; dow
    * follows Spark's `dayofweek` (1 = Sunday … 7 = Saturday; the oracle
    * maps DuckDB's 0-based form by +1). Null timestamps are excluded.
    *
    * 100 TB shape: one map-side-combinable cell count into ≤ 168 rows;
    * the total re-aggregates that frame and broadcasts back.
    */
  def seasonalityProfile(df: DataFrame, tsCol: String): DataFrame = {
    val cells = df.filter(col(tsCol).isNotNull)
      .groupBy(dayofweek(col(tsCol)).as("dow"),
        hour(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("__t"))
    cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n"),
        round(col("n").cast("double") / col("__t"), 6).as("share"))
  }

  /** Per-group burstiness of daily volume: the Fano factor
    * (sample variance / mean of the group's daily counts) plus the
    * coefficient of variation — the dispersion summary next to
    * [[volumeAnomaliesPerGroup]]'s per-day flags (that one answers
    * "which day broke", this one "is this feed steady or bursty at
    * all"). Fano ≈ 1 is Poisson-like arrival; ≫ 1 is bursty; ≪ 1 is
    * metronomic. One row per group: (group, k_days, total, mean, fano,
    * cv); a single observed day has no variance — null fano/cv.
    *
    * Exactness: day counts are integers, the per-group moments
    * (k, Σn, Σn²) are exact BIGINT sums, and fano/cv are fixed double
    * trees over them (the q138 variance tree divided by mean),
    * round(…, 6), mirrored verbatim in the oracle.
    *
    * 100 TB shape: one map-side-combinable (group, day) count; the
    * moments re-aggregate that frame to groups-sized rows. Nothing
    * after the first agg touches event volume.
    */
  def burstiness(df: DataFrame, tsCol: String,
      groupCol: String): DataFrame = {
    val days = df.filter(col(tsCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        date_format(col(tsCol), "yyyyMMdd").as("__day"))
      .agg(count(lit(1)).as("__n"))
    val m = days.groupBy(col("__g")).agg(count(lit(1)).as("k_days"),
      sum(col("__n")).as("total"),
      sum(col("__n") * col("__n")).as("__s2"))
    val kD = col("k_days").cast("double")
    val mean = col("total").cast("double") / kD
    val varE = (col("__s2").cast("double") -
      col("total").cast("double") * col("total") / col("k_days")) /
      (col("k_days") - 1)
    m.select(col("__g").as(groupCol), col("k_days"), col("total"),
      round(mean, 6).as("mean"),
      when(col("k_days") === 1, lit(null).cast("double"))
        .otherwise(round(varE / mean, 6)).as("fano"),
      when(col("k_days") === 1, lit(null).cast("double"))
        .otherwise(round(sqrt(varE) / mean, 6)).as("cv"))
  }

  /** Lorenz-curve vertices of row mass across entities — the curve
    * behind [[giniConcentration]]'s single number ("the bottom 80% of
    * users contribute 12% of events" stated pointwise). One row per
    * DISTINCT activity level, ascending: (activity, n_entities,
    * cum_entity_share, cum_event_share); plotting the two cum columns
    * is the Lorenz curve, and its area gap to the diagonal is the Gini.
    * Null entities are excluded.
    *
    * Exactness: all cumulatives are exact BIGINTs over the activity
    * HISTOGRAM; shares are single IEEE quotients, round(…, 6).
    *
    * 100 TB shape: the per-entity count is map-side combinable; the
    * histogram collapses the entity frame to distinct activity LEVELS,
    * and the cumulative window runs over that bounded frame (a
    * billion users with power-law activity hold a few thousand
    * levels), never over entities.
    */
  def lorenzCurve(df: DataFrame, entityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(entityCol).isNotNull)
      .groupBy(col(entityCol)).agg(count(lit(1)).as("__n"))
    val hist = counts.groupBy(col("__n").as("activity"))
      .agg(count(lit(1)).as("n_entities"))
    val w = Window.orderBy(col("activity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("n_entities")).as("__te"),
      sum(col("activity") * col("n_entities")).as("__tv"))
    hist
      .withColumn("__cume", sum(col("n_entities")).over(w))
      .withColumn("__cumv",
        sum(col("activity") * col("n_entities")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("activity"), col("n_entities"),
        round(col("__cume").cast("double") / col("__te"), 6)
          .as("cum_entity_share"),
        round(col("__cumv").cast("double") / col("__tv"), 6)
          .as("cum_event_share"))
  }

  /** Per-group distinct-entity intensity: row count, exact distinct
    * count of `idCol`, and rows per distinct — "is purchase volume
    * broad or three users deep", the abuse-triage companion to
    * [[giniConcentration]] (Gini says HOW concentrated the whole
    * stream is; this says WHERE). One row per group. Null groups/ids
    * are excluded.
    *
    * 100 TB shape: exact countDistinct expands to a two-phase
    * aggregation on (group, id) — map-side combinable into the
    * distinct-pair frame, then a groups-sized re-aggregation; the
    * sketch path ([[DistinctSketch.kmvDistinct]]) is the documented
    * alternative when ±2% beats the second shuffle.
    */
  def distinctIntensity(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    df.filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_distinct"))
      .select(col(groupCol), col("n_rows"), col("n_distinct"),
        round(col("n_rows").cast("double") / col("n_distinct"), 6)
          .as("rows_per_distinct"))
  }

  /** Top-k values per group by row count — the mode report ("what are
    * the dominant event types per source, the top domains per lang")
    * with deterministic (count desc, value) ranking. One row per kept
    * (group, value): (group, value, n, rank, share of the group's
    * rows). Null groups/values are excluded.
    *
    * 100 TB shape: one map-side-combinable (group, value) cell count;
    * the rank window and group totals run over the cell frame
    * partitioned by group (WindowGroupLimit prunes to k per group
    * before the final projection).
    */
  def topValuesPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n"))
    val perG = Window.partitionBy(col(groupCol))
    val ranked = cells
      .withColumn("rank", row_number().over(
        perG.orderBy(col("n").desc, col("value"))))
      .withColumn("__tot", sum(col("n")).over(perG))
    ranked.filter(col("rank") <= k)
      .select(col(groupCol), col("value"), col("n"), col("rank"),
        round(col("n").cast("double") / col("__tot"), 6).as("share"))
  }

  /** Per-group Pearson correlation between two INTEGER-typed columns —
    * [[corrPairs]] sliced by group ("does length track quality in en
    * but not in zh"). One row per group: (group, n, r); r is null for
    * zero-variance or single-row groups. Rows with a null in either
    * column are excluded (per group, both columns see the same n).
    *
    * Exactness: per-group moments are exact BIGINT sums; r is the
    * q132 fixed double tree, round(…, 6).
    *
    * 100 TB shape: ONE map-side-combinable aggregation into
    * groups-sized rows; no window, no join.
    */
  def corrPerGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val m = df
      .filter(col(groupCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).cast("long").as("__sx"),
        sum(col(yCol)).cast("long").as("__sy"),
        sum(col(xCol) * col(xCol)).cast("long").as("__sxx"),
        sum(col(yCol) * col(yCol)).cast("long").as("__syy"),
        sum(col(xCol) * col(yCol)).cast("long").as("__sxy"))
    val nD = col("n").cast("double")
    def sD(c: String) = col(c).cast("double")
    val vx = nD * col("__sxx") - sD("__sx") * col("__sx")
    val vy = nD * col("__syy") - sD("__sy") * col("__sy")
    val cov = nD * col("__sxy") - sD("__sx") * col("__sy")
    m.select(col(groupCol), col("n"),
      when(vx <= 0 || vy <= 0, lit(null).cast("double"))
        .otherwise(round(cov / (sqrt(vx) * sqrt(vy)), 6)).as("r"))
  }

  /** Kolmogorov–Smirnov distance between two samples of an
    * integer-valued column: max |F_a(v) − F_b(v)| over the union of
    * observed values — the single-number distribution-shift score next
    * to [[numericDrift]]'s per-bin χ² table (bins need a width choice;
    * KS does not). One output row: (n_a, n_b, ks). Null values are
    * excluded; either side empty yields null ks.
    *
    * Determinism: both CDFs are exact BIGINT cumulative counts over
    * the distinct-value frame divided once per value (single IEEE
    * quotients); the max is order-independent. No float accumulation.
    *
    * 100 TB shape: each side collapses to a map-side-combinable value
    * histogram; one full-outer join on the value domain, two cumulative
    * windows over that bounded frame, one max.
    */
  def ksDistance(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def hist(df: DataFrame, cnt: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as(cnt))
    val joined = hist(a, "__ca").join(hist(b, "__cb"), Seq("__v"),
        "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // the cumulative window runs over the distinct-VALUE frame (bounded
    // by the value domain, never by row count)
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = joined
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
    val tot = joined.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"))
    val diff = when(col("n_a") === 0 || col("n_b") === 0,
      lit(null).cast("double"))
      .otherwise(abs(col("__cuma").cast("double") / col("n_a") -
        col("__cumb").cast("double") / col("n_b")))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(diff).as("__ks"))
      .select(col("n_a"), col("n_b"), round(col("__ks"), 6).as("ks"))
  }

  /** Functional-dependency profile for a → b: for every a-value, how
    * many distinct b-values it maps to, the dominant b (most rows,
    * ties to the smallest b), and the dominant share — the data-quality
    * question "is lang determined by source, and where does the
    * mapping leak". `is_functional` is true exactly when the a-value
    * maps to one b. Null-keyed rows (either side) are excluded.
    *
    * 100 TB shape: one map-side-combinable (a, b) count; every window
    * after it runs over the distinct-pair cells partitioned by a —
    * bounded by the key domains, never by row count.
    */
  def functionalDependency(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val perA = Window.partitionBy(col("__a"))
    val byDom = perA.orderBy(col("__c").desc, col("__b"))
    cells
      .withColumn("__rk", row_number().over(byDom))
      .withColumn("n_rows", sum(col("__c")).over(perA))
      .withColumn("n_distinct_b", count(lit(1)).over(perA))
      .filter(col("__rk") === 1)
      .select(col("__a").as(aCol), col("n_rows"), col("n_distinct_b"),
        col("__b").as("dominant_b"), col("__c").as("dominant_n"),
        round(col("__c").cast("double") / col("n_rows"), 6)
          .as("dominant_frac"),
        (col("n_distinct_b") === 1).as("is_functional"))
  }

  /** Entropy / mutual-information profile for two categorical columns —
    * the information-theoretic companion to [[contingencyAssociation]]:
    * how many nats of uncertainty each column carries (H(A), H(B)), how
    * much knowing one removes about the other (MI), and the normalized
    * MI (MI / √(H(A)·H(B)), the symmetric 0..1 "how redundant are these
    * two labels" score; null when either column is single-valued). One
    * output row: (n, ka, kb, h_a, h_b, h_ab, mi, nmi). Null-keyed rows
    * are excluded.
    *
    * Determinism at scale: every entropy is H = ln(n) − (Σ c·ln c)/n
    * where the Σ runs over cell or marginal counts — a float sum, so
    * each is collected, sorted by its key, and LEFT-FOLDED in that fixed
    * order (the q133 discipline); the oracle mirrors the same
    * `list_reduce`-over-`list_sort` tree. MI is composed from the three
    * UNROUNDED entropies in a fixed association
    * (h_a + h_b − h_ab), then rounded with the outputs.
    *
    * 100 TB shape: the only data-sized operation is the (a, b) cell
    * count — map-side combinable into at most `maxCells` rows (enforced
    * with a precount). Marginals re-aggregate the cell frame; the three
    * folds each collapse to one row and meet in a trivial one-row
    * cross join.
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String,
      maxCells: Long = 100000L): DataFrame = {
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__obs"))
    val nc = cells.count()
    require(nc <= maxCells,
      s"$aCol x $bCol has $nc contingency cells > $maxCells — " +
        "not a bounded categorical pair")
    // Σ c·ln(c) in sorted-key order: bit-identical across runs and
    // mirrorable in SQL (0.0-seeded left fold; 0.0 + x == x exactly)
    def nlogn(keys: Seq[String], cnt: String): org.apache.spark.sql.Column =
      aggregate(
        sort_array(collect_list(struct(
          keys.map(col) :+ col(cnt).cast("double").as("__c"): _*))),
        lit(0.0),
        (acc, s) => acc + s.getField("__c") * log(s.getField("__c")))
    val ab = cells.agg(
      sum(col("__obs")).as("n"),
      countDistinct(col("__a")).cast("long").as("ka"),
      countDistinct(col("__b")).cast("long").as("kb"),
      nlogn(Seq("__a", "__b"), "__obs").as("__fab"))
    val fa = cells.groupBy(col("__a")).agg(sum(col("__obs")).as("__ra"))
      .agg(nlogn(Seq("__a"), "__ra").as("__fa"))
    val fb = cells.groupBy(col("__b")).agg(sum(col("__obs")).as("__cb"))
      .agg(nlogn(Seq("__b"), "__cb").as("__fb"))
    val nD = col("n").cast("double")
    def h(fold: String) = log(nD) - col(fold) / nD
    val mi = h("__fa") + h("__fb") - h("__fab")
    ab.crossJoin(fa).crossJoin(fb)
      .select(col("n"), col("ka"), col("kb"),
        round(h("__fa"), 6).as("h_a"),
        round(h("__fb"), 6).as("h_b"),
        round(h("__fab"), 6).as("h_ab"),
        round(mi, 6).as("mi"),
        when(col("ka") === 1 || col("kb") === 1, lit(null).cast("double"))
          .otherwise(round(mi / sqrt(h("__fa") * h("__fb")), 6)).as("nmi"))
  }

  /** Confusion matrix between an actual and a predicted categorical
    * column: per observed (actual, predicted) cell the count, both
    * marginal totals, and the recall/precision shares — WHERE the
    * disagreement [[cohenKappa]] summarizes actually lives ("zh is
    * fine, the en↔fr confusion is the problem"). One row per observed
    * cell; null-keyed rows are excluded.
    *
    * Exactness: counts are exact BIGINTs; recall = n/n_actual and
    * precision = n/n_predicted are single IEEE quotients, round(…, 6).
    *
    * 100 TB shape: one map-side-combinable cell count bounded by
    * `maxCells`; both marginals re-aggregate the cell frame and come
    * back as broadcasts.
    */
  def confusionMatrix(df: DataFrame, actualCol: String, predCol: String,
      maxCells: Long = 100000L): DataFrame = {
    val cells = df
      .filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).cast("string").as("actual"),
        col(predCol).cast("string").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val nc = cells.count()
    require(nc <= maxCells,
      s"$actualCol x $predCol has $nc cells > $maxCells — " +
        "not a bounded categorical pair")
    val aTot = cells.groupBy(col("actual"))
      .agg(sum(col("n")).as("n_actual"))
    val pTot = cells.groupBy(col("predicted"))
      .agg(sum(col("n")).as("n_predicted"))
    cells
      .join(broadcast(aTot), Seq("actual"))
      .join(broadcast(pTot), Seq("predicted"))
      .select(col("actual"), col("predicted"), col("n"),
        col("n_actual"), col("n_predicted"),
        round(col("n").cast("double") / col("n_actual"), 6).as("recall"),
        round(col("n").cast("double") / col("n_predicted"), 6)
          .as("precision"))
  }

  /** Cohen's κ agreement between two categorical columns — the
    * chance-corrected "do these two labelings actually agree" score
    * (declared vs predicted language, two annotator passes, old vs new
    * classifier). Observed agreement p_o is the diagonal mass; expected
    * agreement p_e is Σ ra·cb/n² over values shared by both margins;
    * κ = (p_o − p_e)/(1 − p_e). One output row:
    * (n, n_agree, po, pe, kappa); κ is null when p_e = 1 (both columns
    * constant on the same value — agreement is vacuous). Null-keyed
    * rows are excluded.
    *
    * Determinism: the diagonal mass is an exact BIGINT sum; p_e's
    * Σ ra·cb runs in doubles (BIGINT products overflow at ~10⁹-row
    * margins), so it is collected over the shared-value frame, sorted,
    * and LEFT-FOLDED in value order (the q133/q149 discipline), and
    * the κ tree composes the unrounded p_o/p_e in a fixed association
    * mirrored textually in the oracle.
    *
    * 100 TB shape: one map-side-combinable (a, b) cell count bounded
    * by `maxCells`; marginals re-aggregate the cell frame; the fold
    * lives on one row.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
      maxCells: Long = 100000L): DataFrame = {
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__obs"))
    val nc = cells.count()
    require(nc <= maxCells,
      s"$aCol x $bCol has $nc contingency cells > $maxCells — " +
        "not a bounded categorical pair")
    val ab = cells.agg(sum(col("__obs")).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__obs"))), lit(0L))
        .as("n_agree"))
    val aTot = cells.groupBy(col("__a").as("__v"))
      .agg(sum(col("__obs")).as("__ra"))
    val bTot = cells.groupBy(col("__b").as("__v"))
      .agg(sum(col("__obs")).as("__cb"))
    val fe = aTot.join(bTot, Seq("__v"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("__v"),
          (col("__ra").cast("double") * col("__cb")).as("__x")))),
        lit(0.0), (acc, s) => acc + s.getField("__x")).as("__fe"))
    val nD = col("n").cast("double")
    val po = col("n_agree").cast("double") / col("n")
    val pe = col("__fe") / nD / nD
    ab.crossJoin(fe).select(col("n"), col("n_agree"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Association strength between two categorical columns: Pearson χ²
    * over the observed contingency cells plus Cramér's V
    * (√(χ² / (n·min(k_a−1, k_b−1)))) — the "are lang and source
    * independent" number. Null-keyed rows are excluded; dof = 0 (either
    * column single-valued) yields null V. One output row:
    * (n, n_cells, dof, chi2, v).
    *
    * Determinism at scale: a parallel double sum is run-to-run
    * nondeterministic (addition order floats with partitioning), so the
    * χ² contributions are collected, sorted by cell key, and LEFT-FOLDED
    * in that fixed order — bit-identical every run and oracle-mirrorable
    * (`list_reduce` over `list_sort`). That array lives on one row,
    * which is why the bounded-domain contract (`maxCells`, enforced
    * with a precount on the already-aggregated cell frame) exists.
    *
    * 100 TB shape: the only data-sized operation is the (a, b) count —
    * map-side combinable into at most `maxCells` rows. Marginals and
    * the total re-aggregate that cell frame (identical exchange, reused
    * by Spark), then join back as broadcasts; everything after the
    * first agg touches cell-domain rows only.
    */
  def contingencyAssociation(df: DataFrame, aCol: String, bCol: String,
      maxCells: Long = 100000L): DataFrame = {
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__obs"))
    val nc = cells.count()
    require(nc <= maxCells,
      s"$aCol x $bCol has $nc contingency cells > $maxCells — " +
        "not a bounded categorical pair")
    val aTot = cells.groupBy(col("__a")).agg(sum(col("__obs")).as("__ra"))
    val bTot = cells.groupBy(col("__b")).agg(sum(col("__obs")).as("__cb"))
    val tot = cells.agg(sum(col("__obs")).as("__n"))
    // computational form χ² = Σ_observed n·obs²/(ra·cb) − n: the zero
    // cells the textbook sum ranges over contribute exactly their
    // expected count, already folded into the −n term — so the sparse
    // cell frame suffices. All factors go through double BEFORE
    // multiplying (obs² in BIGINT would wrap at ~3e9-row cells).
    val o = col("__obs").cast("double")
    val joined = cells
      .join(broadcast(aTot), Seq("__a")).join(broadcast(bTot), Seq("__b"))
      .crossJoin(broadcast(tot))
      .select(col("__a"), col("__b"), col("__n"),
        ((col("__n").cast("double") * (o * o)) /
          (col("__ra").cast("double") * col("__cb"))).as("__c"))
    val folded = joined.agg(
      max(col("__n")).as("n"),
      count(lit(1)).cast("long").as("n_cells"),
      countDistinct(col("__a")).cast("long").as("__ka"),
      countDistinct(col("__b")).cast("long").as("__kb"),
      aggregate(
        sort_array(collect_list(struct(col("__a"), col("__b"), col("__c")))),
        lit(0.0), (acc, s) => acc + s.getField("__c")).as("__fold"))
    val chi2 = col("__fold") - col("n")
    val dof = (col("__ka") - 1) * (col("__kb") - 1)
    folded.select(col("n"), col("n_cells"), dof.as("dof"),
      round(chi2, 6).as("chi2"),
      when(dof === 0, lit(null).cast("double"))
        .otherwise(round(sqrt(greatest(chi2, lit(0.0)) /
          (col("n").cast("double") * least(col("__ka") - 1, col("__kb") - 1))),
          6)).as("v"))
  }

  /** Per-group quantiles from the mergeable KLL-style sketch
    * ([[graft.functions.QuantileSketchAgg]]): one row per (group, p)
    * with the estimated value and the group's non-null count. One
    * bounded-state aggregation — the shuffle carries ≤ k·log(n/k)
    * (value, weight) pairs per (partition, group) instead of the whole
    * value column; contrast with the exact type-1 paths
    * ([[sessionstats]] machinery), which are exact but sort/shuffle
    * group-sized data. Exact (and oracle-gated) while groups hold
    * fewer than k values; rank error in the large-group regime is
    * spec-bounded.
    */
  def sketchQuantilesPerGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], k: Int): DataFrame = {
    require(ps.nonEmpty, "ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"quantiles in [0,1]: $ps")
    require(ps.distinct.size == ps.size, s"duplicate quantiles: $ps")
    import graft.functions.QuantileSketchAgg
    quantilesFromSketches(
      df.groupBy(col(groupCol))
        .agg(QuantileSketchAgg.sketch(col(valueCol).cast("double"), k)
          .as("__sk")),
      groupCol, ps)
  }

  /** Expand a (group, __sk) sketch frame into (group, p, q_value, n)
    * rows — shared by the batch and streaming quantile-sketch faces.
    */
  def quantilesFromSketches(sketches: DataFrame, groupCol: String,
      ps: Seq[Double]): DataFrame = {
    import graft.functions.QuantileSketchAgg
    sketches
      .select(col(groupCol), col("__sk"), explode(typedlit(ps)).as("p"))
      .select(col(groupCol), col("p"),
        QuantileSketchAgg.sketchQuantile(col("__sk"), col("p"))
          .as("q_value"),
        col("__sk")("n").as("n"))
  }
}
