package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log: for each user, the
  * earliest completion time of each step matched GREEDILY in order —
  * step i+1 counts only from an event STRICTLY after the matched step i
  * ("view → click → purchase, in that order"). The product-analytics
  * staple next to [[Sessionize]].
  *
  * Semantics: users appear iff they completed step 1; `step_ts_i` is
  * null once the chain breaks; `n_completed` counts the filled prefix.
  * Greedy earliest-match is the standard funnel convention (taking the
  * earliest step-1 time can only enlarge the set of valid later
  * matches, so greedy is optimal — a user completes the funnel iff ANY
  * ordered assignment exists).
  *
  * 100 TB shape: one filtered map-side-combinable min-aggregation per
  * step plus an equi-join on the user key — k steps = k bounded
  * shuffles, no per-user window over the raw event stream, no
  * collect_list of a power user's million events into one task. The
  * step frames carry (user, one timestamp).
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts_1"))
    val chained = steps.tail.zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val prev = s"step_ts_${i + 1}"
        val cur = s"step_ts_${i + 2}"
        val nxt = events.filter(col(typeCol) === st)
          .join(acc.select(col(userCol), col(prev)), Seq(userCol))
          .filter(col(tsCol) > col(prev))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
        acc.join(nxt, Seq(userCol), "left")
    }
    val stepCols = steps.indices.map(i => col(s"step_ts_${i + 1}"))
    chained.withColumn("n_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** Weekly cohort retention matrix: users cohorted by the ISO week of
    * their FIRST activity; `n_users` = distinct users of each cohort
    * active in each later week (week_offset 0 = the cohort week itself).
    * The activation/churn dashboard behind every engagement review.
    *
    * 100 TB shape: the cohort frame is one row per user (min-date
    * aggregation, map-side combinable); activity days dedupe to
    * (user, week) BEFORE the matrix count, so a user's million events in
    * a week are one row into the final aggregation. Offsets are exact
    * integer day arithmetic between week-start dates (always multiples
    * of 7 — no timezone or DST drift in the division).
    */
  def retentionMatrix(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ev = events.select(col(userCol), to_date(col(tsCol)).as("__d"))
    val cohort = ev.groupBy(col(userCol)).agg(min(col("__d")).as("__d0"))
    ev.join(cohort, Seq(userCol))
      .select(col(userCol),
        date_trunc("week", col("__d0")).cast("date").as("cohort_week"),
        (datediff(date_trunc("week", col("__d")).cast("date"),
            date_trunc("week", col("__d0")).cast("date")) / 7)
          .cast("int").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Rolling engagement: for every activity day, the distinct users
    * active that day (`dau`) and in the `windowDays`-day window ending
    * that day (`wau` at the default 7).
    *
    * `count(DISTINCT user) OVER (RANGE 6 PRECEDING)` is not legal SQL and
    * the rewrites that fake it (collect_set over a range window) hold a
    * window's users in one task. Instead: dedupe activity to (day, user)
    * FIRST — the power-user collapse, a million events by one user in one
    * day become one row — then explode each pair into the `windowDays`
    * window-end days it credits, and count distinct per end day. The
    * ×windowDays fan-out multiplies the DEDUPED frame, not the event log
    * (at scale |day,user| ≪ |events|), and the count lands in one
    * hash-partitioned aggregate with no per-day state.
    *
    * Only days with activity are emitted (a silent calendar day has no
    * row; its absence IS the datapoint).
    */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays: $windowDays")
    val au = events
      .select(to_date(col(tsCol)).as("__d"), col(userCol)).distinct()
    val days = au.select(col("__d").as("day")).distinct()
    au.withColumn("day",
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1))))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(
        countDistinct(when(col("__d") === col("day"), col(userCol)))
          .as("dau"),
        countDistinct(col(userCol)).as("wau"))
  }

  /** Behavioral path analysis: the corpus-wide top-`k` length-`n`
    * event-type sequences (each user's events ordered by (ts, tie),
    * slid over with an n-window) — "what do users actually DO, in what
    * order", the path-mining face of [[funnel]] (funnel checks ONE
    * hypothesized order; this discovers the orders worth hypothesizing).
    *
    * Determinism: the per-user ordering ties on `tieCol` (a unique event
    * id), so the extracted paths are reproducible.
    *
    * Scale shape: one groupBy-user collect (each user's sequence must
    * meet in one place — inherent to ordered paths; a power user with
    * millions of events deserves [[Sampling.capPerGroup]] FIRST, the
    * histogram-bounded cap built for exactly that skew), then the
    * n-gram fan-out is map-side (transform over index + slice — ≤1
    * gram per event) into a map-side-combinable count and a TakeOrdered
    * top-k. No all-users window, no driver state.
    */
  /** Transition-time analytics: for each consecutive event-type
    * transition (prev→next within a user's (ts, tie)-ordered stream),
    * the exact `p`-quantile of the gap in microseconds — think-time /
    * latency per step, the "how long do users hesitate before buying"
    * companion to [[pathNgrams]].
    *
    * Scale shape: one per-user lag window (user-bounded partitions),
    * then [[Sampling.quantilePerGroup]]'s histogram machinery — the
    * quantile window input is the distinct gap values per transition,
    * never the raw event rows.
    */
  def transitionTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, p: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gaps = events
      .withColumn("__pt", lag(col(typeCol), 1).over(w))
      .withColumn("__pts", lag(col(tsCol), 1).over(w))
      .filter(col("__pt").isNotNull)
      .select(
        concat(col("__pt"), lit(">"), col(typeCol)).as("transition"),
        (unix_micros(col(tsCol)) - unix_micros(col("__pts"))).as("gap_us"))
    graft.operators.Sampling.quantilePerGroup(gaps, "transition",
      "gap_us", p)
  }

  /** Step-conversion curve over [[funnel]]'s output: per step, how many
    * users reached AT LEAST that step, the share of step-1 entrants
    * surviving to it, and the step-over-step conversion rate — the
    * drop-off table every funnel review actually reads (the raw funnel
    * frame answers per-user questions; this is the aggregate). One row
    * per step: (step, step_name, n_users, rate_vs_first, rate_vs_prev);
    * rate_vs_prev is null at step 1, and both rates null out on a zero
    * denominator (empty funnel).
    *
    * Exactness: reached-counts are exact BIGINTs (sums over the
    * n_completed histogram); rates are single IEEE quotients,
    * round(…, 6), mirrored verbatim.
    *
    * 100 TB shape: [[funnel]]'s per-step min-aggregations do the
    * data-sized work; everything here runs on the (steps+1)-row
    * histogram — the windows are bounded by the step count.
    */
  def conversionCurve(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = funnel(events, userCol, typeCol, tsCol, steps)
    val hist = f.groupBy(col("n_completed")).agg(count(lit(1)).as("__c"))
    val stepsDf = events.sparkSession.range(1, steps.size + 1)
      .toDF("step")
      .withColumn("step_name",
        element_at(array(steps.map(lit): _*), col("step").cast("int")))
    val reach = stepsDf
      .join(hist, col("n_completed") >= col("step"), "left")
      .groupBy(col("step"), col("step_name"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_users"))
    val wFull = Window.orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    reach
      .withColumn("__n1",
        max(when(col("step") === 1, col("n_users"))).over(wFull))
      .withColumn("__prev",
        lag(col("n_users"), 1).over(Window.orderBy(col("step"))))
      .select(col("step"), col("step_name"), col("n_users"),
        when(col("__n1") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_users").cast("double") / col("__n1"), 6))
          .as("rate_vs_first"),
        when(col("__prev").isNull || col("__prev") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("n_users").cast("double") / col("__prev"), 6))
          .as("rate_vs_prev"))
  }

  /** Funnel completion latency: for users who complete the whole
    * funnel, the exact type-1 quantiles of first-step → last-step
    * elapsed time in whole seconds — "a user who buys does it within
    * 40 minutes of the first view, p90 within 3 hours" ([[funnel]]
    * finds who converts, [[conversionCurve]] how many, this how fast).
    * Durations floor to whole seconds (the q144 floor-not-CAST rule).
    * One row per requested p: (p, latency_s, n_users).
    *
    * 100 TB shape: [[funnel]]'s per-step min-aggregations, a narrow
    * completion filter, then the histogram quantile machinery — the
    * final window sees distinct whole-second latencies, never users.
    */
  def stepLatency(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    require(steps.size >= 2, s"need at least two steps: $steps")
    val f = funnel(events, userCol, typeCol, tsCol, steps)
    val last = s"step_ts_${steps.size}"
    val lat = f.filter(col(last).isNotNull)
      .select(floor((unix_micros(col(last)) -
          unix_micros(col("step_ts_1"))) / 1000000)
        .cast("long").as("latency_s"))
      .withColumn("__g", lit("all"))
    graft.operators.Sampling.quantilesPerGroup(lat, "__g", "latency_s", ps)
      .select(col("p"), col("quantile").as("latency_s"),
        col("n").as("n_users"))
  }

  /** First-order Markov transition matrix over event types: for each
    * observed (from → to) step in a user's (ts, tie)-ordered stream,
    * the count, the total transitions leaving `from`, and the
    * row-normalized probability — the behavioral fingerprint next to
    * [[transitionTimes]]' think-time quantiles (same steps, "where do
    * users go" instead of "how long do they wait"). Transitions never
    * cross users. One row per observed (from, to) cell:
    * (from_type, to_type, n, n_from, prob).
    *
    * Exactness: prob is one IEEE quotient of exact BIGINT counts,
    * round(…, 6), mirrored verbatim in the oracle.
    *
    * 100 TB shape: one per-user lag window (user-bounded partitions),
    * then a map-side-combinable (from, to) count into type²-bounded
    * cells; the from-totals re-aggregate that cell frame and join back
    * as a broadcast — nothing after the first window touches event
    * volume.
    */
  def transitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val cells = events
      .withColumn("__pt", lag(col(typeCol), 1).over(w))
      .filter(col("__pt").isNotNull)
      .groupBy(col("__pt").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = cells.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    cells.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("prob"))
  }

  /** Association rules over user-level event-type baskets: for every
    * ordered rule A→B (both directions of each co-occurring unordered
    * pair), the classic market-basket metrics — support
    * (users with both / all users), confidence (users with both / users
    * with A), lift (confidence / baseline rate of B). Lift > 1 says the
    * behaviors attract; the unordered complement of [[pathNgrams]]'
    * sequence mining (a rule here ignores event ORDER entirely).
    *
    * Exactness: all three metrics are quotients of exact BIGINT counts
    * in fixed left-assoc IEEE chains, mirrored verbatim in the oracle.
    *
    * 100 TB shape: baskets collapse to distinct (user, type) FIRST
    * (map-side combinable — a user's million clicks are one row), the
    * pair product is keyed on the user (never cross-user), and its
    * fan-out is bounded by the event-TYPE domain squared per user, not
    * by event volume. Item counts and the user total are tiny
    * broadcast-joined side frames.
    */
  def associationRules(events: DataFrame, userCol: String,
      typeCol: String, minPairUsers: Long = 2): DataFrame = {
    require(minPairUsers >= 1, s"minPairUsers must be positive: $minPairUsers")
    val items = events
      .select(col(userCol).as("__u"), col(typeCol).as("__it")).distinct()
    val itemCounts = items.groupBy(col("__it"))
      .agg(count(lit(1)).as("__n"))
    val totals = items.agg(countDistinct(col("__u")).as("__nu"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.__u") === col("b.__u") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("__ia"), col("b.__it").as("__ib"))
      .agg(count(lit(1)).as("pair_users"))
      .filter(col("pair_users") >= minPairUsers)
    val rules = pairs.select(col("__ia").as("antecedent"),
        col("__ib").as("consequent"), col("pair_users"))
      .union(pairs.select(col("__ib"), col("__ia"), col("pair_users")))
    rules
      .join(broadcast(itemCounts.select(col("__it").as("antecedent"),
        col("__n").as("n_antecedent"))), Seq("antecedent"))
      .join(broadcast(itemCounts.select(col("__it").as("consequent"),
        col("__n").as("n_consequent"))), Seq("consequent"))
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("pair_users"),
        col("n_antecedent"), col("n_consequent"),
        round(col("pair_users").cast("double") / col("__nu"), 6)
          .as("support"),
        round(col("pair_users").cast("double") / col("n_antecedent"), 6)
          .as("confidence"),
        round(col("pair_users").cast("double") * col("__nu") /
          col("n_antecedent") / col("n_consequent"), 6).as("lift"))
  }

  def pathNgrams(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, n: Int = 3,
      k: Int = 10): DataFrame = {
    require(n >= 2, s"n must be >= 2: $n")
    require(k >= 1, s"k must be positive: $k")
    val seqs = events.groupBy(col(userCol))
      .agg(transform(
        array_sort(collect_list(
          struct(col(tsCol), col(tieCol), col(typeCol).as("__t")))),
        e => e.getField("__t")).as("__seq"))
    seqs.filter(size(col("__seq")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("__seq")) - (n - 1)),
        i => array_join(slice(col("__seq"), i, lit(n)), ">"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }
}
