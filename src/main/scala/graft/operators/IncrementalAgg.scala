package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped aggregates: keep a PARTIAL-
  * aggregate state table (count + sums per group, optionally min/max) and
  * fold delta batches into it, so refreshing a 100 TB materialization
  * costs one shuffle of the DELTA plus the state partials — never a
  * rescan of the base table.
  *
  * The reference recomputes its materializations from the full source on
  * every run (reference: src/main/scala/com/adidas/analytics/algo/Materialization.scala
  * — full/range/query views are land-and-replace); this face adds the
  * self-maintaining form for the algebraic aggregates where it is exact:
  *
  *  - COUNT and SUM are retractable: a delta row with weight -1 (a
  *    delete, carrying the original row's values) subtracts exactly;
  *    groups whose maintained count reaches 0 leave the state.
  *  - AVG is served from sum/count, never stored.
  *  - MIN/MAX are maintained for INSERT-ONLY deltas (they are not
  *    retractable without per-group value multisets); passing a weight
  *    column together with min/max columns fails fast.
  *
  * Exactness contract: sums retract exactly when the summed columns are
  * exact types (long/decimal). Callers quantize doubles first (the repo's
  * cents/BIGINT device) — floating-point sums are order-dependent, so a
  * retracted double sum may drift from a recompute by ulps.
  *
  * State size is |distinct groups| × (2 + #sumCols + #minmax) columns of
  * scalars — the same cardinality the final view has. Refresh plan shape:
  * partial-agg the delta (map-side combine), union with the state's
  * partials, one shuffle keyed on the group columns. Both sides of that
  * union are pre-aggregated, so the exchange carries group-cardinality
  * rows, not row-cardinality.
  */
object IncrementalAgg {

  private def stateCols(sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): Seq[String] =
    Seq("n_rows") ++ sumCols.map("sum_" + _) ++
      minCols.map("min_" + _) ++ maxCols.map("max_" + _)

  /** The exact column set a state table carries for this aggregate
    * shape — exposed so long-lived maintenance loops can fail fast on
    * config drift against a persisted state instead of crashing with an
    * unresolved-column error deep in plan resolution.
    */
  def stateColumns(keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty): Seq[String] =
    keys ++ stateCols(sumCols, minCols, maxCols)

  /** Partial-aggregate `df` into state shape, each row counted with
    * `weight` (+1 insert / -1 delete).
    */
  private def partials(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String], maxCols: Seq[String],
      weight: Column): DataFrame = {
    val aggs =
      sum(weight).as("n_rows") +:
        (sumCols.map(c => sum(col(c) * weight).as(s"sum_$c")) ++
          minCols.map(c => min(col(c)).as(s"min_$c")) ++
          maxCols.map(c => max(col(c)).as(s"max_$c")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build the initial state from the base table (all rows weight +1). */
  def init(base: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty): DataFrame =
    partials(base, keys, sumCols, minCols, maxCols, lit(1L))

  /** Fold a delta batch into the state. `weightCol` (if set) names a
    * column of +1/-1 row weights on `delta`; deletes must carry the
    * original row's values. Without it the delta is insert-only.
    *
    * Associative: refreshing with delta d1 then d2 equals refreshing
    * with d1 ∪ d2 (state is a commutative monoid under this fold).
    */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty,
      weightCol: Option[String] = None): DataFrame = {
    require(weightCol.isEmpty || (minCols.isEmpty && maxCols.isEmpty),
      "min/max are not retractable: they require insert-only deltas " +
        "(no weight column)")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val d = partials(delta, keys, sumCols, minCols, maxCols, w)
    val merged = state.unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(
        sum("n_rows").as("n_rows"),
        (sumCols.map(c => sum(s"sum_$c").as(s"sum_$c")) ++
          minCols.map(c => min(s"min_$c").as(s"min_$c")) ++
          maxCols.map(c => max(s"max_$c").as(s"max_$c"))): _*)
    // a group whose rows were all retracted leaves the view entirely
    merged.filter(col("n_rows") > 0)
      .select((keys ++ stateCols(sumCols, minCols, maxCols)).map(col): _*)
  }

  /** Fold a [[graft.catalog.VersionedTable.changeFeed]] batch into the
    * state: change rows weight +1 for insert/update_postimage and -1 for
    * delete/update_preimage (an update retracts its preimage and adds its
    * postimage — exact for the algebraic count/sum state). This is the
    * maintenance loop the two components compose into: a versioned base
    * table's v(N)→v(N+1) feed maintains its aggregate views with no
    * manual delta construction, at delta-cardinality cost.
    */
  def refreshFromChanges(state: DataFrame, changes: DataFrame,
      keys: Seq[String], sumCols: Seq[String]): DataFrame =
    refresh(state, cdcWeighted(changes), keys, sumCols,
      weightCol = Some("cdc_w"))

  /** [[refreshFromChanges]] WITH min/max maintenance: count/sum retract
    * algebraically from the CDC weights; min/max recompute only the
    * groups the feed touched, from `newBase` (the base table AFTER the
    * change batch — for a versioned base, `readVersion` at the version
    * the feed leads to), via [[refreshWithRecompute]]'s broadcast-
    * semi-join-pruned scan.
    */
  def refreshFromChangesWithRecompute(state: DataFrame,
      changes: DataFrame, newBase: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): DataFrame =
    refreshWithRecompute(state, cdcWeighted(changes), newBase, keys,
      sumCols, minCols, maxCols, Some("cdc_w"))

  /** CDC rows as a ±1-weighted delta: insert/update_postimage add,
    * delete/update_preimage retract. An unknown change_type must fail,
    * not silently weight-0 — raised from inside the plan without a
    * separate validation pass.
    */
  private def cdcWeighted(changes: DataFrame): DataFrame = {
    val ct = col("change_type")
    val known = Seq("insert", "update_postimage", "delete",
      "update_preimage")
    changes.withColumn("cdc_w",
        when(ct.isin("insert", "update_postimage"), lit(1L))
          .when(ct.isin("delete", "update_preimage"), lit(-1L)))
      .withColumn("cdc_w",
        when(col("cdc_w").isNotNull, col("cdc_w")).otherwise(
          raise_error(concat(lit("unknown change_type: "), ct,
            lit(s" (expected one of ${known.mkString(", ")})")))))
  }

  /** Weighted refresh WITH min/max maintenance: min/max are not
    * retractable from partials alone, so the groups the delta touches are
    * recomputed from `newBase` (the base table AFTER the delta) behind a
    * semi-join on the delta's key set, while count/sum stay algebraic and
    * untouched groups keep their state min/max without any base scan.
    * Refresh cost: the delta shuffle (group-cardinality partials, as
    * [[refresh]]) plus ONE semi-join-pruned scan of the touched groups'
    * base rows — never a full recompute. The delta key set is broadcast
    * (a delta touches few groups by contract); at 100 TB the base-side
    * scan still prunes by partition/file stats on the key columns where
    * the layout provides them.
    */
  def refreshWithRecompute(state: DataFrame, delta: DataFrame,
      newBase: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      weightCol: Option[String]): DataFrame = {
    require(minCols.nonEmpty || maxCols.nonEmpty,
      "refreshWithRecompute exists for min/max maintenance; use refresh " +
        "for pure count/sum state")
    val keyCols = keys.map(col)
    val algebraicState =
      state.select((keys ++ stateCols(sumCols, Seq.empty, Seq.empty))
        .map(col): _*)
    val algebraic = refresh(algebraicState, delta, keys, sumCols,
      weightCol = weightCol)
    val touched = delta.select(keyCols: _*).distinct()
    // every key join below is NULL-SAFE: groupBy keeps a NULL-keyed
    // group (init/refresh both maintain it), so a USING join here would
    // silently drop that group from the view the moment min/max
    // maintenance is enabled — <=> matches changedJoin's convention
    def nullSafe(l: String, r: String): Column =
      keys.map(k => col(s"$l.`$k`") <=> col(s"$r.`$k`")).reduce(_ && _)
    val mmAggs = minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))
    val recomputed = newBase.as("nb")
      .join(broadcast(touched).as("tk"), nullSafe("nb", "tk"),
        "left_semi")
      .groupBy(keyCols: _*).agg(mmAggs.head, mmAggs.tail: _*)
    val mmNames = minCols.map("min_" + _) ++ maxCols.map("max_" + _)
    val untouched = state.select((keys ++ mmNames).map(col): _*).as("st")
      .join(broadcast(touched).as("tk"), nullSafe("st", "tk"),
        "left_anti")
    val minmax = untouched.unionByName(recomputed)
    // inner: a fully-retracted group left `algebraic`; a brand-new group
    // is in `touched`, hence in `recomputed`
    algebraic.as("a").join(minmax.as("mm"), nullSafe("a", "mm"))
      .select(keys.map(k => col(s"a.`$k`").as(k)) ++
        (Seq("n_rows") ++ sumCols.map("sum_" + _))
          .map(c => col(s"a.`$c`")) ++
        mmNames.map(c => col(s"mm.`$c`")): _*)
  }

  /** The queryable view: state plus derived averages (exact division
    * deferred to serve time; avg columns are doubles, rounded by the
    * caller if they cross an engine boundary).
    */
  def serve(state: DataFrame, sumCols: Seq[String]): DataFrame =
    sumCols.foldLeft(state) { (df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows"))
    }
}
