package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation gate a curation
  * pipeline runs before promoting a load (the Deequ/Great-Expectations
  * product shape, re-expressed as Catalyst aggregates).
  *
  * Three evaluation regimes, each the cheapest plan its rule class
  * admits:
  *
  *  - row-level rules ([[Checks.notNull]], [[Checks.inRange]],
  *    [[Checks.matches]], [[Checks.satisfies]]) all fold into ONE
  *    map-side-combinable aggregation pass — one `sum(violates)` column
  *    per rule, one scan, one 1-row result, regardless of rule count;
  *  - [[Checks.unique]] needs the duplicate groups: one hash aggregation
  *    on the key, violations = Σ(group size − 1), the key never leaves
  *    the aggregate (no content shuffle);
  *  - [[Checks.referential]] is a left-anti join against the DISTINCT
  *    reference keys — AQE broadcasts the dim side when it is small,
  *    the usual case for FK domains.
  *
  * Results land in one frame `(check_name, violations, total, passed)` —
  * a dataset of facts, joinable into audit logs, not an exception. Use
  * `require(Checks.allPassed(...))` at the call site when a hard gate is
  * wanted.
  */
object Checks {

  /** One rule: `name` labels the output row; exactly one of `violates`
    * (row-level predicate) / `uniqueCols` / `ref` is set.
    */
  final case class Check private[Checks] (
      name: String,
      violates: Option[Column] = None,
      uniqueCols: Seq[String] = Nil,
      ref: Option[(DataFrame, String, String)] = None)

  /** Row-level: `col` must not be null. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", violates = Some(col(s"`$c`").isNull))

  /** Row-level: `col` within [lo, hi]; nulls violate. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      violates = Some(!col(s"`$c`").between(lo, hi) ||
        col(s"`$c`").isNull))

  /** Row-level: string column matches the regex; nulls violate. */
  def matches(c: String, regex: String): Check =
    Check(s"matches($c)",
      violates = Some(!col(s"`$c`").rlike(regex) || col(s"`$c`").isNull))

  /** Row-level: rows where `predicate` is NOT true violate. */
  def satisfies(name: String, predicate: Column): Check =
    Check(s"satisfies($name)", violates = Some(!coalesce(predicate,
      lit(false))))

  /** Group-level: the column tuple is unique; violations = extra rows
    * beyond the first of each duplicate group.
    */
  def unique(cols: String*): Check =
    Check(s"unique(${cols.mkString(",")})", uniqueCols = cols)

  /** Referential: every `c` value exists in `dim.dimCol` (FK check);
    * violations = rows whose key has no match. Null keys violate (an FK
    * that allows null belongs in a separate nullable rule, not hidden
    * here).
    */
  def referential(c: String, dim: DataFrame, dimCol: String): Check =
    Check(s"referential($c)", ref = Some((dim, c, dimCol)))

  /** Column-profile report — the first thing a data review opens: per
    * column the row count, null count and rate, and the exact distinct
    * count ("source has 4 values, lang is 3% null, doc_id is unique").
    * One row per profiled column:
    * (column, n, n_null, n_distinct, null_rate); null_rate is null on
    * an empty frame.
    *
    * 100 TB shape: ONE aggregation statement (null counts are map-side
    * combinable; each exact countDistinct expands to Spark's standard
    * two-phase distinct aggregation) — profile cost scales with the
    * scan plus one distinct pass per column, and the row fan-out
    * happens on the single result row.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.distinct == cols, s"duplicate columns: $cols")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      countDistinct(col(s"`$c`")).as(s"__nd_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map(c => struct(lit(c).as("column"),
      col("__n").as("n"), col(s"`__null_$c`").as("n_null"),
      col(s"`__nd_$c`").as("n_distinct")))
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
      .withColumn("null_rate",
        when(col("n") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_null").cast("double") / col("n"), 6)))
  }

  /** k-anonymity risk report over a set of quasi-identifier columns —
    * the privacy audit a release pipeline runs before publishing rows
    * whose attribute COMBINATIONS could single people out even after
    * direct identifiers are redacted (Sweeney's k-anonymity: every row
    * must share its quasi-identifier tuple with at least k−1 others).
    * Nulls count as values (a null quasi-tuple is itself a class, as
    * both Spark and SQL GROUP BY treat it). One output row:
    * (n_rows, n_classes, min_class_size, n_risky_classes, n_risky_rows,
    * risky_rate) where a class is risky when its size < k —
    * `min_class_size >= k` IS the k-anonymity property.
    *
    * 100 TB shape: ONE hash aggregation on the quasi columns (map-side
    * combinable counts; only the quasi tuple shuffles, never row
    * content), then one map-side-combinable agg over the class-sized
    * frame into a single row. Cost is a groupBy-count regardless of k.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(quasiCols.distinct == quasiCols,
      s"duplicate quasi columns: $quasiCols")
    require(k >= 2, s"k must be >= 2: $k")
    val classes = df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__sz"))
    classes.agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__sz")).as("min_class_size"),
        count(when(col("__sz") < k, lit(1))).as("n_risky_classes"),
        coalesce(sum(when(col("__sz") < k, col("__sz"))), lit(0L))
          .as("n_risky_rows"))
      .withColumn("risky_rate",
        when(col("n_rows") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_risky_rows").cast("double")
            / col("n_rows"), 6)))
  }

  /** l-diversity risk report (Machanavajjhala et al. 2007) — the audit
    * k-anonymity leaves open: a class can hold k rows and STILL leak
    * when all k share one sensitive value (the homogeneity attack:
    * knowing someone is in the class reveals their attribute). Distinct
    * l-diversity: every quasi-identifier class must contain at least l
    * distinct sensitive values. Nulls group quasi-tuples as in
    * [[kAnonymityReport]]; a NULL sensitive value does not count toward
    * diversity (both engines' count(DISTINCT) semantics). One output
    * row: (n_rows, n_classes, min_diversity, n_risky_classes,
    * n_risky_rows, risky_rate) with a class risky when its distinct
    * sensitive count < l — `min_diversity >= l` IS the property.
    *
    * 100 TB shape: ONE aggregation keyed by the quasi tuple computing
    * (count, exact countDistinct sensitive) — the distinct forces the
    * classic two-phase expand, bounded by class×sensitive cardinality,
    * never row content — then one map-side agg to a single row.
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(quasiCols.distinct == quasiCols,
      s"duplicate quasi columns: $quasiCols")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi column")
    require(l >= 2, s"l must be >= 2: $l")
    val classes = df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__sz"),
        countDistinct(col(s"`$sensitiveCol`")).as("__div"))
    classes.agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__div")).as("min_diversity"),
        count(when(col("__div") < l, lit(1))).as("n_risky_classes"),
        coalesce(sum(when(col("__div") < l, col("__sz"))), lit(0L))
          .as("n_risky_rows"))
      .withColumn("risky_rate",
        when(col("n_rows") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_risky_rows").cast("double")
            / col("n_rows"), 6)))
  }

  /** Symmetric key reconciliation between two tables — the
    * referential-integrity REPORT next to [[referential]]'s one-sided
    * pass/fail rule: how many distinct keys each side holds, how many
    * are shared, and how many are orphaned on each side ("every doc
    * has an embedding and every embedding has a doc" audited in one
    * row before a join silently drops the difference). Null keys are
    * excluded on both sides (nullability is [[notNull]]'s job). One
    * output row:
    * (n_left_keys, n_right_keys, n_shared, n_left_only, n_right_only).
    *
    * 100 TB shape: each side collapses to its distinct keys first
    * (map-side combinable), then ONE key-equi full-outer join and one
    * map-side-combinable count pass — no content column ever shuffles.
    */
  def keyReconciliation(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val l = left.filter(col(s"`$leftKey`").isNotNull)
      .select(col(s"`$leftKey`").as("__lk")).distinct()
    val r = right.filter(col(s"`$rightKey`").isNotNull)
      .select(col(s"`$rightKey`").as("__rk")).distinct()
    l.join(r, col("__lk") === col("__rk"), "full_outer")
      .agg(count(col("__lk")).as("n_left_keys"),
        count(col("__rk")).as("n_right_keys"),
        count(when(col("__lk").isNotNull && col("__rk").isNotNull,
          lit(1))).as("n_shared"),
        count(when(col("__rk").isNull, lit(1))).as("n_left_only"),
        count(when(col("__lk").isNull, lit(1))).as("n_right_only"))
  }

  /** One FK edge for [[fkMatrix]]: child.childKey → parent.parentKey. */
  final case class FkEdge(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  /** Star-schema-wide referential-integrity matrix — every FK edge
    * audited in one report: per edge (edge, n_child_rows, n_child_keys,
    * n_orphan_keys, n_orphan_rows), where an orphan is a non-null child
    * key with no parent. The warehouse-promotion gate run across ALL
    * edges at once instead of [[referential]]'s single pass/fail rule.
    *
    * 100 TB shape: per edge, the child collapses to (key, count) with
    * one map-side-combinable aggregation (row content never shuffles),
    * then a left-anti join against the DISTINCT parent keys — AQE
    * broadcasts dimension-sized parents; the per-edge one-row results
    * union driver-free.
    */
  def fkMatrix(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "edges must be non-empty")
    require(edges.map(_.name).distinct.size == edges.size,
      s"duplicate edge names: ${edges.map(_.name)}")
    edges.map { e =>
      val keys = e.child.filter(col(s"`${e.childKey}`").isNotNull)
        .groupBy(col(s"`${e.childKey}`").as("__k"))
        .agg(count(lit(1)).as("__rows"))
      val parents = e.parent.filter(col(s"`${e.parentKey}`").isNotNull)
        .select(col(s"`${e.parentKey}`").as("__k")).distinct()
      val orphans = keys.join(parents, Seq("__k"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("__ok"),
          coalesce(sum(col("__rows")), lit(0L)).as("__or"))
      keys.agg(coalesce(sum(col("__rows")), lit(0L)).as("n_child_rows"),
          count(lit(1)).as("n_child_keys"))
        .crossJoin(orphans)
        .select(lit(e.name).as("edge"), col("n_child_rows"),
          col("n_child_keys"), col("__ok").as("n_orphan_keys"),
          col("__or").as("n_orphan_rows"))
    }.reduce(_ unionByName _)
  }

  /** Evaluate all checks; one row per check:
    * (check_name, violations, total, passed).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")

    val rowLevel = checks.filter(_.violates.nonEmpty)
    val rowFrame: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else {
        // ONE aggregation pass for all row-level rules AND the row
        // count — a row-level-only run never scans the input twice
        val aggs = count(lit(1)).as("__total") +: rowLevel.map(ch =>
          coalesce(sum(when(ch.violates.get, 1L).otherwise(0L)), lit(0L))
            .as(ch.name))
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(map(
          rowLevel.flatMap(ch =>
            Seq(lit(ch.name), col(s"`${ch.name}`"))): _*))
            .as(Seq("check_name", "violations")),
          col("__total").as("total")))
      }

    // group/ref rules scan the input anyway; they share one extra
    // count pass for the total column
    lazy val total = broadcast(df.agg(count(lit(1)).as("total")))

    val uniques = checks.filter(_.uniqueCols.nonEmpty).map { ch =>
      df.groupBy(ch.uniqueCols.map(c => col(s"`$c`")): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
        .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
        .select(lit(ch.name).as("check_name"), col("violations"))
        .crossJoin(total)
    }

    val refs = checks.filter(_.ref.nonEmpty).map { ch =>
      val (dim, c, dimCol) = ch.ref.get
      df.select(col(s"`$c`").as("__k"))
        .join(dim.select(col(s"`$dimCol`").as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(ch.name).as("check_name"), col("violations"))
        .crossJoin(total)
    }

    val parts = rowFrame.toSeq ++ uniques ++ refs
    parts.reduce(_.unionByName(_))
      .select(col("check_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
  }

  /** True iff every check in a [[run]] result passed. */
  def allPassed(results: DataFrame): Boolean =
    results.filter(!col("passed")).isEmpty

  /** Parse a compact string rule — the params-JSON surface:
    * `not_null:col`, `in_range:col:lo:hi`, `matches:col:regex`,
    * `unique:colA,colB`.
    */
  def parseRule(rule: String): Check = rule.split(":", 2).toSeq match {
    case Seq("not_null", c) => notNull(c)
    case Seq("in_range", rest) => rest.split(":").toSeq match {
      case Seq(c, lo, hi) => inRange(c, lo.toDouble, hi.toDouble)
      case _ => throw new IllegalArgumentException(
        s"in_range needs col:lo:hi - got: $rule")
    }
    case Seq("matches", rest) =>
      val Array(c, regex) = rest.split(":", 2)
      matches(c, regex)
    case Seq("unique", cs) => unique(cs.split(",").toIndexedSeq: _*)
    case _ => throw new IllegalArgumentException(s"unknown rule: $rule")
  }
}

/** The dataset-card report — the one-table corpus summary a training
  * run publishes alongside its data (docs/tokens/source mix/dup rate):
  * a tall (metric, value) frame so downstream diffing and dashboards
  * need no schema knowledge. Every number is EXACT (map-combinable
  * counts, one digest distinct), no sampling — at 100 TB this is two
  * scans (corpus aggregate + digest distinct) and a source-sized
  * aggregation.
  */
object DatasetCard {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Per-group cards: the same exact metrics, one set per source —
    * the mixture-monitoring face (diff a delivery's per-source cards
    * against the previous release to see which source drifted).
    * Output: (group, metric, value).
    */
  def reportPerGroup(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val tok = size(split(trim(lower(col(textCol))), "\\s+")).cast("long")
    docs.groupBy(col(sourceCol).as("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tok).cast("long").as("n_tokens"),
        countDistinct(md5(col(textCol))).as("n_distinct_texts"))
      .select(col("group"), explode(map(
        lit("n_docs"), col("n_docs").cast("double"),
        lit("n_tokens"), col("n_tokens").cast("double"),
        lit("mean_doc_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6),
        lit("exact_dup_fraction"),
        round(lit(1.0) - col("n_distinct_texts").cast("double")
          / col("n_docs"), 6))))
      .select(col("group"), col("key").as("metric"), col("value"))
  }

  def report(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("__id"),
      col(textCol).as("__t"), col(sourceCol).as("__s"))
    val tok = size(split(trim(lower(col("__t"))), "\\s+")).cast("long")
    val agg = base.agg(
      count(lit(1)).as("n_docs"),
      sum(tok).cast("long").as("n_tokens"),
      countDistinct(col("__s")).as("n_sources"),
      countDistinct(md5(col("__t"))).as("n_distinct_texts"))
    val topShare = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).cast("double").as("__mx"),
        sum(col("__n")).cast("double").as("__tot"))
      .select((col("__mx") / col("__tot")).as("max_source_share"))
    agg.crossJoin(topShare).select(explode(map(
      lit("n_docs"), col("n_docs").cast("double"),
      lit("n_tokens"), col("n_tokens").cast("double"),
      lit("n_sources"), col("n_sources").cast("double"),
      lit("mean_doc_tokens"),
      round(col("n_tokens").cast("double") / col("n_docs"), 6),
      lit("exact_dup_fraction"),
      round(lit(1.0) - col("n_distinct_texts").cast("double")
        / col("n_docs"), 6),
      lit("max_source_share"), round(col("max_source_share"), 6))))
      .select(col("key").as("metric"), col("value"))
  }
}
