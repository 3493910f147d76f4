package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Partition-selection predicates: an OR of ANDs over (column, value) pairs.
  *
  * The reference models this as `Seq[Seq[(String, String)]]` and compiles it
  * to a `Row => Boolean` closure passed to `df.filter`
  * (reference: src/main/scala/com/adidas/analytics/util/DataFrameUtils.scala:18-67)
  * — a black box that defeats Catalyst partition pruning and parquet
  * pushdown, forcing full scans.
  *
  * We compile the same algebra to a `Column` expression instead, so the
  * predicate reaches the optimizer: static/dynamic partition pruning and
  * parquet row-group filtering happen for free. At 100 TB this is the
  * difference between scanning one `year=2024/month=06` directory and
  * scanning the lake.
  */
object PartitionCriteria {

  type Criteria = Seq[Seq[(String, Any)]]

  /** OR-of-ANDs → Column. Empty criteria selects nothing (matches the
    * reference's fold over an empty OR: no partition qualifies).
    *
    * Null-safe equality (`<=>`): a criteria value of null must SELECT the
    * null-partition rows (`===` never matches NULL, which would silently
    * exclude existing `__HIVE_DEFAULT_PARTITION__` content from
    * partition-merge writes and then drop it on the atomic swap).
    */
  def toColumn(criteria: Criteria): Column =
    if (criteria.isEmpty) lit(false)
    else criteria.map { conj =>
      if (conj.isEmpty) lit(true)
      else conj.map { case (c, v) => col(c) <=> lit(v) }.reduce(_ && _)
    }.reduce(_ || _)

  /** Hive dir name used by Spark for a partition value — null (and empty
    * string) values land in `__HIVE_DEFAULT_PARTITION__`, so affected-dir
    * bookkeeping must use the same name or deletion-only null partitions
    * are never replaced.
    */
  def partitionDirName(column: String, value: Any): String = {
    val v = value match {
      case null | "" => "__HIVE_DEFAULT_PARTITION__"
      case other => other.toString
    }
    s"$column=$v"
  }

  /** Single conjunction (the FixedSizeStringExtractor / Materialization
    * single-partition case).
    */
  def single(conj: Seq[(String, Any)]): Column = toColumn(Seq(conj))
}
