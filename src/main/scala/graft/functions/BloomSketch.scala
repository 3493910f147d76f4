package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column-level entry points to Spark's own bloom-filter expressions —
  * the pair Catalyst uses for runtime row-level filtering
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, both codegen'd),
  * exposed here so operators can build the filter over one frame and
  * probe it from another without a UDF.
  *
  * Contract: build and probe over the SAME LongType hash column (e.g.
  * the 8-byte shingle hashes from [[ShingleHashExpr]]) — the aggregate
  * inserts raw longs and `might_contain` probes raw longs.
  */
object BloomSketch {

  /** Aggregate a LongType column into a serialized bloom filter (one
    * BinaryType value). `expectedItems` sizes the filter (bits bounded by
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, default 8 MB).
    */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(c), expectedItems).toAggregateExpression())

  /** Membership probe of a LongType column against a serialized filter.
    * The filter bytes travel with the plan as a literal (deserialized
    * once per task), so the probe is a NARROW map-side predicate — no
    * join, no shuffle. May return false positives, never false
    * negatives; callers needing exactness verify survivors with a join.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftBridge.expression(c)))
}
