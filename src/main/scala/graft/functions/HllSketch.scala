package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog distinct sketch (Flajolet et al. 2007) as a native
  * TypedImperativeAggregate over a pre-hashed 60-bit LongType column —
  * the register-array sibling of [[KmvAgg]]: fixed 2^p-byte state per
  * group at ANY cardinality (KMV's k-set answers "which" as well as "how
  * many"; HLL packs more accuracy per byte when only the count matters),
  * max-merge across partitions, micro-batches, and persisted artifacts.
  *
  * Cross-engine determinism (the repo's gating bar, not just "about
  * right"): register index = top p bits of the md5-60 hash, rank ρ =
  * leading-zero count of the remaining Q = 60−p bits + 1 — all integer,
  * replayed exactly in DuckDB via `length(bin(low))`. The harmonic
  * denominator is accumulated in FIXED POINT: Σ 2^(Q+1−M_j) as a BIGINT
  * (p ≥ 8 keeps every exponent ≤ 53 and the sum ≤ 2^61 — no double
  * rounding, no summation-order dependence), so the estimate
  * α_m·m²·2^(Q+1)/S involves exactly one correctly-rounded division and
  * both engines emit the identical double. The raw-estimate formula is
  * gated WITHOUT the small-range linear-counting branch (`ln` is libm —
  * not bit-portable); [[graft.operators.DistinctSketch.hllCorrected]]
  * applies it library-side where cross-engine replay is not required.
  *
  * Result: the m = 2^p register values (ints in [0, Q+1], 0 = empty).
  */
case class HllAgg(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  require(p >= 8 && p <= 16, s"p must be in [8, 16]: $p")

  private val m = 1 << p
  private val q = 60 - p // low-bit window width; ranks are in [1, q+1]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch expects a bigint hash column, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] // md5-60: < 2^60 by construction
      val idx = (h >>> q).toInt
      val low = h & ((1L << q) - 1)
      // rank of the leftmost 1-bit within the q-bit window (q+1 if none)
      val rho =
        if (low == 0L) q + 1
        else q + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) { arr(i) = buf(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    // registers fit a byte (≤ q+1 ≤ 53)
    val bytes = new Array[Byte](m)
    var i = 0
    while (i < m) { bytes(i) = buf(i).toByte; i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bytes(i).toInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllAgg {
  /** Column entry point: the 2^p HLL registers of a bigint hash column. */
  def hllSketch(c: Column, p: Int): Column =
    GraftBridge.column(
      HllAgg(GraftBridge.expression(c), p).toAggregateExpression())
}
