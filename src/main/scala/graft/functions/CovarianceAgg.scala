package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Exact integer covariance-moment aggregate over a quantized
  * (array<bigint>) vector column: accumulates, in ONE flat long buffer
  * per (partition, group), the row count, the d per-dimension linear
  * sums, and the d·(d+1)/2 upper-triangle product sums — everything
  * [[graft.operators.Similarity.embeddingCovariance]] needs, map-side
  * combined.
  *
  * This is the 100 TB shape the round-9 in-row formulation was not:
  * generating dims²/2 pair structs per row through an explode is fine
  * at dims=64 (2,080 structs/row) but materializes ~295k structs
  * (~4.7 MB) per row at dims=768 — the aggregate touches each row's
  * d² pairs in a primitive loop and ships ONE (1 + d + d(d+1)/2)-long
  * buffer per partition instead (dims=768 → 2.4 MB per PARTITION, not
  * per row). Long (not double) accumulation on the caller's fixed-point
  * grid keeps the sums exact — associative, partition-order-invariant,
  * bit-identical to the SQL oracle's integer sums (the q137/q186
  * determinism device).
  *
  * Buffer layout: [0] = n; [1..d] = sum(x_i); then row-major upper
  * triangle sum(x_i·x_j), i ≤ j. Null arrays are skipped; null
  * elements read as 0; all rows must share one length (first row
  * fixes it — a genuine dimension mismatch is a data bug worth
  * failing loudly on, not averaging over).
  */
case class CovarianceMomentsAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"covariance_moments expects an array<bigint> column, got ${other.sql}")
    }

  private def bufLen(d: Int): Int = 1 + d + d * (d + 1) / 2

  /** dims recovered from a buffer length: inverse of [[bufLen]]. */
  private def dimsOf(len: Int): Int = {
    // len = 1 + d + d(d+1)/2  =>  d² + 3d + 2(1 - len) = 0
    val d = ((math.sqrt(9.0 + 8.0 * (len - 1)) - 3.0) / 2.0).round.toInt
    require(bufLen(d) == len, s"corrupt covariance buffer length $len")
    d
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val acc =
      if (buf.length == 0) new Array[Long](bufLen(d))
      else {
        require(buf.length == bufLen(d),
          s"covariance_moments dimension mismatch: buffer has " +
            s"${dimsOf(buf.length)} dims, row has $d")
        buf
      }
    // one local copy so the O(d²) loop reads a primitive array, not
    // ArrayData accessors
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      x(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      i += 1
    }
    acc(0) += 1L
    i = 0
    var p = 1 + d
    while (i < d) {
      acc(1 + i) += x(i)
      val xi = x(i)
      var j = i
      while (j < d) {
        acc(p) += xi * x(j)
        p += 1
        j += 1
      }
      i += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"covariance_moments dimension mismatch: ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CovarianceMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovarianceMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CovarianceMomentsAgg {
  /** Column-level entry point: the flat moments buffer
    * [n, sum(x_0..x_{d-1}), upper-triangle sum(x_i·x_j)] of an
    * array<bigint> column.
    */
  def covarianceMoments(c: Column): Column =
    GraftBridge.column(
      CovarianceMomentsAgg(GraftBridge.expression(c)).toAggregateExpression())
}
