package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Element-wise sum of a long-array column as a native Catalyst
  * TypedImperativeAggregate — the centroid-update kernel k-means needs
  * and the built-ins cannot express without a posexplode: exploding an
  * n-row × d-dim corpus to n·d rows shuffles d rows PER INPUT ROW,
  * where this aggregate's partial is ONE d-long vector per (partition,
  * group) — the shuffle width is k·d per partition regardless of corpus
  * size. Long (not double) elements on purpose: callers quantize floats
  * to a fixed-point grid first (`floor(x*scale)`), so the sum is exact
  * integer arithmetic — associative, partition-order-invariant, and
  * bit-identical to any other engine's integer sum (the property the
  * DuckDB oracle gate relies on; a double sum would be
  * accumulation-order-dependent).
  *
  * Null arrays are skipped; null elements count as 0; all non-null
  * arrays in a group must share one length (first row fixes it).
  */
case class VectorSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vector_sum expects an array<bigint> column, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc =
      if (buf.length == 0) new Array[Long](n)
      else {
        require(buf.length == n,
          s"vector_sum dimension mismatch: ${buf.length} vs $n")
        buf
      }
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getLong(i)
      i += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"vector_sum dimension mismatch: ${buf.length} vs ${other.length}")
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

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  /** Column-level entry point: element-wise sum of an array<bigint>
    * column into one array<bigint>.
    */
  def vectorSum(c: Column): Column =
    GraftBridge.column(
      VectorSumAgg(GraftBridge.expression(c)).toAggregateExpression())
}
