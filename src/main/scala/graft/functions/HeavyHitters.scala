package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a native Catalyst
  * TypedImperativeAggregate — the one-pass, bounded-memory "top
  * talkers" aggregate the built-ins cannot express: a groupBy count
  * over a 100 TB token stream shuffles the whole term domain; this
  * keeps at most `k` counters per partial, merges associatively
  * (Agarwal et al., "Mergeable Summaries"), and ships only k counters
  * per partition to the final merge.
  *
  * Guarantees: every item with true frequency > n/(k+1) survives; each
  * reported count is a LOWER bound undercounting by at most n/(k+1).
  * When `k` ≥ the number of distinct items the sketch never evicts and
  * the counts are EXACT and order-independent — the regime the oracle
  * gate pins; the approximate regime is spec-bounded instead (its
  * reported counts legitimately depend on partition order).
  *
  * Result: array of (item, count_low) structs, count desc / item asc —
  * deterministic given the final counter map.
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_low", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects a string item column, got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement-all step: evict counters reaching zero
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    MisraGriesAgg.shed(buf, k) // subtract the (k+1)-th largest, drop <= 0
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.serializeMap(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.deserializeMap(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-ingest SAVED heavy-hitter items — the artifact-merge face (the
  * quantile/KMV/CMS convention for top-k): a saved sketch is its
  * exploded (item, count_low) rows; re-ingesting adds each count to
  * the counter map and over-capacity states shed mass exactly like
  * [[MisraGriesAgg.merge]], so the result is a valid Misra-Gries
  * summary of the COMBINED stream (Agarwal et al., "Mergeable
  * Summaries") — build per delivery, save, merge at read.
  */
case class MisraGriesMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_low", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StructType(Array(StructField(_, StringType, _, _),
          StructField(_, LongType, _, _))) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters_merge expects struct<item string, count bigint>, " +
          s"got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val item = row.getUTF8String(0).toString
      val c = row.getLong(1)
      require(c > 0, s"sketch item count must be positive: $c")
      buf.update(item, buf.getOrElse(item, 0L) + c)
      MisraGriesAgg.shed(buf, k)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    MisraGriesAgg.shed(buf, k)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.serializeMap(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.deserializeMap(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column-level entry point: aggregate a string column into the
    * (item, count_low) heavy-hitter array.
    */
  def heavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Artifact-merge entry point: re-aggregate exploded (item, count)
    * sketch rows into one combined summary.
    */
  def mergeHeavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesMergeAgg(GraftBridge.expression(c), k)
        .toAggregateExpression())

  /** The over-capacity shed both merges use: subtract the (k+1)-th
    * largest count from every counter, drop non-positive ones.
    */
  private[functions] def shed(buf: mutable.HashMap[String, Long],
      k: Int): Unit =
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }

  private[functions] def serializeMap(
      buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deserializeMap(
      bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }
}
