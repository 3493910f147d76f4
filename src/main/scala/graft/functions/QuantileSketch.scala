package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** KLL-style mergeable quantile sketch as a native Catalyst
  * TypedImperativeAggregate — the quantile member of the sketch family
  * (CMS = frequencies, KMV = distincts, Misra-Gries = top-k): one-pass,
  * bounded-memory rank estimation over a value stream whose exact
  * quantiles would need a full sort/shuffle of the column (Karnin,
  * Lang, Liberty, "Optimal Quantile Approximation in Streams").
  *
  * Level i holds items of weight 2^i, each level capped at `k` items;
  * a full level is sorted and every other item promoted with doubled
  * weight — TOTAL WEIGHT IS PRESERVED EXACTLY, so the cumulative-weight
  * scan always spans n. Compaction offsets alternate deterministically
  * per level (no RNG — the repo's replayability convention; the classic
  * random-offset variant is unbiased in expectation, the alternating
  * one is deterministic with the same O(k) space).
  *
  * Exact regime: while fewer than `k` values are aggregated, no
  * compaction ever fires — the sketch IS the data and every quantile is
  * exact and partition-order-invariant (after the value sort in eval).
  * That is the regime the oracle gate pins (the Misra-Gries gate
  * convention); the approximate regime's rank error is spec-bounded.
  *
  * Result: struct(n, items array<(v, w)>) with items value-sorted —
  * feed [[QuantileSketchAgg.sketchQuantile]] or merge sketches across
  * batches by re-aggregating their exploded items (weights carried).
  */
case class QuantileSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Buf] {

  require(k >= 8, s"k must be at least 8: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = QuantileSketchAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch expects a double column, got ${other.sql}")
    }

  override def createAggregationBuffer(): QuantileSketchAgg.Buf =
    new QuantileSketchAgg.Buf(0L,
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double]),
      mutable.ArrayBuffer(false))

  override def update(buf: QuantileSketchAgg.Buf,
      input: InternalRow): QuantileSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      buf.levels(0) += v.asInstanceOf[Double]
      if (buf.levels(0).length >= k) QuantileSketchAgg.compact(buf, k)
    }
    buf
  }

  override def merge(buf: QuantileSketchAgg.Buf,
      other: QuantileSketchAgg.Buf): QuantileSketchAgg.Buf = {
    buf.n += other.n
    while (buf.levels.length < other.levels.length) {
      buf.levels += mutable.ArrayBuffer.empty[Double]
      buf.flips += false
    }
    var i = 0
    while (i < other.levels.length) {
      buf.levels(i) ++= other.levels(i)
      i += 1
    }
    QuantileSketchAgg.compact(buf, k)
    buf
  }

  override def eval(buf: QuantileSketchAgg.Buf): Any =
    QuantileSketchAgg.evalBuf(buf)

  override def serialize(buf: QuantileSketchAgg.Buf): Array[Byte] =
    QuantileSketchAgg.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketchAgg.Buf =
    QuantileSketchAgg.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-ingest SAVED sketch items — the artifact-merge face (the
  * kmvMerge/cmsMerge convention for quantiles): a saved sketch is its
  * exploded (v, w) item rows; every weight is a power of two by
  * construction (level i items carry 2^i), so re-ingestion places each
  * item directly at its level and the result is a valid sketch of the
  * COMBINED stream. Build per delivery, save, merge at read — no raw
  * values re-scanned.
  */
case class QuantileSketchMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Buf] {

  require(k >= 8, s"k must be at least 8: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = QuantileSketchAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StructType(Array(StructField(_, DoubleType, _, _),
          StructField(_, LongType, _, _))) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch_merge expects struct<v double, w bigint> " +
          s"items, got ${other.sql}")
    }

  override def createAggregationBuffer(): QuantileSketchAgg.Buf =
    new QuantileSketchAgg.Buf(0L,
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double]),
      mutable.ArrayBuffer(false))

  override def update(buf: QuantileSketchAgg.Buf,
      input: InternalRow): QuantileSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val value = row.getDouble(0)
      val w = row.getLong(1)
      require(w > 0 && (w & (w - 1)) == 0,
        s"sketch item weight must be a power of two: $w")
      val level = java.lang.Long.numberOfTrailingZeros(w)
      while (buf.levels.length <= level) {
        buf.levels += mutable.ArrayBuffer.empty[Double]
        buf.flips += false
      }
      buf.n += w
      buf.levels(level) += value
      QuantileSketchAgg.compact(buf, k)
    }
    buf
  }

  override def merge(buf: QuantileSketchAgg.Buf,
      other: QuantileSketchAgg.Buf): QuantileSketchAgg.Buf = {
    buf.n += other.n
    while (buf.levels.length < other.levels.length) {
      buf.levels += mutable.ArrayBuffer.empty[Double]
      buf.flips += false
    }
    var i = 0
    while (i < other.levels.length) {
      buf.levels(i) ++= other.levels(i)
      i += 1
    }
    QuantileSketchAgg.compact(buf, k)
    buf
  }

  override def eval(buf: QuantileSketchAgg.Buf): Any =
    QuantileSketchAgg.evalBuf(buf)
  override def serialize(buf: QuantileSketchAgg.Buf): Array[Byte] =
    QuantileSketchAgg.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketchAgg.Buf =
    QuantileSketchAgg.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  import org.apache.spark.sql.functions._

  /** n values seen + per-level buffers + per-level compaction offsets. */
  final class Buf(var n: Long,
      val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]],
      val flips: mutable.ArrayBuffer[Boolean])

  val resultType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType), StructField("w", LongType))),
      containsNull = false))))

  /** Cascade compaction: any level at/over capacity is sorted and every
    * other item promoted with doubled weight (alternating start offset).
    * Weight is conserved exactly: k items of weight w become k/2 items
    * of weight 2w (an odd straggler stays put).
    */
  private[functions] def compact(buf: Buf, k: Int): Unit = {
    var i = 0
    while (i < buf.levels.length) {
      if (buf.levels(i).length >= k) {
        val sorted = buf.levels(i).sorted
        val start = if (buf.flips(i)) 1 else 0
        buf.flips(i) = !buf.flips(i)
        if (i + 1 == buf.levels.length) {
          buf.levels += mutable.ArrayBuffer.empty[Double]
          buf.flips += false
        }
        // pair up the first 2·(m/2) items; promote one per pair (the
        // start-th), so m/2 items of weight 2w replace m/2 pairs of
        // weight w each; an odd straggler stays at level i with weight
        // w — total weight is conserved exactly in every case
        val m = sorted.length
        val paired = 2 * (m / 2)
        var j = start
        while (j < paired) {
          buf.levels(i + 1) += sorted(j)
          j += 2
        }
        buf.levels(i).clear()
        if (m % 2 == 1) buf.levels(i) += sorted(m - 1)
        i += 1
      } else i += 1
    }
  }

  private[functions] def evalBuf(buf: Buf): Any = {
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.length) {
      val w = 1L << i
      buf.levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    InternalRow(buf.n, new GenericArrayData(
      sorted.map { case (v, w) => InternalRow(v, w) }.toArray[Any]))
  }

  private[functions] def serializeBuf(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      out.writeBoolean(buf.flips(i))
      out.writeInt(buf.levels(i).length)
      buf.levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deserializeBuf(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val nl = in.readInt()
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Double]]
    val flips = mutable.ArrayBuffer.empty[Boolean]
    var i = 0
    while (i < nl) {
      flips += in.readBoolean()
      val sz = in.readInt()
      val lvl = new mutable.ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) { lvl += in.readDouble(); j += 1 }
      levels += lvl
      i += 1
    }
    new Buf(n, levels, flips)
  }

  /** Column entry point for the artifact merge: re-aggregate exploded
    * sketch item structs (v, w) into one combined sketch.
    */
  def mergeSketch(c: Column, k: Int): Column =
    GraftBridge.column(
      QuantileSketchMergeAgg(GraftBridge.expression(c), k)
        .toAggregateExpression())

  /** Column entry point: aggregate a double column into the sketch. */
  def sketch(c: Column, k: Int): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Estimated p-quantile from a sketch column: the smallest item value
    * whose cumulative weight reaches `max(1, ceil(p·n))` — type-1
    * (discontinuous) semantics, exact whenever the sketch is exact.
    * Double arithmetic throughout, mirrored verbatim by the oracle.
    */
  def sketchQuantile(sk: Column, p: Column): Column = {
    val t = greatest(lit(1L), ceil(p * sk("n")).cast("long"))
    aggregate(sk("items"),
      struct(lit(0L).as("cw"), lit(Double.NaN).as("v"),
        lit(false).as("found")),
      (acc, it) => when(acc("found"), acc).otherwise(
        when(acc("cw") + it("w") >= t,
          struct((acc("cw") + it("w")).as("cw"), it("v").as("v"),
            lit(true).as("found")))
        .otherwise(
          struct((acc("cw") + it("w")).as("cw"), acc("v").as("v"),
            lit(false).as("found")))),
      acc => when(acc("found"), acc("v")))
  }
}
