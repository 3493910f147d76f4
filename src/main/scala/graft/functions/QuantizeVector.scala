package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of a float vector as ONE native evaluation
  * per row: returns struct(scale: double, q: array<int>) where
  * `scale = max|x| / 127` and `q_i = floor(x_i / scale + 0.5)`
  * (round-half-up spelled as floor over doubles — floor is bit-identical
  * across engines where round()/CAST tie handling is not, which is what
  * lets the DuckDB oracle reproduce the codes exactly).
  *
  * Why native: the scale is a per-row aggregate referenced inside the
  * per-element lambda, and CollapseProject re-inlines projected columns
  * into lambda bodies — the composed-builtin form recomputes max|x| for
  * EVERY element (O(d²) interpreted calls per row). This loop is O(d).
  */
case class QuantizeVectorExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vector expects array<float|double>, got ${other.sql}")
    }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val mayContainNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      // a null slot read through getFloat/getDouble on UnsafeArrayData is
      // undefined bytes, not 0.0 — fail loudly: a sparse/corrupt vector
      // must not quantize to garbage codes (parquet-loaded arrays are
      // typed containsNull=true even when dense, so rejecting the TYPE
      // would break every real caller; only an actual null is an error)
      if (mayContainNull && arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_vector: null element at index $i - dense vector required")
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      xs(i) = v
      val a = math.abs(v)
      if (a > m) m = a
      i += 1
    }
    val scale = m / 127.0
    val q = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(xs(i) / scale + 0.5).toInt
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeExpr", this,
      classOf[QuantizeVectorExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QuantizeVectorExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def quantize(vec: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      QuantizeVectorExpr(
        org.apache.spark.sql.GraftBridge.expression(vec)))
}
