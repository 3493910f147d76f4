package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Random-hyperplane sign signature of a float vector as a native Catalyst
  * expression: `bits` dot products against deterministic md5-derived
  * hyperplanes ([[PortableHash.planeComponent]]), each contributing one sign
  * bit — one evaluation per row, primitive loops.
  *
  * Replaces round 1's `aggregate(zip_with(...))` formulation, which paid
  * bits × dims × ~3 interpreted lambda calls per row and made the "scale
  * path" 3x SLOWER than brute force at sf0.1 (the exact higher-order-
  * function trap PLANS.md documents for minhash). The arithmetic here —
  * sequential double accumulation over the vector in array order — is the
  * same operation order `list_sum(list_transform(...))` uses in DuckDB, so
  * signatures (and therefore LSH candidate sets) are reproducible in the
  * oracle, turning the ANN gates into hash-matched comparisons.
  *
  * The hyperplane matrix depends only on (table, bits, dims); dims is read
  * from the first row and the planes are computed once per task and reused
  * (vectors of differing lengths would recompute — not a supported shape).
  */
case class LshSignatureExpr(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature expects array<float>, got ${other.sql}")
  }

  // dims and planes live in ONE immutable holder behind a single
  // volatile reference: two threads evaluating one instance with mixed
  // vector widths can at worst recompute, never pair one thread's dims
  // with another's planes (two separate mutable fields could tear and
  // produce silently wrong signatures)
  @transient @volatile private var cached: PortableHash.PlaneCache = _

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(compute(input.asInstanceOf[ArrayData]))

  /** Shared by interpreted eval and generated code. */
  def compute(vec: ArrayData): Int = {
    val dims = vec.numElements()
    var c = cached
    if (c == null || c.dims != dims) {
      c = new PortableHash.PlaneCache(dims,
        PortableHash.planes(table, bits, dims))
      cached = c
    }
    var sig = 0
    var b = 0
    while (b < bits) {
      val w = c.planes(b)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        dot += vec.getFloat(d).toDouble * w(d)
        d += 1
      }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this,
      classOf[LshSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshSignatureExpr {
  def signature(vec: Column, bits: Int, table: Int): Column =
    GraftBridge.column(
      LshSignatureExpr(GraftBridge.expression(vec), bits, table))
}

/** Johnson-Lindenstrauss random projection as a native Catalyst
  * expression: `dOut` dot products against the SAME deterministic
  * md5-derived plane matrix [[PortableHash.planes]] the LSH signature
  * uses — but returning the raw projections (array<double>) instead of
  * packing sign bits. The cheap dimensionality cut before ANN /
  * clustering at 100 TB: 64 → 16 dims is 4× less vector I/O in every
  * downstream shuffle, with pairwise distances preserved to the JL
  * bound. Same caching/codegen discipline as [[LshSignatureExpr]];
  * arithmetic is sequential double accumulation in array order,
  * mirrored by `list_sum(list_transform(...))` in the oracle.
  */
case class ProjectVectorExpr(child: Expression, dOut: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"project_vector expects array<float>, got ${other.sql}")
  }

  // same single-volatile-holder discipline as [[LshSignatureExpr]]
  @transient @volatile private var cached: PortableHash.PlaneCache = _

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(vec: ArrayData): ArrayData = {
    val dims = vec.numElements()
    var c = cached
    if (c == null || c.dims != dims) {
      c = new PortableHash.PlaneCache(dims,
        PortableHash.planes(table, dOut, dims))
      cached = c
    }
    val out = new Array[Double](dOut)
    var b = 0
    while (b < dOut) {
      val w = c.planes(b)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        dot += vec.getFloat(d).toDouble * w(d)
        d += 1
      }
      out(b) = dot
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projExpr", this,
      classOf[ProjectVectorExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ProjectVectorExpr {
  def project(vec: Column, dOut: Int, table: Int = 0): Column =
    GraftBridge.column(
      ProjectVectorExpr(GraftBridge.expression(vec), dOut, table))
}
