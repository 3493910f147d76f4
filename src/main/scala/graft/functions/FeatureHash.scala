package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}

/** Feature hashing (the "hashing trick"): a token array folds into a
  * fixed-`dims` bag-of-words count vector — v[md5_60(token) mod dims]
  * += 1 — turning raw TEXT into a vector the existing similarity stack
  * consumes ([[CosineSimilarityExpr]], sign-LSH ANN, embedding near-dup,
  * int8 quantization) with no model and no vocabulary table: the doc →
  * vector step of a text clustering/dedup pipeline, in-engine.
  *
  * One tight loop per row (a higher-order-function formulation would run
  * O(dims × tokens) interpreted lambdas — the scatter-add needs mutable
  * state built-ins can't express); md5-derived bucketing
  * ([[PortableHash.md5Long60]]) so DuckDB reproduces the exact buckets
  * and counts. Counts are exact small integers in float slots — binary
  * cross-engine equality, no rounding involved.
  */
case class FeatureHashExpr(child: Expression, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (dims <= 0)
      TypeCheckResult.TypeCheckFailure(s"dims must be positive: $dims")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"feature_hash expects array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val v = new Array[Float](dims)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = (PortableHash.md5Long60(arr.getUTF8String(i).getBytes)
          % dims).toInt
        v(b) += 1f
      }
      i += 1
    }
    new GenericArrayData(v)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureHashExpr", this,
      classOf[FeatureHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FeatureHashExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def featureHash(tokens: Column, dims: Int): Column =
    GraftBridge.column(
      FeatureHashExpr(GraftBridge.expression(tokens), dims))
}
