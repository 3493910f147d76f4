package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the n-gram shingles of a token array, as a
  * native Catalyst expression: one evaluation per row, a tight loop, no
  * intermediate shingle-string ARRAY ever materialized into the row.
  *
  * Byte-identical to the composed built-ins it replaces —
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(" ",
  * slice(toks, i+1, n)))))` — because it builds each shingle with
  * `UTF8String.concatWs` (the engine of concat_ws) and hashes with
  * `XxHash64Function` at Spark's fixed seed 42: pipelines can mix this
  * expression with the built-in formulation and join on equal keys.
  *
  * Why: higher-order functions are interpreted (~1µs per lambda call), and
  * the shingle transform costs 3 lambda-ish steps per shingle (sequence
  * element, slice copy, concat) — measured as the dominant cost of every
  * shingle pipeline (q20/q48/q53). Distinctness mirrors the string
  * `array_distinct` (first-occurrence order) — hash collisions standing in
  * for string equality are the same ~2^-64 accepted everywhere else.
  */
case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash expects array<string> tokens, got ${other.sql}")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code (reference-call codegen
    * keeps the whole-stage span fused).
    */
  def compute(arr: ArrayData): ArrayData = {
    val nt = arr.numElements()
    val count = math.max(nt - n, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 0
    while (i < count) {
      val end = math.min(i + n, nt)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      val h = XxHash64Function.hash(s, StringType, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == count) out else out.take(m))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashExpr", this,
      classOf[ShingleHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def shingleHashes(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ShingleHashExpr(
        org.apache.spark.sql.GraftBridge.expression(tokens), n))
}
