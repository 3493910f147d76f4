package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character trigrams of the lowercased string as a native Catalyst
  * expression: one lowercase + one tight loop per row.
  *
  * Byte-identical to the composed built-ins it replaces —
  * `transform(sequence(1, length(lower(text)) - 2), i ->
  * substr(lower(text), i, 3))` — because it lowercases with
  * `UTF8String.toLowerCase` (the engine of `lower`) and slices with
  * `UTF8String.substringSQL` (the engine of `substr`).
  *
  * Why: higher-order functions are interpreted, and CollapseProject
  * inlines `lower(text)` INTO the lambda, so the composed form
  * re-lowercases the whole document once per trigram — O(len²) string
  * allocations per row, measured at 6.5 s for the sf0.1 corpus explode
  * (vs this expression's sub-second pass; see PLANS.md). Same class of
  * fix as [[ShingleHashExpr]].
  */
case class CharTrigramsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_trigrams expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Shared by interpreted eval and generated code (reference-call codegen
    * keeps the whole-stage span fused).
    */
  def compute(s: UTF8String): ArrayData = {
    val t = s.toLowerCase
    val n = t.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 1
    while (i <= n - 2) {
      out(i - 1) = t.substringSQL(i, 3)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charTrigramsExpr", this,
      classOf[CharTrigramsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharTrigramsExpr = copy(child = newChild)
}

object CharTrigramsExpr {
  def trigrams(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharTrigramsExpr(
        org.apache.spark.sql.GraftBridge.expression(text)))
}
