package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Winnowing selection (Schleimer, Wilkerson & Aiken 2003) over a
  * positional hash array as a native Catalyst expression: in every window
  * of `window` consecutive hashes select the minimum (RIGHTMOST position
  * on ties), deduplicated. Input is [[SpanHashesExpr]]'s positional
  * k-gram hashes; output is one struct per selected fingerprint:
  * (pos — 1-based, matching the oracle's list indexing; fp — the hash at
  * that position).
  *
  * Returning (pos, fp) PAIRS from one native loop is load-bearing, not
  * convenience: recovering fp afterwards as `element_at(hl, pos)` inside
  * a transform/explode is exactly the CollapseProject lambda-inlining
  * trap this repo has measured twice (30x on the minhash path, 6.5 s ->
  * 1.65 s on CharTrigrams) — the optimizer substitutes the staged hash
  * array's producing expression into every lambda position and the
  * O(m·w) selection becomes O(m²·w) hash-chain recomputation. Here the
  * whole selection is one primitive scan per row; nesting
  * `winnowSelect(spanHashes(toks))` is safe because neither argument
  * sits under a lambda. Windows are tiny (w ≈ 4-8) so the direct O(m·w)
  * scan is kept over the O(m) rolling-min variant for 1:1 auditability
  * against the oracle SQL. Selected positions are non-decreasing as the
  * window slides (a later window's rightmost-min can never move left
  * past an earlier selection), so adjacent-dedup yields the distinct
  * set. Arrays shorter than `window` yield an empty result.
  */
case class WinnowSelectExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select expects array<bigint> hashes, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < window)
      return new GenericArrayData(Array.empty[InternalRow])
    val h = arr.toLongArray()
    val out = new Array[InternalRow](m - window + 1)
    var n = 0
    var lastPos = -1
    var j = 0
    while (j <= m - window) {
      var best = j
      var p = j + 1
      while (p < j + window) {
        if (h(p) <= h(best)) best = p // <= keeps the RIGHTMOST minimum
        p += 1
      }
      val pos = best + 1 // 1-based
      if (pos != lastPos) {
        out(n) = new GenericInternalRow(
          Array[Any](pos, h(best)))
        n += 1
        lastPos = pos
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowSelectExpr", this,
      classOf[WinnowSelectExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowSelectExpr = copy(child = newChild)
}

object WinnowSelectExpr {
  def winnowSelect(hashes: Column, window: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WinnowSelectExpr(
        org.apache.spark.sql.GraftBridge.expression(hashes), window))
}
