package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash of a token array as a native Catalyst expression: hash
  * each token, accumulate per-bit counters, set each output bit by majority
  * vote — all inside one evaluation per row.
  *
  * Replaces an explode → groupBy(doc) → per-bit-sum aggregation: same
  * result, but zero shuffle and no 500k-row blowup per 5k docs. At 100 TB
  * the fingerprint is a narrow map over the corpus; only the 8-byte
  * fingerprint ever moves.
  *
  * 60 bits, not 64: the per-token hash is [[PortableHash.md5Long60]] (the
  * first 15 md5 hex digits), the largest width DuckDB can mirror through a
  * BIGINT hex cast without sign trouble — which makes the SimHash gate a
  * hash-matched oracle comparison instead of rows-only. Banding guarantees
  * rescale with the width (see Dedup.simhashCandidates).
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  /** Shared by interpreted eval and generated code (primitive return — no
    * boxing in the generated path).
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](SimHashExpr.BITS)
    var i = 0
    while (i < n) {
      val h = PortableHash.md5Long60(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < SimHashExpr.BITS) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimHashExpr.BITS) {
      if (counts(b) * 2 >= n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHashExpr {
  /** Fingerprint width — bits of [[PortableHash.md5Long60]]. */
  val BITS: Int = 60

  def simhash(tokens: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(tokens)))
}
