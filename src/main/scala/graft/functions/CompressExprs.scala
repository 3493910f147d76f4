package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string/binary value as a native Catalyst
  * expression — the compression-ratio quality signal the big web-corpus
  * pipelines use (a document that deflates to a tiny fraction of its
  * raw size is template/repetition spam; one that barely compresses is
  * noise or binary junk): ratio bands select the natural-language
  * middle. Spark has no built-in for this, and a Scala UDF would break
  * whole-stage codegen around the hot map — hence the
  * [[NfcNormalizeExpr]] reference-call codegen pattern (one virtual
  * dispatch per row inside the fused span).
  *
  * Level 6 (zlib default), raw-deflate (nowrap) so the 6-byte zlib
  * framing doesn't blur short-text ratios. The returned size is
  * deterministic for a given JVM's zlib, which is all the signal needs
  * — thresholds are calibrated on the corpus itself, and the gate over
  * this expression is rows-only checked (no SQL engine can mirror
  * zlib; exact values are pinned by the spec recomputing Deflater
  * in-JVM).
  *
  * Per-row cost is O(bytes); the expression allocates one Deflater per
  * evaluation, which dominates for sub-100-byte rows but is noise at
  * document sizes. No shuffle, no state.
  */
case class DeflatedSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflated_size expects string or binary, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => DeflatedSizeExpr.compute(s.getBytes)
    case b: Array[Byte] => DeflatedSizeExpr.compute(b)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = DeflatedSizeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arg = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.compute(${arg(c)});")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflatedSizeExpr {

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def deflatedSize(c: Column): Column =
    GraftBridge.column(DeflatedSizeExpr(GraftBridge.expression(c)))
}
