package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** md5-60 hashes of every width-token span of a token array as a native
  * Catalyst expression — the kernel shared by the repeated-span report,
  * the removal face, and the incremental artifacts (q232/q233/q242).
  *
  * Byte-identical to the composed built-ins it replaces —
  * `transform(sequence(0, n-width), i ->
  * conv(substring(md5(concat_ws(" ", slice(toks, i+1, width))),1,15),
  * 16,10))` — because [[PortableHash.md5Long60]] IS the first 15 hex
  * digits of md5 and the span bytes are exactly the UTF-8 of the
  * space-joined tokens. Docs shorter than width yield an empty array
  * (the composed form needed an explicit guard against sequence()
  * counting down).
  *
  * Why: the composed form is an interpreted higher-order function
  * running an Md5+Substring+Conv tree plus a slice+concat_ws copy per
  * span — the same tax measured at 4.6 s on the DSIR feature pass
  * ([[FeatureBucketsExpr]]); spans pay width token copies per element
  * on top.
  */
case class SpanHashesExpr(child: Expression, width: Int)
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
          s"span_hashes expects array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val count = n - width + 1
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      var len = width - 1
      var j = i
      while (j < i + width) { len += bytes(j).length; j += 1 }
      val joined = new Array[Byte](len)
      var off = 0
      j = i
      while (j < i + width) {
        if (j > i) { joined(off) = ' '; off += 1 }
        System.arraycopy(bytes(j), 0, joined, off, bytes(j).length)
        off += bytes(j).length
        j += 1
      }
      out(i) = PortableHash.md5Long60(joined)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanHashesExpr", this,
      classOf[SpanHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SpanHashesExpr = copy(child = newChild)
}

object SpanHashesExpr {
  def spanHashes(tokens: Column, width: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      SpanHashesExpr(
        org.apache.spark.sql.GraftBridge.expression(tokens), width))
}
