package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR's hashed unigram+bigram feature buckets as a native Catalyst
  * expression: md5-60 of each token and each adjacent token pair
  * (space-joined), mod `buckets`, unigrams first then bigrams —
  * occurrence-preserving.
  *
  * Byte-identical to the composed built-ins it replaces —
  * `concat(transform(toks, t -> conv(substring(md5(t),1,15),16,10) % B),
  * transform(sequence(...), i -> ... bigram ...))` — because the md5-60
  * family is a pure function of the UTF-8 bytes
  * ([[PortableHash.md5Long60]]) and the bigram bytes are exactly the
  * UTF-8 of `tok || ' ' || tok2`.
  *
  * Why: the composed form is an interpreted higher-order function
  * running an Md5+Substring+Conv expression tree per element, plus a
  * slice+concat_ws per bigram — measured 4.6 s warm for the sf0.1
  * corpus feature explode (see PLANS.md). Same class of fix as
  * [[ShingleHashExpr]]/[[CharTrigramsExpr]].
  */
case class FeatureBucketsExpr(child: Expression, buckets: Int)
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
          s"feature_buckets expects array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nBi = math.max(n - 1, 0)
    val out = new Array[Long](n + nBi)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      out(i) = PortableHash.md5Long60(bytes(i)) % buckets
      i += 1
    }
    i = 0
    while (i < nBi) {
      val a = bytes(i); val b = bytes(i + 1)
      val joined = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, joined, 0, a.length)
      joined(a.length) = ' '
      System.arraycopy(b, 0, joined, a.length + 1, b.length)
      out(n + i) = PortableHash.md5Long60(joined) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureBucketsExpr", this,
      classOf[FeatureBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : FeatureBucketsExpr = copy(child = newChild)
}

object FeatureBucketsExpr {
  def featureBuckets(tokens: Column, buckets: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      FeatureBucketsExpr(
        org.apache.spark.sql.GraftBridge.expression(tokens), buckets))
}
