package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step every text-dedup/fingerprint pipeline needs
  * before hashing: "café" typed as e+COMBINING ACUTE (NFD) and as the
  * precomposed é are different byte strings with identical rendering,
  * so without NFC they dodge exact dedup, digests, and shingle joins.
  *
  * Spark has no built-in for this (no `normalize` function family), and a
  * Scala UDF would break whole-stage codegen around the hot map — hence a
  * native expression with reference-call codegen (the
  * [[ShingleHashExpr]] pattern: the generated code stays inside the
  * fused span, the JVM call is one virtual dispatch per row).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (the common case
  * — ASCII and already-composed text — allocates nothing and returns the
  * input UTF8String as-is); only rows that actually need recomposition
  * pay the String round-trip. DuckDB's `nfc_normalize` implements the
  * same Unicode standard, so normalized output oracle-matches
  * byte-for-byte.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalizeExpr", this,
      classOf[NfcNormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalizeExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(text)))
}
