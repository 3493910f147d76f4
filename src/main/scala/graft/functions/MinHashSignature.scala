package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature as a native Catalyst expression: from the array of
  * shingle strings, produce the k seeded minima in ONE evaluation per row
  * with a tight primitive loop.
  *
  * Why not `transform`/`array_min` built-ins: higher-order functions are
  * interpreted (no whole-stage codegen through lambdas), costing ~1µs per
  * lambda invocation — k×|shingles| invocations per row dominated the whole
  * dedup pipeline (measured ~11s for 5k docs × k=32). This expression does
  * the same k×n work in a primitive loop: ~50ms.
  *
  * Hash family ([[PortableHash]]): base 60-bit md5 per shingle, then the
  * universal linear family (a_s·h + b_s) mod (2^31−1) per seed — chosen over
  * the round-1 SplitMix64 finalizer because DuckDB reproduces it exactly,
  * which turns the LSH dedup gate from rows-only into a hash-matched oracle
  * comparison. Each shingle is md5-hashed ONCE; the k seeded passes are
  * integer multiply-add over the cached base hashes.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
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
          s"minhash_signature expects array<string> shingles, got ${other.sql}")
    }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(PortableHash.minhashA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(PortableHash.minhashB)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code — the generated call
    * passes the child array directly, so the whole-stage span stays fused
    * (CodegenFallback would materialize an InternalRow per call).
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // base hashes once per shingle (md5 dominates; k passes reuse them)
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      base(i) = PortableHash.md5Long60(s.getBytes) % PortableHash.P
      i += 1
    }
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = as(s); val b = bs(s)
      var min = Long.MaxValue
      i = 0
      while (i < n) {
        val h = (a * base(i) + b) % PortableHash.P
        if (h < min) min = h
        i += 1
      }
      out(s) = min
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this,
      classOf[MinHashSignatureExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignatureExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def signature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSignatureExpr(
        org.apache.spark.sql.GraftBridge.expression(shingles), k))
}

/** MinHash signature computed straight from the TOKEN array: builds each
  * n-gram shingle's bytes with `UTF8String.concatWs` (identical to the
  * `concat_ws(" ", slice(...))` string the composed form hashes — the md5
  * family and therefore the DuckDB oracle are unchanged) and feeds the
  * seeded minima without ever materializing a shingle-string ARRAY into
  * the row. Removes the last interpreted higher-order transform from the
  * minhash pipeline (the shingle build was ~3 lambda dispatches per
  * shingle). Distinctness of shingles is irrelevant to a MIN aggregate —
  * duplicate shingles cannot change any seeded minimum — so no
  * dedup structure is needed at all.
  */
case class ShingleMinHashExpr(child: Expression, n: Int, k: Int)
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
          s"shingle_minhash expects array<string> tokens, got ${other.sql}")
    }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(PortableHash.minhashA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(PortableHash.minhashB)
  @transient private lazy val space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val nt = arr.numElements()
    val count = math.max(nt - n, 0) + 1
    val base = new Array[Long](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, nt)
      val parts =
        new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      val s = org.apache.spark.unsafe.types.UTF8String
        .concatWs(space, parts: _*)
      base(i) = PortableHash.md5Long60(s.getBytes) % PortableHash.P
      i += 1
    }
    val out = new Array[Long](k)
    var sd = 0
    while (sd < k) {
      val a = as(sd); val b = bs(sd)
      var min = Long.MaxValue
      i = 0
      while (i < count) {
        val h = (a * base(i) + b) % PortableHash.P
        if (h < min) min = h
        i += 1
      }
      out(sd) = min
      sd += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMinhashExpr", this,
      classOf[ShingleMinHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleMinHashExpr {
  /** Column-level entry point (classic-mode Column↔Expression bridge). */
  def signature(tokens: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ShingleMinHashExpr(
        org.apache.spark.sql.GraftBridge.expression(tokens), n, k))
}
