package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of embedding vectors — the storage/compute
  * shape large vector corpora actually ship (4x smaller than float32,
  * int-SIMD dot products downstream).
  *
  * Per vector: `scale = max|x| / 127`, `q_i = floor(x_i / scale + 0.5)`
  * (round-half-up spelled as floor so Spark and DuckDB — and any engine
  * with IEEE doubles — produce bit-identical codes; `round()` and integer
  * CAST tie semantics differ across engines, floor does not).
  *
  * The kernel is the native [[graft.functions.QuantizeVectorExpr]]: the
  * scale is a per-row aggregate referenced inside the per-element lambda,
  * and CollapseProject re-inlines projected columns into lambda bodies —
  * the composed-builtin form recomputes max|x| for every element (O(d²)
  * interpreted calls per row). A narrow per-row map, zero shuffle.
  * Reconstruction error is the standard max|x|/254 bound per component.
  */
object Quantize {

  /** Adds `scale` (double) + `q` (int8 codes as array<int>). */
  def withQuantized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__qz",
        graft.functions.QuantizeVectorExpr.quantize(col(vecCol)))
      .withColumn("scale", col("__qz.scale"))
      .withColumn("q", col("__qz.q"))
      .drop("__qz")

  /** Dequantized approximation (array<double>) for re-scoring. */
  def dequantized(codesCol: Column, scale: Column): Column =
    transform(codesCol, c => c.cast("double") * scale)
}
