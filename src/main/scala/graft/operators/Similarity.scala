package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k: query-set × corpus join with the dot product
  *    as a codegen'd higher-order-function expression. Correct baseline;
  *    O(|Q|·|C|) — fine when |Q| is small or as the verifier.
  *  - LSH-bucketed (random hyperplane signs) ANN: corpus and queries are
  *    bucketed by a B-bit sign signature; candidates come from an equi-join
  *    on bucket (shuffle by bucket key, prunes the cross product), then
  *    exact cosine re-ranks. Multiple independent tables (rotations) trade
  *    recall for cost. This is the 100 TB path: the corpus is partitioned by
  *    bucket, each bucket join is local.
  *
  * Hyperplanes are derived deterministically from (table, bit, dim) via a
  * hash — no RNG state to ship, identical planes on every executor.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double in
    * array order — a native Catalyst expression (interpreted higher-order
    * functions cost ~3 lambda calls per dimension; the native loop is the
    * same arithmetic at primitive speed, bit-identical to the oracle).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarityExpr.cosine(a, b)

  /** Brute-force top-k neighbors for each query vector.
    * Returns (query id, neighbor id, cosine) with deterministic tie-break.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val joined = q.crossJoin(c)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit, dim):
    * a unit-free value in [-0.5, 0.5) from a 64-bit hash.
    */
  private def planeComponent(table: Int, bit: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(bit), dim), lit(1000000L)).cast("double")
      / 1000000.0) - 0.5

  /** B-bit sign signature of a vector under `table`'s hyperplanes. */
  def lshSignature(vec: Column, bits: Int, table: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(vec, dims, (v, i) => v.cast("double") * planeComponent(table, b, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** ANN top-k via multi-table sign-LSH bucketing + exact re-rank.
    * Recall < 1 by construction; verify against [[bruteForceTopK]].
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("t"),
              lshSignature(col(vecCol), bits, t).as("sig"))): _*)).as("bk"))
    val q = bucketed(queries, "query_id", "qv")
    val c = bucketed(corpus, "neighbor_id", "cv")
    val cand = q.join(c, q("bk") === c("bk") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }
}
