package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document a
  * chunk id so that documents, concatenated in a stable global order, fill
  * fixed token budgets — the standard concat-and-chunk step ahead of LLM
  * pretraining batch assembly.
  *
  * The core is a DISTRIBUTED PREFIX SUM of token counts in document-id
  * order. The naive formulation — `sum() over (order by id)` with no
  * partition clause — collapses the whole corpus into ONE task (Spark
  * plans an Exchange SinglePartition for an unpartitioned ordered window):
  * a non-starter at scale. Instead:
  *
  *  1. range-repartition by id (so partition p holds an id-contiguous
  *     slice, in partition-index order),
  *  2. per-partition running totals via a window PARTITIONED by the slice
  *     (parallel),
  *  3. collect only the per-slice totals (#partitions rows) to the driver,
  *     prefix-sum them, and broadcast the slice offsets back as a literal
  *     CASE lookup.
  *
  * Token offsets are exact integer arithmetic, so the DuckDB oracle (a
  * plain ordered-window cumsum — fine at oracle scale) reproduces chunk
  * ids bit-for-bit.
  */
object Packing {

  /** Adds `n_tokens`, `chunk_id`, `offset_in_chunk` for concat-and-chunk
    * at `budgetTokens` per chunk, in `idCol` order. A document straddling
    * a boundary belongs to the chunk where it starts (standard
    * concat-then-split semantics).
    */
  def withChunkIds(docs: DataFrame, idCol: String, tokenCountCol: String,
      budgetTokens: Long, slices: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val n = if (slices > 0) slices
      else spark.sessionState.conf.numShufflePartitions
    val sliced = docs.repartitionByRange(n, col(idCol))
      .withColumn("__slice", spark_partition_id())
    // parallel per-slice running totals (window is PARTITIONED — no
    // single-task global sort)
    val w = Window.partitionBy(col("__slice")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced.withColumn("__local_cum",
      sum(col(tokenCountCol)).over(w) - col(tokenCountCol))
    // tiny driver collect: one row per slice
    val totals = withLocal.groupBy(col("__slice"))
      .agg(sum(col(tokenCountCol)).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val sliceIds = totals.keys.toSeq.sorted
    val prefix = sliceIds.scanLeft(0L)((acc, s) => acc + totals(s))
    val offsets = sliceIds.zip(prefix).toMap
    val offsetCol = sliceIds.foldLeft(lit(0L)) { (acc, s) =>
      when(col("__slice") === s, lit(offsets(s))).otherwise(acc)
    }
    withLocal
      .withColumn("__before", offsetCol + col("__local_cum"))
      .withColumn("chunk_id", floor(col("__before") / budgetTokens))
      .withColumn("offset_in_chunk", col("__before") % budgetTokens)
      .drop("__slice", "__local_cum", "__before")
  }

  /** Convenience: tokenize with [[TextAnalysis.tokenCount]] then chunk. */
  def packDocuments(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame =
    withChunkIds(
      docs.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol))),
      idCol, "n_tokens", budgetTokens)
}
