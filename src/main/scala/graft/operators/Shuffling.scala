package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling + sharding for training order: the last
  * step of a curation pipeline assigns every document a reproducible
  * pseudo-random position so trainers stream a well-mixed corpus without
  * ever sorting it again.
  *
  *  - position key = 60-bit md5 of the id ([[graft.functions.PortableHash]]
  *    family): uniform, a pure function of the id (retry-stable, no RNG
  *    state, identical across engines — the DuckDB oracle reproduces the
  *    full assignment);
  *  - `shard` = key mod `numShards`: the unit of training parallelism;
  *  - `pos_in_shard` = rank of the key within the shard.
  *
  * Scale shape: ONE hash-partition shuffle (by shard), then a per-shard
  * sort window. Shards are the parallel unit — size `numShards` so a
  * shard fits a task (real pipelines use thousands of shards, which also
  * keeps every window partition small); the operator never plans a
  * global single-task sort.
  */
object Shuffling {

  /** 60-bit md5 position key of the id (mirrors
    * `CAST('0x'||substr(md5(id),1,15) AS BIGINT)` in SQL).
    */
  private def posKey(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Adds `shard` and `pos_in_shard` for a deterministic global shuffle
    * into `numShards` shards.
    */
  def shuffleIntoShards(df: DataFrame, idCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards: $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard"))
      .orderBy(col("__pos"), col(idCol))
    df.withColumn("__pos", posKey(col(idCol)))
      .withColumn("__shard", pmod(col("__pos"), lit(numShards.toLong)))
      .withColumn("shard", col("__shard").cast("int"))
      .withColumn("pos_in_shard", row_number().over(w))
      .drop("__pos", "__shard")
  }
}
