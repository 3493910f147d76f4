package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: explode the small/build side into
  * `saltFactor` replicas and scatter the skewed probe side uniformly across
  * them, so one hot key spreads over `saltFactor` shuffle partitions
  * instead of hot-spotting one executor.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting is
  * the static fallback for the cases AQE can't touch (aggregations feeding
  * the join, hash joins, or deterministic test plans). Correctness: join
  * keys are extended with a salt column that matches by construction —
  * results are identical to the unsalted join.
  */
object SkewJoin {
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // replicating the build side breaks build-preserving join types:
    // an unmatched build row would be emitted once per salt replica
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    // Salt derived from row CONTENT, not monotonically_increasing_id():
    // id-based salts are non-deterministic across task recomputation (a
    // stage retry after a fetch failure can re-salt rows differently from
    // the shuffle files already consumed — the SPARK-23207 class of bug,
    // duplicating or losing join rows). Hashing every column keeps the salt
    // stable under replay; identical rows share a salt, which only matters
    // for skew if a single VALUE dominates — exactly the case where the
    // exploded build side still matches every replica.
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
