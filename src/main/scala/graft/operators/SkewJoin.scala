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

  /** The salt expression: a uniform bucket in [0, saltFactor) hashed from
    * `cols`. Exposed so specs/diagnostics can observe the exact spread the
    * join will use.
    */
  def salt(saltFactor: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor)).cast("int")

  /** @param saltCols columns the probe-side salt is hashed from. Empty
    *   (default) hashes EVERY probe column — deterministic and safe, but
    *   it maps byte-identical rows to one salt, so a hot key whose rows
    *   are fully identical re-concentrates. Pass the columns that
    *   discriminate rows within the hot key (an event id, a line number,
    *   a payload column) to spread those; cheaper than the full-row hash
    *   on wide frames, too. Rows identical in the discriminator columns
    *   still share a salt — no deterministic, replay-stable function of
    *   row content can separate true duplicates; add a stable synthetic
    *   id upstream if that case matters.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    // replicating the build side breaks build-preserving join types:
    // an unmatched build row would be emitted once per salt replica
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    // Salt derived from row CONTENT, not monotonically_increasing_id():
    // id-based salts are non-deterministic across task recomputation (a
    // stage retry after a fetch failure can re-salt rows differently from
    // the shuffle files already consumed — the SPARK-23207 class of bug,
    // duplicating or losing join rows). Hashing content keeps the salt
    // stable under replay.
    val src =
      if (saltCols.nonEmpty) saltCols.map(c => probe.col(s"`$c`"))
      else probe.columns.map(c => probe.col(s"`$c`")).toSeq
    // the working column must not clobber a user column on either side
    var saltName = "__salt"
    while (probe.columns.contains(saltName) ||
        build.columns.contains(saltName)) saltName += "_"
    val salted = probe.withColumn(saltName, salt(saltFactor, src))
    val replicated = build.withColumn(saltName,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, saltName), joinType).drop(saltName)
  }
}
