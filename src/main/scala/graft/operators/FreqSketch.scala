package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min frequency sketch: a fixed depth×width grid of counters that
  * answers "how often does this item occur" with a one-sided error
  * (estimate ≥ truth, overshoot bounded by collisions ≈ n/width per
  * row, min over depth rows). The frequency-counting sibling of
  * [[DistinctSketch]]'s KMV cardinality sketch and
  * [[graft.functions.BloomSketch]]'s membership filter: per-delivery
  * term-frequency telemetry WITHOUT shipping the vocabulary.
  *
  * Hashing is the repo's portable md5-60 family, so a DuckDB oracle
  * reproduces every counter and estimate bit-for-bit.
  *
  * 100 TB shape: the build explodes each item into `depth` (row,
  * bucket) keys and counts — map-side combinable into at most
  * depth·width rows per partition, so the shuffle is sketch-sized, not
  * data-sized. Sketches MERGE by cell-wise sum (counting is linear), so
  * per-delivery sketches roll up without touching raw data; estimates
  * broadcast-join the sketch (depth·width rows) against the query set.
  */
object FreqSketch {

  /** Portable 60-bit md5 hash (mirrors
    * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`).
    */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private def bucketOf(rw: org.apache.spark.sql.Column,
      it: org.apache.spark.sql.Column, width: Int) =
    pmod(hash60(concat(lit("cms_"), rw.cast("string"), lit("_"), it)),
      lit(width.toLong))

  /** One (rw, bucket, cnt) counter per touched cell — absent cells are
    * zero. Null items are ignored (a null carries no frequency).
    */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    items
      .select(col(itemCol).cast("string").as("__it"))
      .filter(col("__it").isNotNull)
      .select(col("__it"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("rw"))
      .groupBy(col("rw"), bucketOf(col("rw"), col("__it"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of two sketches built with the SAME depth/width —
    * the linearity that lets per-delivery sketches roll up.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("rw"), col("bucket"), col("cnt"))
      .union(b.select(col("rw"), col("bucket"), col("cnt")))
      .groupBy(col("rw"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Estimated equi-join cardinality from two sketches built with the
    * SAME depth/width over the two join-key columns: per depth row the
    * cell-wise inner product Σ cntA·cntB upper-bounds the true join
    * size |A ⋈ B| = Σ_k fA(k)·fB(k) (collisions only ADD); the minimum
    * over rows is the classic AMS/CMS estimate. The planner-aid report:
    * size a join from two tiny pre-aggregated artifacts BEFORE paying
    * its shuffle — at 100 TB the sketches are the only thing read.
    * Returns one row (est_join_size).
    */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("rw"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("rw"), col("bucket"), col("cnt").as("__cb")),
        Seq("rw", "bucket"))
      .groupBy(col("rw"))
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min(col("__ip")).cast("long").as("est_join_size"))

  /** (item, est) for each distinct non-null query item: min over the
    * depth counters, absent cells read as zero. `depth`/`width` must
    * match the build — the sketch is just cells and cannot tell.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    queries
      .select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).distinct()
      .select(col("item"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("rw"))
      .withColumn("bucket", bucketOf(col("rw"), col("item"), width))
      .join(broadcast(sketch), Seq("rw", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
