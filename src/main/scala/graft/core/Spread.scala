package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CPU-heavy map-side compute.
  *
  * Spark sizes a file scan by bytes (`spark.sql.files.maxPartitionBytes`),
  * which is right when the cost of a stage is IO — but the text/vector
  * operators run expression work (tokenize, shingle-hash, minhash,
  * trigrams, feature-hash) that costs far more per byte than the scan
  * itself, and that work executes map-side INSIDE the scan stage. A small
  * input (one file, one parquet row group) therefore serializes the whole
  * corpus's compute into a single task: measured on q245 at sf0.1, 2.7 s
  * of a 5.8 s gate was one task on one core while 31 sat idle
  * (StageProfile, OPTIMIZATION_r13.md). This is guide-§2.5's "input skew:
  * one huge unsplittable file" in miniature — and the fix is the same:
  * repartition immediately after the read, BEFORE the heavy projection.
  *
  * The spread must be scale-ADAPTIVE, not a constant: at 100 TB the scan
  * has thousands of splits and a blanket repartition would shuffle the
  * whole corpus body for nothing. So this helper estimates the scan
  * parallelism the planner will produce (files and their byte sizes vs
  * `maxPartitionBytes` — the same arithmetic `FilePartition` uses) and
  * inserts a round-robin `repartition(defaultParallelism)` ONLY when the
  * scan cannot reach half the cluster's cores. On any real corpus the
  * estimate exceeds the threshold with the first few files and the frame
  * passes through untouched.
  *
  * `repartition(n)` with an explicit n deliberately: AQE coalesces
  * keyed/keyless repartitions WITHOUT user-specified numPartitions back
  * down by byte size — which at small-bytes/heavy-CPU would undo the
  * spread (64 MB advisory ≫ a 600 KB corpus → 1 partition again). A
  * user-specified partition count is exempt from AQE coalescing. The n
  * is `defaultParallelism` — the cluster's core count, not a constant —
  * and the round-robin path is retry-deterministic (Spark sorts before
  * round-robin repartition, SPARK-23207).
  */
object Spread {

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 2) return df
    val files =
      try df.inputFiles
      catch { case scala.util.control.NonFatal(_) => return df }
    // no file sources (cached / in-memory / streaming batch without file
    // lineage): parallelism is whatever the upstream plan owns — pass
    // through. Enough files to feed the cores: pass through without
    // touching the filesystem.
    if (files.isEmpty || files.length >= target) return df
    val hconf = spark.sparkContext.hadoopConfiguration
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    var est = 0L
    var bytes = 0L
    try {
      files.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val len = p.getFileSystem(hconf).getFileStatus(p).getLen
        bytes += len
        est += math.max(1L, (len + maxSplit - 1L) / maxSplit)
        if (2L * est >= target) return df // scan already parallel enough
      }
    } catch { case scala.util.control.NonFatal(_) => return df }
    // below ~64 KB of input the serialized compute is cheaper than the
    // exchange's own latency (measured on the q75 per-trigger batches:
    // ~30 KB micro-batch, ≈25 ms of map work vs ≈60 ms of shuffle) —
    // a latency-vs-compute constant, not a scale constant: a corpus
    // this small is already sub-second either way, and any real input
    // blows past the floor with its first file
    if (bytes < 64L * 1024) df else df.repartition(target)
  }
}
