package graft.operators

import graft.catalog.{LogFold, VersionedTable}
import graft.fsops.FsOps
import graft.io.{AtomicWriter, DataFormat, LoadMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ index maintenance for a VERSIONED embedding table: keeps the
  * encode-time ANN artifacts ([[Similarity.ivfPqEncodeWith]] codes —
  * (id, cell, subspace, code) rows) in lockstep with an embeddings
  * corpus stored as a [[VersionedTable]], fed from the corpus's own
  * commit log — the [[CorpusMaintenance]] pattern applied to the
  * similarity family.
  *
  * Training artifacts (PQ codebooks + IVF centroids) are FROZEN at
  * bootstrap — trained once on the first consumed snapshot and persisted
  * under the index root — the standard incremental-ANN contract
  * (FAISS's add-after-train): folds encode ONLY the CDC delta against
  * the frozen quantizers, so per-poll cost ∝ delta, never a corpus
  * re-encode. Re-training is an explicit full rebuild (fresh index
  * root). Both trainers are deterministic (hash-sampled), so a racing
  * bootstrap pair writes identical artifacts — the codes commit itself
  * is exactly-once via [[LogFold]].
  *
  * 100 TB shape: the codes table is m small ints per vector (~1e-2 the
  * embedding bytes); search cost is the [[Similarity.ivfPqTopKPrepared]]
  * contract — |Q|·centroids probe scoring + the cell-pruned ADC scan.
  */
object VectorIndexMaintenance {

  // frozen training artifacts live in `_`-prefixed dirs under the index
  // root: invisible to the versioned codes commits, untouched by
  // vacuum's d-* orphan sweep, crash-safe via the atomic writer
  private def cbDir(root: String) = s"$root/_codebooks"
  private def centDir(root: String) = s"$root/_centroids"

  private def overwrite(fsOps: FsOps, df: DataFrame, path: String): Unit =
    new AtomicWriter(fsOps, Seq.empty, Some(1))
      .write(df, DataFormat.Parquet, path, LoadMode.OverwriteTable)

  /** Fold every unconsumed embedding-table version into the index:
    * bootstrap trains + encodes the latest snapshot; each later version
    * folds as its CDC delta (removed/preimage ids anti-joined out,
    * inserted/postimage vectors encoded against the frozen quantizers).
    * Returns the embedding versions folded by this call.
    */
  def catchUpIndex(spark: SparkSession, fsOps: FsOps, embRoot: String,
      indexRoot: String, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, ks: Int = 16, centroids: Int = 32): Seq[Long] =
    LogFold.catchUp(spark, fsOps, embRoot, indexRoot,
        tagPrefix = "emb") { (state, c) =>
      state match {
        case None =>
          val snap = VersionedTable.readVersion(spark, fsOps, embRoot,
            c.version)
          overwrite(fsOps,
            Similarity.pqCodebooks(snap, idCol, vecCol, dim, m, ks),
            cbDir(indexRoot))
          overwrite(fsOps,
            Similarity.selectCentroids(snap, idCol, vecCol, centroids),
            centDir(indexRoot))
          Similarity.ivfPqEncodeWith(snap, idCol, vecCol, dim, m,
            spark.read.parquet(cbDir(indexRoot)),
            spark.read.parquet(centDir(indexRoot)))
        case Some(codes) =>
          val feed = VersionedTable.changeFeed(spark, fsOps, embRoot,
            c.version - 1, c.version, Seq(idCol))
          val removed = feed.filter(col("change_type")
              .isin("delete", "update_preimage"))
            .select(col(idCol))
          val added = feed.filter(col("change_type")
              .isin("insert", "update_postimage"))
            .select(col(idCol), col(vecCol))
          codes.join(removed, Seq(idCol), "left_anti")
            .unionByName(Similarity.ivfPqEncodeWith(added, idCol, vecCol,
              dim, m, spark.read.parquet(cbDir(indexRoot)),
              spark.read.parquet(centDir(indexRoot))))
      }
    }

  /** ANN top-k against the maintained index: the prepared IVF-PQ search
    * over the latest committed codes and the frozen quantizers — the
    * corpus is never touched as vectors and never re-assigned.
    */
  def searchMaintained(spark: SparkSession, fsOps: FsOps,
      queries: DataFrame, indexRoot: String, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 8, nprobe: Int = 4)
      : DataFrame = {
    require(fsOps.exists(cbDir(indexRoot)),
      s"$indexRoot has no trained artifacts; run catchUpIndex first")
    Similarity.ivfPqTopKPrepared(queries,
      VersionedTable.readLatest(spark, fsOps, indexRoot),
      spark.read.parquet(cbDir(indexRoot)),
      spark.read.parquet(centDir(indexRoot)),
      idCol, vecCol, k, dim, m, nprobe)
  }
}
