package graft.operators

import graft.catalog.{LogFold, VersionedTable}
import graft.fsops.FsOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-artifact maintenance for a VERSIONED corpus: keeps the
  * [[Dedup.dedupArtifacts]] table (one (id, digest, minhash-sig) row per
  * landed doc) in lockstep with a corpus stored as a
  * [[VersionedTable]], fed from the corpus's own commit log.
  *
  * This closes the loop the incremental-dedup family left open: q72's
  * `IncrementalDedup` consumes a PERSISTED artifacts table so admission
  * cost scales with the batch — but something has to keep that table
  * current as the corpus itself changes (curation deletes, text
  * re-extraction updates, new deliveries). Re-signing the corpus per
  * change is a full-corpus minhash pass — the exact cost the artifacts
  * exist to avoid. Here each corpus version folds as its CDC delta:
  * artifact rows of deleted/update-preimage docs drop by anti-join,
  * signatures are computed ONLY for inserted/update-postimage docs, and
  * the updated artifact table commits as the next version of
  * `artifactsRoot` — exactly-once per corpus version
  * ([[graft.catalog.LogFold]]: op tags + pinned commits), so any
  * scheduler cadence and overlapping polls are safe.
  *
  * 100 TB shape: per-poll cost = the CDC join of the new version pairs
  * + minhash over the delta docs + one artifact-table write of
  * |corpus| NARROW rows (id, digest, 32 longs — the artifact table is
  * ~1e-3 the corpus bytes). The corpus text is never re-shingled
  * outside the delta.
  */
object CorpusMaintenance {

  /** Fold every unconsumed corpus version into the artifacts table.
    * Returns the corpus versions folded by this call. `shingleSize`/`k`
    * must stay fixed across polls (they parameterize the signatures the
    * admission path compares).
    *
    * `buckets = Some(n)` keeps the artifacts table HASH-BUCKETED on id
    * ([[VersionedTable.writeBucketed]], n buckets): each CDC fold then
    * reads and rewrites ONLY the buckets the delta touches
    * ([[LogFold.catchUpBucketed]]) — fold bytes ≈ touchedBuckets ×
    * (|artifacts| / n) with touchedBuckets ≤ |delta keys|, vs the
    * whole artifacts table per fold without it. Size n ≫ the typical
    * per-version delta key count (hash spreading touches ~one bucket
    * per key); n is also the files-per-snapshot, so n ≈ |corpus| /
    * desired-bucket-rows bounds both. Fixed per artifacts root; run
    * [[VersionedTable.compact]] occasionally to re-anchor the
    * reference chain so vacuum can reclaim ancestor dirs.
    */
  def catchUpArtifacts(spark: SparkSession, fsOps: FsOps,
      corpusRoot: String, artifactsRoot: String, idCol: String,
      textCol: String, shingleSize: Int = 3, k: Int = 32,
      buckets: Option[Int] = None): Seq[Long] = {
    def bootstrap(c: VersionedTable.Commit): DataFrame =
      // sign the whole first snapshot once
      Dedup.dedupArtifacts(
        VersionedTable.readVersion(spark, fsOps, corpusRoot, c.version),
        idCol, textCol, shingleSize, k)
    def feedParts(c: VersionedTable.Commit): (DataFrame, DataFrame) = {
      val feed = VersionedTable.changeFeed(spark, fsOps, corpusRoot,
        c.version - 1, c.version, Seq(idCol))
      (feed.filter(col("change_type").isin("delete", "update_preimage"))
          .select(col(idCol).as("id")),
        feed.filter(col("change_type")
            .isin("insert", "update_postimage"))
          .select(col(idCol), col(textCol)))
    }
    buckets match {
      case None =>
        LogFold.catchUp(spark, fsOps, corpusRoot, artifactsRoot,
            tagPrefix = "corpus") { (state, c) =>
          state match {
            case None => bootstrap(c)
            case Some(arts) =>
              val (removed, added) = feedParts(c)
              arts.join(removed, Seq("id"), "left_anti")
                .unionByName(Dedup.dedupArtifacts(added, idCol, textCol,
                  shingleSize, k))
          }
        }
      case Some(n) =>
        LogFold.catchUpBucketed(spark, fsOps, corpusRoot, artifactsRoot,
            tagPrefix = "corpus", bucketBy = "id", nBuckets = n) {
            (state, c) =>
          state match {
            case None => LogFold.Full(bootstrap(c))
            case Some(st) =>
              val (removed, added) = feedParts(c)
              // the delta touches few buckets by contract: tiny collect
              // (≤ n ints) to know WHICH, then read/rewrite only those
              val touched = removed
                .unionByName(added.select(col(idCol).as("id")))
                .select(VersionedTable.bucketOf(col("id"), n).as("b"))
                .distinct().collect().map(_.getInt(0)).toSeq.sorted
              if (touched.isEmpty) LogFold.Delta(st.all.limit(0), Seq.empty)
              else LogFold.Delta(
                st.buckets(touched).join(removed, Seq("id"), "left_anti")
                  .unionByName(Dedup.dedupArtifacts(added, idCol,
                    textCol, shingleSize, k)),
                touched)
          }
        }
    }
  }

  /** Admit an incoming batch against the maintained corpus: exact +
    * near-dup incremental dedup ([[Dedup.dedupIncrement]]) using the
    * LATEST maintained artifacts — batch-scaled cost, the landed corpus
    * contributes only its narrow artifact scan plus the candidate-sliver
    * text read.
    *
    * Consistency: the corpus is read AT THE VERSION the artifacts last
    * consumed (recorded in the artifacts' commit op), never at whatever
    * happens to be latest — two unpinned reads would admit against
    * version-skewed state when the corpus moved between polls (a
    * v(N+1)-only duplicate would slip past v(N) artifacts, and a
    * re-extracted doc would candidate on its old signature but verify
    * on its new text). Run [[catchUpArtifacts]] first to admit against
    * the newest corpus. `k` must match the signing run — validated
    * against the artifacts' own signature width; `shingleSize` cannot be
    * recovered from the data and MUST match the catch-up's (default 3).
    */
  def admit(spark: SparkSession, fsOps: FsOps, incoming: DataFrame,
      corpusRoot: String, artifactsRoot: String, idCol: String,
      textCol: String, threshold: Double = 0.5, shingleSize: Int = 3,
      k: Int = 32, bands: Int = 8): DataFrame = {
    val artsLog = VersionedTable.commits(fsOps, artifactsRoot)
    val consumedV = artsLog.map(_.op)
      .collect { case op if op.startsWith("corpus-v-") =>
        op.stripPrefix("corpus-v-").toLong }
    require(consumedV.nonEmpty,
      s"$artifactsRoot has no corpus-v-N commits; run catchUpArtifacts " +
        "before admitting")
    val arts = VersionedTable.readLatest(spark, fsOps, artifactsRoot)
    val sigK = arts.select(size(col("sig")).as("k")).limit(1)
      .collect().headOption.map(_.getInt(0))
    require(sigK.forall(_ == k),
      s"artifacts under $artifactsRoot were signed with k=${sigK.get}; " +
        s"admitting with k=$k would band mismatched signatures and " +
        "silently lose near-dup recall")
    val existing = VersionedTable.readVersion(spark, fsOps, corpusRoot,
      consumedV.max)
    Dedup.dedupIncrement(existing, incoming, idCol, textCol, threshold,
      shingleSize, k, bands, artifacts = Some(arts))
  }
}
