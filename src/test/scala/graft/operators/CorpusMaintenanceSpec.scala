package graft.operators

import graft.SparkSpec
import graft.catalog.VersionedTable
import graft.fsops.FsOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CorpusMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new FsOps(spark.sparkContext.hadoopConfiguration)

  private val v1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an entirely different document about spark engines"),
    (3L, "rows columns and shuffles all day long here"),
    (4L, "to be deleted in version two of the corpus"))
    .toDF("doc_id", "text")

  // v2: doc 4 deleted, doc 2 re-extracted (text changed), doc 5 added
  private val v2 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an entirely different document about spark engines reloaded"),
    (3L, "rows columns and shuffles all day long here"),
    (5L, "a brand new delivery landing in version two"))
    .toDF("doc_id", "text")

  test("maintained artifacts equal a full rebuild after deletes, " +
      "updates and inserts; polls are exactly-once") {
    val corpus = tmp("cm_corpus")
    val arts = tmp("cm_arts")
    VersionedTable.write(v1, fs, corpus, ts = 100L)
    // poll 1 bootstraps on v1; poll 2 CDC-folds v2 (delta-signed only)
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text") === Seq(1L))
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text") === Seq(2L))
    val maintained = VersionedTable.readLatest(spark, fs, arts)
    val rebuilt = Dedup.dedupArtifacts(v2, "doc_id", "text")
    assertSameRows(maintained, rebuilt) // digest AND sig, row for row
    // the updated doc's signature was recomputed, not carried stale
    val sigOf = (df: DataFrame) => df.filter($"id" === 2L)
      .select($"sig").collect().head.getSeq[Long](0)
    val staleSig = Dedup.dedupArtifacts(v1, "doc_id", "text")
    assert(sigOf(maintained) !== sigOf(staleSig))
    // nothing new: the poll is a no-op
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text").isEmpty)
    assert(VersionedTable.commits(fs, arts).map(_.op)
      === Seq("corpus-v-1", "corpus-v-2"))
  }

  test("bucketed artifacts maintenance equals the plain fold, rewrites " +
      "only the delta-touched buckets, and admits identically") {
    val corpus = tmp("cm_corpus")
    val artsPlain = tmp("cm_arts_p")
    val artsB = tmp("cm_arts_b")
    val n = 8
    VersionedTable.write(v1, fs, corpus, ts = 100L)
    CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, artsPlain,
      "doc_id", "text")
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, artsB,
      "doc_id", "text", buckets = Some(n)) === Seq(1L))
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, artsPlain,
      "doc_id", "text")
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, artsB,
      "doc_id", "text", buckets = Some(n)) === Seq(2L))
    // same artifacts, either layout
    assertSameRows(VersionedTable.readLatest(spark, fs, artsB),
      VersionedTable.readLatest(spark, fs, artsPlain))
    // the CDC fold wrote ONLY the buckets of the changed ids (2, 4, 5)
    val c2 = VersionedTable.commits(fs, artsB).last
    assert(c2.bucketMap.isDefined)
    def bucketIdOf(id: Long) = spark.range(1)
      .select(VersionedTable.bucketOf(lit(id), n))
      .collect().head.getInt(0)
    val expectTouched = Seq(2L, 4L, 5L).map(bucketIdOf).distinct.sorted
    val ownBuckets = fs.ls(s"$artsB/${c2.path}")
      .filter(_.startsWith("bucket_id="))
      .map(_.stripPrefix("bucket_id=").toInt).sorted.toSeq
    assert(ownBuckets === expectTouched)
    // admission against the bucketed artifacts equals the plain path
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (12L, "completely novel content that matches nothing at all"))
      .toDF("doc_id", "text")
    assertSameRows(
      CorpusMaintenance.admit(spark, fs, incoming, corpus, artsB,
        "doc_id", "text"),
      CorpusMaintenance.admit(spark, fs, incoming, corpus, artsPlain,
        "doc_id", "text"))
    // bucket-config drift fails by name (a pending version makes the
    // poll actually fold; a drift with nothing to fold is a no-op)
    VersionedTable.write(v2.filter($"doc_id" =!= 1L), fs, corpus,
      ts = 300L)
    val e = intercept[IllegalArgumentException] {
      CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, artsB,
        "doc_id", "text", buckets = Some(16))
    }
    assert(e.getMessage.contains("bucket config must stay fixed"))
  }

  test("onboarding a corpus with vacuumed old versions works: bootstrap " +
      "jumps to the latest readable snapshot") {
    val corpus = tmp("cm_corpus")
    val arts = tmp("cm_arts")
    VersionedTable.write(v1, fs, corpus, ts = 100L)
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    VersionedTable.vacuum(fs, corpus, keepLast = 1, retentionMs = 0L,
      force = true) // v1's data is gone; its commit entry remains
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text") === Seq(2L)) // replaying from v1 would throw
    assertSameRows(VersionedTable.readLatest(spark, fs, arts),
      Dedup.dedupArtifacts(v2, "doc_id", "text"))
  }

  test("admit is pinned to the corpus version the artifacts consumed " +
      "and rejects a k mismatch") {
    val corpus = tmp("cm_corpus")
    val arts = tmp("cm_arts")
    VersionedTable.write(v1, fs, corpus, ts = 100L)
    CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text")
    // the corpus moves ahead WITHOUT a catch-up poll: admission must
    // still judge against v1 (the version the artifacts describe), not
    // silently mix v2 text with v1 signatures
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    val incoming = Seq(
      (20L, "to be deleted in version two of the corpus")) // dup of v1's 4
      .toDF("doc_id", "text")
    val admitted = CorpusMaintenance.admit(spark, fs, incoming, corpus,
      arts, "doc_id", "text")
    assert(admitted.count() === 0L) // judged against v1: exact dup
    // a k that disagrees with the artifacts' signature width fails fast
    val e = intercept[IllegalArgumentException] {
      CorpusMaintenance.admit(spark, fs, incoming, corpus, arts,
        "doc_id", "text", k = 16)
    }
    assert(e.getMessage.contains("signed with k=32"))
    // and no catch-up yet means no admission baseline: fail fast
    val e2 = intercept[IllegalArgumentException] {
      CorpusMaintenance.admit(spark, fs, incoming, corpus,
        tmp("cm_empty"), "doc_id", "text")
    }
    assert(e2.getMessage.contains("catchUpArtifacts"))
  }

  test("admit against the maintained artifacts equals incremental dedup " +
      "with freshly built artifacts") {
    val corpus = tmp("cm_corpus")
    val arts = tmp("cm_arts")
    VersionedTable.write(v1, fs, corpus, ts = 100L)
    CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text")
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (11L, "an entirely different document about spark engines reloaded x"),
      (12L, "completely novel content that matches nothing at all"))
      .toDF("doc_id", "text")
    val got = CorpusMaintenance.admit(spark, fs, incoming, corpus, arts,
      "doc_id", "text", threshold = 0.5)
    val want = Dedup.dedupIncrement(v2, incoming, "doc_id", "text",
      threshold = 0.5,
      artifacts = Some(Dedup.dedupArtifacts(v2, "doc_id", "text")))
    assertSameRows(got, want)
    // the exact dup of doc 1 was dropped; the novel doc survived
    val ids = got.select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L) && ids.contains(12L))
  }
}
