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
    VersionedTable.write(v2, fs, corpus, ts = 200L)
    assert(CorpusMaintenance.catchUpArtifacts(spark, fs, corpus, arts,
      "doc_id", "text") === Seq(1L, 2L))
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

  test("admit against the maintained artifacts equals incremental dedup " +
      "with freshly built artifacts") {
    val corpus = tmp("cm_corpus")
    val arts = tmp("cm_arts")
    VersionedTable.write(v1, fs, corpus, ts = 100L)
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
