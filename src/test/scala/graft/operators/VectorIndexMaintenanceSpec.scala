package graft.operators

import graft.SparkSpec
import graft.catalog.VersionedTable
import graft.fsops.FsOps
import org.apache.spark.sql.DataFrame

class VectorIndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new FsOps(spark.sparkContext.hadoopConfiguration)

  private val dim = 8

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(j => ((seed * 31 + j * 17) % 13 - 6).toFloat)

  private def emb(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")

  test("maintained codes equal a fresh encode of the latest snapshot " +
      "under the frozen quantizers; folds are delta-only and " +
      "exactly-once") {
    val embRoot = tmp("vx_emb")
    val idxRoot = tmp("vx_idx")
    val v1Ids = (1L to 40L)
    val v2Ids = v1Ids.filterNot(_ % 7 == 0) ++ (41L to 50L)
    VersionedTable.write(emb(v1Ids), fs, embRoot, ts = 100L)
    assert(VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot,
      idxRoot, "vec_id", "embedding", dim, m = 4, ks = 4,
      centroids = 4) === Seq(1L)) // bootstrap: train + encode v1
    VersionedTable.write(emb(v2Ids), fs, embRoot, ts = 200L)
    assert(VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot,
      idxRoot, "vec_id", "embedding", dim, m = 4, ks = 4,
      centroids = 4) === Seq(2L)) // CDC fold: delta encode only
    // the maintained codes equal re-encoding ALL of v2 with the SAME
    // frozen (v1-trained) quantizers — stale codes for updated vectors
    // or leftover deleted rows would break row-for-row equality
    val frozenCb = spark.read.parquet(s"$idxRoot/_codebooks")
    val frozenCent = spark.read.parquet(s"$idxRoot/_centroids")
    val rebuilt = Similarity.ivfPqEncodeWith(emb(v2Ids), "vec_id",
      "embedding", dim, 4, frozenCb, frozenCent)
    assertSameRows(VersionedTable.readLatest(spark, fs, idxRoot), rebuilt)
    // nothing new: no-op poll, no commit burned
    assert(VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot,
      idxRoot, "vec_id", "embedding", dim, m = 4, ks = 4,
      centroids = 4).isEmpty)
    assert(VersionedTable.commits(fs, idxRoot).map(_.op)
      === Seq("emb-v-1", "emb-v-2"))
    // search over the maintained index equals the prepared search over
    // the rebuild — and the searched neighbors exist in v2 only
    val queries = emb(Seq(3L, 45L))
    val got = VectorIndexMaintenance.searchMaintained(spark, fs, queries,
      idxRoot, "vec_id", "embedding", k = 3, dim = dim, m = 4)
    val want = Similarity.ivfPqTopKPrepared(queries, rebuilt, frozenCb,
      frozenCent, "vec_id", "embedding", k = 3, dim = dim, m = 4)
    assertSameRows(got, want)
    val neighbors = got.select($"neighbor_id").as[Long].collect().toSet
    assert(neighbors.subsetOf(v2Ids.toSet))
  }

  test("searchMaintained fails fast before any bootstrap") {
    val e = intercept[IllegalArgumentException] {
      VectorIndexMaintenance.searchMaintained(spark, fs, emb(Seq(1L)),
        tmp("vx_none"), "vec_id", "embedding", k = 1, dim = dim, m = 4)
    }
    assert(e.getMessage.contains("catchUpIndex"))
  }
}
