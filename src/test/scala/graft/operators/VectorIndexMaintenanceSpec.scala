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

  private def frozen(idxRoot: String): (DataFrame, DataFrame) = {
    val meta = VectorIndexMaintenance.trainMeta(fs, idxRoot).get
    (spark.read.parquet(s"$idxRoot/${meta.path}/codebooks"),
      spark.read.parquet(s"$idxRoot/${meta.path}/centroids"))
  }

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
    // the published training meta records the trained base version
    val meta = VectorIndexMaintenance.trainMeta(fs, idxRoot).get
    assert(meta.trainedVersion === 1L)
    assert((meta.dim, meta.m, meta.ks, meta.centroids) === ((8, 4, 4, 4)))
    // the maintained codes equal re-encoding ALL of v2 with the SAME
    // frozen (v1-trained) quantizers — stale codes for updated vectors
    // or leftover deleted rows would break row-for-row equality
    val (frozenCb, frozenCent) = frozen(idxRoot)
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

  test("a legacy (pre-pointer) index root names the rebuild path " +
      "instead of the circular run-catchUpIndex advice") {
    val root = tmp("vx_legacy")
    emb(Seq(1L)).write.parquet(s"$root/_codebooks")
    val e = intercept[IllegalArgumentException] {
      VectorIndexMaintenance.searchMaintained(spark, fs, emb(Seq(1L)),
        root, "vec_id", "embedding", k = 1, dim = dim, m = 4)
    }
    assert(e.getMessage.contains("legacy quantizer layout"))
    assert(e.getMessage.contains("rebuild"))
  }

  test("drifted quantizer geometry fails by name on folds and " +
      "searches instead of corrupting distances") {
    val embRoot = tmp("vx_emb")
    val idxRoot = tmp("vx_idx")
    VersionedTable.write(emb(1L to 20L), fs, embRoot, ts = 100L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    VersionedTable.write(emb(1L to 25L), fs, embRoot, ts = 200L)
    val eFold = intercept[IllegalArgumentException] {
      VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
        "vec_id", "embedding", dim, m = 2, ks = 4, centroids = 4)
    }
    assert(eFold.getMessage.contains("quantizer geometry"))
    val eSearch = intercept[IllegalArgumentException] {
      VectorIndexMaintenance.searchMaintained(spark, fs, emb(Seq(1L)),
        idxRoot, "vec_id", "embedding", k = 1, dim = 4, m = 4)
    }
    assert(eSearch.getMessage.contains("quantizer geometry"))
  }

  test("racing bootstraps on DIFFERENT base versions stay consistent: " +
      "the published training set is immutable from first appearance " +
      "and committed codes pair with it") {
    val embRoot = tmp("vx_emb")
    val idxRoot = tmp("vx_idx")
    VersionedTable.write(emb(1L to 20L), fs, embRoot, ts = 100L)
    // poll A bootstraps at v1 (train + publish + commit codes)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    val metaAfterA = VectorIndexMaintenance.trainMeta(fs, idxRoot).get
    // the table moves; a straggler poll folds v2 as a delta — the
    // publication must NOT be overwritten by any later activity
    VersionedTable.write(emb(3L to 26L), fs, embRoot, ts = 200L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    assert(VectorIndexMaintenance.trainMeta(fs, idxRoot).get
      === metaAfterA) // pointer (and therefore the set) unchanged
    // codes = encode of latest under the ORIGINAL published quantizers
    val (cb, cent) = frozen(idxRoot)
    assertSameRows(VersionedTable.readLatest(spark, fs, idxRoot),
      Similarity.ivfPqEncodeWith(emb(3L to 26L), "vec_id", "embedding",
        dim, 4, cb, cent))
  }

  test("bucketed codes maintenance equals the plain fold and searches " +
      "identically") {
    val embRoot = tmp("vx_emb")
    val idxP = tmp("vx_idx_p")
    val idxB = tmp("vx_idx_b")
    val v1Ids = 1L to 40L
    val v2Ids = v1Ids.filterNot(_ % 7 == 0) ++ (41L to 50L)
    VersionedTable.write(emb(v1Ids), fs, embRoot, ts = 100L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxP,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxB,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4,
      buckets = Some(8))
    VersionedTable.write(emb(v2Ids), fs, embRoot, ts = 200L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxP,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    assert(VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxB,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4,
      buckets = Some(8)) === Seq(2L))
    assertSameRows(VersionedTable.readLatest(spark, fs, idxB),
      VersionedTable.readLatest(spark, fs, idxP))
    // the CDC fold's own dir carries only the touched buckets
    val c2 = VersionedTable.commits(fs, idxB).last
    assert(c2.bucketMap.isDefined)
    assert(fs.ls(s"$idxB/${c2.path}").count(_.startsWith("bucket_id="))
      < 8)
    val queries = emb(Seq(3L, 45L))
    assertSameRows(
      VectorIndexMaintenance.searchMaintained(spark, fs, queries, idxB,
        "vec_id", "embedding", k = 3, dim = dim, m = 4),
      VectorIndexMaintenance.searchMaintained(spark, fs, queries, idxP,
        "vec_id", "embedding", k = 3, dim = dim, m = 4))
  }

  test("rebuild targets a fresh root (fails fast in place) and equals " +
      "a bootstrap on the latest snapshot; staleness reads 1.0 for it") {
    val embRoot = tmp("vx_emb")
    val idxRoot = tmp("vx_idx")
    val v1Ids = 1L to 30L
    val v2Ids = v1Ids.filterNot(_ % 5 == 0) ++ (31L to 44L)
    VersionedTable.write(emb(v1Ids), fs, embRoot, ts = 100L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    VersionedTable.write(emb(v2Ids), fs, embRoot, ts = 200L)
    VectorIndexMaintenance.catchUpIndex(spark, fs, embRoot, idxRoot,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    val eInPlace = intercept[IllegalArgumentException] {
      VectorIndexMaintenance.rebuild(spark, fs, embRoot, idxRoot,
        "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
    }
    assert(eInPlace.getMessage.contains("FRESH"))
    val idx2 = tmp("vx_idx2")
    assert(VectorIndexMaintenance.rebuild(spark, fs, embRoot, idx2,
      "vec_id", "embedding", dim, m = 4, ks = 4, centroids = 4)
      === Seq(2L)) // fresh bootstrap at the LATEST version
    assert(VectorIndexMaintenance.trainMeta(fs, idx2).get
      .trainedVersion === 2L)
    // a just-rebuilt index IS the fresh index: recall@k = 1.0
    val queries = emb(Seq(2L, 33L))
    val st = VectorIndexMaintenance.staleness(spark, fs, embRoot, idx2,
      queries, "vec_id", "embedding", k = 3, dim = dim, m = 4)
      .collect().head
    assert(st.getAs[Long]("trained_version") === 2L)
    assert(st.getAs[Long]("latest_version") === 2L)
    assert(st.getAs[Double]("recall") === 1.0)
    // the drifted maintained index reports recall <= 1 against the
    // fresh-trained ground set (deterministic; typically < 1 here)
    val stOld = VectorIndexMaintenance.staleness(spark, fs, embRoot,
      idxRoot, queries, "vec_id", "embedding", k = 3, dim = dim, m = 4)
      .collect().head
    assert(stOld.getAs[Long]("trained_version") === 1L)
    assert(stOld.getAs[Double]("recall") <= 1.0)
    assert(stOld.getAs[Double]("recall") >= 0.0)
  }
}
