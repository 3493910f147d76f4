package graft.gates

import graft.algos._
import graft.core.Tables
import graft.expr.{DateComponents, PartitionCriteria, SchemaOps}
import graft.catalog.{CatalogOps, TableWriter}
import graft.fsops.FsOps
import graft.io.{DataFormat, LoadMode}
import graft.functions.PortableHash
import graft.operators._
import graft.streaming.EventStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import OracleHelpers._

/** Gates: embeddings: ANN search, k-means, PQ/IVF, covariance. */
object AnnGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // similarity: brute-force cosine top-k (exact baseline)
    "q23_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // similarity: sign-LSH bucketed ANN (scale path; native signature expr)
    "q24_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.annTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // similarity: IVF ANN (sampled centroids + nprobe cells + exact re-rank)
    "q42_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // curation: SemDeDup-style embedding cluster dedup — the cluster keep
    // policy composed with the sign-LSH cosine pair graph (one survivor
    // per semantic near-dup component, labels from the same
    // connectedComponents loop as q61/q64)
    "q65_embedding_clusters" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, bits = 8, tables = 4)
        .select(col("id_a"), col("id_b"))
      Dedup.keepPerComponent(emb, "vec_id", pairs)
        .frame.select(col("vec_id"))
    }),

    // embeddings: label-centroid cosine matrix — which classes sit
    // close in embedding space; exact integer quantized sums, the 1/n
    // factors cancel so sum-vector cosine IS centroid cosine
    "q137_label_centroids" -> ((s, dir) => {
      Similarity.labelCentroidSimilarity(t(s, dir, "embeddings"),
        "embedding", "label")
    }),

    // curation: embedding outliers — per label, the 5 vectors farthest
    // from the label centroid (mislabel/garbage detector). Integer-exact:
    // quantized coords, distance*n^2 = sum((n*x_i - S_i)^2), no float mean
    "q121_embedding_outliers" -> ((s, dir) => {
      Similarity.embeddingOutliers(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", k = 5)
    }),

    // embeddings: dimension covariance matrix (upper triangle) — the
    // whitening/PCA input and dead/collinear-dim audit; exact quantized
    // integer sums (q137's determinism device), fixed double association
    "q186_embedding_covariance" -> ((s, dir) => {
      Similarity.embeddingCovariance(t(s, dir, "embeddings"),
        "embedding", scale = 1024)
    }),

    // ML: one Lloyd iteration from the deterministic hash-sampled init —
    // the k-means training kernel (literal-centroid assignment argmax +
    // exact fixed-point centroid means via VectorSumAgg), emitted tall
    "q195_kmeans_step" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.kmeansStep(emb, "vec_id", "embedding",
          Similarity.selectCentroids(emb, "vec_id", "embedding", 8))
        .select(col("cid"), col("n"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("mean"), col("n"))
    }),

    // ML: the kmeansCentroids LOOP at maxIters=1 — init, one step, and
    // the driver-side centroid-table rebuild, gated with q195's oracle
    "q205_kmeans_train" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8,
          maxIters = 1)
        .select(col("cid"), col("n"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("mean"), col("n"))
    }),

    // ANN: IVF retrieval over TRAINED centroids (one Lloyd iteration) —
    // the full train-then-retrieve chain, float-exact end to end
    "q209_ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 8, maxIters = 1)
      Similarity.ivfTopKWith(emb.filter(col("vec_id") % 50 === 0), emb,
          "vec_id", "embedding", k = 5, centroidsDf = cent)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // ML: greedy farthest-point centroid init (k=3) — the deterministic
    // k-means++-style spread seeding, two unrolled argmin rounds
    "q222_kmeans_farthest_init" -> ((s, dir) => {
      Similarity.selectCentroidsFarthest(t(s, dir, "embeddings"),
          "vec_id", "embedding", 3)
        .select(col("sel"), col("cid"),
          posexplode(col("ce")).as(Seq("dim", "m")))
        .select(col("sel"), col("cid"), col("dim"),
          round(col("m").cast("double"), 6).as("val"))
    }),

    // ANN: product-quantization code artifact (Jégou et al. 2011) — 64
    // float dims become 8 codes over 16 hash-sampled codewords per
    // subspace (a 32x memory cut); the compressed table the ADC scan
    // joins instead of reading vectors
    "q271_pq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqEncode(emb, "vec_id", "embedding", dim = 64, m = 8,
        Similarity.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 16))
    }),

    // ANN: PQ asymmetric-distance top-5 — every 50th vector queries the
    // compressed corpus; per-cell distances fixed-point quantized so
    // the 8-term sums are exact BIGINT under any aggregation order
    "q272_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16)
    }),

    // ANN: two-stage PQ retrieval — ADC shortlist of 25 from the
    // compressed scan, exact cosine re-rank to top-5; full vectors
    // touched only for the shortlist
    "q279_pq_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopKRerank(emb.filter(col("vec_id") % 50 === 0), emb,
          "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16,
          shortlist = 25)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    // embeddings: JL random projection — 64 dims onto 16 md5-derived
    // planes (the LSH planes family, raw coordinates instead of sign
    // bits); exploded long-format for the gate
    "q278_random_projection" -> ((s, dir) => {
      Similarity.randomProjection(t(s, dir, "embeddings"), "vec_id",
          "embedding", dOut = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("b", "p")))
        .select(col("vec_id"), col("b"), round(col("p"), 6).as("p"))
    }),

    // ANN: IVF-PQ — 32 L2-assigned cells prune WHICH codes are
    // scanned, PQ compresses WHAT is scanned (the FAISS-style 100 TB
    // configuration); queries probe their 4 nearest cells
    "q273_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        "vec_id", "embedding", k = 5, dim = 64, m = 8, ks = 16,
        centroids = 32, nprobe = 4)
    }),

    // ANN: IVF-PQ through the PREPARED-artifact params surface (q273's
    // amortized face): PqCodebooks + IvfCentroids + IvfPqCodes write
    // the release artifacts (codes partitioned by cid — the probe join
    // IS partition pruning), IvfPqSearchPrepared replays them; the
    // result must be IDENTICAL to the one-shot q273, which is the gate
    "q281_ivfpq_prepared" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q281")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "embeddings").write.parquet(p("emb"))
      t(s, dir, "embeddings").filter(col("vec_id") % 50 === 0)
        .write.parquet(p("queries"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("PqCodebooks",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("cb")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "dim": 64, "m": 8, "ks": 16}""".stripMargin)
      run("IvfCentroids",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("cent")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "centroids": 32}""".stripMargin)
      run("IvfPqCodes",
        s"""{"source_dir": "${p("emb")}", "target_dir": "${p("codes")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "dim": 64, "m": 8,
           | "codebooks_dir": "${p("cb")}",
           | "centroids_dir": "${p("cent")}"}""".stripMargin)
      run("IvfPqSearchPrepared",
        s"""{"source_dir": "${p("codes")}", "target_dir": "${p("topk")}",
           | "id_column": "vec_id", "vector_column": "embedding",
           | "queries_dir": "${p("queries")}",
           | "codebooks_dir": "${p("cb")}",
           | "centroids_dir": "${p("cent")}",
           | "k": 5, "dim": 64, "m": 8, "nprobe": 4}""".stripMargin)
      s.read.parquet(p("topk"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q23_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qv)+1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv)+1),
        |         i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, round(cosine,6) AS cosine FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors Similarity.annTopK (bits=8, tables=4): identical hyperplane
    // weights and dot-product order → identical buckets → identical top-k
    "q24_ann_lsh" ->
      s"""WITH ${lshSigsSql(tables = 4, bits = 8, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
         |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qv.embedding", "cv.embedding")} AS cosine
         |  FROM cand
         |  JOIN v qv ON qv.vec_id = query_id
         |  JOIN v cv ON cv.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors Similarity.ivfTopK (centroids=128, nprobe=3): identical
    // fixed-count hash-sampled centroid set, assignment argmax, probe set,
    // and re-rank
    "q42_ann_ivf" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 128),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN emb qe ON qe.vec_id = query_id
         |  JOIN emb ne ON ne.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors keepPerComponent over embeddingNearDupPairs: q39's sign-LSH
    // cosine pair graph, min-id components (recursive closure), survivors
    // are vectors that are their own component label
    "q65_embedding_clusters" ->
      s"""WITH RECURSIVE ${lshSigsSql(tables = 4, bits = 8, dims = 64)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b
         |    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("va.embedding", "vb.embedding")} AS cosine
         |  FROM cand
         |  JOIN v va ON va.vec_id = id_a
         |  JOIN v vb ON vb.vec_id = id_b),
         |pairs AS (SELECT id_a, id_b FROM scored WHERE cosine >= 0.4),
         |e AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
         |  WHERE r.src <> e2.dst),
         |comp AS (
         |  SELECT src AS id, least(src, min(dst)) AS component
         |  FROM reach GROUP BY src)
         |SELECT vv.vec_id FROM v vv
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c
         |  WHERE c.id = vv.vec_id AND c.component <> vv.vec_id)""".stripMargin,

    // mirrors q137: q121's floor(x*1024) codes, per-(label, dim) BIGINT
    // sums, dot/norms exact, one identical double cosine at the end
    "q137_label_centroids" ->
      """WITH q AS (
        |  SELECT label,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (
        |  SELECT label, i, xq[i] AS x
        |  FROM q, unnest(generate_series(1, len(xq))) AS u(i)),
        |s AS (
        |  SELECT label, i, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2),
        |d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(sum(a.s * b.s) AS BIGINT) AS dot
        |  FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2),
        |nr AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS nrm
        |  FROM s GROUP BY 1)
        |SELECT d.label_a, d.label_b,
        |  CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN NULL
        |    ELSE round(CAST(d.dot AS DOUBLE) /
        |      (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
        |      6) END AS cosine
        |FROM d JOIN nr na ON na.label = d.label_a
        |       JOIN nr nb ON nb.label = d.label_b""".stripMargin,

    // mirrors Similarity.embeddingOutliers(k=5, scale=1024): quantize to
    // floor(x*1024), per-label elementwise sums S and counts n, rank by
    // the integer sum((n*x - S)^2) desc (ties to vec_id)
    "q121_embedding_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id, label, i, xq[i] AS x
        |  FROM q, unnest(generate_series(1, len(xq))) AS u(i)),
        |s AS (
        |  SELECT label, i, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2),
        |n AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
        |d AS (
        |  SELECT e.vec_id, e.label,
        |    CAST(sum((n.n * e.x - s.s) * (n.n * e.x - s.s)) AS BIGINT)
        |      AS d_n2
        |  FROM e JOIN s ON s.label = e.label AND s.i = e.i
        |         JOIN n ON n.label = e.label
        |  GROUP BY 1, 2)
        |SELECT vec_id, label, d_n2, rank FROM (
        |  SELECT vec_id, label, d_n2,
        |    row_number() OVER (PARTITION BY label
        |                       ORDER BY d_n2 DESC, vec_id) AS rank
        |  FROM d)
        |WHERE rank <= 5""".stripMargin,

    // mirrors q186: identical floor(x*1024) quantization, exact integer
    // sums, the same fixed double association for the cov cell
    "q186_embedding_covariance" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |e AS (
        |  SELECT vec_id, CAST(g - 1 AS INTEGER) AS i, qv[g] AS x FROM (
        |    SELECT vec_id, qv,
        |      unnest(generate_series(1, len(qv))) AS g
        |    FROM q)),
        |lin AS (
        |  SELECT i, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
        |  FROM e GROUP BY i),
        |cells AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS sp
        |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT c.i, c.j, CAST(l1.n AS BIGINT) AS n,
        |  round((CAST(l1.n AS DOUBLE) * CAST(c.sp AS DOUBLE)
        |    - CAST(l1.s AS DOUBLE) * CAST(l2.s AS DOUBLE))
        |    / (CAST(l1.n AS DOUBLE) * CAST(l1.n AS DOUBLE) * 1048576.0),
        |    6) + 0.0 AS cov
        |FROM cells c JOIN lin l1 ON c.i = l1.i
        |  JOIN lin l2 ON c.j = l2.i""".stripMargin,

    // mirrors q195: identical 8-centroid hash-sampled init, (cos DESC,
    // cid ASC) assignment argmax, and EXACT fixed-point integer sums —
    // the double->REAL->double cast chain reproduces kmeansStep's float
    // centroid storage bit-for-bit, so round(…,6) can never straddle a
    // tie. Empty clusters (LEFT JOIN miss) carry the old centroid, n=0.
    "q195_kmeans_step" -> kmeansStepSql,

    // q205 = q195's oracle: the maxIters=1 training loop returns exactly
    // one step from the hash-sampled init (the driver rebuild is an
    // identity on values)
    "q205_kmeans_train" -> kmeansStepSql,

    // mirrors q209: q195's one-iteration centroid update (exact integer
    // sums, double->REAL float storage) rebuilt as vectors, then q42's
    // assignment/probe/re-rank pipeline over the TRAINED centroids
    "q209_ann_ivf_trained" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |          ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |          LIMIT 8),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent0 c) WHERE rk = 1),
         |qz AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign0 a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM qz)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent0)),
         |cent AS (
         |  SELECT cd.cid, list(
         |      CASE WHEN s.n IS NULL THEN cd.ce[cd.dim + 1]
         |           ELSE CAST(CAST(s.s AS DOUBLE)
         |             / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) END
         |      ORDER BY cd.dim) AS ce
         |  FROM centd cd LEFT JOIN sums s
         |    ON s.cid = cd.cid AND s.dim = cd.dim
         |  GROUP BY cd.cid),
         |assign AS (
         |  SELECT vec_id AS neighbor_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c WHERE e.vec_id % 50 = 0)
         |  WHERE rk <= 3),
         |cand AS (
         |  SELECT DISTINCT query_id, neighbor_id
         |  FROM probe JOIN assign USING (cid)
         |  WHERE query_id <> neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand
         |  JOIN emb qe ON qe.vec_id = query_id
         |  JOIN emb ne ON ne.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |                           ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors q222: hash-min seed, then two argmin-of-max-cosine rounds
    // with (similarity ASC, id ASC) tie-breaks
    "q222_kmeans_farthest_init" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |c1 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |       ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |       LIMIT 1),
         |c2 AS (
         |  SELECT e.vec_id AS cid, e.embedding AS ce
         |  FROM emb e CROSS JOIN c1
         |  ORDER BY ${cosSql("e.embedding", "c1.ce")} ASC, e.vec_id
         |  LIMIT 1),
         |c3 AS (
         |  SELECT e.vec_id AS cid, e.embedding AS ce
         |  FROM emb e CROSS JOIN c1 CROSS JOIN c2
         |  ORDER BY greatest(${cosSql("e.embedding", "c1.ce")},
         |                    ${cosSql("e.embedding", "c2.ce")}) ASC,
         |    e.vec_id
         |  LIMIT 1),
         |sel AS (
         |  SELECT 1 AS sel, cid, ce FROM c1
         |  UNION ALL SELECT 2, cid, ce FROM c2
         |  UNION ALL SELECT 3, cid, ce FROM c3)
         |SELECT CAST(sel AS INTEGER) AS sel, cid,
         |  CAST(g - 1 AS INTEGER) AS dim,
         |  round(CAST(ce[g] AS DOUBLE), 6) AS val
         |FROM (SELECT sel, cid, ce,
         |        unnest(generate_series(1, len(ce))) AS g FROM sel)""".stripMargin,

    // mirrors Similarity.pqCodebooks + pqEncode (dim 64, m=8, ks=16):
    // identical hash-ordered codeword ranks, list-slice subvectors, and
    // squared-L2 argmin with ties to the smaller code
    "q271_pq_codes" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j))
         |SELECT vec_id, j, code FROM (
         |  SELECT v.vec_id, v.j, c.code,
         |    row_number() OVER (PARTITION BY v.vec_id, v.j
         |      ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |  FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1""".stripMargin,

    // mirrors Similarity.pqTopK (k=5): the q271 encode CTEs + per-query
    // fixed-point distance tables; approximate distance is the exact
    // BIGINT sum of 8 table lookups
    "q272_ann_pq" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2Sql("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |ad AS (
         |  SELECT t.query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(t.qd) AS BIGINT) AS adfix
         |  FROM enc e JOIN qt t ON e.j = t.j AND e.code = t.code
         |  WHERE t.query_id <> e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id,
         |  round(adfix / 1048576.0, 6) AS pq_dist
         |FROM ad
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adfix, neighbor_id) <= 5""".stripMargin,

    // mirrors Similarity.pqTopKRerank (shortlist=25, k=5): q272's ADC
    // CTEs shortlist by (adfix, neighbor_id), exact cosine re-ranks
    "q279_pq_rerank" ->
      s"""WITH sel AS (
         |  SELECT vec_id AS cid, embedding AS ce,
         |    CAST(row_number() OVER (ORDER BY
         |      ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS INTEGER) - 1 AS code
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 16),
         |cb AS (
         |  SELECT CAST(t.j AS INTEGER) AS j, code,
         |    ce[t.j*8+1 : t.j*8+8] AS sub
         |  FROM sel, range(0,8) t(j)),
         |sv AS (
         |  SELECT e.vec_id, CAST(t.j AS INTEGER) AS j,
         |    e.embedding[t.j*8+1 : t.j*8+8] AS subv
         |  FROM embeddings e, range(0,8) t(j)),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT v.vec_id, v.j, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.j
         |        ORDER BY ${l2Sql("v.subv", "c.sub")}, c.code) AS rk
         |    FROM sv v JOIN cb c ON v.j = c.j) WHERE rk = 1),
         |qt AS (
         |  SELECT v.vec_id AS query_id, v.j, c.code,
         |    CAST(round(${l2Sql("v.subv", "c.sub")} * 1048576) AS BIGINT)
         |      AS qd
         |  FROM sv v JOIN cb c ON v.j = c.j
         |  WHERE v.vec_id % 50 = 0),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT t.query_id, e.vec_id AS neighbor_id,
         |      CAST(SUM(t.qd) AS BIGINT) AS adfix
         |    FROM enc e JOIN qt t ON e.j = t.j AND e.code = t.code
         |    WHERE t.query_id <> e.vec_id
         |    GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY adfix, neighbor_id) <= 25),
         |scored AS (
         |  SELECT s.query_id, s.neighbor_id,
         |    ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |  FROM short s
         |  JOIN embeddings qe ON qe.vec_id = s.query_id
         |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, neighbor_id) <= 5""".stripMargin,

    // mirrors Similarity.randomProjection(dOut=16, table=0): the SAME
    // md5-derived planes (PortableHash.sqlPlanes), sequential-order
    // double dot products
    "q278_random_projection" ->
      s"""WITH planes AS (${PortableHash.sqlPlanes(1, 16, 64)}),
         |pl AS (SELECT b, list(w ORDER BY d) AS ws FROM planes
         |  WHERE t = 0 GROUP BY b)
         |SELECT e.vec_id, CAST(pl.b AS INTEGER) AS b,
         |  round(list_sum(list_transform(range(1, 65),
         |    i -> CAST(e.embedding[i] AS DOUBLE) * pl.ws[i])), 6) AS p
         |FROM embeddings e, pl""".stripMargin,

    // mirrors Similarity.ivfPqTopK (centroids=32, nprobe=4, k=5): the
    // q272 encode/distance-table CTEs gated by L2 cell assignment and
    // the probed-cell join
    "q273_ann_ivfpq" -> ivfPqSql,

    // q281 runs the SAME search through the prepared-artifact params
    // surface (codebooks/centroids/cid-partitioned codes written once,
    // IvfPqSearchPrepared replays them) — prepared ≡ one-shot is the
    // identity being gated, so the oracle IS q273's
    "q281_ivfpq_prepared" -> ivfPqSql
  )
}
