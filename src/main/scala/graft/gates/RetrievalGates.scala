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

/** Gates: retrieval: BM25, hybrid, rerank, eval. */
object RetrievalGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // retrieval eval: recall@5 + MRR of IVF retrieval against the exact
    // nearest neighbor — the ANN stack's evaluation face as a gate
    "q223_retrieval_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(q, emb, "vec_id",
          "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("relevant_id"))
      val results = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        k = 5)
      Similarity.retrievalEval(results, truth)
    }),

    // retrieval eval over TRAINED centroids: one Lloyd iteration lifts
    // IVF recall@5 from 0.4 to 0.6 at the same candidate budget — the
    // measured value of k-means training, now oracle-gated
    "q224_retrieval_eval_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(q, emb, "vec_id",
          "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("relevant_id"))
      Similarity.retrievalEval(
        Similarity.ivfTopKWith(q, emb, "vec_id", "embedding", k = 5,
          Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 128,
            maxIters = 1)),
        truth)
    }),

    // streaming semantic decontamination: q238's check per micro-batch
    // against the once-prepared benchmark signatures (4 files,
    // maxFilesPerTrigger=1 -> 4 real triggers); stateless, so per-batch
    // outputs union to the batch result — q238's oracle gates it
    // BM25 lexical retrieval, framed as more-like-this: every 97th doc
    // is a query against the whole corpus. The synthetic vocabulary is
    // 31 terms with min df ≈ 5%, so the df-pruning default would empty
    // most queries — the gate runs at maxDfFraction=0.9 (all terms
    // participate; pruning semantics are spec-pinned on a crafted
    // corpus where rare vs stopword terms actually differ)
    "q249_bm25_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Similarity.bm25TopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 5,
        maxDfFraction = 0.9)
    }),

    // the amortized BM25 regime: corpus statistics saved once as a
    // (term, df, n, sdl) artifact (parquet round-trip), the batch then
    // scored against the SAVED table — value-identical to the inline
    // scores, which is what the shared oracle gates
    "q251_bm25_artifacts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val artDir = tmpDir("graft_q251") + "/arts"
      Similarity.bm25Artifacts(docs, "doc_id", "text")
        .write.parquet(artDir)
      Similarity.bm25ScoreAgainst(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
        s.read.parquet(artDir), maxDfFraction = 0.9)
    }),

    // hybrid retrieval: the BM25 list over documents and the brute
    // cosine list over embeddings (vec_id aligned with doc_id in the
    // synthetic tables, self kept on both sides) fused by reciprocal
    // rank — rank fusion needs no score calibration between the
    // heterogeneous retrievers
    "q250_hybrid_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lex = Similarity.bm25TopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 5,
        maxDfFraction = 0.9)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val vec = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 97 === 0), emb, "vec_id",
          "embedding", k = 5, excludeSelf = false)
        .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Similarity.fuseRankings(Seq(lex, vec), k = 5)
    }),

    // pipeline gate: the retrieval family composed through the params
    // surface ONLY — Bm25Artifacts -> Bm25Score (amortized scoring
    // against the saved table) -> consumer rank -> FuseRankings; RRF
    // self-fusion is order-preserving (2/(60+r) is strictly decreasing
    // in r), so the oracle is the q249 ranking with the fused score
    "q268_retrieval_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q268")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 97 === 0).write.parquet(p("queries"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("Bm25Artifacts",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text"}""".stripMargin)
      run("Bm25Score",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("scores")}",
           | "id_column": "doc_id", "text_column": "text",
           | "queries_dir": "${p("queries")}",
           | "query_id_column": "doc_id", "query_text_column": "text",
           | "artifacts_dir": "${p("arts")}",
           | "max_df_fraction": 0.9}""".stripMargin)
      s.read.parquet(p("scores"))
        .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("doc_id"), col("rank"))
        .write.parquet(p("lex"))
      run("FuseRankings",
        s"""{"source_dir": "${p("lex")}", "target_dir": "${p("fused")}",
           | "other_rankings_dirs": ["${p("lex")}"],
           | "k": 5}""".stripMargin)
      s.read.parquet(p("fused"))
    }),

    // retrieval: MMR diversity re-rank of brute-force top-8 candidates
    // (lambda=0.7, k=3) — greedy argmax of relevance minus max-sim to
    // the already-picked set; score rounded to 6 before each argmax so
    // the greedy choice is engine-reproducible
    "q254_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cand = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0), emb, "vec_id",
          "embedding", k = 8)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          round(col("cosine"), 6).as("rel"))
        .join(emb.select(col("vec_id").as("doc_id"),
          col("embedding").as("vec")), Seq("doc_id"))
      Similarity.mmrRerank(cand, "query_id", "doc_id", "rel", "vec",
        k = 3, lambda = 0.7)
    })
  )

  val oracleSql: Map[String, String] = Map(

    // mirrors q223: brute top-1 truth + q42's IVF pipeline, reciprocal
    // rank of the first relevant hit (every literal CAST to DOUBLE)
    "q223_retrieval_eval" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id, embedding FROM emb WHERE vec_id % 50 = 0),
         |truth AS (
         |  SELECT vec_id AS query_id, cid2 AS relevant_id FROM (
         |    SELECT q.vec_id, c.vec_id AS cid2,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
         |          c.vec_id) AS rk
         |    FROM qs q JOIN emb c ON q.vec_id <> c.vec_id) x
         |  WHERE x.rk = 1),
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
         |res AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM (
         |    SELECT query_id, neighbor_id,
         |      ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |    FROM cand
         |    JOIN emb qe ON qe.vec_id = query_id
         |    JOIN emb ne ON ne.vec_id = neighbor_id) s
         |  QUALIFY rk <= 5),
         |firsts AS (
         |  SELECT t.query_id, min(r.rk) AS frk
         |  FROM truth t LEFT JOIN res r
         |    ON r.query_id = t.query_id AND r.neighbor_id = t.relevant_id
         |  GROUP BY t.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(CASE WHEN frk IS NOT NULL THEN CAST(1 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS recall_at_k,
         |  round(avg(CASE WHEN frk IS NOT NULL
         |    THEN CAST(1 AS DOUBLE) / frk
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS mrr
         |FROM firsts""".stripMargin,

    // mirrors q224: q223's metrics with the retrieval side running over
    // ONE-iteration-trained centroids (the q209 update chain at k=128)
    "q224_retrieval_eval_trained" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id, embedding FROM emb WHERE vec_id % 50 = 0),
         |truth AS (
         |  SELECT vec_id AS query_id, cid2 AS relevant_id FROM (
         |    SELECT q.vec_id, c.vec_id AS cid2,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
         |          c.vec_id) AS rk
         |    FROM qs q JOIN emb c ON q.vec_id <> c.vec_id) x
         |  WHERE x.rk = 1),
         |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |          ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |          LIMIT 128),
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
         |res AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM (
         |    SELECT query_id, neighbor_id,
         |      ${cosSql("qe.embedding", "ne.embedding")} AS cosine
         |    FROM cand
         |    JOIN emb qe ON qe.vec_id = query_id
         |    JOIN emb ne ON ne.vec_id = neighbor_id) s
         |  QUALIFY rk <= 5),
         |firsts AS (
         |  SELECT t.query_id, min(r.rk) AS frk
         |  FROM truth t LEFT JOIN res r
         |    ON r.query_id = t.query_id AND r.neighbor_id = t.relevant_id
         |  GROUP BY t.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(CASE WHEN frk IS NOT NULL THEN CAST(1 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS recall_at_k,
         |  round(avg(CASE WHEN frk IS NOT NULL
         |    THEN CAST(1 AS DOUBLE) / frk
         |    ELSE CAST(0 AS DOUBLE) END), 6) AS mrr
         |FROM firsts""".stripMargin,

    // mirrors q249 — see bm25BodySql
    "q249_bm25_retrieval" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)}
         |SELECT query_id, doc_id, score,
         |  CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id)
         |    AS INTEGER) AS rank
         |FROM sc
         |QUALIFY rank <= 5""".stripMargin,

    // q251 scores against the SAVED artifact and q252 streams the same
    // stateless scoring per micro-batch — both are value-identities on
    // the inline score table (no rank: ranking is the consumer's window)
    "q251_bm25_artifacts" -> bm25ScoresSql,

    // mirrors q250: the BM25 list (q249's CTEs) and the brute-cosine
    // list (q23's math, self kept) fused by reciprocal rank — both
    // engines rank each list independently (score DESC, id) then sum
    // 1/(60 + rank) per (query, doc), rounded to 6 before the fused rank
    "q250_hybrid_retrieval" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)},
         |lex AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, doc_id)
         |      AS INTEGER) AS rank
         |  FROM sc
         |  QUALIFY rank <= 5),
         |vq AS (SELECT vec_id AS query_id, embedding AS qv
         |       FROM embeddings WHERE vec_id % 97 = 0),
         |vc AS (SELECT vec_id AS neighbor_id, embedding AS cv
         |       FROM embeddings),
         |vscored AS (
         |  SELECT query_id, neighbor_id,
         |    list_sum(list_transform(range(1, len(qv)+1),
         |      i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
         |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(range(1, len(cv)+1),
         |         i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
         |      AS cosine
         |  FROM vq CROSS JOIN vc),
         |vec AS (
         |  SELECT query_id, neighbor_id AS doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
         |      AS INTEGER) AS rank
         |  FROM vscored
         |  QUALIFY rank <= 5),
         |u AS (SELECT query_id, doc_id, rank FROM lex
         |      UNION ALL SELECT query_id, doc_id, rank FROM vec),
         |f AS (
         |  SELECT query_id, doc_id,
         |    round(sum(1.0 / (60.0 + CAST(rank AS DOUBLE))), 6)
         |      AS rrf_score
         |  FROM u GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_score,
         |  CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id)
         |    AS INTEGER) AS rank
         |FROM f
         |QUALIFY rank <= 5""".stripMargin,

    // mirrors q268: q249's CTEs -> lex rank -> self-fused RRF score
    // (2/(60+rank), rounded 6) with the rank re-derived from it —
    // identical to the lex rank because the fused score is strictly
    // decreasing in rank
    "q268_retrieval_pipeline" ->
      s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)},
         |lex AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, doc_id)
         |      AS INTEGER) AS rank
         |  FROM sc
         |  QUALIFY rank <= 5)
         |SELECT query_id, doc_id,
         |  round(2 * (1.0 / (60 + CAST(rank AS DOUBLE))), 6) AS rrf_score,
         |  rank
         |FROM lex""".stripMargin,

    // mirrors Similarity.mmrRerank (k=3, lambda=0.7): the greedy loop
    // unrolled to 3 rounds; each argmax orders by the MMR score rounded
    // to 6 (doc_id tie-break), msim accumulates via greatest over the
    // bit-identical cosSql; 0.7/0.3 written as DOUBLE subtraction so the
    // constants are the same IEEE doubles Scala computes
    "q254_mmr_rerank" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings),
         |cand AS (
         |  SELECT query_id, doc_id, round(cosine, 6) AS rel, cv
         |  FROM (SELECT query_id, doc_id, cv,
         |    ${cosSql("qv", "cv")} AS cosine
         |    FROM q CROSS JOIN c WHERE query_id <> doc_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, doc_id) <= 8),
         |s1 AS (SELECT query_id, doc_id, rel, cv FROM cand
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(rel, 6) DESC, doc_id) = 1),
         |m1 AS (SELECT cand.query_id, cand.doc_id, cand.rel, cand.cv,
         |    ${cosSql("cand.cv", "s1.cv")} AS msim
         |  FROM cand JOIN s1 ON cand.query_id = s1.query_id
         |    AND cand.doc_id <> s1.doc_id),
         |s2 AS (SELECT query_id, doc_id, rel, cv, msim FROM m1
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(CAST(0.7 AS DOUBLE) * rel
         |      - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim, 6)
         |      DESC, doc_id) = 1),
         |m2 AS (SELECT m1.query_id, m1.doc_id, m1.rel,
         |    greatest(m1.msim, ${cosSql("m1.cv", "s2.cv")}) AS msim
         |  FROM m1 JOIN s2 ON m1.query_id = s2.query_id
         |    AND m1.doc_id <> s2.doc_id),
         |s3 AS (SELECT query_id, doc_id, rel FROM m2
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(CAST(0.7 AS DOUBLE) * rel
         |      - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * msim, 6)
         |      DESC, doc_id) = 1)
         |SELECT query_id, doc_id, round(rel, 6) AS rel, 1 AS mmr_rank
         |FROM s1
         |UNION ALL SELECT query_id, doc_id, round(rel, 6), 2 FROM s2
         |UNION ALL SELECT query_id, doc_id, round(rel, 6), 3 FROM s3""".stripMargin
  )
}
