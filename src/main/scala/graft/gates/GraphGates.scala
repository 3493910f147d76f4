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

/** Gates: graph algorithms: PageRank family, HITS, components. */
object GraphGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // curation telemetry: dup-graph SHAPE — wedge/triangle counts and
    // the global clustering coefficient of q64's near-dup graph (high =
    // templated boilerplate families, low = incremental-edit chains);
    // triangles via the degree-ordered orientation (outdeg <= O(sqrt(m)))
    "q129_graph_stats" -> ((s, dir) => {
      val docs0 = Dedup.exactDedup(t(s, dir, "documents"), "doc_id",
        "text")
      val cand = Dedup.minhashCandidates(docs0, "doc_id", "text",
        shingleSize = 3, k = 32, bands = 8)
      val near = Dedup.jaccardVerify(cand, docs0, "doc_id", "text",
          shingleSize = 3)
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      Dedup.graphStats(near)
    }),

    // graph: one PageRank iteration over the customer -> supplier
    // purchase graph (suppliers are all dangling — the redistribution
    // path is live); fixed-point quantized contributions make the rank
    // doubles bit-identical to the oracle's
    "q198_pagerank_step" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      GraphRank.pageRankStep(GraphRank.initRanks(edges), edges)
    }),

    // graph: WEIGHTED PageRank step — edge weight = order lines per
    // (customer, supplier) pair, so heavy trade routes carry more rank
    "q225_weighted_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .agg(count(lit(1)).as("w"))
      GraphRank.pageRankStep(GraphRank.initRanks(edges), edges,
        weightCol = Some("w"))
    }),

    // graph: personalized PageRank step — teleport confined to every
    // 10th customer, rank becomes relevance relative to that seed set
    "q226_personalized_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      val seeds = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 10 === 0)
      GraphRank.pageRankStepSeeded(GraphRank.initRanks(edges), edges,
        seeds)
    }),

    // graph: HITS hubs/authorities on the bipartite purchase graph —
    // two mutual-reinforcement rounds in EXACT integer arithmetic
    "q227_hits" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
        .distinct()
      GraphRank.hitsScores(edges, iters = 2)
    }),

    // weak supervision: near-dups of labeled docs inherit the majority
    // neighbor label — every 3rd doc's lang is masked, then propagated
    "q228_label_propagation" -> ((s, dir) => {
      val docs0 = t(s, dir, "documents")
      val masked = docs0.select(col("doc_id"), col("text"),
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"))
      val pairs = Dedup.jaccardVerify(
          Dedup.minhashCandidates(docs0, "doc_id", "text"),
          docs0, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.propagateLabels(masked, "doc_id", "lang", pairs)
        .select(col("doc_id"), col("lang"), col("label_source"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // mirrors q129: the same degree-ordered orientation (row-value
    // comparisons mirror Spark's struct ordering), triangles from the
    // lowest-degree corner, wedges = sum(deg*(deg-1))/2
    "q129_graph_stats" ->
      s"""WITH docs0 AS (
         |  SELECT doc_id, text FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |e AS (
         |  SELECT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
         |  FROM pairs WHERE id_a <> id_b GROUP BY 1, 2),
         |deg AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
         |              THEN e.u ELSE e.v END AS src,
         |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v)
         |              THEN e.v ELSE e.u END AS dst
         |  FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
         |r AS (SELECT o.src, o.dst, d.deg AS dd
         |      FROM o JOIN deg d ON d.id = o.dst),
         |p AS (
         |  SELECT a.src, a.dst AS b, c.dst AS c
         |  FROM r a JOIN r c ON a.src = c.src
         |  WHERE (a.dd, a.dst) < (c.dd, c.dst)),
         |tri AS (
         |  SELECT count(*) AS t FROM p
         |  WHERE EXISTS (SELECT 1 FROM o
         |                WHERE o.src = p.b AND o.dst = p.c)),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         |nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |    CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
         |  FROM deg)
         |SELECT nd.n_nodes, ne.n_edges, nd.n_wedges,
         |  CAST(tri.t AS BIGINT) AS n_triangles,
         |  CASE WHEN nd.n_wedges > 0
         |       THEN 3.0 * tri.t / nd.n_wedges END AS clustering
         |FROM nd, ne, tri""".stripMargin,

    // mirrors q198 pageRankStep arithmetic VERBATIM (operand order
    // included): quantized long contribution sums are exact in both
    // engines; every literal is CAST to DOUBLE because DuckDB parses
    // bare decimal literals as DECIMAL, whose division is not IEEE
    "q198_pagerank_step" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |srcq AS (SELECT deg.src, CAST(floor(CAST(1000000000 AS DOUBLE)
        |             * r0.r / deg.deg) AS BIGINT) AS q
        |         FROM r0 JOIN deg ON r0.id = deg.src),
        |contrib AS (SELECT e.dst, CAST(sum(srcq.q) AS BIGINT) AS qin
        |            FROM e JOIN srcq ON e.src = srcq.src GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE))
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST((SELECT q FROM dm) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE) / (SELECT n FROM nn)) AS rank
        |FROM nodes nd LEFT JOIN contrib c ON nd.id = c.dst""".stripMargin,

    // mirrors q225: weighted out-mass (sum of line counts per source),
    // per-edge floor(scale·r·w / srcW) contributions — exact longs
    "q225_weighted_pagerank" ->
      """WITH e AS (SELECT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst,
        |             CAST(count(*) AS BIGINT) AS w
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |           GROUP BY 1, 2),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |contrib AS (
        |  SELECT e.dst, CAST(sum(CAST(floor(CAST(1000000000 AS DOUBLE)
        |      * r0.r * e.w / deg.deg) AS BIGINT)) AS BIGINT) AS qin
        |  FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE))
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST((SELECT q FROM dm) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE) / (SELECT n FROM nn)) AS rank
        |FROM nodes nd LEFT JOIN contrib c ON nd.id = c.dst""".stripMargin,

    // mirrors q226: teleport + dangling mass confined to the seed set
    "q226_personalized_pagerank" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 10 = 0),
        |ss AS (SELECT CAST(count(*) AS BIGINT) AS s FROM seeds),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e
        |        GROUP BY src),
        |srcq AS (SELECT deg.src, CAST(floor(CAST(1000000000 AS DOUBLE)
        |             * r0.r / deg.deg) AS BIGINT) AS q
        |         FROM r0 JOIN deg ON r0.id = deg.src),
        |contrib AS (SELECT e.dst, CAST(sum(srcq.q) AS BIGINT) AS qin
        |            FROM e JOIN srcq ON e.src = srcq.src GROUP BY e.dst),
        |dm AS (SELECT CAST(COALESCE(sum(CAST(floor(
        |           CAST(1000000000 AS DOUBLE) * r0.r) AS BIGINT)), 0)
        |         AS BIGINT) AS q
        |       FROM r0 LEFT JOIN deg ON r0.id = deg.src
        |       WHERE deg.src IS NULL)
        |SELECT nd.id,
        |  CASE WHEN sd.id IS NOT NULL THEN
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT s FROM ss)
        |    + CAST(0.85 AS DOUBLE)
        |      * (CAST((SELECT q FROM dm) AS DOUBLE)
        |         / CAST(1000000000 AS DOUBLE) / (SELECT s FROM ss))
        |  ELSE CAST(0 AS DOUBLE) END
        |  + CAST(0.85 AS DOUBLE)
        |    * (CAST(COALESCE(c.qin, 0) AS DOUBLE)
        |       / CAST(1000000000 AS DOUBLE)) AS rank
        |FROM nodes nd
        |LEFT JOIN contrib c ON nd.id = c.dst
        |LEFT JOIN seeds sd ON nd.id = sd.id""".stripMargin,

    // mirrors q227: two unrolled HITS rounds (a1=indeg, h1=Σa1, a2=Σh1,
    // h2=Σa2) — integer sums throughout, L1 normalization at the end
    "q227_hits" ->
      """WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |             CAST(l_suppkey AS BIGINT) + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT DISTINCT id FROM
        |            (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |a1 AS (SELECT nd.id,
        |         CAST(COALESCE(x.a, 0) AS BIGINT) AS a
        |       FROM nodes nd LEFT JOIN (
        |         SELECT dst AS id, CAST(count(*) AS BIGINT) AS a
        |         FROM e GROUP BY dst) x ON nd.id = x.id),
        |h1 AS (SELECT nd.id,
        |         CAST(COALESCE(x.h, 0) AS BIGINT) AS h
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h
        |         FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src) x
        |         ON nd.id = x.id),
        |a2 AS (SELECT nd.id,
        |         CAST(COALESCE(x.a, 0) AS BIGINT) AS a
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a
        |         FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst) x
        |         ON nd.id = x.id),
        |h2 AS (SELECT nd.id,
        |         CAST(COALESCE(x.h, 0) AS BIGINT) AS h
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h
        |         FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src) x
        |         ON nd.id = x.id),
        |tot AS (SELECT CAST((SELECT sum(a) FROM a2) AS DOUBLE) AS at,
        |               CAST((SELECT sum(h) FROM h2) AS DOUBLE) AS ht)
        |SELECT a2.id, a2.a AS authority_raw, h2.h AS hub_raw,
        |  round(CAST(a2.a AS DOUBLE) / tot.at, 9) AS authority,
        |  round(CAST(h2.h AS DOUBLE) / tot.ht, 9) AS hub
        |FROM a2 JOIN h2 ON a2.id = h2.id CROSS JOIN tot""".stripMargin,

    // mirrors q228: q61's near-dup pair chain, symmetric neighbor votes
    // from the UNMASKED-labeled side, (count DESC, label ASC) majority
    "q228_label_propagation" ->
      s"""WITH RECURSIVE ${minhashChainSql("documents")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |masked AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang
         |  FROM documents),
         |sym AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |votes AS (
         |  SELECT u, nl, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT s.u, m.lang AS nl
         |    FROM sym s JOIN masked m ON s.v = m.doc_id
         |    WHERE m.lang IS NOT NULL) x
         |  GROUP BY u, nl),
         |win AS (
         |  SELECT u, nl AS prop FROM votes
         |  QUALIFY row_number() OVER (PARTITION BY u
         |    ORDER BY c DESC, nl) = 1)
         |SELECT m.doc_id, COALESCE(m.lang, w.prop) AS lang,
         |  CASE WHEN m.lang IS NOT NULL THEN 'own'
         |       WHEN w.prop IS NOT NULL THEN 'propagated'
         |       ELSE 'none' END AS label_source
         |FROM masked m LEFT JOIN win w ON m.doc_id = w.u""".stripMargin
  )
}
