package graft.gates

import graft.operators.TextAnalysis

/** Shared DuckDB-oracle SQL fragments (split from SparkEntry). */
object OracleHelpers {

  private[gates] val stopAll: String = TextAnalysis.stopwords.flatMap(_._2).distinct
    .map(w => s"'$w'").mkString(", ")
  private[gates] def stopList(lang: String): String =
    TextAnalysis.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")

  // ---- portable-hash SQL fragments (mirrors of graft.functions.PortableHash;
  // the LSH/fingerprint pipelines derive all randomness from md5 so DuckDB
  // reproduces the exact candidate sets — no rows-only gates) ----

  import graft.functions.PortableHash

  /** q256/q257 shared oracle: replayable token dropout (rate 0.1, seed
    * s1) — mirrors TextAnalysis.augmentTokenDropout.
    */
  private[gates] def dropoutSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE doc_id % 4 = 0),
      |kept AS (SELECT doc_id, tk,
      |  list_filter(tk, (x, i) ->
      |    CAST('0x' || substr(md5('s1_' || CAST(doc_id AS VARCHAR)
      |      || '_' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
      |      % 1000 >= 100) AS kp
      |  FROM tok)
      |SELECT doc_id, array_to_string(kp, ' ') AS text_aug,
      |  CAST(len(tk) AS INTEGER) AS n_tokens,
      |  CAST(len(kp) AS INTEGER) AS n_kept
      |FROM kept""".stripMargin

  // mirrors Similarity.ivfPqTopK (centroids=32, nprobe=4, k=5):
  // the q272 encode/distance-table CTEs gated by L2 cell assignment
  // and the probed-cell join; shared by q273 (one-shot) and q281
  // (prepared artifacts), whose results are identical by design
  private[gates] def ivfPqSql: String =
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
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce2
         |  FROM embeddings
         |  ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")},
         |    vec_id
         |  LIMIT 32),
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2Sql("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM embeddings e CROSS JOIN cent c) WHERE rk = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2Sql("e.embedding", "c.ce2")}, c.cid) AS rk
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.vec_id % 50 = 0) WHERE rk <= 4),
         |ad AS (
         |  SELECT t.query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(t.qd) AS BIGINT) AS adfix
         |  FROM enc e
         |  JOIN asg a ON e.vec_id = a.vec_id
         |  JOIN probe p ON a.cid = p.cid
         |  JOIN qt t ON p.query_id = t.query_id
         |    AND e.j = t.j AND e.code = t.code
         |  WHERE t.query_id <> e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id,
         |  round(adfix / 1048576.0, 6) AS pq_dist
         |FROM ad
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY adfix, neighbor_id) <= 5""".stripMargin

  /** Sequential-accumulation cosine — the same operation order as the native
    * CosineSimilarityExpr loop, so doubles match bit-for-bit.
    */
  /** Squared L2 mirror of [[graft.functions.SquaredL2Expr]]: sequential
    * double accumulation over float inputs in array order.
    */
  private[gates] def l2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |      i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |         * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))""".stripMargin

  private[gates] def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a)+1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(1, len($a)+1),
       |         i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(range(1, len($b)+1),
       |         i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** The k MinHash minima as a SQL list literal over `hl` (60-bit md5 base
    * hashes mod P), with the exact per-seed (a, b) coefficients the native
    * expression uses.
    */
  private[gates] def minhashSigSql(k: Int): String = (0 until k).map { s =>
    s"list_min(list_transform(hl, h -> (${PortableHash.minhashA(s)}*h + " +
      s"${PortableHash.minhashB(s)}) % ${PortableHash.P}))"
  }.mkString("[\n    ", ",\n    ", "]")

  /** The multinomial-NB train+score CTE body (no leading WITH, so it
    * composes into pipelines like q240): `seedRel` supplies (label,
    * text) training rows, `scoreRel` supplies (doc_id, text) rows to
    * score. Top-30 vocab over the seed, add-one likelihoods over the
    * 31-token space, per-(doc,label) log-prob sums rounded to 6. Ends
    * with `best(doc_id, predicted, score, rk)` — rk=1 is the argmax
    * with label-asc tie-break.
    */
  /** DuckDB list expression mirroring [[Classify.charTrigrams]]. */
  private[gates] val charTrigramsSql: String =
    """CASE WHEN length(lower(text)) >= 3
      |  THEN list_transform(range(1, length(lower(text)) - 1),
      |         i -> substring(lower(text), i, 3))
      |  ELSE [] END""".stripMargin

  private[gates] def nbChainBodySql(seedRel: String, scoreRel: String,
      tokSql: String = "string_split_regex(trim(lower(text)), '\\s+')",
      vocabSize: Int = 30): String =
    s"""nb_seed AS ($seedRel),
       |nb_score_docs AS ($scoreRel),
       |seedtk AS (
       |  SELECT label,
       |    unnest($tokSql) AS token
       |  FROM nb_seed),
       |vocab AS (
       |  SELECT token FROM seedtk GROUP BY token
       |  ORDER BY count(*) DESC, token LIMIT $vocabSize),
       |b AS (
       |  SELECT s.label,
       |    CASE WHEN v.token IS NOT NULL THEN s.token
       |         ELSE '<unk>' END AS token
       |  FROM seedtk s LEFT JOIN vocab v ON s.token = v.token),
       |counts AS (SELECT label, token, CAST(count(*) AS BIGINT) AS n_tok
       |           FROM b GROUP BY 1, 2),
       |ctot AS (SELECT label, CAST(count(*) AS BIGINT) AS n_class
       |         FROM b GROUP BY 1),
       |dc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM nb_seed GROUP BY 1),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM nb_seed),
       |fullv AS (SELECT token FROM vocab UNION ALL SELECT '<unk>'),
       |model AS (
       |  SELECT ct.label, fv.token,
       |    ln(CAST(COALESCE(c.n_tok, 0) + 1 AS DOUBLE)
       |       / (CAST(ct.n_class AS DOUBLE)
       |          + (SELECT CAST(count(*) AS DOUBLE) FROM fullv))) AS loglik,
       |    ln(CAST(dc.n_docs AS DOUBLE)
       |       / CAST((SELECT nd FROM nd) AS DOUBLE)) AS logprior
       |  FROM ctot ct CROSS JOIN fullv fv
       |  LEFT JOIN counts c ON c.label = ct.label AND c.token = fv.token
       |  JOIN dc ON dc.label = ct.label),
       |stk AS (
       |  SELECT doc_id,
       |    unnest($tokSql) AS token
       |  FROM nb_score_docs),
       |dtk AS (
       |  SELECT t.doc_id,
       |    CASE WHEN v.token IS NOT NULL THEN t.token
       |         ELSE '<unk>' END AS token
       |  FROM stk t LEFT JOIN vocab v ON t.token = v.token),
       |scored AS (
       |  SELECT doc_id, m.label,
       |    round(m.logprior + sum(m.loglik), 6) AS score
       |  FROM dtk JOIN model m ON dtk.token = m.token
       |  GROUP BY doc_id, m.label, m.logprior),
       |best AS (
       |  SELECT doc_id, label AS predicted, score,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, label) AS rk
       |  FROM scored)""".stripMargin

  /** q231/q234/q235's instantiation: seed = the doc_id%5 lang-labeled
    * slice, scored corpus = all documents.
    */
  private[gates] def nbChainSql: String =
    "WITH " + nbChainBodySql(
      "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
      "SELECT doc_id, text FROM documents")

  /** The DSIR weight CTE body (no leading WITH): `rawRel` and
    * `targetRel` each supply (doc_id, text); md5-60 hashed
    * unigram+bigram buckets (mod 512), add-one models over both, per-doc
    * log-ratio sums rounded to 6. Ends with `w(doc_id, log_weight)`.
    */
  private[gates] def dsirChainBodySql(rawRel: String, targetRel: String): String =
    s"""dsr_raw AS ($rawRel),
       |dsr_tgt AS ($targetRel),
       |dsr_rtk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM dsr_raw),
       |dsr_ttk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM dsr_tgt),
       |feats AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")} % 512),
       |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |      i -> ${PortableHash.sqlHash60("tk[i] || ' ' || tk[i+1]")}
       |        % 512)
       |    ELSE [] END)) AS b
       |  FROM dsr_rtk),
       |tfeats AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")} % 512),
       |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
       |      i -> ${PortableHash.sqlHash60("tk[i] || ' ' || tk[i+1]")}
       |        % 512)
       |    ELSE [] END)) AS b
       |  FROM dsr_ttk),
       |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tfeats
       |       GROUP BY b),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tfeats),
       |rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM feats
       |       GROUP BY b),
       |rt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM feats),
       |d AS (
       |  SELECT g.range AS b,
       |    ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
       |       / CAST((SELECT t FROM tt) + 512 AS DOUBLE))
       |    - ln(CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE)
       |       / CAST((SELECT t FROM rt) + 512 AS DOUBLE)) AS diff
       |  FROM range(512) g
       |  LEFT JOIN tc ON tc.b = g.range
       |  LEFT JOIN rc ON rc.b = g.range),
       |w AS (
       |  SELECT doc_id, round(sum(d.diff), 6) AS log_weight
       |  FROM feats JOIN d ON feats.b = d.b
       |  GROUP BY doc_id)""".stripMargin

  /** The whole-corpus repeated-span report (q232's chain) with a final
    * doc predicate — q232 passes TRUE, q242 restricts to the batch.
    */
  private[gates] def spanReportSql(docPred: String): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, g AS pos,
       |    CAST('0x' || substr(md5(array_to_string(tk[g+1:g+4], ' ')),
       |      1, 15) AS BIGINT) AS hv
       |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-4)) AS g
       |        FROM tk WHERE len(tk) >= 4)),
       |dup AS (SELECT hv FROM sp GROUP BY hv HAVING count(*) > 1),
       |st AS (SELECT doc_id, pos, 1 AS dup FROM sp JOIN dup USING (hv)),
       |posn AS (
       |  SELECT p.doc_id, p.n_tokens, p.pos, COALESCE(s.dup, 0) AS dup
       |  FROM (SELECT doc_id, len(tk) AS n_tokens,
       |          unnest(generate_series(0, len(tk)-1)) AS pos
       |        FROM tk) p
       |  LEFT JOIN st s ON s.doc_id = p.doc_id AND s.pos = p.pos),
       |cov AS (
       |  SELECT doc_id, n_tokens, dup,
       |    CASE WHEN max(dup) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) = 1
       |      THEN 1 ELSE 0 END AS covered
       |  FROM posn)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(greatest(n_tokens - 3, 0) AS BIGINT) AS n_spans,
       |  CAST(sum(dup) AS BIGINT) AS n_dup_spans,
       |  CAST(sum(covered) AS BIGINT) AS covered_tokens,
       |  round(CAST(sum(covered) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
       |    AS dup_fraction
       |FROM cov WHERE $docPred GROUP BY doc_id, n_tokens""".stripMargin

  /** The span-removal CTE body (no leading WITH): `srcRel` supplies
    * (doc_id, text); the q232 coverage chain carrying the token itself,
    * uncovered tokens reassembled position-ordered. Ends with
    * `cleaned(doc_id, n_tokens, kept_tokens, clean_text)`.
    */
  private[gates] def spanCleanBodySql(srcRel: String): String =
    s"""sr_src AS ($srcRel),
       |sr_tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM sr_src),
       |sp AS (
       |  SELECT doc_id, g AS pos,
       |    CAST('0x' || substr(md5(array_to_string(tk[g+1:g+4], ' ')),
       |      1, 15) AS BIGINT) AS hv
       |  FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-4)) AS g
       |        FROM sr_tk WHERE len(tk) >= 4)),
       |dup AS (SELECT hv FROM sp GROUP BY hv HAVING count(*) > 1),
       |st AS (SELECT doc_id, pos, 1 AS dup FROM sp JOIN dup USING (hv)),
       |posn AS (
       |  SELECT q.doc_id, q.n_tokens, q.pos, q.tk[q.pos+1] AS t,
       |    COALESCE(s.dup, 0) AS dup
       |  FROM (SELECT doc_id, tk, len(tk) AS n_tokens,
       |          unnest(generate_series(0, len(tk)-1)) AS pos
       |        FROM sr_tk) q
       |  LEFT JOIN st s ON s.doc_id = q.doc_id AND s.pos = q.pos),
       |cov AS (
       |  SELECT doc_id, n_tokens, pos, t,
       |    CASE WHEN max(dup) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) = 1
       |      THEN 1 ELSE 0 END AS covered
       |  FROM posn),
       |cleaned AS (
       |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST(sum(1 - covered) AS BIGINT) AS kept_tokens,
       |    COALESCE(string_agg(CASE WHEN covered = 0 THEN t END, ' '
       |      ORDER BY pos), '') AS clean_text
       |  FROM cov GROUP BY doc_id, n_tokens)""".stripMargin

  /** q236/q237's instantiation: raw = all documents, target = the
    * doc_id%25 slice.
    */
  /** BM25 oracle CTE body (q249, reused by q250's hybrid fusion):
    * exact tf/df/dl/N, Lucene positive idf, k1=1.2 b=0.75, query terms
    * pruned at df > maxDf·N, per-pair score rounded to 6 BEFORE ranking.
    * Ends at `sc` (query_id, doc_id, score); constants written as the
    * same IEEE expressions the Spark side computes ((1.2 + 1.0), not
    * 2.2). */
  private[gates] def bm25BodySql(queryPred: String, maxDf: Double): String =
    s"""tk AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+')
       |    AS tk
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, CAST(dl AS BIGINT) AS dl, term,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM tk)
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |       FROM tf GROUP BY 1),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(dl) AS DOUBLE) AS sdl
       |  FROM (SELECT doc_id, any_value(dl) AS dl FROM tf GROUP BY 1)),
       |qt AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT doc_id AS query_id, unnest(tk) AS term
       |    FROM tk WHERE $queryPred)),
       |qp AS (
       |  SELECT q.query_id, q.term, f.df FROM qt q
       |  JOIN df f USING (term), st
       |  WHERE CAST(f.df AS DOUBLE) <= CAST(st.n AS DOUBLE) * $maxDf),
       |sc AS (
       |  SELECT q.query_id, t.doc_id,
       |    round(sum(
       |      ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
       |            / (CAST(q.df AS DOUBLE) + 0.5))
       |      * CAST(t.tf AS DOUBLE) * (1.2 + 1.0)
       |      / (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |         + 0.75 * CAST(t.dl AS DOUBLE)
       |           / (st.sdl / CAST(st.n AS DOUBLE))))), 6) AS score
       |  FROM qp q JOIN tf t USING (term), st
       |  GROUP BY 1, 2)""".stripMargin

  /** The rank-free BM25 score table (q251/q252's shared oracle). */
  private[gates] def bm25ScoresSql: String =
    s"""WITH ${bm25BodySql("doc_id % 97 = 0", 0.9)}
       |SELECT query_id, doc_id, score FROM sc""".stripMargin

  private[gates] def dsirChainSql: String =
    "WITH " + dsirChainBodySql(
      "SELECT doc_id, text FROM documents",
      "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0")

  private[gates] def dsirWeightsSql: String =
    s"""$dsirChainSql
       |SELECT doc_id, log_weight FROM w""".stripMargin

  /** q238/q248's oracle: the sign-LSH semantic-decontamination check
    * over the embeddings table with the vec_id%25 benchmark.
    */
  private[gates] def semanticDeconSql: String =
    s"""WITH ${lshSigsSql(4, 8, 64)},
       |cand AS (
       |  SELECT DISTINCT c.vec_id AS cid, b.vec_id AS bid
       |  FROM sigs c JOIN sigs b
       |    ON c.t = b.t AND c.sig = b.sig AND b.vec_id % 25 = 0),
       |scored AS (
       |  SELECT cid, bid, ${cosSql("vc.embedding", "vb.embedding")}
       |    AS cos
       |  FROM cand
       |  JOIN v vc ON vc.vec_id = cid
       |  JOIN v vb ON vb.vec_id = bid)
       |SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS n_matched,
       |  round(max(cos), 6) AS best_cosine
       |FROM scored WHERE cos >= 0.9 GROUP BY cid""".stripMargin

  /** The full MinHash-LSH candidate + Jaccard-verify CTE chain over a
    * source relation with (doc_id, text) — shared by the q21 gate and the
    * q48 end-to-end dedup gate. Ends with `j(id_a, id_b, inter, uni)`.
    */
  private[gates] def minhashChainSql(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(0, greatest(len(tk)-3, 0)+1),
       |    i -> array_to_string(tk[i+1:i+3], ' '))) AS shl
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id, shl,
       |    list_transform(shl, s -> ${PortableHash.sqlHash60("s")}
       |      % ${PortableHash.P}) AS hl
       |  FROM sh),
       |sig AS (SELECT doc_id, ${minhashSigSql(32)} AS sg FROM hs),
       |banded AS (
       |  SELECT doc_id, b.range AS band,
       |    array_to_string(sg[b.range*4+1 : b.range*4+4], '_') AS bucket
       |  FROM sig, range(8) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |j AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(sa.shl, sb.shl)) AS inter,
       |    len(sa.shl) + len(sb.shl) - len(list_intersect(sa.shl, sb.shl))
       |      AS uni
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin

  /** 60-bit SimHash majority vote over `hl`/`n` as one SQL expression. */
  private[gates] val simhashSql: String =
    (0 until graft.functions.SimHashExpr.BITS).map { b =>
      s"(CASE WHEN 2*len(list_filter(hl, h -> ((h >> $b) & 1) = 1)) >= n " +
        s"THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" +\n  ")

  /** (band, shift, mask) rows matching Dedup.simhashCandidates' banding. */
  private[gates] def simhashBandsSql(maxHamming: Int): String = {
    val bits = graft.functions.SimHashExpr.BITS
    val bands = maxHamming + 1
    val cb = bits / bands
    (0 until bands).map { i =>
      val start = i * cb
      val width = if (i == bands - 1) bits - start else cb
      s"($i, $start, ${(1L << width) - 1})"
    }.mkString(", ")
  }

  /** Shared CTE chain: hyperplanes → per-(vec,table) sign signatures over
    * the embeddings table, mirroring LshSignatureExpr (sequential-order dot
    * products, identical md5-derived weights).
    */
  private[gates] def lshSigsSql(tables: Int, bits: Int, dims: Int): String =
    lshSigsSqlOver("SELECT vec_id, embedding FROM embeddings",
      tables, bits, dims)

  /** The KMV distinct-count oracle over the whole events table — shared
    * by q109 (inline sketch) and q114 (merge of per-half sketch
    * artifacts), which must produce the identical estimate.
    */
  private[gates] val kmvOracleSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    ${PortableHash.sqlHash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |t AS (
       |  SELECT event_type, count(*) AS m, max(h) AS kth
       |  FROM r WHERE rn <= 64 GROUP BY event_type)
       |SELECT event_type,
       |  round(CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
       |    ELSE CAST(63 AS DOUBLE) * power(2.0, 60) / CAST(kth AS DOUBLE)
       |    END, 6) AS est_distinct,
       |  CAST(m AS BIGINT) AS sketch_rows
       |FROM t""".stripMargin

  /** One KMV part sketch (≤64 smallest distinct user-id hashes per
    * event_type) over a filtered slice of events — q127's oracle builds
    * two and their exact merge.
    */
  private[gates] def kmvPartSql(alias: String, pred: String): String =
    s"""h_$alias AS (
       |  SELECT DISTINCT event_type,
       |    ${PortableHash.sqlHash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events WHERE $pred),
       |s_$alias AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM h_$alias) WHERE rn <= 64)""".stripMargin

  /** The KMV estimator over a sketch relation (mirrors kmvEstimate). */
  private[gates] def kmvEstSql(name: String, src: String): String =
    s"""$name AS (
       |  SELECT event_type,
       |    round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
       |      ELSE CAST(63 AS DOUBLE) * power(2.0, 60)
       |           / CAST(max(h) AS DOUBLE)
       |      END, 6) AS est
       |  FROM $src GROUP BY event_type)""".stripMargin

  /** The sign-LSH signature chain over an arbitrary (vec_id, embedding)
    * SQL source — q65 runs it over the embeddings table, q108 over
    * feature-hashed document vectors.
    */
  private[gates] def lshSigsSqlOver(vSql: String, tables: Int, bits: Int,
      dims: Int): String =
    s"""planes AS (${PortableHash.sqlPlanes(tables, bits, dims)}),
       |pl AS (SELECT t, b, list(w ORDER BY d) AS ws FROM planes GROUP BY t, b),
       |v AS ($vSql),
       |dots AS (
       |  SELECT v.vec_id, pl.t, pl.b,
       |    list_sum(list_transform(range(1, ${dims + 1}),
       |      i -> CAST(v.embedding[i] AS DOUBLE) * pl.ws[i])) AS dot
       |  FROM v, pl),
       |sigs AS (
       |  SELECT vec_id, t,
       |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END) AS INTEGER)
       |      AS sig
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  // q212 and q214 compute the same segmentation (direct API vs the
  // params surface), so they share one oracle body
  private[gates] val bpeReplay2Sql: String =
    """WITH tk AS (SELECT unnest(string_split_regex(trim(
        |         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |         '\s+')) AS w FROM documents),
        |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |          WHERE w IS NOT NULL AND w <> '' GROUP BY w),
        |syms1 AS (SELECT freq, list_append(list_transform(
        |            generate_series(1, length(w)),
        |            i -> substring(w, i, 1)), '</w>') AS s FROM words),
        |p1 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms1 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r1 AS (SELECT l, r FROM p1
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |syms2 AS (SELECT freq, regexp_extract_all(w || '</w>',
        |            '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |            '|</w>|.)') AS s FROM words),
        |p2 AS (SELECT s[g] AS l, s[g+1] AS r,
        |         CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM (SELECT s, freq,
        |               unnest(generate_series(1, len(s)-1)) AS g
        |             FROM syms2 WHERE len(s) >= 2)
        |       GROUP BY 1, 2),
        |r2 AS (SELECT l, r FROM p2
        |       ORDER BY pair_count DESC, l, r LIMIT 1),
        |seg1 AS (SELECT w, freq, regexp_extract_all(w || '</w>',
        |           '(' || (SELECT l FROM r1) || (SELECT r FROM r1) ||
        |           '|</w>|.)') AS s FROM words),
        |enc AS (SELECT w, freq,
        |          '(' || array_to_string(s, ')(') || ')' AS j FROM seg1),
        |rep AS (SELECT w, freq, regexp_replace(j,
        |          '\(' || (SELECT l FROM r2) || '\)\(' ||
        |            (SELECT r FROM r2) || '\)',
        |          '(' || (SELECT l FROM r2) || (SELECT r FROM r2) || ')',
        |          'g') AS j2 FROM enc)
        |SELECT w AS word, freq,
        |  array_to_string(regexp_extract_all(j2, '\(([^)]*)\)', 1), ' ')
        |    AS segmented
        |FROM rep""".stripMargin

  // q71 and q217 compute the same decontamination (in-query bloom vs
  // the saved-artifact round trip), so they share one oracle body
  private[gates] val bloomDecontaminateSql: String =
    """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bench AS (
        |  SELECT array_to_string(tk[2:13], ' ') AS qt FROM tk
        |  WHERE doc_id % 25 = 0),
        |btk AS (
        |  SELECT string_split_regex(trim(lower(qt)), '\s+') AS tk FROM bench),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' ')))) AS s
        |  FROM btk),
        |csh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(tk)-6, 0)+1),
        |    i -> array_to_string(tk[i+1:i+6], ' '))) AS shl
        |  FROM tk),
        |csh AS (
        |  SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
        |    unnest(shl) AS s
        |  FROM csh0)
        |SELECT doc_id, count(*) AS n_matched, n_shingles,
        |  round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS overlap_ratio
        |FROM csh JOIN bsh USING (s)
        |GROUP BY doc_id, n_shingles
        |HAVING count(*) >= 1""".stripMargin

  // q195 (direct step), q205 (maxIters=1 loop) and q218 (streaming
  // mini-batch update) are the same centroid update — one oracle body
  private[gates] val kmeansStepSql: String =
    s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS ce FROM emb
         |         ORDER BY ${PortableHash.sqlHash60("CAST(vec_id AS VARCHAR)")}, vec_id
         |         LIMIT 8),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rk
         |    FROM emb e CROSS JOIN cent c) WHERE rk = 1),
         |q AS (SELECT a.cid, list_transform(e.embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
         |      FROM assign a JOIN emb e USING (vec_id)),
         |ex AS (SELECT cid, CAST(g - 1 AS INTEGER) AS dim, qv[g] AS x FROM (
         |        SELECT cid, qv, unnest(generate_series(1, len(qv))) AS g
         |        FROM q)),
         |sums AS (SELECT cid, dim, CAST(sum(x) AS BIGINT) AS s,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM ex GROUP BY cid, dim),
         |centd AS (SELECT cid, ce, CAST(g - 1 AS INTEGER) AS dim FROM (
         |            SELECT cid, ce, unnest(generate_series(1, len(ce))) AS g
         |            FROM cent))
         |SELECT cd.cid, cd.dim,
         |  CASE WHEN s.n IS NULL
         |    THEN round(CAST(cd.ce[cd.dim + 1] AS DOUBLE), 6)
         |    ELSE round(CAST(CAST(CAST(s.s AS DOUBLE)
         |      / (CAST(s.n AS DOUBLE) * 1024.0) AS REAL) AS DOUBLE), 6)
         |  END AS mean,
         |  CAST(COALESCE(s.n, 0) AS BIGINT) AS n
         |FROM centd cd LEFT JOIN sums s
         |  ON s.cid = cd.cid AND s.dim = cd.dim""".stripMargin

  // q200 (batch), q201 (streaming) and q219 (artifact merge) pin the
  // quantile sketch in its exact regime — one oracle body
  private[gates] val eventQuantileSql: String =
    """WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS value,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY value) AS rk,
        |             count(*) OVER (PARTITION BY event_type) AS n
        |           FROM events WHERE value IS NOT NULL),
        |ps AS (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)])
        |         AS p)
        |SELECT v.event_type, ps.p, min(v.value) AS q_value,
        |  CAST(max(v.n) AS BIGINT) AS n
        |FROM v CROSS JOIN ps
        |WHERE v.rk >= greatest(CAST(1 AS BIGINT),
        |                       CAST(ceil(ps.p * v.n) AS BIGINT))
        |GROUP BY v.event_type, ps.p""".stripMargin

  /** q284/q285/q286 shared oracle: whole-table HLL replay at p=8 (Q=52):
    * idx = top 8 hash bits, rho = 53 - bit-length of the low 52 (53 when
    * zero), per-register max, exact fixed-point harmonic sum with empty
    * registers contributing 2^53 each; the alpha_m*m^2*2^53 constant is
    * the Scala double's round-trip literal.
    */
  private[gates] def hllOracleSql: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |    ${graft.functions.PortableHash.sqlHash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, CAST(h >> 52 AS INTEGER) AS idx,
       |    CASE WHEN (h & 4503599627370495) = 0 THEN 53
       |         ELSE 53 - length(bin(h & 4503599627370495)) END AS rho
       |  FROM h),
       |reg AS (SELECT event_type, idx, max(rho) AS mj FROM r GROUP BY 1, 2),
       |s AS (
       |  SELECT event_type,
       |    CAST(count(*) AS BIGINT) AS n_set,
       |    CAST(sum(1::BIGINT << (53 - mj)) AS BIGINT) AS s_set
       |  FROM reg GROUP BY 1)
       |SELECT event_type, n_set AS n_registers_set,
       |  s_set + (256 - n_set) * 9007199254740992 AS harmonic_denom,
       |  round(${graft.operators.DistinctSketch.hllAlphaM2Q(8)} /
       |    CAST(s_set + (256 - n_set) * 9007199254740992 AS DOUBLE), 4)
       |    AS est_distinct
       |FROM s""".stripMargin
}
