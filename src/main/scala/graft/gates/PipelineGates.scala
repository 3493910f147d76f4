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

/** Gates: multi-stage params-surface pipeline gates. */
object PipelineGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the end-to-end PARAMS-ONLY pipeline gate: five registered algorithms
    // chained purely through JobRunner params files — the reference's
    // acon-driven product shape composed into a full curation pipeline:
    // DedupArtifacts → IncrementalDedup → Decontaminate → TokenBudgetMix
    // → HashSplit. Each stage reads the previous stage's target_dir via
    // the params surface only (no DataFrame passes between stages); the
    // oracle replays the whole chain in SQL
    "q76_params_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q76")
      def p(sub: String) = s"$base/$sub"
      docs.filter(col("doc_id") % 5 =!= 0).write.parquet(p("landed"))
      docs.filter(col("doc_id") % 5 === 0).write.parquet(p("incoming"))
      docs.filter(col("doc_id") % 40 === 0)
        .select(concat_ws(" ",
          slice(Dedup.tokens(col("text")), 3, 12)).as("qtext"))
        .write.parquet(p("bench"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("DedupArtifacts",
        s"""{"source_dir": "${p("landed")}", "target_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text"}""".stripMargin)
      run("IncrementalDedup",
        s"""{"source_dir": "${p("incoming")}",
           | "target_dir": "${p("deduped")}",
           | "existing_dir": "${p("landed")}",
           | "artifacts_dir": "${p("arts")}",
           | "id_column": "doc_id", "text_column": "text",
           | "threshold": 0.5}""".stripMargin)
      run("Decontaminate",
        s"""{"source_dir": "${p("deduped")}", "target_dir": "${p("clean")}",
           | "benchmark_dir": "${p("bench")}",
           | "benchmark_text_column": "qtext",
           | "id_column": "doc_id", "text_column": "text",
           | "ngram_size": 5, "min_overlap": 2}""".stripMargin)
      run("TokenBudgetMix",
        s"""{"source_dir": "${p("clean")}", "target_dir": "${p("mixed")}",
           | "id_column": "doc_id", "group_column": "source",
           | "weight_column": "n_chars",
           | "budget_per_group": 1500}""".stripMargin)
      run("HashSplit",
        s"""{"source_dir": "${p("mixed")}", "target_dir": "${p("final")}",
           | "id_column": "doc_id",
           | "splits": [{"name": "train", "weight": 0.8},
           |            {"name": "val", "weight": 0.1},
           |            {"name": "test", "weight": 0.1}]}""".stripMargin)
      s.read.parquet(p("final"))
        .select(col("doc_id"), col("source"), col("split"))
    }),

    // the end-to-end TRAINING-PREP params pipeline (q76's analog for the
    // round-9 algorithms): NormalizeText → ChunkText → HashSplit chained
    // purely through JobRunner params files; splitting on doc_id keeps
    // every chunk of a document in ONE split (no eval leakage across the
    // doc boundary); the oracle replays the whole chain in SQL
    "q100_prep_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q100")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.parquet(p("src"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("NormalizeText",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("norm")}",
           | "text_column": "text"}""".stripMargin)
      run("ChunkText",
        s"""{"source_dir": "${p("norm")}", "target_dir": "${p("chunks")}",
           | "id_column": "doc_id", "text_column": "norm_text",
           | "chunk_tokens": 32}""".stripMargin)
      run("HashSplit",
        s"""{"source_dir": "${p("chunks")}", "target_dir": "${p("final")}",
           | "id_column": "doc_id",
           | "splits": [{"name": "train", "weight": 0.8},
           |            {"name": "val", "weight": 0.1},
           |            {"name": "test", "weight": 0.1}]}""".stripMargin)
      s.read.parquet(p("final"))
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          col("split"))
    }),

    // composition: the quality-pipeline params chain — train the bigram
    // model on the FULL corpus, blocklist-filter, score survivors
    // against the saved model, all through registered JobRunner algos
    // (q100's analog for the round-9 quality operators)
    "q185_quality_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q185")
      def p(sub: String) = s"$base/$sub"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.parquet(p("src"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BigramModel",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("model")}",
           | "text_column": "text", "model_size": 500,
           | "history_size": 25}""".stripMargin)
      run("BlocklistFilter",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("clean")}",
           | "text_column": "text",
           | "terms": ["slow", "big"]}""".stripMargin)
      run("BigramScore",
        s"""{"source_dir": "${p("clean")}", "target_dir": "${p("scored")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "add_k": 0.5}""".stripMargin)
      s.read.parquet(p("scored"))
    }),

    // pipeline gate: the CCNet regime (Wenzek et al. 2020) through the
    // params surface — LM trained on a REFERENCE subset (every 3rd
    // doc), the FULL corpus scored against the frozen model, then the
    // per-language perplexity band keeps the head+middle (drops the
    // worst-logprob quartile per lang); one glue join attaches lang to
    // the scored table between registered stages
    "q274_ccnet_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val base = tmpDir("graft_q274")
      def p(sub: String) = s"$base/$sub"
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      docs.write.parquet(p("src"))
      docs.filter(col("doc_id") % 3 === 0).write.parquet(p("ref"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("BigramModel",
        s"""{"source_dir": "${p("ref")}", "target_dir": "${p("model")}",
           | "text_column": "text", "model_size": 500,
           | "history_size": 25}""".stripMargin)
      run("BigramScore",
        s"""{"source_dir": "${p("src")}", "target_dir": "${p("scored")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "text", "add_k": 0.5}""".stripMargin)
      s.read.parquet(p("scored"))
        .join(s.read.parquet(p("src")).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .write.parquet(p("scored_lang"))
      run("QuantileBand",
        s"""{"source_dir": "${p("scored_lang")}",
           | "target_dir": "${p("kept")}", "group_column": "lang",
           | "score_column": "bigram_logprob",
           | "lo": 0.25, "hi": 1.0}""".stripMargin)
      s.read.parquet(p("kept"))
        .select(col("doc_id"), col("lang"), col("bigram_logprob"))
    }),

    // the round-9 curation chain through the PARAMS surface only (the
    // q76 convention, over the NEW algorithm families): span-level
    // dedup cleans the corpus, DSIR selects the 100 docs most like the
    // raw %25 target, the NB artifact pair labels the survivors — every
    // stage a JobRunner params file, no DataFrame passes between stages
    "q240_curation_pipeline" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
      val base = tmpDir("graft_q240")
      def p(sub: String) = s"$base/$sub"
      docs.write.parquet(p("docs"))
      docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), col("text").as("clean_text"))
        .write.parquet(p("target"))
      docs.filter(col("doc_id") % 5 === 0).write.parquet(p("seed"))
      def run(algo: String, json: String): Unit = {
        val f = Paths.get(base, s"$algo.json")
        JFiles.writeString(f, json)
        graft.core.JobRunner.execute(s, algo, f.toString)
      }
      run("RemoveRepeatedSpans",
        s"""{"source_dir": "${p("docs")}", "target_dir": "${p("cleaned")}",
           | "id_column": "doc_id", "text_column": "text",
           | "width": 4}""".stripMargin)
      run("DsirSelect",
        s"""{"source_dir": "${p("cleaned")}",
           | "target_dir": "${p("selected")}",
           | "target_corpus_dir": "${p("target")}",
           | "id_column": "doc_id", "text_column": "clean_text",
           | "buckets": 512, "k": 100}""".stripMargin)
      run("NaiveBayesModel",
        s"""{"source_dir": "${p("seed")}", "target_dir": "${p("model")}",
           | "text_column": "text", "label_column": "lang",
           | "vocab_size": 30}""".stripMargin)
      run("NaiveBayesScore",
        s"""{"source_dir": "${p("selected")}",
           | "target_dir": "${p("labeled")}",
           | "model_dir": "${p("model")}", "id_column": "doc_id",
           | "text_column": "clean_text"}""".stripMargin)
      s.read.parquet(p("labeled"))
        .join(s.read.parquet(p("selected"))
          .select(col("doc_id"), col("log_weight"), col("rank")),
          Seq("doc_id"))
        .select(col("doc_id"), col("log_weight"), col("rank"),
          col("predicted"), col("score"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // replays the entire five-stage params pipeline: q72's incremental
    // dedup, q53-shaped decontamination (n=5, minOverlap=2, bench = every
    // 40th doc's tokens 3..14), q74-shaped char-budget mixing (1500 per
    // source), q66-shaped hash split
    "q76_params_pipeline" ->
      s"""WITH existing AS (
         |  SELECT * FROM documents WHERE doc_id % 5 <> 0),
         |inc AS (
         |  SELECT * FROM documents WHERE doc_id % 5 = 0),
         |inp AS (
         |  SELECT i.* FROM inc i
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text))),
         |docs0 AS (
         |  SELECT doc_id, text FROM existing
         |  UNION ALL SELECT doc_id, text FROM inp),
         |${minhashChainSql("docs0")},
         |pairs AS (
         |  SELECT id_a, id_b FROM j
         |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
         |dbad AS (
         |  SELECT id_b AS doc_id FROM pairs
         |  WHERE id_a IN (SELECT doc_id FROM existing)
         |  UNION
         |  SELECT id_a AS doc_id FROM pairs
         |  WHERE id_b IN (SELECT doc_id FROM existing)),
         |deduped AS (
         |  SELECT * FROM inp
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dbad)),
         |qtk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |qbench AS (
         |  SELECT array_to_string(tk[3:14], ' ') AS qt FROM qtk
         |  WHERE doc_id % 40 = 0),
         |qbtk AS (
         |  SELECT string_split_regex(trim(lower(qt)), '\\s+') AS tk
         |  FROM qbench),
         |qbsh AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |    range(0, greatest(len(tk)-5, 0)+1),
         |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
         |  FROM qbtk),
         |qdtk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM deduped),
         |qcsh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(tk)-5, 0)+1),
         |    i -> array_to_string(tk[i+1:i+5], ' ')))) AS s
         |  FROM qdtk),
         |contaminated AS (
         |  SELECT doc_id FROM qcsh JOIN qbsh USING (s)
         |  GROUP BY doc_id HAVING count(*) >= 2),
         |clean AS (
         |  SELECT * FROM deduped
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |mix AS (
         |  SELECT doc_id, source, n_chars,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS bkt
         |  FROM clean),
         |mixed AS (
         |  SELECT doc_id, source FROM mix
         |  QUALIFY SUM(CAST(n_chars AS DOUBLE)) OVER (
         |      PARTITION BY source ORDER BY bkt, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - n_chars < 1500)
         |SELECT doc_id, source,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, source,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM mixed) m""".stripMargin,

    // mirrors the q100 params chain: normalize (nfc + lower + collapse),
    // chunk the normalized text at 32/32, split by doc_id hash (q66's
    // formula) — whole-doc split assignment, chunk rows inherit
    "q100_prep_pipeline" ->
      s"""WITH norm AS (
         |  SELECT doc_id,
         |    regexp_replace(trim(lower(nfc_normalize(text))), '\\s+', ' ',
         |      'g') AS nt
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, string_split_regex(trim(lower(nt)), '\\s+') AS tk
         |  FROM norm),
         |st AS (
         |  SELECT doc_id, tk,
         |    unnest(range(0, greatest(len(tk)-1, 0)+1, 32)) AS s
         |  FROM tk),
         |ch AS (
         |  SELECT doc_id, CAST(s // 32 AS INTEGER) AS chunk_idx,
         |    CAST(least(32, len(tk)-s) AS INTEGER) AS n_tokens
         |  FROM st),
         |h AS (
         |  SELECT doc_id,
         |    ${PortableHash.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000000
         |      AS hv
         |  FROM documents)
         |SELECT c.doc_id, c.chunk_idx, c.n_tokens,
         |  CASE WHEN hv < 800000 THEN 'train'
         |       WHEN hv < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM ch c JOIN h ON c.doc_id = h.doc_id""".stripMargin,

    // mirrors q185: model CTEs over the FULL corpus (q180's shapes),
    // scoring restricted to the blocklist survivors
    "q185_quality_pipeline" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM tk)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |clean AS (
        |  SELECT doc_id, ts FROM tk
        |  WHERE NOT list_has_any(ts, ['slow', 'big'])),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM clean WHERE len(ts) >= 2))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(
        |    (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |    (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |    AS bigram_logprob
        |FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin,

    // mirrors q274: q185's bigram CTEs with the model CTEs restricted
    // to the reference subset (doc_id % 3 = 0, incl. the vocab size v),
    // all docs scored, then q78's percent_rank band per lang
    "q274_ccnet_pipeline" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |ref AS (SELECT doc_id, ts FROM tk WHERE doc_id % 3 = 0),
        |vv AS (
        |  SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM (
        |    SELECT unnest(ts) AS t FROM ref)),
        |bgm AS (
        |  SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM ref WHERE len(ts) >= 2)),
        |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bgm GROUP BY w1, w2),
        |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
        |c2 AS (SELECT w1, w2, c2 FROM c2a
        |  QUALIFY row_number() OVER (ORDER BY c2 DESC, w1, w2) <= 500),
        |c1 AS (SELECT w1, c1 FROM c1a
        |  QUALIFY row_number() OVER (ORDER BY c1 DESC, w1) <= 25),
        |bg AS (
        |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
        |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
        |    FROM tk WHERE len(ts) >= 2)),
        |scored AS (
        |  SELECT doc_id,
        |    round(avg(ln(
        |      (CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5) /
        |      (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v))), 6)
        |      AS bigram_logprob
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |    CROSS JOIN vv
        |  GROUP BY doc_id)
        |SELECT s.doc_id, k.lang, s.bigram_logprob
        |FROM scored s JOIN tk k USING (doc_id)
        |QUALIFY percent_rank() OVER (
        |  PARTITION BY k.lang ORDER BY s.bigram_logprob)
        |  BETWEEN 0.25 AND 1.0""".stripMargin,

    // mirrors q240: the three parameterized chains composed exactly as
    // the params stages run them — span cleaning over documents, DSIR
    // over the cleaned text against the raw %25 target, Gumbel-top-100,
    // NB seeded on the raw %5 slice scoring the selected clean text
    "q240_curation_pipeline" ->
      s"""WITH ${spanCleanBodySql("SELECT doc_id, text FROM documents")},
         |${dsirChainBodySql(
        "SELECT doc_id, clean_text AS text FROM cleaned",
        "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0")},
         |keyed AS (
         |  SELECT doc_id, log_weight,
         |    round(log_weight - ln(-ln(
         |      (CAST(${PortableHash.sqlHash60(
        "CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5)
         |        / 1000000.0)), 6) AS sample_key
         |  FROM w),
         |sel AS (
         |  SELECT doc_id, log_weight, CAST(rank AS INTEGER) AS rank
         |  FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC,
         |          doc_id) AS rank FROM keyed)
         |  WHERE rank <= 100),
         |${nbChainBodySql(
        "SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0",
        "SELECT s.doc_id, c.clean_text AS text FROM sel s " +
          "JOIN cleaned c ON c.doc_id = s.doc_id")}
         |SELECT s.doc_id, s.log_weight, s.rank,
         |  b.predicted, b.score
         |FROM sel s JOIN best b ON b.doc_id = s.doc_id AND b.rk = 1""".stripMargin
  )
}
