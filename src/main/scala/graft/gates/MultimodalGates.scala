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

/** Gates: binary payload / media gates. */
object MultimodalGates extends GateSupport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // multimodal: binary payload + metadata plumbing (decode stubbed)
    "q28_multimodal_meta" -> ((s, dir) => {
      Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text",
          "text/plain")
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("content_sha256"))
    }),

    // multimodal: frame sampling stub (md5-derived offsets, oracle-matched)
    "q29_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.fakeDecode(
          Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text",
            "text/plain")),
        "doc_id", nFrames = 3)
    }),

    // multimodal: exact media dedup — one survivor (min id) per distinct
    // payload byte content, elected on (sha256, id) pairs so the blobs
    // never shuffle. Duplicate blobs are synthesized deterministically
    // (doc_id % 137 keys 137 distinct payloads) like q55's injected PII
    "q77_media_dedup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("MEDIA:"), (col("doc_id") % 137).cast("string"))
            .as("blob")),
        "doc_id", "blob", "application/octet-stream")
      Multimodal.dedupExactMedia(media, "doc_id", "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("payload").cast("string").as("payload_str"))
    }),

    // multimodal: frame-level dedup — duplicated payloads (doc_id % 97
    // keys the blob, q77's convention) sample identical frames; each
    // distinct (payload digest, frame_no) survives once under its
    // min-id owner
    "q94_frame_dedup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("FRAMES:"), (col("doc_id") % 97).cast("string"),
            lit(":PAYLOAD")).as("blob")),
        "doc_id", "blob", "video/fake")
      Multimodal.dedupSampledFrames(media, "doc_id", nFrames = 4)
    }),

    // multimodal: byte-level near-dup pairs without decoding — 97
    // payload families whose members differ only in a '::v2' suffix on
    // every 5th id (the tweaked-header/extended-tail case exact media
    // dedup misses); simhash over non-overlapping 4-byte hex chunks
    "q206_media_neardup" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          concat(lit("HDR:"),
            repeat(md5((col("doc_id") % 97).cast("string")), 6),
            when(col("doc_id") % 5 === 0, lit("::v2")).otherwise(lit("")))
            .as("blob")),
        "doc_id", "blob", "application/octet-stream")
      Multimodal.mediaNearDupPairs(media, "doc_id", "payload")
    }),

    // source format: the binaryFile reader — the real ingest path for
    // opaque media payloads (S-category): per-doc files written to a
    // landing dir, read back as (path, length, content) with the doc id
    // recovered from the path and the payload digested; the oracle pins
    // byte-level round-trip fidelity (octet length + md5 of content ==
    // the text the files were written from)
    "q246_binary_source" -> ((s, dir) => {
      import java.nio.file.{Files => JFiles, Paths}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 50 === 0) // a bounded landing batch
      val base = tmpDir("graft_q246")
      docs.collect().foreach { r =>
        JFiles.write(Paths.get(base, s"doc_${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      s.read.format("binaryFile").load(base)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("digest"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q28_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | sha256(text) AS content_sha256
        |FROM documents""".stripMargin,

    // mirrors Multimodal.asMedia → fakeDecode → sampleFrames(nFrames=3):
    // md5-derived per-frame offsets reproduce exactly
    "q29_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |  CAST(f.range AS INTEGER) AS frame_no,
         |  ${PortableHash.sqlHash60("concat_ws('_', sha256(text), f.range)")}
         |    % CAST(octet_length(encode(text)) AS INTEGER) AS frame_offset
         |FROM documents, range(3) f""".stripMargin,

    // mirrors Multimodal.dedupExactMedia: min-id survivor per distinct
    // payload bytes (digest equality ⟺ byte equality within each engine)
    "q77_media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST('MEDIA:' || CAST(doc_id % 137 AS VARCHAR) AS BLOB)
        |      AS payload
        |  FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM m GROUP BY payload)
        |SELECT m.doc_id, CAST(octet_length(m.payload) AS BIGINT) AS n_bytes,
        |  CAST(m.payload AS VARCHAR) AS payload_str
        |FROM m WHERE m.doc_id IN (SELECT doc_id FROM keep)""".stripMargin,

    // mirrors q94: q29's md5-derived offset arithmetic per frame, then
    // min-id election on the (payload digest, frame index) identity
    "q94_frame_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    'FRAMES:' || CAST(doc_id % 97 AS VARCHAR) || ':PAYLOAD'
         |      AS blob
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, sha256(blob) AS sha,
         |    CAST(r.range AS INTEGER) AS frame_no,
         |    ${PortableHash.sqlHash60("concat_ws('_', sha256(blob), r.range)")}
         |      % CAST(octet_length(encode(blob)) AS INTEGER)
         |      AS frame_offset,
         |    CAST(octet_length(encode(blob)) AS INTEGER) AS n_bytes
         |  FROM m, range(4) r),
         |k AS (
         |  SELECT sha, frame_no, min(doc_id) AS doc_id
         |  FROM f GROUP BY 1, 2)
         |SELECT f.doc_id, f.frame_no, f.frame_offset, f.n_bytes
         |FROM f JOIN k USING (doc_id, sha, frame_no)""".stripMargin,

    // mirrors q206: the q22 simhash pipeline over hex-chunk tokens of
    // the synthesized payload blobs (DuckDB hex() is uppercase like
    // Spark's; both lowercase before tokenizing)
    "q206_media_neardup" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST('HDR:' ||
         |      repeat(md5(CAST(doc_id % 97 AS VARCHAR)), 6) ||
         |      CASE WHEN doc_id % 5 = 0 THEN '::v2' ELSE '' END
         |      AS BLOB) AS payload
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(
         |    regexp_replace(hex(payload), '(.{8})', '\\1 ', 'g'))),
         |    '\\s+') AS tk
         |  FROM m),
         |hs AS (
         |  SELECT doc_id, len(tk) AS n,
         |    list_transform(tk, t -> ${PortableHash.sqlHash60("t")}) AS hl
         |  FROM toks),
         |fp AS (SELECT doc_id,
         |  $simhashSql AS simhash
         |  FROM hs),
         |banded AS (
         |  SELECT doc_id, simhash, band,
         |    (simhash >> shft) & mask AS chunk
         |  FROM fp, (VALUES ${simhashBandsSql(7)}) AS bands(band, shft, mask)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS fa, b.simhash AS fb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 7""".stripMargin,

    // mirrors q246: byte-level round-trip — octet length and md5 of the
    // UTF-8 text the files were written from
    "q246_binary_source" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin
  )
}
