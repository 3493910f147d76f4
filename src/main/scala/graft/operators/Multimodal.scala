package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side plumbing
  * (schema, batching, partition sizing) is real; the actual media decode is
  * STUBBED with a deterministic fake (this container has no image/audio
  * codecs), clearly marked below — swap `fakeDecode` for a real decoder
  * (e.g. a JNI/FFI call inside mapPartitions) in production.
  *
  * Scale notes: payloads never enter a shuffle key; feature extraction is a
  * narrow map; batch shape is controlled by
  * `spark.sql.files.maxPartitionBytes` so a partition of ~128 MB of blobs
  * fits executor memory.
  */
object Multimodal {

  /** Wrap a text/raw column as a binary payload column with metadata —
    * the ingestion shape for media blobs.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(col(idCol),
      col(payloadCol).cast("binary").as("payload"),
      lit(mediaType).as("media_type"),
      octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
      sha2(col(payloadCol).cast("binary"), 256).as("content_sha256"))

  /** STUB decode: deterministic fake "features" derived from the payload
    * bytes (sha-derived). Real implementation would decode the media and
    * emit width/height/duration + an embedding; the schema and partition
    * behavior here are exactly what the real one uses.
    */
  def fakeDecode(df: DataFrame): DataFrame =
    df.withColumn("decode_ok", lit(true))
      .withColumn("fake_width",
        (pmod(xxhash64(col("payload")), lit(1920L)) + 1).cast("int"))
      .withColumn("fake_height",
        (pmod(xxhash64(col("payload"), lit(1)), lit(1080L)) + 1).cast("int"))

  /** Batch media decode over partitions: the Scala analog of a
    * mapInPandas/Arrow-batch decode — one decoder instance per partition
    * (codecs are expensive to init), iterator-to-iterator so a 128 MB
    * partition of blobs streams through without materializing. The
    * DECODER is a pluggable seam ([[Decoder]]): the shipped
    * [[StubDecoder]] is a deterministic fake (no media codecs in this
    * container), but it is one implementation behind the trait, not the
    * API — a production JNI/FFI codec drops in without touching the
    * partitioning, batch shape, or typed output schema.
    */
  case class MediaRow(id: Long, payload: Array[Byte])
  case class DecodedRow(id: Long, n_bytes: Int, width: Int, height: Int)

  /** The decode seam. Implementations ship to executors (Serializable);
    * `open()` runs once per partition — codec/library init belongs there,
    * never per row.
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(id: Long, payload: Array[Byte]): DecodedRow
  }

  /** STUB: deterministic fake dimensions from the payload bytes — stands
    * in for a real image/video codec, which this container lacks.
    */
  object StubDecoder extends Decoder {
    override def decode(id: Long, payload: Array[Byte]): DecodedRow = {
      val h = java.util.Arrays.hashCode(payload)
      DecodedRow(id, payload.length,
        math.floorMod(h, 1920) + 1, math.floorMod(h * 31, 1080) + 1)
    }
  }

  def decodePartitions(media: org.apache.spark.sql.Dataset[MediaRow],
      decoder: Decoder = StubDecoder)
      : org.apache.spark.sql.Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open() // per-partition init (codec load) happens HERE
      rows.map(r => decoder.decode(r.id, r.payload))
    }
  }

  /** Exact media dedup — the training-pipeline staple for image/audio/
    * video blobs: keep ONE survivor (the min id) per distinct payload
    * byte content. The election runs entirely on (sha-256 digest, id)
    * pairs — the BLOBS never enter a shuffle: digests are computed
    * map-side, the min-id-per-digest aggregation shuffles two narrow
    * columns, and survivors rejoin the payload frame by id (left-semi),
    * so at 100 TB the network carries ~70 bytes per blob, not the blobs.
    * Same survivor policy as [[Dedup.exactDedup]] (min id), applied to
    * bytes instead of text.
    */
  def dedupExactMedia(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val keep = df
      .select(col(idCol), sha2(col(payloadCol).cast("binary"), 256).as("__dg"))
      .groupBy(col("__dg")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Byte-level NEAR-duplicate candidate pairs over opaque media
    * payloads — no decode needed, so it works on any modality: the
    * payload is hexed, chunked into `chunkBytes`-byte tokens (one
    * regexp pass; non-overlapping, so the fingerprint is
    * alignment-sensitive — right for the media near-dup cases that
    * matter, overwritten metadata fields and truncated/extended tails,
    * not mid-stream insertions), and fed through the SAME SimHash
    * pigeonhole-banding pipeline as text ([[Dedup.simhashCandidates]]).
    * Returns (id_a, id_b, hamming ≤ maxHamming).
    *
    * Scale: the fingerprint is the only thing that shuffles (8 bytes
    * per blob + band chunks); payload bytes never leave their
    * partition. Catches the re-upload-with-tweaked-header dups that
    * [[dedupExactMedia]]'s byte digest misses.
    */
  def mediaNearDupPairs(media: DataFrame, idCol: String,
      payloadCol: String, maxHamming: Int = 7,
      chunkBytes: Int = 4): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive: $chunkBytes")
    val chunked = media.select(col(idCol).as("__mid"),
      regexp_replace(hex(col(payloadCol).cast("binary")),
        s"(.{${chunkBytes * 2}})", "$1 ").as("__chunks"))
    Dedup.simhashCandidates(chunked, "__mid", "__chunks", maxHamming)
  }

  /** Frame/sample selection stub: pick a deterministic pseudo-random byte
    * offset per frame index — stands in for video frame sampling; the
    * partitioning and output shape (one row per sampled frame) are the real
    * thing. The offset hash is md5-derived (`'0x'||substr(md5(..),1,15)`
    * pattern) so the DuckDB oracle reproduces it exactly — this gate was
    * rows-only in round 1 because xxhash64 has no DuckDB mirror.
    */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int): DataFrame =
    df.select(col(idCol), col("n_bytes"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => pmod(
            conv(substring(md5(concat_ws("_", col("content_sha256"), i)),
              1, 15), 16, 10).cast("long"),
            col("n_bytes")))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_offset")

  /** Frame-level dedup across the corpus: sample `nFrames` per media row
    * ([[sampleFrames]]) and keep each distinct frame ONCE — the min-id
    * holder of the (payload digest, frame_no) identity — the
    * thumbnail/keyframe dedup step of a video curation pipeline.
    * Identity rides the 32-byte content_sha256 + frame index; payload
    * bytes never join, never shuffle (same discipline as
    * [[dedupExactMedia]]). Duplicate payloads contribute their frames
    * exactly once, under the smallest owning id.
    */
  def dedupSampledFrames(media: DataFrame, idCol: String,
      nFrames: Int): DataFrame = {
    val frames = sampleFrames(media, idCol, nFrames)
      .join(media.select(col(idCol), col("content_sha256")), Seq(idCol))
    val keep = frames
      .groupBy(col("content_sha256"), col("frame_no"))
      .agg(min(col(idCol)).as(idCol))
    frames
      .join(keep, Seq(idCol, "content_sha256", "frame_no"), "left_semi")
      .select(col(idCol), col("frame_no"), col("frame_offset"),
        col("n_bytes"))
  }
}
