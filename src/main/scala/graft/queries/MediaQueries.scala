package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal-column queries over a media table derived deterministically
  * from the `documents` fixture (text bytes as the opaque blob + arithmetic
  * metadata — so DuckDB can re-derive the identical table for the oracle).
  * The decode stub (q26) is the one non-SQL-expressible op: driver records
  * a rows-only check; its numeric contract is pinned by MultimodalSpec. */
object MediaQueries {

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.documents(spark, dir))

  /** Blob + typed-metadata projection: size, content hash, prefix
    * signature, metadata fields — all codegen'd Catalyst expressions; the
    * blob is never decoded. */
  def q24BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(
      col("media_id"), col("kind"),
      Multimodal.byteSize(col("blob")).cast("long").as("n_bytes"),
      Multimodal.contentHash(col("blob")).as("content_hash"),
      Multimodal.prefixSig(col("blob")).as("prefix_sig"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames"))

  /** Frame sampling from metadata only (`sequence` + `explode`): choose
    * WHICH frames before any decode — the media analog of pushdown. */
  def q25FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(spark, dir), stride = 7)
      .select(col("media_id"), col("kind"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"))

  /** Partition-wise stub decode, projected to a checker-hashable shape:
    * one row per (media, bin) with the EXACT integer histogram count.
    * [[Multimodal.decodeFeatures]] stays the ops-API (Array[Float] features
    * for the similarity operators, pinned by MultimodalSpec); here the
    * normalized float is inverted back to its integer count via
    * round(v * n) — exact because v = float(count/n) carries ≤ n·2⁻²⁴
    * absolute error, far below 0.5 for any document-sized blob. The
    * scalar long/string columns hash cleanly in the driver's pandas
    * check AND admit a value-exact DuckDB oracle. */
  def q26MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(media(spark, dir))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("bin", "v")))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("bin").cast("long").as("bin"),
        round(col("v").cast("double") * greatest(col("n_bytes"), lit(1)))
          .cast("long").as("bin_count"))

  // ---- DuckDB oracle twins ------------------------------------------------

  /** The same deterministic media derivation, in DuckDB terms. DuckDB's
    * sha256/substring only bind to VARCHAR, so the CTE keeps `text`
    * alongside the blob; the fixture text is pure ASCII (byte == char),
    * making the VARCHAR forms byte-equivalent to Spark's binary ops. */
  private val mediaSql =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  encode(text) AS blob, text,
      |  CAST(n_chars % 640 + 64 AS INT) AS width,
      |  CAST(n_chars % 480 + 48 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate,
      |  CAST(n_chars % 240 + 16 AS INT) AS n_frames
      |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    "q24_binary_meta" ->
      s"""WITH media AS ($mediaSql)
         |SELECT media_id, kind,
         |  CAST(octet_length(blob) AS BIGINT) AS n_bytes,
         |  sha256(text) AS content_hash,
         |  lower(hex(encode(substring(text, 1, 8)))) AS prefix_sig,
         |  width, height, sample_rate, n_frames
         |FROM media""".stripMargin,

    "q25_frame_sample" ->
      s"""WITH media AS ($mediaSql)
         |SELECT media_id, kind, n_frames, CAST(u.f AS BIGINT) AS frame_idx
         |FROM media
         |CROSS JOIN LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 7)) AS f) u
         |WHERE n_frames > 0""".stripMargin,

    // The stub decode's 16-bin byte histogram, re-derived arithmetically:
    // bin(b) = (b*16)/256 = b//16 for b in 0..255; the fixture text is pure
    // ASCII so per-character ascii() equals the blob byte. Zero-count bins
    // are emitted too (Spark's posexplode yields all 16 per media row).
    "q26_media_features" ->
      s"""WITH media AS ($mediaSql),
         |base AS (SELECT media_id, kind,
         |  CAST(octet_length(blob) AS BIGINT) AS n_bytes, text FROM media),
         |chars AS (SELECT media_id, ascii(substr(text, u.i, 1)) // 16 AS bin
         |  FROM base CROSS JOIN LATERAL
         |    (SELECT unnest(generate_series(1, CAST(n_bytes AS INT))) AS i) u),
         |counts AS (SELECT media_id, bin, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM chars GROUP BY 1, 2),
         |bins AS (SELECT unnest(generate_series(0, 15)) AS bin)
         |SELECT b.media_id, b.kind, b.n_bytes, CAST(bins.bin AS BIGINT) AS bin,
         |  CAST(COALESCE(c.n, 0) AS BIGINT) AS bin_count
         |FROM base b CROSS JOIN bins
         |LEFT JOIN counts c ON c.media_id = b.media_id AND c.bin = bins.bin""".stripMargin
  )
}
