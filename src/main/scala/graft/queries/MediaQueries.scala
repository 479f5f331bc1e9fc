package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal-column queries over a media table derived deterministically
  * from the `documents` fixture (payload bytes from the text + arithmetic
  * metadata — so DuckDB can re-derive the identical table for the oracle).
  * q26/q200/q210 route the payload through GENUINE containers (PPM P6 /
  * RIFF WAV, [[graft.ops.MediaCodec]]) and extract features from the
  * PARSED bytes; the oracles model the container arithmetic (PPM RGB
  * zero-pad, WAV exact roundtrip) so the compare stays value-exact.
  * q24 profiles the stored blob AS-IS (content hash before any decode —
  * the exact-dedup layer) and q25 samples frames from METADATA only
  * (decide which frames before any decode — the pushdown point); both by
  * design never touch container internals. MediaCodec's byte-level
  * contracts are pinned by MultimodalSpec. */
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

  /** Features over PARSED media: the payload is packed into a genuine
    * container (PPM P6 for image/video, RIFF/WAV for audio —
    * [[graft.ops.MediaCodec]]), parsed back by real header validation /
    * chunk traversal, and the histogram runs on the DECODED pixels/
    * samples — so the pipeline exercises byte-structure parsing, not
    * arithmetic on text bytes. Projected to a checker-hashable shape:
    * one row per (media, bin) with the EXACT integer histogram count.
    * [[Multimodal.decodeFeatures]] stays the ops-API (Array[Float]
    * features for the similarity operators, pinned by MultimodalSpec);
    * here the normalized float is inverted back to its integer count via
    * round(v * n) — exact because v = float(count/n) carries ≤ n·2⁻²⁴
    * absolute error, far below 0.5 for any document-sized blob. The
    * oracle models the container arithmetic (PPM zero-pads the payload
    * to whole RGB triples — pad ∈ {0,1,2} bytes landing in bin 0; WAV
    * round-trips exactly). */
  def q26MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.parseContainers(Multimodal.encodeContainers(
        media(spark, dir))))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("bin", "v")))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("bin").cast("long").as("bin"),
        round(col("v").cast("double") * greatest(col("n_bytes"), lit(1)))
          .cast("long").as("bin_count"))

  /** q200: media perceptual-hash near-dup — the image/audio dedup layer a
    * multimodal pipeline runs after exact content-hash dedup (q24's
    * sha256 catches byte-identical blobs; this catches re-encodes and
    * small edits). A 60-bit perceptual fingerprint is built by the REAL
    * pHash recipe over the PARSED payload ([[graft.ops.MediaDsp]]):
    * positional downscale to 32 exact-integer cell means, fixed-point
    * integer DCT-II, the 15 low-frequency AC coefficients binarized at 4
    * magnitude-relative thresholds each (bit(k,t) = 60·c_k > θ_t·Σ|c|,
    * θ ∈ {-3,-1,1,3} — a 5-level quantizer per coefficient, all long
    * arithmetic). The DCT drops the mean (k ≥ 1), so brightness/offset
    * re-encodes collide — the perceptual point — while the oracle gets
    * the IDENTICAL cosine table as interpolated literals, keeping the
    * fingerprint engine-portable bit for bit. Fingerprints are then
    * banded with the same lossless Manku block-permutation tables as q44
    * (radius-3 pigeonhole, corpus-adaptive block count) and verified
    * with exact Hamming ≤ 3 — candidates only ever meet inside a shared
    * band bucket, never via a corpus self-scan.
    * Output is per EXACT-fingerprint group
    * (rep id + member count + near-group count + nearest near-rep), never
    * per pair: re-encode cliques collapse to one representative BEFORE
    * any pairwise work, so output and join cost are linear in distinct
    * fingerprints rather than quadratic in clique size (the per-pair form
    * OOM'd the 1000× rung on ~1000-member cross-copy cliques). The oracle
    * deliberately runs the OTHER algorithm (brute-force all-pairs Hamming
    * between distinct fingerprints — the q44 gate: banding must prove
    * lossless against ground truth). Same-kind pairing only. */
  def q200MediaPhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // blocks from the corpus size (the q44 corpus-adaptive rule); the
    // +4% twin slice never moves mankuBlocksFor across a breakpoint
    val blocks = graft.ops.Dedup.mankuBlocksFor(docs.count())
    // planted re-encodes (the q177 injection posture): every 25th doc
    // gets a same-length lightly-perturbed twin under a shifted id —
    // byte-histogram features are DEGENERATE on ASCII text (3 live bins
    // of 16; measured: every same-kind pair within Hamming 3), so the
    // fingerprint uses the POSITIONAL downscale, and the twins make the
    // detector's hit set non-vacuous (OpsEdgeSpec pins all planted found)
    val twins = Multimodal.fromDocuments(
        docs.filter(col("doc_id") % 25 === 0)
          .withColumn("text", expr("replace(text, 'the', 'thf')")))
      .withColumn("media_id", col("media_id") + lit(1000000000L))
    val all = media(spark, dir).unionByName(twins)
    // container roundtrip first (q26's posture): the fingerprint is built
    // from PARSED pixels/samples — PPM pad zeros join the last cells,
    // modeled by the oracle's padded-length arithmetic. The perceptual
    // transform itself runs at the partition-wise decode boundary
    // (MediaDsp.dctFingerprint); the binarization is Catalyst expressions
    // over its exact integer coefficients.
    val dct = Multimodal.decodeDctFeatures(
        Multimodal.parseContainers(Multimodal.encodeContainers(all)))
      .filter(col("n_bytes") > 0)
      .select(col("media_id"), col("kind"),
        expr("aggregate(coefs, CAST(0 AS BIGINT), (a, x) -> a + abs(x))")
          .as("amag"),
        posexplode(col("coefs")).as(Seq("k0", "c")))
      .select(col("media_id"), col("kind"),
        (0 until 4).map { t =>
          // bit(k,t): 60·c_k > θ_t·Σ|c|, θ_t = 2t−3 ∈ {-3,-1,1,3} — i.e.
          // c_k vs ±¼/±¾ of the mean |coefficient|; all long-safe
          // (|c| ≤ 3.4e13, see MediaDsp's range proof)
          when(col("c") * 60 > lit(2 * t - 3) * col("amag"),
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST(k0 * 4 + $t AS INT))"))
            .otherwise(0L)
        }.reduce(_ + _).as("bit"))
    val ph = dct.groupBy(col("media_id"), col("kind"))
      .agg(sum(col("bit")).as("phash"))
    // exact-fingerprint groups FIRST, banding over group REPRESENTATIVES
    // only. This is both the production shape (re-encodes collapse before
    // any pairwise work) and the scale guard: pair output per media would
    // be quadratic in clique size — the 1000× rung OOM'd on exactly that
    // (ScaleUp's token-prefix transform preserves byte-POSITIONAL
    // statistics, so every original formed a ~1000-member cross-copy
    // clique; measured at 10×: 5000 media → 1395 distinct fingerprints,
    // max clique = copies, near-GROUP pairs sparse at 671).
    val grp = ph.groupBy(col("kind"), col("phash"))
      .agg(min(col("media_id")).as("rep_id"), count(lit(1)).as("n_media"))
    val banded = grp.select(col("kind"), col("phash"), col("rep_id"),
        explode(graft.ops.Dedup.mankuBands(col("phash"), blocks = blocks))
          .as("bb"))
      .select(col("kind"), col("phash"), col("rep_id"),
        col("bb.band").as("band"), col("bb.band_key").as("band_key"))
    val nearAgg = banded.select(col("kind"), col("band"), col("band_key"),
        col("phash").as("p1"), col("rep_id").as("r1"))
      .join(banded.select(col("kind"), col("band"), col("band_key"),
        col("phash").as("p2"), col("rep_id").as("r2")),
        Seq("kind", "band", "band_key"))
      .filter(col("p1") =!= col("p2"))
      .select(col("kind"), col("r1"), col("r2"),
        graft.ops.Dedup.hammingDistance(col("p1"), col("p2"))
          .cast("long").as("h"))
      .filter(col("h") <= 3)
      .distinct() // multi-band duplicates of the same group pair
      .groupBy(col("kind"), col("r1"))
      .agg(count(lit(1)).as("n_near_groups"), min(col("r2")).as("nearest_rep"))
      .withColumnRenamed("r1", "rep_id")
    grp.select(col("kind"), col("rep_id"), col("n_media"))
      .join(nearAgg, Seq("kind", "rep_id"), "left")
      .select(col("kind"), col("rep_id"), col("n_media"),
        coalesce(col("n_near_groups"), lit(0L)).as("n_near_groups"),
        col("nearest_rep"))
  }

  /** q210: container-layer roundtrip audit — the intake check a multimodal
    * lake runs on every media batch: pack each payload into its genuine
    * container (PPM P6 / RIFF WAV — [[graft.ops.MediaCodec]]), parse the
    * bytes back with real header validation and chunk traversal, and
    * report what the CONTAINER says (its total size, the payload size the
    * parser extracted, the dimensions/sample-rate read from the header
    * bytes). The oracle reproduces every figure from the format
    * arithmetic — PPM: 3·ceil(n/3) payload behind a "P6\\n<w> 1\\n255\\n"
    * header (digits(w) + 10 header bytes); WAV: 12-byte RIFF preamble +
    * 24-byte fmt + 12-byte LIST + 8-byte data header + payload +
    * word-alignment pad — so a single byte of drift in either the
    * encoder or the parser breaks the hash compare. Scale shape: one
    * narrow mapPartitions pass, no exchange at all. */
  def q210MediaContainer(spark: SparkSession, dir: String): DataFrame =
    Multimodal.parseContainers(Multimodal.encodeContainers(
        media(spark, dir)))
      .select(col("media_id"), col("kind"), col("container_bytes"),
        octet_length(col("blob")).cast("long").as("payload_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sample_rate").cast("long").as("sample_rate"))

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
    // every figure from the container formats' own arithmetic: PPM P6 =
    // "P6\n<w> 1\n255\n" (10 + digits(w) bytes) + 3·w payload with
    // w = ceil(n/3); WAV = RIFF preamble 12 + fmt 24 + LIST 12 + data
    // header 8 + n payload + (n % 2) word-alignment pad
    "q210_media_container" ->
      s"""WITH media AS ($mediaSql),
         |b AS (SELECT media_id, kind,
         |  CAST(octet_length(blob) AS BIGINT) AS n FROM media)
         |SELECT media_id, kind,
         |  CAST(CASE WHEN kind = 'audio' THEN 12 + 24 + 12 + 8 + n + (n % 2)
         |       ELSE 10 + length(CAST((n + 2) // 3 AS VARCHAR))
         |            + 3 * ((n + 2) // 3) END AS BIGINT) AS container_bytes,
         |  CAST(CASE WHEN kind = 'audio' THEN n
         |       ELSE 3 * ((n + 2) // 3) END AS BIGINT) AS payload_bytes,
         |  CAST(CASE WHEN kind = 'audio' THEN 0
         |       ELSE (n + 2) // 3 END AS BIGINT) AS width,
         |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 1 END AS BIGINT)
         |    AS height,
         |  CAST(CASE WHEN kind = 'audio' THEN 16000 ELSE 0 END AS BIGINT)
         |    AS sample_rate
         |FROM b""".stripMargin,
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

    // The decode's 16-bin byte histogram over the PARSED payload,
    // re-derived arithmetically: bin(b) = (b*16)/256 = b//16 for b in
    // 0..255; the fixture text is pure ASCII so per-character ascii()
    // equals the payload byte. The container roundtrip is modeled as
    // arithmetic: WAV data == payload exactly; PPM zero-pads to whole
    // RGB triples (n_dec = ceil(n/3)*3; the 0..2 pad zeros land in bin
    // 0). Zero-count bins are emitted too (Spark's posexplode yields all
    // 16 per media row).
    "q26_media_features" ->
      s"""WITH media AS ($mediaSql),
         |base AS (SELECT media_id, kind,
         |  CAST(octet_length(blob) AS BIGINT) AS raw_bytes,
         |  CAST(CASE WHEN kind = 'audio' THEN octet_length(blob)
         |       ELSE ((octet_length(blob) + 2) // 3) * 3 END AS BIGINT)
         |    AS n_bytes, text FROM media),
         |chars AS (SELECT media_id, ascii(substr(text, u.i, 1)) // 16 AS bin
         |  FROM base CROSS JOIN LATERAL
         |    (SELECT unnest(generate_series(1, CAST(raw_bytes AS INT))) AS i) u),
         |counts AS (SELECT media_id, bin, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM chars GROUP BY 1, 2),
         |bins AS (SELECT unnest(generate_series(0, 15)) AS bin)
         |SELECT b.media_id, b.kind, b.n_bytes, CAST(bins.bin AS BIGINT) AS bin,
         |  CAST(COALESCE(c.n, 0)
         |    + CASE WHEN bins.bin = 0 THEN b.n_bytes - b.raw_bytes
         |           ELSE 0 END AS BIGINT) AS bin_count
         |FROM base b CROSS JOIN bins
         |LEFT JOIN counts c ON c.media_id = b.media_id AND c.bin = bins.bin""".stripMargin,

    // the OTHER algorithm: brute-force all-pairs Hamming over the same
    // 60-bit fingerprint — the q44 losslessness gate for the Manku
    // banding. The container roundtrip is modeled as arithmetic (q26's
    // rule): WAV payload == text; PPM zero-pads to whole RGB triples, so
    // positions past the raw length carry byte value 0 and the cell
    // assignment runs over the PADDED length. The perceptual transform
    // is replayed from its definition: 32 positional cells, fixed-point
    // cell means (ss*256 // ns — floor over non-negatives on both
    // engines), and the DCT as a join against THE SAME fixed-point
    // cosine table MediaDsp computed (interpolated literals, so the
    // compare never depends on either engine's libm).
    "q200_media_phash" ->
      s"""WITH md0 AS (
         |  SELECT doc_id AS media_id,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    text, CAST(n_chars AS BIGINT) AS raw_bytes FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000000,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |         WHEN 1 THEN 'audio' ELSE 'video' END,
         |    replace(text, 'the', 'thf'), CAST(n_chars AS BIGINT)
         |  FROM documents WHERE doc_id % 25 = 0),
         |md AS (SELECT media_id, kind, text, raw_bytes,
         |  CAST(CASE WHEN kind = 'audio' THEN raw_bytes
         |       ELSE ((raw_bytes + 2) // 3) * 3 END AS BIGINT) AS n_bytes
         |  FROM md0),
         |chars AS (SELECT media_id, n_bytes,
         |  (u.i - 1) * ${graft.ops.MediaDsp.Grid} // n_bytes AS cell,
         |  CAST(CASE WHEN u.i <= raw_bytes
         |    THEN ascii(substr(text, CAST(u.i AS INT), 1))
         |    ELSE 0 END AS BIGINT) AS bv
         |  FROM md CROSS JOIN LATERAL
         |    (SELECT unnest(generate_series(1, CAST(n_bytes AS INT))) AS i) u),
         |cells AS (SELECT media_id, cell,
         |  CAST(SUM(bv) AS BIGINT) * 256 // CAST(COUNT(*) AS BIGINT) AS v
         |  FROM chars GROUP BY 1, 2),
         |ct(k, j, c) AS (VALUES ${graft.ops.MediaDsp.cosTableSqlValues}),
         |coef AS (SELECT cl.media_id, ct.k,
         |  CAST(SUM(cl.v * ct.c) AS BIGINT) AS ck
         |  FROM cells cl JOIN ct ON ct.j = cl.cell GROUP BY 1, 2),
         |amag AS (SELECT media_id, CAST(SUM(ABS(ck)) AS BIGINT) AS amag
         |  FROM coef GROUP BY 1),
         |ph AS (SELECT c2.media_id, m.kind,
         |  CAST(SUM(CASE WHEN c2.ck * 60 > (2 * u.t - 3) * a.amag
         |    THEN (2 ** ((c2.k - 1) * 4 + u.t))::BIGINT ELSE 0 END)
         |    AS BIGINT) AS phash
         |  FROM coef c2 JOIN amag a USING (media_id)
         |  JOIN md m USING (media_id)
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS t) u
         |  GROUP BY 1, 2),
         |g AS (SELECT kind, phash, MIN(media_id) AS rep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_media FROM ph GROUP BY 1, 2),
         |np AS (SELECT a.kind, a.rep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near_groups,
         |  MIN(b2.rep_id) AS nearest_rep
         |  FROM g a JOIN g b2 ON a.kind = b2.kind AND a.phash <> b2.phash
         |    AND bit_count(xor(a.phash, b2.phash)) <= 3
         |  GROUP BY 1, 2)
         |SELECT g.kind, g.rep_id, g.n_media,
         |  COALESCE(np.n_near_groups, 0) AS n_near_groups, np.nearest_rep
         |FROM g LEFT JOIN np ON np.kind = g.kind AND np.rep_id = g.rep_id""".stripMargin
  )
}
