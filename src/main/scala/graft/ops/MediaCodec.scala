package graft.ops

/** Dependency-free REAL container codecs for the multimodal boundary:
  * binary PPM (P6) and WAV (RIFF/PCM). These are genuine byte-structure
  * implementations — ASCII header emission/parsing, little-endian size
  * fields, RIFF chunk traversal with word alignment — not arithmetic
  * stand-ins; [[Multimodal.parseContainers]] runs them partition-wise so
  * q26/q200 extract features from PARSED payload bytes.
  *
  * Format notes (both are public specifications):
  *  - PPM P6 (Netpbm): `P6\n<width> <height>\n<maxval>\n` in ASCII, then
  *    exactly 3·width·height raw RGB bytes. The encoder packs a payload
  *    into a height-1 image, zero-padding to a multiple of 3 (pad ∈
  *    {0,1,2}); the parser accepts any whitespace runs between header
  *    tokens (the spec allows them) and validates the payload length.
  *  - WAV (RIFF): `RIFF <le32 size> WAVE`, then chunks of
  *    `<4-byte id> <le32 size> <size bytes> [pad to even]`. The encoder
  *    writes a canonical PCM fmt chunk (mono, 8-bit, configurable rate),
  *    an `LIST` metadata chunk (so the parser's unknown-chunk skip is
  *    exercised on every file), and the `data` chunk with the payload,
  *    word-aligned per the RIFF rule. The parser WALKS the chunks — it
  *    does not assume fixed offsets — honoring the pad byte after
  *    odd-sized chunks, and validates the outer size field.
  */
object MediaCodec {

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])
  final case class WavAudio(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, samples: Array[Byte])

  // ---- PPM (P6) -----------------------------------------------------------

  /** Pack `payload` as a height-1 binary PPM: zero-pad to a multiple of 3
    * (each pixel is one RGB triple), width = payload.length / 3 rounded
    * up. Empty payload → legal 0×1 image with no pixel bytes. */
  def encodePpm(payload: Array[Byte]): Array[Byte] = {
    val w = (payload.length + 2) / 3
    val header = s"P6\n$w 1\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    // remaining 0..2 bytes stay zero — the pad
    out
  }

  /** Parse a binary PPM: validate the P6 magic, read the three ASCII
    * header integers across arbitrary whitespace runs, validate maxval
    * and payload length. Fails loudly on structural corruption — a media
    * pipeline wants a dead-letter row, not silently wrong pixels. */
  def parsePpm(blob: Array[Byte]): PpmImage = {
    require(blob.length >= 2 && blob(0) == 'P' && blob(1) == '6',
      s"not a P6 PPM: magic ${blob.take(2).map(_.toChar).mkString}")
    var pos = 2
    def skipWs(): Unit = {
      while (pos < blob.length && Character.isWhitespace(blob(pos))) pos += 1
    }
    def readInt(what: String): Int = {
      skipWs()
      val start = pos
      while (pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9') pos += 1
      require(pos > start, s"PPM header: expected ASCII integer for $what " +
        s"at byte $start")
      new String(blob, start, pos - start, "US-ASCII").toInt
    }
    val w = readInt("width")
    val h = readInt("height")
    val maxval = readInt("maxval")
    require(maxval == 255, s"PPM maxval must be 255 (8-bit), got $maxval")
    // exactly ONE whitespace byte separates the header from the payload
    require(pos < blob.length && Character.isWhitespace(blob(pos)),
      "PPM header: missing single whitespace before payload")
    pos += 1
    val n = 3 * w * h
    require(blob.length - pos == n,
      s"PPM payload: expected $n bytes for ${w}x$h, got ${blob.length - pos}")
    val pixels = new Array[Byte](n)
    System.arraycopy(blob, pos, pixels, 0, n)
    PpmImage(w, h, pixels)
  }

  // ---- WAV (RIFF/PCM) -----------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode `payload` bytes as mono 8-bit PCM WAV. Chunk layout:
    * fmt (16 bytes, PCM) → LIST/INFO (metadata, exercises the parser's
    * unknown-chunk skip) → data (payload, zero-padded to even length per
    * the RIFF word-alignment rule; the pad is NOT part of the chunk
    * size, so the payload round-trips exactly). */
  def encodeWav(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
    val fmt = Array.concat("fmt ".getBytes("US-ASCII"), le32(16),
      le16(1) /* PCM */ , le16(1) /* mono */ , le32(sampleRate),
      le32(sampleRate) /* byteRate = rate·block */ , le16(1) /* blockAlign */ ,
      le16(8) /* bits */)
    val list = Array.concat("LIST".getBytes("US-ASCII"), le32(4),
      "INFO".getBytes("US-ASCII"))
    val dataPad = payload.length % 2 // RIFF: chunks are word-aligned
    val data = Array.concat("data".getBytes("US-ASCII"), le32(payload.length),
      payload, new Array[Byte](dataPad))
    val body = Array.concat("WAVE".getBytes("US-ASCII"), fmt, list, data)
    Array.concat("RIFF".getBytes("US-ASCII"), le32(body.length), body)
  }

  /** Parse a WAV by WALKING the RIFF chunks: validate RIFF/WAVE magic and
    * the outer size field, then iterate `<id><le32 size><bytes>[pad]`
    * until both fmt and data are seen, skipping any other chunk (LIST,
    * fact, cue, …) by its declared size. Only integer PCM (format 1) is
    * supported — the honest failure for a compressed WAV. */
  def parseWav(blob: Array[Byte]): WavAudio = {
    require(blob.length >= 12, s"WAV too short: ${blob.length} bytes")
    def tag(off: Int) = new String(blob, off, 4, "US-ASCII")
    require(tag(0) == "RIFF", s"not RIFF: '${tag(0)}'")
    val riffSize = readLe32(blob, 4)
    require(riffSize == blob.length - 8,
      s"RIFF size field $riffSize != actual ${blob.length - 8}")
    require(tag(8) == "WAVE", s"not WAVE: '${tag(8)}'")
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Byte] = null
    while (pos + 8 <= blob.length && (samples == null || rate < 0)) {
      val id = tag(pos)
      val size = readLe32(blob, pos + 4)
      // compare in LONG space: a corrupt size field near 2^31 would wrap
      // `pos + 8 + size` negative in int arithmetic, pass the check, and
      // surface as ArrayIndexOutOfBounds instead of this message
      require(size >= 0 && pos.toLong + 8L + size.toLong <= blob.length.toLong,
        s"chunk '$id' at $pos declares $size bytes past end of blob")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val audioFormat = readLe16(blob, pos + 8)
          require(audioFormat == 1, s"only PCM supported, format $audioFormat")
          channels = readLe16(blob, pos + 10)
          rate = readLe32(blob, pos + 12)
          bits = readLe16(blob, pos + 22)
        case "data" =>
          samples = new Array[Byte](size)
          System.arraycopy(blob, pos + 8, samples, 0, size)
        case _ => () // unknown chunk (LIST, fact, …): skip by size
      }
      pos += 8 + size + (size % 2) // word alignment: odd chunks carry a pad
    }
    require(rate >= 0, "WAV: no fmt chunk found")
    require(samples != null, "WAV: no data chunk found")
    WavAudio(rate, channels, bits, samples)
  }
}
