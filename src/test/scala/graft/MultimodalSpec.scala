package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}
import graft.queries.MediaQueries
import graft.sources.Tables

/** Multimodal plumbing: schema shape, metadata-only frame sampling, and the
  * stub decode's numeric contract (fixed-length normalized histogram that
  * feeds straight into the similarity ops). */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(Tables.documents(spark, sfDir))

  test("media table has the opaque-blob + typed-metadata schema") {
    val s = media.schema
    assert(s("blob").dataType.typeName === "binary")
    val meta = s("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("width", "height", "sample_rate", "n_frames"))
    assert(media.count() === 500)
  }

  test("frame sampling touches metadata only and honors the stride") {
    import spark.implicits._
    val sampled = Multimodal.sampleFrames(media, stride = 7)
    val one = sampled.filter(col("media_id") === 0)
      .select("frame_idx").as[Int].collect().sorted
    val nf = media.filter(col("media_id") === 0)
      .select(col("meta.n_frames")).as[Int].head()
    assert(one.toSeq === (0 until nf by 7).toSeq)
  }

  test("stub decode: fixed-length normalized histogram per row") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(media, bins = 16).cache()
    assert(feats.count() === 500)
    val row = feats.filter(col("media_id") === 0)
      .select("features", "n_bytes").as[(Seq[Float], Long)].head()
    assert(row._1.length === 16)
    // histogram of n bytes normalized by n sums to ~1
    assert(math.abs(row._1.sum - 1.0f) < 1e-3)
    // deterministic: recompute driver-side from the raw text bytes
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).select("text").as[String].head()
    val expect = new Array[Float](16)
    text.getBytes("UTF-8").foreach(b => expect((b & 0xff) * 16 / 256) += 1f)
    assert(row._1 === expect.map(_ / text.length).toSeq)
    feats.unpersist()
  }

  test("decoded features feed the similarity ops (cosine is finite)") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(media).limit(4)
      .select(col("media_id"), col("features"))
    val cross = feats.as("a").crossJoin(feats.as("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(Similarity.cosine(col("a.features"), col("b.features")).as("cs"))
      .as[Double].collect()
    assert(cross.nonEmpty && cross.forall(c => !c.isNaN && c <= 1.0001))
  }

  test("q24/q25 run and q26 yields 16 histogram rows per media row") {
    assert(MediaQueries.q24BinaryMeta(spark, sfDir).count() === 500)
    val q26 = MediaQueries.q26MediaFeatures(spark, sfDir)
    assert(q26.count() === 500L * 16)
    // bin counts reconstruct exactly: per media they sum to n_bytes
    import org.apache.spark.sql.functions._
    val bad = q26.groupBy("media_id", "n_bytes")
      .agg(sum("bin_count").as("s"))
      .filter(col("s") =!= col("n_bytes")).count()
    assert(bad === 0)
  }

  // ---- MediaCodec: genuine container byte structure -----------------------

  test("PPM P6: header bytes are exactly the spec's ASCII form; payload " +
      "round-trips with zero-pad to whole RGB triples") {
    import graft.ops.MediaCodec
    val payload = "hello world".getBytes("US-ASCII") // 11 bytes -> w=4, pad=1
    val blob = MediaCodec.encodePpm(payload)
    assert(new String(blob.take(11), "US-ASCII") === "P6\n4 1\n255\n")
    assert(blob.length === 11 + 12)
    val img = MediaCodec.parsePpm(blob)
    assert((img.width, img.height) === (4, 1))
    assert(img.pixels.toSeq === (payload :+ 0.toByte).toSeq)
    // parser handles multi-whitespace headers (the spec allows runs)
    val loose = "P6\n 4  1 \n255 ".getBytes("US-ASCII") ++ img.pixels
    assert(MediaCodec.parsePpm(loose).pixels.toSeq === img.pixels.toSeq)
    // empty payload is a legal 0x1 image
    assert(MediaCodec.parsePpm(MediaCodec.encodePpm(Array.emptyByteArray))
      .pixels.isEmpty)
  }

  test("PPM P6: structural corruption fails loudly, not silently") {
    import graft.ops.MediaCodec
    val good = MediaCodec.encodePpm("abcdef".getBytes)
    intercept[IllegalArgumentException] {
      MediaCodec.parsePpm("P5\n2 1\n255\nabcdef".getBytes)
    } // wrong magic
    intercept[IllegalArgumentException] {
      MediaCodec.parsePpm(good.dropRight(1)) // truncated payload
    }
    intercept[IllegalArgumentException] {
      MediaCodec.parsePpm("P6\n2 1\n65535\n".getBytes ++ new Array[Byte](6))
    } // 16-bit maxval unsupported
  }

  test("WAV RIFF: chunk walk skips the LIST chunk, honors word alignment " +
      "on odd payloads, and reads fmt fields from the bytes") {
    import graft.ops.MediaCodec
    val payload = "odd".getBytes("US-ASCII") // 3 bytes -> data pad byte
    val blob = MediaCodec.encodeWav(payload, sampleRate = 16000)
    assert(new String(blob.take(4), "US-ASCII") === "RIFF")
    assert(new String(blob.slice(8, 12), "US-ASCII") === "WAVE")
    // outer size field == file length - 8 (parser validates this too)
    assert(blob.length % 2 === 0) // word-aligned file
    val wav = MediaCodec.parseWav(blob)
    assert(wav.sampleRate === 16000)
    assert(wav.channels === 1)
    assert(wav.bitsPerSample === 8)
    assert(wav.samples.toSeq === payload.toSeq) // pad NOT in the payload
  }

  test("WAV RIFF: corruption and unsupported codecs fail loudly") {
    import graft.ops.MediaCodec
    val good = MediaCodec.encodeWav("abcd".getBytes, 8000)
    intercept[IllegalArgumentException] {
      MediaCodec.parseWav("RIFX".getBytes ++ good.drop(4)) // byte-swapped RIFF
    }
    intercept[IllegalArgumentException] {
      MediaCodec.parseWav(good.dropRight(2)) // size field now lies
    }
    val compressed = good.clone() // fmt audioFormat lives at offset 20
    compressed(20) = 85 // MP3-in-WAV
    intercept[IllegalArgumentException] { MediaCodec.parseWav(compressed) }
    // corrupt size near 2^31: int arithmetic would wrap pos+8+size
    // negative and pass the bounds check, surfacing as an array error —
    // the long-space compare must fail with the intended message
    val big = Array.concat("RIFF".getBytes, Array[Byte](12, 0, 0, 0),
      "WAVE".getBytes, "data".getBytes,
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f)) // 2^31-8
    val e = intercept[IllegalArgumentException] { MediaCodec.parseWav(big) }
    assert(e.getMessage.contains("past end of blob"))
  }

  test("MediaDsp: fixed-point cosine table pinned on hand-computed entries; " +
      "row sums exactly zero") {
    import graft.ops.MediaDsp
    // hand-computed: round(cos(pi*(2j+1)*k/64) * 2^14)
    assert(MediaDsp.cosTable(0)(0) === 16364L)   // cos(pi/64)
    assert(MediaDsp.cosTable(0)(31) === -16364L) // cos(63pi/64) = -cos(pi/64)
    assert(MediaDsp.cosTable(7)(0) === 15137L)   // cos(pi/8) = 0.92388
    assert(MediaDsp.cosTable(14)(16) === 11003L) // cos(495pi/64)
    assert(MediaDsp.cosTable(3)(3) === 3196L)    // cos(28pi/64) = 0.19509
    // analytic row sums are 0 for every AC row; the rounding preserves it
    // (j <-> Grid-1-j antisymmetry), so a CONSTANT signal fingerprints as
    // all-zero coefficients — spectral flatness, the pHash contract
    MediaDsp.cosTable.zipWithIndex.foreach { case (row, k0) =>
      assert(row.sum === 0L, s"row ${k0 + 1} sum")
    }
    assert(MediaDsp.dctOfCells(Array.fill(MediaDsp.Grid)(1234L)).forall(_ == 0L))
  }

  test("MediaDsp: DCT is linear and a delta cell reproduces its table column") {
    import graft.ops.MediaDsp
    val rnd = new scala.util.Random(11)
    val a = Array.fill(MediaDsp.Grid)(rnd.nextInt(65280).toLong)
    val b = Array.fill(MediaDsp.Grid)(rnd.nextInt(65280).toLong)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val sum = MediaDsp.dctOfCells(a).zip(MediaDsp.dctOfCells(b))
      .map { case (x, y) => x + y }
    assert(MediaDsp.dctOfCells(ab).toSeq === sum.toSeq) // exact integers
    // delta at cell j scaled by 1: coefficients == column j of the table
    (0 until MediaDsp.Grid by 7).foreach { j =>
      val delta = Array.fill(MediaDsp.Grid)(0L); delta(j) = 1L
      assert(MediaDsp.dctOfCells(delta).toSeq ===
        MediaDsp.cosTable.map(_(j)).toSeq, s"delta at $j")
    }
  }

  test("MediaDsp: dctFingerprint == cells-then-transform composition; " +
      "floor cell means; empty-tail cells are zero") {
    import graft.ops.MediaDsp
    val payload = Array.tabulate(101)(i => ((i * 37) % 251).toByte)
    val n = payload.length
    val sums = new Array[Long](MediaDsp.Grid)
    val counts = new Array[Long](MediaDsp.Grid)
    payload.zipWithIndex.foreach { case (b, i) =>
      val s = (i.toLong * MediaDsp.Grid / n).toInt
      sums(s) += (b & 0xff); counts(s) += 1
    }
    val composed = MediaDsp.dctOfCells(MediaDsp.cellMeans(sums, counts))
    assert(MediaDsp.dctFingerprint(payload).toSeq === composed.toSeq)
    // payload shorter than the grid: trailing cells empty -> mean 0, and
    // the fingerprint is still defined (no division by zero)
    val short = MediaDsp.dctFingerprint(Array[Byte](10, 20))
    assert(short.length === MediaDsp.Coeffs)
    // floor semantics: 1 byte of value 255 in a cell of count 2 with a
    // zero byte -> (255*256)/2 = 32640 exactly; spot-check via cellMeans
    val s2 = new Array[Long](MediaDsp.Grid); val c2 = new Array[Long](MediaDsp.Grid)
    s2(0) = 255; c2(0) = 2
    assert(MediaDsp.cellMeans(s2, c2)(0) === 32640L)
    s2(1) = 100; c2(1) = 3 // 25600/3 = 8533.33 -> floor 8533
    assert(MediaDsp.cellMeans(s2, c2)(1) === 8533L)
  }

  test("decodeDctFeatures runs the transform at the partition boundary " +
      "and matches MediaDsp on the parsed payload") {
    import spark.implicits._
    val parsed = Multimodal.parseContainers(Multimodal.encodeContainers(media))
    val viaSpark = Multimodal.decodeDctFeatures(parsed)
      .select(col("media_id"), col("coefs"))
      .as[(Long, Seq[Long])].collect().toMap
    val direct = parsed.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(viaSpark.size === direct.size)
    direct.foreach { case (id, payload) =>
      assert(viaSpark(id) === graft.ops.MediaDsp.dctFingerprint(payload).toSeq,
        s"media $id")
    }
  }

  test("encode -> parse container pipeline round-trips every fixture blob " +
      "and reads structure from the container bytes") {
    import spark.implicits._
    val parsed = Multimodal.parseContainers(Multimodal.encodeContainers(media))
    // payload == original blob (+ PPM zero-pad), structure from the bytes
    val joined = parsed.as("p")
      .join(media.as("m"), col("p.media_id") === col("m.media_id"))
      .select(col("p.media_id"), col("p.kind"),
        col("p.blob").as("payload"), col("m.blob").as("orig"),
        col("p.width"), col("p.sample_rate"))
      .collect()
    assert(joined.length === 500)
    joined.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val orig = r.getAs[Array[Byte]]("orig")
      if (r.getString(1) == "audio") {
        assert(payload.toSeq === orig.toSeq)
        assert(r.getAs[Int]("sample_rate") === 16000)
      } else {
        val pad = (3 - orig.length % 3) % 3
        assert(payload.toSeq === (orig ++ new Array[Byte](pad)).toSeq)
        assert(r.getAs[Int]("width") === (orig.length + 2) / 3)
      }
    }
  }
}
