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
