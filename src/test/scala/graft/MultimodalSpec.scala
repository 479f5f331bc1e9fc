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
}
