package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Skew}
import graft.quality.Quality

/** Edge cases for operator paths no oracle query exercises. */
class OpsEdgeSpec extends SparkSpec {

  test("saltedAgg min/max specs merge correctly across salt buckets") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k" + (i % 3), i.toLong)).toDF("k", "v")
    val got = Skew.saltedAgg(df, Seq("k"), col("v"),
      Seq(Skew.SaltedMin(col("v"), "mn"), Skew.SaltedMax(col("v"), "mx"),
        Skew.SaltedCount("n")), saltBuckets = 7)
      .as[(String, Long, Long, Long)].collect().toSet
    val expect = df.groupBy("k")
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("sampleFrames with stride larger than n_frames keeps frame 0 only") {
    import spark.implicits._
    val media = Seq((1L, "video", Array[Byte](1), 5))
      .toDF("media_id", "kind", "blob", "nf")
      .select(col("media_id"), col("kind"), col("blob"),
        struct(lit(64).as("width"), lit(48).as("height"),
          lit(0).as("sample_rate"), col("nf").as("n_frames")).as("meta"))
    val frames = Multimodal.sampleFrames(media, stride = 100)
      .select("frame_idx").as[Int].collect()
    assert(frames.toSeq === Seq(0))
  }

  test("quality profile of an empty frame returns zero groups, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long)].toDF("source", "lang", "n_chars")
    val prof = Quality.profile(empty, Seq("source"), Seq("lang"), Seq("n_chars"))
    assert(prof.count() === 0)
  }

  test("withinTolerance edge: boundary is inclusive (FP-exact values)") {
    // 0.25 * 200 = 50 exactly representable: boundary must be inclusive
    assert(Quality.withinTolerance(250.0, 200.0, 0.25) === true)
    assert(Quality.withinTolerance(250.5, 200.0, 0.25) === false)
    assert(Quality.withinTolerance(150.0, 200.0, 0.25) === true)
    assert(Quality.withinTolerance(149.0, 200.0, 0.25) === false)
  }
}
