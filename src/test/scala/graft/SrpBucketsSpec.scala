package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** The native SrpBuckets expression must be bit-identical to the
  * composed when/vec_dot Column form (which the DuckDB oracles inline as
  * ±1-literal dot products) at every adaptive plane count. */
class SrpBucketsSpec extends SparkSpec {

  private lazy val signs =
    Similarity.hyperplaneSigns(8 * Similarity.MaxPlanesPerTable, 64)

  test("native == composed across the embeddings fixture, pn sweep") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    for (pn <- Seq(3, 6, 10, Similarity.MaxPlanesPerTable)) {
      val df = emb.select(
        Similarity.srpBucketsAdaptive(col("embedding"), signs, 8, pn).as("a"),
        Similarity.srpBucketsComposed(col("embedding"), signs, 8, pn).as("b"))
      assert(df.filter(not(col("a") <=> col("b"))).count() === 0,
        s"mismatch at pn=$pn")
    }
  }

  test("adaptivePlanes: integer bit-length ladder, clamped") {
    import Similarity.adaptivePlanes
    assert(adaptivePlanes(1) === 3)
    assert(adaptivePlanes(32) === 3)
    assert(adaptivePlanes(200) === 3)
    assert(adaptivePlanes(500) === 4)
    assert(adaptivePlanes(2000) === 6)
    assert(adaptivePlanes(20000) === 10)
    // the r5-era clamp at 12 was the SRP family's saturation wall (the
    // r6 1000x rung measured 2M vectors at ~15x target occupancy, and
    // q174's corpus-proportional query side OOM'd on the candidate
    // volume) — the ladder now runs to 24
    assert(adaptivePlanes(1000000) === 15)
    assert(adaptivePlanes(2000000) === 16) // the 1000x rung: occupancy ~30
    assert(adaptivePlanes(1L << 40) === 24) // clamped at MaxPlanesPerTable
  }

  test("short vector: length-mismatched sign rows contribute no bits") {
    import spark.implicits._
    // 64-dim sign rows against a 3-dim vector: every plane's dot is a
    // length mismatch -> all buckets 0 (the composed form's NULL-gated 0)
    val df = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("embedding")
      .select(Similarity.srpBucketsAdaptive(col("embedding"), signs, 8, 4).as("b"))
    assert(df.as[Seq[Long]].collect().head === Seq.fill(8)(0L))
  }
}
