package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries
import graft.sources.Tables

/** q213 — SQ8 scalar-quantized retrieval audit: quantization bounds,
  * output shape, and the recall flags' internal consistency. Value
  * exactness vs DuckDB is the driver gate's job; these are the operator
  * invariants that hold at any scale. */
class Sq8Spec extends SparkSpec {

  test("quantized coordinates stay within [-127, 127] at the corpus scale") {
    val emb = Tables.embeddings(spark, sfDir)
    val maxabs = emb.agg(max(expr(
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, v) -> greatest(a, abs(CAST(v AS DOUBLE))))")))
      .head().getDouble(0)
    val outOfRange = emb.select(explode(transform(col("embedding"), v =>
        floor(v.cast("double") * lit(127.0) / lit(maxabs)).cast("long"))).as("q"))
      .filter(col("q") > 127 || col("q") < -127)
      .count()
    assert(outOfRange === 0L)
  }

  test("q213 output: 5 ranks per probe, integer scores in the dot bound, flags consistent") {
    // the emptiness assert below is about THIS query's pins, not whatever
    // an earlier suite left in the shared session
    spark.sharedState.cacheManager.clearCache()
    val rows = SimilarityQueries.q213Sq8Recall(spark, sfDir).collect()
    val byQid = rows.groupBy(_.getLong(0))
    assert(byQid.nonEmpty)
    val dotBound = 64L * 127 * 127
    byQid.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L),
        s"qid $qid ranks not 1..5")
      // ranked by score desc (ties broken by id, so score is non-increasing)
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      rs.foreach { r =>
        assert(math.abs(r.getLong(3)) <= dotBound)
        assert(r.getLong(4) == 0L || r.getLong(4) == 1L)
      }
    }
    // the audit is non-vacuous: 8-bit quantization keeps most of the
    // exact top-5 (95% at sf0.01, measured; floor asserted loosely here)
    val hits = rows.map(_.getLong(4)).sum
    assert(hits * 2 >= rows.length, s"sq8 recall collapsed: $hits/${rows.length}")
    assert(spark.sharedState.cacheManager.isEmpty, "q213 left cache pinned")
  }

  test("q214 (IVF-bounded sq8) candidates are a subset regime: recall <= q213's, shape identical") {
    spark.sharedState.cacheManager.clearCache()
    def byQid(rows: Array[org.apache.spark.sql.Row]) = rows.groupBy(_.getLong(0))
    val brute = SimilarityQueries.q213Sq8Recall(spark, sfDir).collect()
    val ivf = SimilarityQueries.q214IvfSq8(spark, sfDir).collect()
    assert(byQid(ivf).keySet == byQid(brute).keySet)
    byQid(ivf).foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length),
        s"qid $qid ranks not contiguous")
      assert(rs.length <= 5)
    }
    // same quantizer on both arms: any (qid, neighbor) pair both arms
    // rank must carry the IDENTICAL integer score (candidate bounding
    // changes the candidate SET, never a score)
    val bruteScore = brute.map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    ivf.foreach { r =>
      bruteScore.get((r.getLong(0), r.getLong(2))).foreach { sc =>
        assert(sc == r.getLong(3),
          s"score mismatch for (${r.getLong(0)}, ${r.getLong(2)})")
      }
    }
    assert(spark.sharedState.cacheManager.isEmpty, "q214 left cache pinned")
  }
}
