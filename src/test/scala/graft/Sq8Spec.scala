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
}
