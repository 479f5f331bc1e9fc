package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** The executable 100 TB paths of q89 (`spark.graft.approx.vocab.k`,
  * top-K vocabulary + OOV floor) and q126 (`spark.graft.dfcap`,
  * Henzinger stop-shingle cap): each must reproduce the exact output
  * when its bound doesn't bind, keep the exact plan shape, and degrade
  * only in the documented direction (scores/recall go DOWN, never up)
  * when it does. Exact mode stays the oracle-checked default. */
class ApproxPathsSpec extends SparkSpec {

  private def withConf[T](key: String, v: String)(body: => T): T = {
    spark.conf.set(key, v)
    try body finally spark.conf.unset(key)
  }

  // ---- q89 top-K vocabulary -----------------------------------------

  test("q89: K >= |vocab| reproduces the exact output bit for bit") {
    val exact = TextQueries.q89UnigramLogprob(spark, sfDir)
      .orderBy("doc_id").collect()
    val k = 1000000 // far above the fixture vocabulary
    val approx = withConf("spark.graft.approx.vocab.k", k.toString)(
      TextQueries.q89UnigramLogprob(spark, sfDir).orderBy("doc_id").collect())
    assert(approx.toSeq === exact.toSeq)
  }

  test("q89: a binding K keeps the broadcast shape and only lowers scores") {
    val exact = TextQueries.q89UnigramLogprob(spark, sfDir)
      .select("doc_id", "avg_logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val df = withConf("spark.graft.approx.vocab.k", "3")(
      TextQueries.q89UnigramLogprob(spark, sfDir))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "top-K model no longer broadcasts onto the token stream:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "top-K cut is not planned as per-partition top-K:\n" + p.take(800))
    val approx = df.select("doc_id", "avg_logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet, "docs must never drop")
    // the OOV floor (count 0.5) sits strictly below every real token's
    // logprob, so a doc's mean can only move down
    approx.foreach { case (id, v) =>
      assert(v <= exact(id) + 1e-9, s"doc $id scored HIGHER under top-K")
    }
    assert(approx.exists { case (id, v) => v < exact(id) - 1e-9 },
      "K=3 should actually bind on the fixture")
  }

  // ---- q68 approx medians --------------------------------------------

  test("q68: approx mode keeps the schema and satisfies the median rank bound") {
    import graft.queries.DateTimeQueries
    import graft.sources.Tables
    val exact = DateTimeQueries.q68RobustOutliers(spark, sfDir)
    val approx = withConf("spark.graft.approx.percentile", "true")(
      DateTimeQueries.q68RobustOutliers(spark, sfDir))
    assert(approx.schema === exact.schema)
    // rank property of the approx median per event_type (groups here are
    // far below the 10k sketch buffer, so ranks are exact)
    val meds = withConf("spark.graft.approx.percentile", "true")(
      DateTimeQueries.q68RobustOutliers(spark, sfDir)
        .select("event_type", "med").distinct().collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap)
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    meds.foreach { case (t, m) =>
      val vals = ev.filter(col("event_type") === t)
      val n = vals.count().toDouble
      val below = vals.filter(col("value") < m).count()
      val atMost = vals.filter(col("value") <= m).count()
      assert(below <= n * 0.5 + 1, s"$t: median too high")
      assert(atMost >= n * 0.5 - 1, s"$t: median too low")
    }
  }

  // ---- q126 df cap ---------------------------------------------------

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("q126: a cap above max df reproduces the exact output") {
    val exact = pairsOf(TextQueries.q126PrefixJoin(spark, sfDir))
    spark.catalog.clearCache()
    val capped = withConf("spark.graft.dfcap", "1000000")(
      pairsOf(TextQueries.q126PrefixJoin(spark, sfDir)))
    spark.catalog.clearCache()
    assert(capped === exact)
    assert(exact.nonEmpty, "fixture should contain J >= 0.5 pairs")
  }

  test("q126: a binding cap yields a subset with per-pair J <= exact") {
    val exact = pairsOf(TextQueries.q126PrefixJoin(spark, sfDir))
    spark.catalog.clearCache()
    val capped = withConf("spark.graft.dfcap", "2")(
      pairsOf(TextQueries.q126PrefixJoin(spark, sfDir)))
    spark.catalog.clearCache()
    assert(capped.keySet.subsetOf(exact.keySet),
      "capping the index must never ADD pairs")
    capped.foreach { case (pair, j) =>
      assert(j <= exact(pair) + 1e-9, s"pair $pair gained similarity under the cap")
    }
  }
}
