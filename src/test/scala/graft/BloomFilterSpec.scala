package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime bloom-filter join pruning — the 100 TB shuffle-join complement
  * to broadcast dims and AQE skew splits: when a selective filter sits on
  * one side of a shuffle equi-join, Spark's InjectRuntimeFilter builds a
  * bloom filter of the filtered side's join keys and semi-filters the fact
  * side BEFORE its shuffle, cutting exchange volume by the filter's
  * selectivity. Local fixture sizes sit below the production thresholds
  * (10 GB application-side scan), so the spec lowers them to prove the
  * mechanics; production sizes clear the real defaults.
  */
class BloomFilterSpec extends SparkSpec {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter injected on the fact side of a selective shuffle join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = Tables.lineitem(spark, sfDir)
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        "no runtime bloom filter in the optimized plan:\n" + opt.take(1500))
      // the filter is a pure pruning optimization — results are unchanged
      val bloom = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val plain = li.join(urgent.hint("broadcast"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(bloom === plain)
    }
  }

  test("bloomGatedNewKeys == plain anti-join, even with an undersized bloom") {
    import spark.implicits._
    val lake = (0L until 400L).map(i => "k" + (i % 250)).toDF("k")
    val batch = (0L until 300L).map(i => ("k" + (i + 200), i)).toDF("k", "id")
    val plain = batch.join(lake, Seq("k"), "left_anti")
      .as[(String, Long)].collect().toSet
    // generously sized (fp ~1%) and pathologically undersized (fp-heavy)
    // blooms must both reproduce the anti-join exactly: false positives
    // are verify traffic, never output
    for (items <- Seq(1000000L, 1L)) {
      val got = graft.ops.Dedup.bloomGatedNewKeys(lake, batch, "k", items)
        .as[(String, Long)].collect().toSet
      assert(got === plain, s"expectedItems=$items")
    }
  }

  test("q201 probes through might_contain and verifies via broadcast semi join") {
    val df = graft.queries.TextQueries.q201BloomDedup(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      "q201's batch probe is not the codegen'd bloom expression:\n" + opt.take(1500))
    df.collect() // materialize so AQE settles the physical joins
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"))
    // the lake-side verify must be the broadcast semi join (lake scanned
    // map-side; the lake-proportional key shuffle is the thing this
    // operator exists to remove)
    assert(phys.contains("BroadcastHashJoin") &&
      phys.toLowerCase.contains("leftsemi"),
      "verify stage is not a broadcast semi join:\n" + phys.take(2000))
  }
}
