package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline
import graft.sources.Tables

/** The corpus intake pipeline end to end on the real documents fixture:
  * layout, idempotent full builds, and incremental appends that dedup
  * against the EXISTING lake rather than only within the batch. */
class CorpusPipelineSpec extends SparkSpec {

  private def freshLake(): String =
    java.nio.file.Files.createTempDirectory("corpus_lake").toString

  test("full build writes split-partitioned lake and is idempotent on rerun") {
    val lake = freshLake()
    val docs = Tables.documents(spark, sfDir)
    val r1 = CorpusPipeline.run(spark, docs, lake)
    val n1 = spark.read.parquet(lake).count()
    assert(n1 > 0 && n1 === r1.kept.count())
    // physical layout: split=... directories (partition pruning for readers)
    val dirs = new java.io.File(lake).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet.subsetOf(Set("split=train", "split=val", "split=test")) && dirs.nonEmpty)
    // rerun replaces, never doubles
    CorpusPipeline.run(spark, docs, lake)
    assert(spark.read.parquet(lake).count() === n1)
    // curation gates actually dropped something (not a pass-through)
    assert(n1 < docs.count())
  }

  test("incremental append dedups against the lake and keeps splits stable") {
    import spark.implicits._
    val lake = freshLake()
    val docs = Tables.documents(spark, sfDir)
    val day1 = docs.filter(col("doc_id") < 250)
    CorpusPipeline.run(spark, day1, lake)
    val before = spark.read.parquet(lake)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // day 2: half re-sends of day-1 docs (same text => same canonical key),
    // half genuinely new docs
    val day2 = docs.filter(col("doc_id") < 125)
      .unionByName(docs.filter(col("doc_id") >= 250))
    val r2 = CorpusPipeline.runIncremental(spark, day2, lake)
    val after = spark.read.parquet(lake)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // nothing that was already in the lake landed again
    assert(r2.kept.filter(col("doc_id") < 125).count() === 0)
    // new docs only from the unseen range
    assert(r2.kept.filter(col("doc_id") < 250).count() === 0)
    assert(r2.kept.count() > 0)
    // day-1 rows untouched, split assignments stable (pure fn of doc_id)
    before.foreach { case (id, sp) => assert(after(id) === sp, s"doc $id") }
    // a second identical increment is a no-op
    val n = spark.read.parquet(lake).count()
    CorpusPipeline.runIncremental(spark, day2, lake)
    assert(spark.read.parquet(lake).count() === n)
  }

  test("stats report aggregates per (split, source) with exact counts") {
    val lake = freshLake()
    val r = CorpusPipeline.run(spark, Tables.documents(spark, sfDir), lake)
    val total = r.stats.agg(sum("n_docs")).head.getLong(0)
    assert(total === spark.read.parquet(lake).count())
  }
}
