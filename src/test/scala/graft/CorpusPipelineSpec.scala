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

  test("incremental near-dup gate drops simhash-close docs vs the lake's signatures") {
    import spark.implicits._
    val lake = freshLake()
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearText = base.replace("tok7", "tokX") // one word changed
    val farText = (1 to 30).map(i => s"other$i").mkString(" ")
    val day1 = Seq((1L, base, "en", "src0", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusPipeline.run(spark, day1, lake)
    val day2 = Seq(
      (100L, nearText, "en", "src0", nearText.length.toLong),
      (101L, farText, "en", "src0", farText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusPipeline.runIncremental(spark, day2, lake)
      .kept.select("doc_id").as[Long].collect().toSet
    // contract check against the published ops: a doc is dropped exactly
    // when its simhash is within Hamming 3 of a lake signature
    val sims = Seq((1L, base), (100L, nearText), (101L, farText))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.SimHash(
        graft.ops.Dedup.shingles3(graft.ops.TextAnalysis.tokens(col("text"))),
        graft.ops.Dedup.SimhashBits).as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(kept.contains(100L) === (ham(sims(1L), sims(100L)) > 3))
    assert(kept.contains(101L) === (ham(sims(1L), sims(101L)) > 3))
    // a fully different doc must land (deterministic md5-derived simhash)
    assert(kept.contains(101L))
  }

  test("stats report aggregates per (split, source) with exact counts") {
    val lake = freshLake()
    val r = CorpusPipeline.run(spark, Tables.documents(spark, sfDir), lake)
    val total = r.stats.agg(sum("n_docs")).head.getLong(0)
    assert(total === spark.read.parquet(lake).count())
  }

  test("classifier gate in the funnel: margin <= 0 docs drop BEFORE dedup, " +
      "margin rides along, and the gate composes with the quality gate") {
    import spark.implicits._
    // toy intake with a separable marker signal (the sf0.001 fixture's
    // linear ceiling leaves the trained model all-negative, which would
    // make every assertion here vacuous): en docs carry 'goodmark', de
    // docs 'badmark'; doc 4 fails the QUALITY gate regardless of margin;
    // doc 5 is an exact dup of doc 0 (same text → same canonical key)
    val docs = Seq(
      (0L, "goodmark alpha alpha", "en", "src0"),
      (1L, "goodmark beta", "en", "src0"),
      (2L, "badmark alpha", "de", "src1"),
      (3L, "badmark beta beta", "de", "src1"),
      (4L, "the the the the the", "en", "src0"),
      (5L, "goodmark alpha alpha", "en", "src1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // train the q211 model exactly as the intake does (weak supervision
    // from the lang column), then run curate with the frozen weights
    val labeled = docs.select(col("doc_id"), col("lang"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .persist()
    val model @ (vocab, w) = graft.queries.TextQueries.perceptronFromDocs(labeled)
    labeled.unpersist()
    val gated = CorpusPipeline.curate(docs, classifier = Some(model))
    val ungated = CorpusPipeline.curate(docs)
    // every kept row passed both gates, and the margin column is the
    // trained model's margin (recomputed independently per doc)
    val margins = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.longVecDot(
        concat(array(lit(1L)), graft.functions.GraftFunctions.vocabCounts(
          graft.ops.TextAnalysis.tokens(col("text")), vocab)),
        typedLit(w)).as("m")).as[(Long, Long)].collect().toMap
    val keptRows = gated.select("doc_id", "clf_margin", "quality_score")
      .as[(Long, Long, Double)].collect()
    keptRows.foreach { case (id, m, qs) =>
      assert(m === margins(id), s"doc $id margin mismatch")
      assert(m > 0L && qs >= 0.5)
    }
    // the separable toy trains to zero error, so the gate keeps exactly
    // the quality-passing en docs, deduped by min doc_id: {0, 1}
    assert(keptRows.map(_._1).toSet === Set(0L, 1L))
    // gate BEFORE dedup: the de docs (quality-passing, margin-negative)
    // are classifier drops, doc 4 is a quality drop, doc 5 a dedup drop
    assert(ungated.select("doc_id").as[Long].collect().toSet
      === Set(0L, 1L, 2L, 3L))
    // gated keys ⊆ ungated keys (gating only removes key candidates)
    val gatedKeys = gated.select("canonical_key").as[String].collect().toSet
    val ungatedKeys = ungated.select("canonical_key").as[String].collect().toSet
    assert(gatedKeys.subsetOf(ungatedKeys))
    // ungated output has no margin column — the gate is opt-in
    assert(!ungated.columns.contains("clf_margin"))
  }
}
