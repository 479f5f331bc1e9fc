package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextAnalysis => TA}

/** The training-data twin of [[CovidPipeline]]: the nightly corpus intake
  * as ONE composed, idempotent, incremental pipeline — normalize → quality
  * + language gates → exact dedup → split assignment → split-partitioned
  * lake write, all built from the standalone operators the oracle suite
  * checks one by one (q66, q15/q16, q18, q40). Catalyst fuses the narrow
  * stages into a single pass over the scan; the only shuffles are the
  * dedup hash-aggregate and its keeper semi-join.
  *
  * Incrementality is the production shape the one-shot queries leave open:
  * day-2 batches must dedup against THE CORPUS SO FAR, not just within
  * themselves. [[runIncremental]] anti-joins incoming canonical keys
  * against the existing lake's keys — an equi-join on the md5 key, so at
  * 100 TB it is one co-partitioned shuffle (or a broadcast when the daily
  * increment's key set is small) — then runs the same curation on the
  * survivors and APPENDS. A doc's split assignment is a pure function of
  * doc_id (never rand()), so increments never reshuffle old assignments.
  */
object CorpusPipeline {

  final case class Result(kept: DataFrame, stats: DataFrame)

  private val stopwords = Seq("the", "a")

  /** Canonical key: md5 of the C4-normalized text (q66's form, via the
    * native [[graft.functions.NormalizeText]] pass) — the key exact dedup
    * and incremental anti-joins agree on. */
  def canonicalKey(text: Column): Column =
    md5(graft.functions.NormalizeText(text))

  /** Curate one batch: score → gate → dedup within the batch → split.
    * Pure DataFrame => DataFrame; no writes.
    *
    * `classifier` puts the q211/q212 MODEL-BASED filter in the funnel —
    * the production posture (CCNet's fastText gate, RefinedWeb's quality
    * classifier run as an intake stage, not a side audit): a trained
    * (vocab, weights) pair whose margin is computed IN THE SAME narrow
    * pass that already tokenizes for the heuristic score (one more
    * codegen'd `vocab_counts` + integer dot — zero extra scans, zero
    * extra shuffles), gating on margin > 0 alongside the quality
    * threshold. The trained margin rides along as `clf_margin` so intake
    * reports can aggregate retained margin mass. Training stays OUTSIDE
    * curate (q211's eager driver loop) — curate is a pure plan builder
    * and must not run jobs; callers train once per intake and pass the
    * frozen model, exactly like the inlined IVF centroid posture. */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
             classifier: Option[(Seq[String], Seq[Long])] = None): DataFrame = {
    val toks = col("toks")
    val n = TA.tokenCount(toks).cast("double")
    val d = TA.distinctTokenCount(toks)
    val s = TA.stopwordCount(toks, stopwords)
    val clfCols = classifier.toSeq.map { case (vocab, w) =>
      graft.functions.GraftFunctions.longVecDot(
        concat(array(lit(1L)),
          graft.functions.GraftFunctions.vocabCounts(toks, vocab)),
        typedLit(w)).as("clf_margin")
    }
    val scored = docs
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
        TA.tokens(col("text")).as("toks"))
      .select(Seq(col("doc_id"), col("text"), col("source"), col("n_chars"),
        round(lit(0.3) * (d.cast("double") / n)
          + lit(0.3) * (lit(1.0) - s.cast("double") / n)
          + lit(0.4) * least(lit(1.0), n / lit(100.0)), 4).as("quality_score"),
        canonicalKey(col("text")).as("canonical_key"),
        // the MATERIALIZED near-dup signature: stored in the lake so later
        // increments band-join against it instead of re-digesting the corpus
        graft.functions.SimHash(Dedup.shingles3(col("toks")), Dedup.SimhashBits)
          .as("simhash")) ++ clfCols: _*)
      .filter(col("quality_score") >= minQuality)
    val gated =
      if (classifier.isDefined) scored.filter(col("clf_margin") > 0)
      else scored
    // exact dedup within the batch: keep the lowest doc_id per canonical key
    val keepers = gated.groupBy(col("canonical_key"))
      .agg(min(col("doc_id")).as("doc_id"))
    gated.join(keepers.select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("split", Sampling.split(col("doc_id")))
  }

  /** Full build: curate and (over)write the lake partitioned by split.
    * Overwrite makes the full build idempotent — rerunning replaces the
    * corpus rather than doubling it. */
  def run(spark: SparkSession, docs: DataFrame, lakePath: String,
          minQuality: Double = 0.5): Result = {
    val kept = curate(docs, minQuality)
    kept.write.mode("overwrite").partitionBy("split").parquet(lakePath)
    Result(kept, stats(spark.read.parquet(lakePath)))
  }

  /** Incremental append with BOTH dedup levels against the corpus so far:
    * exact (anti-join on canonical keys) and near-dup (band-join the
    * incoming simhashes against the lake's MATERIALIZED signatures —
    * the 100 TB design: the corpus is never re-digested, increments only
    * touch band-key candidates; Hamming ≤ `maxHamming` drops the doc).
    * Survivors are curated and appended. Returns only newly landed rows. */
  def runIncremental(spark: SparkSession, incoming: DataFrame,
                     lakePath: String, minQuality: Double = 0.5,
                     maxHamming: Int = 3): Result = {
    val lake = spark.read.parquet(lakePath)
    val fresh = incoming
      .withColumn("canonical_key", canonicalKey(col("text")))
      .join(lake.select("canonical_key"), Seq("canonical_key"), "left_anti")
      .drop("canonical_key")
    val curated = curate(fresh, minQuality)
    // near-dup gate: candidates = incoming x lake pairs sharing a Manku
    // block-permutation band (pigeonhole-lossless at Hamming <= 3);
    // the table scheme adapts to the lake's size (one parquet-metadata
    // count per increment) so selectivity grows with the corpus while
    // small lakes pay the 10-table scheme
    val blocks = Dedup.mankuBlocksFor(lake.count())
    def banded(df: DataFrame, idAs: String, simAs: String): DataFrame = df
      .select(col("doc_id").as(idAs), col("simhash").as(simAs))
      .withColumn("bb", explode(Dedup.mankuBands(col(simAs), blocks = blocks)))
      .select(col(idAs), col(simAs),
        col("bb.band").as("band"), col("bb.band_key").as("band_key"))
    val nearDupIds = banded(curated, "in_id", "in_sim")
      .join(banded(lake, "lake_id", "lake_sim"), Seq("band", "band_key"))
      .filter(Dedup.hammingDistance(col("in_sim"), col("lake_sim")) <= maxHamming)
      .select(col("in_id").as("doc_id")).distinct()
    val kept = curated.join(nearDupIds, Seq("doc_id"), "left_anti")
    kept.write.mode("append").partitionBy("split").parquet(lakePath)
    Result(kept, stats(spark.read.parquet(lakePath)))
  }

  /** Per-(split, source) intake report over the lake — row counts and
    * char volume, the numbers a nightly run alerts on. */
  def stats(lake: DataFrame): DataFrame =
    lake.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("quality_score")), 4).as("avg_quality"))
}
