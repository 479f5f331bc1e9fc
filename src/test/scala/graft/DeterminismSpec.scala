package graft

import org.apache.spark.sql.DataFrame

/** The repo's determinism claims as executable checks: queries whose
  * docstrings promise cluster-deterministic results (exact integer
  * moments, fixed fold orders, sort-based percentiles) must produce
  * IDENTICAL rows under different shuffle widths — the local stand-in
  * for "different cluster, different partitioning, same answer". A
  * double-summed aggregate would pass any single-run oracle check and
  * still flunk this. */
class DeterminismSpec extends SparkSpec {

  private def rowsUnderShuffleWidth(width: String)(build: => DataFrame): Set[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", width)
    try build.collect().map(_.toString).toSet
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def assertWidthInvariant(name: String)(build: => DataFrame): Unit = {
    val a = rowsUnderShuffleWidth("3")(build)
    val b = rowsUnderShuffleWidth("17")(build)
    assert(a === b, s"$name differs across shuffle widths")
    assert(a.nonEmpty, s"$name returned no rows — vacuous check")
  }

  test("q64 regression: exact-moment statistics are shuffle-width invariant") {
    assertWidthInvariant("q64") {
      graft.queries.DateTimeQueries.q64Regression(spark, sfDir)
    }
  }

  test("q68 robust outliers: sort-based percentiles are shuffle-width invariant") {
    assertWidthInvariant("q68") {
      graft.queries.DateTimeQueries.q68RobustOutliers(spark, sfDir)
    }
  }

  test("q58 weighted sample: hash-derived keys are shuffle-width invariant") {
    assertWidthInvariant("q58") {
      graft.queries.TextQueries.q58WeightedSample(spark, sfDir)
    }
  }

  test("q65 streaks: mapGroups fold sorts before folding, width invariant") {
    assertWidthInvariant("q65") {
      graft.queries.DateTimeQueries.q65Streaks(spark, sfDir)
    }
  }

  test("q142 k-means: vector-aggregate rounds are shuffle-width invariant") {
    // long_vec_sum's merge order varies with partitioning; integer
    // addition is associative-commutative so the centroids must not
    assertWidthInvariant("q142") {
      graft.queries.SimilarityQueries.q142KmeansIters(spark, sfDir)
    }
  }

  test("q183 DSIR: quantize-per-bucket-then-weighted-sum is shuffle-width invariant") {
    assertWidthInvariant("q183") {
      graft.queries.TextQueries.q183DsirWeights(spark, sfDir)
    }
  }

  test("q184 packing: the distributed prefix sum is shuffle-width invariant") {
    assertWidthInvariant("q184") {
      graft.queries.TextQueries.q184SeqPacking(spark, sfDir)
    }
  }
}
