package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.sources.Tables

/** The Manku block-permutation band tables ([[Dedup.mankuBands]]):
  * radius-3 losslessness by pigeonhole (the property that makes banding
  * a candidate FILTER rather than an approximation), end-to-end equality
  * of banded-candidates-plus-verify against brute force on the real
  * fixture, key packing bounds, and NULL propagation. */
class DedupSpec extends SparkSpec {

  /** Driver-side twin of the band construction for property checks:
    * (table, packedKey) pairs for a 60-bit fingerprint, 6 blocks,
    * radius 3 — must stay in lockstep with [[Dedup.mankuBands]]. */
  private def bandsOf(sim: Long, bits: Int = 60, blocks: Int = 6,
                      radius: Int = 3): Set[(Int, Long)] = {
    val base = bits / blocks
    val widths = (0 until blocks).map(i => base + (if (i < bits % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    (0 until blocks).combinations(blocks - radius).toSeq.zipWithIndex.map {
      case (combo, t) =>
        val key = combo.foldLeft(0L) { (acc, i) =>
          (acc << widths(i)) | ((sim >>> offsets(i)) & ((1L << widths(i)) - 1))
        }
        (t, key)
    }.toSet
  }

  test("pigeonhole: any pair within Hamming distance 3 shares a band table key") {
    val rnd = new scala.util.Random(42)
    val mask60 = (1L << 60) - 1
    // every scheme mankuBlocksFor can pick must be lossless
    for (blocks <- Seq(5, 6, 7); _ <- 1 to 300) {
      val a = rnd.nextLong() & mask60
      val k = rnd.nextInt(4) // 0..3 flipped bits
      val flipped = rnd.shuffle((0 until 60).toList).take(k)
        .foldLeft(a)((v, b) => v ^ (1L << b))
      assert(bandsOf(a, blocks = blocks)
          .intersect(bandsOf(flipped, blocks = blocks)).nonEmpty,
        s"lossless filter dropped a radius-$k pair at $blocks blocks: $a vs $flipped")
    }
  }

  test("mankuBlocksFor: scheme thresholds and monotone selectivity") {
    import graft.ops.Dedup.mankuBlocksFor
    assert(mankuBlocksFor(0) === 5 && mankuBlocksFor(1999999) === 5)
    assert(mankuBlocksFor(2000000) === 6 && mankuBlocksFor(3999999999L) === 6)
    assert(mankuBlocksFor(4000000000L) === 7)
  }

  test("selectivity: unrelated random fingerprints almost never collide") {
    val rnd = new scala.util.Random(7)
    val mask60 = (1L << 60) - 1
    val sims = Seq.fill(300)(rnd.nextLong() & mask60)
    val collisions = for {
      i <- sims.indices; j <- (i + 1) until sims.size
      if bandsOf(sims(i)).intersect(bandsOf(sims(j))).nonEmpty
    } yield (i, j)
    // 300 random 60-bit values, 20 tables x 30-bit keys: expected
    // collisions ~ 44850 * 20 / 2^30 ~ 0.0008 — zero in practice
    assert(collisions.isEmpty, s"random fingerprints collided: $collisions")
  }

  test("the Column expression agrees with the driver-side twin") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val sims = Seq.fill(50)(rnd.nextLong() & ((1L << 60) - 1))
    val got = sims.toDF("sim")
      .select(col("sim"), explode(Dedup.mankuBands(col("sim"))).as("bb"))
      .select(col("sim"), col("bb.band"), col("bb.band_key"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (sim, rows) =>
        sim -> rows.map(r => (r.getInt(1), r.getLong(2))).toSet
      }
    got.foreach { case (sim, bb) => assert(bb === bandsOf(sim)) }
  }

  test("banded candidates + Hamming verify equal brute force on the fixture") {
    val sims = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.SimHash(
          Dedup.shingles3(graft.ops.TextAnalysis.tokens(col("text"))),
          Dedup.SimhashBits).as("simhash"))
      .persist()
    try {
      val a = sims.select(col("doc_id").as("doc1"), col("simhash").as("s1"))
      val b = sims.select(col("doc_id").as("doc2"), col("simhash").as("s2"))
      val brute = a.crossJoin(b)
        .filter(col("doc1") < col("doc2") &&
          Dedup.hammingDistance(col("s1"), col("s2")) <= 3)
        .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
      for (blocks <- Seq(5, 6)) { // both schemes small corpora can take
        val banded = sims
          .select(col("doc_id"),
            explode(Dedup.mankuBands(col("simhash"), blocks = blocks)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
        val viaBands = Dedup.candidatePairs(banded)
          .join(sims.select(col("doc_id").as("doc1"), col("simhash").as("s1")), Seq("doc1"))
          .join(sims.select(col("doc_id").as("doc2"), col("simhash").as("s2")), Seq("doc2"))
          .filter(Dedup.hammingDistance(col("s1"), col("s2")) <= 3)
          .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(viaBands === brute, s"at $blocks blocks")
      }
    } finally sims.unpersist(blocking = true)
  }

  test("band keys are positive and within the packed width; 20 tables") {
    import spark.implicits._
    val got = Seq(-1L & ((1L << 60) - 1), 0L, 123456789L).toDF("sim")
      .select(explode(Dedup.mankuBands(col("sim"))).as("bb"))
      .select(col("bb.band"), col("bb.band_key")).as[(Int, Long)].collect()
    assert(got.map(_._1).distinct.sorted.toSeq === (0 until 20).toSeq)
    got.foreach { case (_, k) => assert(k >= 0L && k < (1L << 30)) }
  }

  test("NULL fingerprint yields NULL band keys (featureless docs never pair)") {
    val rows = spark.range(1)
      .select(explode(Dedup.mankuBands(lit(null).cast("long"))).as("bb"))
      .select(col("bb.band_key")).collect()
    assert(rows.length === 20 && rows.forall(_.isNullAt(0)))
  }
}
