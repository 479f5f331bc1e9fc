package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** CI-shaped scale guardrail for the banded dedup family: the r4 1000×-rung
  * wall was a SILENT banding saturation (contiguous 4-band slicing pins key
  * width at bits/4 = 15, so past ~4M docs random collisions revert to
  * n²/2^15 per table and q44/q51 OOM). The fix (corpus-adaptive Manku
  * block-permutation tables) is pinned here as an INVARIANT on the scheme
  * selector itself, so the next banding change cannot reintroduce a wall
  * without a red test:
  *
  *   expected random collisions(scheme(n), n) = tables · n²/2^(keyBits+1)
  *   must stay ≤ 2n at every corpus size the scale ladder has recorded
  *   (and one decade beyond) — candidate volume stays data-proportional
  *   for a random corpus, so real corpora pay only for TRUE near-dups.
  *
  * The bound is evaluated from the same combinatorics mankuBands compiles
  * into the plan (block widths, table count, packed key width), an
  * executable planted-dup corpus ties the math to the real operator, and
  * the deliberately-broken clamp (the pre-r5 scheme) is asserted to FAIL
  * the bound exactly where the r4 wall was measured. */
class BandingGuardrailSpec extends SparkSpec {

  private def comb(n: Int, k: Int): Long =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  /** Mirror of mankuBands' key geometry: block widths for a `bits`-wide
    * fingerprint over `blocks` blocks, and the MINIMUM packed key width
    * over all C(blocks, blocks-radius) tables (the conservative bound —
    * the widest-collision table dominates). */
  private def minKeyBits(bits: Int, blocks: Int, radius: Int): Int = {
    val base = bits / blocks
    val widths = (0 until blocks).map(i => base + (if (i < bits % blocks) 1 else 0))
    widths.sorted.take(blocks - radius).sum
  }

  /** Expected random band-key collisions: per table, a random pair agrees
    * with probability 2^-keyBits, so E[pairs] ≈ tables · n²/2 · 2^-keyBits
    * (union bound across tables — an overcount, hence conservative). */
  private def expectedRandomPairs(n: Long, blocks: Int, radius: Int = 3,
                                  bits: Int = Dedup.SimhashBits): Double = {
    val tables = comb(blocks, blocks - radius)
    tables.toDouble * n.toDouble * n.toDouble /
      2.0 / math.pow(2.0, minKeyBits(bits, blocks, radius))
  }

  test("the chosen scheme keeps expected random candidate volume <= 2n at every recorded ladder size") {
    // 1× / 100× / boundary / 1000× / 2000× rungs plus one decade beyond —
    // every size the ladder has actually measured, with headroom
    val recorded = Seq(5000L, 500000L, 1999999L, 2000000L,
      5000000L, 10000000L, 100000000L)
    recorded.foreach { n =>
      val blocks = Dedup.mankuBlocksFor(n)
      val exp = expectedRandomPairs(n, blocks)
      assert(exp <= 2.0 * n,
        s"scheme for n=$n (blocks=$blocks) expects $exp random pairs > 2n — " +
          "a banding change reintroduced the saturation wall")
    }
  }

  test("negative: the pre-r5 contiguous 4-band slicing fails the bound exactly where the r4 wall was") {
    // 4 contiguous bands at radius 3 = C(4,1) = 4 tables of 15-bit keys;
    // at the 1000× rung (5M docs) that expects ~305n random pairs — the
    // measured r4 OOM. The guardrail must CATCH this construction.
    val n = 5000000L
    val exp = expectedRandomPairs(n, blocks = 4)
    assert(exp > 100.0 * n,
      "the known-broken clamp no longer violates the bound — " +
        "the negative control is miscalibrated")
  }

  test("executable: planted-dup corpus pairs = planted + random residual within the analytic bound") {
    // 60k synthetic fingerprints: ids 2i/2i+1 share a fingerprint (30k
    // planted pairs); fingerprints are xxhash64-derived (uniform,
    // deterministic). candidatePairs must find EVERY planted pair
    // (identical fingerprints collide in all tables — losslessness) and
    // at most the analytic 2n random residual on top.
    val n = 60000L
    val blocks = Dedup.mankuBlocksFor(n)
    val banded = spark.range(n)
      .select(col("id").as("doc_id"),
        pmod(xxhash64(floor(col("id") / 2)), lit(1L << Dedup.SimhashBits)).as("sim"))
      .select(col("doc_id"),
        explode(Dedup.mankuBands(col("sim"), blocks = blocks)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.band_key").as("band_key"))
    val pairs = Dedup.candidatePairs(banded)
    val total = pairs.count()
    val planted = pairs.filter(col("doc2") === col("doc1") + 1 &&
      col("doc1") % 2 === 0).count()
    assert(planted === n / 2, "losslessness: every planted pair must surface")
    val residual = total - planted
    val bound = expectedRandomPairs(n, blocks) * 20 + 100 // generous tail room
    assert(residual <= bound,
      s"random residual $residual exceeds the analytic bound $bound")
  }
}
