package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Bit-identity of the native [[graft.functions.SimHash]] expression vs
  * the HOF reference [[Dedup.simhashFromHashes]] for every width the HOF
  * supports (≤ 32), plus the documented divergence on featureless input
  * (native NULL vs HOF 0 — q21 bridges it with coalesce) and a sanity
  * check that the native 32..59-bit extension actually populates the
  * upper bits. */
class SimHashSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("the", "quick", "brown", "fox", "jumped")),
      (3L, Seq("lorem", "ipsum", "dolor", "sit", "amet", "lorem", "ipsum")),
      (4L, Seq("a")),
      (5L, Seq.empty[String]),
      (6L, (1 to 200).map(i => s"tok$i"))
    ).toDF("id", "toks")
  }

  test("native SimHash is bit-identical to the HOF form for widths <= 32") {
    for (w <- Seq(1, 2, 8, 16, 31, 32)) {
      val got = docs.select(col("id"),
        graft.functions.SimHash(col("toks"), w).as("native"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("toks")), w).as("hof"))
        .collect()
      got.foreach { case Row(id: Long, native, hof) =>
        if (id == 5L) {
          // documented divergence: featureless docs are NULL natively (so
          // they never band-collide) but 0 in the HOF (sum of no votes)
          assert(native == null && hof == 0L, s"empty-doc case at width $w")
        } else assert(native == hof, s"doc $id width $w: $native != $hof")
      }
    }
  }

  test("coalesce(native, 0) equals the HOF on every row including empty") {
    for (w <- Seq(16, 32)) {
      val bad = docs.select(
        coalesce(graft.functions.SimHash(col("toks"), w), lit(0L)).as("native"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("toks")), w).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(bad === 0L)
    }
  }

  test("the 60-bit extension populates bits 32..59 and nests the 32-bit value") {
    val rows = docs.filter(col("id") =!= 5L).select(
      graft.functions.SimHash(col("toks"), Dedup.SimhashBits).as("wide"),
      graft.functions.SimHash(col("toks"), 32).as("narrow"))
      .collect()
    // low 32 bits of the wide hash are exactly the 32-bit hash (votes per
    // bit position are width-independent)
    rows.foreach { case Row(wide: Long, narrow: Long) =>
      assert((wide & 0xffffffffL) === narrow)
    }
    // and the upper bits are not dead: some doc sets at least one
    assert(rows.exists { case Row(wide: Long, _) => (wide >>> 32) != 0L })
  }

  test("null input: native gives null, HOF folds it to 0 like the empty list") {
    val r = docs.select(
      graft.functions.SimHash(lit(null).cast("array<string>"), 16),
      Dedup.simhashFromHashes(lit(null).cast("array<string>"), 16)).head
    // the HOF's when(bitSum > 0).otherwise(0) swallows the NULL bitSum per
    // bit, so NULL input degrades to simhash 0 — the same coalesce bridge
    // q21 uses for empty docs covers this case too
    assert(r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) === 0L)
  }
}
