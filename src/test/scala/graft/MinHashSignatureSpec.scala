package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashSignature

/** Native minhash expression vs an independent driver-side recomputation
  * of the same Kirsch–Mitzenmacher formula, plus the NULL contract for
  * shingle-less documents. */
class MinHashSignatureSpec extends SparkSpec {

  private def reference(shingles: Seq[String], k: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def halves(s: String): (Long, Long) = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 12), 16),
        java.lang.Long.parseLong(hex.substring(12, 24), 16))
    }
    val hs = shingles.map(halves)
    (0 until k).map(i =>
      hs.map { case (h1, h2) => (h1 + i * h2) % MinHashSignature.P }.min)
  }

  test("signature matches the hex-substring formula computed independently") {
    import spark.implicits._
    val docs = Seq(
      Seq("the quick fox", "quick fox jumps", "fox jumps over"),
      Seq("a b c"),
      Seq("x y z", "y z w"))
    val got = docs.toDF("sh")
      .select(MinHashSignature(col("sh"), 12).as("sig"))
      .as[Seq[Long]].collect()
    docs.zip(got).foreach { case (sh, sig) =>
      assert(sig === reference(sh, 12), s"shingles=$sh")
    }
  }

  test("empty shingle arrays yield NULL signatures (and NULL band keys)") {
    import spark.implicits._
    val df = Seq(Seq.empty[String]).toDF("sh")
      .select(MinHashSignature(col("sh"), 12).as("sig"))
    assert(df.filter(col("sig").isNull).count() === 1)
    val keys = df.select(explode(graft.ops.Dedup.lshBands(col("sig"))).as("bb"))
      .select(col("bb.band_key")).collect()
    assert(keys.forall(_.isNullAt(0)))
  }
}
