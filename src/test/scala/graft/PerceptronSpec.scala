package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.queries.TextQueries

/** q211/q212 — the model-based quality filter (batch perceptron).
  *
  * The contract under test: the engine's distributed training loop is
  * BIT-IDENTICAL to the sequential reference recurrence (vocab = corpus
  * top-K by count-desc-then-token; x = [1, count(vocab_1), ...]; per round
  * w += Σ y·x over docs with y·(w·x) ≤ 0). The reference here is a
  * ~20-line in-memory Scala replay — same role as DimsSpec's java.time
  * cross-check: two independent implementations, exact integer equality.
  */
class PerceptronSpec extends SparkSpec {

  /** Sequential in-memory replay of the batch-perceptron recurrence. */
  private def reference(docs: Seq[(Long, Seq[String])], k: Int, rounds: Int)
      : (Seq[String], Array[Long]) = {
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).map(_._1)
    val feats = docs.map { case (y, toks) =>
      (y, (1L +: vocab.map(v => toks.count(_ == v).toLong)).toArray)
    }
    val w = new Array[Long](vocab.size + 1)
    for (_ <- 1 to rounds) {
      val delta = new Array[Long](w.length)
      feats.foreach { case (y, x) =>
        val m = w.indices.map(j => w(j) * x(j)).sum
        if (y * m <= 0) for (j <- w.indices) delta(j) += y * x(j)
      }
      for (j <- w.indices) w(j) += delta(j)
    }
    (vocab, w)
  }

  private def toyDocs(rows: Seq[(Long, Long, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "y", "toks")
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  test("perceptronFromDocs matches the sequential reference on a separable toy set") {
    // 'good' marks the positive class exactly; a separating w exists and
    // the batch loop must find one (zero training error at the end)
    val rows = Seq[(Long, Long, Seq[String])](
      (0L, 1L, Seq("good", "alpha", "alpha")),
      (1L, 1L, Seq("good", "beta")),
      (2L, -1L, Seq("bad", "alpha")),
      (3L, -1L, Seq("bad", "beta", "beta")))
    val docs = toyDocs(rows)
    try {
      val (gotVocab, gotW) = TextQueries.perceptronFromDocs(docs)
      val (refVocab, refW) =
        reference(rows.map(r => (r._2, r._3)), TextQueries.clfVocabK,
          TextQueries.perceptronRounds)
      assert(gotVocab == refVocab)
      assert(gotW == refW.toSeq)
      // and the learned weights actually separate the toy set
      val w = refW
      rows.foreach { case (_, y, toks) =>
        val x = 1L +: refVocab.map(v => toks.count(_ == v).toLong)
        val m = w.indices.map(j => w(j) * x(j)).sum
        assert(y * m > 0, s"toy doc with y=$y not separated (margin $m)")
      }
    } finally docs.unpersist()
  }

  test("converged rounds are a no-op (NULL delta keeps w)") {
    // one doc, one token: round 1 sets w = y·x; every later round has
    // zero misclassified rows, long_vec_sum returns NULL, w must persist
    val docs = toyDocs(Seq((0L, 1L, Seq("tok"))))
    try {
      val (_, gotW) = TextQueries.perceptronFromDocs(docs)
      assert(gotW == Seq(1L, 1L)) // bias + count, from round 1 alone
    } finally docs.unpersist()
  }

  test("q211 weights equal the reference replay on the sf0.001 fixture") {
    spark.sharedState.cacheManager.clearCache()
    val fixture = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        expr("filter(split(text, '\\\\s+'), t -> length(t) > 0)").as("toks"))
      .collect()
      .map(r => (r.getLong(1), r.getSeq[String](2)))
      .toSeq
    val (refVocab, refW) =
      reference(fixture, TextQueries.clfVocabK, TextQueries.perceptronRounds)
    val got = TextQueries.q211PerceptronTrain(spark, sfDir)
      .orderBy("feat_rank").collect()
    assert(got.length == refW.length)
    assert(got.head.getString(1) == "<bias>")
    got.zipWithIndex.foreach { case (r, j) =>
      assert(r.getLong(0) == j)
      if (j > 0) assert(r.getString(1) == refVocab(j - 1))
      assert(r.getLong(2) == refW(j), s"weight mismatch at rank $j")
    }
    // the driver-loop form unpersists everything before returning
    assert(spark.sharedState.cacheManager.isEmpty, "q211 left cache pinned")
  }

  test("q212 report is internally consistent and scored by the q211 weights") {
    spark.sharedState.cacheManager.clearCache()
    val rep = TextQueries.q212ClassifierReport(spark, sfDir)
      .orderBy("lang").collect()
    val total = rep.map(_.getLong(1)).sum
    assert(total > 0)
    rep.foreach { r =>
      val (n, pred, corr, accBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pred <= n && corr <= n)
      assert(accBp == (2 * corr * 10000 + n) / (2 * n))
      // en rows: correct == predicted-target; others: correct == n - pred
      if (r.getString(0) == "en") assert(corr == pred)
      else assert(corr == n - pred)
    }
    assert(spark.sharedState.cacheManager.isEmpty, "q212 left cache pinned")
  }

  /** Sequential replay of the HASHED-feature recurrence (q217): the same
    * batch update over md5-bucket counts — x = [1, bucket counts...],
    * bucket(t) = first md5 byte (unsigned) % B. */
  private def hashedReference(docs: Seq[(Long, Seq[String])], b: Int,
                              rounds: Int): Array[Long] = {
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      (h(0) & 0xff) % b
    }
    val feats = docs.map { case (y, toks) =>
      val x = new Array[Long](b + 1)
      x(0) = 1L
      toks.foreach(t => x(1 + bucket(t)) += 1L)
      (y, x)
    }
    val w = new Array[Long](b + 1)
    for (_ <- 1 to rounds) {
      val delta = new Array[Long](w.length)
      feats.foreach { case (y, x) =>
        val m = w.indices.map(j => w(j) * x(j)).sum
        if (y * m <= 0) for (j <- w.indices) delta(j) += y * x(j)
      }
      for (j <- w.indices) w(j) += delta(j)
    }
    w
  }

  test("hashedPerceptronFromDocs matches the sequential hashed replay on the fixture") {
    val fixture = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        expr("filter(split(text, '\\\\s+'), t -> length(t) > 0)").as("toks"))
    val docs = fixture.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val gotW = TextQueries.hashedPerceptronFromDocs(docs)
      assert(gotW.length == TextQueries.clfHashBuckets + 1)
      val rows = docs.collect().map(r => (r.getLong(1), r.getSeq[String](2))).toSeq
      val refW = hashedReference(rows, TextQueries.clfHashBuckets,
        TextQueries.perceptronRounds)
      assert(gotW == refW.toSeq)
      // the hashed model is non-trivial on the fixture (learned something)
      assert(gotW.exists(_ != 0L))
    } finally docs.unpersist()
  }

  test("q217 report consistency mirrors q212's on the hashed feature map") {
    spark.sharedState.cacheManager.clearCache()
    val rep = TextQueries.q217HashedClfReport(spark, sfDir)
      .orderBy("lang").collect()
    assert(rep.map(_.getLong(1)).sum > 0)
    rep.foreach { r =>
      val (n, pred, corr, accBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pred <= n && corr <= n)
      assert(accBp == (2 * corr * 10000 + n) / (2 * n))
      if (r.getString(0) == "en") assert(corr == pred)
      else assert(corr == n - pred)
    }
    assert(spark.sharedState.cacheManager.isEmpty, "q217 left cache pinned")
  }
}
