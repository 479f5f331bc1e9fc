package graft

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin
import graft.plans.TopK

/** Randomized cross-checks: the custom operators vs independent
  * driver-side reference implementations on seeded random data — edge
  * shapes (empty keys, single-row groups, dense ties in keys) that the
  * fixture data never produces. Seeded, so failures reproduce. */
class RandomizedOpsSpec extends SparkSpec {

  private val rnd = new Random(20260813)

  test("asofJoin matches a driver-side reference on random data") {
    import spark.implicits._
    val leftRows = Seq.fill(300)(
      (rnd.nextInt(12).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), rnd.nextInt(1000)))
    val rightRows = Seq.fill(80)(
      (rnd.nextInt(15).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
      // unique (key, ts) on the right — the operator's documented contract
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

    val left = leftRows.toDF("k", "ts", "tag")
    val right = rightRows.toDF("k", "ts", "price")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("price"))
      .select($"k", $"ts", $"tag", $"asof_price")
      .as[(Long, Timestamp, Int, Option[Double])].collect()
      .map(r => (r._1, r._2.getTime, r._3) -> r._4).toMap

    leftRows.foreach { case (k, ts, tag) =>
      val expect = rightRows
        .filter(r => r._1 == k && !r._2.after(ts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got((k, ts.getTime, tag)) === expect, s"key=$k ts=$ts")
    }
    assert(got.size === leftRows.map(r => (r._1, r._2.getTime, r._3)).distinct.size)
  }

  test("asofJoin with tolerance matches the brute-force reference on random data") {
    import spark.implicits._
    val leftRows = Seq.fill(300)(
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), rnd.nextInt(1000)))
    val rightRows = Seq.fill(120)(
      (rnd.nextInt(12).toLong, new Timestamp(rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val tolUs = 20000L * 1000000L // 20k seconds, cuts ~half the matches
    val got = AsofJoin.asofJoin(
        leftRows.toDF("k", "ts", "tag"), rightRows.toDF("k", "ts", "price"),
        Seq("k"), "ts", Seq("price"), tolerance = Some(tolUs))
      .select($"k", $"ts", $"tag", $"asof_price")
      .as[(Long, Timestamp, Int, Option[Double])].collect()
      .map(r => (r._1, r._2.getTime, r._3) -> r._4).toMap
    var gated = 0
    leftRows.foreach { case (k, ts, tag) =>
      val asof = rightRows
        .filter(r => r._1 == k && !r._2.after(ts))
        .sortBy(_._2.getTime).lastOption
      val expect = asof.filter(r =>
        (ts.getTime - r._2.getTime) * 1000L <= tolUs).map(_._3)
      if (asof.isDefined && expect.isEmpty) gated += 1
      assert(got((k, ts.getTime, tag)) === expect, s"key=$k ts=$ts")
    }
    assert(gated > 0, "random data never exercised the tolerance gate")
  }

  test("TopK.perKey matches a driver-side reference for random k and data") {
    import spark.implicits._
    (1 to 3).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val rows = Seq.fill(500)(
        (rnd.nextInt(20).toLong, rnd.nextLong(), rnd.nextInt(100).toDouble))
        .groupBy(_._2).map(_._2.head).toSeq // unique id tie-break
      val df = rows.toDF("key", "id", "score")
      val got = TopK.perKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), k)
        .as[(Long, Long, Double)].collect().toSet
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(r => (-r._3, r._2)).take(k)
      }.toSet
      assert(got === expect, s"trial=$trial k=$k")
    }
  }

  test("upsertRegionDim invariants hold across random batch sequences") {
    import spark.implicits._
    val pool = (1 to 10).map(i => (s"R$i", s"C${i % 3}"))
    var dim = Seq.empty[(Int, String, String, Double, Double)]
      .toDF("region_key", "region_name", "country_name", "lat", "long")
    var seenKeys = Map.empty[(String, String), Int]
    for (batchNo <- 1 to 5) {
      val batch = rnd.shuffle(pool).take(1 + rnd.nextInt(pool.size))
        .map { case (r, c) => (r, c, rnd.nextInt(90).toDouble, rnd.nextInt(180).toDouble) }
        .toDF("region_name", "country_name", "lat", "long")
      dim = graft.ops.Dims.upsertRegionDim(dim, batch)
      val rows = dim.collect().map(r =>
        (r.getAs[String]("region_name"), r.getAs[String]("country_name")) ->
          r.getAs[Int]("region_key")).toMap
      // exactly one row per natural key; keys dense 1..n
      assert(rows.values.toSeq.sorted === (1 to rows.size).toSeq, s"batch=$batchNo")
      // every previously assigned key is unchanged
      seenKeys.foreach { case (nk, k) =>
        assert(rows(nk) === k, s"batch=$batchNo renumbered $nk")
      }
      seenKeys = rows
    }
  }

  test("arg_min_sqdist matches a driver-side argmin on random vectors and centroid sets") {
    import spark.implicits._
    val d = 1 + rnd.nextInt(8)
    val k = 1 + rnd.nextInt(6)
    def vec() = Seq.fill(d)(rnd.nextInt(2000).toLong - 1000L)
    val cents = (0 until k).map(c => (c, vec()))
    val rows = Seq.fill(400)(vec()) ++
      cents.map(_._2) // exact centroid hits: d2 = 0 ties when duplicated
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "xq")
      .crossJoin(broadcast(cents.toDF("cluster", "cq")
        .agg(collect_list(struct(col("cluster"), col("cq"))).as("cents"))))
    val got = df.select(col("id"),
      graft.functions.GraftFunctions.argMinSqDist(col("xq"), col("cents")).as("c"))
      .as[(Long, Int)].collect().toMap
    rows.zipWithIndex.foreach { case (v, i) =>
      val expect = cents.map { case (c, cq) =>
        (v.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
      assert(got(i.toLong) === expect, s"row $i")
    }
  }

  test("long_vec_sum matches a driver-side elementwise sum across random group shapes") {
    import spark.implicits._
    val d = 1 + rnd.nextInt(6)
    val rows = Seq.fill(500)(
      (rnd.nextInt(9).toLong, Seq.fill(d)(rnd.nextLong() % 1000000L)))
    val got = rows.toDF("g", "xq").repartition(7)
      .groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.longVecSum(col("xq")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val expect = vs.map(_._2).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
      assert(got(g) === expect, s"group $g")
    }
  }
}
