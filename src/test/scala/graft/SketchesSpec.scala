package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.sources.Tables

/** Sketch aggregates vs exact answers on the fixtures: HLL++ within its
  * rsd bound, approx percentiles within rank tolerance. */
class SketchesSpec extends SparkSpec {

  test("approx_count_distinct is within 3*rsd of exact per group") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val approx = Sketches.approxDistinct(docs, Seq("source"), "text", rsd = 0.05)
      .as[(String, Long)].collect().toMap
    val exact = docs.groupBy("source")
      .agg(count_distinct(col("text")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(3, 3 * 0.05 * e),
        s"group $k: approx ${approx(k)} vs exact $e")
    }
  }

  test("approx percentiles bracket the exact median of lineitem quantity") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val qs = Sketches.approxQuantiles(
      li, Seq("l_returnflag"), "l_quantity", Seq(0.1, 0.5, 0.9))
      .as[(String, Seq[Double])].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"))
      .as[(String, Double)].collect().toMap
    qs.foreach { case (flag, Seq(p10, p50, p90)) =>
      assert(p10 <= p50 && p50 <= p90)
      // quantity range is ~[1,50]; sketch median within 2 units of exact
      assert(math.abs(p50 - exact(flag)) <= 2.0,
        s"$flag: sketch p50 $p50 vs exact ${exact(flag)}")
    }
  }

  test("frequentItems finds the true heavy hitters with exact counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed stream: item i in 0..9 appears 1000/(i+1) times, plus a
    // 5000-item uniform tail of singletons
    val head = (0 until 10).flatMap(i => Seq.fill(1000 / (i + 1))(s"hot_$i"))
    val tail = (0 until 5000).map(i => s"cold_$i")
    val df = spark.createDataset(scala.util.Random.shuffle(head ++ tail).toSeq)
      .toDF("token").repartition(8)
    val got = graft.ops.Sketches.frequentItems(df, "token", k = 5,
        support = 0.02)
      .as[(String, Long)].collect()
    // the KPS sketch may admit false-positive CANDIDATES, but the exact
    // recount + top-k must surface precisely the true heavy hitters
    assert(got.map(_._1).toSeq ===
      Seq("hot_0", "hot_1", "hot_2", "hot_3", "hot_4"))
    assert(got.toMap === Map("hot_0" -> 1000L, "hot_1" -> 500L,
      "hot_2" -> 333L, "hot_3" -> 250L, "hot_4" -> 200L))
  }

  test("misraGriesCandidates is a superset of the true n/k heavy hitters (randomized)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // zipf-ish stream: item i drawn with weight 1/(i+1), plus noise
      val n = 20000
      val stream = (0 until n).map { _ =>
        val r = rnd.nextDouble()
        val i = math.min((1.0 / (r + 0.01) - 1.0).toInt, 400)
        s"item_$i"
      }
      val df = spark.createDataset(stream).toDF("v").repartition(7)
      val k = 50
      val cands = graft.ops.Sketches.misraGriesCandidates(df, "v", k)
        .as[String].collect().toSet
      val exactHeavy = stream.groupBy(identity).view.mapValues(_.size)
        .filter(_._2 > n / k).keys.toSet
      assert(exactHeavy.subsetOf(cands),
        s"trial $trial: MG lost heavy hitters ${exactHeavy -- cands}")
      // and the candidate set stays bounded: <= k per partition
      assert(cands.size <= k * 7, s"trial $trial: ${cands.size} candidates")
    }
  }
}
