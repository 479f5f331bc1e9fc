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
}
