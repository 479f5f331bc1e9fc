package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK
import graft.sources.Tables

/** The custom TopKPerKey physical operator must return exactly the rows of
  * the window row_number form, and its plan must contain the custom exec
  * node plus a Catalyst-inserted hash exchange (we never hand-schedule). */
class TopKSpec extends SparkSpec {

  test("topK per key == window row_number filter, on real data") {
    val orders = Tables.orders(spark, sfDir)
    val custom = TopK.perKey(orders,
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(custom.collect().toSet === windowed.collect().toSet)
    assert(custom.count() === windowed.count())
  }

  test("plan uses TopKPerKeyExec with a planner-inserted exchange") {
    val df = TopK.perKey(Tables.orders(spark, sfDir),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 2)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("TopKPerKey"), p.take(600))
    assert(p.contains("Exchange hashpartitioning"), p.take(600))
  }

  test("k larger than every group degenerates to the full input") {
    val nation = Tables.nation(spark, sfDir)
    val out = TopK.perKey(nation, Seq(col("n_regionkey")),
      Seq(col("n_nationkey").asc), 1000)
    assert(out.count() === nation.count())
  }

  test("high-cardinality keys stream group-at-a-time (keys-only sort)") {
    // 100k distinct keys: the pre-fix shape buffered #keys*k rows in one
    // hash map before emitting anything; now groups arrive contiguously
    // via the planner-inserted keys-only sort and memory stays O(k).
    val df = spark.range(200000).select(
      (col("id") % 100000).as("key"), col("id").as("v"))
    val top = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc), 1)
    assert(top.count() === 100000)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(400))
    // the sort the exec requires covers the key only, not the order col
    assert(plan.contains("Sort [key"), plan.take(400))
    // spot-check correctness: key 7 keeps the larger of its two ids
    assert(top.filter(col("key") === 7).collect().head.getLong(1) === 100007L)
  }
}
