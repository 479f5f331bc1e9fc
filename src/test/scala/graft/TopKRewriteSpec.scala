package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK
import graft.sources.Tables

/** The optimizer rewrite rule: users write the row_number window idiom,
  * the plan runs the bounded-heap operator — with the rank emitted under
  * the original attribute, so results (rn included) are identical. */
class TopKRewriteSpec extends SparkSpec {

  private def windowedTop3 = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  test("row_number filter idiom rewrites to TopKPerKeyExec with equal results") {
    val expected = windowedTop3.collect().toSet // without the rule
    TopK.setupRewrite(spark)
    try {
      val df = windowedTop3
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(p.contains("TopKPerKey"), p.take(700))
      // neither the WindowExec ("Window [") nor Spark's own group-limit remains
      assert(!p.contains("Window ["), "window survived the rewrite:\n" + p.take(700))
      assert(!p.contains("WindowGroupLimit"), p.take(700))
      assert(df.collect().toSet === expected)
    } finally TopK.teardownRewrite(spark)
  }

  test("rank = 1 (deduplicate-keep-first idiom) also rewrites") {
    TopK.setupRewrite(spark)
    try {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val df = Tables.customer(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(p.contains("TopKPerKey"), p.take(700))
      // one row per segment, and it is the max-acctbal one
      val rows = df.collect()
      assert(rows.map(_.getString(0)).distinct.length === rows.length)
    } finally TopK.teardownRewrite(spark)
  }

  test("rank-emitting node as the ROOT plan collects safely (UnsafeRow contract)") {
    TopK.setupRewrite(spark)
    try {
      // no select above the filter -> TopKPerKey is the root operator and
      // its rows go straight into getByteArrayRdd's UnsafeRow cast
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val rows = Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getAs[Int]("rn") <= 2))
    } finally TopK.teardownRewrite(spark)
  }

  test("non-top-k window filters are left alone") {
    TopK.setupRewrite(spark)
    try {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val df = Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") > 2)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(p.contains("Window"), "rn > k must keep the window:\n" + p.take(700))
    } finally TopK.teardownRewrite(spark)
  }
}
