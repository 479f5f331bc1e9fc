package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Driver-contract safety nets: every declared query must build and run on
  * the smallest fixture, oracle keys must match query keys exactly (a typo
  * here silently weakens the correctness gate to rows-only), and operator
  * guards hold. */
class ContractSpec extends SparkSpec {

  test("every SparkEntry query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every query has an oracle and every oracle has a query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphans = os.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(qs.diff(os) === Set.empty, s"queries without oracles: ${qs.diff(os)}")
  }

  test("entry returns fact rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("inverted intervals contribute nothing to the interval join") {
    import spark.implicits._
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts")
    val bad = Seq((1L,
      Timestamp.valueOf("2024-01-02 00:00:00"), // lo AFTER hi
      Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "lo", "hi")
    val out = RangeJoin.intervalJoin(left, bad, "ts", "lo", "hi", Seq("k"), 600L)
    assert(out.count() === 0)
  }
}
