package graft

import org.apache.spark.sql.functions._
import graft.queries.CoreQueries
import graft.sources.Tables

/** The EXECUTABLE approx path of q72 (`spark.graft.approx.percentile`):
  * the sketch swap must keep the output schema and the plan shape
  * (edges aggregate → broadcast back → narrow bin map → count agg, no
  * full-table sort), and the approx edges must satisfy the rank-error
  * bound approx_percentile guarantees (≤ n/accuracy; exact rank at spec
  * scale, where every group is far below the 10k accuracy buffer). The
  * exact form stays the oracle-checked default — this spec is the
  * bounded-error contract between the two. */
class Q72ApproxSpec extends SparkSpec {

  private def withApprox[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.approx.percentile", on.toString)
    try body finally spark.conf.unset("spark.graft.approx.percentile")
  }

  test("approx mode keeps the schema and the broadcast-back plan shape") {
    val exact = CoreQueries.q72EquidepthHist(spark, sfDir)
    val approx = withApprox(true)(CoreQueries.q72EquidepthHist(spark, sfDir))
    assert(approx.schema === exact.schema)
    val p = approx.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "edges no longer broadcast back onto the scan:\n" + p.take(800))
    assert(!p.contains("SortExec") && !p.contains("WindowExec"),
      "approx path introduced a sort/window of the table:\n" + p.take(800))
  }

  test("approx edges satisfy the rank-error bound per language") {
    val docs = Tables.documents(spark, sfDir).select(col("lang"), col("n_chars"))
    val edges = withApprox(true) {
      CoreQueries.q72EquidepthHist(spark, sfDir)
        .select("lang", "p25", "p50", "p75").distinct()
    }
    val checked = docs.join(edges, Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum((col("n_chars") < col("p25")).cast("long")).as("below25"),
        sum((col("n_chars") <= col("p50")).cast("long")).as("atmost50"),
        sum((col("n_chars") < col("p50")).cast("long")).as("below50"),
        sum((col("n_chars") <= col("p75")).cast("long")).as("atmost75"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      // groups here are far below the 10k accuracy buffer, so the sketch
      // holds every value and the returned element's rank is exact:
      // #(< p_q) <= q·n and #(<= p_q) >= q·n (round to the element rank)
      assert(r.getAs[Long]("below25") <= n * 0.25 + 1, r.toString)
      assert(r.getAs[Long]("below50") <= n * 0.5 + 1, r.toString)
      assert(r.getAs[Long]("atmost50") >= n * 0.5 - 1, r.toString)
      assert(r.getAs[Long]("atmost75") >= n * 0.75 - 1, r.toString)
    }
  }

  test("default (exact) mode is unchanged by the conf plumbing") {
    val a = CoreQueries.q72EquidepthHist(spark, sfDir).orderBy("lang", "bin").collect()
    val b = withApprox(false)(
      CoreQueries.q72EquidepthHist(spark, sfDir).orderBy("lang", "bin").collect())
    assert(a.toSeq === b.toSeq)
  }
}
