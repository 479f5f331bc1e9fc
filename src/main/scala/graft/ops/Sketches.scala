package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (sketch) aggregates — the constant-memory substitutes a
  * 100 TB profile job uses where exact answers would need unbounded state:
  * HyperLogLog++ for distinct counts (KB of state vs a distinct shuffle of
  * every value) and the approx-percentile sketch for quantiles (vs a full
  * sort). Both are Spark built-ins, mergeable across partitions, and
  * map-side combined like any aggregate.
  *
  * Sketch internals differ engine to engine, so these carry NO DuckDB
  * oracle; SketchesSpec pins them against exact answers within their error
  * bounds on the fixtures instead.
  */
object Sketches {

  /** Distinct count per group via HLL++ (relative std deviation `rsd`). */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"${valueCol}_approx_nd"))

  /** Quantiles per group via the approx_percentile sketch; `accuracy` is
    * the standard 1/eps knob (10000 => ~0.01% rank error). */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsCol = array(probs.map(lit): _*)
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), probsCol, lit(accuracy))
        .as(s"${valueCol}_quantiles"))
  }
}
