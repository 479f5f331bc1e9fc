package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (SURVEY.md §2.5 A1/A2).
  *
  * Reproduces the reference's `SQLValueCheckOperator` semantics: pass iff
  * |actual - expected| <= tolerance * expected
  * (reference `dags/ETL_covid19_spark.py:102-108`, pass_value=240,
  * tolerance=0.02). Driver-side control flow around one distributed
  * aggregate — by design, not an aggregate UDAF (SURVEY.md §2.9).
  */
object Quality {

  final case class QualityCheckFailure(
      actual: Double, expected: Double, tolerance: Double)
    extends RuntimeException(
      s"quality check failed: actual=$actual not within " +
        s"${tolerance * 100}% of expected=$expected")

  def withinTolerance(actual: Double, expected: Double, tolerance: Double): Boolean =
    math.abs(actual - expected) <= tolerance * expected

  /** A1+A2: filtered COUNT with relative-tolerance assertion; throws on
    * failure (the reference fails the Airflow task; we fail the pipeline). */
  def countGate(df: DataFrame, expected: Long, tolerance: Double): Long = {
    val actual = df.count()
    if (!withinTolerance(actual.toDouble, expected.toDouble, tolerance))
      throw QualityCheckFailure(actual.toDouble, expected.toDouble, tolerance)
    actual
  }

  /** Column-level quality profile per group: row count, per-column null
    * counts, and numeric min/max — everything a corpus intake gate alerts
    * on, in ONE pass / one shuffle (all aggregates share the groupBy).
    * Exact aggregates only, so the result is engine-portable (q33's DuckDB
    * oracle hash-matches it). */
  def profile(df: DataFrame, groupBy: Seq[String], nullChecked: Seq[String],
              minMax: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        nullChecked.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")) ++
        minMax.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
