package graft.quality

import org.apache.spark.sql.DataFrame

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
}
