package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-stage aggregation.
  *
  * A plain `groupBy(hotKey).agg(...)` sends every row of a hot key to ONE
  * reducer — at 100 TB a single skewed key (one event_type, one language,
  * one domain) turns a 1000-executor job into a 1-executor job. Salting
  * splits each key into `saltBuckets` sub-keys for the first (wide) shuffle,
  * then re-aggregates the per-salt partials in a second, tiny shuffle whose
  * cardinality is `#keys * salt` — bounded regardless of row skew.
  *
  * Results are exactly the plain aggregation's for decomposable aggregates
  * (sum/count/min/max) when the summed type is exact (decimal/long): q30
  * proves it against a plain-GROUP-BY DuckDB oracle. (AQE's skew-join
  * handling covers joins; salting covers aggregation and is deterministic
  * rather than runtime-detected.) The salt hashes a caller-named
  * distribution column, so repeated runs salt identically.
  */
object Skew {

  /** Aggregation spec: (input column, output name, partial agg, final agg).
    * Partial runs per (key, salt); final merges partials per key. */
  sealed trait SaltedAgg {
    def in: Column; def out: String
    def partial: Column => Column
    def merge: Column => Column
  }
  final case class SaltedSum(in: Column, out: String) extends SaltedAgg {
    def partial: Column => Column = sum
    def merge: Column => Column = sum
  }
  final case class SaltedCount(out: String) extends SaltedAgg {
    def in: Column = lit(1)
    def partial: Column => Column = c => count(c)
    def merge: Column => Column = c => sum(c)
  }
  final case class SaltedMin(in: Column, out: String) extends SaltedAgg {
    def partial: Column => Column = min
    def merge: Column => Column = min
  }
  final case class SaltedMax(in: Column, out: String) extends SaltedAgg {
    def partial: Column => Column = max
    def merge: Column => Column = max
  }

  /** Two-stage salted aggregation over `keys`, salting on a hash of
    * `distributeOn` (any roughly-uniform column; the row id, a timestamp,
    * anything non-constant within the hot key). */
  def saltedAgg(df: DataFrame, keys: Seq[String], distributeOn: Column,
                aggs: Seq[SaltedAgg], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(distributeOn), lit(saltBuckets)))
    val partialCols = aggs.zipWithIndex.map { case (a, i) =>
      a.partial(a.in).as(s"__p$i")
    }
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.zipWithIndex.map { case (a, i) =>
      a.merge(col(s"__p$i")).as(a.out)
    }
    partial
      .groupBy(keys.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }
}
