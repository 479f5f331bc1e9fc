package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: pair each left row with the right
  * intervals containing its timestamp, plus optional equi-keys.
  *
  * Spark plans a raw `l.ts BETWEEN r.lo AND r.hi` join as a (broadcast)
  * nested-loop — O(|L| * |R|) compares, hopeless at scale. The standard
  * distributed fix: quantize time into fixed-width buckets, explode each
  * interval to the buckets it overlaps (bounded fan-out = interval span /
  * bucket width), equi-join on (keys, bucket) — a plain shuffled hash join
  * — and refine with the exact predicate. Cost: |L| + |R| * spanBuckets
  * rows through one equi-join; no cross product ever.
  *
  * Correct for any data (the refine keeps exact semantics); the bucket
  * width only tunes fan-out vs selectivity. q38 hash-matches a plain
  * BETWEEN join in DuckDB.
  */
object RangeJoin {

  /** @param leftTs   left timestamp column name
    * @param lo,hi    right interval bound column names (inclusive)
    * @param keys     equi-key column names present on both sides
    * @param bucket   bucket width in seconds */
  def intervalJoin(left: DataFrame, right: DataFrame, leftTs: String,
                   lo: String, hi: String, keys: Seq[String],
                   bucket: Long): DataFrame = {
    val b = lit(bucket)
    def bucketOf(ts: Column) = floor(unix_seconds(ts) / b).cast("long")
    val l = left.withColumn("__bucket", bucketOf(col(leftTs)))
    // inverted intervals (hi < lo) must contribute NOTHING — unguarded,
    // sequence() would emit the full DESCENDING bucket range and flood the
    // join with candidates the refine filter only discards later
    val r = right.filter(col(lo) <= col(hi)).withColumn("__bucket",
      explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    l.join(r, keys :+ "__bucket")
      .filter(col(leftTs) >= col(lo) && col(leftTs) <= col(hi))
      .drop("__bucket")
  }
}
