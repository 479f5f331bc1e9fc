package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate ([[Aggregator]] + `functions.udaf`): element-wise
  * minimum across equal-length bigint arrays — the MERGE half of a k-min
  * MinHash sketch, since the union of two sketched sets is exactly the
  * per-position min of their signatures. This completes the UDAF surface of
  * SURVEY §2.9 (scalar exprs are native Catalyst; this is the custom-
  * aggregation path): `reduce` runs map-side as partial aggregation and
  * `merge` combines partition buffers, so the shuffle carries ONE k-long
  * buffer per group instead of the group's rows — the same contract that
  * makes built-in aggs scale.
  *
  * NULL inputs (shingle-less docs have NULL signatures) are skipped; a
  * group with no non-null input finishes to an empty array. The buffer is
  * mutated in place (safe: Spark owns the buffer instance between calls).
  */
object ElementwiseMinLong extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def minInto(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (a == null) b
    else if (b.length == 0) a.toArray
    else {
      require(b.length == a.length,
        s"signature width mismatch: ${a.length} vs ${b.length}")
      var i = 0
      while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = minInto(b, a)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length == 0) y else minInto(x, scala.collection.immutable.ArraySeq.unsafeWrapArray(y))

  override def finish(b: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
