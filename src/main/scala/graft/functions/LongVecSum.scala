package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native elementwise SUM over `array<long>` rows — the vector-valued
  * aggregate that keeps array-shaped pipelines array-shaped: a per-group
  * centroid/moment sum is ONE buffer of d longs updated in place, instead
  * of a posexplode to n·d (group, dim, x) rows feeding a scalar sum (the
  * explode materializes d rows per input row just to re-aggregate them —
  * measured as the dominant cost of q142's centroid step once assignment
  * went native).
  *
  * Semantics mirror SQL SUM lifted pointwise: NULL input arrays are
  * ignored; a group with no non-NULL input aggregates to NULL. Length
  * mismatches and NULL elements THROW — they indicate corrupt vectors, and
  * a silent skip would ship a wrong centroid (the scalar-sum twin can't
  * even express a ragged group). Exact 64-bit integer arithmetic;
  * callers own overflow bounds (n rows of |x| ≤ m need n·m < 2⁶³ —
  * q142's 1e-6 grid: 2M rows × 2·10⁶ ≈ 4·10¹² ≪ 2⁶³).
  *
  * TypedImperativeAggregate, so partial aggregation applies: each map
  * task combines to one d-long buffer per group before the exchange —
  * the shuffle carries k·d longs per partition regardless of row count. */
case class LongVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_vec_sum requires array<bigint> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "long_vec_sum"

  // null until the first non-null input row fixes the dimensionality
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out =
      if (buf == null) new Array[Long](n)
      else {
        require(buf.length == n,
          s"long_vec_sum: length mismatch ($n vs ${buf.length}) — ragged vector group")
        buf
      }
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"long_vec_sum: NULL element at index $i")
      out(i) += arr.getLong(i)
      i += 1
    }
    out
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other == null) return buf
    if (buf == null) return other
    require(buf.length == other.length,
      s"long_vec_sum: merge length mismatch (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVecSum =
    copy(child = newChildren.head)
}
