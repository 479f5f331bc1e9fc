package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native SimHash over an array<string> of features (shingles/tokens):
  * bit j is set iff sum over features of (+1 if the j-th vote bit of
  * md5(feature) is set else -1) is positive. Vote bits: for j < 32 the
  * TOP bit of hex digit j (`digit >= 8` — the original formula, so all
  * widths ≤ 32 are bit-identical to the HOF `Dedup.simhashFromHashes`
  * and the historical oracles); for 32 ≤ j < 64 the SECOND bit of hex
  * digit j−32 (`(digit & 4) != 0`) — an independent md5 bit per
  * position, extending the width without a second digest. One digest and
  * nBits integer ops per feature in a single compiled eval per row (the
  * HOF form re-scans the hash array once per bit, interpreted).
  *
  * Width matters at scale (Manku et al., WWW'07 use 64-bit): the
  * Hamming-radius band index needs band width ≥ log2(corpus/occupancy)
  * to keep candidate volume linear, and 4 bands × that width must fit in
  * the hash — see `Dedup.adaptiveSimhashBits`.
  *
  * NULL for empty/null inputs, like [[MinHashSignature]]: featureless docs
  * must not all collide on simhash 0. */
case class SimHash(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64, s"simhash width 1..64, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MinHashSignature.localMd5.get()
    val sums = new Array[Int](nBits)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var b = 0
        while (b < nBits) {
          // hex digit g = high nibble of byte g/2 when g even, low when odd
          val g = if (b < 32) b else b - 32
          val nib =
            if ((g & 1) == 0) (d(g >> 1) >> 4) & 0xf else d(g >> 1) & 0xf
          val vote = if (b < 32) nib >= 8 else (nib & 4) != 0
          sums(b) += (if (vote) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    if (!any) null
    else {
      var acc = 0L
      var b = 0
      while (b < nBits) { if (sums(b) > 0) acc |= 1L << b; b += 1 }
      acc
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def apply(features: Column, nBits: Int): Column =
    shim.column(SimHash(shim.expression(features), nBits))
}
