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
  * bit j is set iff sum over features of (+1 if md5-hex-digit j >= 8
  * else -1) is positive — the same md5-nibble formula as the HOF
  * `Dedup.simhashFromHashes` and the DuckDB oracle, but ONE digest and
  * nBits integer ops per feature in a single compiled eval per row (the
  * HOF form re-scans the hash array once per bit, interpreted).
  *
  * NULL for empty/null inputs, like [[MinHashSignature]]: featureless docs
  * must not all collide on simhash 0. */
case class SimHash(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 32, s"simhash width 1..32, got $nBits")

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
          // hex digit b = high nibble of byte b/2 when b even, low when odd
          val nib =
            if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
          sums(b) += (if (nib >= 8) 1 else -1)
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
