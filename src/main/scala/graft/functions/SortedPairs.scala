package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native ordered-pair expansion over a SORTED distinct `array<string>`:
  * every (a, b) with a before b in the array, as
  * `array<struct<a:string, b:string>>` — exactly the
  * `flatten(transform(ts, (x, i) -> transform(slice(ts, i+2, size(ts)),
  * y -> struct(x, y))))` nest it replaces (q61's within-document
  * co-occurrence spine).
  *
  * Why native: the HOF nest runs TWO interpreted closures per output pair
  * and allocates a slice sub-array per outer element; pair generation is
  * quadratic in per-doc distinct tokens, so the per-element boxing is the
  * query (q61 measured 200 cpu-s at the 100× rung with 32 MB shuffled).
  * Here the whole pair array is one eval per row — preallocated output,
  * no closure dispatch, no slices (the [[WordShingles]] tradeoff:
  * CodegenFallback's single virtual call per row is noise next to the
  * pair volume).
  *
  * NULL array → NULL (the HOF nest propagates null; explode then drops
  * the row). NULL elements are copied through as the HOF would.
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType), StructField("b", StringType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_pairs"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val ts = v.asInstanceOf[ArrayData]
    val m = ts.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val elems = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      elems(i) = if (ts.isNullAt(i)) null else ts.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  def apply(ts: Column): Column =
    shim.column(SortedPairs(shim.expression(ts)))
}
