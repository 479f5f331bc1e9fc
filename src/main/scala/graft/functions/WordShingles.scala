package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-shingles over an array<string> of tokens: sliding windows
  * of `n` tokens joined by single spaces; empty array when the document has
  * fewer than n tokens (and for a NULL token array) — exactly the contract
  * of the `transform(sequence, i -> array_join(slice(toks, i, n)))` HOF
  * nest it replaces.
  *
  * Why native: the HOF form runs an interpreted closure per OUTPUT shingle,
  * and inside it `slice` allocates a sub-array and `array_join` re-walks
  * it — per-element boxing on the hottest text-pipeline stage (shingling
  * feeds minhash, simhash, Jaccard, decontamination). Here the whole
  * shingle array is ONE eval per row over UTF8String bytes, no per-element
  * closure dispatch. CodegenFallback's single virtual call per row is
  * noise next to the concatenations (same tradeoff as
  * [[MinHashSignature]]).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty // HOF contract: when(size(null) >= n) -> otherwise
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return empty
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        window(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(toks: Column, n: Int): Column =
    shim.column(WordShingles(shim.expression(toks), n))
}
