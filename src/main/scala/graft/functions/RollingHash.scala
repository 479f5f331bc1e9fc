package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's BYTES: h = fold(h*31 + byte) mod m
  * — the document fingerprint primitive (content-defined chunking, shift-
  * resistant signatures). One eval per row over the UTF8String's byte
  * array; the HOF form (`aggregate(transform(sequence(1, length),
  * i -> ascii(substr(text, i, 1))), ...)`) ran TWO interpreted closures
  * per character plus a per-character substr, and substr on UTF8String
  * seeks from the start — quadratic on long non-ASCII text.
  *
  * Byte semantics: for ASCII text (the fixtures, and the oracle's
  * `ascii()` per character) byte == codepoint, so results are identical to
  * the HOF/oracle form; for multi-byte UTF-8 this hashes the encoded
  * bytes, which is the standard choice for content fingerprints. */
case class RollingHash(child: Expression, mod: Long)
    extends UnaryExpression with CodegenFallback {
  require(mod > 1, s"modulus must be > 1, got $mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(text: Column, mod: Long = 1000000007L): Column =
    shim.column(RollingHash(shim.expression(text), mod))
}
