package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-style pre-tokenizer token metering in ONE native pass — the counts
  * q27 derives with four separate `regexp_extract_all` calls:
  *
  *   n_word_tokens   = #matches of `[A-Za-z]+`     (maximal letter runs)
  *   n_number_tokens = #matches of `[0-9]+`        (maximal digit runs)
  *   n_other_tokens  = #matches of `[^A-Za-z0-9\s]` (one per code point)
  *   n_bpe_tokens    = #matches of the 3-way alternation = the sum
  *
  * The regex form MATERIALIZES four arrays of match strings per row just
  * to take their sizes — at 100 TB the pre-tokenizer meter runs on every
  * document, so four regex scans + four throwaway arrays per row is the
  * difference between a metering pass and a second copy of the corpus in
  * allocation traffic. This expression counts all four classes in a
  * single byte loop, no regex, no arrays, inside whole-stage codegen.
  *
  * Exactness on any well-formed UTF-8 input (all counts are per CODE
  * POINT, which Java regex also iterates): ASCII letter/digit runs are
  * delimited by any non-class byte (multibyte lead bytes included —
  * continuation bytes can never be mistaken for ASCII since they are all
  * ≥ 0x80). Java's default `\s` is ASCII-only `[ \t\n\x0B\f\r]`, so every
  * non-ASCII code point (U+00A0 included) counts as "other" — counted
  * here once per lead byte; continuation bytes are skipped.
  */
case class TokenClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_class_counts requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = TokenClassCounts.schema
  override def prettyName: String = "token_class_counts"

  override def nullSafeEval(input: Any): Any =
    TokenClassCounts.count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenClassCounts.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenClassCounts =
    copy(child = newChild)
}

object TokenClassCounts {

  val schema: StructType = StructType(Seq(
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_word_tokens", LongType, nullable = false),
    StructField("n_number_tokens", LongType, nullable = false),
    StructField("n_other_tokens", LongType, nullable = false)))

  /** Static so generated code calls it via the class's static forwarder. */
  def count(input: UTF8String): InternalRow = {
    val bytes = input.getBytes
    var words = 0L; var numbers = 0L; var others = 0L
    var inLetter = false; var inDigit = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        if (!inLetter) words += 1
        inLetter = true; inDigit = false
      } else if (b >= '0' && b <= '9') {
        if (!inDigit) numbers += 1
        inDigit = true; inLetter = false
      } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
                 b == '\f' || b == '\r') {
        inLetter = false; inDigit = false
      } else if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of an already-counted code point
      } else {
        // ASCII punctuation/control outside \s, or a multibyte lead byte:
        // one "other" code point either way
        others += 1
        inLetter = false; inDigit = false
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](words + numbers + others, words, numbers, others))
  }

  def apply(text: Column): Column =
    shim.column(TokenClassCounts(shim.expression(text)))
}
