package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hashed_token_counts(toks, B)` — the feature-hashing twin of
  * [[VocabCounts]]: per-bucket token-occurrence counts over a fixed
  * B-bucket md5 hash, `out(j) = |{ i : bucket(toks(i)) = j }|` as
  * `array<long>` of length B.
  *
  * Bucket rule (q183's DSIR hash, extended by a modulus so B need not be
  * 256): `bucket(t) = (first md5 byte of t, unsigned) % B` — in SQL terms
  * `CAST(('0x' || substr(md5(t), 1, 2)) AS BIGINT) % B`, which DuckDB
  * replays byte-for-byte. This is the OPEN-VOCABULARY feature map for the
  * q211/q212 linear filter family: no corpus vocabulary pass, no driver
  * vocab round-trip, no top-K selection drift between training corpora —
  * the GPT-3 WebText-filter posture (LR over hashed features). The price
  * is collision noise, which q217 measures against the exact-vocab model.
  *
  * One O(|toks|) pass with one md5 per token (the same digest cost the
  * q183 SQL form pays); stays inside whole-stage codegen via a static
  * helper. Null contract: null array → null; null elements count nothing.
  */
case class HashedTokenCounts(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 1 && buckets <= 65536,
    s"hashed_token_counts buckets must be in [1, 65536], got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_token_counts requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_token_counts"

  override def nullSafeEval(input: Any): Any =
    HashedTokenCounts.count(input.asInstanceOf[ArrayData], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedTokenCounts.count($c, $buckets)")

  override protected def withNewChildInternal(
      newChild: Expression): HashedTokenCounts = copy(child = newChild)
}

object HashedTokenCounts {

  /** Static so generated code calls it via the class's static forwarder.
    * MessageDigest is not thread-safe and not free to allocate — one
    * instance per thread, reset per token. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def count(toks: ArrayData, buckets: Int): ArrayData = {
    val out = new Array[Long](buckets)
    val d = md5.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        d.reset()
        // getBytes copies the UTF-8 payload — the same bytes SQL md5 hashes
        val h = d.digest(toks.getUTF8String(i).getBytes)
        out((h(0) & 0xff) % buckets) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
