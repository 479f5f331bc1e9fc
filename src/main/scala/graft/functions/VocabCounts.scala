package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `vocab_counts(toks, vocab)` — exact occurrence counts of each of K
  * fixed needle strings over a token array, in ONE hashed pass:
  * `out(j) = |{ i : toks(i) = vocab(j) }|` as `array<long>` of length K.
  *
  * This is the feature extractor of the q211/q212 linear quality filter
  * (bag-of-vocab counts). The HOF form it replaces —
  * `transform(vocab, t -> size(filter(toks, tk -> tk = t)))` — rescans
  * the token array once per needle through interpreted lambda machinery
  * (HOFs never enter whole-stage codegen), which priced the 5M-doc rung
  * at ~890 µs/doc of pure feature counting. Here the vocabulary is bound
  * once as a hash map on the driver (the needle set is a plan literal —
  * the model's vocabulary, K ≤ dozens), each row is one O(|toks|) walk
  * with an O(1) probe per token, and the expression stays inside
  * whole-stage codegen via a static helper call (the
  * [[TokenClassCounts]] pattern).
  *
  * Null contract: null input array → null; null ELEMENTS count nothing
  * (the tokenizer never produces them, but SQL callers can).
  */
case class VocabCounts(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  // duplicate needles would make later duplicate slots always count 0,
  // silently diverging from the HOF form this expression documents
  // replacing — reject at construction (the SQL builder also rejects,
  // with a friendlier message)
  require(vocab.distinct.length == vocab.length,
    "vocab_counts vocab must not contain duplicate entries")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_counts requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vocab_counts"

  /** Needle → slot index; built once per task deserialization, shared by
    * every row. UTF8String keys hash/compare by bytes, so probes need no
    * String decode. */
  @transient private lazy val needles: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    // distinctness is a constructor invariant, so plain put is exact
    vocab.zipWithIndex.foreach { case (t, j) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(j))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    VocabCounts.count(input.asInstanceOf[ArrayData], needles, vocab.size)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("vocabNeedles", needles,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VocabCounts.count($c, $mapRef, ${vocab.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabCounts =
    copy(child = newChild)
}

object VocabCounts {

  /** Static so generated code calls it via the class's static forwarder. */
  def count(toks: ArrayData,
            needles: java.util.HashMap[UTF8String, Integer],
            k: Int): ArrayData = {
    val out = new Array[Long](k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val j = needles.get(toks.getUTF8String(i))
        if (j != null) out(j.intValue()) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
