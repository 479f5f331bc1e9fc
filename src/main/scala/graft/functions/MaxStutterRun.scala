package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd longest consecutive-repeat (stutter) run over an
  * `array<string>` token column — q203's per-document fold.
  *
  * The original `aggregate(toks, named_struct(...), (a, x) -> ...)` HOF is
  * semantically exactly this loop, but the interpreted lambda costs one
  * boxed closure call and a fresh 3-field struct allocation PER TOKEN —
  * q203 measured 253 cpu-s at the 100× rung with only 48 KB shuffled: the
  * whole query was that expression (the same CodegenFallback tax q142's
  * ArgMinSqDist and q182's PruneSortedPositions replaced). This walk is a
  * zero-allocation scan: one comparison and two longs of state per token.
  *
  * NULL semantics PINNED to the oracle's `lag(g) = g` (OpsEdgeSpec): plain
  * (non-null-safe) equality, so a NULL element always BREAKS a run — it
  * starts a fresh run of length 1 and the element after it also compares
  * false against it. Empty array → 0; NULL array → NULL.
  */
case class MaxStutterRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_stutter_run requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "max_stutter_run"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0L; var cur = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { cur = 1L; prev = null }
      else {
        val s = arr.getUTF8String(i)
        cur = if (prev != null && prev.equals(s)) cur + 1L else 1L
        prev = s
      }
      if (cur > best) best = cur
      i += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val cur = ctx.freshName("cur")
      val prev = ctx.freshName("prev"); val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long $best = 0L; long $cur = 0L;
         |org.apache.spark.unsafe.types.UTF8String $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $cur = 1L; $prev = null; }
         |  else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    $cur = ($prev != null && $prev.equals($s)) ? $cur + 1L : 1L;
         |    $prev = $s;
         |  }
         |  if ($cur > $best) { $best = $cur; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxStutterRun =
    copy(child = newChild)
}
