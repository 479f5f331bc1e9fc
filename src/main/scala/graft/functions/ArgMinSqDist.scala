package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd k-means ASSIGNMENT step: the centroid id minimizing the
  * exact integer squared distance Σ(x_i − c_i)², ties to the LOWEST id —
  * the same order as `min(struct(d2, cluster))`, so a relational engine
  * computing the argmin as a struct-min over exploded rows agrees exactly.
  *
  * `arg_min_sqdist(x, cents)` with `x: array<long>` and
  * `cents: array<struct<cluster: int, cq: array<long>>>` (the broadcast
  * centroid list, any order). One row's assignment is k·d subtract-
  * multiply-adds; the composable HOF form
  * (`array_min(transform(cents, c -> struct(aggregate(zip_with(...)))))`)
  * pays an interpreted lambda call PER ELEMENT — measured 10-100× slower
  * at q142's 1000× rung (2M vectors × 8 centroids × 64 dims × 3 rounds
  * never finished a 10-minute budget; this loop runs it in seconds).
  *
  * Numeric contract: exact 64-bit arithmetic; callers own overflow bounds
  * (d·m² < 2⁶³ for |x−c| ≤ m — q142's 1e-6 grid has |x−c| ≤ ~2·10⁶, so
  * d·m² ≤ 64·4·10¹² ≈ 2.6·10¹⁴ ≪ 2⁶³). NULL on an
  * empty centroid list, a length mismatch, or any null element — the
  * conservative twin of the composed form's null propagation.
  */
case class ArgMinSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okX = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okC = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == IntegerType &&
          (f1.dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okX && okC) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "arg_min_sqdist requires (array<bigint>, " +
        "array<struct<cluster: int, cq: array<bigint>>>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "arg_min_sqdist"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val k = cents.numElements()
    var found = false
    var best = 0L
    var bestC = 0
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) return null
      val c = cents.getStruct(j, 2)
      if (c.isNullAt(0) || c.isNullAt(1)) return null
      val cq = c.getArray(1)
      if (cq.numElements() != n) return null
      var d2 = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || cq.isNullAt(i)) return null
        val diff = x.getLong(i) - cq.getLong(i)
        d2 += diff * diff
        i += 1
      }
      val cl = c.getInt(0)
      if (!found || d2 < best || (d2 == best && cl < bestC)) {
        found = true; best = d2; bestC = cl
      }
      j += 1
    }
    if (found) bestC else null
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cents) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val cq = ctx.freshName("cq")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val found = ctx.freshName("found")
      val cl = ctx.freshName("cl")
      s"""
         |int $n = $x.numElements();
         |int $k = $cents.numElements();
         |boolean $found = false;
         |long $best = 0L;
         |int $bestC = 0;
         |for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |  if ($cents.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.InternalRow $c = $cents.getStruct($j, 2);
         |  if ($c.isNullAt(0) || $c.isNullAt(1)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cq = $c.getArray(1);
         |  if ($cq.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $d2 = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $cq.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $diff = $x.getLong($i) - $cq.getLong($i);
         |    $d2 += $diff * $diff;
         |  }
         |  if (${ev.isNull}) break;
         |  int $cl = $c.getInt(0);
         |  if (!$found || $d2 < $best || ($d2 == $best && $cl < $bestC)) {
         |    $found = true; $best = $d2; $bestC = $cl;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  if ($found) { ${ev.value} = $bestC; } else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinSqDist =
    copy(left = newLeft, right = newRight)
}
