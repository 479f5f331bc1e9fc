package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleaving of n pre-bucketed long codes — the sort
  * key behind multi-dimensional data clustering (the layout lever behind
  * Delta/Iceberg OPTIMIZE ZORDER BY): sorting rows by the interleaved code
  * gives EVERY participating column locality ~n-th-root instead of one
  * column getting all of it, so parquet row-group min/max stats prune scans
  * filtered on ANY of the z columns.
  *
  * Inputs are bucket codes in [0, 2^bitsPerDim): callers rescale raw values
  * first ([[graft.sources.Sinks.appendZOrderedDatePartition]] does the
  * min/max rescale). bitsPerDim = 62/n so the result fits a positive long.
  * NULL in any dimension → code 0 (nulls cluster together at the low end).
  *
  * Native codegen'd expression (not a UDF): the write path at 100 TB
  * touches every row, same as a query hot loop.
  */
final case class ZOrderCode(children: Seq[Expression]) extends Expression {

  private val n = children.size
  private[functions] val bitsPerDim = 62 / math.max(1, n)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("zorder_code needs at least one column")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder_code takes LONG bucket codes, got ${children.map(_.dataType).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v != null)
        z |= ZOrderCode.spreadDim(v.asInstanceOf[Long], n, bitsPerDim) << i
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val parts = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (!${e.isNull}) {
         |  $z |= graft.functions.ZOrderCode.spreadDim(${e.value}, $n, $bitsPerDim) << $i;
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $z = 0L;
        |$parts
        |final long ${ev.value} = $z;
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode = copy(children = newChildren)
}

object ZOrderCode {
  /** Place bit j of `x` at output position j*n — called from generated
    * code, so it must stay a public static-forwardable method. Codes are
    * clamped into the dimension's bit budget. */
  def spreadDim(x: Long, n: Int, bits: Int): Long = {
    val v = if (x < 0) 0L else math.min(x, (1L << bits) - 1)
    var out = 0L
    var j = 0
    while (j < bits) {
      out |= ((v >> j) & 1L) << (j * n)
      j += 1
    }
    out
  }

  /** Column API: morton code of pre-bucketed long codes. (Named `code`,
    * not `apply` — an apply(Seq[Column]) overload would erase to the same
    * signature as the case-class constructor.) */
  def code(cols: Seq[Column]): Column =
    shim.column(ZOrderCode(cols.map(shim.expression)))
}
