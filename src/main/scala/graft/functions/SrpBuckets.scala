package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native multi-table SRP-LSH bucket ids: for table t in [0, tables),
  * bucket bit j (j < pn) is set iff dot(vec, sign_row(t*stride + j)) > 0.
  * Returns `array<long>` of per-table bucket ids (posexplode to band).
  *
  * Why a native expression and not the composed
  * `array(Σ_j when(vec_dot(vec, planeLit_j) > 0, 1<<j, 0), ...)` Column
  * tree: the composed form UNROLLS tables×pn 64-element dot-product loops
  * into one generated method. At the adaptive plane counts a larger
  * corpus needs (pn = 10 → 80 inlined loops) the method blows past
  * HotSpot's huge-method JIT limit and the whole stage drops to the
  * BYTECODE INTERPRETER — measured 80 cpu-s for a 20k-row banding pass
  * that takes 0.4 cpu-s compiled (≈200×), an exponential-looking cliff
  * that tracked 2^pn only because pn tracks corpus size. Here the sign
  * matrix is a plain field and the loops are ordinary JIT-friendly Scala;
  * CodegenFallback costs one virtual call per ROW, noise next to
  * tables×pn×dims flops. Same cliff story as [[MinHashSignature]].
  *
  * Exactness vs the composed form (which the DuckDB oracles inline as
  * ±1-literal dot products): the fold accumulates v(d)*s(d) left-to-right
  * in double; multiplication by ±1.0 is an exact IEEE sign flip, so
  * `acc += if (s > 0) v else -v` is bit-identical. A sign row shorter or
  * longer than the vector — vec_dot's NULL in the composed form, gated to
  * bit 0 by the `when` — contributes 0 here too. A NULL vector yields a
  * NULL bucket array (the composed form yields an all-zero array; the
  * fixtures carry no NULL embeddings and no-bands-for-no-vector is the
  * semantics a pipeline wants).
  */
case class SrpBuckets(child: Expression, signs: Seq[Seq[Int]], tables: Int,
                      pn: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(tables >= 1, s"tables must be >= 1, got $tables")
  require(pn >= 1 && pn <= stride, s"pn must be in [1, $stride], got $pn")
  require(signs.length >= tables * stride,
    s"sign layout too small: ${signs.length} < ${tables * stride}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "srp_buckets"

  @transient private lazy val rows: Array[Array[Int]] =
    signs.map(_.toArray).toArray
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var hasNull = false
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) hasNull = true
      else v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val out = new Array[Long](tables)
    if (!hasNull) {
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var j = 0
        while (j < pn) {
          val row = rows(t * stride + j)
          if (row.length == n) {
            var acc = 0.0
            var i = 0
            while (i < n) {
              acc += (if (row(i) > 0) v(i) else -v(i))
              i += 1
            }
            if (acc > 0) bucket |= (1L << j)
          }
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  def apply(vec: Column, signs: Seq[Seq[Int]], tables: Int, pn: Int,
            stride: Int): Column =
    shim.column(SrpBuckets(shim.expression(vec), signs, tables, pn, stride))
}
