package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native MinHash signature over an array<string> of shingles.
  *
  * signature[i] = min over shingles of (h1 + i*h2) mod P, where (h1, h2)
  * are the first two 48-bit halves of md5(shingle) — the Kirsch–
  * Mitzenmacher double-hashing construction (k permutation-analogs from
  * ONE digest per shingle).
  *
  * Why a native expression and not higher-order functions: the HOF form
  * evaluates an interpreted, boxing closure per (shingle x seed) — measured
  * to dominate the dedup queries — and a HOF Kirsch–Mitzenmacher variant
  * was measured SLOWER still (struct materialization + per-element
  * getField). Here the whole signature is one compiled eval per row:
  * n digests, k*n integer ops, zero allocation beyond the output array.
  * CodegenFallback costs one virtual call per ROW (not per element), which
  * is noise next to the md5 work.
  *
  * Engine-portable: 48-bit halves keep h1 + (k-1)*h2 < 2^53 for k <= 32
  * (enforced), exact in any integer or double engine; the DuckDB oracle
  * reproduces it with
  * ('0x' || substr(md5(x), 1|13, 12))::BIGINT arithmetic. Empty or null
  * shingle arrays yield NULL (so downstream band keys go NULL and
  * shingle-less docs never pair — same as the oracle's list_min([]) ->
  * NULL propagation).
  */
case class MinHashSignature(child: Expression, k: Int, p: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private def half(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 40) | ((d(off + 1) & 0xffL) << 32) |
      ((d(off + 2) & 0xffL) << 24) | ((d(off + 3) & 0xffL) << 16) |
      ((d(off + 4) & 0xffL) << 8) | (d(off + 5) & 0xffL)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MinHashSignature.localMd5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val d = md.digest(arr.getUTF8String(j).getBytes)
        val h1 = half(d, 0)
        val h2 = half(d, 6)
        var i = 0
        while (i < k) {
          val v = (h1 + i * h2) % p
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val P: Long = 1000000007L

  /** Exactness bound: h1 + (k-1)*h2 with 48-bit halves stays < 2^53 (safe
    * even for an oracle computing in doubles) only for k <= 32. */
  val MaxK: Int = 32

  /** Per-thread digest: getInstance per row was measurable on the dedup
    * hot path, and a shared instance is not thread-safe (local mode can
    * evaluate one expression instance from several task threads). */
  private[functions] val localMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def apply(shingles: Column, k: Int): Column = {
    require(k >= 1 && k <= MaxK, s"minhash k must be in [1, $MaxK], got $k")
    shim.column(MinHashSignature(shim.expression(shingles), k, P))
  }
}
