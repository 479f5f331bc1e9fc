package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.ts <= left.ts` in the same key group — the point-in-time lookup
  * (latest price before a trade, last purchase before a click) that plain
  * equi-joins can't express and naive range joins explode into
  * per-key cross products.
  *
  * Spark has no native as-of operator, so per the custom-operator ladder
  * (compose > custom Expression > custom plan) this composes existing ops:
  * tag both sides, union, and carry right-side values forward with
  * `last(..., ignoreNulls)` over a (key)-partitioned window ordered by
  * `(ts, side)` — right rows at an equal timestamp sort before left rows,
  * giving exactly the `<=` as-of semantic. Cost: ONE shuffle on the key
  * (the window sort), linear in |left| + |right|; no range cross-product
  * ever materializes, which is what makes it safe at 100 TB where a hot
  * key's naive range join would be quadratic.
  *
  * Right rows must be unique per (keys, ts) for a well-defined result
  * (dedupe upstream — true as-of sources like price ticks are).
  *
  * NULL semantics: all `rightVals` are carried as ONE struct, so every
  * `asof_*` column of a left row comes from the SAME matched right row —
  * if that row has NULL in a value column, the output has NULL there too.
  * (Carrying each column independently with last(ignoreNulls) would
  * back-fill a NULL column from an OLDER right row while the others came
  * from the newer one: a torn result mixing two right rows.)
  */
object AsofJoin {

  /** `tolerance`: pandas merge_asof semantics — the matched (most recent
    * `<=`) right row must additionally lie within `left.ts - right.ts <=
    * tolerance`, else the left row gets NULLs. No fallback to an even
    * older in-window row exists BY DEFINITION (the matched row is already
    * the newest candidate). Units: microseconds for a TimestampType
    * `tsCol`, the column's own units for integral `tsCol`s. The gate is a
    * post-window projection — same one-shuffle plan as the untolerated
    * join. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightVals: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)) :+
        right.schema(tsCol).copy(name = "__rts"))
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col) :+ col(tsCol).as("__rts"): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // micros for timestamps (both variants), raw value for integral time
    // axes. Everything else is REJECTED when a tolerance is set: the old
    // cast("long") fallback silently turned a DateType axis into DAYS (a
    // microsecond tolerance then gates nothing) and failed at analysis
    // time for exotic types — both divergences from the documented
    // micros-or-integral contract. TIMESTAMP_NTZ is linearized zone-free
    // via timestampdiff(MICROSECOND, epoch, c), which operates on the
    // local datetime directly — no session-timezone or DST rule touches
    // the arithmetic, so differences are exact micros.
    def asUnits(c: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.types._
      left.schema(tsCol).dataType match {
        case TimestampType => unix_micros(c)
        case TimestampNTZType =>
          timestamp_diff("MICROSECOND",
            lit("1970-01-01 00:00:00").cast(TimestampNTZType), c)
        case ByteType | ShortType | IntegerType | LongType => c.cast("long")
        case other => throw new IllegalArgumentException(
          s"asofJoin tolerance requires a TIMESTAMP, TIMESTAMP_NTZ or " +
            s"integral ts column; '$tsCol' is $other — cast it upstream " +
            s"(tolerance units would be undefined)")
      }
    }
    val matched = tolerance match {
      case None => col("__r_asof")
      case Some(tol) => when(
        asUnits(col(tsCol)) - asUnits(col("__r_asof.__rts")) <= tol,
        col("__r_asof")) // NULL ts (no match) fails the predicate -> NULL
    }
    // last(ignoreNulls) skips LEFT rows' null struct but keeps whole right
    // rows atomic — one window expression regardless of |rightVals|
    l.unionByName(r)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++ leftCols.map(col) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r_asof"): _*)
      .filter(col("__side") === 1)
      .withColumn("__r_asof", matched)
      .select(
        keys.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
          rightVals.map(c => col(s"__r_asof.$c").as(s"asof_$c")): _*)
  }
}
