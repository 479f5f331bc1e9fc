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

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // last(ignoreNulls) skips LEFT rows' null struct but keeps whole right
    // rows atomic — one window expression regardless of |rightVals|
    l.unionByName(r)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++ leftCols.map(col) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r_asof"): _*)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
          rightVals.map(c => col(s"__r_asof.$c").as(s"asof_$c")): _*)
  }
}
