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
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightVals.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++ leftCols.map(col) ++
          rightVals.map(c =>
            last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
