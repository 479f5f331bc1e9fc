package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (sketch) aggregates — the constant-memory substitutes a
  * 100 TB profile job uses where exact answers would need unbounded state:
  * HyperLogLog++ for distinct counts (KB of state vs a distinct shuffle of
  * every value) and the approx-percentile sketch for quantiles (vs a full
  * sort). Both are Spark built-ins, mergeable across partitions, and
  * map-side combined like any aggregate.
  *
  * Sketch internals differ engine to engine, so these carry NO DuckDB
  * oracle; SketchesSpec pins them against exact answers within their error
  * bounds on the fixtures instead.
  */
object Sketches {

  /** Distinct count per group via HLL++ (relative std deviation `rsd`). */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"${valueCol}_approx_nd"))

  /** Quantiles per group via the approx_percentile sketch; `accuracy` is
    * the standard 1/eps knob (10000 => ~0.01% rank error). */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsCol = array(probs.map(lit): _*)
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), probsCol, lit(accuracy))
        .as(s"${valueCol}_quantiles"))
  }

  /** Heavy hitters in two bounded passes: pass 1 is Spark's
    * Karp–Papadimitriou–Shenker frequent-items sketch (`stat.freqItems`) —
    * one scan, O(1/support) state per partition, mergeable, may emit false
    * positives but NEVER drops an item with frequency > support·n; pass 2
    * counts ONLY the ≤ 1/support candidates exactly (broadcast IN-filter,
    * map-side combined) and keeps the top k. Reported counts are exact
    * (unlike count-min estimates); the sketch only decides candidacy.
    * The candidate list collected to the driver is ≤ 1/support items BY
    * CONSTRUCTION — same bounded-collect justification as IVF centroids.
    * The full-vocabulary wordcount shuffle never happens: the second pass
    * aggregates a vocabulary of at most 1/support. */
  def frequentItems(df: DataFrame, valueCol: String, k: Int,
                    support: Double = 0.01): DataFrame = {
    require(support > 0 && support < 1, s"support in (0,1), got $support")
    val candidates = df.stat.freqItems(Seq(valueCol), support)
      .collect()(0).getSeq[Any](0)
    df.select(col(valueCol).as("item"))
      .filter(col("item").isInCollection(candidates))
      .groupBy("item").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item").asc)
      .limit(k)
  }

  /** Per-partition Misra-Gries heavy-hitter CANDIDATES (≤ k distinct
    * values per partition, deduplicated across partitions). Guarantee:
    * any value with partition count > n_p/(k+1) survives that partition's
    * summary, so by pigeonhole the union is a SUPERSET of every value
    * with GLOBAL count > n/k — an exact recount of the candidates (a
    * bounded broadcast) then yields provably exact heavy hitters with no
    * full value-frequency shuffle. The sketch state is imperative, which
    * is why this is a mapPartitions and not a Column expression. */
  def misraGriesCandidates(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("string")).as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < k => counters(t) = 1L
          case None => // decrement-all: the classic MG eviction step
            val dead = List.newBuilder[String]
            counters.foreach { case (tk, c) =>
              if (c == 1L) dead += tk else counters(tk) = c - 1
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF(valueCol).distinct()
  }
}
