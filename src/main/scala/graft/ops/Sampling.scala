package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Splits must be a pure function of the row id — never `rand()` — so they
  * are stable across runs, engines, partitionings, and re-processing of a
  * grown corpus (a doc keeps its split when new data arrives, unlike
  * modulo-on-row-number schemes). Buckets come from the md5 hex prefix of
  * the id compared lexicographically: engine-portable (no hex->int parsing
  * differences) and uniform (md5 is uniform per nibble).
  */
object Sampling {

  /** Hash bucket in [0, 256): the first two md5 hex chars of the id. */
  private def hashPrefix(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)

  /** Deterministic train/val/test assignment. Fractions are quantized to
    * /256 boundaries (md5 prefix bytes); defaults ~80/10/10. */
  def split(id: Column, trainUpper: String = "cd",
            valUpper: String = "e6"): Column = {
    val h = hashPrefix(id)
    when(h < trainUpper, "train").when(h < valUpper, "val").otherwise("test")
  }

  /** Weighted dataset mixing: keep a per-group fraction of rows,
    * deterministically (hash-bucket thresholds per group) — the "mix 30%
    * web, 60% code, 10% papers" knob of corpus assembly. Thresholds are
    * two-hex-char upper bounds (fraction ~= value/256).
    *
    * Groups ABSENT from the map are DROPPED entirely — the map is the full
    * recipe, not an override (pass "ff" to keep a group whole). */
  def mixBySource(df: DataFrame, groupCol: Column, id: Column,
                  upperByGroup: Map[String, String]): DataFrame = {
    val h = hashPrefix(id)
    val keep = upperByGroup.foldLeft(lit(false)) { case (acc, (g, upper)) =>
      acc || (groupCol === g && h < upper)
    }
    df.filter(keep)
  }

  /** Greedy token-budget selection: take rows per class in deterministic
    * hash order until the running token sum exceeds `budget` — how a
    * context-window or per-language token quota gets filled. One window
    * shuffle; the running sum is exact (long). */
  def tokenBudget(df: DataFrame, classCol: Column, id: Column,
                  tokenCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(classCol)
      .orderBy(md5(id.cast("string")).asc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(tokenCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * rank rows by key = -ln(u)/w ascending and keep the top n per group —
    * equivalent to sampling proportional to weight w without replacement.
    * The uniform u is DERIVED from md5(id) (first 12 hex digits → exact
    * 48-bit integer → (v+0.5)/16^12), not rand(), so the sample is a pure
    * function of the row id: stable across runs, engines, partitionings,
    * and corpus growth — the property corpus-assembly sampling needs.
    * Selection runs on the bounded-heap TopKPerKey operator (O(n) state
    * per group, no per-group full sort). The sort key stays raw (rounding
    * before ranking could merge near-ties differently per engine); round
    * the emitted column instead. */
  def weightedKey(id: Column, weightCol: Column): Column = {
    val v = conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(281474976710656.0) // 16^12, exact in double
    -log(u) / weightCol.cast("double")
  }

  /** Rows with NULL or non-positive weight are EXCLUDED up front (zero
    * weight = never sampled). Without the guard they would silently win:
    * NULL keys sort NULLS FIRST under Spark's asc (DuckDB ranks them
    * last — an engine-divergence trap) and negative weights produce
    * negative keys that always rank first. */
  def weightedSample(df: DataFrame, groupCol: Column, id: Column,
                     weightCol: Column, n: Int): DataFrame =
    graft.plans.TopK.perKey(
      df.filter(weightCol.isNotNull && weightCol > 0)
        .withColumn("es_key", weightedKey(id, weightCol)),
      Seq(groupCol), Seq(col("es_key").asc, id.asc), n)

  /** Stratified deterministic sample: exactly min(n, |class|) rows per
    * class, chosen by hash order (not data order) so the per-class sample
    * is unbiased w.r.t. any data attribute, stable across runs, and
    * identical in every engine. Runs on the bounded-heap TopKPerKey
    * operator (O(rows log n), O(n) state per class) rather than a
    * full-sort row_number window — same rows, no per-class sort. */
  def stratified(df: DataFrame, classCol: Column, id: Column, n: Int): DataFrame =
    graft.plans.TopK.perKey(df, Seq(classCol),
      Seq(md5(id.cast("string")).asc, id.asc), n)
}
