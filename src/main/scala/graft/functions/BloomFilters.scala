package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.graft.shim

/** Column wrappers over Spark's runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`, exposed here as a
  * first-class operator instead of an optimizer-injected one).
  *
  * Why a bloom is the right incremental-dedup primitive at 100 TB: the
  * naive "is this batch key already in the lake" check is an anti-join
  * that SHUFFLES THE LAKE'S KEYS on every increment — cost proportional
  * to the corpus, not the increment. The bloom inverts that: the lake is
  * scanned once into a fixed-size bitset (a partial-aggregated
  * `TypedImperativeAggregate`, so each map task emits one bloom and the
  * merge is bitwise-OR — nothing row-shaped ever crosses the exchange),
  * the batch probes it map-side through a codegen'd `might_contain`, and
  * only the probe-positive slice (true dups + the fp rate) ever meets
  * lake keys again — via a broadcast SEMI join that scans the lake
  * map-side with zero lake-side shuffle. False positives cost only
  * verify work; false negatives are impossible, so composed output is
  * EXACT (oracle-checkable against the plain anti-join).
  *
  * In production the bloom is a persistable artifact (a few GB for 10⁹
  * keys at 1% fp): build it when the lake closes, reuse it across
  * increments, rebuild on compaction.
  */
object BloomFilters {

  /** Aggregate a key column into one bloom-filter binary value. The key
    * is xxhash64-folded (the runtime-filter convention — the bloom's
    * internal hashing wants a long). `expectedItems` sizes the bitset
    * (~9.6 bits/key at 1% fp); exactness never depends on it. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    shim.column(new BloomFilterAggregate(
      shim.expressionEager(xxhash64(key)),
      expectedItems).toAggregateExpression())

  /** Probe: true iff `key` MIGHT be in the bloom (no false negatives).
    * `bloom` must be foldable or a scalar subquery — pass
    * `bloomFrame.scalar()` so the one-row build plan rides the plan tree
    * and executes once. */
  def mightContain(bloom: Column, key: Column): Column =
    shim.column(BloomFilterMightContain(
      shim.expressionEager(bloom),
      shim.expressionEager(xxhash64(key))))

  /** One-row frame holding the bloom of `keys(keyCol)` — the build side,
    * shaped for `.scalar()` consumption by [[mightContain]]. */
  def bloomOf(keys: DataFrame, keyCol: String, expectedItems: Long): DataFrame =
    keys.agg(bloomAgg(col(keyCol), expectedItems).as("bloom"))
}
