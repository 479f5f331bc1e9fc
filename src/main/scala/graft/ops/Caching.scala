package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache contract for COMPOSED queries.
  *
  * Leaf queries that persist an intermediate (q44's digest lineage, q126's
  * shingle frame) return a LAZY result, so they cannot unpersist before the
  * caller evaluates — Bench/Verify `clearCache()` between queries is their
  * documented contract. A COMPOSING query (q139 grading q19 against q126)
  * has no such excuse: it can evaluate its small result eagerly inside the
  * function and release every cache entry before returning. This helper
  * makes that shape explicit — persist, run, unpersist in `finally` — so no
  * cache entry outlives the query-function call (asserted in OpsEdgeSpec).
  */
object Caching {
  def withPersisted[T](dfs: DataFrame*)(f: => T): T = {
    dfs.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try f
    // blocking: with async unpersist the freed blocks linger into whatever
    // runs NEXT — in a bench sequence the next query's measurement inherits
    // this query's eviction work (q139 read 3.5x its isolated cost in the
    // r3 full-suite run). Releasing synchronously keeps the cost inside
    // the query that incurred it.
    finally dfs.foreach(_.unpersist(blocking = true))
  }
}
