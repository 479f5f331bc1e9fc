package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by smallest-label propagation — the missing half
  * of near-duplicate detection: pair queries (q19/q44) emit EDGES, but
  * dedup needs CLUSTERS (keep one doc per component). Pure DataFrame
  * iteration: each round every node takes the min label among itself and
  * its neighbors; converges in O(component diameter) rounds (near-dup
  * components are shallow — a handful of rounds in practice).
  *
  * Scale shape: each round is one shuffle-join on the edge list + one
  * min-aggregate, all distributed; the driver only checks the converged
  * flag (a count), exactly how Pregel-style systems iterate. Labels are
  * persisted per round and the previous round unpersisted, so lineage
  * stays O(1) deep instead of growing with iterations (at 100 TB an
  * unbounded lineage chain would recompute every prior round — or
  * blow the planner).
  */
object Components {

  /** @param edges undirected edge list
    * @return (doc_id, component) for every node appearing in `edges`,
    *         component = smallest doc_id reachable (the canonical label) */
  def connectedComponents(edges: DataFrame, src: String = "doc1",
                          dst: String = "doc2",
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionAll(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist()
      converged = next
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .filter(col("label") =!= col("old"))
        .isEmpty
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("component"))
  }
}
