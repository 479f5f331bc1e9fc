package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by smallest-label propagation WITH pointer
  * jumping — the missing half of near-duplicate detection: pair queries
  * (q19/q44) emit EDGES, but dedup needs CLUSTERS (keep one doc per
  * component). Pure DataFrame iteration: each round every node takes the
  * min label among itself and its neighbors (propagates distance 1), then
  * compresses by taking its LABEL'S label (doubles every already-built
  * propagation path — the classic pointer-jumping / path-halving step,
  * the same mechanism as large-star compression in the published
  * MapReduce-CC algorithms). Reach grows ≥ 2r+1 per round, so
  * convergence is O(log diameter) rounds, not O(diameter): the r5
  * 10M-doc ladder rung measured the diameter-bound loop at 14 rounds /
  * 228 s (3.7× wall for 2× data over 5M) — hub-heavy dup graphs get
  * DEEPER as they grow, so the round count itself was the super-linear
  * term. Correctness is unchanged: a label is always the id of some
  * node REACHABLE from its holder (induction: neighbor-min adopts a
  * neighbor's reachable node; the jump adopts a reachable node's
  * reachable node), labels only decrease, and a no-change fixed point
  * of the combined update is in particular a neighbor-min fixed point —
  * labels constant across every edge, hence constant per component and
  * equal to the component's min id (the min node's label can never drop
  * below itself). Same exact output, fewer rounds.
  *
  * Scale shape: each round is one shuffle-join on the edge list + one
  * min-aggregate + one n-row self-join on the label key, all
  * distributed; the driver only checks a converged count, exactly how
  * Pregel-style systems iterate. Per-round frames are
  * localCheckpoint'ed, NOT merely persisted: persist caches data but the
  * LOGICAL plan still embeds every previous round (and the possibly huge
  * edge-query lineage), so analysis cost doubles per round — measured
  * ~2 s/round on a 231-edge graph before truncation, ~0.1 s after.
  * Lineage truncation per round is the standard iterative-algorithm
  * pattern (GraphX/GraphFrames checkpoint the same way).
  */
object Components {

  /** @param edges undirected edge list
    * @return (doc_id, component) for every node appearing in `edges`,
    *         component = smallest doc_id reachable (the canonical label) */
  def connectedComponents(edges: DataFrame, src: String = "doc1",
                          dst: String = "doc2",
                          maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    // persist the INPUT first: symmetrization reads it twice, and the edge
    // lineage may be an expensive query (LSH banding + verify joins).
    // e0.count() materializes it exactly once and measures the graph.
    val e0 = edges.select(col(src).as("a"), col(dst).as("b")).persist()
    val m = e0.count()
    // size the iteration's shuffles from the MEASURED edge count: label
    // propagation on a near-dup graph usually runs on a few thousand edges
    // even when the corpus is 100 TB, and session-default partition counts
    // make each tiny round pay full scheduling overhead. One partition per
    // ~500k edges, capped at the session default for billion-edge graphs.
    // The width is applied PER PLAN via explicit repartition on the loop
    // frames — never by mutating spark.sql.shuffle.partitions, which would
    // silently re-plan any concurrent query on the same session. Because
    // localCheckpoint preserves the physical outputPartitioning in its
    // LogicalRDD, partitioning BOTH checkpointed frames on the round's
    // join key (sym by "b", labels by "id" which renames to "b") makes
    // every round's join AND both aggregates satisfy their required
    // distributions from the checkpointed layout: the steady-state round
    // runs with a single parts-wide exchange (the groupBy on "a").
    val parts = math.max(1L, math.min(m / 500000L + 1,
      spark.sparkContext.defaultParallelism.toLong)).toInt
    // localCheckpoint: materialize AND truncate the plan to a LogicalRDD
    // so no round re-analyzes (or re-plans against) the edge query
    val sym = e0
      .unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(parts, col("b"))
      .distinct() // HashPartitioning(b) ⊆ {a,b} satisfies the agg — no new exchange
      .localCheckpoint()
    e0.unpersist()
    // lazy checkpoint (r11): same LogicalRDD truncation, but the
    // materialization folds into round 1's convergence-count job instead
    // of running its own — the loop is driver/scheduling-bound at small
    // graph sizes (q51 sf0.1: 2.4 s wall, 1.35 cpu-s), so jobs per round
    // are the cost model, not bytes (guide §5).
    var labels = sym.select(col("a").as("id"))
      .repartition(parts, col("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), Seq("b"))
        .repartition(parts, col("a"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nl")).as("nmin"))
      // lazy localCheckpoint (r11): the plan handed to the NEXT round is
      // still a constant-size LogicalRDD, but `half` and `next`
      // materialize inside the round's ONE convergence-count job (the
      // checkpoint-marked RDD is persisted on first compute, so the
      // pointer-jump self-join still computes `half` once) — 3 jobs per
      // round → 1. The OLD label rides along so convergence is a
      // filter+count over the checkpointed rows — not another
      // join+shuffle per round (tiny-stage rounds are dominated by
      // scheduling, so jobs per round are the cost model).
      // no repartition here: a left-outer join streams the LEFT side, so
      // the output inherits labels' HashPartitioning(id, parts) whether
      // neighborMin is broadcast or co-partitioned — the checkpoint below
      // preserves that layout for the next round's join.
      val half = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          col("label").as("old"))
        .localCheckpoint(false)
      // pointer jump: label <- label(label). Every label IS a node id (it
      // started as one and only ever adopts other nodes' ids), so the
      // lookup side covers every key; left-join defensively anyway. The
      // jump is what turns a length-d propagation chain into d/2 — the
      // neighbor-min step alone re-walks long chains one hop per round.
      val next = half
        .join(half.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"),
          col("old"))
        .localCheckpoint(false)
      val changed = next.filter(col("label") =!= col("old")).count()
      converged = changed == 0
      labels = next.select("id", "label")
      i += 1
    }
    // silent truncation would return plausible-but-WRONG labels (a long
    // chain's far end keeps a non-minimal label) — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(graph diameter exceeds maxIter); raise maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("component"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the published O(log² n)-round (O(log n) in
    * practice) alternative to label propagation, implemented for the
    * measured comparison against [[connectedComponents]]' pointer-jumping
    * loop at the 10M-doc rung (BASELINE.md records the verdict).
    *
    * Each round rewrites the EDGE LIST instead of a label table:
    *  - large-star: every node's strictly-larger neighbors re-attach to
    *    the minimum of its closed neighborhood (per-group min + join —
    *    no per-node neighbor lists materialize);
    *  - small-star: on (hi, lo)-oriented edges, every smaller neighbor
    *    and the node itself attach to the group minimum.
    * Both keep every emitted edge inside the original component (the min
    * is a member of the neighborhood), and the fixed point of the
    * combined step is a star forest rooted at component minima — so at
    * convergence the edge list IS the answer. Round cost: two
    * (groupBy + self-join + distinct) passes over the current edge list,
    * co-partitioned on the group key by construction; per-round frames
    * are localCheckpoint'ed for the same lineage-truncation reason as
    * the propagation loop.
    *
    * @return (doc_id, component) for every node in `edges`, identical
    *         contract to [[connectedComponents]]. */
  def connectedComponentsStar(edges: DataFrame, src: String = "doc1",
                              dst: String = "doc2",
                              maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col(src).as("a"), col(dst).as("b"))
      .filter(col("a") =!= col("b")).persist()
    val m = e0.count()
    val parts = math.max(1L, math.min(m / 500000L + 1,
      spark.sparkContext.defaultParallelism.toLong)).toInt
    val nodes = e0.select(col("a").as("id"))
      .unionAll(e0.select(col("b").as("id")))
      .repartition(parts, col("id")).distinct().localCheckpoint()
    // canonical (hi, lo) orientation from the start: small-star's group
    // key is the hi endpoint
    var cur = e0
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .repartition(parts, col("a")).distinct().localCheckpoint()
    e0.unpersist()
    var converged = m == 0
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR over symmetric neighborhoods: m(u) = min(N(u) ∪ {u});
      // emit (v, m(u)) for every neighbor v > u. v > u ≥ m(u) keeps the
      // (hi, lo) orientation without re-sorting the pair.
      val sym = cur.unionAll(cur.select(col("b").as("a"), col("a").as("b")))
        .repartition(parts, col("a"))
      val mins = sym.groupBy(col("a"))
        .agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      val ls = sym.join(mins, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .repartition(parts, col("a")).distinct().localCheckpoint()
      // SMALL-STAR on (hi, lo) edges: every lo-neighbor and u itself
      // attach to min(N⁻(u)); (v, m) always has v > m (m is the min).
      val mins2 = ls.groupBy(col("a")).agg(min(col("b")).as("m"))
      val ss = ls.join(mins2, Seq("a"))
        .select(col("b").as("v"), col("m"))
        .unionAll(mins2.select(col("a").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .repartition(parts, col("a")).distinct().localCheckpoint()
      // fixed point of the combined step = star forest = done. Both
      // frames are checkpointed and co-partitioned on "a", so the
      // symmetric difference plans as co-partitioned anti joins.
      converged = ss.exceptAll(cur).isEmpty && cur.exceptAll(ss).isEmpty
      cur = ss
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds; " +
        "raise maxIter")
    // at the fixed point every non-root has exactly one (node, root)
    // edge; the groupBy-min is defensive, roots label themselves
    val lbl = cur.groupBy(col("a")).agg(min(col("b")).as("component"))
      .withColumnRenamed("a", "id")
    nodes.join(lbl, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("component"), col("id")).as("component"))
  }
}
