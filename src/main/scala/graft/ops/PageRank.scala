package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected edge list, in EXACT integer
  * arithmetic so two engines agree bit-for-bit.
  *
  * Ranks live in integer units of 1e-9 (init 1.0 ≡ 1e9); each round is
  *   r'(v) = 0.15 + 0.85 · Σ_{u∼v} ⌊r(u) / deg(u)⌋
  * with the damping applied as `(85 · Σ) DIV 100` — floor quantization is
  * part of the CONTRACT (both engines compute the identical recurrence),
  * not an approximation layered on a float algorithm. This is the
  * per-node-teleport formulation (ranks sum ≈ N, not 1): the natural one
  * for "which documents are template hubs" scoring on a near-dup graph,
  * where the absolute scale is irrelevant and N never needs broadcasting.
  *
  * Scale design: the rank/degree state is one row per NODE and every
  * iteration is one contribution shuffle (edges join ranks on src, sum by
  * dst) — the textbook distributed PR data layout. The symmetrized edge
  * list with degrees is persisted once; a fixed iteration count keeps the
  * lineage bounded (each round chains two joins), so no checkpointing is
  * needed at 3-5 rounds — iterate further on a real cluster and you'd
  * localCheckpoint every ~10 rounds like Components does.
  *
  * Dangling nodes cannot exist here (symmetrization gives every node
  * deg ≥ 1), so no dangling-mass redistribution term is needed.
  */
object PageRank {

  private val Unit9 = 1000000000L

  /** (node, degree, rank_units, rank) after `iters` rounds. */
  def pageRank(edges: DataFrame, iters: Int = 3,
               src: String = "doc1", dst: String = "doc2"): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val e0 = edges.select(col(src).as("a"), col(dst).as("b"))
    // symmetrize by EXPLODING both directions out of one row, not
    // unionAll(e0, swap(e0)) (r11): the union's two branches each re-ran
    // the whole edge-producing lineage (for q141 that is the LSH banding
    // + verify pipeline — the query's entire cost, paid twice to fill
    // this cache). One explode pass computes it once. The cache is
    // hash-partitioned on the contribution join key so every round's
    // edge⋈rank join, the degree aggregate, and the rank'⋈deg join all
    // satisfy their distributions from the cached layout — the
    // steady-state round runs with a single exchange (the Σ-by-dst).
    val sym = e0.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .repartition(col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = sym.join(deg, Seq("a"))
    var ranks = deg.select(col("a").as("node"), lit(Unit9).as("r"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks, adj("a") === ranks("node"))
        .select(col("b"), expr("r DIV deg").as("c"))
        .groupBy(col("b")).agg(sum(col("c")).as("cs"))
      ranks = deg.select(col("a").as("node"))
        .join(contrib, col("node") === contrib("b"), "left")
        .select(col("node"),
          (lit(Unit9 * 15 / 100) + expr("(85 * coalesce(cs, 0L)) DIV 100"))
            .as("r"))
    }
    ranks.join(deg, ranks("node") === deg("a"))
      .select(col("node"), col("deg").as("degree"),
        col("r").as("rank_units"),
        round(col("r").cast("double") / 1e9, 6).as("rank"))
  }
}
