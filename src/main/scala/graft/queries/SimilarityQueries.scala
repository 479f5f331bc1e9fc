package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` fixture: brute-force cosine
  * top-k (baseline) and signed-random-projection LSH ANN (scale path).
  * Cosines are bit-identical across engines (fixed-order double folds).
  */
object SimilarityQueries {

  private val nQueries = 8
  private val tables = 8
  private val dims = 64
  // Fixed-stride sign layout: table t owns rows [t*12, t*12+12); the
  // ADAPTIVE plane count pn (Similarity.adaptivePlanes, a pure integer
  // function of corpus COUNT) decides how many of each table's rows are
  // live. The stride keeps the literal matrix — and the oracle SQL that
  // inlines it — shape-stable while bucket granularity tracks scale.
  private lazy val signs =
    Similarity.hyperplaneSigns(tables * Similarity.MaxPlanesPerTable, dims)

  /** Corpus-adaptive SRP plane count for this dir's embeddings table.
    * One driver-side count-star (parquet footer metadata) per query build
    * — same posture as q29's driver-side centroid collect. */
  private def pnOf(spark: SparkSession, dir: String): Int =
    Similarity.adaptivePlanes(Tables.embeddings(spark, dir).count())

  /** (vec_id, tbl, bucket) banded frame over the adaptive layout. */
  private def bandedOf(df: DataFrame, pn: Int): DataFrame = df
    .select(col("vec_id"),
      posexplode(Similarity.srpBucketsAdaptive(col("embedding"), signs, tables, pn)))
    .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))

  /** OOM guard for the statically-hinted candidate fetch-back broadcast
    * (q23/q185). The "~32 adaptive bucket occupancy" bound that justifies
    * the static `broadcast()` is an AVERAGE-case property, not structural:
    * a duplicate-heavy or skewed corpus concentrates buckets and the
    * candidate frame (each row carrying a 64-float query vector)
    * degenerates toward nQueries × N rows — the static hint would then be
    * a driver/executor OOM instead of AQE's late-conversion shuffle tax.
    * So before taking the hint, compute the EXACT pre-distinct candidate
    * count: Σ over probe rows of corpus bucket occupancy — one
    * map-side-combined count agg over the banded frame (shuffles only
    * #distinct-bucket rows ≈ N/32, never a vector) joined to the
    * broadcast probe list. Above the threshold the caller falls back to
    * the unhinted join and AQE sizes it from runtime stats: the slow path
    * is a slowdown, the fast path misapplied is a cliff. */
  private def candFitsBroadcast(spark: SparkSession, banded: DataFrame,
      probes: DataFrame): Boolean = {
    val limit = spark.conf.getOption("spark.graft.ann.broadcastCandLimit")
      .map(_.toLong).getOrElse(1000000L)
    val r = banded.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("occ"))
      .join(broadcast(probes.select(col("tbl"), col("bucket"))),
        Seq("tbl", "bucket"))
      .agg(sum(col("occ"))).head()
    val bound = if (r.isNullAt(0)) 0L else r.getLong(0)
    bound <= limit
  }

  /** Apply the static fetch-back build-side hint only when
    * [[candFitsBroadcast]] proved the frame bounded. */
  private def hintIfBounded(df: DataFrame, bounded: Boolean): DataFrame =
    if (bounded) broadcast(df) else df

  /** The oracle-side twin of [[Similarity.adaptivePlanes]]: a CTE named
    * `pn` computing the identical integer (bit-length CASE ladder over
    * m = (COUNT(*)-1)//32, clamped to [3, 24]) — no floating log2, so
    * both engines agree exactly. */
  private def pnCte(table: String): String = {
    val ladder = (24 to 4 by -1)
      .map(k => s"WHEN m >= ${1L << (k - 1)} THEN $k")
      .grouped(2).map(_.mkString(" ")).mkString("\n       ")
    s"""pn AS (SELECT LEAST(24, GREATEST(3,
       |  CASE $ladder
       |       ELSE 3 END)) AS pn
       |  FROM (SELECT (COUNT(*) - 1) // 32 AS m FROM $table))""".stripMargin
  }

  /** Brute-force top-5 cosine neighbors for the first 8 query vectors.
    * The query side is broadcast: the corpus never shuffles, the cross
    * product is a narrow map, and the windowed top-k keeps only k rows per
    * query per partition before the final tiny shuffle. */
  def q22CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cos = Similarity.cosine(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("neighbor_id").asc)
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"), cos.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("neighbor_id"), round(col("cs"), 6).as("cos"), col("rn"))
  }

  /** ANN via multi-table SRP-LSH (AND-then-OR amplification): per-row
    * bucket ids for `tables` coarse tables (no shuffle), candidates =
    * vectors sharing a bucket in ANY table, then exact cosine top-3 per
    * query over candidates only. At scale the per-table bucket join is an
    * equi-join on (table, bucket) that Catalyst shuffle-hashes; the
    * brute-force cross join never happens, and table/plane counts tune the
    * recall/candidate-volume tradeoff. */
  def q23AnnSrp(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val banded = bandedOf(emb, pnOf(spark, dir))
    val qb = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
    val cand = banded.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"))
      .distinct()
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cos = Similarity.cosine(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("neighbor_id").asc)
    // static build-side hint: same rationale (and same measured 407 MB
    // corpus shuffle before AQE's late conversion) as q185 below — the
    // candidate set is bounded by nQueries × tables × adaptive occupancy
    // ON AVERAGE, so the hint is gated on a measured occupancy check
    // (candFitsBroadcast) and degrades to the AQE path on skewed corpora.
    hintIfBounded(cand.join(broadcast(q), Seq("qid")),
      candFitsBroadcast(spark, banded, qb))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
      .select(col("qid"), col("neighbor_id"), cos.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("neighbor_id"), round(col("cs"), 6).as("cos"), col("rn"))
  }

  /** q185: MULTI-PROBE SRP ANN — q23's recall knob turned the cheap way
    * (Lv et al., "Multi-Probe LSH", VLDB 2007): each query probes its own
    * bucket PLUS every 1-bit-flip of it (`pn` flips per table — the
    * nearest-miss buckets, since one flipped hyperplane sign is the most
    * likely way a true neighbor lands elsewhere). Recall rises like adding
    * ~pn extra hash tables, but the CORPUS side is untouched: the banded
    * index is built once, stored once, and the only growth is the
    * query-side probe list ((1+pn)·tables rows per query — broadcast, so
    * the candidate equi-join's build side stays trivially small). At
    * 100 TB that is the difference between re-indexing the corpus to add
    * tables and re-running only the probe generation: the index is the
    * expensive artifact, probes are free. `n_cand` (exact per-query
    * candidate count) is emitted next to the top-3 so the recall/cost
    * trade is measured IN the query — compare against q23's candidate
    * volume on the same corpus before turning the knob in production. */
  def q185MultiprobeAnn(spark: SparkSession, dir: String): DataFrame = {
    val pn = pnOf(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val banded = bandedOf(emb, pn)
    // probe list per (query, table): own bucket, then each 1-bit flip.
    // pn is a driver-side int, so the flip set unrolls to literals — a
    // narrow map on the tiny query slice, never a join.
    val probes = array((col("bucket") +: (0 until pn).map(j =>
      col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val qp = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("tbl"), explode(probes).as("bucket"))
    val cand = banded.join(broadcast(qp), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"))
      .distinct()
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cos = Similarity.cosine(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("neighbor_id").asc)
    // the fetch-back join must BUILD on the candidate side STATICALLY:
    // letting AQE discover it means the planner first lays out a shuffle
    // join and materializes the corpus-side map stage before converting —
    // measured 407 MB of embeddings shuffled at the 1000x rung for a 61k-
    // row candidate set. Candidates are bounded by design (nQueries ×
    // tables × (1+pn) probes × ~32 adaptive bucket occupancy — log-growth
    // in corpus size) ON AVERAGE; the hint is gated on candFitsBroadcast's
    // exact occupancy measurement so a skewed corpus degrades to the AQE
    // path instead of OOMing the build side.
    hintIfBounded(cand
      .withColumn("n_cand", count(lit(1)).over(Window.partitionBy(col("qid"))))
      .join(broadcast(q), Seq("qid")),
      candFitsBroadcast(spark, banded, qp))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
      .select(col("qid"), col("n_cand"), col("neighbor_id"), cos.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("n_cand"), col("neighbor_id"),
        round(col("cs"), 6).as("cos"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector twin of MinHash
    * dedup (q19/q20): SRP-LSH candidate pairs (vectors sharing a bucket in
    * ANY table, vec_id1 < vec_id2), then exact cosine >= threshold on
    * candidates only. At 100 TB the candidate join is an equi-join on
    * (table, bucket) — the all-pairs cross join never materializes, and the
    * same banded frame feeds both sides so the corpus is scanned once. */
  def q28CosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val banded = bandedOf(emb, pnOf(spark, dir))
    // A pair colliding in several tables appears several times. Deduping
    // 4M candidate rows BEFORE scoring is the naive order — that distinct
    // is the query's only large exchange. The codegen'd cosine is cheaper
    // than the shuffle, so score the duplicated stream (map-side: the
    // embedding joins broadcast) and dedupe only the tiny >=threshold
    // survivor set.
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    // norms once per VECTOR (2k rows), not per pair (millions):
    // cosine = dot/sqrt(n1*n2) is the identical double expression, the
    // factors are just computed where they're cheap
    def withNorm(idAs: String, eAs: String, nAs: String) =
      broadcast(emb.select(col("vec_id").as(idAs), col("embedding").as(eAs),
        Similarity.dot(col("embedding"), col("embedding")).as(nAs)))
    val cos = Similarity.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2"))
    pairs
      .join(withNorm("id1", "e1", "n1"), Seq("id1"))
      .join(withNorm("id2", "e2", "n2"), Seq("id2"))
      .select(col("id1"), col("id2"), cos.as("cs"))
      .filter(col("cs") >= 0.3)
      .select(col("id1"), col("id2"), round(col("cs"), 6).as("cos"))
      .distinct()
  }

  private val kCentroids = 8
  private val nProbe = 2

  /** ANN via IVF (inverted-file) cells — the second scale path next to
    * SRP-LSH. The coarse quantizer is TRAINED: q142's `kmeansRounds`
    * Lloyd rounds over the corpus (seeded by the first `kCentroids`
    * vectors, bit-exact integer recurrence), whose round-3 centroid means
    * are collected driver-side — an IVF index's centroid table is tiny by
    * design (k·d values) — and inlined as literals, so CELL ASSIGNMENT IS
    * A PURE NARROW MAP: no shuffle, and at 100 TB `cell` becomes the
    * partition key the candidate join prunes on. Queries probe their
    * `nProbe` nearest cells; exact cosine top-3 runs over candidates
    * only. (The training pass is the index-build cost — paid once per
    * corpus, amortized over every query against the index; the oracle
    * replays the identical integer recurrence so the composition stays
    * hash-exact.) */
  def q29AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    // conf'd probe width (`spark.graft.ann.nProbe`, default 2): the
    // recall/cost dial — probing n nearest coarse cells reuses the SAME
    // broadcast centroid frame and adds no exchange, only candidate
    // volume. The oracle is built for the default; Verify fails fast on
    // a non-default setting (a Bench-ladder knob), and q188's audit
    // carries the measured recall at nProbe ∈ {1, 2, 4} so the dial is
    // turned on evidence, not hope.
    val np = spark.conf.getOption("spark.graft.ann.nProbe")
      .map(_.toInt).getOrElse(nProbe)
    require(np >= 1 && np <= kCentroids,
      s"spark.graft.ann.nProbe must be in [1, $kCentroids], got $np")
    ivfTopK(spark, dir, ivfCentroids(spark, dir), np)
  }

  /** The trained coarse quantizer: q142 round-3 centroids, exact integer
    * c_units -> the SAME double (c_units / 1e6) the oracle computes.
    * Collected driver-side — an IVF centroid table is k·d values by
    * design. */
  private[graft] def ivfCentroids(spark: SparkSession,
                                  dir: String): Array[(Int, Array[Double])] = {
    val (kmeansFrame, releaseKmeans) = kmeansItersWithRelease(spark, dir)
    val rows =
      try kmeansFrame.select(col("cluster"), col("dim"), col("c_units")).collect()
      finally releaseKmeans() // collected eagerly; the pinned state is spent
    rows
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2) / 1e6).toArray)
      }
      .toArray
      .sortBy(_._1)
  }

  /** IVF cell-probe top-3 against a given centroid table at a given probe
    * width — q29's engine, parameterized so q188 can audit several probe
    * widths over ONE training pass. */
  /** Per-row scored IVF cells: array of struct(-cs, cid), ranked by
    * (cs desc, cid asc) via lexicographic sort — element 1 is the
    * assignment cell, the first `np` are the probe list. Shared by
    * [[ivfTopK]] (float scoring) and [[q214IvfSq8]] (sq8 scoring over
    * the same coarse quantizer). */
  private def rankedCells(centroids: Array[(Int, Array[Double])])
                         (vec: Column): Column =
    Similarity.rankedIvfCells(centroids)(vec)

  private[graft] def ivfTopK(spark: SparkSession, dir: String,
                             centroids: Array[(Int, Array[Double])],
                             np: Int): DataFrame =
    ivfTopKFrom(spark, dir, ivfAssigned(spark, dir, centroids), centroids, np)

  /** The np-INDEPENDENT cell-assignment frame (vec_id, embedding, cell) —
    * split out so q188 can compute it once and share it across its three
    * probe-width arms instead of re-ranking every corpus vector per arm. */
  private def ivfAssigned(spark: SparkSession, dir: String,
                          centroids: Array[(Int, Array[Double])]): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"),
      element_at(rankedCells(centroids)(col("embedding")), 1)
        .getField("cid").as("cell"))

  private def ivfTopKFrom(spark: SparkSession, dir: String,
                          assigned: DataFrame,
                          centroids: Array[(Int, Array[Double])],
                          np: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    def rankedCellsV(vec: Column) = rankedCells(centroids)(vec)
    val qprobe = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(slice(rankedCellsV(col("embedding")), 1, np)).as("pc"))
      .select(col("qid"), col("qe"), col("pc.cid").as("cell"))
    val cos = Similarity.cosine(col("qe"), col("embedding"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("neighbor_id").asc)
    assigned.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"), cos.as("cs"))
      .dropDuplicates("qid", "neighbor_id") // 2 probed cells can overlap
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("neighbor_id"), round(col("cs"), 6).as("cos"), col("rn"))
  }

  /** The (qid, neighbor_id) candidate set of the SRP arm, single- or
    * multi-probe — q23/q185's candidate construction exposed so the
    * recall audit's structural claim (single-probe candidates ⊆
    * multi-probe candidates: the probe list only ever GROWS by the 1-bit
    * flips) is pinned as a set inclusion in OpsEdgeSpec, not inferred
    * from aggregate counts. */
  private[graft] def srpCandidateSet(spark: SparkSession, dir: String,
      multiProbe: Boolean): DataFrame = {
    val pn = pnOf(spark, dir)
    val banded = bandedOf(Tables.embeddings(spark, dir), pn)
    val probes =
      if (!multiProbe) array(col("bucket"))
      else array((col("bucket") +: (0 until pn).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val qp = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("tbl"), explode(probes).as("bucket"))
    banded.join(broadcast(qp), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"))
      .distinct()
  }

  /** q188: ANN recall audit — the q139 pattern (grade the approximation
    * against in-suite exact ground truth) applied to the vector arms:
    * each approximate method's top-3 (q23 single-probe SRP, q185
    * multi-probe SRP, q29 trained-IVF) graded against q22's exact top-3,
    * per query. Because every method re-ranks its candidates with the
    * EXACT cosine under the same (cs desc, id asc) order, a true top-3
    * member inside a candidate set always surfaces in that method's
    * top-3 (at most two vectors order before it globally) — so the
    * output overlap measured here IS candidate recall@3: auditing
    * outputs audits the candidate sets. This is the number the probe
    * (q185) and nProbe (q29) knobs buy; compare rows before turning
    * either in production. Cost shape: the exact arm is the audit's
    * price — linear (8 fixed queries × corpus) and embarrassingly
    * map-parallel; the audit joins are 8-row frames. All outputs are
    * exact integers (hit counts, ppm via non-negative DIV). */
  def q188AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    // exact ground truth: ≤ 8×3 rows, referenced by the spine and all
    // five audit arms — localCheckpoint (r10) materializes it once and
    // flattens it to a leaf, where the lazy form re-ran the brute-force
    // corpus scan per reference (6 of the plan's 52 parquet scans)
    val exact = q22CosineTopK(spark, dir).filter(col("rn") <= 3)
      .select(col("qid"), col("neighbor_id")).localCheckpoint()
    def hits(df: DataFrame, as: String): DataFrame =
      df.filter(col("rn") <= 3).select(col("qid"), col("neighbor_id"))
        .join(exact, Seq("qid", "neighbor_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as(as))
    // ONE training pass feeds all three IVF probe widths — the audit
    // prices the nProbe dial (candidates scale with probed cells; the
    // centroid frame and plan shape are identical) — and (r10) ONE
    // cell-assignment pass feeds them too: `assigned` is np-independent,
    // so it is persisted and shared instead of re-ranking every corpus
    // vector against the centroid table per arm. The 8-row result is
    // evaluated eagerly inside withPersisted (the q139 composing-query
    // posture) so the cache is released before this function returns.
    val cents = ivfCentroids(spark, dir)
    val assigned = ivfAssigned(spark, dir, cents)
    graft.ops.Caching.withPersisted(assigned) {
    val row = exact.select(col("qid")).distinct()
      .join(hits(q23AnnSrp(spark, dir), "srp_hits"), Seq("qid"), "left")
      .join(hits(q185MultiprobeAnn(spark, dir), "mp_hits"), Seq("qid"), "left")
      .join(hits(ivfTopKFrom(spark, dir, assigned, cents, 1), "ivf_np1_hits"), Seq("qid"), "left")
      .join(hits(ivfTopKFrom(spark, dir, assigned, cents, nProbe), "ivf_hits"), Seq("qid"), "left")
      .join(hits(ivfTopKFrom(spark, dir, assigned, cents, 4), "ivf_np4_hits"), Seq("qid"), "left")
      .select(col("qid"), lit(3L).as("k"),
        coalesce(col("srp_hits"), lit(0L)).as("srp_hits"),
        coalesce(col("mp_hits"), lit(0L)).as("mp_hits"),
        coalesce(col("ivf_np1_hits"), lit(0L)).as("ivf_np1_hits"),
        coalesce(col("ivf_hits"), lit(0L)).as("ivf_hits"),
        coalesce(col("ivf_np4_hits"), lit(0L)).as("ivf_np4_hits"))
      .withColumn("srp_recall_ppm", expr("srp_hits * 1000000 DIV 3"))
      .withColumn("mp_recall_ppm", expr("mp_hits * 1000000 DIV 3"))
      .withColumn("ivf_np1_recall_ppm", expr("ivf_np1_hits * 1000000 DIV 3"))
      .withColumn("ivf_recall_ppm", expr("ivf_hits * 1000000 DIV 3"))
      .withColumn("ivf_np4_recall_ppm", expr("ivf_np4_hits * 1000000 DIV 3"))
    val out = row.collect()
    spark.createDataFrame(java.util.Arrays.asList(out: _*), row.schema)
    }
  }

  /** Candidate-pool width for q202's MMR rerank. */
  private val mmrPoolK = 12

  /** q202: MMR-diversified top-3 selection per query (Carbonell &
    * Goldstein 1998) — the exemplar-picking operator of data curation:
    * plain top-k returns k near-copies of the best match; MMR greedily
    * picks argmax of λ·relevance − (1−λ)·max-similarity-to-already-picked,
    * so each pick is relevant AND novel. λ = 0.7.
    *
    * Scale shape: the ONLY corpus-scale stage is the relevance pool
    * (q22's broadcast-queries scan — swap in the q23/q185 ANN arm when
    * the corpus outgrows brute force; everything downstream is
    * arm-agnostic). The pool is k-bounded per query (nQueries × 12 rows),
    * so the pairwise-similarity matrix and the three greedy steps are
    * broadcast-joined constant-size frames — the greedy loop is unrolled
    * into the plan (selection count is a fixed contract, like q180's
    * power rounds), never a driver collect. Doubles fold in fixed index
    * order on both engines, tie-breaks are (score desc, vec_id asc), so
    * the argmax chain is engine-portable bit-for-bit. */
  def q202MmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val byRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("cand_id").asc)
    // localCheckpoint (r10): the pool is k-bounded (nQueries × 12 rows)
    // but it is referenced by the similarity matrix (both sides), the
    // bare relevance frame, and every greedy step — lazily that re-ran
    // the corpus-scale relevance scan per reference, and the unrolled
    // 3-step chain compounded the nested plan (measured 3.6 s wall /
    // 0.7 executor-cpu-s at sf0.1: planning-bound, the q180 signature).
    // Checkpointing the 96-row pool makes the corpus scan run ONCE and
    // every downstream frame plan against a leaf.
    val pool = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        Similarity.cosine(col("qe"), col("embedding")).as("rel"),
        col("embedding"))
      .withColumn("rn", row_number().over(byRel))
      .filter(col("rn") <= mmrPoolK).drop("rn")
      .localCheckpoint()
    // pairwise cosines within each query's pool: 12×11 rows per query,
    // both sides bounded → broadcast join, embeddings never re-shuffled
    val sims = pool.select(col("qid"), col("cand_id"), col("embedding"))
      .join(broadcast(pool.select(col("qid"), col("cand_id").as("other_id"),
        col("embedding").as("eo"))), Seq("qid"))
      .filter(col("cand_id") =!= col("other_id"))
      .select(col("qid"), col("cand_id"), col("other_id"),
        Similarity.cosine(col("embedding"), col("eo")).as("sim"))
    val bare = pool.select(col("qid"), col("cand_id"), col("rel"))
    val byMmr = Window.partitionBy(col("qid"))
      .orderBy(col("mmr").desc, col("cand_id").asc)
    // one greedy step: drop already-selected, penalize by the max
    // similarity to the selected set, keep the per-query argmax
    def step(selected: DataFrame, rank: Int): DataFrame = {
      val sel = selected.select(col("qid"), col("vec_id").as("cand_id"))
      val pen = sims
        .join(broadcast(sel.withColumnRenamed("cand_id", "other_id")),
          Seq("qid", "other_id"))
        .groupBy(col("qid"), col("cand_id")).agg(max(col("sim")).as("maxsim"))
      bare.join(broadcast(sel), Seq("qid", "cand_id"), "left_anti")
        .join(pen, Seq("qid", "cand_id"), "left")
        .select(col("qid"), col("cand_id"),
          (lit(0.7) * col("rel") -
            lit(0.3) * coalesce(col("maxsim"), lit(0.0))).as("mmr"))
        .withColumn("rn", row_number().over(byMmr))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cand_id").as("vec_id"),
          col("mmr"), lit(rank).as("rank"))
    }
    val none = bare.select(col("qid"), col("cand_id").as("vec_id")).limit(0)
    val s1 = step(none, 1)
    val s2 = step(s1, 2)
    val s3 = step(s1.unionByName(s2, allowMissingColumns = false), 3)
    s1.unionByName(s2).unionByName(s3)
      .select(col("qid"), col("rank").as("sel_rank"), col("vec_id"),
        round(col("mmr"), 6).as("mmr"))
  }

  /** q205: per-label centroid-shift audit — the embedding-space drift /
    * cluster-coherence screen (a label whose centroid points AWAY from
    * the rest of the corpus is a candidate for separate indexing or a
    * mislabeled batch; run next to q79's per-dim stats and q180's
    * anisotropy check before committing an ANN layout). For each label:
    * cosine between its centroid and the centroid of everything else.
    * cos is scale-invariant, so cos(s/n, (S−s)/(N−n)) = cos(s, S−s): the
    * whole query runs on the exact quantized integer SUM vectors (one
    * `long_vec_sum` agg per label — the q142 idiom) and never forms a
    * mean; the rest-of-corpus sum is derived from the 1-row broadcast
    * grand total, NOT a second scan. Moments (dot products of per-label
    * sums) widen through decimal(38,0) — component sums stay exact until
    * ~1e12 rows per label — and ONE double division at the end produces
    * the cosine (the q165 posture). Scale shape: one corpus scan, one
    * label-keyed agg; everything after is |labels|-row arithmetic. */
  def q205CentroidShift(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.embeddings(spark, dir)
      .select(col("label"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("xq"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        graft.functions.GraftFunctions.longVecSum(col("xq")).as("s"))
    val tot = per.agg(sum(col("n")).as("nt"),
      graft.functions.GraftFunctions.longVecSum(col("s")).as("st"))
    per.crossJoin(broadcast(tot)) // 1-row grand total
      .select(col("label"), col("n"), (col("nt") - col("n")).as("n_rest"),
        posexplode(zip_with(col("s"), col("st"),
          (sv, tv) => struct(sv.as("sv"), (tv - sv).as("tv")))))
      .groupBy(col("label"), col("n"), col("n_rest"))
      .agg(
        sum(expr("CAST(col.sv AS DECIMAL(18,0)) * CAST(col.tv AS DECIMAL(18,0))"))
          .as("dot_st"),
        sum(expr("CAST(col.sv AS DECIMAL(18,0)) * CAST(col.sv AS DECIMAL(18,0))"))
          .as("dot_ss"),
        sum(expr("CAST(col.tv AS DECIMAL(18,0)) * CAST(col.tv AS DECIMAL(18,0))"))
          .as("dot_tt"))
      // nullif guard (the q186 lesson): a single-label corpus has a zero
      // rest-vector — both engines must yield NULL, not NaN/Inf
      .select(col("label"), col("n"), col("n_rest"),
        round(col("dot_st").cast("double") /
          expr("nullif(sqrt(CAST(dot_ss AS DOUBLE) * CAST(dot_tt AS DOUBLE)), 0.0D)"),
          6).as("cos_shift"))
  }

  /** q207: label-pair centroid cosine matrix — the vector-space twin of
    * q204's gram-overlap matrix (q204 catches lexically-mirrored sources;
    * this catches SEMANTICALLY collapsed label classes — two labels whose
    * centroids nearly coincide are merge candidates before cluster-
    * balanced sampling, and a near-1 pair predicts IVF cell confusion in
    * q29). Same exact-integer machinery as q205: one corpus scan into
    * per-label quantized sum vectors (cos(s_a/n_a, s_b/n_b) =
    * cos(s_a, s_b) by scale invariance), then every pair of the
    * ≤|labels|-row frame via an explicit broadcast cross (bounded by the
    * label domain, a schema property — the crossJoin-of-a-bounded-frame
    * house posture) with decimal(38,0) moments and ONE double division. */
  def q207CentroidMatrix(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.embeddings(spark, dir)
      .select(col("label"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("xq"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        graft.functions.GraftFunctions.longVecSum(col("xq")).as("s"))
    per.select(col("label").as("label_a"), col("n").as("n_a"),
        col("s").as("sa"))
      .crossJoin(broadcast(per.select(col("label").as("label_b"),
        col("n").as("n_b"), col("s").as("sb"))))
      .where(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        posexplode(zip_with(col("sa"), col("sb"),
          (a, b) => struct(a.as("av"), b.as("bv")))))
      .groupBy(col("label_a"), col("label_b"), col("n_a"), col("n_b"))
      .agg(
        sum(expr("CAST(col.av AS DECIMAL(18,0)) * CAST(col.bv AS DECIMAL(18,0))"))
          .as("dot_ab"),
        sum(expr("CAST(col.av AS DECIMAL(18,0)) * CAST(col.av AS DECIMAL(18,0))"))
          .as("dot_aa"),
        sum(expr("CAST(col.bv AS DECIMAL(18,0)) * CAST(col.bv AS DECIMAL(18,0))"))
          .as("dot_bb"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("dot_ab").cast("double") /
          expr("nullif(sqrt(CAST(dot_aa AS DOUBLE) * CAST(dot_bb AS DOUBLE)), 0.0D)"),
          6).as("cos_ab"))
  }

  /** Per-label centroid table — the k-means/Lloyd building block the IVF
    * quantizer (q29) would train with: posexplode to (label, dim, value),
    * one groupBy shuffle. Values are floor-quantized to 1e-6 before
    * summing: integer sums are exact and order-independent, and floor
    * (unlike decimal-cast or round) has no tie cases, so the means are
    * engine-portable bit-for-bit. Flat (label, dim, n, mean) layout keeps
    * the oracle exact (no array-aggregation order ambiguity). */
  def q39Centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * 1000000).cast("long")).as("s"))
      .select(col("label"), col("pos").as("dim"), col("n"),
        (col("s").cast("double") / 1e6 / col("n")).as("mean"))

  /** Shared banded-candidate scorer for the anchor miners (q90 hard
    * negatives, q106 triplets). Anchors are `vec_id % 25 == 0` — a
    * PROPORTIONAL panel, so a k× corpus has k× anchors. The r3 shape
    * scored anchors × the FULL corpus through a broadcast nested loop:
    * n²/25 cosines, measured ~100× CPU at the 10× ladder rung. Here
    * anchors meet only their SRP-LSH bucket mates (adaptive pn keeps
    * occupancy ~constant), so per-anchor work is bounded and the total is
    * linear — the production miner's actual shape: ANN candidates, exact
    * re-rank. Returns (qid, q_label, nid, n_label, same, cs). */
  private def anchorScored(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // label + embedding ride THROUGH the banding projection (a narrow map
    // — banding is itself a function of the embedding) so the bucket
    // equi-join scores pairs where the data already lives. The payload
    // crosses the wire once per (row, table) — linear in corpus size —
    // instead of once per candidate pair: the previous candidates →
    // distinct → two verify joins shape shipped both arrays per pair once
    // the corpus side outgrew auto-broadcast, measured 1.37 GB shuffled at
    // the 100× ladder rung (vs 1.5 MB at 10× where the broadcast held) —
    // an AQE-policy cliff, not a plan this library should emit. A pair
    // colliding in several tables is scored identically in each; q90's
    // rank-1 filter and q106's struct-max are duplicate-insensitive, so
    // the distinct would be a pure extra shuffle.
    val banded = emb
      .select(col("vec_id"), col("label"), col("embedding"), posexplode(
        Similarity.srpBucketsAdaptive(col("embedding"), signs, tables,
          pnOf(spark, dir))))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("pos").as("tbl"), col("col").as("bucket"))
    val qb = banded.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("label").as("q_label"),
        col("embedding").as("qe"), col("tbl"), col("bucket"))
    banded.join(qb, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("q_label"), col("vec_id").as("nid"),
        col("label").as("n_label"),
        (col("label") === col("q_label")).as("same"),
        Similarity.cosine(col("qe"), col("embedding")).as("cs"))
  }

  /** q90: hard-negative mining for contrastive training — for each anchor
    * vector, the single most similar SRP-LSH candidate carrying a
    * DIFFERENT label (the classic "hard negative": close in embedding
    * space, wrong class). Candidates via [[anchorScored]]; exact cosine
    * re-rank; anchors with no different-label candidate surface with NULL
    * mining columns (a left join), never silently drop. */
  def q90HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("label").as("q_label"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("nid").asc)
    val best = anchorScored(spark, dir)
      .filter(!col("same"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nid").as("neg_id"),
        col("n_label").as("neg_label"), round(col("cs"), 6).as("cos"))
    anchors.join(best, Seq("qid"), "left")
      .select(col("qid"), col("q_label"), col("neg_id"), col("neg_label"),
        col("cos"))
  }

  /** q97: per-dimension rank (quantile) normalization — the
    * distribution-free feature transform (each value becomes its empirical
    * quantile within its dimension) used to whiten embedding columns
    * before indexing/clustering. Restricted to the first 8 dims to keep
    * the output a report, not a rewrite. The window partitions by dim —
    * at this dim count each partition holds one dimension's column; for
    * web-scale corpora the per-dim rank switches to the
    * [[graft.ops.GlobalIndex]] range-partitioned scan per dimension (same
    * output contract). Ranks are ints, the quantile is one exact division
    * rounded at output — engine-portable. Ties broken by vec_id: raw
    * float sort keys compare identically in both engines (same binary
    * values from the same parquet). */
  def q97RankNormalize(spark: SparkSession, dir: String): DataFrame = {
    val flat = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .filter(col("pos") < 8)
      .select(col("vec_id"), col("pos").as("dim"), col("col").as("v"))
    val w = Window.partitionBy(col("dim")).orderBy(col("v").asc, col("vec_id").asc)
    val n = Window.partitionBy(col("dim"))
    flat
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .select(col("vec_id"), col("dim"), col("rk"),
        round((col("rk") - 1).cast("double")
          / (col("n") - 1).cast("double"), 6).as("qnorm"))
  }

  /** q106: contrastive training triplets — for each anchor, the hardest
    * positive (top same-label SRP-LSH candidate) AND hardest negative
    * (top different-label candidate, q90) from ONE scoring pass over
    * [[anchorScored]]'s banded candidate stream, pivoting the two
    * struct-max winners to columns. The margin (pos − neg cosine) is the
    * triplet-loss signal; anchors with small or negative margin are the
    * valuable hard examples; anchors missing a candidate on either side
    * carry NULLs (left join), never silently drop. */
  def q106ContrastiveTriplets(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("label").as("q_label"))
    // top-1 per (anchor, same?) as a struct-MAX, not a window: (cs, -nid)
    // orders lexicographically = (cs desc, nid asc) rank 1, but aggregates
    // partially map-side — the shuffle carries one partial state per
    // (anchor, side) per partition instead of the whole scored candidate
    // stream a row_number window would sort.
    val best = struct(col("cs"), (-col("nid")).as("neg_nid"))
    val agged = anchorScored(spark, dir)
      .groupBy(col("qid"))
      .agg(
        max(when(col("same"), best)).as("p"),
        max(when(!col("same"), best)).as("n"))
    anchors.join(agged, Seq("qid"), "left")
      .select(col("qid"), col("q_label"),
        (-col("p.neg_nid")).as("pos_id"), (-col("n.neg_nid")).as("neg_id"),
        round(col("p.cs"), 6).as("pos_cos"),
        round(col("n.cs"), 6).as("neg_cos"),
        round(col("p.cs") - col("n.cs"), 6).as("margin"))
  }

  /** q112: embedding class-separation audit — per label, the mean cosine
    * of members to their OWN centroid vs to the best OTHER centroid, and
    * the margin between them. Negative or small margins flag label classes
    * the embedding space cannot actually separate — the go/no-go check
    * before trusting labels for hard-negative mining (q90/q106). Centroids
    * are q39's quantized means (bit-exact cross-engine), broadcast as a
    * 10-row table; the corpus is scanned once and never shuffles until the
    * per-label agg of quantized cosines (integer sums, doubles only at
    * output — the margin is an integer difference, immune to summation
    * order). */
  def q112ClassSeparation(spark: SparkSession, dir: String): DataFrame = {
    val cent = q39Centroids(spark, dir)
      .groupBy(col("label").as("c_label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean")))),
        x => x.getField("mean")).as("centroid"))
    val scored = Tables.embeddings(spark, dir).crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        (col("label") === col("c_label")).as("own"),
        Similarity.cosine(col("embedding"), col("centroid")).as("cs"))
    scored.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("own"), col("cs"))).as("own_cs"),
        max(when(!col("own"), col("cs"))).as("other_cs"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("own_cs") * 1e6).cast("long")).as("iq"),
        sum(floor(col("other_cs") * 1e6).cast("long")).as("oq"))
      .select(col("label"), col("n"),
        (col("iq").cast("double") / 1e6 / col("n")).as("intra_cos"),
        (col("oq").cast("double") / 1e6 / col("n")).as("inter_cos"),
        ((col("iq") - col("oq")).cast("double") / 1e6 / col("n")).as("margin"))
  }

  /** q122: higher-order-function surface — the array-HOF inventory
    * (filter / exists / forall / transform / aggregate) pinned as one
    * oracle-checked query instead of being exercised only implicitly:
    * per vector, the positive-dim count, a sparsity flag, a range
    * invariant, the L1 norm and max |x| — all computed WITHOUT exploding
    * (the whole point of HOFs at scale: 64 dims stay one row, zero
    * Generators, zero shuffles). Norms fold over 1e-6-quantized integers
    * so the aggregate is order-exact. */
  def q122HofSurface(spark: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val absQ = transform(e, x =>
      floor(abs(x.cast("double")) * lit(1e6)).cast("long"))
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      // compare in DOUBLE: a float-vs-float compare against 0.9f would
      // test a different threshold (0.90000004...) than the oracle's 0.9
      size(filter(e, x => x.cast("double") > lit(0.0))).cast("long").as("n_pos"),
      exists(e, x => x.cast("double") > lit(0.32)).as("has_big"),
      forall(e, x => abs(x.cast("double")) < lit(0.4)).as("in_range"),
      (aggregate(absQ, lit(0L), (a, v) => a + v).cast("double") / 1e6).as("l1"),
      (array_max(absQ).cast("double") / 1e6).as("max_abs"))
  }

  // ---- DuckDB oracle twins ------------------------------------------------

  /** Same left-to-right double fold as Similarity.dot. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
       |  (x, y) -> x + y)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / sqrt((${dotSql(a, a)}) * (${dotSql(b, b)}))"

  /** Bucket expression for one table, inlining the same +-1 hyperplane
    * literals used by the Spark plan over the fixed 12-row stride; each
    * bit is gated on `j < pn.pn` so the SAME static SQL adapts its
    * granularity to the corpus count (the query must CROSS JOIN the
    * [[pnCte]] CTE). */
  private def bucketSql(v: String, table: Int): String = {
    val stride = Similarity.MaxPlanesPerTable
    signs.slice(table * stride, (table + 1) * stride)
      .zipWithIndex.map { case (plane, j) =>
        val arr = plane.mkString("[", ",", "]")
        s"CASE WHEN $j < pn.pn AND (${dotSql(v, arr)}) > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString("(", " + ", ")")
  }

  /** Int8 symmetric quantization audit — the compression step before
    * embeddings ship to an ANN index, with its error measured in the same
    * query: per vector, scale = 127/max|v|, q_i = round(v_i * scale), and
    * the dequantization SSE Σ(v_i − q_i/scale)². Everything is a narrow
    * per-row HOF pass (zero shuffle at any corpus size). Arithmetic is
    * double throughout in a fixed fold order, squares by self-multiply
    * (not pow), so the audit itself hash-matches the oracle; all-zero
    * vectors get NULL scale via nullif and report NULL stats rather than
    * Infinity. `n_at_rail` counts elements landing ON the ±127 rail —
    * with a symmetric per-vector scale nothing can exceed it (that's the
    * point), so ≥1 by construction; a HIGH count means the distribution
    * is rail-heavy and per-vector scaling is losing resolution. */
  def q60QuantizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val maxAbs = aggregate(e, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))
    val staged = Tables.embeddings(spark, dir)
      .select(col("vec_id"), e, maxAbs.as("max_abs"))
      .withColumn("scale", lit(127.0d) / nullif(col("max_abs"), lit(0.0d)))
      .withColumn("qv", transform(e, x => round(x.cast("double") * col("scale"), 0)))
    val diff = zip_with(e, col("qv"), (x, qi) => {
      val d = x.cast("double") - qi / col("scale")
      d * d
    })
    staged.select(
      col("vec_id"),
      size(e).cast("long").as("n_dims"),
      round(col("max_abs"), 6).as("max_abs"),
      round(col("scale"), 6).as("scale"),
      size(filter(col("qv"), qi => abs(qi) >= 127.0d)).cast("long").as("n_at_rail"),
      round(aggregate(diff, lit(0.0d), (acc, d) => acc + d), 8).as("sse"))
  }

  /** q79: per-dimension embedding statistics — the feature-normalization
    * audit (mean/std/min/max per dimension) that decides whether a corpus'
    * embeddings need centering or whitening before ANN indexing.
    *
    * Determinism: moments accumulate over values QUANTIZED to 1e-6
    * resolution as exact integers (decimal-accumulated, so no long
    * overflow at any corpus size — q39's quantized-sum convention);
    * floating point enters only in the final per-dimension scalars, in a
    * fixed expression shape the oracle mirrors. One posexplode + one
    * map-side-combined shuffle of (dim, partial sums) — 64 output rows
    * regardless of corpus size. */
  def q79EmbedDimStats(spark: SparkSession, dir: String): DataFrame = {
    val q = floor(col("v").cast("double") * 1e6).cast("long")
    val nd = col("n").cast("double")
    val meanRaw = col("s1").cast("double") / 1e6 / nd
    val ex2 = col("s2").cast("double") / 1e12 / nd
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")))
      .withColumnRenamed("col", "v")
      .select(col("pos").as("dim"), col("v"), q.as("q"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s1"),
        sum(col("q").cast("decimal(19,0)") * col("q").cast("decimal(19,0)")).as("s2"),
        min(col("v").cast("double")).as("v_min"),
        max(col("v").cast("double")).as("v_max"))
      .select(col("dim"), col("n"),
        round(meanRaw, 6).as("mean"),
        round(sqrt(greatest(lit(0.0), ex2 - meanRaw * meanRaw)), 6).as("std"),
        col("v_min"), col("v_max"))
  }

  /** q83: embedding-space decontamination — flag corpus vectors whose
    * cosine to ANY benchmark vector (label 0 stands in for the eval set)
    * clears the threshold: the embedding twin of q54's n-gram decontam,
    * catching paraphrased eval leakage that exact n-grams miss.
    *
    * Scale shape: the benchmark side is bounded by definition (same
    * argument as q54), so its SRP buckets AND its (vector, norm) table
    * broadcast; corpus vectors meet candidates only through the
    * (table, bucket) equi-join — never a cross product — and, as in q28,
    * the codegen'd cosine scores the duplicated candidate stream map-side
    * with only the ≥τ survivors deduped and aggregated. */
  def q83EmbedDecontam(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val pn = pnOf(spark, dir)
    val bench = emb.filter(col("label") === 0)
    val corpus = emb.filter(col("label") =!= 0)
    val cand = bandedOf(corpus, pn)
      .join(broadcast(bandedOf(bench, pn).withColumnRenamed("vec_id", "bid")),
        Seq("tbl", "bucket"))
      .select(col("vec_id"), col("bid"))
    val cos = Similarity.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2"))
    cand
      .join(corpus.select(col("vec_id"), col("embedding").as("e1"),
        Similarity.dot(col("embedding"), col("embedding")).as("n1")), Seq("vec_id"))
      .join(broadcast(bench.select(col("vec_id").as("bid"), col("embedding").as("e2"),
        Similarity.dot(col("embedding"), col("embedding")).as("n2"))), Seq("bid"))
      .select(col("vec_id"), col("bid"), cos.as("cs"))
      .filter(col("cs") >= 0.3)
      .distinct()
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"), round(max(col("cs")), 6).as("max_cos"))
  }

  /** Lloyd rounds q142 runs; its oracle is GENERATED for the same constant
    * so the two sides cannot drift. */
  private val kmeansRounds = 3

  /** q142: k-means to `kmeansRounds` Lloyd rounds, bit-exact across
    * engines — the full iterative clustering loop, not q39's single
    * supervised step. Exactness design: coordinates are floor-quantized
    * to a 1e-6 grid WITH a +1.0 offset (all values positive, so both
    * engines' integer division is the same floor), distances are exact
    * integer Σ(xq−cq)² (the common offset cancels in differences),
    * assignment ties break (dist, cluster) ascending via a struct min,
    * and new centroids are integer floor means — every round is a pure
    * integer function of the last, so round k agrees bit-for-bit on any
    * engine. Seeds = the first k vectors by id (deterministic).
    * Scale shape: vectors stay ARRAYS end to end — assignment is a
    * per-row argmin over the broadcast k-centroid list
    * ([[graft.functions.ArgMinSqDist]], a native codegen'd k·d loop with
    * the identical (d2, cluster) struct-min tie order), and the centroid
    * step is ONE vector-valued aggregate
    * ([[graft.functions.LongVecSum]]): each map task combines its rows
    * into k d-long buffers, so a round's only exchange carries
    * k·d longs per partition — nothing scales with n on the wire. The
    * first form of this loop exploded to (vec, dim) and joined the
    * centroid table on `dim` — n·d·k intermediate rows and TWO corpus-
    * wide shuffles per round; the intermediate form kept native
    * assignment but posexploded n·d rows into a scalar centroid sum.
    * The equivalent HOF argmin (array_min over transform/zip_with/
    * aggregate) is NOT a substitute for the native expression: one
    * interpreted lambda call per element — 2M×8×64×3 rounds blew a
    * 10-minute budget the native loop runs in seconds (measured at the
    * 1000× rung; all three shapes' numbers in BASELINE.md). */
  def q142KmeansIters(spark: SparkSession, dir: String): DataFrame =
    kmeansItersWithRelease(spark, dir)._1

  /** q142's frame plus a release hook for its persisted state (the quantized
    * point cache and the final round's assignment aggregate). q142 itself
    * returns the frame lazily — the caches stay pinned and the caller's
    * clearCache() is the release point (ContractSpec's documented contract).
    * An EAGER consumer (q29 collects the k·d centroid table driver-side and
    * then never touches the frame again) must instead call the hook right
    * after materializing, or the pinned state outlives any use. */
  private[graft] def kmeansItersWithRelease(
      spark: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val offset = 1000000L // +1.0 on the 1e-6 grid: all quantized values > 0
    val pts = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(
        s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) + ${offset}L)")
        .as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (cluster, cq: array<long>) — k rows, collapses to a 1-row broadcast
    var cent = pts.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"), col("xq").as("cq"))
    var prev: Option[DataFrame] = None
    val argmin = graft.functions.GraftFunctions.argMinSqDist(
      col("xq"), col("cents"))
    for (_ <- 1 to kmeansRounds) {
      val centsRow = cent.agg(collect_list(struct(col("cluster"), col("cq")))
        .as("cents"))
      // (cluster, n, s: array<long>) — k rows of state per round
      val next = pts.crossJoin(broadcast(centsRow))
        .groupBy(argmin.as("cluster"))
        .agg(count(lit(1)).as("n"),
          graft.functions.GraftFunctions.longVecSum(col("xq")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prev.foreach(_.unpersist())
      prev = Some(next)
      // positive sums: DIV == floor division
      cent = next.select(col("cluster"),
        expr("transform(s, v -> v DIV n)").as("cq"))
    }
    val out = prev.get
      .select(col("cluster"), col("n"),
        posexplode(expr("transform(s, v -> v DIV n)")).as(Seq("dim", "cq")))
      .select(col("cluster"), col("dim"), col("n"),
        (col("cq") - offset).as("c_units"),
        round((col("cq") - offset).cast("double") / 1e6, 6).as("mean"))
    val last = prev
    (out, () => { last.foreach(_.unpersist()); pts.unpersist(); () })
  }

  /** q181: hybrid retrieval via Reciprocal-Rank Fusion — the fusion layer
    * every production retrieval stack (RAG, dedup triage, contamination
    * review) puts on top of its lexical and semantic arms. Queries are
    * the id % 100 == 0 slice in BOTH modalities (the fixture's documents
    * and embeddings are id-aligned); the lexical arm is q179's BM25
    * scored frame ranked top-10, the semantic arm is q23's SRP-LSH
    * candidate shape (bucket equi-join, never all-pairs) ranked top-10 by
    * exact cosine, and the fused score is the classic k=60 RRF
    * Σ 1/(60+rank) — evaluated as the EXACT integer division
    * 1000000 DIV (60+rank), so fusion is pure integer arithmetic on rank
    * positions (rank ties in each arm break to the lower doc_id, making
    * the whole query engine-deterministic end to end).
    *
    * Scale: both arms are already bounded (broadcast query slice; banded
    * candidates); fusion adds one (qid, doc_id) full-outer join over two
    * ≤10-row-per-query frames and a qid-partitioned window — negligible
    * at any corpus size. A doc surfaced by only one arm gets that arm's
    * term alone (standard RRF semantics; its other rank emits NULL).
    * `spark.graft.retrieval.queryCap = K` bounds BOTH arms to the K
    * smallest query ids (see [[TextQueries.retrievalQueryCap]]) — the
    * fixture's proportional query slice is a ladder artifact; the cap is
    * how the ladder measures corpus growth at fixed workload. */
  def q181HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val wLex = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val lex = TextQueries.bm25Scored(spark, dir)
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .where(col("lex_rank") <= 10)
      .select(col("qid"), col("doc_id"), col("lex_rank"))
    val emb = Tables.embeddings(spark, dir)
    // the semantic arm's query cap rides the id-aligned embeddings table
    // (documents and embeddings share the id domain, so both arms keep
    // the SAME K queries)
    val capIds = TextQueries.retrievalQueryCap(spark).map(k =>
      emb.select(col("vec_id").as("qid")).where(col("qid") % 100 === 0)
        .orderBy(col("qid")).limit(k))
    def capped(df: DataFrame): DataFrame =
      capIds.fold(df)(ids => df.join(broadcast(ids), Seq("qid"), "left_semi"))
    val banded = bandedOf(emb, pnOf(spark, dir))
    val qb = capped(banded.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket")))
    val cand = banded.filter(col("vec_id") % 100 =!= 0)
      .join(broadcast(qb), Seq("tbl", "bucket"))
      .select(col("qid"), col("vec_id").as("doc_id"))
      .distinct()
    val q = capped(emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val cos = Similarity.cosine(col("qe"), col("embedding"))
    val wSem = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("doc_id").asc)
    val sem = cand
      .join(broadcast(q), Seq("qid"))
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .select(col("qid"), col("doc_id"), cos.as("cs"))
      .withColumn("sem_rank", row_number().over(wSem).cast("long"))
      .where(col("sem_rank") <= 10)
      .select(col("qid"), col("doc_id"), col("sem_rank"))
    val wF = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    lex.join(sem, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        (coalesce(expr("1000000 DIV (60 + lex_rank)"), lit(0L))
          + coalesce(expr("1000000 DIV (60 + sem_rank)"), lit(0L))).as("rrf_micro"))
      .withColumn("rank", row_number().over(wF).cast("long"))
      .where(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf_micro"),
        col("lex_rank"), col("sem_rank"))
  }

  private val pcaRounds = 3

  /** q180: top principal component by POWER ITERATION — the spectral
    * member of the embedding-audit family (q79 gives per-dim moments,
    * q112 class separation; this gives the dominant variance DIRECTION,
    * the whitening/anisotropy diagnostic real embedding pipelines run
    * before indexing). Three unrolled rounds of v ← C·v on the mean-
    * centered 1e-6-quantized grid, bit-exact across engines:
    *
    * - the mean and both per-round normalizations are POSITIVITY-SHIFTED
    *   integer floor divisions ((a + K·m) DIV m − K, the q161/q164
    *   portability trick), so Spark's truncating DIV and DuckDB's
    *   flooring // agree on negative components;
    * - C·v never materializes C (64×64 covariance is tiny, but n·d² row
    *   streams are not): each round is s_i = x_cᵀv per row (one broadcast
    *   of the 64-row v), then w_d = Σᵢ sᵢ·x_c,d — a map-side-combined
    *   (dim) agg whose shuffle is 64 rows per partition at any scale;
    * - sᵢ is renormalized to ±1000 BEFORE the w sum and the w sum
    *   accumulates in decimal(38,0) (DuckDB HUGEINT) — exact at any
    *   corpus size (the r4 overflow-widening convention);
    * - degenerate inputs (all-identical vectors ⇒ max|w| = 0) yield NULL
    *   loadings via nullif, not a divide-by-zero.
    *
    * CACHE CONTRACT (q142's per-round convention): the centered frame c
    * is persisted across the `pcaRounds` scans, and each round persists
    * its w and v frames (64 rows each) — each is referenced TWICE (by its
    * max-abs normalizer and by the next stage), and without
    * materialization the double references compound to ~4^rounds
    * re-executions of the early rounds (measured: 123 cpu-s at sf0.1
    * unpersisted vs sub-second persisted). Bench and Verify clear the
    * cache per query. Output: 64 (dim, loading) rows, loading in exact
    * milli-units of the max-normalized eigenvector estimate.
    *
    * r10 SHAPE: vectors stay ARRAYS end to end. The previous exploded
    * (vec_id, dim, xq) form paid n·64 skinny rows through a repartition,
    * a persist, and TWO hash joins per round (measured 15.6 cpu-s /
    * 7.3 s wall at sf0.1, an 893-Exchange plan). Here every per-vector
    * reduction is a native long_vec kernel over the row's own array
    * (sr and sv are ROW-LOCAL — vec_id never even enters the plan), so
    * the only rows that ever move are 1-row aggregates, per-partition
    * partial-sum arrays, and 64-row dim frames. The integer arithmetic
    * is unchanged expression by expression (same shifted DIVs, same
    * decimal(38,0) widening for w — per-partition long partials are
    * bounded by |sv·xc| ≤ ~4e9 × rows/partition, exact far past any
    * feasible task size, then widen to decimal before the global sum,
    * which is the same exact integer in a different associative order),
    * so the oracle SQL is byte-identical. */
  def q180PcaPower(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{longVecDot, longVecSum}
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val xq = Tables.embeddings(spark, dir).select(expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
      .as("xqa"))
    // one map-side-combined pass: per-dim long sums + row count (the same
    // overflow envelope as the previous per-dim SUM(long))
    val muRow = xq.agg(longVecSum(col("xqa")).as("s"), count(lit(1)).as("n"))
      .select(col("n"),
        expr("transform(s, x -> (x + 4000000 * n) DIV n - 4000000)").as("mu"))
    // centered rows: one broadcast of the 1-row mu frame — no join, no
    // repartition; rows are independent from here on
    val c = xq.crossJoin(broadcast(muRow.select(col("mu"))))
      .select(expr("zip_with(xqa, mu, (x, m) -> x - m)").as("xca"))
      .persist(mad)
    // dim spine (64 rows iff the corpus is non-empty): keeps the
    // degenerate all-identical-vectors case at 64 NULL-loading rows and
    // the empty-corpus case at 0 rows — exactly the exploded form's edges
    val spine = muRow.filter(col("n") > 0)
      .select(explode(expr(s"sequence(0, ${dims - 1})")).as("dim"))
    // v0 = 1000 + dim, a pure literal — no data pass
    var vRow = spark.range(1).select(
      expr(s"transform(sequence(0, ${dims - 1}), d -> CAST(1000 + d AS BIGINT))")
        .as("varr"))
    var vFrame: DataFrame = null
    for (_ <- 1 to pcaRounds) {
      // sr is row-local: one cached scan feeds the sm normalizer, a second
      // computes sv → per-dim partials. A uniformly-NULL v array
      // (degenerate corpus: wm = 0 upstream) short-circuits the native dot
      // — nullness is all-or-nothing because sm/wm are global aggregates.
      val sr = when(element_at(col("varr"), 1).isNull, lit(null))
        .otherwise(longVecDot(col("xca"), col("varr"))).as("sr")
      val r = c.crossJoin(broadcast(vRow)).select(col("xca"), sr)
      val sm = r.agg(max(greatest(col("sr"), -col("sr"))).as("sm"))
      // w_d = Σᵢ svᵢ·xc_{i,d}: per-PARTITION long partial arrays, then the
      // partials widen through decimal(38,0) for the global per-dim sum.
      // A NULL sv nulls the row's whole product array so long_vec_sum
      // skips the row, mirroring SUM over an all-NULL column.
      val partials = r.crossJoin(broadcast(sm))
        .select(when(col("sm").isNull, lit(null)).otherwise(
          expr("(sr * 1000 + 2000 * sm) DIV nullif(sm, 0) - 2000")).as("sv"),
          col("xca"))
        .select(when(col("sv").isNull, lit(null))
          .otherwise(expr("transform(xca, x -> x * sv)")).as("pa"))
        .groupBy(spark_partition_id().as("p"))
        .agg(longVecSum(col("pa")).as("ws"))
      // localCheckpoint, not persist: the 64-row w/v frames are cheap to
      // materialize but their LINEAGE is not cheap to carry — persisted
      // frames keep the full nested logical plan, so by round 3 every
      // re-plan (one per materialization under AQE) walks a plan with
      // hundreds of operators; the measured wall was planning-bound
      // (7.2 s wall vs 3.3 executor-cpu-s at sf0.1). Checkpointing cuts
      // each round's plan to a LogicalRDD leaf; the computed VALUES are
      // identical (same expressions, materialized eagerly either way).
      val w = spine.join(
        partials.select(posexplode(col("ws")).as(Seq("dim", "wp")))
          .groupBy(col("dim"))
          .agg(sum(col("wp").cast("decimal(38,0)")).as("w")),
        Seq("dim"), "left")
        .localCheckpoint()
      val wm = w.agg(max(greatest(col("w"), -col("w"))).as("wm"))
      vFrame = w.crossJoin(broadcast(wm))
        .select(col("dim"),
          (expr("(w * 1000 + 2000 * wm) DIV nullif(wm, 0)") - lit(2000L))
            .cast("long").as("v"))
        .localCheckpoint()
      vRow = vFrame.agg(expr(
        "transform(array_sort(collect_list(struct(dim, v))), s -> s.v)")
        .as("varr"))
    }
    vFrame.select(col("dim"), col("v").as("loading_milli"),
      round(col("v").cast("double") / 1e3, 3).as("loading"))
  }

  /** q180's oracle: the identical shifted-integer power recurrence
    * unrolled one CTE trio (sr, sn, w→v) per round; HUGEINT is DuckDB's
    * exact twin of the Spark side's decimal(38,0) accumulator. */
  private lazy val pcaPowerSql: String = {
    val steps = (1 to pcaRounds).map { k =>
      s"""sr$k AS (SELECT vec_id, CAST(SUM(xc * v) AS BIGINT) AS sr
         |  FROM c JOIN v${k - 1} USING (dim) GROUP BY 1),
         |sm$k AS (SELECT MAX(GREATEST(sr, -sr)) AS sm FROM sr$k),
         |sn$k AS (SELECT vec_id,
         |  CAST((sr * 1000 + 2000 * sm) // NULLIF(sm, 0) AS BIGINT) - 2000 AS sv
         |  FROM sr$k CROSS JOIN sm$k),
         |w$k AS (SELECT dim, SUM(CAST(sv AS HUGEINT) * xc) AS w
         |  FROM c JOIN sn$k USING (vec_id) GROUP BY 1),
         |wm$k AS (SELECT MAX(GREATEST(w, -w)) AS wm FROM w$k),
         |v$k AS (SELECT dim,
         |  CAST((w * 1000 + 2000 * wm) // NULLIF(wm, 0) AS BIGINT) - 2000 AS v
         |  FROM w$k CROSS JOIN wm$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
       |  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xq
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) u),
       |mu AS (SELECT dim,
       |  CAST((SUM(xq) + 4000000 * COUNT(*)) // COUNT(*) AS BIGINT)
       |    - 4000000 AS mu FROM p GROUP BY 1),
       |c AS (SELECT vec_id, p.dim, xq - mu AS xc
       |  FROM p JOIN mu ON mu.dim = p.dim),
       |v0 AS (SELECT dim, CAST(1000 + dim AS BIGINT) AS v FROM mu),
       |$steps
       |SELECT dim, v AS loading_milli,
       |  ROUND(CAST(v AS DOUBLE) / 1e3, 3) AS loading FROM v$pcaRounds""".stripMargin
  }

  /** q142's oracle CTE chain, generated for [[kmeansRounds]]: the
    * identical integer recurrence unrolled as one CTE pair (assign,
    * centroid) per round; `c$kmeansRounds` is the trained centroid table.
    * Shared by the q142 oracle and q29's (whose IVF quantizer is the same
    * trained centroids). */
  private lazy val kmeansCtes: String = {
    val steps = (1 to kmeansRounds).map { k =>
      s"""a$k AS (SELECT vec_id, cluster FROM (
         |  SELECT p.vec_id, c.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |      ORDER BY SUM((p.xq - c.cq) * (p.xq - c.cq)), c.cluster) AS rn
         |  FROM p JOIN c${k - 1} c ON c.dim = p.dim
         |  GROUP BY p.vec_id, c.cluster) t WHERE rn = 1),
         |c$k AS (SELECT a$k.cluster, p.dim, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(p.xq) // COUNT(*) AS BIGINT) AS cq
         |  FROM p JOIN a$k ON a$k.vec_id = p.vec_id GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""p AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
       |  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
       |    + 1000000 AS xq
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) u),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cluster, dim, xq AS cq
       |  FROM p WHERE vec_id < 8),
       |$steps""".stripMargin
  }

  private lazy val kmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT cluster, dim, n, cq - 1000000 AS c_units,
       |  ROUND(CAST(cq - 1000000 AS DOUBLE) / 1e6, 6) AS mean
       |FROM c$kmeansRounds""".stripMargin

  /** q157: SemDeDup-style semantic dedup — assign every vector to a seed
    * centroid via a two-level (coarse/fine, IVF-style) quantizer using
    * q142's integer distance recurrence, then prune near-duplicates ONLY
    * within a cluster: a
    * vector is dropped when a lower-id cluster-mate has quantized cosine
    * >= tau. This is the published SemDeDup shape (cluster to bound the
    * candidate set, pairwise only inside the cluster) — at 100 TB the
    * all-pairs step is bounded by cluster size, the corpus never
    * self-joins globally, and the cluster id is the shuffle key.
    * Exactness: coordinates floor-quantized to 1e-3 (|xq| <= ~530, 64
    * dims, so every product below stays in int64), and cos >= tau is the
    * integer cross-multiplication 25*dot^2 >= 4*n2a*n2b with dot > 0
    * (tau = 0.4 — fixture embeddings are near-orthogonal, max pairwise
    * cos 0.51, so the production 0.95 would never fire; the threshold is
    * data-calibrated, the algebra is threshold-independent). */
  def q157Semdedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.longVecDot
    // Two quantizations of the same embedding: 1e6 for the assignment
    // metric (matches q142's grid; the oracle's +offset cancels inside
    // (x-c)^2, so un-offset arrays give identical d2) and 1e3 for the
    // cosine prune (keeps 25*dot^2 inside int64). Every dot product below
    // is the native codegen'd LongVecDot — the zip_with/aggregate HOF
    // form was measured at 3x the total query cost (CodegenFallback:
    // boxed closure per element + intermediate array per pair).
    // lazy localCheckpoint (r11, guide §1.2 step 1): this frame is
    // referenced by every `nearest` stage below — 8 codebook-labeling
    // branches, the 4-stage vector descent, and the pair-stage
    // projection — and each branch re-ran the parquet scan + both
    // quantization transforms + both norm dots (the r11 before-plan
    // holds 124 scan references / 164 Exchanges for what is ONE n-row
    // frame). Checkpointed it computes once and every branch reads the
    // row cache (100× rung A/B: 21.7 → 12.1 s wall, 187 → 94 cpu-s;
    // sf0.1 3.3 → 2.9 s). Row-level checkpoint, NOT .persist: the SQL
    // columnar cache must encode/decode the two 64-long arrays per
    // branch, which A/B'd WORSE than recomputing (sf0.1 cpu 1.9 → 4.0 s,
    // rung wall flat) — the lazy RDD cache stores UnsafeRows as-is and
    // also truncates the 164-Exchange lineage the planner re-analyzed
    // per branch.
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e6).cast("long")).as("vq6"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e3).cast("long")).as("vq3"))
      .withColumn("n6", longVecDot(col("vq6"), col("vq6")))
      .withColumn("n2", longVecDot(col("vq3"), col("vq3")))
      .localCheckpoint(false)
    // ADAPTIVE cluster count k = max(8, ceil(n/256)) — integer ceiling so
    // the oracle computes the identical k. SemDeDup's pairwise step costs
    // Σ cluster_size² ≈ n²/k: with k FIXED a 10× corpus is 100× pairs
    // (the ladder measured exactly that); with cluster size held ~256 the
    // pairwise shuffle stays linear in n.
    //
    // Assignment is a FOUR-LEVEL quantizer (IVF top/m1/m2/fine): a flat
    // nearest-of-k scan is n·k dots = O(n²/256) once k tracks n; the
    // TWO-level split (√k + k/√k per vector) measured an n^1.5 law at
    // the 1000× ladder rung (432 s at 5M vectors) and the r5 THREE-level
    // (3·k^(1/3), n^(4/3)) measured 187 s there — still the frontier's
    // most expensive query. With a top codebook of k3 ≈ k^(1/4) seeds
    // and geometric levels k2 = k3², k1 = k3³, every vector costs
    // ~4·k^(1/4) dots — n^(5/4) total (at 5M vectors: 81 → ~47 dots per
    // vector vs three-level). Codebook sizes are INTEGER-exact
    // (k3 = min i with i⁴ ≥ k, clamped [4, ∞); k2 = clamp(k3², [k3, k]);
    // k1 = clamp(k3³, [k2, k])) so no floating pow/ceil at an integer
    // boundary can disagree with the oracle's arithmetic — the clamps
    // also make the ladder DEGENERATE CLEANLY on small corpora (at the
    // fixture k = 8: levels 4/8/8/8, extra levels collapse to the fine
    // codebook). Seed nesting (ids < k3 ⊂ < k2 ⊂ < k1 ⊂ < k) plus
    // self-distance 0 pins each level-j seed to its own parent cell, so
    // no cell at any level is empty. All four codebooks broadcast; every
    // argmin's map-side partial-min keeps shuffles at n skinny rows (the
    // array NEVER rides through an aggregate — struct-min over an array
    // buffer is a non-mutable ObjectHashAggregate that falls back to
    // sort past 128 groups, measured 2.6× worse than the flat scan).
    // Deterministic ties on the lower id at every level; the oracle
    // computes the identical four-level result — a defined semantics,
    // not an approximation of the flat scan.
    val k = math.max(8L,
      (Tables.embeddings(spark, dir).count() + 255L) / 256L)
    val k3 = math.max(4L,
      Iterator.from(1).find(i => i.toLong * i * i * i >= k).get.toLong)
    val k2 = math.max(k3, math.min(k, k3 * k3))
    val k1 = math.max(k2, math.min(k, k3 * k3 * k3))
    // generic argmin stage: nearest candidate (cid, cq6, cn6[, cell]) for
    // every row (id, vq6, n6[, cell]) by quantized d2 = |x|²−2⟨x,c⟩+|c|²,
    // (d2, cid) struct-min tie-break, candidates broadcast (codebooks are
    // tiny at every level), output the SKINNY (id, cid) stream
    def nearest(rows: DataFrame, id: String, cands: DataFrame, cid: String,
                cell: Seq[String]): DataFrame = {
      val joined =
        if (cell.isEmpty) rows.crossJoin(broadcast(cands))
        else rows.join(broadcast(cands), cell)
      joined.select(col(id), col(cid),
          (col("n6") - lit(2L) * longVecDot(col("vq6"), col("cq6")) +
            col("cn6")).as("d2"))
        .groupBy(col(id))
        .agg(min(struct(col("d2"), col(cid))).as("m"))
        .select(col(id), col(s"m.$cid").as(cid))
    }
    def seedCands(limit: Long, cid: String): DataFrame =
      vecs.filter(col("vec_id") < limit)
        .select(col("vec_id").cast("int").as(cid),
          col("vq6").as("cq6"), col("n6").as("cn6"))
    def seedRows(limit: Long, id: String): DataFrame =
      vecs.filter(col("vec_id") < limit)
        .select(col("vec_id").cast("int").as(id), col("vq6"), col("n6"))
    val tops = seedCands(k3, "top")
    // codebook labeling, coarse to fine — each level's codebook descends
    // through the already-labeled coarser levels (flat against top, then
    // within-cell at each finer level): ~k·3·k^(1/4) dots total, tiny
    // relative to the vector-side descent
    val m1Top = nearest(seedRows(k2, "m1"), "m1", tops, "top", Nil)
    val m1Cands = seedCands(k2, "m1").join(m1Top, Seq("m1"))
    val m2Top = nearest(seedRows(k1, "m2"), "m2", tops, "top", Nil)
    val m2M1 = nearest(seedRows(k1, "m2").join(m2Top, Seq("m2")),
      "m2", m1Cands, "m1", Seq("top"))
    val m2Cands = seedCands(k1, "m2").join(m2M1, Seq("m2"))
    val fineTop = nearest(seedRows(k, "cluster"), "cluster", tops, "top", Nil)
    val fineM1 = nearest(seedRows(k, "cluster").join(fineTop, Seq("cluster")),
      "cluster", m1Cands, "m1", Seq("top"))
    val fineM2 = nearest(seedRows(k, "cluster").join(fineM1, Seq("cluster")),
      "cluster", m2Cands, "m2", Seq("m1"))
    val fineCands = seedCands(k, "cluster").join(fineM2, Seq("cluster"))
    // vector descent: top (flat k3 scan) -> m1 in top cell -> m2 in m1
    // cell -> fine in m2 cell; each stage rejoins the skinny assignment
    // on vec_id
    val vrows = vecs.select(col("vec_id"), col("vq6"), col("n6"))
    val vecTop = nearest(vrows, "vec_id", tops, "top", Nil)
    val vecM1 = nearest(vrows.join(vecTop, Seq("vec_id")), "vec_id",
      m1Cands, "m1", Seq("top"))
    val vecM2 = nearest(vrows.join(vecM1, Seq("vec_id")), "vec_id",
      m2Cands.select(col("m2"), col("cq6"), col("cn6"), col("m1")),
      "m2", Seq("m1"))
    val assign = nearest(vrows.join(vecM2, Seq("vec_id")), "vec_id",
      fineCands, "cluster", Seq("m2"))
    // Pin the pair-stage width: the cluster-keyed self-join's input is
    // ~0.5 KiB/row, so AQE's size-targeted coalesce would pack the
    // quadratic-in-cluster-size DOT-PRODUCT work into a handful of fat
    // partitions (measured 3-of-32 cores busy at the 100× rung). An
    // explicit width-pinned repartition on the join key keeps every core
    // on the verify work. CACHE CONTRACT (ContractSpec whitelist): the
    // frame feeds both pair sides and the final projection — persisting
    // it computes the assignment chain once and lets the self-join reuse
    // the cluster hash partitioning with no further exchange; the frame
    // is n skinny rows (quantized ints, never raw text/embeddings). The
    // release point is the caller's clearCache(), same as q44/q126.
    val clustered = vecs.select(col("vec_id"), col("vq3"), col("n2"))
      .join(assign, Seq("vec_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = clustered.select(col("cluster"), col("vec_id").as("id_a"),
      col("vq3").as("vq_a"), col("n2").as("n2_a"))
    val b = clustered.select(col("cluster"), col("vec_id").as("id_b"),
      col("vq3").as("vq_b"), col("n2").as("n2_b"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dp", longVecDot(col("vq_a"), col("vq_b")))
      .filter(col("dp") > 0 &&
        lit(25) * col("dp") * col("dp") >= lit(4) * col("n2_a") * col("n2_b"))
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("is_dropped", lit(true))
    clustered.select(col("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_dropped"), lit(false)).as("is_dropped"))
  }

  /** q174: bitext-mining shape — for every non-English document, the
    * top-1 English SRP-LSH candidate in embedding space plus the margin
    * to the runner-up (the margin criterion from the published bitext
    * mining literature: a high best-match score with a LOW margin is a
    * hub, not a translation pair). The r3 shape brute-forced non-en ×
    * broadcast(en): BOTH sides are proportional corpus slices, so the
    * nested loop was quadratic — the single most expensive query at the
    * 10× ladder rung (~200× CPU). Candidates now come from the adaptive
    * SRP bucket join (occupancy-bounded, linear) and the exact cosine
    * re-rank + per-query top-2 run over candidates only — the shape a
    * production miner uses (ANN candidates, margin re-rank). Queries with
    * no English bucket-mate carry NULL mining columns via the final left
    * join, never silently drop. */
  def q174BitextMining(spark: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id"))
    // embeddings ride through the banding (anchorScored's rationale: the
    // payload moves once per (row, table), never per candidate pair — the
    // pair-wise verify joins measured 2.1 GB shuffled at the 100× rung)
    val banded = tagged
      .select(col("vec_id"), col("lang"), col("embedding"), posexplode(
        Similarity.srpBucketsAdaptive(col("embedding"), signs, tables,
          pnOf(spark, dir))))
      .select(col("vec_id"), col("lang"), col("embedding"),
        col("pos").as("tbl"), col("col").as("bucket"))
    val qb = banded.filter(col("lang") =!= "en")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("tbl"), col("bucket"))
    val eb = banded.filter(col("lang") === "en")
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("tbl"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("cand_id").asc)
    val mined = qb.join(eb, Seq("tbl", "bucket"))
      .select(col("qid"), col("cand_id"),
        Similarity.cosine(col("qe"), col("ce")).as("cs"))
      // UNLIKE q90/q106's duplicate-insensitive max, the top-2 margin
      // must not see a multi-table collision twice (rn=1 and rn=2 would
      // both be the winner, zeroing the margin) — dedup on the SKINNY
      // scored stream (cosine is deterministic, max = the value)
      .groupBy(col("qid"), col("cand_id"))
      .agg(max(col("cs")).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("qid"))
      .agg(max(when(col("rn") === 1, col("cand_id"))).as("best_en"),
        round(max(when(col("rn") === 1, col("cs"))), 6).as("cos"),
        round(max(when(col("rn") === 1, col("cs"))) -
          max(when(col("rn") === 2, col("cs"))), 6).as("margin"))
    tagged.filter(col("lang") =!= "en")
      .select(col("vec_id"), col("lang"))
      .join(mined.withColumnRenamed("qid", "vec_id"), Seq("vec_id"), "left")
  }

  /** q157's oracle: the same four-level integer assignment + integer
    * cosine cross-multiplication, in DuckDB list/unnest algebra. The
    * offset (+1e6) on xq cancels inside every (a-b)^2, so the engine's
    * un-offset arrays give identical distances. Codebook sizes are
    * integer-exact: k3 = MIN(i: i⁴ ≥ k) over a series scan (no
    * floating pow/ceil that could straddle an integer boundary across
    * engines), k2 = clamp(k3², [k3, k]), k1 = clamp(k3³, [k2, k]).
    * Stage order mirrors the Spark descent exactly: m1→top, m2→top,
    * m2→m1 (within the top cell), fine→top, fine→m1, fine→m2, then
    * vec→top, vec→m1, vec→m2, vec→fine; ties (d2, id) at every level. */
  private lazy val semdedupSql: String =
    s"""WITH p AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
       |  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
       |    + 1000000 AS xq
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) u),
       |kk AS (SELECT GREATEST(8, (COUNT(*) + 255) // 256) AS k
       |  FROM embeddings),
       |kc AS (SELECT GREATEST(4, MIN(i)) AS k3
       |  FROM (SELECT unnest(generate_series(1, 55000)) AS i) s
       |  WHERE i * i * i * i >= (SELECT k FROM kk)),
       |km2 AS (SELECT GREATEST((SELECT k3 FROM kc),
       |  LEAST((SELECT k FROM kk),
       |    (SELECT k3 FROM kc) * (SELECT k3 FROM kc))) AS k2),
       |km1 AS (SELECT GREATEST((SELECT k2 FROM km2),
       |  LEAST((SELECT k FROM kk),
       |    (SELECT k3 FROM kc) * (SELECT k3 FROM kc) * (SELECT k3 FROM kc))) AS k1),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cluster, dim, xq AS cq
       |  FROM p WHERE vec_id < (SELECT k FROM kk)),
       |b0 AS (SELECT CAST(vec_id AS INT) AS m2, dim, xq AS bq
       |  FROM p WHERE vec_id < (SELECT k1 FROM km1)),
       |a0 AS (SELECT CAST(vec_id AS INT) AS m1, dim, xq AS aq
       |  FROM p WHERE vec_id < (SELECT k2 FROM km2)),
       |t0 AS (SELECT CAST(vec_id AS INT) AS top, dim, xq AS tq
       |  FROM p WHERE vec_id < (SELECT k3 FROM kc)),
       |at AS (SELECT m1, top FROM (
       |  SELECT a.m1, t.top,
       |    ROW_NUMBER() OVER (PARTITION BY a.m1
       |      ORDER BY SUM((a.aq - t.tq) * (a.aq - t.tq)), t.top) AS rn
       |  FROM a0 a JOIN t0 t ON t.dim = a.dim
       |  GROUP BY a.m1, t.top) x WHERE rn = 1),
       |bt AS (SELECT m2, top FROM (
       |  SELECT b.m2, t.top,
       |    ROW_NUMBER() OVER (PARTITION BY b.m2
       |      ORDER BY SUM((b.bq - t.tq) * (b.bq - t.tq)), t.top) AS rn
       |  FROM b0 b JOIN t0 t ON t.dim = b.dim
       |  GROUP BY b.m2, t.top) x WHERE rn = 1),
       |ba AS (SELECT m2, m1 FROM (
       |  SELECT b.m2, a.m1,
       |    ROW_NUMBER() OVER (PARTITION BY b.m2
       |      ORDER BY SUM((b.bq - a.aq) * (b.bq - a.aq)), a.m1) AS rn
       |  FROM b0 b
       |  JOIN bt ON bt.m2 = b.m2
       |  JOIN at ON at.top = bt.top
       |  JOIN a0 a ON a.m1 = at.m1 AND a.dim = b.dim
       |  GROUP BY b.m2, a.m1) x WHERE rn = 1),
       |ct AS (SELECT cluster, top FROM (
       |  SELECT c.cluster, t.top,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster
       |      ORDER BY SUM((c.cq - t.tq) * (c.cq - t.tq)), t.top) AS rn
       |  FROM c0 c JOIN t0 t ON t.dim = c.dim
       |  GROUP BY c.cluster, t.top) x WHERE rn = 1),
       |ca AS (SELECT cluster, m1 FROM (
       |  SELECT c.cluster, a.m1,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster
       |      ORDER BY SUM((c.cq - a.aq) * (c.cq - a.aq)), a.m1) AS rn
       |  FROM c0 c
       |  JOIN ct ON ct.cluster = c.cluster
       |  JOIN at ON at.top = ct.top
       |  JOIN a0 a ON a.m1 = at.m1 AND a.dim = c.dim
       |  GROUP BY c.cluster, a.m1) x WHERE rn = 1),
       |cb AS (SELECT cluster, m2 FROM (
       |  SELECT c.cluster, b.m2,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster
       |      ORDER BY SUM((c.cq - b.bq) * (c.cq - b.bq)), b.m2) AS rn
       |  FROM c0 c
       |  JOIN ca ON ca.cluster = c.cluster
       |  JOIN ba ON ba.m1 = ca.m1
       |  JOIN b0 b ON b.m2 = ba.m2 AND b.dim = c.dim
       |  GROUP BY c.cluster, b.m2) x WHERE rn = 1),
       |vt AS (SELECT vec_id, top FROM (
       |  SELECT p.vec_id, t.top,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY SUM((p.xq - t.tq) * (p.xq - t.tq)), t.top) AS rn
       |  FROM p JOIN t0 t ON t.dim = p.dim
       |  GROUP BY p.vec_id, t.top) x WHERE rn = 1),
       |va AS (SELECT vec_id, m1 FROM (
       |  SELECT p.vec_id, a.m1,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY SUM((p.xq - a.aq) * (p.xq - a.aq)), a.m1) AS rn
       |  FROM p
       |  JOIN vt ON vt.vec_id = p.vec_id
       |  JOIN at ON at.top = vt.top
       |  JOIN a0 a ON a.m1 = at.m1 AND a.dim = p.dim
       |  GROUP BY p.vec_id, a.m1) x WHERE rn = 1),
       |vb AS (SELECT vec_id, m2 FROM (
       |  SELECT p.vec_id, b.m2,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY SUM((p.xq - b.bq) * (p.xq - b.bq)), b.m2) AS rn
       |  FROM p
       |  JOIN va ON va.vec_id = p.vec_id
       |  JOIN ba ON ba.m1 = va.m1
       |  JOIN b0 b ON b.m2 = ba.m2 AND b.dim = p.dim
       |  GROUP BY p.vec_id, b.m2) x WHERE rn = 1),
       |a1 AS (SELECT vec_id, cluster FROM (
       |  SELECT p.vec_id, c.cluster,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY SUM((p.xq - c.cq) * (p.xq - c.cq)), c.cluster) AS rn
       |  FROM p
       |  JOIN vb ON vb.vec_id = p.vec_id
       |  JOIN cb ON cb.m2 = vb.m2
       |  JOIN c0 c ON c.cluster = cb.cluster AND c.dim = p.dim
       |  GROUP BY p.vec_id, c.cluster) x WHERE rn = 1),
       |v AS (SELECT e.vec_id, a1.cluster,
       |  list_transform(e.embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS vq
       |  FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id),
       |n AS (SELECT vec_id, cluster, vq,
       |  list_aggregate(list_transform(vq, x -> x * x), 'sum') AS n2 FROM v),
       |d AS (SELECT DISTINCT b.vec_id
       |  FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE list_aggregate(list_transform(
       |      generate_series(1, $dims), i -> a.vq[i] * b.vq[i]), 'sum') > 0
       |    AND 25 * list_aggregate(list_transform(generate_series(1, $dims),
       |          i -> a.vq[i] * b.vq[i]), 'sum')
       |        * list_aggregate(list_transform(generate_series(1, $dims),
       |          i -> a.vq[i] * b.vq[i]), 'sum')
       |      >= 4 * a.n2 * b.n2)
       |SELECT n.vec_id, n.cluster,
       |  (d.vec_id IS NOT NULL) AS is_dropped
       |FROM n LEFT JOIN d ON d.vec_id = n.vec_id""".stripMargin

  private lazy val q22Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
       |c AS (SELECT q.qid, e.vec_id AS neighbor_id,
       |  ${cosSql("q.qe", "e.embedding")} AS cs
       |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
       |r AS (SELECT qid, neighbor_id, cs,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, neighbor_id ASC) AS INT) AS rn
       |  FROM c)
       |SELECT qid, neighbor_id, ROUND(cs, 6) AS cos, rn FROM r WHERE rn <= 5""".stripMargin

  /** q202's unrolled greedy chain: each step is (prune selected → max-sim
    * penalty → argmax) — the same three relational moves as the Spark
    * plan, so every double folds in the same order and the argmax chain
    * matches bit-for-bit. */
  private lazy val q202Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
       |rel AS (SELECT q.qid, e.vec_id AS cand_id,
       |  ${cosSql("q.qe", "e.embedding")} AS rel, e.embedding AS emb
       |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
       |pool AS (SELECT qid, cand_id, rel, emb FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, cand_id ASC) AS rn
       |  FROM rel) WHERE rn <= $mmrPoolK),
       |sims AS (SELECT a.qid, a.cand_id, b.cand_id AS other_id,
       |  ${cosSql("a.emb", "b.emb")} AS sim
       |  FROM pool a JOIN pool b ON a.qid = b.qid AND a.cand_id <> b.cand_id),
       |s1 AS (SELECT qid, cand_id AS vec_id, mmr, 1 AS r FROM (
       |  SELECT qid, cand_id, 0.7 * rel - 0.3 * COALESCE(NULL, 0.0) AS mmr,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY (0.7 * rel - 0.3 * COALESCE(NULL, 0.0)) DESC, cand_id ASC) AS rn
       |  FROM pool) WHERE rn = 1),
       |pen2 AS (SELECT s.qid, s.cand_id, MAX(s.sim) AS maxsim FROM sims s
       |  JOIN s1 ON s1.qid = s.qid AND s1.vec_id = s.other_id GROUP BY 1, 2),
       |c2 AS (SELECT p.qid, p.cand_id,
       |  0.7 * p.rel - 0.3 * COALESCE(pen2.maxsim, 0.0) AS mmr
       |  FROM pool p LEFT JOIN pen2 ON pen2.qid = p.qid AND pen2.cand_id = p.cand_id
       |  WHERE NOT EXISTS (SELECT 1 FROM s1 WHERE s1.qid = p.qid AND s1.vec_id = p.cand_id)),
       |s2 AS (SELECT qid, cand_id AS vec_id, mmr, 2 AS r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr DESC, cand_id ASC) AS rn
       |  FROM c2) WHERE rn = 1),
       |sel2 AS (SELECT qid, vec_id FROM s1 UNION ALL SELECT qid, vec_id FROM s2),
       |pen3 AS (SELECT s.qid, s.cand_id, MAX(s.sim) AS maxsim FROM sims s
       |  JOIN sel2 ON sel2.qid = s.qid AND sel2.vec_id = s.other_id GROUP BY 1, 2),
       |c3 AS (SELECT p.qid, p.cand_id,
       |  0.7 * p.rel - 0.3 * COALESCE(pen3.maxsim, 0.0) AS mmr
       |  FROM pool p LEFT JOIN pen3 ON pen3.qid = p.qid AND pen3.cand_id = p.cand_id
       |  WHERE NOT EXISTS (SELECT 1 FROM sel2 WHERE sel2.qid = p.qid AND sel2.vec_id = p.cand_id)),
       |s3 AS (SELECT qid, cand_id AS vec_id, mmr, 3 AS r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr DESC, cand_id ASC) AS rn
       |  FROM c3) WHERE rn = 1),
       |allr AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
       |SELECT qid, CAST(r AS INT) AS sel_rank, vec_id, ROUND(mmr, 6) AS mmr FROM allr""".stripMargin

  private lazy val q23Sql: String =
    s"""WITH ${pnCte("embeddings")},
       |bl AS (SELECT vec_id,
       |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
       |  FROM embeddings CROSS JOIN pn),
       |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
       |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
       |qb AS (SELECT vec_id AS qid, tbl, bucket FROM tb WHERE vec_id < $nQueries),
       |cand AS (SELECT DISTINCT qb.qid, e.vec_id AS neighbor_id
       |  FROM tb e JOIN qb ON e.tbl = qb.tbl AND e.bucket = qb.bucket
       |  WHERE e.vec_id <> qb.qid),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
       |c AS (SELECT cand.qid, cand.neighbor_id,
       |  ${cosSql("q.qe", "e.embedding")} AS cs
       |  FROM cand
       |  JOIN q ON q.qid = cand.qid
       |  JOIN embeddings e ON e.vec_id = cand.neighbor_id),
       |r AS (SELECT qid, neighbor_id, cs,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, neighbor_id ASC) AS INT) AS rn
       |  FROM c)
       |SELECT qid, neighbor_id, ROUND(cs, 6) AS cos, rn FROM r WHERE rn <= 3""".stripMargin

  // q23's CTE chain plus the probe expansion: own bucket UNION ALL every
  // 1-bit flip, gated j < pn.pn (same adaptive-granularity trick as
  // bucketSql — static SQL, runtime plane count)
  private lazy val q185Sql: String =
    s"""WITH ${pnCte("embeddings")},
       |bl AS (SELECT vec_id,
       |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
       |  FROM embeddings CROSS JOIN pn),
       |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
       |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
       |qb AS (SELECT vec_id AS qid, tbl, bucket FROM tb WHERE vec_id < $nQueries),
       |qp AS (SELECT qid, tbl, bucket FROM qb
       |  UNION ALL
       |  SELECT qid, tbl, xor(bucket, (1::BIGINT << u.j)) AS bucket
       |  FROM qb
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${Similarity.MaxPlanesPerTable - 1})) AS j) u
       |  CROSS JOIN pn WHERE u.j < pn.pn),
       |cand AS (SELECT DISTINCT qp.qid, e.vec_id AS neighbor_id
       |  FROM tb e JOIN qp ON e.tbl = qp.tbl AND e.bucket = qp.bucket
       |  WHERE e.vec_id <> qp.qid),
       |nc AS (SELECT qid, COUNT(*) AS n_cand FROM cand GROUP BY qid),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
       |c AS (SELECT cand.qid, cand.neighbor_id,
       |  ${cosSql("q.qe", "e.embedding")} AS cs
       |  FROM cand
       |  JOIN q ON q.qid = cand.qid
       |  JOIN embeddings e ON e.vec_id = cand.neighbor_id),
       |r AS (SELECT qid, neighbor_id, cs,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, neighbor_id ASC) AS INT) AS rn
       |  FROM c)
       |SELECT r.qid, nc.n_cand, r.neighbor_id, ROUND(r.cs, 6) AS cos, r.rn
       |FROM r JOIN nc ON nc.qid = r.qid WHERE r.rn <= 3""".stripMargin

  private lazy val q29IvfSql: String = q29IvfSqlAt(nProbe)

  /** The IVF oracle at an explicit probe width — q188's three arms replay
    * it at np ∈ {1, 2, 4} over the same kmeans CTE chain. */
  private def q29IvfSqlAt(np: Int): String =
    s"""WITH $kmeansCtes,
       |cent AS (SELECT cluster AS cid,
       |  list(CAST(cq - 1000000 AS DOUBLE) / 1e6 ORDER BY dim) AS ce
       |  FROM c$kmeansRounds GROUP BY cluster),
       |scored AS (SELECT e.vec_id, c.cid,
       |  ${cosSql("e.embedding", "c.ce")} AS cs
       |  FROM embeddings e CROSS JOIN cent c),
       |ranked AS (SELECT vec_id, cid, cs,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
       |  FROM scored),
       |assigned AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM ranked
       |  WHERE vec_id < $nQueries AND rn <= $np),
       |cand AS (SELECT DISTINCT q.qid, a.vec_id AS neighbor_id
       |  FROM assigned a JOIN qprobe q ON a.cell = q.cell
       |  WHERE a.vec_id <> q.qid),
       |c AS (SELECT cand.qid, cand.neighbor_id,
       |  ${cosSql("eq.embedding", "en.embedding")} AS cs
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.qid
       |  JOIN embeddings en ON en.vec_id = cand.neighbor_id),
       |r AS (SELECT qid, neighbor_id, cs,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, neighbor_id ASC) AS INT) AS rn
       |  FROM c)
       |SELECT qid, neighbor_id, ROUND(cs, 6) AS cos, rn FROM r WHERE rn <= 3""".stripMargin

  /** q213: SQ8 scalar-quantization retrieval audit — the FAISS-style
    * 8-bit scalar quantizer (symmetric, one global scale) that cuts
    * vector bytes 4x at rest and in flight at 100 TB, priced for
    * retrieval quality against the exact float arm. One 1-row max|x|
    * aggregate fixes the scale (exact: abs/cast/max do no rounding, so
    * the collected double and the oracle's CTE-computed double are the
    * same value); one narrow pass quantizes q_i = floor(x_i * 127 /
    * max|x|) into [-127, 127]; scoring is the EXACT integer dot
    * (long_vec_dot - 64 dims * 127^2 is far inside int64, and integer
    * scores make the top-k ordering bit-stable in a way the float arm's
    * double cosines can never be across engines). Output: the sq8 top-5
    * per probe with each neighbor flagged in/out of the exact float
    * top-5 - the recall evidence, per rank, in-schema.
    *
    * Scale posture: the brute-force broadcast arm is the audit's
    * ground-truth posture (q22's); in production the quantized vectors
    * drop into the SAME IVF bucketing as q29 - the quantizer composes
    * with the candidate-bounding layer, it does not replace it. The
    * storage win lands when the lake materializes qv as bytes
    * (VectorLake's layout seam); in-plan the win this query demonstrates
    * is integer scoring + the measured recall price of 8 bits. */
  /** SQ8 quantizer column over `embedding`: one 1-row max|x| aggregate
    * (the bounded-collect class; exact — abs/cast/max do no rounding)
    * fixes the global symmetric scale, then q_i = floor(x_i * 127 /
    * max|x|) in [-127, 127]. Shared by q213 (brute-force audit) and
    * q214 (IVF-bounded scoring). */
  private def sq8QvCol(emb: DataFrame): Column =
    Similarity.sq8Quantize(col("embedding"), Similarity.sq8MaxAbs(emb))

  /** The exact float top-5 as (qid, neighbor_id, hit=1) — the ground
    * truth both sq8 audits flag against. */
  private def exactTop5Flags(spark: SparkSession, dir: String): DataFrame =
    q22CosineTopK(spark, dir)
      .select(col("qid"), col("neighbor_id"), lit(1L).as("hit"))

  def q213Sq8Recall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qemb = emb.select(col("vec_id"), sq8QvCol(emb).as("qv"))
    val q = qemb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val sq8 = qemb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.longVecDot(col("qq"), col("qv")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
    sq8.join(exactTop5Flags(spark, dir), Seq("qid", "neighbor_id"), "left")
      .select(col("qid"), col("rn").cast("long").as("rn"), col("neighbor_id"),
        col("score").as("score_int"),
        coalesce(col("hit"), lit(0L)).as("in_exact_top5"))
  }

  /** q214: the production ANN shape — IVF candidate bounding COMPOSED
    * with SQ8 integer scoring (FAISS's IVF-SQ recipe). The coarse
    * quantizer is q29's trained k-means centroid table operating on the
    * FLOAT vectors (the index structure); inside the probed cells the
    * stored/scored format is q213's quantized vectors with the exact
    * integer dot. This is the plan a 100 TB vector corpus actually runs:
    * the cell equi-join bounds candidates (never a global self-join),
    * the scan side carries 8-bit payloads (4x less IO), and the scoring
    * kernel is integer SIMD-class work. Output mirrors q213 (sq8-ranked
    * top-5 per probe, flagged vs the exact float top-5) so the two
    * audits read side by side: q213 prices the quantizer alone,
    * q214 prices quantizer + candidate bounding. Probe width = the q29
    * default ([[nProbe]]); candidate dedup across overlapping probes
    * keeps the ranking well-defined. */
  def q214IvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = ivfCentroids(spark, dir)
    def rankedCellsV(vec: Column) = rankedCells(cents)(vec)
    val qv = sq8QvCol(emb)
    val assigned = emb.select(col("vec_id"), qv.as("qv"),
      element_at(rankedCellsV(col("embedding")), 1).getField("cid").as("cell"))
    val qprobe = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), qv.as("qq"),
        explode(slice(rankedCellsV(col("embedding")), 1, nProbe)).as("pc"))
      .select(col("qid"), col("qq"), col("pc.cid").as("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val sq8 = assigned.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.longVecDot(col("qq"), col("qv")).as("score"))
      .dropDuplicates("qid", "neighbor_id") // probed cells can overlap
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
    sq8.join(exactTop5Flags(spark, dir), Seq("qid", "neighbor_id"), "left")
      .select(col("qid"), col("rn").cast("long").as("rn"), col("neighbor_id"),
        col("score").as("score_int"),
        coalesce(col("hit"), lit(0L)).as("in_exact_top5"))
  }

  /** q215: the two production ANN dials priced JOINTLY — IVF-SQ (q214's
    * composition: trained coarse quantizer bounding candidates, SQ8
    * integer scoring inside the probed cells) audited at nProbe ∈
    * {1, 2, 4} in ONE oracle-checked table. q188 prices the nProbe dial
    * on float scoring and q213/q214 price the quantizer at one fixed
    * probe width; the tuning decision a 100 TB deployment actually makes
    * is the CROSS — how much recall each probed cell buys back once the
    * payloads are 8-bit. Per (np, qid) row: the candidate count (the
    * dial's cost — rows scored per query) and the sq8 top-5's overlap
    * with the exact float top-5 (the dial's value). ONE training pass
    * and ONE quantization pass feed all three arms: the probe lists at
    * every width come from the same per-row ranked-cell array (width-1
    * probes ⊆ width-2 ⊆ width-4 by construction), so the three arms add
    * candidate volume, never plan shape. */
  def q215IvfSqNprobe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = ivfCentroids(spark, dir)
    def rankedCellsV(vec: Column) = rankedCells(cents)(vec)
    val qv = sq8QvCol(emb)
    val assigned = emb.select(col("vec_id"), qv.as("qv"),
      element_at(rankedCellsV(col("embedding")), 1).getField("cid").as("cell"))
    val qprobe = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), qv.as("qq"),
        rankedCellsV(col("embedding")).as("cells"))
      .select(col("qid"), col("qq"),
        explode(typedLit(Seq(1, 2, 4))).as("np"), col("cells"))
      .select(col("np"), col("qid"), col("qq"),
        explode(slice(col("cells"), lit(1), col("np"))).as("pc"))
      .select(col("np"), col("qid"), col("qq"), col("pc.cid").as("cell"))
    val cand = assigned.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("np"), col("qid"), col("vec_id").as("neighbor_id"),
        graft.functions.GraftFunctions.longVecDot(col("qq"), col("qv")).as("score"))
      .dropDuplicates("np", "qid", "neighbor_id") // probed cells can overlap
    // cand feeds BOTH the recall arm and the candidate-count arm — lazily
    // each reference re-ran the corpus quantize + cell-rank + candidate
    // join (measured 39.0 s / 845 cpu-s at the 100× rung). Persist it and
    // evaluate the 24-row result eagerly (the q139/q188 composing-query
    // posture) so the cache is released before return.
    graft.ops.Caching.withPersisted(cand) {
      val w = Window.partitionBy(col("np"), col("qid"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val hits = cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .join(exactTop5Flags(spark, dir), Seq("qid", "neighbor_id"), "left")
        .groupBy(col("np"), col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("sq_hits5"))
      val nc = cand.groupBy(col("np"), col("qid"))
        .agg(count(lit(1)).as("n_cand"))
      val row = hits.join(nc, Seq("np", "qid"))
        .select(col("np").cast("long").as("np"), col("qid"),
          col("n_cand"), col("sq_hits5"))
      val out = row.collect()
      spark.createDataFrame(java.util.Arrays.asList(out: _*), row.schema)
    }
  }

  val oracles: Map[String, String] = Map(
    "q213_sq8_recall" ->
      s"""WITH ma AS (SELECT MAX(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))),
         |    (a, b) -> greatest(a, b))) AS m FROM embeddings),
         |qe AS (SELECT vec_id, list_transform(embedding,
         |    v -> GREATEST(CAST(-127 AS BIGINT), LEAST(CAST(127 AS BIGINT),
         |      CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / ma.m) AS BIGINT)))) AS qv
         |  FROM embeddings, ma),
         |q AS (SELECT vec_id AS qid, qv AS qq FROM qe WHERE vec_id < $nQueries),
         |s AS (SELECT q.qid, e.vec_id AS neighbor_id,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(generate_series(1, len(q.qq)), i -> q.qq[i] * e.qv[i])),
         |    (x, y) -> x + y) AS score
         |  FROM q CROSS JOIN qe e WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, neighbor_id, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rn FROM s),
         |ex AS (SELECT qid, neighbor_id, 1 AS hit FROM (
         |  SELECT q2.qid, e2.vec_id AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q2.qid
         |      ORDER BY ${cosSql("q2.qe", "e2.embedding")} DESC, e2.vec_id ASC)
         |      AS INT) AS rn2
         |  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |        WHERE vec_id < $nQueries) q2
         |  CROSS JOIN embeddings e2 WHERE e2.vec_id <> q2.qid) t WHERE rn2 <= 5)
         |SELECT r.qid, r.rn, r.neighbor_id, r.score AS score_int,
         |  CAST(COALESCE(ex.hit, 0) AS BIGINT) AS in_exact_top5
         |FROM r LEFT JOIN ex ON ex.qid = r.qid AND ex.neighbor_id = r.neighbor_id
         |WHERE r.rn <= 5""".stripMargin,

    // q214 = q29's coarse-quantizer replay (kmeansCtes -> cell assignment
    // and probe list on the FLOAT vectors) + q213's sq8 replay (scale,
    // quantized vectors, integer dot) inside the probed cells
    "q214_ivf_sq8" ->
      s"""WITH $kmeansCtes,
         |cent AS (SELECT cluster AS cid,
         |  list(CAST(cq - 1000000 AS DOUBLE) / 1e6 ORDER BY dim) AS ce
         |  FROM c$kmeansRounds GROUP BY cluster),
         |cscored AS (SELECT e.vec_id, cc.cid,
         |  ${cosSql("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cent cc),
         |cranked AS (SELECT vec_id, cid, cs,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS crn
         |  FROM cscored),
         |assigned AS (SELECT vec_id, cid AS cell FROM cranked WHERE crn = 1),
         |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM cranked
         |  WHERE vec_id < $nQueries AND crn <= $nProbe),
         |ma AS (SELECT MAX(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))),
         |    (a, b) -> greatest(a, b))) AS m FROM embeddings),
         |sqv AS (SELECT vec_id, list_transform(embedding,
         |    v -> GREATEST(CAST(-127 AS BIGINT), LEAST(CAST(127 AS BIGINT),
         |      CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / ma.m) AS BIGINT)))) AS qv
         |  FROM embeddings, ma),
         |cand AS (SELECT DISTINCT q.qid, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN qprobe q ON a.cell = q.cell
         |  WHERE a.vec_id <> q.qid),
         |s2 AS (SELECT cand.qid, cand.neighbor_id,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(generate_series(1, len(eq.qv)), i -> eq.qv[i] * en.qv[i])),
         |    (x, y) -> x + y) AS score
         |  FROM cand
         |  JOIN sqv eq ON eq.vec_id = cand.qid
         |  JOIN sqv en ON en.vec_id = cand.neighbor_id),
         |r2 AS (SELECT qid, neighbor_id, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rn FROM s2),
         |ex2 AS (SELECT qid, neighbor_id, 1 AS hit FROM (
         |  SELECT q2.qid, e2.vec_id AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q2.qid
         |      ORDER BY ${cosSql("q2.qe", "e2.embedding")} DESC, e2.vec_id ASC)
         |      AS INT) AS rn2
         |  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |        WHERE vec_id < $nQueries) q2
         |  CROSS JOIN embeddings e2 WHERE e2.vec_id <> q2.qid) t WHERE rn2 <= 5)
         |SELECT r2.qid, r2.rn, r2.neighbor_id, r2.score AS score_int,
         |  CAST(COALESCE(ex2.hit, 0) AS BIGINT) AS in_exact_top5
         |FROM r2 LEFT JOIN ex2 ON ex2.qid = r2.qid AND ex2.neighbor_id = r2.neighbor_id
         |WHERE r2.rn <= 5""".stripMargin,

    // q214's replay with the probe width lifted into a probes CTE: the
    // same kmeans chain, cell ranking, sq8 scale and integer dot — each
    // (np, qid) arm is the crn <= np slice of ONE ranked-cell table
    "q215_ivfsq_nprobe" ->
      s"""WITH $kmeansCtes,
         |cent AS (SELECT cluster AS cid,
         |  list(CAST(cq - 1000000 AS DOUBLE) / 1e6 ORDER BY dim) AS ce
         |  FROM c$kmeansRounds GROUP BY cluster),
         |cscored AS (SELECT e.vec_id, cc.cid,
         |  ${cosSql("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cent cc),
         |cranked AS (SELECT vec_id, cid, cs,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS crn
         |  FROM cscored),
         |assigned AS (SELECT vec_id, cid AS cell FROM cranked WHERE crn = 1),
         |probes AS (SELECT unnest([1, 2, 4]) AS np),
         |qprobe AS (SELECT p.np, c.vec_id AS qid, c.cid AS cell
         |  FROM cranked c CROSS JOIN probes p
         |  WHERE c.vec_id < $nQueries AND c.crn <= p.np),
         |ma AS (SELECT MAX(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))),
         |    (a, b) -> greatest(a, b))) AS m FROM embeddings),
         |sqv AS (SELECT vec_id, list_transform(embedding,
         |    v -> GREATEST(CAST(-127 AS BIGINT), LEAST(CAST(127 AS BIGINT),
         |      CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / ma.m) AS BIGINT)))) AS qv
         |  FROM embeddings, ma),
         |cand AS (SELECT DISTINCT q.np, q.qid, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN qprobe q ON a.cell = q.cell
         |  WHERE a.vec_id <> q.qid),
         |s2 AS (SELECT cand.np, cand.qid, cand.neighbor_id,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(generate_series(1, len(eq.qv)), i -> eq.qv[i] * en.qv[i])),
         |    (x, y) -> x + y) AS score
         |  FROM cand
         |  JOIN sqv eq ON eq.vec_id = cand.qid
         |  JOIN sqv en ON en.vec_id = cand.neighbor_id),
         |r2 AS (SELECT np, qid, neighbor_id, score,
         |  ROW_NUMBER() OVER (PARTITION BY np, qid
         |    ORDER BY score DESC, neighbor_id ASC) AS rn FROM s2),
         |ex2 AS (SELECT qid, neighbor_id, 1 AS hit FROM (
         |  SELECT q2.qid, e2.vec_id AS neighbor_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q2.qid
         |      ORDER BY ${cosSql("q2.qe", "e2.embedding")} DESC, e2.vec_id ASC)
         |      AS INT) AS rn2
         |  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |        WHERE vec_id < $nQueries) q2
         |  CROSS JOIN embeddings e2 WHERE e2.vec_id <> q2.qid) t WHERE rn2 <= 5),
         |h AS (SELECT r2.np, r2.qid,
         |  CAST(SUM(COALESCE(ex2.hit, 0)) AS BIGINT) AS sq_hits5
         |  FROM r2 LEFT JOIN ex2
         |    ON ex2.qid = r2.qid AND ex2.neighbor_id = r2.neighbor_id
         |  WHERE r2.rn <= 5 GROUP BY 1, 2),
         |nc AS (SELECT np, qid, CAST(COUNT(*) AS BIGINT) AS n_cand
         |  FROM cand GROUP BY 1, 2)
         |SELECT CAST(h.np AS BIGINT) AS np, h.qid, nc.n_cand, h.sq_hits5
         |FROM h JOIN nc ON nc.np = h.np AND nc.qid = h.qid""".stripMargin,

    // q205's per-label sums, paired by a plain inequality self-join
    "q207_centroid_matrix" ->
      """WITH q AS (SELECT label, list_transform(embedding,
        |  x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (SELECT label, unnest(list_transform(generate_series(1, len(xq)),
        |  i -> struct_pack(d := i, v := xq[i]))) AS s FROM q),
        |pd AS (SELECT label, s.d AS d, CAST(SUM(s.v) AS HUGEINT) AS sv
        |  FROM e GROUP BY 1, 2),
        |n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY 1),
        |m AS (SELECT a.label AS label_a, b.label AS label_b,
        |  SUM(a.sv * b.sv) AS dot_ab,
        |  SUM(a.sv * a.sv) AS dot_aa,
        |  SUM(b.sv * b.sv) AS dot_bb
        |  FROM pd a JOIN pd b ON a.d = b.d AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b, na.n AS n_a, nb.n AS n_b,
        |  ROUND(CAST(dot_ab AS DOUBLE) /
        |    nullif(sqrt(CAST(dot_aa AS DOUBLE) * CAST(dot_bb AS DOUBLE)), 0.0),
        |    6) AS cos_ab
        |FROM m JOIN n na ON na.label = m.label_a
        |       JOIN n nb ON nb.label = m.label_b""".stripMargin,

    // same quantized integer sums; HUGEINT moments are exact like the
    // decimal(38,0) ones, and the single double division matches
    "q205_centroid_shift" ->
      """WITH q AS (SELECT label, list_transform(embedding,
        |  x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
        |  FROM embeddings),
        |e AS (SELECT label, unnest(list_transform(generate_series(1, len(xq)),
        |  i -> struct_pack(d := i, v := xq[i]))) AS s FROM q),
        |pd AS (SELECT label, s.d AS d, CAST(SUM(s.v) AS HUGEINT) AS sv
        |  FROM e GROUP BY 1, 2),
        |n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY 1),
        |td AS (SELECT d, SUM(sv) AS tv FROM pd GROUP BY 1),
        |m AS (SELECT label,
        |  SUM(sv * (tv - sv)) AS dot_st,
        |  SUM(sv * sv) AS dot_ss,
        |  SUM((tv - sv) * (tv - sv)) AS dot_tt
        |  FROM pd JOIN td USING (d) GROUP BY 1)
        |SELECT m.label, n.n,
        |  CAST((SELECT SUM(n) FROM n) - n.n AS BIGINT) AS n_rest,
        |  ROUND(CAST(dot_st AS DOUBLE) /
        |    nullif(sqrt(CAST(dot_ss AS DOUBLE) * CAST(dot_tt AS DOUBLE)), 0.0),
        |    6) AS cos_shift
        |FROM m JOIN n USING (label)""".stripMargin,

    "q174_bitext_mining" ->
      s"""WITH ${pnCte("embeddings")},
         |tagged AS (SELECT e.vec_id, e.embedding, d.lang
         |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         |bl AS (SELECT vec_id, lang,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM tagged CROSS JOIN pn),
         |tb AS (SELECT vec_id, lang, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |qb AS (SELECT vec_id AS qid, tbl, bucket FROM tb WHERE lang <> 'en'),
         |eb AS (SELECT vec_id AS cand_id, tbl, bucket FROM tb WHERE lang = 'en'),
         |cand AS (SELECT DISTINCT qb.qid, eb.cand_id
         |  FROM qb JOIN eb ON qb.tbl = eb.tbl AND qb.bucket = eb.bucket),
         |c AS (SELECT cand.qid, cand.cand_id,
         |  ${cosSql("eq.embedding", "ec.embedding")} AS cs
         |  FROM cand
         |  JOIN embeddings eq ON eq.vec_id = cand.qid
         |  JOIN embeddings ec ON ec.vec_id = cand.cand_id),
         |r AS (SELECT qid, cand_id, cs,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cs DESC, cand_id ASC) AS rn
         |  FROM c),
         |g AS (SELECT qid,
         |  MAX(CASE WHEN rn = 1 THEN cand_id END) AS best_en,
         |  ROUND(MAX(CASE WHEN rn = 1 THEN cs END), 6) AS cos,
         |  ROUND(MAX(CASE WHEN rn = 1 THEN cs END)
         |    - MAX(CASE WHEN rn = 2 THEN cs END), 6) AS margin
         |  FROM r WHERE rn <= 2 GROUP BY qid)
         |SELECT t.vec_id, t.lang, g.best_en, g.cos, g.margin
         |FROM tagged t LEFT JOIN g ON g.qid = t.vec_id
         |WHERE t.lang <> 'en'""".stripMargin,

    "q142_kmeans_iters" -> kmeansSql,
    "q180_pca_power" -> pcaPowerSql,
    "q157_semdedup" -> semdedupSql,
    "q122_hof_surface" ->
      """WITH q AS (SELECT vec_id, embedding AS e,
        |  list_transform(embedding,
        |    x -> CAST(FLOOR(ABS(CAST(x AS DOUBLE)) * 1e6) AS BIGINT)) AS aq
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(list_filter(e, x -> CAST(x AS DOUBLE) > 0.0)) AS BIGINT) AS n_pos,
        |  len(list_filter(e, x -> CAST(x AS DOUBLE) > 0.32)) > 0 AS has_big,
        |  len(list_filter(e, x -> NOT (ABS(CAST(x AS DOUBLE)) < 0.4))) = 0 AS in_range,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), aq),
        |    (a, b) -> a + b) AS DOUBLE) / 1e6 AS l1,
        |  CAST(list_max(aq) AS DOUBLE) / 1e6 AS max_abs
        |FROM q""".stripMargin,

    "q112_class_separation" ->
      s"""WITH cm AS (SELECT label, CAST(i - 1 AS INT) AS dim,
         |  CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / COUNT(*) AS mean
         |  FROM embeddings
         |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) u
         |  GROUP BY label, i),
         |cent AS (SELECT label AS c_label, list(mean ORDER BY dim) AS centroid
         |  FROM cm GROUP BY 1),
         |sc AS (SELECT e.vec_id, e.label, e.label = c.c_label AS own,
         |  ${cosSql("e.embedding", "c.centroid")} AS cs
         |  FROM embeddings e CROSS JOIN cent c),
         |p AS (SELECT vec_id, label,
         |  MAX(CASE WHEN own THEN cs END) AS own_cs,
         |  MAX(CASE WHEN NOT own THEN cs END) AS other_cs
         |  FROM sc GROUP BY 1, 2)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(FLOOR(own_cs * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS intra_cos,
         |  CAST(SUM(CAST(FLOOR(other_cs * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS inter_cos,
         |  CAST(SUM(CAST(FLOOR(own_cs * 1e6) AS BIGINT))
         |    - SUM(CAST(FLOOR(other_cs * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*) AS margin
         |FROM p GROUP BY label""".stripMargin,

    "q106_contrastive_triplets" ->
      s"""WITH ${pnCte("embeddings")},
         |bl AS (SELECT vec_id,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM embeddings CROSS JOIN pn),
         |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |qb AS (SELECT vec_id AS qid, tbl, bucket FROM tb WHERE vec_id % 25 = 0),
         |cand AS (SELECT DISTINCT qb.qid, e.vec_id AS nid
         |  FROM tb e JOIN qb ON e.tbl = qb.tbl AND e.bucket = qb.bucket
         |  WHERE e.vec_id <> qb.qid),
         |s AS (SELECT cand.qid, cand.nid, en.label = eq.label AS same,
         |  ${cosSql("eq.embedding", "en.embedding")} AS cs
         |  FROM cand
         |  JOIN embeddings eq ON eq.vec_id = cand.qid
         |  JOIN embeddings en ON en.vec_id = cand.nid),
         |r AS (SELECT qid, nid, same, cs,
         |  ROW_NUMBER() OVER (PARTITION BY qid, same ORDER BY cs DESC, nid ASC) AS rn
         |  FROM s),
         |g AS (SELECT qid,
         |  MAX(CASE WHEN same THEN nid END) AS pos_id,
         |  MAX(CASE WHEN NOT same THEN nid END) AS neg_id,
         |  ROUND(MAX(CASE WHEN same THEN cs END), 6) AS pos_cos,
         |  ROUND(MAX(CASE WHEN NOT same THEN cs END), 6) AS neg_cos,
         |  ROUND(MAX(CASE WHEN same THEN cs END)
         |    - MAX(CASE WHEN NOT same THEN cs END), 6) AS margin
         |  FROM r WHERE rn = 1 GROUP BY qid)
         |SELECT a.vec_id AS qid, a.label AS q_label,
         |  g.pos_id, g.neg_id, g.pos_cos, g.neg_cos, g.margin
         |FROM embeddings a LEFT JOIN g ON g.qid = a.vec_id
         |WHERE a.vec_id % 25 = 0""".stripMargin,

    "q97_rank_normalize" ->
      """WITH f AS (SELECT vec_id, CAST(u.i - 1 AS INT) AS dim, embedding[u.i] AS v
        |  FROM embeddings CROSS JOIN
        |    (SELECT unnest(generate_series(1, 8)) AS i) u),
        |r AS (SELECT vec_id, dim, v,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY dim ORDER BY v ASC, vec_id ASC) AS INT) AS rk,
        |  COUNT(*) OVER (PARTITION BY dim) AS n
        |  FROM f)
        |SELECT vec_id, dim, rk,
        |  ROUND(CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6) AS qnorm
        |FROM r""".stripMargin,

    "q90_hard_negatives" ->
      s"""WITH ${pnCte("embeddings")},
         |bl AS (SELECT vec_id,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM embeddings CROSS JOIN pn),
         |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |qb AS (SELECT vec_id AS qid, tbl, bucket FROM tb WHERE vec_id % 25 = 0),
         |cand AS (SELECT DISTINCT qb.qid, e.vec_id AS nid
         |  FROM tb e JOIN qb ON e.tbl = qb.tbl AND e.bucket = qb.bucket
         |  WHERE e.vec_id <> qb.qid),
         |s AS (SELECT cand.qid, eq.label AS q_label, cand.nid,
         |  en.label AS n_label, ${cosSql("eq.embedding", "en.embedding")} AS cs
         |  FROM cand
         |  JOIN embeddings eq ON eq.vec_id = cand.qid
         |  JOIN embeddings en ON en.vec_id = cand.nid),
         |r AS (SELECT qid, nid, n_label, cs,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rn
         |  FROM s WHERE n_label <> q_label),
         |b AS (SELECT qid, nid AS neg_id, n_label AS neg_label,
         |  ROUND(cs, 6) AS cos FROM r WHERE rn = 1)
         |SELECT a.vec_id AS qid, a.label AS q_label,
         |  b.neg_id, b.neg_label, b.cos
         |FROM embeddings a LEFT JOIN b ON b.qid = a.vec_id
         |WHERE a.vec_id % 25 = 0""".stripMargin,

    "q83_embed_decontam" ->
      s"""WITH ${pnCte("embeddings")},
         |bl AS (SELECT vec_id,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM embeddings CROSS JOIN pn),
         |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |cand AS (SELECT DISTINCT c.vec_id AS vid, b.vec_id AS bid
         |  FROM tb c JOIN tb b ON c.tbl = b.tbl AND c.bucket = b.bucket
         |  JOIN embeddings ec ON ec.vec_id = c.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ec.label <> 0 AND eb.label = 0),
         |s AS (SELECT cand.vid, cand.bid,
         |  ${cosSql("e1.embedding", "e2.embedding")} AS cs
         |  FROM cand
         |  JOIN embeddings e1 ON e1.vec_id = cand.vid
         |  JOIN embeddings e2 ON e2.vec_id = cand.bid)
         |SELECT vid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  ROUND(MAX(cs), 6) AS max_cos
         |FROM s WHERE cs >= 0.3 GROUP BY vid""".stripMargin,

    // same quantized-integer moments, same final-scalar expression shape
    "q79_embed_dim_stats" ->
      """WITH p AS (SELECT unnest(list_transform(generate_series(1, len(embedding)),
        |  i -> struct_pack(dim := i - 1, v := embedding[i]))) AS s FROM embeddings),
        |e AS (SELECT CAST(s.dim AS INT) AS dim, CAST(s.v AS DOUBLE) AS v,
        |  CAST(FLOOR(CAST(s.v AS DOUBLE) * 1e6) AS BIGINT) AS q FROM p),
        |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(q) AS s1, SUM(q * q) AS s2,
        |  MIN(v) AS v_min, MAX(v) AS v_max FROM e GROUP BY dim)
        |SELECT dim, n,
        |  ROUND(CAST(s1 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6) AS mean,
        |  ROUND(SQRT(GREATEST(0.0,
        |    CAST(s2 AS DOUBLE) / 1e12 / CAST(n AS DOUBLE)
        |    - (CAST(s1 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)))), 6) AS std,
        |  v_min, v_max
        |FROM a""".stripMargin,

    "q60_quantize_audit" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  CAST(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        |    (a, b) -> GREATEST(a, b)) AS DOUBLE) AS max_abs
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, max_abs,
        |  127.0::DOUBLE / NULLIF(max_abs, 0) AS scale FROM m),
        |q AS (SELECT vec_id, embedding, max_abs, scale,
        |  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * scale, 0)) AS qv
        |  FROM s)
        |SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  ROUND(max_abs, 6) AS max_abs,
        |  ROUND(scale, 6) AS scale,
        |  CAST(len(list_filter(qv, v -> abs(v) >= 127)) AS BIGINT) AS n_at_rail,
        |  ROUND(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(generate_series(1, len(embedding)),
        |      i -> (CAST(embedding[i] AS DOUBLE) - qv[i] / scale)
        |         * (CAST(embedding[i] AS DOUBLE) - qv[i] / scale))),
        |    (a, b) -> a + b), 8) AS sse
        |FROM q""".stripMargin,

    "q22_cosine_topk" -> q22Sql,

    "q202_mmr_select" -> q202Sql,

    "q28_cosine_neardup" ->
      s"""WITH ${pnCte("embeddings")},
         |bl AS (SELECT vec_id,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM embeddings CROSS JOIN pn),
         |tb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM bl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |pairs AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
         |  FROM tb a JOIN tb b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  WHERE a.vec_id < b.vec_id),
         |c AS (SELECT p.id1, p.id2,
         |  ${cosSql("e1.embedding", "e2.embedding")} AS cs
         |  FROM pairs p
         |  JOIN embeddings e1 ON e1.vec_id = p.id1
         |  JOIN embeddings e2 ON e2.vec_id = p.id2)
         |SELECT id1, id2, ROUND(cs, 6) AS cos FROM c WHERE cs >= 0.3""".stripMargin,

    "q29_ann_ivf" -> q29IvfSql,

    "q39_centroids" ->
      s"""SELECT label, CAST(i - 1 AS INT) AS dim,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / COUNT(*) AS mean
         |FROM embeddings
         |CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) u
         |GROUP BY label, i""".stripMargin,

    "q23_ann_srp" -> q23Sql,

    "q185_multiprobe_ann" -> q185Sql,

    // the three approximate arms' full oracle SQL replayed as subquery
    // CTE sources against the exact arm's top-3 — pure integer hit
    // counts and ppm recalls (// on non-negatives == Spark DIV)
    "q188_ann_recall" ->
      s"""WITH ex AS (SELECT qid, neighbor_id FROM ($q22Sql) WHERE rn <= 3),
         |srp AS (SELECT qid, neighbor_id FROM ($q23Sql)),
         |mp AS (SELECT qid, neighbor_id FROM ($q185Sql)),
         |ivf1 AS (SELECT qid, neighbor_id FROM (${q29IvfSqlAt(1)})),
         |ivf AS (SELECT qid, neighbor_id FROM ($q29IvfSql)),
         |ivf4 AS (SELECT qid, neighbor_id FROM (${q29IvfSqlAt(4)})),
         |hs AS (SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS srp_hits
         |  FROM ex JOIN srp USING (qid, neighbor_id) GROUP BY 1),
         |hm AS (SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS mp_hits
         |  FROM ex JOIN mp USING (qid, neighbor_id) GROUP BY 1),
         |hi1 AS (SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS ivf_np1_hits
         |  FROM ex JOIN ivf1 USING (qid, neighbor_id) GROUP BY 1),
         |hi AS (SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS ivf_hits
         |  FROM ex JOIN ivf USING (qid, neighbor_id) GROUP BY 1),
         |hi4 AS (SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS ivf_np4_hits
         |  FROM ex JOIN ivf4 USING (qid, neighbor_id) GROUP BY 1),
         |qs AS (SELECT DISTINCT qid FROM ex)
         |SELECT qs.qid, CAST(3 AS BIGINT) AS k,
         |  COALESCE(hs.srp_hits, 0) AS srp_hits,
         |  COALESCE(hm.mp_hits, 0) AS mp_hits,
         |  COALESCE(hi1.ivf_np1_hits, 0) AS ivf_np1_hits,
         |  COALESCE(hi.ivf_hits, 0) AS ivf_hits,
         |  COALESCE(hi4.ivf_np4_hits, 0) AS ivf_np4_hits,
         |  COALESCE(hs.srp_hits, 0) * 1000000 // 3 AS srp_recall_ppm,
         |  COALESCE(hm.mp_hits, 0) * 1000000 // 3 AS mp_recall_ppm,
         |  COALESCE(hi1.ivf_np1_hits, 0) * 1000000 // 3 AS ivf_np1_recall_ppm,
         |  COALESCE(hi.ivf_hits, 0) * 1000000 // 3 AS ivf_recall_ppm,
         |  COALESCE(hi4.ivf_np4_hits, 0) * 1000000 // 3 AS ivf_np4_recall_ppm
         |FROM qs
         |LEFT JOIN hs ON hs.qid = qs.qid
         |LEFT JOIN hm ON hm.qid = qs.qid
         |LEFT JOIN hi1 ON hi1.qid = qs.qid
         |LEFT JOIN hi ON hi.qid = qs.qid
         |LEFT JOIN hi4 ON hi4.qid = qs.qid""".stripMargin,

    // lexical arm = the shared bm25 CTE chain (TextQueries); semantic arm
    // mirrors q23's SRP banding with se-prefixed CTE names; fusion is
    // exact integer 1000000 // (60 + rank) per arm
    "q181_hybrid_rrf" ->
      s"""WITH ${TextQueries.bm25ScoredSqlCtes},
         |lr AS (SELECT qid, doc_id, CAST(rn AS BIGINT) AS lex_rank FROM (
         |  SELECT qid, doc_id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score_micro DESC, doc_id ASC) AS rn FROM bm25s) x
         |  WHERE rn <= 10),
         |${pnCte("embeddings")},
         |sebl AS (SELECT vec_id,
         |  ${(0 until tables).map(t => bucketSql("embedding", t)).mkString("[", ",\n  ", "]")} AS bs
         |  FROM embeddings CROSS JOIN pn),
         |setb AS (SELECT vec_id, u.t AS tbl, bs[u.t + 1] AS bucket
         |  FROM sebl CROSS JOIN (SELECT unnest(generate_series(0, ${tables - 1})) AS t) u),
         |seqb AS (SELECT vec_id AS qid, tbl, bucket FROM setb WHERE vec_id % 100 = 0),
         |secand AS (SELECT DISTINCT seqb.qid, e.vec_id AS doc_id
         |  FROM setb e JOIN seqb ON e.tbl = seqb.tbl AND e.bucket = seqb.bucket
         |  WHERE e.vec_id % 100 <> 0),
         |seq AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 100 = 0),
         |sec AS (SELECT secand.qid, secand.doc_id,
         |  ${cosSql("seq.qe", "e.embedding")} AS cs
         |  FROM secand
         |  JOIN seq ON seq.qid = secand.qid
         |  JOIN embeddings e ON e.vec_id = secand.doc_id),
         |sr AS (SELECT qid, doc_id, CAST(rn AS BIGINT) AS sem_rank FROM (
         |  SELECT qid, doc_id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cs DESC, doc_id ASC) AS rn FROM sec) x
         |  WHERE rn <= 10),
         |f AS (SELECT COALESCE(lr.qid, sr.qid) AS qid,
         |  COALESCE(lr.doc_id, sr.doc_id) AS doc_id, lr.lex_rank, sr.sem_rank
         |  FROM lr FULL OUTER JOIN sr
         |    ON lr.qid = sr.qid AND lr.doc_id = sr.doc_id),
         |ff AS (SELECT qid, doc_id, lex_rank, sem_rank,
         |  COALESCE(1000000 // (60 + lex_rank), 0)
         |    + COALESCE(1000000 // (60 + sem_rank), 0) AS rrf_micro FROM f),
         |fr AS (SELECT qid, doc_id, rrf_micro, lex_rank, sem_rank,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS rank FROM ff)
         |SELECT qid, rank, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
         |  lex_rank, sem_rank
         |FROM fr WHERE rank <= 5""".stripMargin
  )
}
