package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.pipeline.VectorLake
import graft.sources.Tables

/** The materialized-ANN-index contracts: frozen layout across appends,
  * increment cost = increment size (existing files untouched), query
  * parity with an independent bucket reimplementation, and the occupancy
  * audit. */
class VectorLakeSpec extends SparkSpec {

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("graft_veclake").toString

  private def bucketFiles(path: String): Set[String] = {
    val d = new java.io.File(s"$path/buckets")
    d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("append buckets new vectors under the FROZEN build-time layout, not a re-derived one") {
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    val half1 = emb.filter(col("vec_id") < 250)
    val half2 = emb.filter(col("vec_id") >= 250)
    val l = VectorLake.build(spark, half1, path)
    // a full rebuild at the grown size would choose MORE planes — the
    // incompatibility append must not introduce
    assert(Similarity.adaptivePlanes(500) > l.pn)
    VectorLake.append(spark, half2, path)
    assert(VectorLake.layoutOf(spark, path) === l)
    // appended rows equal an independent re-bucketing of half2 under the
    // FROZEN layout (the composed Column form is the semantic reference)
    val got = spark.read.parquet(s"$path/buckets")
      .join(half2.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy("vec_id", "tbl")
      .collect().toSeq
    val signs = Similarity.hyperplaneSigns(
      l.tables * Similarity.MaxPlanesPerTable, l.dims)
    val expect = half2
      .select(col("vec_id"), posexplode(Similarity.srpBucketsComposed(
        col("embedding"), signs, l.tables, l.pn)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
      .orderBy("vec_id", "tbl")
      .collect().toSeq
    assert(got === expect)
  }

  test("append leaves every pre-existing index file untouched — increment cost is the increment's size") {
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    VectorLake.build(spark, emb.filter(col("vec_id") < 250), path)
    val before = bucketFiles(path)
    VectorLake.append(spark, emb.filter(col("vec_id") >= 250), path)
    val after = bucketFiles(path)
    assert(before.subsetOf(after), "append rewrote existing index files")
    assert(after.size > before.size)
  }

  test("topK: corpus queries rank themselves first; results match the banked-bucket recompute") {
    import spark.implicits._
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    VectorLake.build(spark, emb, path)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val got = VectorLake.topK(spark, queries, path, k = 3)
    val top1 = got.filter(col("rk") === 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(top1 === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // every returned neighbor shares at least one banked bucket with its
    // query (candidates come from the index, never a corpus scan)
    val l = VectorLake.layoutOf(spark, path)
    val signs = Similarity.hyperplaneSigns(
      l.tables * Similarity.MaxPlanesPerTable, l.dims)
    val qb = queries
      .select(col("qid"), posexplode(Similarity.srpBucketsComposed(
        col("qe"), signs, l.tables, l.pn)))
      .select(col("qid"), col("pos").as("tbl"), col("col").as("bucket"))
    val legal = spark.read.parquet(s"$path/buckets")
      .join(qb, Seq("tbl", "bucket"))
      .select(col("qid"), col("vec_id")).distinct()
      .as[(Long, Long)].collect().toSet
    val returned = got.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(returned.subsetOf(legal))
  }

  test("rebuild path: appends drift occupancy past the build target, the " +
      "rebuild migrates the layout, and queries stay correct across the swap") {
    import spark.implicits._
    val gen1 = freshPath()
    val gen2 = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    // build small (100 vectors), then grow the corpus 5x by appends
    val l0 = VectorLake.build(spark, emb.filter(col("vec_id") < 100), gen1)
    VectorLake.append(spark, emb.filter(col("vec_id") >= 100), gen1)
    // drift: mean occupancy under the frozen pn is now well past the
    // adaptive target (32/bucket) — the measured trigger fires
    val drifted = VectorLake.meanOccupancyPermille(spark, gen1)
    assert(drifted > 32000L * 3 / 2,
      s"occupancy $drifted permille did not drift past 1.5x the target")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val beforeTop1 = VectorLake.topK(spark, queries, gen1, k = 3)
      .filter(col("rk") === 1).select("qid", "vec_id")
      .as[(Long, Long)].collect().toMap
    // REBUILD into a new generation from the lake's own payload
    val l1 = VectorLake.rebuild(spark, gen1, gen2)
    // the new layout's pn reflects the GROWN corpus, not the build-time one
    assert(l1.pn === Similarity.adaptivePlanes(500))
    assert(l1.pn > l0.pn, s"pn did not grow: ${l0.pn} -> ${l1.pn}")
    // occupancy restored to the target's neighborhood
    val rebuilt = VectorLake.meanOccupancyPermille(spark, gen2)
    assert(rebuilt <= drifted / 2,
      s"rebuild did not restore occupancy: $drifted -> $rebuilt permille")
    // old generation untouched and still answers identically (swap-safety)
    assert(VectorLake.layoutOf(spark, gen1) === l0)
    val oldAgain = VectorLake.topK(spark, queries, gen1, k = 3)
      .filter(col("rk") === 1).select("qid", "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(oldAgain === beforeTop1)
    // new generation: every banked vector present exactly tables times,
    // queries still rank themselves first, and every result comes from a
    // banked bucket of the NEW index
    assert(spark.read.parquet(s"$gen2/buckets").count() === 500L * l1.tables)
    val got = VectorLake.topK(spark, queries, gen2, k = 3)
    val top1 = got.filter(col("rk") === 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(top1 === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    val signs = Similarity.hyperplaneSigns(
      l1.tables * Similarity.MaxPlanesPerTable, l1.dims)
    val qb = queries
      .select(col("qid"), posexplode(Similarity.srpBucketsComposed(
        col("qe"), signs, l1.tables, l1.pn)))
      .select(col("qid"), col("pos").as("tbl"), col("col").as("bucket"))
    val legal = spark.read.parquet(s"$gen2/buckets")
      .join(qb, Seq("tbl", "bucket"))
      .select(col("qid"), col("vec_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(got.select("qid", "vec_id").as[(Long, Long)].collect().toSet
      .subsetOf(legal))
  }

  test("bucketStats: occupancy histogram accounts for every banked (vector, table) row") {
    import spark.implicits._
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    val l = VectorLake.build(spark, emb, path)
    val stats = VectorLake.bucketStats(spark, path)
      .as[(Long, Long)].collect().toSeq
    assert(stats.map { case (s, n) => s * n }.sum === 500L * l.tables)
  }

  // ---- the banked quantized artifact (IVF-SQ) ----------------------------

  test("topKSq8 answers q214's IVF-SQ shape from the BANKED artifact — " +
      "same ranks, neighbors, and integer scores, zero training at query time") {
    import spark.implicits._
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.queries.SimilarityQueries.ivfCentroids(spark, sfDir)
    VectorLake.build(spark, emb, path, centroids = Some(cents))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val got = VectorLake.topKSq8(spark, queries, path, k = 5, nProbe = 2)
      .select("qid", "rk", "vec_id", "score_int")
      .as[(Long, Int, Long, Long)].collect().toSet
    // q214 re-derives scale + quantization + training every run; the lake
    // arm must reproduce its ranking exactly from the banked tables
    val expect = graft.queries.SimilarityQueries.q214IvfSq8(spark, sfDir)
      .select(col("qid"), col("rn").cast("int"), col("neighbor_id"),
        col("score_int"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("append FREEZES the quantization contract: banked scale and centroids " +
      "unchanged, existing cell files untouched, out-of-range appends saturate") {
    import spark.implicits._
    val path = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    val half1 = emb.filter(col("vec_id") < 250)
    val half2 = emb.filter(col("vec_id") >= 250)
    val cents = graft.queries.SimilarityQueries.ivfCentroids(spark, sfDir)
    VectorLake.build(spark, half1, path, centroids = Some(cents))
    val q0 = VectorLake.quantOf(spark, path)
    val c0 = VectorLake.centroidsOf(spark, path).map {
      case (cid, ce) => (cid, ce.toSeq) }.toSeq
    val cellFiles0 = new java.io.File(s"$path/cells")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    // the append's vectors EXCEED the frozen scale (x3) — a re-derived
    // scale would differ, so the freeze below is load-bearing, and some
    // coordinates MUST clamp
    val scaled = half2.select(col("vec_id"),
      transform(col("embedding"), v => v * lit(3.0f)).as("embedding"))
    assert(Similarity.sq8MaxAbs(scaled) > q0.maxabs)
    VectorLake.append(spark, scaled, path)
    // contract unchanged
    assert(VectorLake.quantOf(spark, path) === q0)
    assert(VectorLake.centroidsOf(spark, path).map {
      case (cid, ce) => (cid, ce.toSeq) }.toSeq === c0)
    val cellFiles1 = new java.io.File(s"$path/cells")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(cellFiles0.subsetOf(cellFiles1), "append rewrote existing cell files")
    assert(cellFiles1.size > cellFiles0.size)
    // appended payloads equal an independent quantize-under-frozen-scale
    // (saturating), byte for byte
    val gotQv = spark.read.parquet(s"$path/cells")
      .join(scaled.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("qv")).as[(Long, Array[Byte])]
      .collect().toMap
    val expectQv = scaled.select(col("vec_id"),
      graft.functions.GraftFunctions.sq8Pack(
        Similarity.sq8Quantize(col("embedding"), q0.maxabs)).as("qv"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(gotQv.keySet === expectQv.keySet)
    gotQv.foreach { case (id, b) =>
      assert(b.toSeq === expectQv(id).toSeq, s"payload mismatch for vec $id") }
    // saturation actually happened (the clamp is exercised, not vacuous)
    assert(gotQv.values.exists(_.exists(b => b == 127 || b == -127)),
      "no appended coordinate saturated — the x3 scale-out did not test the clamp")
    // and the lake still answers from the mixed-generation cells
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    assert(VectorLake.topKSq8(spark, queries, path).count() > 0)
  }

  test("rebuild with centroids re-banks the quantized artifact at the new generation's scale") {
    val gen1 = freshPath()
    val gen2 = freshPath()
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.queries.SimilarityQueries.ivfCentroids(spark, sfDir)
    VectorLake.build(spark, emb.filter(col("vec_id") < 250), gen1,
      centroids = Some(cents))
    val q0 = VectorLake.quantOf(spark, gen1)
    val scaled = emb.filter(col("vec_id") >= 250).select(col("vec_id"),
      transform(col("embedding"), v => v * lit(3.0f)).as("embedding"))
    VectorLake.append(spark, scaled, gen1)
    // rebuild = the one legitimate rescale point: the new generation's
    // scale reflects the grown payload the old generation clamped
    VectorLake.rebuild(spark, gen1, gen2,
      centroids = Some(VectorLake.centroidsOf(spark, gen1)))
    val q1 = VectorLake.quantOf(spark, gen2)
    assert(q1.maxabs > q0.maxabs)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    assert(VectorLake.topKSq8(spark, queries, gen2).count() > 0)
    // old generation still frozen and queryable (swap safety)
    assert(VectorLake.quantOf(spark, gen1) === q0)
    assert(VectorLake.topKSq8(spark, queries, gen1).count() > 0)
  }
}
