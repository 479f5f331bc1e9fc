package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.queries.{CoreQueries, SimilarityQueries}

/** Physical-plan assertions — the 100 TB design properties as executable
  * checks, not prose: filters/projections reach the parquet scan, dims
  * broadcast, large joins avoid cartesian products, aggregates stay in
  * whole-stage codegen. If a refactor regresses one of these, correctness
  * tests stay green but this suite fails. */
class PlanSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = fileScans(df)

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: predicate and projection push down to the parquet scan") {
    val df = CoreQueries.q02FilterProject(spark, sfDir)
    val s = scans(df)
    assert(s.nonEmpty)
    val meta = s.head.metadata
    assert(meta("PushedFilters").contains("GreaterThanOrEqual(l_quantity"),
      s"no pushed quantity filter: ${meta("PushedFilters")}")
    assert(meta("PushedFilters").contains("l_shipdate"))
    // pruned ReadSchema: only the 4 projected + filtered columns, not all 16
    val read = meta("ReadSchema")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_partkey"),
      s"scan reads unprojected columns: $read")
  }

  test("q03: dimension joins are broadcast hash joins, fact side unshuffled") {
    val p = planString(CoreQueries.q03JoinBroadcast(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"),
      "dim join degraded to a shuffle join")
  }

  test("q04: large join has no cartesian product and keeps the year filter below the join") {
    val df = CoreQueries.q04JoinLarge(spark, sfDir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // optimized plan: filter sits on the orders relation, not above the join
    val opt = df.queryExecution.optimizedPlan.toString
    val joinIdx = opt.indexOf("Join")
    val filterIdx = opt.indexOf("isnotnull(o_orderdate")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "orders-side filter was not pushed below the join")
  }

  test("q01: aggregation is partial (map-side combine) inside whole-stage codegen") {
    val df = CoreQueries.q01Agg(spark, sfDir)
    val p = planString(df)
    // two HashAggregate levels = partial + final; tiny grouped state shuffles
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("partial_sum"), "map-side combine missing")
    // codegen spans only materialize in the final adaptive plan — execute
    // THIS queryExecution (count() would plan a separate one), then look for
    // the `*(n)` whole-stage-codegen markers in the final explain
    df.collect()
    val fin = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(fin.contains("*("), fin.take(800))
  }

  test("q22: query side broadcasts; corpus never shuffles before scoring") {
    val p = planString(SimilarityQueries.q22CosineTopK(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    // vec_dot runs native (would print as vec_dot in the projection)
    assert(p.contains("vec_dot"))
  }

  test("entry: covid surrogate-key join broadcasts the region dimension") {
    val p = planString(SparkEntry.entry(spark))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q46: cube computes all grouping sets in ONE aggregate pass (Expand)") {
    val p = planString(CoreQueries.q46Cube(spark, sfDir))
    assert(p.contains("Expand"), p.take(800))
    // one partial + one final aggregate — NOT one pass per grouping set
    assert("HashAggregate".r.findAllIn(p).size === 2, p.take(800))
    assert(scans(CoreQueries.q46Cube(spark, sfDir)).size === 1)
  }

  test("q47: explicit-values pivot is a single conditional-aggregate pass") {
    val df = CoreQueries.q47Pivot(spark, sfDir)
    // no distinct-values discovery job: exactly one scan of orders
    assert(scans(df).size === 1)
    val p = planString(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("q48: unpivot is a narrow Expand — zero shuffles") {
    val df = CoreQueries.q48Unpivot(spark, sfDir)
    val p = planString(df)
    assert(p.contains("Expand"), p.take(800))
    assert(!p.contains("Exchange"), "unpivot must not shuffle: " + p.take(800))
    // the quantity filter runs BEFORE the 4x row multiplication
    val meta = scans(df).head.metadata
    assert(meta("PushedFilters").contains("l_quantity"), meta("PushedFilters"))
  }

  test("q34: global top-k plans as TakeOrderedAndProject, never a global window") {
    val p = planString(graft.queries.TextQueries.q34TopTokens(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Window"), "no WindowExec anywhere: " + p.take(800))
  }

  test("q12: global sort+limit is TakeOrderedAndProject (no full sort shuffle)") {
    val p = planString(graft.queries.DateTimeQueries.q12SortLimit(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q50: the curation chain reads documents ONCE per pipeline arm") {
    val df = graft.queries.TextQueries.q50CorpusCuration(spark, sfDir)
    // score+langID+filter fuse over one scan; dedup's keeper set is the
    // second arm — two scans total, NOT one per chained stage
    assert(scans(df).size === 2, scans(df).size.toString)
  }

  test("q55: bigram mode aggregation is partial (map-side combine), joins stay hash/broadcast") {
    val df = graft.queries.TextQueries.q55Repetition(spark, sfDir)
    val p = planString(df)
    assert(p.contains("partial_count") || p.contains("partial_min_by"),
      "bigram counts not map-side combined:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q56: tf-idf ranking window is partitioned by doc_id, not global") {
    val df = graft.queries.TextQueries.q56Tfidf(spark, sfDir)
    val p = planString(df)
    val win = "Window \\[.*\\], \\[doc_id".r
    assert(win.findFirstIn(p).isDefined,
      "per-doc window lost its doc_id partitioning:\n" + p.take(1200))
  }

  test("q57: df-band join and postings agg share the gram partitioning (no third shuffle)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val df = graft.queries.TextQueries.q57GramPostings(spark, sfDir)
    df.collect() // materialize the final adaptive plan
    // count real shuffle nodes in the FINAL plan only (toString also prints
    // the initial plan, double-counting); reused exchanges count once
    def shuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case _: ReusedExchangeExec => 0
      case s: ShuffleExchangeExec => 1 + s.children.map(shuffles).sum
      case other => other.children.map(shuffles).sum
    }
    val n = shuffles(df.queryExecution.executedPlan)
    assert(n <= 2, s"$n shuffle exchanges:\n" +
      df.queryExecution.executedPlan.toString.take(1200))
  }

  test("q70: 6-table star joins broadcast every dim, no cartesian, top-level agg partial") {
    val df = graft.queries.CoreQueries.q70LocalSupplierVolume(spark, sfDir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "star dims not broadcast:\n" + p.take(1200))
    assert(p.contains("partial_sum"))
  }

  test("q58: weighted sampling plans onto the custom TopKPerKey operator") {
    val p = planString(graft.queries.TextQueries.q58WeightedSample(spark, sfDir))
    assert(p.contains("TopKPerKey"), p.take(600))
  }

  test("q64: regression moment sums are map-side combined") {
    val p = planString(graft.queries.DateTimeQueries.q64Regression(spark, sfDir))
    assert(p.contains("partial_sum"), "moments not partially aggregated:\n" + p.take(800))
  }

  test("q68: per-type median/MAD frames broadcast; no shuffle join on events") {
    val p = planString(graft.queries.DateTimeQueries.q68RobustOutliers(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "stat join degraded to a shuffle join")
  }

  test("q52: resample + gap fill is one shuffle end to end") {
    val df = graft.queries.DateTimeQueries.q52GapFill(spark, sfDir)
    val p = planString(df)
    // hourly agg, span agg, spine join, and fill window all share the
    // user_id clustering: exactly one exchange subtree feeds them (plan
    // prints reuse of the same exchange rather than new ones per stage)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges key exchanges:\n" + p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"), p.take(800))
  }

  test("q72: quantile edges broadcast back onto the scan; no sort of the full table") {
    val df = CoreQueries.q72EquidepthHist(spark, sfDir)
    val p = planString(df)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "edge join degraded to a shuffle join")
    // bin assignment must not globally sort documents (equi-depth via
    // edge comparison, not ntile-over-ordered-window)
    assert(!p.contains("Window"), "binning fell back to a sorted window:\n" + p.take(800))
  }

  test("q73: correlated EXISTS plans as a semi join, no fan-out aggregate") {
    val df = CoreQueries.q73LateShipExists(spark, sfDir)
    val p = planString(df)
    assert(p.contains("LeftSemi"), "EXISTS did not plan as a semi join:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  test("q77: vocabulary ranking never runs a partitionless (single-partition) window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.queries.TextQueries.q77TokenIds(spark, sfDir)
    df.collect() // materialize the final adaptive plan
    def windows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => windows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(df.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the per-partition rank window")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty,
      "global-rank window lost its partition spec (single-partition funnel)"))
  }

  test("q183: the 256-row model and 1-row totals broadcast — no sort-merge join anywhere") {
    val df = graft.queries.TextQueries.q183DsirWeights(spark, sfDir)
    val p = planString(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "expected broadcast joins for the bucket model:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "bucket-model join degraded to sort-merge:\n" + p.take(800))
  }

  test("q78: per-document chunking is fully narrow — zero shuffles") {
    val df = graft.queries.TextQueries.q78Chunking(spark, sfDir)
    val p = planString(df)
    assert(!p.contains("Exchange"), "chunking introduced a shuffle:\n" + p.take(800))
  }

  test("q84 (SQL front end): the SQL text plans the same shapes as the DataFrame API") {
    val df = graft.queries.SqlQueries.q84SqlTpch10(spark, sfDir)
    val p = planString(df)
    // dims broadcast, date filter pushed to the orders scan, top-20 is
    // TakeOrderedAndProject — the SQL path lands in the same Catalyst
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "LIMIT after ORDER BY not top-k planned")
    val pushed = scans(df).map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("o_orderdate"), s"date filter not pushed: $pushed")
  }

  test("q04: the orders date filter is range-form and reaches the parquet scan") {
    // year(o_orderdate) === 1996 would read orders in full at any scale —
    // Catalyst can't push a function-wrapped predicate; the half-open
    // range form must appear in PushedFilters (the q84 standard)
    val df = graft.queries.CoreQueries.q04JoinLarge(spark, sfDir)
    val pushed = scans(df).map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"orders date range not pushed to the scan: $pushed")
  }

  test("q85: correlated scalar subquery decorrelates to an aggregate + join (no per-row subquery)") {
    val p = planString(graft.queries.SqlQueries.q85ScalarSubquery(spark, sfDir))
    assert(!p.toLowerCase.contains("scalar-subquery"),
      "subquery survived decorrelation:\n" + p.take(800))
    assert(p.contains("HashAggregate") &&
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")), p.take(800))
  }

  test("q90: banded candidates only — equi-joins throughout, no nested loop over the corpus") {
    // r3 shape was anchors × FULL corpus through a BroadcastNestedLoopJoin
    // — quadratic, since the anchor panel is proportional (vec_id % 25).
    // The rewrite joins anchors to their SRP bucket mates: every join in
    // the plan must be an equi-join (hash or sort-merge), and the nested
    // loop must be GONE.
    val df = SimilarityQueries.q90HardNegatives(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "anchor mining degenerated to a corpus nested loop:\n" + p.take(800))
    assert(p.contains("tbl") && p.contains("bucket"),
      "expected the SRP band-bucket candidate join:\n" + p.take(800))
  }

  test("q92: frontier joins back by broadcast; no O(n^2) dominator self-join anywhere") {
    val df = CoreQueries.q92Skyline(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "skyline degenerated to the quadratic formulation")
  }

  test("q185: probe side broadcasts onto the banded corpus; no cartesian anywhere") {
    val df = SimilarityQueries.q185MultiprobeAnn(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("CartesianProduct"),
      "multi-probe degenerated to a corpus cross join:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "probe list should be the broadcast build side:\n" + p.take(800))
    assert(p.contains("tbl") && p.contains("bucket"),
      "expected the SRP band-bucket candidate equi-join:\n" + p.take(800))
  }

  test("q186: one partial-agg corpus pass; the 1-row normalizers ride broadcasts") {
    val df = graft.queries.TextQueries.q186TemperatureMix(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_"), // token sum is map-side combined
      "per-source token agg lost its partial (map-side) phase:\n" + p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "c_max/w_sum normalizers were not broadcast:\n" + p.take(800))
  }

  test("q96: data-dependent threshold stays a broadcast, rank windows stay partitioned") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.queries.TextQueries.q96ClassBalance(spark, sfDir)
    df.collect()
    def windows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => windows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    windows(df.queryExecution.executedPlan).foreach(w =>
      assert(w.partitionSpec.nonEmpty, "class-rank window lost its partition spec"))
    val p = planString(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row min-count frame was not broadcast:\n" + p.take(800))
  }

  test("q203: the fold is narrow — the plan's only exchange is the per-source rollup") {
    val df = graft.queries.TextQueries.q203StutterRuns(spark, sfDir)
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) === 1,
      "expected exactly one exchange (the <=|sources|-row rollup)")
  }

  test("q205/q207: label agg partial-aggregates map-side; everything downstream is label-bounded") {
    for (df <- Seq(SimilarityQueries.q205CentroidShift(spark, sfDir),
        SimilarityQueries.q207CentroidMatrix(spark, sfDir))) {
      val p = planString(df)
      assert(p.contains("partial_longvecsum") || p.contains("partial_"),
        "long_vec_sum lost map-side combine:\n" + p.take(800))
      assert(!p.contains("SortMergeJoin"),
        "bounded centroid frames degraded to a shuffle join:\n" + p.take(800))
    }
  }

  test("q208: the corpus never moves — no corpus-wide exchange, cuts broadcast back") {
    val df = graft.queries.TextQueries.q208DecontamRewrite(spark, sfDir)
    df.collect()
    val p = planString(df)
    // the final rewrite join must be broadcast (cuts are contamination-
    // sized); a SortMergeJoin there would re-shuffle the token arrays
    assert(!p.contains("SortMergeJoin"),
      "rewrite join degraded to sort-merge (corpus-wide shuffle):\n" + p.take(1200))
    spark.catalog.clearCache()
  }

  test("q209: allocation algebra runs on broadcast bounded frames — no sort-merge join, no window") {
    val df = graft.queries.TextQueries.q209BudgetFill(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("SortMergeJoin"),
      "bounded allocation frames degraded to a shuffle join:\n" + p.take(800))
    assert(walkWindows(df.queryExecution.executedPlan).isEmpty,
      "the allocator must not plan a window (bounded-cross contract)")
  }

  private def walkWindows(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      walkWindows(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walkWindows(q.plan)
    case w: org.apache.spark.sql.execution.window.WindowExec =>
      w +: w.children.flatMap(walkWindows)
    case other => other.children.flatMap(walkWindows)
  }

  private def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      countShuffles(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => countShuffles(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
      1 + s.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  test("q104: shard blob assembly never runs a partitionless window") {
    val df = graft.queries.TextQueries.q104ShardBlobs(spark, sfDir)
    df.collect()
    val ws = walkWindows(df.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the GlobalIndex per-partition rank window")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty,
      "cumulative-sum window lost its partition spec (single-partition funnel)"))
  }

  test("q106: banded triplet mining — equi-joins only, struct-max agg, no window") {
    val df = SimilarityQueries.q106ContrastiveTriplets(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "anchor mining degenerated to a corpus nested loop:\n" + p.take(800))
    assert(walkWindows(df.queryExecution.executedPlan).isEmpty,
      "top-1 should be a struct-max aggregate, not a row_number window")
    assert(p.contains("partial_"), "top-1 aggregate lost map-side combine")
  }

  test("q107: trailing RANGE window is ONE user_id shuffle, frame partitioned") {
    val df = graft.queries.DateTimeQueries.q107Trailing1h(spark, sfDir)
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) === 1,
      "expected exactly one exchange (hash by user_id)")
    val ws = walkWindows(df.queryExecution.executedPlan)
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "RANGE frame must stay partitioned by user_id")
  }

  test("q110: quantile windows ride ONE event_type exchange, all partitioned") {
    val df = graft.queries.DateTimeQueries.q110ValueQuantiles(spark, sfDir)
    df.collect()
    val ws = walkWindows(df.queryExecution.executedPlan)
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "cumulative/mode windows must stay partitioned by event_type")
  }

  test("q112: centroids broadcast; corpus joins nothing by shuffle") {
    val df = SimilarityQueries.q112ClassSeparation(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "10-row centroid table should broadcast:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin"), "corpus got shuffled for a join")
    assert(p.contains("partial_"), "per-vector reduce lost map-side combine")
  }

  test("q113: containment candidates come from the band equi-join, never a cartesian") {
    val df = graft.queries.TextQueries.q113Containment(spark, sfDir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment degenerated to an all-pairs product:\n" + p.take(800))
  }

  test("q116: Q21 shape decorrelates — lineitem scanned once, no per-row re-probe") {
    val df = CoreQueries.q116SoleReturnedSupplier(spark, sfDir)
    df.collect()
    assert(scans(df).count(_.toString.contains("lineitem")) === 1,
      "decorrelation must not re-scan lineitem per correlated predicate")
    val p = planString(df)
    assert(p.contains("TakeOrderedAndProject"), "top-10 should not globally sort")
  }

  test("q120: Q22 shape — threshold broadcasts, anti join ships keys only") {
    val df = CoreQueries.q120InactiveRich(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row mean aggregate should broadcast:\n" + p.take(800))
    assert(p.contains("LeftAnti"), "NOT EXISTS should plan as an anti join")
  }

  test("q124: Q7 shape — all dims broadcast, facts join on keys, no cartesian") {
    val df = CoreQueries.q124NationTrade(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("CartesianProduct"), "nation-pair filter degenerated")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("partial_"), "revenue agg lost map-side combine")
  }

  test("q125: percent-of-parent never runs a partitionless window") {
    val df = CoreQueries.q125HierarchyShare(spark, sfDir)
    df.collect()
    assert(walkWindows(df.queryExecution.executedPlan).isEmpty,
      "shares must come from broadcast re-aggregation, not a global window")
  }

  test("q115: uncached narrow spine; count tables collapse and broadcast") {
    spark.catalog.clearCache()
    val df = graft.queries.TextQueries.q115BigramLogprob(spark, sfDir)
    df.collect()
    val p = planString(df)
    // r11 shape: no corpus-scale cache (the persisted pair spine measured
    // 5.6x the lean shape at the 100x rung — columnar-encoding 2e8 token
    // structs cost more than the recomputes it saved) and no pinned join
    // strategy: partial aggregation collapses the vocab-bounded bi/uni
    // tables map-side and AQE broadcasts them when they MEASURE small,
    // which on the fixture they always do. The raw pair stream must
    // never be sort-merged or cached.
    assert(!p.contains("InMemoryTableScan") && !p.contains("TableCacheQueryStage"),
      "the corpus-scale pair cache is back")
    assert(p.contains("BroadcastHashJoin"),
      "count tables no longer broadcast onto the pair stream")
    assert(!p.contains("SortMergeJoin"),
      "sort-merge join crept in on the pair stream")
    assert(p.contains("partial_"), "counts lost map-side combine")
    assert(walkWindows(df.queryExecution.executedPlan).isEmpty)
    spark.catalog.clearCache()
  }

  test("q121/q129/q132/q136: GlobalIndex queries never run a partitionless window") {
    for (df <- Seq(
      graft.queries.TextQueries.q121Curriculum(spark, sfDir),
      graft.queries.DateTimeQueries.q129KsTest(spark, sfDir),
      graft.queries.DateTimeQueries.q132MannWhitney(spark, sfDir),
      graft.queries.DateTimeQueries.q136Auc(spark, sfDir))) {
      df.collect()
      val ws = walkWindows(df.queryExecution.executedPlan)
      assert(ws.nonEmpty, "expected the per-partition GlobalIndex window")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        "global rank/cumsum degenerated to a single-partition window"))
    }
  }

  test("q134/q138: first-owner/dup tagging is a keyed window, not a join") {
    for (df <- Seq(
      graft.queries.TextQueries.q134NoveltyRate(spark, sfDir),
      graft.queries.TextQueries.q138CdcChunks(spark, sfDir))) {
      df.collect()
      val p = planString(df)
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        "per-key tagging should ride the window's own shuffle, not a join")
      walkWindows(df.queryExecution.executedPlan).foreach(w =>
        assert(w.partitionSpec.nonEmpty))
    }
  }

  test("q126: co-occurrence count combines map-side and ships no arrays") {
    val df = graft.queries.TextQueries.q126PrefixJoin(spark, sfDir)
    df.collect()
    val p = planString(df)
    // the pair counting must partial-aggregate inside the join's
    // g-partitioning — without it the full Σ df² pair stream shuffles raw
    assert(p.contains("partial_count"), "pair count lost map-side combine")
    // the whole point of the counting formulation: no shingle-array payload
    // may cross an exchange (the 100x ladder measured an 18.7 GB shuffle
    // when the verify join shipped both arrays per candidate pair)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("s1") && !exchanges.contains("s2"),
      "shingle arrays are being shuffled:\n" + exchanges)
  }

  test("q118: drift totals ride back as a broadcast over ONE token-count shuffle") {
    val df = graft.queries.TextQueries.q118TokenDrift(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(!p.contains("SortMergeJoin"), "1-row totals frame got shuffled for a join")
    assert(p.contains("partial_"), "token counts lost map-side combine")
  }

  test("q98: custom UDAF aggregates partially (map-side) like a built-in agg") {
    val p = planString(graft.queries.TextQueries.q98SigUnion(spark, sfDir))
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      "no partial+final aggregate pair for the UDAF:\n" + p.take(800))
    assert(p.contains("partial_"), "UDAF skipped map-side partial aggregation")
  }

  test("q148: all four predicates and the 2-column projection reach the scan") {
    val df = graft.queries.CoreQueries.q148ForecastRevenue(spark, sfDir)
    val meta = scans(df).head.metadata
    assert(meta("PushedFilters").contains("l_shipdate"), meta("PushedFilters"))
    assert(meta("PushedFilters").contains("l_discount"), meta("PushedFilters"))
    assert(meta("PushedFilters").contains("l_quantity"), meta("PushedFilters"))
    // projection pruned to the 4 referenced columns, not the full 11
    assert(meta("ReadSchema").split(",").length <= 4, meta("ReadSchema"))
    assert(planString(df).contains("partial_sum"))
  }

  test("q153: disjunctive predicates stay a residual on the equi hash join (no NLJ)") {
    val p = planString(
      graft.queries.CoreQueries.q153DisjunctivePredicates(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "OR'd join condition fell back to nested-loop:\n" + p.take(800))
  }

  test("q151: scalar-subquery max joins as a 1-row broadcast, no global window") {
    val p = planString(graft.queries.CoreQueries.q151TopSupplier(spark, sfDir))
    assert(!p.contains("Window"), "max-revenue filter became a window:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q157: pair pruning joins on the cluster key, never a global self cross-join") {
    val df = graft.queries.SimilarityQueries.q157Semdedup(spark, sfDir)
    val p = planString(df)
    // the only cartesian allowed is vectors x 8 broadcast centroids;
    // the pair stage must be keyed by cluster (hash or sort-merge join)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct"),
      "cluster-mate pairing degenerated to a cartesian:\n" + p.take(1200))
  }

  test("q158: the exact recount shuffles candidates only (semi-join before groupBy)") {
    val df = graft.queries.TextQueries.q158HeavyHitters(spark, sfDir)
    df.collect()
    val p = planString(df)
    assert(p.contains("LeftSemi"), "candidate gate missing:\n" + p.take(1200))
    assert(p.contains("partial_count"), "recount lost map-side combine")
  }

  test("q159: vocabulary growth runs without any window or global sort") {
    val p = planString(graft.queries.TextQueries.q159VocabGrowth(spark, sfDir))
    assert(!p.contains("Window"), "decile assignment became a window:\n" + p.take(800))
  }

  test("EVERY query: no cartesian product and no partitionless window (global sweep)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    // documented exceptions: q22 is the brute-force ANN baseline the
    // bucketed variants are graded against (its all-pairs scan is the
    // point); everything else must justify itself here by name
    val cartesianOk = Set("q22_cosine_topk")
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other =>
        (other +: other.children.flatMap(walk)) ++ other.subqueries.flatMap(walk)
    }
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val nodes = walk(fn(spark, sfDir).queryExecution.executedPlan)
      if (!cartesianOk(name) && nodes.exists(_.isInstanceOf[CartesianProductExec]))
        offenders += s"$name: CartesianProduct"
      nodes.collect { case w: WindowExec if w.partitionSpec.isEmpty =>
        offenders += s"$name: partitionless WindowExec"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
  test("q213/q214: quantized scoring broadcasts probes; no corpus self-shuffle") {
    // q213: brute-force audit arm — the 8 probe vectors broadcast, the
    // corpus scan is never exchanged before scoring
    val p213 = planString(graft.queries.SimilarityQueries.q213Sq8Recall(spark, sfDir))
    assert(p213.contains("BroadcastNestedLoopJoin") || p213.contains("BroadcastHashJoin"),
      p213.take(500))
    assert(!p213.contains("CartesianProduct"))
    // q214: the production shape — candidate bounding is a broadcast HASH
    // join on the cell key (the probe list is tiny), never a sort-merge
    // self-join of the corpus
    val p214 = planString(graft.queries.SimilarityQueries.q214IvfSq8(spark, sfDir))
    assert(p214.contains("BroadcastHashJoin"), p214.take(800))
    assert(!p214.contains("CartesianProduct"))
  }
}
