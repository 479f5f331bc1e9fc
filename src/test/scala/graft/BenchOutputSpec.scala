package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

/** The driver tail-parses ONE JSON line from Bench's stdout; round 10's
  * comparison was nulled because a run with >=1 flagged host-adjusted
  * regression emitted `"k":v` entries inside `[...]` — invalid JSON that
  * no test exercised. This spec round-trips BOTH emitted lines through a
  * strict Jackson parse for every output posture, including the
  * flagged-regression one. */
class BenchOutputSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
    .enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
  private def parse(line: String): JsonNode = mapper.readTree(line)

  /** (wall sec, shuffle bytes, gc ms, cpu sec) */
  private def res(sec: Double): (Double, Long, Long, Double) =
    (sec, 1024L, 5L, sec / 2)

  private val sf = "/root/testdata/sf0.1"

  /** Anchors that make q01_agg a flagged regression (>=1.5x adjusted and
    * >=1.0 s wall) under results where q01 runs 10x its anchor. */
  private val anchors =
    """{"sf":"/root/testdata/sf0.1","total_q01_q44":1.0,"total":2.0,
      |"n_queries":2,"max_ratio":1.5,"queries_host_factor":1.0,
      |"queries":{"q01_agg":0.2,"q02_filter_project":0.2}}""".stripMargin

  test("flagged-regression run emits two strictly parseable JSON lines") {
    val results = Map("q01_agg" -> res(2.0), "q02_filter_project" -> res(0.2))
    val (detail, summary) = Bench.renderLines(
      results, runsPerQuery = 2, failed = Nil, subsetRun = false,
      sfDir = sf, anchorsText = Some(anchors))
    val d = parse(detail)
    val s = parse(summary)
    // the regression must actually be flagged (host factor here is
    // 2.2/1.0 = 2.2x, q01 adjusted = (2.0/0.2)/2.2 = 4.5x >= 1.5, wall
    // 2.0 >= 1.0) — otherwise this test would not cover the r10 bug path
    val regs = s.get("host_adj_regressions")
    assert(regs != null && regs.isObject, s"expected object, got $regs")
    assert(regs.has("q01_agg"), s"q01_agg not flagged: $summary")
    assert(d.get("anchor_adj_ratio").isObject)
    assert(s.get("gate").get("status").asText() == "fail")
  }

  test("no-anchors run emits two strictly parseable JSON lines") {
    val results = Map("q01_agg" -> res(1.0))
    val (detail, summary) = Bench.renderLines(
      results, 2, Nil, subsetRun = false, sfDir = sf, anchorsText = None)
    parse(detail)
    val s = parse(summary)
    assert(s.get("gate").get("status").asText() == "skipped")
    assert(s.get("host_adj_regressions").isObject)
  }

  test("subset run and failed queries emit strictly parseable JSON lines") {
    val results = Map("q01_agg" -> res(1.0), "q03_join_broadcast" -> (-1.0, 0L, 0L, 0.0))
    val (detail, summary) = Bench.renderLines(
      results, 1, failed = List("q03_join_broadcast"), subsetRun = true,
      sfDir = sf, anchorsText = Some(anchors))
    parse(detail)
    val s = parse(summary)
    assert(s.get("gate").get("status").asText() == "skipped")
    assert(s.get("failed").get(0).asText() == "q03_join_broadcast")
    // dense array: index 2 (query number 3) carries the -1 failure marker
    assert(s.get("queries").get(2).asDouble() == -1.0)
  }

  test("oversized suite degrades to slowest-only map, still parseable") {
    val results = (1 to 400).map(i => f"q$i%02d_synth" -> res(0.5)).toMap
    val (detail, summary) = Bench.renderLines(
      results, 2, Nil, subsetRun = false, sfDir = sf, anchorsText = None)
    parse(detail)
    val s = parse(summary)
    assert(summary.length <= 1900 || s.get("queries").isObject)
  }
}
