package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.pipeline.{CovidFixture, CovidPipeline}
import graft.sources.CovidPayloadProvider

/** Injected fetch stub for the payloadProvider seam test; top-level with a
  * no-arg constructor as the reflective contract requires. Call tracking
  * works because local-mode executors share the test JVM. */
final class StubPayloadProvider extends CovidPayloadProvider {
  override def fetch(ds: String, iso: String, country: String,
                     countryIdx: Int, provinces: Int): String = {
    StubPayloadProvider.calls.add(iso)
    s"""{"stub":"$ds/$iso"}"""
  }
}
object StubPayloadProvider {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Configured stub exercising the SAME Map-constructor injection path
  * [[graft.sources.HttpCovidProvider]] uses (no network in CI): `provider.*`
  * reader options must arrive prefix-stripped and lowercased. */
final class ConfiguredStubProvider(options: Map[String, String])
    extends CovidPayloadProvider {
  override def fetch(ds: String, iso: String, country: String,
                     countryIdx: Int, provinces: Int): String =
    s"""{"url":"${options.getOrElse("url", "?")}","key":"${
      options.getOrElse("header.x-api-key", "?")}","iso":"$iso"}"""
}

/** DSv2 connector: fan-out partitioning, partition-level filter pushdown
  * (countries prune before any "fetch"), column pruning, and end-to-end
  * equivalence with the in-memory stage fixture. */
class CovidReportSourceSpec extends SparkSpec {

  private def src = spark.read
    .format("graft.sources.CovidReportSource")
    .option("date", "2023-03-02")

  test("one input partition per country; rows match the fixture") {
    val df = src.load()
    assert(df.rdd.getNumPartitions === 5)
    val fix = CovidFixture.stage(spark)
    assert(df.collect().toSet === fix.collect().toSet)
  }

  test("iso filter prunes partitions at the source") {
    val df = src.load().filter(col("iso_country") === "RUS")
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 1)
    // pushdown is visible in the scan description
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("countries=Set(RUS)"), p.take(500))
  }

  test("column pruning reaches the reader (json_data not built)") {
    val df = src.load().select("iso_country", "date_of_data")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("columns=date_of_data,iso_country"), p.take(500))
    assert(df.count() === 5)
  }

  test("LIMIT pushes to the source: only the first n partitions are planned") {
    val df = src.load().limit(2)
    assert(df.count() === 2)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputPartitions.length === 2) // 3 countries never planned
  }

  test("payloadProvider option injects a custom fetch (the S1 HTTP seam)") {
    val df = src
      .option("payloadProvider", classOf[StubPayloadProvider].getName)
      .load()
    val payloads = df.select("iso_country", "json_data").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(payloads.size === 5)
    assert(payloads("RUS") === """{"stub":"2023-03-02/RUS"}""")
    // pushdown still composes with a custom provider: pruned countries
    // are never fetched at all
    StubPayloadProvider.calls.clear()
    src.option("payloadProvider", classOf[StubPayloadProvider].getName)
      .load().filter(col("iso_country") === "CHN").collect()
    assert(StubPayloadProvider.calls.asScala.toSet === Set("CHN"))
  }

  test("provider.* options reach a Map-constructor provider (HTTP config path)") {
    val df = src
      .option("payloadProvider", classOf[ConfiguredStubProvider].getName)
      .option("provider.url", "http://example.test/reports")
      .option("provider.header.X-Api-Key", "sekrit")
      .load().filter(col("iso_country") === "RUS")
    val payload = df.select("json_data").collect().head.getString(0)
    assert(payload ===
      """{"url":"http://example.test/reports","key":"sekrit","iso":"RUS"}""")
  }

  test("pipeline over the connector == pipeline over the fixture") {
    val viaSource = CovidPipeline.run(spark, src.load(), "2023-03-02").fact
    val viaFixture = CovidPipeline.run(spark, CovidFixture.stage(spark), "2023-03-02").fact
    assert(viaSource.collect().toSet === viaFixture.collect().toSet)
  }
}
