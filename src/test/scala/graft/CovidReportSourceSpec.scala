package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CovidFixture, CovidPipeline}

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

  test("pipeline over the connector == pipeline over the fixture") {
    val viaSource = CovidPipeline.run(spark, src.load(), "2023-03-02").fact
    val viaFixture = CovidPipeline.run(spark, CovidFixture.stage(spark), "2023-03-02").fact
    assert(viaSource.collect().toSet === viaFixture.collect().toSet)
  }
}
