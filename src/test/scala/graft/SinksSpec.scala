package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.pipeline.{CovidFixture, CovidPipeline}
import graft.sources.Sinks

/** Date-partitioned sink semantics: append creates one partition per date,
  * re-runs replace only their own partition, and per-date reads are
  * partition-PRUNED (no other date's files opened). */
class SinksSpec extends SparkSpec {

  private def flatFor(ds: String) =
    CovidPipeline.run(spark, CovidFixture.stage(spark, ds), ds).flat

  test("append + dynamic overwrite keep per-date partitions independent") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val d1 = "2023-03-02"; val d2 = "2023-03-03"
    Sinks.appendDatePartition(flatFor(d1), dir)
    Sinks.appendDatePartition(flatFor(d2), dir)
    assert(Sinks.readDatePartition(spark, dir, d1).count() === 240)
    assert(spark.read.parquet(dir).count() === 480)

    // idempotent re-run of d2: doubled rows would be the append bug
    Sinks.overwriteDatePartition(flatFor(d2), dir)
    assert(spark.read.parquet(dir).count() === 480)
    assert(Sinks.readDatePartition(spark, dir, d2).count() === 240)
  }

  test("per-date read is partition pruning, not a data filter") {
    val dir = Files.createTempDirectory("graft_sink2").toString
    Sinks.appendDatePartition(flatFor("2023-03-02"), dir)
    Sinks.appendDatePartition(flatFor("2023-03-03"), dir)
    val df = Sinks.readDatePartition(spark, dir, "2023-03-02")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.metadata("PartitionFilters").contains("day_of_data"),
      scan.metadata("PartitionFilters"))
    // the pruned scan opens exactly the one partition's data files
    df.collect()
    val filesOnDisk = new java.io.File(s"$dir/day_of_data=2023-03-02")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value === filesOnDisk)
  }
}
