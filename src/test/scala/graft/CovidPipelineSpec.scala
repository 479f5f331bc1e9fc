package graft

import graft.ops.{CovidOps, Dims, Mart}
import graft.pipeline.{CovidFixture, CovidPipeline}
import graft.quality.Quality

class CovidPipelineSpec extends SparkSpec {

  private val ds = "2023-03-02"
  private lazy val stage = CovidFixture.stage(spark, ds)
  private lazy val result = CovidPipeline.run(spark, stage, ds)

  test("flatten drops junk provinces including NULL (reference != semantics)") {
    val flat = CovidOps.flatten(stage, ds)
    // 5 countries x 48 real provinces; Unknown/Recovered/NULL all dropped.
    assert(flat.count() === 240)
    val names = flat.select("region_name").collect().map(_.getString(0))
    assert(!names.contains("Unknown") && !names.contains("Recovered"))
    assert(names.forall(_ != null))
  }

  test("flatten respects the 14-column contract order") {
    val flat = CovidOps.flatten(stage, ds)
    assert(flat.columns.toSeq === graft.schemas.CovidSchemas.flatContract)
  }

  test("date filter selects only the requested increment") {
    val other = CovidOps.flatten(stage, "2023-03-03")
    assert(other.count() === 0)
  }

  test("fact has populated surrogate keys and passes FK integrity") {
    val fact = result.fact
    assert(fact.count() === 240)
    assert(fact.filter(fact("region_key").isNull).count() === 0)
    assert(fact.filter(fact("date_key") =!= 20230302).count() === 0)
    assert(Mart.fkOrphans(fact, result.regionDim, "region_key").count() === 0)
  }

  test("region dim is distinct with dense keys 1..N") {
    val dim = result.regionDim
    val n = dim.count()
    assert(dim.select("region_name").distinct().count() === n)
    val keys = dim.select("region_key").collect().map(_.getInt(0)).sorted
    assert(keys.toSeq === (1 to n.toInt))
  }

  test("same province name under two countries does NOT fan out fact rows") {
    import org.apache.spark.sql.functions._
    // real feeds have e.g. 'Amazonas' in Brazil AND Colombia/Peru; the
    // surrogate-key join must use the (region, country) natural key
    val flat = CovidOps.flatten(stage, ds)
      .withColumn("region_name", lit("Amazonas")) // every row same province
    val dim = Dims.regionDim(flat) // one row per (Amazonas, country) = 5
    assert(dim.count() === 5)
    val keyed = Mart.withSurrogateKeys(flat, dim)
    assert(keyed.count() === flat.count()) // no fan-out
    // each country's rows got that country's region key
    val perCountry = keyed.select("country_name", "region_key").distinct()
    assert(perCountry.count() === 5)
  }

  test("quality gate fails beyond tolerance") {
    intercept[Quality.QualityCheckFailure] {
      CovidPipeline.run(spark, stage, ds, expectedRows = 300, tolerance = 0.02)
    }
    // 240 vs expected 245 is within 2.05% -> fails at 2% exactly? |240-245|=5 > 0.02*245=4.9 -> fails
    intercept[Quality.QualityCheckFailure] {
      CovidPipeline.run(spark, stage, ds, expectedRows = 245, tolerance = 0.02)
    }
    // within tolerance passes: |240-244| = 4 <= 4.88
    CovidPipeline.run(spark, stage, ds, expectedRows = 244, tolerance = 0.02)
  }

  test("runRange backfills per-date partitions; re-runs are idempotent") {
    import org.apache.spark.sql.functions._
    val lake = java.nio.file.Files.createTempDirectory("graft_backfill")
      .resolve("fact").toString
    val landed = CovidPipeline.runRange(spark, "2023-03-01", "2023-03-03", lake)
    assert(landed === Seq("2023-03-01", "2023-03-02", "2023-03-03"))
    def counts = spark.read.parquet(lake)
      .groupBy("day_of_data").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val before = counts
    assert(before.values.toSet === Set(240L) && before.size === 3)
    // re-run ONLY the middle date: its partition is replaced, the other
    // two days' files untouched, totals stable (the Airflow-rerun case)
    CovidPipeline.runRange(spark, "2023-03-02", "2023-03-02", lake)
    assert(counts === before)
  }

  test("runRange invokes the failure hook and propagates the error") {
    val lake = java.nio.file.Files.createTempDirectory("graft_backfill2")
      .resolve("fact").toString
    var notified = List.empty[String]
    intercept[Quality.QualityCheckFailure] {
      CovidPipeline.runRange(spark, "2023-03-01", "2023-03-02", lake,
        expectedRows = 9999,
        onFailure = (d, _) => notified ::= d)
    }
    assert(notified === List("2023-03-01")) // fails fast on the first date
  }
}
