package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{CovidOps, Dims, Mart}
import graft.quality.Quality
import graft.schemas.CovidSchemas

/** End-to-end covid pipeline (SURVEY.md §3.2 unified with §3.1):
  * stage -> flatten -> quality gate -> dims -> surrogate keys -> fact.
  *
  * One date-parameterized run, like the reference's per-`ds` increments —
  * but unlike the reference's PySpark DAG (which never loads the mart,
  * `SURVEY.md §3.1 note`), this pipeline does flatten AND dimensional load.
  */
object CovidPipeline {

  final case class Result(flat: DataFrame, regionDim: DataFrame, fact: DataFrame)

  /** Run the pipeline for one logical date over a stage table.
    *
    * @param expectedRows quality-gate expectation (reference: 240)
    * @param tolerance    relative tolerance (reference: 0.02)
    */
  def run(spark: SparkSession, stage: DataFrame, ds: String,
          expectedRows: Long = 240, tolerance: Double = 0.02): Result = {
    val flat = CovidOps.flatten(stage, ds)
    Quality.countGate(flat, expectedRows, tolerance)
    val regions = Dims.regionDim(flat)
    val keyed = Mart.withSurrogateKeys(flat, regions)
    val fact = Mart.factCovid(keyed)
    Result(flat, regions, fact)
  }
}

/** Deterministic covid-shaped stage fixture (FIXTURES.md §1): 5 countries x
  * 48 provinces for one date + junk provinces (Unknown / Recovered / NULL)
  * that the P5 filter must drop. No randomness — reproducible across runs. */
object CovidFixture {
  val isoCountries: Seq[(String, String)] = Seq(
    "CHN" -> "China", "RUS" -> "Russia", "USA" -> "US",
    "IND" -> "India", "BRA" -> "Brazil")

  private def report(ds: String, iso: String, country: String,
                     province: String, i: Int): String = {
    val confirmed = 1000L + i * 37
    val deaths = 10L + i
    val recovered = 500L + i * 11
    val active = confirmed - deaths - recovered
    val lat = 10.0 + i * 0.5
    val lon = 20.0 + i * 0.25
    val provinceJson = if (province == null) "null" else s""""$province""""
    s"""{"date":"$ds","active":$active,"deaths":$deaths,"confirmed":$confirmed,
       |"recovered":$recovered,"active_diff":${i % 7},"deaths_diff":${i % 3},
       |"confirmed_diff":${i % 11},"recovered_diff":${i % 5},
       |"last_update":"$ds 23:59:59","fatality_rate":${(deaths.toDouble / confirmed)},
       |"region":{"iso":"$iso","lat":$lat,"long":$lon,"name":"$country",
       |"cities":["c${i}a","c${i}b"],"province":$provinceJson}}""".stripMargin
      .replace("\n", "")
  }

  /** One stage row per (date, iso): the JSON envelope `{"data": [...]}`. */
  def stage(spark: SparkSession, ds: String = "2023-03-02",
            provincesPerCountry: Int = 48): DataFrame = {
    import org.apache.spark.sql.Row
    val rows = isoCountries.zipWithIndex.map { case ((iso, country), ci) =>
      val real = (0 until provincesPerCountry).map(i =>
        report(ds, iso, country, s"${country}_Prov_$i", ci * 100 + i))
      // Junk rows the cleanup filter must drop (reference
      // spark_transform_data.py:57): Unknown, Recovered, NULL province.
      val junk = Seq(
        report(ds, iso, country, "Unknown", ci * 100 + 98),
        report(ds, iso, country, "Recovered", ci * 100 + 99),
        report(ds, iso, country, null, ci * 100 + 97))
      val envelope = s"""{"data":[${(real ++ junk).mkString(",")}]}"""
      Row(ci.toLong, java.sql.Date.valueOf(ds), iso, envelope)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), CovidSchemas.stageSchema)
  }
}
