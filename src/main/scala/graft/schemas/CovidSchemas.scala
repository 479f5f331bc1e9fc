package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schema constants for the covid data model.
  *
  * Mirrors the reference's single most important schema — the 12-field report
  * element with a nested `region` struct (reference:
  * `spark_transform_data.py:27-47`, Postgres composite types
  * `postgres/pg_init_covid19.sql:86-88`). We standardize lat/long on
  * DoubleType (the warehouse DDL semantics, `pg_init_covid19.sql:29-30`)
  * rather than the reference PySpark job's truncating `DecimalType()`
  * (`spark_transform_data.py:33-34`) — see SURVEY.md §1.2.
  *
  * All production paths use these explicit StructTypes; schema inference is
  * test-only (SURVEY.md §1.3).
  */
object CovidSchemas {

  /** region struct inside each report element. */
  val regionSchema: StructType = StructType(Seq(
    StructField("iso", StringType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType),
    StructField("name", StringType),
    StructField("cities", ArrayType(StringType)),
    StructField("province", StringType)
  ))

  /** One report element of the API response `data` array. */
  val reportSchema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("active", LongType),
    StructField("deaths", LongType),
    StructField("confirmed", LongType),
    StructField("recovered", LongType),
    StructField("active_diff", LongType),
    StructField("deaths_diff", LongType),
    StructField("confirmed_diff", LongType),
    StructField("recovered_diff", LongType),
    StructField("last_update", StringType),
    StructField("fatality_rate", DoubleType),
    StructField("region", regionSchema)
  ))

  /** The `data` array as parsed by from_json (flagship operator P2). */
  val reportArraySchema: ArrayType = ArrayType(reportSchema)

  /** Stage table: raw API responses keyed by (date, iso)
    * (reference `pg_init_covid19.sql:4-10`). */
  val stageSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("date_of_data", DateType),
    StructField("iso_country", StringType),
    StructField("json_data", StringType)
  ))

  /** Flattened warehouse contract — exact 14-column order
    * (reference `dags/ETL_covid19_pandas.py:89-91`,
    * `pg_init_covid19.sql:15-33`). */
  val flatContract: Seq[String] = Seq(
    "day_of_data", "active", "deaths", "confirmed", "recovered",
    "active_diff", "deaths_diff", "confirmed_diff", "recovered_diff",
    "fatality_rate", "region_name", "country_name", "lat", "long")
}
