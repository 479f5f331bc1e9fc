package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension builders (SURVEY.md §7.2 step 2).
  *
  * date_dim replaces the reference's procedural plpgsql day loop
  * (`pg_init_covid19.sql:192-237`) with a declarative
  * `sequence(...) + explode` — a Catalyst Generator, fully distributed,
  * no driver-side loop (S8).
  */
object Dims {

  /** F2: yyyymmdd int date key — one `date_format` replaces the reference's
    * 6-line CASE pyramid (`pg_init_covid19.sql:149-154`). */
  def dateKey(d: Column): Column = date_format(d, "yyyyMMdd").cast("int")

  /** F7: ISO day-of-week (1=Mon..7=Sun) from Spark's dayofweek (1=Sun..7=Sat).
    * Off-by-one trap called out in SURVEY.md §7.3 — property-tested. */
  def isoDow(d: Column): Column = ((dayofweek(d) + lit(5)) % 7) + 1

  /** Generate the date dimension for an inclusive date range.
    * Reference semantics: `pg_init_covid19.sql:192-237` (F1-F10).
    * Default range matches the reference's 2000-01-01..2100-12-31
    * (36,890 rows). */
  def dateDim(spark: SparkSession,
              start: String = "2000-01-01",
              end: String = "2100-12-31"): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        to_date(lit(start)), to_date(lit(end)),
        expr("INTERVAL 1 DAY"))).as("full_date"))
    days.select(
      dateKey(col("full_date")).as("date_key"),
      date_format(col("full_date"), "yyyy-MM-dd").as("full_date"),
      date_format(col("full_date"), "EEEE").as("day_of_week"),
      isoDow(col("full_date")).cast("short").as("day_number_in_week"),
      (isoDow(col("full_date")) === 7).as("last_day_in_week_indicator"),
      date_format(col("full_date"), "MMMM").as("month_name"),
      month(col("full_date")).cast("short").as("month_number_in_year"),
      (!date_format(col("full_date"), "EEEE").isin("Saturday", "Sunday"))
        .as("weekday_flag"))
  }

  /** Region dimension from flattened covid rows: distinct region attributes +
    * a dense surrogate key. Fixes the reference's latent duplicate bug (no
    * DISTINCT in `pg_init_covid19.sql:132-140`, run-once by comment only) —
    * SURVEY.md A3. Surrogate keys via row_number over a deterministic order
    * (serial analog, reproducible across runs unlike
    * monotonically_increasing_id). The dimension is small (hundreds of rows);
    * the single-partition window is intentional and cheap — at 100 TB the
    * dim stays small because it's distinct region attributes, not facts. */
  def regionDim(flat: DataFrame): DataFrame = {
    // one row per natural key (country, region): real feeds revise lat/long
    // between days, and a plain distinct would then keep BOTH variants —
    // duplicate keys for one logical region, and a window-order tie making
    // the surrogate keys run-dependent. min() picks deterministically.
    val distinctRegions = flat
      .groupBy(col("region_name"), col("country_name"))
      .agg(min(col("lat")).as("lat"), min(col("long")).as("long"))
    distinctRegions.withColumn(
      "region_key",
      row_number().over(Window.orderBy(col("country_name"), col("region_name")))
        .cast("int"))
      .select("region_key", "region_name", "country_name", "lat", "long")
  }

  /** SCD1 dimension upsert — the day-2 problem [[regionDim]] leaves open:
    * once facts reference surrogate keys, a rebuild must NEVER renumber
    * them (the reference sidesteps this by seeding once and never
    * updating; real feeds revise attributes and add regions daily).
    * Contract: existing natural keys KEEP their surrogate key and take
    * updated attributes from the incoming batch (type-1 overwrite);
    * unseen natural keys get fresh keys ABOVE the current maximum,
    * numbered in deterministic natural-key order. Shapes for scale even
    * though dims are small: the incoming batch aggregates to one row per
    * natural key first, the update is a left join on the natural key, and
    * the max-key scalar joins as a broadcast single-row aggregate — no
    * driver round-trip, works unchanged on a million-row dimension. */
  def upsertRegionDim(existing: DataFrame, incomingFlat: DataFrame): DataFrame = {
    val nk = Seq("region_name", "country_name")
    val incoming = incomingFlat
      .groupBy(nk.map(col): _*)
      .agg(min(col("lat")).as("in_lat"), min(col("long")).as("in_long"))
    val updated = existing
      .join(incoming, nk, "left")
      .select(col("region_key"), col("region_name"), col("country_name"),
        coalesce(col("in_lat"), col("lat")).as("lat"),
        coalesce(col("in_long"), col("long")).as("long"))
    val maxKey = existing
      .agg(coalesce(max(col("region_key")), lit(0)).as("max_key"))
    val fresh = incoming
      .join(existing.select(nk.map(col): _*), nk, "left_anti")
      .withColumn("rk",
        row_number().over(Window.orderBy(col("country_name"), col("region_name"))))
      .crossJoin(broadcast(maxKey))
      .select((col("rk") + col("max_key")).cast("int").as("region_key"),
        col("region_name"), col("country_name"),
        col("in_lat").as("lat"), col("in_long").as("long"))
    updated.unionByName(fresh)
  }

  /** S7 static-seed load path: the reference pre-seeds region_dimension
    * with a fixed 237-row list (`pg_init_covid19.sql:248-508`) instead of
    * deriving it from data. The seed ships INSIDE the jar
    * (`resources/region_seed.csv`) so the load has no filesystem
    * dependency; surrogate keys are assigned by the same deterministic
    * rule as [[regionDim]], so the two paths are interchangeable in the
    * broadcast surrogate-key join. The seed is tiny by contract — parsing
    * driver-side and parallelizing is the right plan at any scale. */
  def regionDimFromSeed(spark: SparkSession): DataFrame = {
    val in = getClass.getResourceAsStream("/region_seed.csv")
    require(in != null, "region_seed.csv missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    import spark.implicits._
    val csv = spark.read
      .option("header", "true")
      .schema("region_name STRING, country_name STRING, lat DOUBLE, long DOUBLE")
      .csv(spark.createDataset(lines))
    csv.withColumn(
      "region_key",
      row_number().over(Window.orderBy(col("country_name"), col("region_name")))
        .cast("int"))
      .select("region_key", "region_name", "country_name", "lat", "long")
  }
}
