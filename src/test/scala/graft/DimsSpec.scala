package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.ops.{Dims, Mart}

/** F2 / F7 traps (SURVEY.md §7.3): yyyymmdd key round-trip and the
  * Postgres-isodow vs Spark-dayofweek remap, checked exhaustively against
  * java.time as the independent calendar oracle (4 years incl. a leap year
  * and year boundaries — every weekday x month combination occurs). */
class DimsSpec extends SparkSpec {

  private val start = LocalDate.of(2019, 12, 25)
  private val days: Seq[LocalDate] =
    (0 until 1500).map(start.plusDays(_)) // through Feb 2024, spans 2020 leap

  test("isoDow matches java.time ISO day-of-week, exhaustively") {
    import spark.implicits._
    val got = days.map(_.toString).toDF("d")
      .select(col("d"), Dims.isoDow(to_date(col("d"))).as("iso"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    days.foreach { d =>
      assert(got(d.toString) === d.getDayOfWeek.getValue, s"isoDow mismatch for $d")
    }
  }

  test("dateKey yyyymmdd round-trips, exhaustively") {
    import spark.implicits._
    val got = days.map(_.toString).toDF("d")
      .select(col("d"), Dims.dateKey(to_date(col("d"))).as("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    days.foreach { d =>
      val want = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      assert(got(d.toString) === want, s"dateKey mismatch for $d")
    }
  }

  test("dateDim matches reference cardinality and known-date attributes") {
    val dim = Dims.dateDim(spark).cache()
    try {
      assert(dim.count() === 36890L) // pg_init_covid19.sql:195-196
      val row = dim.filter(col("date_key") === 20230302).collect().head
      // 2023-03-02 was a Thursday
      assert(row.getAs[String]("day_of_week") === "Thursday")
      assert(row.getAs[Short]("day_number_in_week") === 4)
      assert(row.getAs[Boolean]("last_day_in_week_indicator") === false)
      assert(row.getAs[String]("month_name") === "March")
      assert(row.getAs[Boolean]("weekday_flag") === true)
      val sun = dim.filter(col("date_key") === 20230305).collect().head
      assert(sun.getAs[Short]("day_number_in_week") === 7)
      assert(sun.getAs[Boolean]("last_day_in_week_indicator") === true)
      assert(sun.getAs[Boolean]("weekday_flag") === false)
    } finally dim.unpersist()
  }

  test("region seed loads 237 rows with dense deterministic keys") {
    val seed = Dims.regionDimFromSeed(spark)
    val rows = seed.collect()
    assert(rows.length === 237) // pg_init_covid19.sql:248-508
    assert(rows.map(_.getAs[Int]("region_key")).sorted.toSeq === (1 to 237))
    // spot-check a known row (public JHU CSSE geography)
    val anhui = rows.find(_.getAs[String]("region_name") == "Anhui").get
    assert(anhui.getAs[String]("country_name") === "China")
    assert(anhui.getAs[Double]("lat") === 31.8257)
  }

  test("seed dim and data-derived dim are interchangeable in the key join") {
    import org.apache.spark.sql.functions._
    val seed = Dims.regionDimFromSeed(spark)
    // a flat feed whose region attrs come from the seed universe, with
    // repeats (facts repeat regions) and a shuffled order
    val flat = seed.select("region_name", "country_name", "lat", "long")
      .unionAll(seed.select("region_name", "country_name", "lat", "long"))
      .repartition(7)
    val derived = Dims.regionDim(flat)
    // same keys, same attributes — the two load paths agree exactly,
    // so Mart.withSurrogateKeys keys facts identically with either dim
    assert(derived.collect().toSet === seed.collect().toSet)
    val viaSeed = flat.withColumn("day_of_data", lit("2023-03-02").cast("date"))
    val a = Mart.withSurrogateKeys(viaSeed, seed)
      .select("region_name", "country_name", "region_key").collect().toSet
    val b = Mart.withSurrogateKeys(viaSeed, derived)
      .select("region_name", "country_name", "region_key").collect().toSet
    assert(a === b)
    assert(a.forall(_.get(2) != null)) // every fact row keyed
  }

  test("upsertRegionDim: stable surrogate keys, type-1 updates, fresh keys above max") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day1 = Seq(
      ("Alpha", "Atlantis", 1.0, 10.0),
      ("Beta", "Atlantis", 2.0, 20.0),
      ("Gamma", "Lemuria", 3.0, 30.0))
      .toDF("region_name", "country_name", "lat", "long")
    val dim1 = Dims.regionDim(day1)
    // day 2: Beta's coordinates revised (twice, inconsistently — min picks),
    // Gamma unseen, one brand-new region arrives
    val day2 = Seq(
      ("Beta", "Atlantis", 2.5, 20.5),
      ("Beta", "Atlantis", 2.4, 20.6),
      ("Delta", "Lemuria", 4.0, 40.0))
      .toDF("region_name", "country_name", "lat", "long")
    val dim2 = Dims.upsertRegionDim(dim1, day2)
    val byName = dim2.collect()
      .map(r => r.getAs[String]("region_name") ->
        (r.getAs[Int]("region_key"), r.getAs[Double]("lat"), r.getAs[Double]("long")))
      .toMap
    val keys1 = dim1.collect()
      .map(r => r.getAs[String]("region_name") -> r.getAs[Int]("region_key")).toMap
    // every existing region keeps its key — facts written against dim1 stay valid
    assert(Seq("Alpha", "Beta", "Gamma").forall(n => byName(n)._1 == keys1(n)))
    // type-1 overwrite takes the incoming (min-deduped) attributes
    assert(byName("Beta")._2 === 2.4 && byName("Beta")._3 === 20.5)
    // absent-from-batch rows keep their old attributes
    assert(byName("Gamma")._2 === 3.0)
    // the new region gets the next key above the existing maximum
    assert(byName("Delta")._1 === keys1.values.max + 1)
    assert(dim2.count() === 4)
    // idempotency: re-running the same batch changes nothing
    val dim3 = Dims.upsertRegionDim(dim2, day2)
    assert(dim3.collect().toSet === dim2.collect().toSet)
  }
}
