package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema load: surrogate keying + fact projection + FK integrity
  * (SURVEY.md §2.4 J1/J3, reference `pg_init_covid19.sql:144-188`).
  */
object Mart {

  /** J1: fill date_key + region_key on the flat table. The reference does two
    * in-place UPDATEs (`pg_init_covid19.sql:148-160`); Spark expresses the
    * same as a broadcast left join — left (not inner) because the reference
    * UPDATE leaves unmatched rows with NULL keys. The region dim is tiny
    * (237 rows in the reference) so `broadcast` is explicit: no shuffle of
    * the fact side at any scale.
    *
    * Documented divergence (like A3's missing DISTINCT): the reference joins
    * on region_name ALONE, which fans out fact rows when the same province
    * name exists under several countries (real feeds: 'Amazonas' in Brazil /
    * Colombia / Peru). We join on (region_name, country_name) — the actual
    * natural key of the dim — so each fact row matches at most one region. */
  def withSurrogateKeys(flat: DataFrame, regionDim: DataFrame): DataFrame =
    flat
      .withColumn("date_key", Dims.dateKey(col("day_of_data")))
      .join(
        broadcast(regionDim.select(
          col("region_key"), col("region_name"), col("country_name"))),
        Seq("region_name", "country_name"), "left")

  /** Fact projection: 10 measures + 2 FK keys
    * (reference `pg_init_covid19.sql:168-188`). */
  def factCovid(keyed: DataFrame): DataFrame =
    keyed.select(
      col("active"), col("deaths"), col("confirmed"), col("recovered"),
      col("active_diff"), col("deaths_diff"), col("confirmed_diff"),
      col("recovered_diff"), col("fatality_rate"),
      col("lat"), col("long"),
      col("date_key"), col("region_key").cast("int").as("region_key"))

  /** J3: FK integrity as a post-write check — Spark has no FK constraints
    * (`pg_init_covid19.sql:78-79`), so orphan keys are detected with a
    * left_anti join (broadcast on the dim side). Returns orphan rows;
    * callers assert isEmpty. */
  def fkOrphans(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim.select(col(key))), Seq(key), "left_anti")
}
