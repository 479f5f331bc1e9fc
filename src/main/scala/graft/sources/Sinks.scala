package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Sink operators (SURVEY.md §2.1 S2/S4/S6).
  *
  * The reference appends to Postgres over JDBC (`spark_transform_data.py:
  * 60-66`, `dags/ETL_covid19_spark.py:48-50`); the lakehouse-native
  * equivalent is append-mode Parquet partitioned by the increment date —
  * which is also what makes P6's per-date reads partition-PRUNED instead of
  * filtered: each daily run writes exactly one new partition directory and
  * never touches previous days (idempotent re-runs via overwrite of just
  * that partition with dynamic partitionOverwriteMode).
  *
  * The JDBC form is the same writer contract with the format swapped —
  * exercised end-to-end against embedded Derby (JdbcSinkSpec): append,
  * readback, and a database-side pushed filter.
  */
object Sinks {

  /** S2/S4/S6: append `df` as one date partition of a Parquet table. */
  def appendDatePartition(df: DataFrame, path: String,
                          dateCol: String = "day_of_data"): Unit =
    df.write
      .mode("append")
      .partitionBy(dateCol)
      .parquet(path)

  /** Idempotent per-date re-run: replaces ONLY the partitions present in
    * `df` (dynamic partition overwrite), the correct re-run semantic the
    * reference approximates with `DELETE ... WHERE day_of_data = ds` +
    * re-insert (`pg_init_covid19.sql:113`). */
  def overwriteDatePartition(df: DataFrame, path: String,
                             dateCol: String = "day_of_data"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(dateCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Layout-aware append: rows sorted by `clusterBy` WITHIN each written
    * file, so parquet row-group min/max stats become tight, disjoint
    * ranges — a selective filter on the cluster column then skips whole
    * row groups at scan time. This is the single cheapest data-layout
    * lever at 100 TB: same files, same reader, 10-100x less IO for
    * point-ish queries on the cluster key. (The multi-dimensional version
    * of this idea is Z-ordering; one sort column covers the common case.) */
  def appendClusteredDatePartition(df: DataFrame, path: String,
                                   clusterBy: String,
                                   dateCol: String = "day_of_data"): Unit =
    df.sortWithinPartitions(col(dateCol), col(clusterBy))
      .write
      .mode("append")
      .partitionBy(dateCol)
      .parquet(path)

  /** S4 JDBC parity: same append contract against a database table. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)

  /** Read one date partition back — shows up as PartitionFilters (pruning),
    * not PushedFilters, in the scan: no data file of another date is opened. */
  def readDatePartition(spark: SparkSession, path: String, ds: String,
                        dateCol: String = "day_of_data"): DataFrame =
    spark.read.parquet(path).filter(col(dateCol) === ds)
}
