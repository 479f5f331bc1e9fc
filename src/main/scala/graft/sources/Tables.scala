package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Design notes for scale (100 TB): all reads go through `spark.read.parquet`
  * so Catalyst gets column pruning + filter pushdown for free. Callers must
  * filter/select on the returned frame (never collect) so pushdown reaches the
  * scan. At production scale these would be date-partitioned directories; the
  * loader API stays the same.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-conf prefix for remote-lake reader options. `sfDir` is already
    * any Hadoop-compatible URI (`s3a://bucket/sf100`, `abfss://...`), but a
    * lake read usually also needs filesystem configuration — endpoint,
    * credentials provider, path-style access. Set them once per session as
    *   spark.conf.set("spark.graft.read.option.fs.s3a.endpoint", ...)
    * and every Tables read carries them: DataFrameReader options are merged
    * into the per-relation Hadoop conf (`newHadoopConfWithOptions`), so
    * `fs.*` keys genuinely reach the FileSystem that resolves the scan —
    * per-read scope, nothing global mutated. No network is touched unless
    * the URI scheme itself is remote. */
  val ReadOptionPrefix = "spark.graft.read.option."

  /** The composed table path — pure so the URI plumb-through is testable
    * without a live object store. */
  def tablePath(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  private def readOptions(spark: SparkSession): Map[String, String] =
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith(ReadOptionPrefix) =>
        k.stripPrefix(ReadOptionPrefix) -> v
    }

  /** Conf prefix for pre-bucketed layout resolution. When
    * `spark.graft.bucketed.<table>` names a directory written by
    * [[graft.tools.BucketedLayout]], that table's reads resolve to an
    * external BUCKETED catalog table over those files instead of the
    * plain parquet path — the scan then reports
    * `HashPartitioning(bucketCol, n)`, so a distinct/aggregate/join
    * clustered on (a superset of) the bucket column needs NO exchange.
    * Bucket metadata only exists in a catalog, so the layout is
    * re-registered per session from the directory's `_bucketspec` file
    * (idempotent CREATE; the registration binds the LOGICAL table name —
    * a session that must read the same table from two different sfDirs
    * must not set the conf). */
  val BucketedPrefix = "spark.graft.bucketed."

  private def bucketedTable(spark: SparkSession, name: String,
                            path: String): DataFrame = {
    val ident = s"graft_bucketed_${name}_${(path.hashCode & 0x7fffffff).toHexString}"
    if (!spark.catalog.tableExists(ident)) {
      val p = new org.apache.hadoop.fs.Path(path, "_bucketspec")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(p),
        s"$BucketedPrefix$name=$path has no _bucketspec file — not a " +
          "BucketedLayout directory")
      val props = {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.contains("=")).map { l =>
            val Array(k, v) = l.split("=", 2); k -> v
          }.toMap
        finally in.close()
      }
      val schemaDdl = spark.read.parquet(path).schema.toDDL
      spark.sql(
        s"""CREATE TABLE $ident ($schemaDdl) USING parquet
           |CLUSTERED BY (${props("bucketBy")})
           |SORTED BY (${props("sortBy")})
           |INTO ${props("buckets")} BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    spark.table(ident)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.conf.getOption(BucketedPrefix + name) match {
      case Some(path) => bucketedTable(spark, name, path)
      case None =>
        spark.read.options(readOptions(spark)).parquet(tablePath(sfDir, name))
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events fixture carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as long (legacy conf)
    * and convert to microsecond TimestampType with integer division —
    * floor semantics identical to DuckDB's ns->us truncation, and no
    * double-precision detour (2024 epoch-nanos exceed 2^53).
    *
    * NOTE the legacy flag is session-wide and stays set (restoring it
    * immediately would be racy: the flag is consulted at scan time, not at
    * DataFrame construction). Every graft read path goes through this
    * loader, and nanos-as-long is a no-op for non-nanos files, so the
    * session-global setting is the deliberate choice here. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Parquet written with isAdjustedToUTC=false (pandas/pyarrow default)
        // surfaces as TIMESTAMP_NTZ, which unix_micros/unix_seconds reject.
        // The fixture's wall-clock values are UTC, and graft pins the session
        // TZ to UTC, so the cast is value-preserving.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all fixture tables as temp views for `spark.sql` queries.
    * `events` must go through its nanos-aware loader — a raw parquet read
    * of TIMESTAMP(NANOS) fails at schema inference without the legacy
    * conf, and the view should expose the converted micros column anyway
    * (same shape SQL authors get from the DataFrame API). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
