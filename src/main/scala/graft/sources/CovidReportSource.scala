package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.CovidFixture

/** DataSource V2 connector for the reference's extract stage (SURVEY.md §2.1
  * S1): `spark.read.format("graft.sources.CovidReportSource")` yields the
  * stage table `(id, date_of_data, iso_country, json_data)` with ONE INPUT
  * PARTITION PER (date, country) — the connector shape of the reference's
  * 5-way parallel HTTP fan-out (`dags/ETL_covid19_spark.py:83-88`): each
  * partition's reader performs "one API call" (here: the deterministic
  * fixture generator; a production build swaps in an HTTP client per
  * partition, same classes).
  *
  * Real pushdown, both kinds:
  *  - partition-level filter pushdown: `iso_country = 'RUS'` / `IN (...)`
  *    prunes whole partitions — unmatched countries are never "fetched";
  *  - column pruning: if `json_data` is not in the required schema, the
  *    reader never builds the payload (the expensive part) at all.
  *
  * Options: `date` (yyyy-MM-dd), `provincesPerCountry` (default 48),
  * `payloadProvider` (fully-qualified class name of a
  * [[CovidPayloadProvider]]; default [[FixturePayloadProvider]]). The
  * provider is the FETCH SEAM: a production build sets
  * `.option("payloadProvider", "com.example.HttpCovidProvider")` and the
  * connector instantiates it per partition reader on the executor — the
  * same class-name-in-config injection JDBC uses for drivers. Everything
  * else (partitioning, pushdown, pruning) is provider-agnostic.
  */
class CovidReportSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CovidReportSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CovidReportTable(new CaseInsensitiveStringMap(properties))
}

object CovidReportSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("date_of_data", DateType, nullable = false),
    StructField("iso_country", StringType, nullable = false),
    StructField("json_data", StringType, nullable = false)))
}

/** The per-partition fetch seam (reference behavior:
  * `dags/ETL_covid19_pandas.py:33-44` — one HTTP GET per (date, country)).
  * Implementations must be top-level classes with a no-arg constructor;
  * they are instantiated reflectively on the EXECUTOR, once per partition
  * reader — exactly where a real HTTP client/connection pool would live. */
trait CovidPayloadProvider extends Serializable {
  /** Return the raw JSON envelope for one (date, country) report. */
  def fetch(ds: String, iso: String, country: String,
            countryIdx: Int, provinces: Int): String
}

/** Default provider: the deterministic covid-shaped fixture generator (the
  * sandbox has no egress; a production HTTP provider is a drop-in). */
final class FixturePayloadProvider extends CovidPayloadProvider {
  override def fetch(ds: String, iso: String, country: String,
                     countryIdx: Int, provinces: Int): String =
    CovidFixture.envelope(ds, iso, country, countryIdx, provinces)
}

private[sources] class CovidReportTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "covid_reports"
  override def schema(): StructType = CovidReportSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the merged properties; reader options came here
    val merged = new util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(caseInsensitiveOptions)
    new CovidScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class CovidScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var required: StructType = CovidReportSource.schema
  private var isoFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  /** One row per (date, country) partition, so LIMIT n == first n
    * partitions: the other countries are never "fetched" at all. Fully
    * pushed (return true): the scan emits at most `n` rows. */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("iso_country", _: String) => true
      case In("iso_country", _) => true
      case IsNotNull(_) => true // schema is non-nullable: trivially true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("iso_country", v: String) =>
        isoFilter = Some(isoFilter.getOrElse(Set(v)).intersect(Set(v)))
      case In("iso_country", vs) =>
        val s = vs.collect { case v: String => v }.toSet
        isoFilter = Some(isoFilter.map(_.intersect(s)).getOrElse(s))
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CovidScan(
    required,
    isoFilter,
    limit,
    options.getOrDefault("date", "2023-03-02"),
    options.getInt("provincesPerCountry", 48),
    options.getOrDefault("payloadProvider",
      classOf[FixturePayloadProvider].getName),
    // provider.* reader options travel to the provider constructor
    // (prefix stripped; keys are lowercased by CaseInsensitiveStringMap)
    options.asScala.collect {
      case (k, v) if k.startsWith("provider.") =>
        k.stripPrefix("provider.") -> v
    }.toMap)
}

private[sources] class CovidScan(required: StructType, isoFilter: Option[Set[String]],
                                 limit: Option[Int],
                                 ds: String, provinces: Int,
                                 providerClass: String,
                                 providerOptions: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CovidReportSource(date=$ds, countries=${isoFilter.getOrElse("ALL")}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  /** One partition per surviving (date, country): the fan-out unit.
    * A pushed LIMIT keeps only the first n partitions (1 row each). */
  override def planInputPartitions(): Array[InputPartition] = {
    val surviving = CovidFixture.isoCountries.zipWithIndex
      .filter { case ((iso, _), _) => isoFilter.forall(_.contains(iso)) }
    limit.fold(surviving)(surviving.take)
      .map { case ((iso, country), ci) =>
        CovidInputPartition(ci, iso, country, ds, provinces): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CovidReaderFactory(required, providerClass, providerOptions)
}

private[sources] final case class CovidInputPartition(
    countryIdx: Int, iso: String, country: String, ds: String,
    provinces: Int) extends InputPartition

private[sources] class CovidReaderFactory(required: StructType,
                                          providerClass: String,
                                          providerOptions: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CovidInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      // executor-side, once per partition reader — where a real HTTP
      // client (connection pool, auth token) would be initialized.
      // Providers that take configuration (HttpCovidProvider's url/headers)
      // declare a Map[String,String] constructor; stateless ones keep the
      // no-arg form — same class-name injection either way.
      private lazy val provider: CovidPayloadProvider = {
        val cls = Class.forName(providerClass)
        val inst =
          try cls.getDeclaredConstructor(classOf[Map[String, String]])
            .newInstance(providerOptions)
          catch {
            case _: NoSuchMethodException =>
              cls.getDeclaredConstructor().newInstance()
          }
        inst.asInstanceOf[CovidPayloadProvider]
      }
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = {
        val epochDays = java.time.LocalDate.parse(p.ds).toEpochDay.toInt
        // build ONLY the required columns — json_data (the expensive
        // "API call" payload) is skipped entirely when pruned away
        val values = required.fieldNames.map {
          case "id" => p.countryIdx.toLong
          case "date_of_data" => epochDays
          case "iso_country" => UTF8String.fromString(p.iso)
          case "json_data" => UTF8String.fromString(
            provider.fetch(p.ds, p.iso, p.country, p.countryIdx, p.provinces))
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
