package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc plan/cost probe: runs named sub-plans of a query under the
  * bench's timing discipline (untimed GC before, cpu/shuffle deltas) and
  * prints the formatted plan — the tool for answering "WHICH stage of
  * this query is the super-linear one" at a ladder rung without editing
  * the query. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Probe <sfDir> <probe>"
  */
object Probe {
  def cpuNow(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getThreadMXBean match {
      case b if b.isThreadCpuTimeSupported =>
        // sum across live threads is imprecise for dead workers; use the
        // OS-level process figure instead
        java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
          case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
          case _ => 0L
        }
      case _ => 0L
    }
  }

  def timed(spark: SparkSession, name: String, df: => DataFrame,
            explain: Boolean = false): Unit = {
    System.gc()
    val c0 = cpuNow(); val t0 = System.nanoTime()
    val frame = df
    val n = frame.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val cpu = (cpuNow() - c0) / 1e9
    println(f"[probe] $name%-28s $sec%8.2f s  $cpu%8.1f cpu-s  $n%12d rows")
    if (explain) println(frame.queryExecution.executedPlan.toString.take(4000))
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probe = args.lift(1).getOrElse("q06")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    probe match {
      case "q06" =>
        val o = Tables.orders(spark, dir)
        timed(spark, "orders.count", o.select(col("o_orderkey")))
        timed(spark, "scan big filter",
          o.filter(col("o_totalprice") > 400000.0)
            .select("o_orderkey", "o_orderstatus"))
        timed(spark, "scan urgent filter",
          o.filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey", "o_orderstatus"))
        timed(spark, "union no distinct",
          o.filter(col("o_totalprice") > 400000.0)
            .select("o_orderkey", "o_orderstatus")
            .unionByName(o.filter(col("o_orderpriority") === "1-URGENT")
              .select("o_orderkey", "o_orderstatus")))
        timed(spark, "full q06 (with distinct)",
          graft.queries.CoreQueries.q06Union(spark, dir), explain = true)
      case other =>
        sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
