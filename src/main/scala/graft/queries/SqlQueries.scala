package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-front-end family: each query is ONE ANSI SQL text that runs
  * unmodified on BOTH engines — `spark.sql` over the registered temp views
  * here, and DuckDB over the same parquet files as the oracle
  * ([[Oracles]] references these exact constants, so the two sides cannot
  * drift). The reference drives everything through SQL
  * (`dags/ETL_covid19_spark.py:50` builds `spark.sql(...)` strings;
  * `pg_init_covid19.sql` is pure SQL), so the SQL entry point is part of
  * its API surface — this family proves the engine's SQL dialect handles
  * multi-join aggregation, correlated scalar subqueries (Catalyst
  * decorrelates to an aggregate + join — no per-row re-execution), and
  * GROUPING SETS.
  *
  * Scale notes: the SQL planner path is identical to the DataFrame path
  * (both land in Catalyst), so everything the DataFrame family proves about
  * pushdown/broadcast/partial-agg holds here too. The TPC-H Q10 shape
  * filters orders by date BEFORE the join (predicate pushdown to the scan)
  * and aggregates on exact decimals so results are partition-order
  * independent.
  */
object SqlQueries {

  /** TPC-H Q10 (returned-item reporting): which customers returned the
    * most revenue in a quarter. Four-table join, decimal-exact revenue,
    * top-20 ranked on the DECIMAL (ties broken by key) with the double
    * cast only at output. */
  val tpch10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(rev_dec AS DOUBLE) AS revenue
      |FROM (
      |  SELECT c_custkey, c_name, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_returnflag = 'R'
      |  GROUP BY c_custkey, c_name, n_name
      |) t
      |ORDER BY rev_dec DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Correlated scalar subquery: parts larger than their brand's average
    * size + 2. AVG over an integer column is sum(int)/count — one double
    * division, identical in both engines (no float accumulation order).
    * Catalyst decorrelates this into a per-brand aggregate joined back —
    * the plan a hand-writer would build — rather than re-running the
    * subquery per row. */
  val scalarSubquerySql: String =
    """SELECT p_partkey, p_name, p_brand, p_size
      |FROM part p
      |WHERE p_size > 2 + (SELECT AVG(p2.p_size) FROM part p2
      |                    WHERE p2.p_brand = p.p_brand)""".stripMargin

  /** GROUPING SETS with GROUPING() markers: detail, per-flag subtotal, and
    * grand total in one pass (Spark plans a single Expand + one hash
    * aggregate — one shuffle for all three granularities). */
  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): a day-of-year spine built
    * by recursion — the SQL-standard iterate-until-done construct the
    * reference's date-dimension procedure uses (pg_init_covid19.sql's
    * 1-day interval loop) — LEFT-joined to 1996 order counts so empty
    * days surface as zero. Dialect-common: the recursion, dayofyear(),
    * and the join text run unmodified on Spark and DuckDB. The recursion
    * depth is the 366-row spine, not data-sized; the orders side
    * aggregates BEFORE the join. */
  val recursiveSpineSql: String =
    """WITH RECURSIVE spine(doy) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT doy + 1 FROM spine WHERE doy < 366
      |),
      |daily AS (
      |  SELECT dayofyear(o_orderdate) AS doy,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1
      |)
      |SELECT s.doy, COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(rev_cents, 0) AS rev_cents
      |FROM spine s LEFT JOIN daily d ON d.doy = s.doy""".stripMargin

  private def run(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sqlText)
  }

  def q84SqlTpch10(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, tpch10Sql)

  def q85ScalarSubquery(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, scalarSubquerySql)

  def q86GroupingSets(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, groupingSetsSql)

  def q169RecursiveSpine(spark: SparkSession, dir: String): DataFrame = {
    // Spark's default recursion guard (100 levels) is below the 366-row
    // spine; the limit is an engine knob, not query text, so raising it
    // here keeps the SQL dialect-common (MAX RECURSION LEVEL is
    // Spark-only syntax DuckDB would reject).
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "500")
    run(spark, dir, recursiveSpineSql)
  }

  /** The oracle IS the query: one dialect-common SQL text per entry. */
  val oracles: Map[String, String] = Map(
    "q84_sql_tpch10" -> tpch10Sql,
    "q85_scalar_subquery" -> scalarSubquerySql,
    "q86_grouping_sets" -> groupingSetsSql,
    "q169_recursive_spine" -> recursiveSpineSql)
}
