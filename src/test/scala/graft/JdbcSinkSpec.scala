package graft

import graft.sources.Sinks

/** S4 exercised for real: `Sinks.appendJdbc` round-trips through embedded
  * Derby (ships with Spark's jars, no network) — append semantics, then a
  * `spark.read.jdbc` readback with a pushed filter. This closes the one
  * previously-untested sink path (reference `spark_transform_data.py:60-66`
  * appends the fact table to Postgres over JDBC; embedded Derby stands in
  * for the server, the writer contract is identical). */
class JdbcSinkSpec extends SparkSpec {

  test("appendJdbc appends and reads back through embedded Derby") {
    // derby.stream.error.file is pinned JVM-wide in build.sbt javaOptions
    // (Derby caches the log target at first boot, so a spec-level property
    // would be ignored when another Derby suite runs first)
    val dbPath = java.nio.file.Files.createTempDirectory("graft_derby")
      .resolve("db")
    val url = s"jdbc:derby:$dbPath;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    import spark.implicits._
    val facts = Seq(
      (20230302, 1, 100L, 0.01),
      (20230302, 2, 200L, 0.02)).toDF("date_key", "region_key", "confirmed", "rate")
    Sinks.appendJdbc(facts, url, "fact_covid", props)
    Sinks.appendJdbc(facts, url, "fact_covid", props) // append, not replace
    val back = spark.read.jdbc(url, "fact_covid", props)
    assert(back.count() === 4)
    // filter pushes into the JDBC scan (WHERE on the database side)
    val one = back.filter($"region_key" === 2)
    assert(one.count() === 2)
    assert(one.select("confirmed").collect().map(_.getLong(0)).toSeq === Seq(200L, 200L))
  }

  test("literal option(\"query\") read executes database-side and matches the Spark-computed twin (S3's exact form)") {
    // the reference's one-line source shape (spark_transform_data.py:17-25):
    // the relation IS a pushed SQL query, so the database executes the
    // filter + aggregate and Spark scans only the result
    val dbPath = java.nio.file.Files.createTempDirectory("graft_derby_q")
      .resolve("db")
    val url = s"jdbc:derby:$dbPath;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, i % 7, i * 3)).toDF("id", "grp", "v")
    Sinks.appendJdbc(rows, url, "src_rows", props)
    // Spark's JDBC writer passes the TABLE name through literally (Derby
    // upcases the unquoted `src_rows`) but dialect-quotes every COLUMN
    // (they stay lowercase) — the pushed query must match that mix
    val pushed = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("query",
        """SELECT "grp", SUM("v") AS sv FROM src_rows WHERE "id" <= 100 GROUP BY "grp"""")
      .load()
    // the scan leaf is the generated subquery over the pushed text — the
    // aggregate never exists in the Spark plan, proof it ran DB-side
    val leaves = pushed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(leaves.contains("SPARK_GEN_SUBQ"),
      s"expected the pushed-query relation in the scan leaf, got: $leaves")
    assert(!pushed.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val got = pushed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.filter($"id" <= 100).groupBy($"grp")
      .agg(org.apache.spark.sql.functions.sum($"v").as("sv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(want.size === 7)
  }

  test("readJdbcPartitioned splits the scan into range cursors without losing rows") {
    val dbPath = java.nio.file.Files.createTempDirectory("graft_derby_part")
      .resolve("db")
    val url = s"jdbc:derby:$dbPath;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    import spark.implicits._
    val rows = (1L to 1000L).map(i => (i, s"r$i", i * 10)).toDF("id", "tag", "v")
    Sinks.appendJdbc(rows, url, "wide_table", props)
    val back = Sinks.readJdbcPartitioned(spark, url, "wide_table", props,
      partitionCol = "id", lowerBound = 100L, upperBound = 900L,
      numPartitions = 4)
    // 4 concurrent cursors...
    assert(back.rdd.getNumPartitions === 4)
    // ...and the bounds only steer split points: rows OUTSIDE
    // [lowerBound, upperBound) still arrive (nothing silently dropped)
    assert(back.count() === 1000L)
    assert(back.agg(org.apache.spark.sql.functions.sum($"v")).head.getLong(0)
      === (1L to 1000L).map(_ * 10).sum)
    // a pushed filter still reaches the per-partition WHERE clauses
    assert(back.filter($"id" <= 50).count() === 50L)
  }
}
