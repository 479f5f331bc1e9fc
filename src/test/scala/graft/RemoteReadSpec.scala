package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.sources.Tables

/** Remote-lake read surface: `Tables.load` must carry per-session reader
  * options (endpoint, credential provider, path-style access) into the
  * relation that resolves the scan, and the table path must compose for
  * any Hadoop-compatible URI scheme — the config plumb-through that turns
  * "reads local parquet" into the s3a/abfss posture, asserted without any
  * network (the options ride a local read; the URI composition is pure). */
class RemoteReadSpec extends SparkSpec {

  test("tablePath composes remote URIs unchanged") {
    assert(Tables.tablePath("s3a://lake-bucket/sf100", "lineitem") ===
      "s3a://lake-bucket/sf100/lineitem.parquet")
    assert(Tables.tablePath("abfss://c@acct.dfs.core.windows.net/sf100",
      "documents") ===
      "abfss://c@acct.dfs.core.windows.net/sf100/documents.parquet")
  }

  test("spark.graft.read.option.* conf keys reach the reader's relation options") {
    val keys = Seq(
      "fs.s3a.endpoint" -> "https://object-store.example:9000",
      "fs.s3a.path.style.access" -> "true")
    keys.foreach { case (k, v) =>
      spark.conf.set(Tables.ReadOptionPrefix + k, v)
    }
    try {
      val df = Tables.load(spark, sfDir, "nation")
      val rels = df.queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation
      }
      assert(rels.nonEmpty, "no file relation in the plan")
      val fsRel = rels.collectFirst { case r: HadoopFsRelation => r }
        .getOrElse(fail("relation is not HadoopFsRelation"))
      keys.foreach { case (k, v) =>
        assert(fsRel.options.get(k).contains(v),
          s"reader option $k did not reach the relation: ${fsRel.options}")
      }
      // the options must be per-read scope, not ambient hadoop conf:
      // a session WITHOUT the graft prefix set reads clean (asserted by
      // unsetting below and re-loading)
      keys.foreach { case (k, _) =>
        spark.conf.unset(Tables.ReadOptionPrefix + k)
      }
      val clean = Tables.load(spark, sfDir, "nation")
      val cleanRel = clean.queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation
      }.collectFirst { case r: HadoopFsRelation => r }.get
      assert(keys.forall { case (k, _) => !cleanRel.options.contains(k) },
        s"options leaked across reads: ${cleanRel.options}")
      // and the read itself still works with options attached
      assert(df.count() === 25)
    } finally keys.foreach { case (k, _) =>
      if (spark.conf.getOption(Tables.ReadOptionPrefix + k).isDefined)
        spark.conf.unset(Tables.ReadOptionPrefix + k)
    }
  }
}
