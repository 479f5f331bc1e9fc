package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("plain")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    if (mode.contains("shm")) b.config("spark.local.dir", "/dev/shm/graft-tmp")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (mode.contains("listener")) {
      val shuffleWrite = new AtomicLong(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a)
          .getOrElse(-1L)
        if (dur > 500) System.err.println(
          f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%4d wall=${dur / 1000.0}%7.2f s  cpu=${i.taskMetrics.executorCpuTime / 1e9}%7.2f s  run=${i.taskMetrics.executorRunTime / 1e3}%7.2f s  ${i.name.take(60)}")
      }
    })

    time("warmup-lite") {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
        .select(graft.ops.Dedup.shingles3(col("toks")).as("sh"))
        .select(size(col("sh")).as("x")).selectExpr("sum(x)").collect()
    }
    if (mode.contains("warmfull")) time("warmup-full") {
      import org.apache.spark.sql.functions.{col, concat, lit, size}
      spark.range(1000000).selectExpr("sum(id)").collect()
      graft.sources.Tables.lineitem(spark, dir).count()
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
        .select(graft.ops.Dedup.shingles3(col("toks")).as("sh"))
        .select((size(graft.ops.Dedup.minhashSignature(col("sh")))
          + graft.functions.SimHash(col("sh"), 32)).as("x"))
        .selectExpr("sum(x)").collect()
      graft.sources.Tables.embeddings(spark, dir)
        .select(graft.functions.GraftFunctions
          .vecDot(col("embedding"), col("embedding")).as("d"))
        .selectExpr("sum(d)").collect()
      spark.range(10000)
        .select(org.apache.spark.sql.functions.variant_get(
          org.apache.spark.sql.functions.parse_json(
            concat(lit("{\"k\":"), col("id").cast("string"), lit("}"))),
          "$.k", "int").as("k"))
        .selectExpr("sum(k)").collect()
      spark.catalog.clearCache()
    }
    if (mode.contains("gc")) { System.gc() }
    if (mode.contains("micro")) {
      import org.apache.spark.sql.functions._
      val base = spark.range(400000)
        .select(col("id"),
          array_sort(array_distinct(transform(sequence(lit(1), lit(52)),
            i => concat(lit("tok"), ((col("id") + i * 7919) % 2000).cast("string"),
              lit(" x"), ((col("id") * 31 + i) % 977).cast("string"))))).as("s1"),
          array_sort(array_distinct(transform(sequence(lit(1), lit(52)),
            i => concat(lit("tok"), ((col("id") + i * 104729) % 2000).cast("string"),
              lit(" x"), ((col("id") * 17 + i) % 977).cast("string"))))).as("s2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      base.count()
      def run(label: String, c: org.apache.spark.sql.Column): Unit =
        time(label)(base.select(c.as("n")).agg(sum(col("n"))).collect())
      run("decode baseline", (size(col("s1")) + size(col("s2"))).cast("long"))
      run("decode baseline 2", (size(col("s1")) + size(col("s2"))).cast("long"))
      run("array_intersect", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      run("array_intersect 2", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      run("native", graft.functions.GraftFunctions.sortedIntersectSize(col("s1"), col("s2")))
      run("native 2", graft.functions.GraftFunctions.sortedIntersectSize(col("s1"), col("s2")))
      run("array_intersect 3", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      run("native 3", graft.functions.GraftFunctions.sortedIntersectSize(col("s1"), col("s2")))
      base.unpersist()
      spark.stop()
      return
    }
    val df = graft.queries.TextQueries.q126PrefixJoin(spark, dir)
    time("q126 full")(df.queryExecution.toRdd.count())
    def dumpMetrics(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val interesting = p.metrics.filter { case (_, m) =>
          m.value > 0 && (m.metricType == "timing" || m.metricType == "nsTiming" ||
            m.name.exists(n => n.contains("spill") || n.contains("rows") ||
              n.contains("time")))
        }
        if (interesting.nonEmpty)
          System.err.println(s"[metrics] ${p.nodeName}  " + interesting.map {
            case (k, m) =>
              val v = if (m.metricType == "nsTiming") s"${m.value / 1e9}%.1f s"
                else m.value.toString
              s"$k=${m.value}"
          }.mkString("  "))
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            walk(i.relation.cachedPlan)
          case _ => ()
        }
      }
      walk(qe.executedPlan)
    }
    dumpMetrics(df.queryExecution)
    spark.stop()
  }
}
