package graft.tools

import java.util.concurrent.atomic.AtomicLong

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
      case "q182long" =>
        // A/B for the r6 rewrite-filter fix: one doc that is a single
        // 8-token phrase repeated k times (the operator's worst case —
        // |cuts| -> |toks|), old indexed-filter HOF vs the native merge
        // walk. The old form is reconstructed verbatim (pre-r6 q182 tail)
        // on the SAME cuts pipeline so the delta is the rewrite stage only.
        import spark.implicits._
        import graft.ops.{TextAnalysis => TA}
        val nReps = args.lift(2).flatMap(_.toIntOption).getOrElse(15000)
        val tmp = java.nio.file.Files.createTempDirectory("probe182").toString
        val p8 = (1 to 8).map("p" + _).mkString(" ")
        Seq((0L, Seq.fill(nReps)(p8).mkString(" ")),
            (1L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
          .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        println(s"[probe] q182long: ${nReps * 8} tokens in the dup doc")
        timed(spark, "q182 merge walk (r6)",
          graft.queries.TextQueries.q182DedupRewrite(spark, tmp))
        val W = 8
        val toks = Tables.documents(spark, tmp)
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val wins = toks
          .where(size(col("toks")) >= W)
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(1), size(col("toks")) - (W - 1)),
              i => md5(concat_ws(" ", slice(col("toks"), i, lit(W)))))).as(Seq("pos", "h")))
        val keepers = wins.groupBy(col("h"))
          .agg(count(lit(1)).as("nh"),
            min(struct(col("doc_id"), col("pos"))).as("k"))
          .where(col("nh") >= 2)
          .select(col("h"), col("k.doc_id").as("kdoc"), col("k.pos").as("kpos"))
        val cuts = wins.join(keepers, Seq("h"))
          .where(!(col("doc_id") === col("kdoc") && col("pos") === col("kpos")))
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + (W - 1))).as("tp"))
          .distinct()
          .groupBy(col("doc_id")).agg(collect_list(col("tp")).as("cuts"))
        timed(spark, "q182 HOF filter (pre-r6)",
          toks.join(cuts, Seq("doc_id"), "left")
            .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
              filter(col("toks"), (_, i) =>
                !array_contains(coalesce(col("cuts"), array().cast("array<int>")), i))
                .as("kept"))
            .where(size(col("kept")) > 0)
            .select(col("doc_id"), col("n_tokens"),
              (col("n_tokens") - size(col("kept")).cast("long")).as("n_removed"),
              size(col("kept")).cast("long").as("n_kept"),
              md5(concat_ws(" ", col("kept"))).as("kept_md5")))
      case "q48" =>
        // why does the no-shuffle unpivot run near-serial at the 1000x rung?
        // decompose: bare filtered scan, +casts, +unpivot; print task counts
        @volatile var tasks = 0
        @volatile var maxTaskMs = 0L
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              tasks += 1
              if (t.taskInfo != null)
                maxTaskMs = math.max(maxTaskMs, t.taskInfo.duration)
            }
          })
        def reset(): Unit = { tasks = 0; maxTaskMs = 0L }
        val li = Tables.lineitem(spark, dir)
        reset()
        timed(spark, "scan+filter",
          li.filter(col("l_quantity") >= 49.0).select(col("l_orderkey")))
        println(s"[probe]   tasks=$tasks maxTaskMs=$maxTaskMs")
        reset()
        timed(spark, "scan+filter+casts",
          li.filter(col("l_quantity") >= 49.0)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity").cast("double").as("l_quantity"),
              col("l_extendedprice").cast("double").as("l_extendedprice"),
              col("l_discount").cast("double").as("l_discount"),
              col("l_tax").cast("double").as("l_tax")))
        println(s"[probe]   tasks=$tasks maxTaskMs=$maxTaskMs")
        reset()
        timed(spark, "full q48",
          graft.queries.CoreQueries.q48Unpivot(spark, dir), explain = true)
        println(s"[probe]   tasks=$tasks maxTaskMs=$maxTaskMs")
      case "streamdedup" =>
        // ingest-throughput probe for the streaming near-dup filter:
        // documents from `dir` flow through an AvailableNow file stream
        // (the production micro-batch path, RocksDB state store); reports
        // wall, docs/s, and the flagged-doc count. Arg 3 caps the doc
        // count (0 = all); arg 4 sets maxFilesPerTrigger (0 = single
        // batch); arg 5 sets the dedup horizon TTL in seconds (0 = none,
        // dedup-against-all-history) — the state bound whose effect on
        // per-doc cost this probe exists to measure.
        val cap = args.lift(2).flatMap(_.toLongOption).getOrElse(0L)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val tmp = java.nio.file.Files.createTempDirectory("probe_sdd").toString
        val src = Tables.documents(spark, dir).select("doc_id", "text")
        (if (cap > 0) src.filter(col("doc_id") < cap) else src)
          .write.mode("overwrite").parquet(s"$tmp/in")
        val n = spark.read.parquet(s"$tmp/in").count()
        // AvailableNow drains the backlog as real micro-batches, the
        // production shape — and the cadence a processing-time TTL needs
        // to actually expire state mid-run
        val mfpt = args.lift(3).flatMap(_.toIntOption).getOrElse(0)
        val ttlSec = args.lift(4).flatMap(_.toLongOption).getOrElse(0L)
        val horizon = if (ttlSec > 0)
          Some(java.time.Duration.ofSeconds(ttlSec)) else None
        val reader = spark.readStream
          .schema("doc_id BIGINT, text STRING")
        val stream = (if (mfpt > 0)
          reader.option("maxFilesPerTrigger", mfpt) else reader)
          .parquet(s"$tmp/in")
        val t0 = System.nanoTime()
        // sink: per-batch distinct doc_ids appended to parquet. The old
        // memory sink accumulated every hit row in the driver, so at 5M
        // docs the SINK's growth polluted the state-store measurement;
        // this keeps driver memory per-batch-bounded and the flagged
        // count exact (distinct again on read).
        val writer = graft.streaming.Streams.streamingNearDupHits(stream, horizon)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.Streams.DupHit], _: Long) =>
            batch.select("doc_id").distinct()
              .write.mode("append").parquet(s"$tmp/hits")
          }
          .outputMode("append")
          .option("checkpointLocation", s"$tmp/ckpt")
        if (horizon.isEmpty) {
          // no timers -> AvailableNow terminates itself when the backlog
          // is drained
          val q = writer
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } else {
          // a processing-time-timeout operator requests a batch on EVERY
          // trigger, so AvailableNow never self-terminates (see
          // Streams.bandOwnerWithHorizon). Drain as fast as possible and
          // stop once the listener has seen every input row ingested.
          val ingested = new AtomicLong(0)
          val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
            import org.apache.spark.sql.streaming.StreamingQueryListener._
            override def onQueryStarted(e: QueryStartedEvent): Unit = ()
            override def onQueryProgress(e: QueryProgressEvent): Unit =
              ingested.addAndGet(e.progress.numInputRows)
            override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(listener)
          try {
            val q = writer
              .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
              .start()
            while (ingested.get() < n && q.isActive) Thread.sleep(200)
            q.exception.foreach(throw _)
            q.stop()
          } finally spark.streams.removeListener(listener)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val flagged =
          try spark.read.parquet(s"$tmp/hits").select("doc_id").distinct().count()
          catch { case _: Throwable => 0L } // no hits -> no sink dir
        println(f"[probe] streamdedup: $n%d docs in $sec%.1f s = ${n / sec}%.0f docs/s, $flagged%d flagged, ttl=${ttlSec}s mfpt=$mfpt")
      case other =>
        sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
