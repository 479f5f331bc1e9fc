package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.streaming.Streams

/** Real file-source streaming: landed JSON event files -> readStream with an
  * explicit schema (inference is never allowed on streams) -> the same
  * tumblingAgg transform -> memory sink. Covers the ingest shape the covid
  * stage would use as a stream (SURVEY.md §2.8): new files per micro-batch,
  * watermarked windows. */
class StreamingFileSpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("readStream over landed JSON files == batch over the same files") {
    val dir = Files.createTempDirectory("graft_stream").toString
    def land(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$dir/$name"), rows.mkString("\n").getBytes)

    land("b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00Z","event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:04:00Z","event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T10:12:00Z","event_type":"view","value":5.0}"""))

    val stream = Streams.tumblingAgg(
      spark.readStream.schema(eventSchema).json(dir))
    val q = stream.writeStream.format("memory").queryName("filetumb")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    // a second file lands mid-stream -> next micro-batch picks it up
    land("b2.json", Seq(
      """{"event_id":4,"ts":"2024-01-01T10:07:00Z","event_type":"click","value":3.0}"""))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("filetumb")
    val batch = Streams.tumblingAgg(spark.read.schema(eventSchema).json(dir))
    assert(streamed.collect().toSet === batch.collect().toSet)
    import spark.implicits._
    val clicks = streamed.filter(col("event_type") === "click")
      .select("n_events").as[Long].collect().sorted.toSeq
    assert(clicks === Seq(3L)) // 10:00, 10:04, 10:07 in the [10:00,10:10) window
  }

  test("foreachBatch lands micro-batches as date partitions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, Streams}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_lake").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val ms = MemoryStream[Event]
    val q = Streams.sinkDatePartitioned(ms.toDF(), out, ckpt)
    ms.addData(Seq(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1, "view", 2.0)))
    q.processAllAvailable()
    ms.addData(Seq(
      Event(3, java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 2, "click", 3.0)))
    q.processAllAvailable()
    q.stop()
    val lake = spark.read.parquet(out)
    assert(lake.count() === 3)
    // partition layout on disk + pruned per-date read
    assert(new java.io.File(s"$out/day_of_data=2024-01-02").exists())
    assert(lake.filter(col("day_of_data") === "2024-01-02").count() === 2)
  }

  test("restart from checkpoint resumes without reprocessing landed batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, Streams}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_lake_rs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_rs").toString
    val ms = MemoryStream[Event]
    val q1 = Streams.sinkDatePartitioned(ms.toDF(), out, ckpt)
    ms.addData(Seq(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0)))
    q1.processAllAvailable()
    q1.stop()
    // second query, SAME checkpoint + stream: committed offsets skip
    // event 1; only the new event lands — no duplicates on restart
    val q2 = Streams.sinkDatePartitioned(ms.toDF(), out, ckpt)
    ms.addData(Seq(
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2, "view", 2.0)))
    q2.processAllAvailable()
    q2.stop()
    val lake = spark.read.parquet(out)
    assert(lake.count() === 2)
    assert(lake.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
  }

  test("foreachBatch streams micro-batches into a JDBC table (Derby)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, Streams}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val db = Files.createTempDirectory("graft_stream_db").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val ckpt = Files.createTempDirectory("graft_ckpt_jdbc").toString
    val ms = MemoryStream[Event]
    val q = Streams.sinkJdbc(ms.toDF(), url, "events_live", props, ckpt)
    ms.addData(Seq(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view", 2.0)))
    q.processAllAvailable()
    ms.addData(Seq(
      Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 2, "click", 3.0)))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.jdbc(url, "events_live", props)
    assert(back.count() === 3)
    assert(back.filter(col("user_id") === 1).count() === 2)
  }

  test("foreachBatch audits data-contract expectations per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, Streams}
    import graft.quality.Quality
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_audit").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_audit").toString
    val ms = MemoryStream[Event]
    val q = Streams.auditExpectations(ms.toDF(), Seq(
      Quality.RowRule("positive_value", col("value") > 0.0),
      Quality.RowRule("known_type", col("event_type").isin("click", "view"))),
      out, ckpt)
    ms.addData(Seq( // batch 0: one negative value
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view", -2.0),
      Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 2, "view", 3.0)))
    q.processAllAvailable()
    ms.addData(Seq( // batch 1: one unknown event type
      Event(4, java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 2, "purchase", 4.0)))
    q.processAllAvailable()
    q.stop()
    val audit = spark.read.parquet(out)
      .as[(String, Long, Long, Long)].collect() // rule, violations, checked, batch_id
      .map(r => (r._4, r._1) -> ((r._2, r._3))).toMap
    assert(audit((0L, "positive_value")) === ((1L, 3L)))
    assert(audit((0L, "known_type")) === ((0L, 3L)))
    assert(audit((1L, "positive_value")) === ((0L, 1L)))
    assert(audit((1L, "known_type")) === ((1L, 1L)))
  }

  test("Trigger.AvailableNow drains the backlog, checkpoints, and stops by itself") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_avnow").toString
    val ckpt = Files.createTempDirectory("graft_avnow_ck").toString
    def land(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$dir/$name"), rows.mkString("\n").getBytes)
    land("b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00Z","event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:04:00Z","event_type":"view","value":2.0}"""))
    val out = Files.createTempDirectory("graft_avnow_out").toString
    // the scheduled-batch-over-stream mode: process everything that exists,
    // write to a durable sink, then terminate — exactly-once across
    // invocations via the shared checkpoint (memory sink can't recover)
    def drain(): Unit = {
      val q = spark.readStream.schema(eventSchema).json(dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "AvailableNow query must stop on its own")
    }
    drain()
    import spark.implicits._
    assert(spark.read.schema(eventSchema).parquet(out).count() === 2L)
    // second invocation: one NEW file landed; the checkpoint must skip b1
    land("b2.json", Seq(
      """{"event_id":3,"ts":"2024-01-01T10:07:00Z","event_type":"click","value":3.0}"""))
    drain()
    assert(spark.read.schema(eventSchema).parquet(out)
      .select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L),
      "restart must process ONLY the new file (no duplicates, no loss)")
  }
}
