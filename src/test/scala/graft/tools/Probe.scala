package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new AtomicLong(0); val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) { cpu.addAndGet(t.taskMetrics.executorCpuTime); tasks.incrementAndGet() }
      }
    })
    def drain(): Unit = org.apache.spark.sql.graft.shim.drainListenerBus(spark)
    def time(label: String)(f: => Unit): Unit = {
      f
      drain(); val c0 = cpu.get(); val k0 = tasks.get(); val t0 = System.nanoTime(); f
      drain()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s wall ${(cpu.get - c0) / 1e9}%7.2f cpu-s ${tasks.get - k0}%4d tasks")
    }
    val d10 = spark.read.parquet("/tmp/graft-sf1/documents.parquet")
    def re(pat: String) = sum(length(regexp_replace(col("text"), pat, " ")))
    println("== 10x, natural 11 tasks, pattern variants")
    time("[^a-z0-9\\s]") { d10.select(re("[^a-z0-9\\s]")).collect() }
    time("[^a-z0-9 ]") { d10.select(re("[^a-z0-9 ]")).collect() }
    time("[^a-z0-9\\t\\n ]") { d10.select(re("[^a-z0-9\\t\\n ]")).collect() }
    time("[A-Z]") { d10.select(re("[A-Z]")).collect() }
    time("\\s+") { d10.select(re("\\s+")).collect() }
    println("== 10x forced to 2 tasks (coalesce)")
    val d2 = d10.coalesce(2)
    time("[^a-z0-9\\s] 2task") { d2.select(re("[^a-z0-9\\s]")).collect() }
    spark.stop()
  }
}
