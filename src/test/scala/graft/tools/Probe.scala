package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

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
      drain(); val c0 = cpu.get(); val t0 = System.nanoTime(); f
      drain()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s wall ${(cpu.get - c0) / 1e9}%7.2f cpu-s")
    }
    val signs = Similarity.hyperplaneSigns(8 * Similarity.MaxPlanesPerTable, 64)
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft-sf1")) {
      println(s"== $dir")
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val n = emb.count()
      val pn = Similarity.adaptivePlanes(n)
      println(s"n=$n pn=$pn")
      time("scan sum(label)") { emb.select(sum(col("label"))).collect() }
      time("one vec_dot") { emb.select(sum(graft.ops.Similarity.dot(col("embedding"), col("embedding")))).collect() }
      time(s"banded pn=$pn") {
        emb.select(col("vec_id"),
          posexplode(Similarity.srpBucketsAdaptive(col("embedding"), signs, 8, pn)))
          .select(sum(col("col"))).collect() }
      time("banded pn=3") {
        emb.select(col("vec_id"),
          posexplode(Similarity.srpBucketsAdaptive(col("embedding"), signs, 8, 3)))
          .select(sum(col("col"))).collect() }
    }
    spark.stop()
  }
}
