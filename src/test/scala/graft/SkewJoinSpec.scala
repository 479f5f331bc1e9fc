package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling, demonstrated and asserted: a join with one hot
  * key would put ~all its rows in one shuffle partition (the straggler
  * that kills wall-clock at 100 TB); with AQE skew-join enabled Spark
  * splits the oversized partition into parallel sub-reads at runtime.
  * This is the RUNTIME complement to the WRITE-TIME salting operator
  * (`Skew.saltedAgg`, q30): salting re-keys before the shuffle, AQE
  * re-plans after observing actual map output sizes — at scale you want
  * both available. Thresholds are lowered so the behavior triggers on
  * fixture-sized data; the asserted plan marker (`isSkewJoin`) is the
  * same one a production job shows. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 95% on key 0 — one shuffle partition dwarfs the rest
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id"))
          .as("k"), col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) — count plans a SEPARATE QueryExecution;
      // the final adaptive plan lives on the executed one
      val n = joined.collect().length
      // every key-0 left row matches right k=0; other keys miss (id >= 100
      // except multiples of 20 below 100)
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE skew-join did not trigger:\n" + plan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
