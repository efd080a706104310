package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: with a synthetically hot key and tiny skew
  * thresholds, AQE must split the oversized partition (skew=true in the
  * final adaptive plan) and still produce correct results.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> conf.get("spark.sql.adaptive.enabled", "true"),
      "spark.sql.autoBroadcastJoinThreshold" -> conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true"))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of left rows share key 0 → one hot shuffle partition
      val left = (0 until 20000)
        .map(i => (if (i % 20 == 0) i.toLong % 50 else 0L, s"payload_$i"))
        .toDF("k", "payload")
      val right = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = left.join(right, Seq("k"))
      // execute THIS dataset (count() would build a separate plan whose
      // AQE run wouldn't reflect into joined.queryExecution)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE should mark the skewed join:\n" + finalPlan.take(2000))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
