package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (test scope): prints analyzed/optimized trees of
  * ad-hoc plans while designing optimizer rules. Edit freely; not part of
  * any suite.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    println("=== analyzed ===")
    println(df.queryExecution.analyzed.treeString)
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
