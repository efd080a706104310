package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (test scope, never ships): times the stages of
  * qc_cardinality_profile to find the dominant cost. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.CardProbe"
  */
object CardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.ext.{Hashing, HyperLogLog}
    val cols = Seq(
      "l_orderkey" -> "CAST(l_orderkey AS STRING)",
      "l_partkey" -> "CAST(l_partkey AS STRING)",
      "l_suppkey" -> "CAST(l_suppkey AS STRING)",
      "l_returnflag" -> "l_returnflag",
      "l_shipdate" -> "CAST(CAST(l_shipdate AS DATE) AS STRING)")
    def stacked = Tables.lineitem(spark, d).select(expr(
      s"stack(${cols.length}, " +
        cols.map { case (n, e) => s"'$n', $e" }.mkString(", ") +
        ") AS (col_name, v)"))
    def h = stacked.select(col("col_name"), expr(Hashing.sparkHash("v")).as("h"))
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    t("scan only")(Tables.lineitem(spark, d).queryExecution.toRdd.count())
    t("stack")(stacked.queryExecution.toRdd.count())
    t("stack+md5")(h.queryExecution.toRdd.count())
    t("regs (agg)")(HyperLogLog.regsOfKeyed(h, "col_name")
      .queryExecution.toRdd.count())
    t("full query")(ops.QcOps.cardinalityProfile(spark, d)
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
