package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector (test scope, never ships): prints the
  * formatted physical plan of the named queries at sf0.001 — the basis
  * for the PLANS.md audits. Usage:
  *   sbt "Test/runMain graft.ExplainTool pipe_source_cap tx_ngram_freq"
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
