package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe (test scope): print the formatted physical plan of one
  * registry query — the feed for PLANS.md plan walks.
  * Usage: sbt "Test/runMain graft.PlanProbe <query> [sfDir]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("a8_flagship")
    val d = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val spark = Sessions.withObjectStoreConf(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, d)
    println(s"==== $name @ $d ====")
    df.explain("formatted")
    spark.stop()
  }
}
