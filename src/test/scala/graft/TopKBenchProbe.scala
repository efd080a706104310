package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark (test scope): native heap top-k vs the stock
  * window row_number form on the same data — the evidence line for
  * PLANS.md. Times are min-of-3 after a warmup, forced via toRdd.count.
  */
object TopKBenchProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def native = plans.TopKPerKey.topK(
      Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice")),
      keyCols = Seq("l_orderkey"),
      sortCols = Seq(("l_extendedprice", false), ("l_linenumber", true)), k = 2)

    def window = {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    }

    def time(mk: => org.apache.spark.sql.DataFrame): Double = {
      mk.queryExecution.toRdd.count() // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(f"hi-card: rows=${native.count()} native=${time(native)}%.3f s  window=${time(window)}%.3f s")

    // low-cardinality keys (top-100 per returnflag): the partial phase
    // collapses the exchange to tasks × keys × k rows
    def nativeLo = plans.TopKPerKey.topK(
      Tables.lineitem(spark, d).select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice")),
      keyCols = Seq("l_returnflag"),
      sortCols = Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), k = 100)
    def windowLo = {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(spark, d).select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 100).drop("rn")
    }
    println(f"lo-card: rows=${nativeLo.count()} native=${time(nativeLo)}%.3f s  window=${time(windowLo)}%.3f s")
    spark.stop()
  }
}
