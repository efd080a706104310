package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe (test scope): time a8_flagship under conf variations to
  * localize the r3→r6 2.5 s-vs-1.8 s drift (box tax vs plan change).
  * Min-of-3 after warmup, forced via toRdd.count like Bench.
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.withObjectStoreConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(): Double = {
      val mk = SparkEntry.queries("a8_flagship")(spark, d)
      mk.queryExecution.toRdd.count() // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries("a8_flagship")(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    def withConf(k: String, v: String)(body: => Double): Double = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally prev match {
        case Some(p) => spark.conf.set(k, p); case None => spark.conf.unset(k)
      }
    }
    println(f"default A:    ${time()}%.3f s")
    println(f"bloom off:    ${withConf("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")(time())}%.3f s")
    println(f"default B:    ${time()}%.3f s")
    println(f"bloom off 2:  ${withConf("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")(time())}%.3f s")
    println(f"default C:    ${time()}%.3f s")
    spark.stop()
  }
}
