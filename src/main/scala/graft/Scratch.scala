package graft

import org.apache.spark.sql.SparkSession

// Throwaway profiling main — not part of the engine surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def plantime(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      println(f"[scratch] plan  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[scratch] exec  $label: ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }

    import org.apache.spark.sql.functions._

    // warm the JVM/parquet paths
    time("warm full simhash")(graft.ext.Dedup.simhash(spark, sfDir).queryExecution.toRdd.count())

    plantime("simhashValues", graft.ext.Dedup.simhashValues(spark, sfDir))

    // banding pieces, inlined from Dedup.simhash
    val sim = graft.ext.Dedup.simhashValues(spark, sfDir)
    val BBITS = 10; val BLOCKS = 6
    val mask = (1 << BBITS) - 1
    val combos = for { i <- 0 until BLOCKS; j <- i + 1 until BLOCKS } yield (i, j)
    val bandArr = combos.zipWithIndex.map { case ((i, j), c) =>
      s"""struct($c as band,
         |  (shiftright(sim, ${i * BBITS}) % ${mask + 1}) * ${mask + 1}
         |    + shiftright(sim, ${j * BBITS}) % ${mask + 1} as bk)""".stripMargin
    }.mkString("array(", ", ", ")")
    val banded = sim.select(col("doc_id"), col("sim"),
      explode(expr(bandArr)).as("cb"))
      .select(col("doc_id"), col("sim"),
        col("cb.band").as("band"), col("cb.bk").as("bk"))
    plantime("banded", banded)
    val joined = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band")
        && col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
    plantime("joined", joined)
    plantime("joined+dedup", joined.dropDuplicates("ia", "ib").filter(col("hamming") <= 4))
    plantime("full simhash", graft.ext.Dedup.simhash(spark, sfDir))

    // same for the checkpointed variant
    val simCk = graft.ext.Dedup.simhashValues(spark, sfDir).localCheckpoint()
    val bandedCk = simCk.select(col("doc_id"), col("sim"),
      explode(expr(bandArr)).as("cb"))
      .select(col("doc_id"), col("sim"),
        col("cb.band").as("band"), col("cb.bk").as("bk"))
    val joinedCk = bandedCk.as("a")
      .join(bandedCk.as("b"), col("a.band") === col("b.band")
        && col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      .dropDuplicates("ia", "ib").filter(col("hamming") <= 4)
      .orderBy(col("ia"), col("ib"))
    plantime("full simhash (ckpt sim)", joinedCk)
    spark.stop()
  }
}
