package graft

import org.apache.spark.sql.SparkSession

/** Dev-only registry-wide anti-pattern sweep (test scope): builds the
  * physical plan of EVERY declared query (no full execution — though a
  * few queries materialize small intermediates eagerly at build time via
  * localCheckpoint: the iterative trainers and sketch stores) and reports
  * scale-killer shapes — cartesian products and unpartitioned windows —
  * with the query names, so intentional cases can be allowlisted in the
  * standing PlanSpec guard and accidental ones fixed.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val skip = Set( // streaming drains + store builders: they execute on build
      "st_tumbling_stream", "st_interval_join", "st_incremental_probe",
      "st_left_outer_join", "st_static_enrich", "st_sessionize_state",
      "st_dedup_stream", "st_hll_stream", "st_foreach_batch")
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val globalWin = p.linesIterator.exists(l =>
          l.contains("Window") && l.contains("SinglePartition"))
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        if (cart || globalWin || bnlj) {
          val tags = Seq(
            if (cart) Some("CARTESIAN") else None,
            if (globalWin) Some("GLOBAL-WINDOW") else None,
            if (bnlj) Some("BNLJ") else None).flatten.mkString(",")
          println(s"$n: $tags")
        }
      } catch { case e: Throwable => println(s"$n: PLAN-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
