package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables: pre-partitioned storage so equi-joins on the bucket
  * key need NO shuffle at read time — the core co-location technique for
  * repeated big⋈big joins at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  /** Shuffle exchanges on the join-input side that scans `table` — i.e.
    * the table's bucketed layout was NOT accepted as the join's
    * distribution and Spark re-shuffled it before joining. Tree-walk (not
    * plan-string substring) so a key-order or multi-key change in the
    * exchange rendering can't make the assertion vacuously pass; scoped to
    * join inputs so post-join exchanges (e.g. the aggregation's) don't
    * false-positive.
    */
  private def joinSideShuffles(df: org.apache.spark.sql.DataFrame,
      table: String): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def scansTable(p: SparkPlan): Boolean = p.collectFirst {
      case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table == table) => s
    }.nonEmpty
    df.queryExecution.executedPlan.collect {
      case j: BaseJoinExec =>
        j.children.filter(scansTable)
          .flatMap(_.collect { case e: ShuffleExchangeExec => e })
    }.flatten
  }

  test("join on bucketed key plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.lineitem(spark, sf)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_bucketed")
      Tables.orders(spark, sf)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_o_bucketed")
      val li = spark.table("graft_li_bucketed")
      val o = spark.table("graft_o_bucketed")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      // the join itself must not introduce Exchange on either side
      assert(joinSideShuffles(joined, "graft_li_bucketed").isEmpty,
        "bucketed left side must not re-shuffle:\n"
          + joined.queryExecution.executedPlan.toString.take(3000))
      assert(joinSideShuffles(joined, "graft_o_bucketed").isEmpty,
        "bucketed right side must not re-shuffle:\n"
          + joined.queryExecution.executedPlan.toString.take(3000))
      // and results match the plain parquet join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }

  test("incremental band store bucket-written on (band, bh) probes shuffle-free corpus-side") {
    // the SCALE.md claim behind dd_incremental: persist the seen corpus's
    // LSH band table bucketed on the band hash, and a new batch's probe
    // join shuffles ONLY the batch side — the 100 TB corpus never moves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val seen = docs.filter(col("doc_id") % ext.Dedup.SEEN_MOD =!= 0)
      val (_, _, bands) = ext.Dedup.sketchStore(seen)
      // bucket on BOTH join keys: bucketing on bh alone does not satisfy
      // the (band, bh) join distribution, so the planner silently disabled
      // the bucketed scan and re-shuffled the corpus side (caught when the
      // substring assert below was upgraded to a plan-tree walk)
      bands.write.mode(SaveMode.Overwrite)
        .bucketBy(8, "band", "bh").sortBy("band", "bh")
        .saveAsTable("graft_bands_bucketed")
      val store = spark.table("graft_bands_bucketed")
      val fresh = docs.filter(col("doc_id") % ext.Dedup.SEEN_MOD === 0)
      val probeBands = ext.Dedup.bandsOf(
          ext.Dedup.signaturesOf(ext.Dedup.shingledOf(fresh)))
        .select(col("doc_id").as("nid"), col("band").as("pband"),
          col("bh").as("pbh"))
      val cand = probeBands.join(store,
          col("pband") === col("band") && col("pbh") === col("bh"))
        .select(col("nid"), col("doc_id").as("sid"))
      assert(joinSideShuffles(cand, "graft_bands_bucketed").isEmpty,
        "corpus-side band store must not re-shuffle:\n"
          + cand.queryExecution.executedPlan.toString.take(3000))
      // and the bucketed probe finds exactly the plain join's candidates
      val expect = probeBands.join(bands,
          col("pband") === col("band") && col("pbh") === col("bh"))
        .select(col("nid"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_bands_bucketed")
    }
  }
}
