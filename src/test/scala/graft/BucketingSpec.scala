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

  test("join on bucketed key plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
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
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce Exchange on either side
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed left side must not re-shuffle:\n" + plan.take(3000))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed right side must not re-shuffle:\n" + plan.take(3000))
      // and results match the plain parquet join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }

  test("incremental band store bucket-written on bh probes shuffle-free corpus-side") {
    // the SCALE.md claim behind dd_incremental: persist the seen corpus's
    // LSH band table bucketed on the band hash, and a new batch's probe
    // join shuffles ONLY the batch side — the 100 TB corpus never moves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val seen = docs.filter(col("doc_id") % ext.Dedup.SEEN_MOD =!= 0)
      val (_, _, bands) = ext.Dedup.sketchStore(seen)
      bands.write.mode(SaveMode.Overwrite)
        .bucketBy(8, "bh").sortBy("bh")
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
      val plan = cand.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(bh"),
        "corpus-side band store must not re-shuffle:\n" + plan.take(3000))
      // and the bucketed probe finds exactly the plain join's candidates
      val expect = probeBands.join(bands,
          col("pband") === col("band") && col("pbh") === col("bh"))
        .select(col("nid"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS graft_bands_bucketed")
    }
  }
}
