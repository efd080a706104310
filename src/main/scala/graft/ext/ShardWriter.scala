package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard packer: the last step of a corpus pipeline (filter →
  * dedup → pack) that downstream training jobs consume. Documents are
  * assigned to shards by a deterministic hash of their id — membership is
  * reproducible run-to-run and machine-to-machine — and each shard is
  * written as its own parquet partition directory, one file per shard, so
  * a trainer can claim shard ranges without listing the whole corpus and
  * a re-run overwrites byte-identical structure.
  *
  * Scale: one shuffle (hash repartition on the shard key) sized by the
  * shard count, then a sorted single-pass write per shard.
  * `maxRecordsPerFile` bounds file sizes within a shard so a 100 TB/N
  * shard still splits into readable chunks; balance comes from the hash
  * (binomial around corpus/N — see the spec's tolerance assert).
  */
object ShardWriter {
  /** Write `docs` into `n` hash-sharded parquet partitions under `dir`. */
  def writeShards(docs: DataFrame, dir: String, n: Int,
      maxRecordsPerFile: Long = 1000000L): Unit =
    docs.withColumn("shard", pmod(xxhash64(col("doc_id")), lit(n.toLong)).cast("int"))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard").parquet(dir)

  /** [[writeShards]] for docs that ALREADY carry a `shard` column —
    * the publish path, where shard membership was assigned upstream by
    * the packing hash and must be written as-is (re-deriving it here
    * would silently decouple the shard files from the packing manifest).
    */
  def writeShardsPre(docs: DataFrame, dir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    docs.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard").parquet(dir)
}
