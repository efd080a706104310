package graft

import org.apache.spark.sql.SparkSession

/** Session-builder helpers shared by the entry-point mains.
  *
  * Object-store passthrough (SURVEY.md §2.1 / S4): the reference reads and
  * writes s3a:// URIs (reference etl.py:15-18,30-39 with credentials from
  * settings.cfg:1-4). This sandbox has no object store, so S4 is a
  * configuration concern, not a code one: any `GRAFT_HADOOP_CONF_*`
  * environment variable is forwarded as a `spark.hadoop.*` conf key
  * (double underscore → dot), e.g.
  *
  *   GRAFT_HADOOP_CONF_fs__s3a__endpoint=https://s3.example.com
  *   GRAFT_HADOOP_CONF_fs__s3a__access__key=...
  *
  * becomes `spark.hadoop.fs.s3a.endpoint` / `spark.hadoop.fs.s3a.access.key`,
  * after which every `spark.read.parquet("s3a://bucket/...")` in the
  * library works unchanged — paths are opaque strings everywhere.
  * With no such variables set (the sandbox) this is a no-op.
  */
object Sessions {
  def withObjectStoreConf(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.foldLeft(b) {
      case (acc, (k, v)) if k.startsWith("GRAFT_HADOOP_CONF_") =>
        acc.config("spark.hadoop." +
          k.stripPrefix("GRAFT_HADOOP_CONF_").replace("__", "."), v)
      case (acc, _) => acc
    }
}
