package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-verifiable HyperLogLog: cardinality estimation whose every bit
  * is replayable in DuckDB. Spark's builtin `approx_count_distinct` is
  * correct but its sketch internals (hash, register layout) are
  * engine-private, so `a7_approx_distinct` could only ever be rows-only
  * checked. This implementation builds the HLL from public parts:
  *
  *  - the 60-bit cross-engine hash ([[Hashing]]): bucket = h mod m,
  *    remaining 52 bits are the register stream;
  *  - rho = 1-based position of the first set bit in the 52-bit window,
  *    computed with string bit-math (`instr(lpad(bin(w),52,'0'),'1')`) —
  *    identical builtins in both engines, no log2 rounding hazards;
  *  - registers folded to the harmonic sum in BUCKET ORDER (the
  *    collect_list → array_sort → aggregate idiom; DuckDB lists with
  *    ORDER BY), so the double sum is a deterministic sequential fold;
  *  - the raw-HLL estimate alpha_m·m²/Σ2^−M_j with DOUBLE-suffixed
  *    literals on the Spark side (bare decimals would be DECIMAL-typed
  *    and round differently than DuckDB's doubles). No small/large-range
  *    corrections: ln() implementations differ across libm builds, and
  *    the raw estimate is the deterministic core worth verifying.
  *
  * Scale: one groupBy over m=256 buckets (fixed-size shuffle), one
  * 256-row fold — the standard HLL cost model, hash-verified end to end.
  */
object HyperLogLog {
  import Hashing.{duckHash, sparkHash}

  private val M = 256  // buckets (2^8); 60-bit hash leaves a 52-bit stream

  /** (m, est_distinct, true_distinct) over orders.o_custkey. */
  def hllVerified(s: SparkSession, d: String): DataFrame = {
    val h = Tables.orders(s, d)
      .select(expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))
    val regs = h
      .select((col("h") % M).cast("int").as("bucket"),
        expr(s"h DIV $M").as("w"))
      .withColumn("rho", expr(
        "CASE WHEN w = 0 THEN 53 ELSE instr(lpad(bin(w), 52, '0'), '1') END")
        .cast("int"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mj"))
    val full = s.range(0, M).select(col("id").cast("int").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mj"), lit(0)).as("mj"))
    val harmonic = full.agg(expr(
      """aggregate(
        |  transform(array_sort(collect_list(struct(bucket, mj))),
        |    x -> pow(CAST(2.0 AS DOUBLE), -CAST(x.mj AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("s_inv"))
    val exact = Tables.orders(s, d)
      .agg(count_distinct(col("o_custkey")).as("true_distinct"))
    harmonic.crossJoin(exact)
      .select(lit(M).cast("long").as("m"),
        expr(s"0.7213D / (1D + 1.079D / ${M}D) * ${M}D * ${M}D / s_inv")
          .as("est_distinct"),
        col("true_distinct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a7_hll_verified" -> hllVerified
  )

  val oracle: Map[String, String] = Map(
    "a7_hll_verified" ->
      s"""WITH h AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |r AS (
         |  SELECT CAST(h % $M AS INT) AS bucket, h // $M AS w FROM h),
         |regs AS (
         |  SELECT bucket,
         |         MAX(CASE WHEN w = 0 THEN 53
         |                  ELSE instr(lpad(bin(w), 52, '0'), '1') END) AS mj
         |  FROM r GROUP BY 1),
         |filled AS (
         |  SELECT CAST(b AS INT) AS bucket, COALESCE(regs.mj, 0) AS mj
         |  FROM (SELECT unnest(range(0, $M)) AS b) bs
         |  LEFT JOIN regs ON bs.b = regs.bucket),
         |harmonic AS (
         |  SELECT list_reduce(
         |    list_prepend(0.0, [pow(2.0, -CAST(mj AS DOUBLE))
         |                       for mj in list(mj ORDER BY bucket)]),
         |    (acc, v) -> acc + v) AS s_inv
         |  FROM filled),
         |exact AS (
         |  SELECT COUNT(DISTINCT o_custkey) AS true_distinct FROM orders)
         |SELECT CAST($M AS BIGINT) AS m,
         |       0.7213 / (1 + 1.079 / $M) * $M * $M / s_inv AS est_distinct,
         |       true_distinct
         |FROM harmonic CROSS JOIN exact""".stripMargin
  )
}
