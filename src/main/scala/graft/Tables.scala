package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders for the driver test data (TESTDATA.md).
  *
  * All tables are parquet; schema comes from the files (the reference reads
  * parquet the same way, `etl.py:49-59`). Loaders are thin on purpose so
  * Catalyst sees a plain `LogicalRelation` and can push filters/projections
  * into the vectorized parquet reader.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Multi-path scan (reference `readMultipleParquet`, etl.py:49-59): N
    * parquet paths unioned at the file level into one DataFrame.
    */
  def loadMulti(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark refuses by default
    * (PARQUET_TYPE_ILLEGAL), so it is read as a nanos long and truncated to
    * microseconds, the same ns→µs truncation DuckDB applies — and plain
    * TIMESTAMP_MICROS (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark).
    * The loader adapts to whichever shape the files carry instead of
    * hard-coding one; any third shape is a loud failure, never a silent
    * unit reinterpretation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Normalize the `ts` column to a session-zoned TIMESTAMP regardless of
    * how the parquet files encoded it:
    *  - LongType         → nanos-as-long (legacy TIMESTAMP(NANOS) files),
    *                       truncate ns→µs exactly like DuckDB;
    *  - TimestampNTZType → TIMESTAMP_MICROS files; cast to TIMESTAMP, an
    *                       identity on the micros value under the UTC
    *                       session zone the entry points pin;
    *  - TimestampType    → already what downstream expects, pass through.
    * Anything else throws: a surprise encoding must fail analysis, not
    * shift every timestamp by a unit factor (the r9 failure mode).
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other; expected nanos-as-long (LongType), " +
          "TIMESTAMP_NTZ, or TIMESTAMP — refusing to guess a time unit")
    }

  /** The physical type `ts` reads as from the footer (nanosAsLong enabled),
    * used by the streaming loader to build a matching reader schema.
    */
  private[graft] def eventsTsType(s: SparkSession, d: String): DataType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").schema("ts").dataType
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Spread a CPU-bound stage's input across the session's cores WHEN the
    * incoming plan under-parallelizes it. The driver test corpus is a
    * single parquet row group, so scans of it are 1-partition and every
    * narrow per-row pipeline downstream (shingle+md5, tokenize, decode)
    * runs on one core of 32; on a properly split production input the
    * scan already carries ≥ defaultParallelism partitions and this helper
    * is the IDENTITY — it never adds a shuffle at scale. (The physical
    * partition probe builds the RDD DAG but runs no job.)
    */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // no physical-partition probe on streams
    // The probe (toRdd.getNumPartitions) is free ONLY on scan-, filter-,
    // or checkpoint-rooted frames; on an exchange-bearing plan AQE's
    // doExecute would materialize the shuffle stages eagerly (running the
    // query's jobs twice). Frames whose logical plan already contains an
    // exchange-inducing operator keep their partitioning: AQE sizes those
    // stages itself.
    import org.apache.spark.sql.catalyst.plans.logical._
    val exchangeBearing = df.queryExecution.analyzed.collectFirst {
      case _: Aggregate => (); case _: Join => (); case _: Window => ()
      case _: Sort => (); case _: Distinct => (); case _: Deduplicate => ()
      case _: RepartitionOperation => (); case _: GlobalLimit => ()
    }.isDefined
    if (exchangeBearing) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}

/** Determinism helpers for the DuckDB-oracle differential harness
  * (SURVEY.md §5, §7.4). Floating-point SUM/AVG are order-dependent in
  * IEEE double; at 1000 executors the combine order is nondeterministic,
  * so every verified aggregate goes through exact decimal arithmetic and
  * only converts to double at the very end. This is both the correctness
  * fix for the oracle AND the right call at 100 TB — the result no longer
  * depends on partitioning.
  */
object Det {
  import org.apache.spark.sql.Column

  /** Order-independent sum: per-row cast to decimal (exact), decimal sum
    * (exact, associative), final cast to double. Oracle twin:
    * `CAST(SUM(CAST(x AS DECIMAL(30,scale))) AS DOUBLE)` — values are
    * identical at any precision wide enough for the row values.
    *
    * Width policy: the per-row cast only needs to hold ONE row's value
    * (≤ ~1e7 for every measure in the schema), so precision 18 (the
    * widest long-compact decimal) is the default; Spark's SUM adds 10
    * digits of headroom on top (→ 28,4), which holds ~10^24 — at 100 TB
    * a measure summing to 1e18 still has 6 orders of margin. Precision 30
    * forced every row through the BigDecimal slow path for nothing.
    */
  def dsum(c: Column, scale: Int = 4, prec: Int = 18): Column =
    sum(c.cast(DecimalType(prec, scale))).cast(DoubleType)

  /** Order-independent average (sum/count in double at the end).
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(30,scale))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 4, prec: Int = 18): Column =
    sum(c.cast(DecimalType(prec, scale))).cast(DoubleType) / count(c)

  /** Rewrite-proof exact COUNT DISTINCT, for exactness-critical columns
    * (sketch-verification baselines like `true_distinct`/`exact7`, QC dup
    * rates). [[graft.plans.RewriteExactDistinctToApprox]] — when its
    * session flag is on — swaps every single-argument COUNT(DISTINCT x)
    * for an HLL++ sketch at optimization time, which happens at ACTION
    * time, after any builder-local conf pinning has been restored. The
    * two-argument form COUNT(DISTINCT x, 0) is semantically identical
    * (the never-null literal doesn't change the tuple count, and rows
    * with null x are skipped either way) but counts distinct TUPLES,
    * which the rule faithfully refuses to rewrite — so columns built with
    * this helper stay exact under any session configuration.
    */
  def exactDistinct(c: Column): Column = count_distinct(c, lit(0))

  /** SQL-side twin of dsum, for building oracle strings. */
  def sqlSum(x: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,$scale))) AS DOUBLE)"

  def sqlAvg(x: String, scale: Int = 4): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(30,$scale))) AS DOUBLE) / COUNT($x))"

  /** IMPORTANT: dsum/davg are safe on RAW columns (clean decimal data).
    * For COMPUTED doubles (e.g. price*(1-discount)) casting the product to
    * decimal is NOT portable: Spark converts double→decimal via the
    * shortest string representation (HALF_UP), DuckDB via the exact binary
    * value — they can disagree by 1 ulp of the target scale. Instead cast
    * each factor to its natural decimal scale first and multiply exactly
    * in decimal: [[money]] / [[rate]].
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rates like l_discount / l_tax: 2-decimal values in [0,1). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** 1 - rate, exact in decimal. */
  def oneMinus(c: Column): Column =
    lit(1).cast(DecimalType(3, 2)) - rate(c)

  /** 1 + rate, exact in decimal. */
  def onePlus(c: Column): Column =
    lit(1).cast(DecimalType(3, 2)) + rate(c)

  /** The ubiquitous discounted-price revenue measure, exact in decimal,
    * cast to double at the very end. SQL twin: [[sqlRevenue]].
    */
  def revenue(price: Column, discount: Column): Column =
    sum(money(price) * oneMinus(discount)).cast(DoubleType)

  def sqlRevenue(price: String = "l_extendedprice",
      discount: String = "l_discount"): String =
    s"CAST(SUM(CAST($price AS DECIMAL(12,2)) * (1 - CAST($discount AS DECIMAL(4,2)))) AS DOUBLE)"
}
