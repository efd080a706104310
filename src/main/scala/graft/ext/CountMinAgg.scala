package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch: the fixed-size mergeable frequency summary ModeAgg's
  * scaladoc points to for high-cardinality columns. Buffer = D×W long
  * counters (8 KiB regardless of input size), merged by elementwise add —
  * associative and commutative, so the result is partition-count
  * independent and the map-side partials are genuine sketches themselves.
  *
  * Input is the pre-hashed 60-bit cross-engine key ([[Hashing]]); row i's
  * bucket reuses the MinHash arithmetic family mod 2^40 (every
  * intermediate < 2^47, inside DuckDB's overflow-trapping BIGINT). CMS
  * counters are EXACT sums — only the bucket mapping is lossy — so the
  * whole sketch, and every estimate read from it, is deterministic and
  * DuckDB-replayable: the oracle rebuilds the same counters with a
  * GROUP BY and takes the same min over rows.
  *
  * Scale: the sketch answers "approximate count of any key" over 100 TB
  * with one aggregation whose shuffle is D×W longs per partition — the
  * structure you bolt onto a stream (state = one buffer) or use for skew
  * detection before a join.
  */
object CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  val D = 4    // hash rows
  val W = 256  // counters per row
  private val M40 = 1099511627776L // 2^40

  /** Bucket of 60-bit hash h in row i — DuckDB-replayable arithmetic. */
  def bucket(i: Int, h: Long): Int =
    (((2L * i + 1L) * (h % M40) + i.toLong * 2654435761L) % M40 % W).toInt

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < D) { b(i * W + bucket(i, h)) += 1L; i += 1 }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  import Hashing.{duckHash, sparkHash}

  /** Build the sketch over orders.o_custkey, then read estimates for
    * customer keys 1..25 from it and pair each with the exact count. The
    * sketch (8 KiB) is collected to the driver and inlined as a literal —
    * a sketch IS a driver-sized summary; that is its entire point — so
    * the estimate lookup costs one codegen'd projection per probe key.
    */
  def cmsFreq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.orders(s, d)
      .select(expr(sparkHash("CAST(o_custkey AS STRING)")).as("h")).as[Long]
    val sketch: Array[Long] = hashed.select(CountMinAgg.toColumn).head()
    val skLit = array(sketch.map(lit(_)): _*)
    val probes = s.range(1, 26).select(col("id").as("cust_key"))
      .withColumn("h", expr(sparkHash("CAST(cust_key AS STRING)")))
    val ests = (0 until D).map { i =>
      val b = s"(((${2 * i + 1} * (h % $M40)) + ${i}L * 2654435761L) % $M40) % $W"
      element_at(skLit, (expr(b) + lit(i * W) + lit(1)).cast("int"))
    }
    val exact = Tables.orders(s, d).groupBy(col("o_custkey").as("cust_key"))
      .agg(count(lit(1)).as("true_count"))
    probes
      .withColumn("est", least(ests: _*))
      .join(exact, Seq("cust_key"), "left")
      .select(col("cust_key"), col("est"),
        coalesce(col("true_count"), lit(0L)).as("true_count"))
      .orderBy(col("cust_key"))
  }

  /** Join-size estimation by CMS INNER PRODUCT (Cormode & Muthukrishnan
    * 2005, §4.2): |A ⋈ₖ B| = Σₖ f_A(k)·f_B(k), and the dot product of
    * two CMS rows built with the SAME hash family overestimates exactly
    * that — min over the D rows tightens it. This is the query-
    * optimizer primitive for sizing a join BEFORE running it (two
    * sketch scans, no shuffle of the join itself); the output pairs the
    * estimate with the true size and relative error (always ≥ 0 —
    * CMS inner product never underestimates, collisions only add).
    *
    * Both sketches here are built relationally (GROUP BY (row, bucket)
    * — the same counters [[CountMinAgg]]'s typed Aggregator holds in
    * its 8 KiB buffer), so every counter, product and min is exact
    * BIGINT and the oracle replays the estimator bit-for-bit.
    *
    * Scale: each sketch is one map-side-combined aggregation to ≤ D×W
    * rows; the estimate joins two ≤1024-row frames. At 100 TB this
    * replaces a shuffle of both fact tables with two scans and a
    * driver-sized dot product — the skew/size probe you run before
    * choosing a join strategy.
    */
  def joinSizeSketch(s: SparkSession, d: String): DataFrame = {
    def counters(df: DataFrame): DataFrame =
      df.select(expr(sparkHash("CAST(l_partkey AS STRING)")).as("h"))
        .select(col("h"), explode(expr(s"sequence(0, ${D - 1})")).as("i"))
        .withColumn("b",
          expr(s"((2 * i + 1) * (h % $M40) + i * 2654435761L) % $M40 % $W"))
        .groupBy(col("i"), col("b")).agg(count(lit(1)).as("c"))
    val a = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val bdf = Tables.lineitem(s, d).filter(col("l_linestatus") === "F")
    val est = counters(a)
      .join(counters(bdf).withColumnRenamed("c", "c2"), Seq("i", "b"))
      .groupBy(col("i")).agg(sum(col("c") * col("c2")).as("est_i"))
      .agg(min(col("est_i")).as("sk_est"))
    val exact = a.groupBy(col("l_partkey")).agg(count(lit(1)).as("fa"))
      .join(bdf.groupBy(col("l_partkey")).agg(count(lit(1)).as("fb")),
        Seq("l_partkey"))
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("true_size"))
    est.crossJoin(broadcast(exact)) // two 1-row frames
      .withColumn("rel_err", expr(
        "CAST(sk_est - true_size AS DOUBLE) / CAST(true_size AS DOUBLE)"))
      .orderBy(col("sk_est"))
  }

  /** CMS WIDTH PLANNING SWEEP — the sizing study a platform team runs
    * before standardizing a sketch config (the [[graft.ext.Dedup]]
    * band-planner's sibling for frequency sketches): the SAME key stream
    * builds counters at three widths in one pass, the same 25 probes read
    * estimates from each, and the report shows how total/max
    * overestimate collapses as width grows — observed error against the
    * 1/W theory, on the caller's own key distribution rather than a
    * textbook bound. Every counter and min is exact BIGINT
    * (DuckDB-replayable); CMS can only overestimate, so `est ≥ true` is
    * an invariant the spec pins per width.
    *
    * Scale: one scan, counters ≤ D·Σwidths rows — the sweep costs the
    * same shuffle as one sketch, which is why you run it at full scale
    * instead of guessing.
    */
  def cmsWidthSweep(s: SparkSession, d: String): DataFrame = {
    val widths = Seq(64, 256, 1024)
    val wArr = s"array(${widths.mkString(", ")})"
    val bExpr = s"((2*i+1) * (h % $M40) + i * 2654435761L) % $M40 % w"
    val counters = Tables.orders(s, d)
      .select(expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))
      .withColumn("i", explode(expr(s"sequence(0, ${D - 1})")))
      .withColumn("w", explode(expr(wArr)))
      .withColumn("b", expr(bExpr))
      .groupBy(col("w"), col("i"), col("b")).agg(count(lit(1)).as("c"))
    val probes = s.range(1, 26).select(col("id").as("cust_key"))
      .withColumn("h", expr(sparkHash("CAST(cust_key AS STRING)")))
      .withColumn("i", explode(expr(s"sequence(0, ${D - 1})")))
      .withColumn("w", explode(expr(wArr)))
      .withColumn("b", expr(bExpr))
    val exact = Tables.orders(s, d).groupBy(col("o_custkey").as("cust_key"))
      .agg(count(lit(1)).as("true_count"))
    probes
      .join(counters, Seq("w", "i", "b"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(col("w"), col("cust_key")).agg(min(col("c")).as("est"))
      .join(exact, Seq("cust_key"), "left")
      .na.fill(0L, Seq("true_count"))
      .groupBy(col("w")).agg(
        count(lit(1)).as("n_probes"),
        sum(col("est") - col("true_count")).as("total_overestimate"),
        max(col("est") - col("true_count")).as("max_overestimate"),
        sum(when(col("est") === col("true_count"), 1L).otherwise(0L))
          .as("n_exact"))
      .orderBy(col("w"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_cms_freq" -> cmsFreq,
    "x_cms_width_sweep" -> cmsWidthSweep,
    "x_join_size_sketch" -> joinSizeSketch
  )

  val oracle: Map[String, String] = Map(
    "x_cms_width_sweep" ->
      s"""WITH h AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |counters AS (
         |  SELECT w, i, ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % w AS b,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM h
         |  CROSS JOIN (SELECT unnest(range(0, $D)) AS i)
         |  CROSS JOIN (SELECT unnest([64, 256, 1024]) AS w)
         |  GROUP BY 1, 2, 3),
         |probe AS (
         |  SELECT k AS cust_key, ${duckHash("CAST(k AS VARCHAR)")} AS h
         |  FROM (SELECT unnest(range(1, 26)) AS k)),
         |pb AS (
         |  SELECT cust_key, w, i,
         |         ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % w AS b
         |  FROM probe
         |  CROSS JOIN (SELECT unnest(range(0, $D)) AS i)
         |  CROSS JOIN (SELECT unnest([64, 256, 1024]) AS w)),
         |ests AS (
         |  SELECT pb.w, pb.cust_key, MIN(COALESCE(c, 0)) AS est
         |  FROM pb LEFT JOIN counters
         |    ON pb.w = counters.w AND pb.i = counters.i AND pb.b = counters.b
         |  GROUP BY 1, 2),
         |ex AS (SELECT o_custkey AS cust_key, CAST(COUNT(*) AS BIGINT) AS tc
         |       FROM orders GROUP BY 1)
         |SELECT CAST(w AS INT) AS w, CAST(COUNT(*) AS BIGINT) AS n_probes,
         |       CAST(SUM(est - COALESCE(tc, 0)) AS BIGINT) AS total_overestimate,
         |       CAST(MAX(est - COALESCE(tc, 0)) AS BIGINT) AS max_overestimate,
         |       CAST(SUM(CASE WHEN est = COALESCE(tc, 0) THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_exact
         |FROM ests LEFT JOIN ex USING (cust_key)
         |GROUP BY 1 ORDER BY w""".stripMargin,
    "x_join_size_sketch" ->
      s"""WITH la AS (SELECT l_partkey AS k FROM lineitem
         |            WHERE l_returnflag = 'R'),
         |lb AS (SELECT l_partkey AS k FROM lineitem
         |       WHERE l_linestatus = 'F'),
         |ca AS (
         |  SELECT i, ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % $W AS b,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT ${duckHash("CAST(k AS VARCHAR)")} AS h FROM la)
         |  CROSS JOIN (SELECT unnest(range(0, $D)) AS i) GROUP BY 1, 2),
         |cb AS (
         |  SELECT i, ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % $W AS b,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT ${duckHash("CAST(k AS VARCHAR)")} AS h FROM lb)
         |  CROSS JOIN (SELECT unnest(range(0, $D)) AS i) GROUP BY 1, 2),
         |esti AS (
         |  SELECT ca.i, CAST(SUM(ca.c * cb.c) AS BIGINT) AS est_i
         |  FROM ca JOIN cb ON ca.i = cb.i AND ca.b = cb.b GROUP BY 1),
         |est AS (SELECT CAST(MIN(est_i) AS BIGINT) AS sk_est FROM esti),
         |ex AS (
         |  SELECT CAST(COALESCE(SUM(fa * fb), 0) AS BIGINT) AS true_size
         |  FROM (SELECT k, COUNT(*) AS fa FROM la GROUP BY 1) a
         |  JOIN (SELECT k, COUNT(*) AS fb FROM lb GROUP BY 1) b USING (k))
         |SELECT sk_est, true_size,
         |       CAST(sk_est - true_size AS DOUBLE)
         |         / CAST(true_size AS DOUBLE) AS rel_err
         |FROM est CROSS JOIN ex ORDER BY sk_est""".stripMargin,
    "x_cms_freq" ->
      s"""WITH h AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |counters AS (
         |  SELECT i, ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % $W AS b,
         |         COUNT(*) AS c
         |  FROM h CROSS JOIN (SELECT unnest(range(0, $D)) AS i)
         |  GROUP BY 1, 2),
         |probe AS (
         |  SELECT k, ${duckHash("CAST(k AS VARCHAR)")} AS h
         |  FROM (SELECT unnest(range(1, 26)) AS k)),
         |pb AS (
         |  SELECT k, i,
         |         ((2*i+1) * (h % $M40) + i * 2654435761) % $M40 % $W AS b
         |  FROM probe CROSS JOIN (SELECT unnest(range(0, $D)) AS i)),
         |exact AS (
         |  SELECT o_custkey AS k, COUNT(*) AS true_count FROM orders GROUP BY 1)
         |SELECT pb.k AS cust_key, MIN(COALESCE(c.c, 0)) AS est,
         |       COALESCE(ANY_VALUE(exact.true_count), 0) AS true_count
         |FROM pb LEFT JOIN counters c ON pb.i = c.i AND pb.b = c.b
         |       LEFT JOIN exact ON pb.k = exact.k
         |GROUP BY pb.k ORDER BY cust_key""".stripMargin
  )
}
