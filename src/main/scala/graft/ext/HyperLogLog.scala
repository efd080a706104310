package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    computed as `53 - length(bin(w))` (leading-zeros+1, string-free) —
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

  private[graft] val M = 256  // buckets (2^8); 60-bit hash leaves a 52-bit stream

  /** Sparse registers (keys..., bucket, mj) of the 60-bit hashes in
    * column `h`, one register set per distinct key tuple — the ONE
    * definition of the bucket/rho arithmetic (the global, per-group, and
    * per-day forms all route here, as do their oracle strings via
    * [[duckRegs]]).
    */
  private[graft] def regsOfKeyed(h: DataFrame, keys: String*): DataFrame = h
    .select(keys.map(col) ++ Seq((col("h") % M).cast("int").as("bucket"),
      expr(s"h DIV $M").as("w")): _*)
    // leading-zeros+1 of the 52-bit stream. bin(w) has no leading zeros,
    // so the first '1' of the lpad-52 form sits at 53 − length(bin(w)) —
    // same value as the textbook instr(lpad(...)) scan without building
    // two 52-char strings per row (the scan-side hot loop of every
    // sketch; [[duckRegs]] mirrors the identity)
    .withColumn("rho", expr(
      "CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END")
      .cast("int"))
    .groupBy(keys.map(col) :+ col("bucket"): _*).agg(max(col("rho")).as("mj"))

  /** Sparse registers (bucket, mj) of the 60-bit hashes in `h`. */
  private[graft] def regsOf(h: DataFrame): DataFrame = regsOfKeyed(h)

  /** Per-key estimates from keyed registers: zero-fill each key's m
    * buckets against `keyFrame` (the distinct key tuples), then the same
    * deterministic bucket-order harmonic fold as [[estOf]], one row per
    * key with the estimate in column `alias`.
    */
  private[graft] def estOfKeyed(s: SparkSession, keyFrame: DataFrame,
      regs: DataFrame, keys: Seq[String], alias: String): DataFrame = {
    val full = keyFrame
      .crossJoin(s.range(0, M).select(col("id").cast("int").as("bucket")))
      .join(regs, keys :+ "bucket", "left")
      .select(keys.map(col) ++ Seq(col("bucket"),
        coalesce(col("mj"), lit(0)).as("mj")): _*)
    full.groupBy(keys.map(col): _*).agg(expr(
      """aggregate(
        |  transform(array_sort(collect_list(struct(bucket, mj))),
        |    x -> pow(CAST(2.0 AS DOUBLE), -CAST(x.mj AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("s_inv"))
      .select(keys.map(col) :+
        expr(s"0.7213D / (1D + 1.079D / ${M}D) * ${M}D * ${M}D / s_inv")
          .as(alias): _*)
  }

  /** Raw-HLL estimate (one-row, column `alias`) from sparse registers:
    * zero-fill to all m buckets, deterministic bucket-order harmonic fold.
    */
  private[graft] def estOf(s: SparkSession, regs: DataFrame, alias: String): DataFrame = {
    val full = s.range(0, M).select(col("id").cast("int").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mj"), lit(0)).as("mj"))
    full.agg(expr(
      """aggregate(
        |  transform(array_sort(collect_list(struct(bucket, mj))),
        |    x -> pow(CAST(2.0 AS DOUBLE), -CAST(x.mj AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("s_inv"))
      .select(expr(s"0.7213D / (1D + 1.079D / ${M}D) * ${M}D * ${M}D / s_inv")
        .as(alias))
  }

  private def hashes(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))

  /** (m, est_distinct, true_distinct) over orders.o_custkey. */
  def hllVerified(s: SparkSession, d: String): DataFrame = {
    val est = estOf(s, regsOf(hashes(s, d)), "est_distinct")
    val exact = Tables.orders(s, d)
      .agg(graft.Det.exactDistinct(col("o_custkey")).as("true_distinct"))
    est.crossJoin(exact)
      .select(lit(M).cast("long").as("m"), col("est_distinct"),
        col("true_distinct"))
  }

  /** Sketch MERGEABILITY — the property that makes HLL work on a cluster:
    * registers built on disjoint halves of the data and merged with an
    * element-wise max must equal the registers (and therefore the
    * estimate, bit-for-bit) of a direct pass over everything. That is
    * exactly what partial aggregation does with sketch buffers across
    * executors, here proven end-to-end against the DuckDB replay; the
    * `merge_exact` column pins est_merged ≡ est_direct inside each engine
    * too.
    */
  def hllUnion(s: SparkSession, d: String): DataFrame = {
    val h = hashes(s, d)
    def half(p: Column => Column): DataFrame = regsOf(h.filter(p(col("o_orderkey"))))
    val merged = half(_ % 2 === 0).unionByName(half(_ % 2 =!= 0))
      .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
    estOf(s, merged, "est_merged")
      .crossJoin(estOf(s, regsOf(h), "est_direct"))
      .select(lit(M).cast("long").as("m"), col("est_merged"),
        col("est_direct"),
        (col("est_merged") === col("est_direct")).as("merge_exact"))
  }

  /** Per-group sketches — the production shape: one 256-register HLL per
    * order priority, estimating distinct customers per group in a single
    * pass. The grouped register table is |groups| × m rows (tiny, fixed
    * per group); per-group estimates come from the same deterministic
    * bucket-order fold, and the exact counts ride along for the error to
    * be visible in the verified output.
    */
  def hllByGroup(s: SparkSession, d: String): DataFrame = {
    val h = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))
    val est = estOfKeyed(s, h.select(col("grp")).distinct(),
      regsOfKeyed(h, "grp"), Seq("grp"), "est_distinct")
    val exact = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(graft.Det.exactDistinct(col("o_custkey")).as("true_distinct"))
    est.join(exact, "grp").orderBy(col("grp"))
  }

  /** Rolling 7-day distinct users per day (the DAU/WAU board) from
    * MERGEABLE per-day HLL registers — the production answer to "distinct
    * over a sliding window", which no exact aggregate can maintain
    * incrementally: events are scanned ONCE into per-(day, bucket)
    * registers (≤ 256 rows/day forever), and each day's trailing-7 window
    * is a register-level max-merge — the window slide costs 7×256 rows,
    * not a re-scan of 7 days of events. The exact trailing count is
    * computed alongside (day-range join + count-distinct) as the
    * verification column — at 100 TB you keep only the register path and
    * spot-check. Register construction and the harmonic estimate replay
    * bit-for-bit in DuckDB, so BOTH columns hash-verify.
    */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"),
        expr(sparkHash("CAST(user_id AS STRING)")).as("h"))
    val regs = regsOfKeyed(ev, "day")
    val days = ev.select(col("day")).distinct()
    val win = days.select(col("day").as("wday"))
      .join(regs, col("day").between(date_sub(col("wday"), 6), col("wday")))
      .groupBy(col("wday"), col("bucket")).agg(max(col("mj")).as("mj"))
    val est = estOfKeyed(s, days.select(col("day").as("wday")),
      win, Seq("wday"), "est7")
    val exact = days.select(col("day").as("wday"))
      .join(ev.select(col("day"), col("user_id")),
        col("day").between(date_sub(col("wday"), 6), col("wday")))
      .groupBy(col("wday"))
      .agg(graft.Det.exactDistinct(col("user_id")).as("exact7"))
    est.join(exact, "wday")
      .select(col("wday").as("day"), col("exact7"), col("est7"))
      .orderBy(col("day"))
  }

  /** Sketch SET ALGEBRA: estimated intersection cardinality via
    * inclusion–exclusion over mergeable sketches — |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), where the union estimate comes from the
    * register-level max-merge ([[hllUnion]]'s mergeability property).
    * A = customers with urgent/high-priority orders, B = customers with
    * finished orders; the exact intersection (distinct-join) rides along
    * as the verification column. This is the standard way to answer
    * "overlap of two audiences" from per-audience sketches WITHOUT
    * rescanning either side — note inclusion–exclusion compounds the
    * error of three estimates (can even go negative on tiny overlaps),
    * which is the documented trade; theta sketches fix that at the cost
    * of a different sketch family. Every estimate is the same
    * deterministic bucket-order fold, so all three hash-verify.
    */
  def hllIntersect(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def hOf(df: DataFrame): DataFrame =
      df.select(expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))
    val aRows = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    val bRows = o.filter(col("o_orderstatus") === "F")
    val ra = regsOf(hOf(aRows))
    val rb = regsOf(hOf(bRows))
    val merged = ra.unionByName(rb)
      .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
    val exact = aRows.select(col("o_custkey")).distinct()
      .join(bRows.select(col("o_custkey")).distinct(), "o_custkey")
      .agg(count(lit(1)).as("true_intersect"))
    estOf(s, ra, "est_a")
      .crossJoin(estOf(s, rb, "est_b"))
      .crossJoin(estOf(s, merged, "est_union"))
      .crossJoin(exact)
      .select(lit(M).cast("long").as("m"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        col("true_intersect"))
  }

  private val KMV_K = 256

  /** K-minimum-values distinct sketch — the OTHER classic cardinality
    * sketch next to HLL, kept because its state is a VALUE SAMPLE, not
    * registers: the K smallest (normalized) hashes support set
    * operations HLL can't do cleanly (intersection via the K smallest of
    * the union's sample — no inclusion–exclusion error compounding, cf.
    * [[hllIntersect]]'s documented trade; this is the theta-sketch
    * family's core idea). Estimate: (K−1)/θ with θ = the K-th smallest
    * hash scaled to (0,1]. Everything is the shared 60-bit cross-engine
    * hash, a top-K (per-partition partial top-K, mergeable — union of
    * two sketches is the K smallest of their concatenation), and one
    * double division — bit-replayable in DuckDB, so the estimate itself
    * hash-verifies. If distinct < K the sketch degrades to exact-minus-
    * one by construction (θ = max hash); k_eff in the output makes that
    * regime visible.
    */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    val h = Tables.orders(s, d)
      .select(expr(sparkHash("CAST(o_custkey AS STRING)")).as("h"))
      .distinct()
    val kth = h.orderBy(col("h")).limit(KMV_K)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("k_eff"))
    val exact = Tables.orders(s, d)
      .agg(graft.Det.exactDistinct(col("o_custkey")).as("true_distinct"))
    kth.crossJoin(exact)
      .select(lit(KMV_K).cast("long").as("k"), col("k_eff"),
        ((col("k_eff") - 1).cast("double")
          / (col("hk").cast("double")
            / expr("CAST(1152921504606846976 AS DOUBLE)"))) // 2^60
          .as("est_distinct"),
        col("true_distinct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a7_kmv_distinct" -> kmvDistinct,
    "a7_hll_intersect" -> hllIntersect,
    "a7_hll_verified" -> hllVerified,
    "a7_hll_union" -> hllUnion,
    "a7_hll_by_group" -> hllByGroup,
    "ev_rolling_distinct" -> rollingDistinct
  )

  /** DuckDB register CTEs over hash source `src`, producing `regs_$tag`. */
  private[graft] def duckRegs(src: String, tag: String): String =
    s"""regs_$tag AS (
       |  SELECT CAST(h % $M AS INT) AS bucket,
       |         MAX(CASE WHEN h // $M = 0 THEN 53
       |                  ELSE 53 - length(bin(h // $M)) END) AS mj
       |  FROM $src GROUP BY 1)""".stripMargin

  /** Estimate CTE chain from `regs_$tag` → scalar est_$tag. */
  private[graft] def duckEst(tag: String): String =
    s"""filled_$tag AS (
       |  SELECT CAST(b AS INT) AS bucket, COALESCE(regs_$tag.mj, 0) AS mj
       |  FROM (SELECT unnest(range(0, $M)) AS b) bs
       |  LEFT JOIN regs_$tag ON bs.b = regs_$tag.bucket),
       |est_$tag AS (
       |  SELECT 0.7213 / (1 + 1.079 / $M) * $M * $M / list_reduce(
       |    list_prepend(0.0, [pow(2.0, -CAST(mj AS DOUBLE))
       |                       for mj in list(mj ORDER BY bucket)]),
       |    (acc, v) -> acc + v) AS v
       |  FROM filled_$tag)""".stripMargin

  val oracle: Map[String, String] = Map(
    "a7_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders),
         |kth AS (
         |  SELECT MAX(h) AS hk, COUNT(*) AS k_eff
         |  FROM (SELECT h FROM h ORDER BY h LIMIT $KMV_K)),
         |exact AS (
         |  SELECT COUNT(DISTINCT o_custkey) AS true_distinct FROM orders)
         |SELECT CAST($KMV_K AS BIGINT) AS k, k_eff,
         |       CAST(k_eff - 1 AS DOUBLE)
         |         / (CAST(hk AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)) AS est_distinct,
         |       true_distinct
         |FROM kth CROSS JOIN exact""".stripMargin,
    "a7_hll_intersect" ->
      s"""WITH h_a AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders
         |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
         |h_b AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders
         |  WHERE o_orderstatus = 'F'),
         |${duckRegs("h_a", "a")},
         |${duckRegs("h_b", "b")},
         |regs_u AS (
         |  SELECT bucket, MAX(mj) AS mj FROM (
         |    SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
         |  GROUP BY 1),
         |${duckEst("a")},
         |${duckEst("b")},
         |${duckEst("u")},
         |exact AS (
         |  SELECT COUNT(*) AS true_intersect FROM (
         |    SELECT DISTINCT o_custkey FROM orders
         |    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) a
         |  JOIN (
         |    SELECT DISTINCT o_custkey FROM orders
         |    WHERE o_orderstatus = 'F') b USING (o_custkey))
         |SELECT CAST($M AS BIGINT) AS m,
         |       est_a.v AS est_a, est_b.v AS est_b, est_u.v AS est_union,
         |       est_a.v + est_b.v - est_u.v AS est_intersect,
         |       true_intersect
         |FROM est_a CROSS JOIN est_b CROSS JOIN est_u CROSS JOIN exact""".stripMargin,
    "ev_rolling_distinct" ->
      s"""WITH ev AS (
         |  SELECT CAST(ts AS DATE) AS day, user_id,
         |         ${duckHash("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM ev),
         |regs AS (
         |  SELECT day, CAST(h % $M AS INT) AS bucket,
         |         MAX(CASE WHEN h // $M = 0 THEN 53
         |                  ELSE 53 - length(bin(h // $M)) END) AS mj
         |  FROM ev GROUP BY 1, 2),
         |win AS (
         |  SELECT d.day AS wday, r.bucket, MAX(r.mj) AS mj
         |  FROM days d JOIN regs r ON r.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY 1, 2),
         |filled AS (
         |  SELECT d.day AS wday, CAST(bs.b AS INT) AS bucket,
         |         COALESCE(w.mj, 0) AS mj
         |  FROM days d CROSS JOIN (SELECT unnest(range(0, $M)) AS b) bs
         |  LEFT JOIN win w ON w.wday = d.day AND w.bucket = bs.b),
         |est AS (
         |  SELECT wday, 0.7213 / (1 + 1.079 / $M) * $M * $M / list_reduce(
         |    list_prepend(0.0, [pow(2.0, -CAST(mj AS DOUBLE))
         |                       for mj in list(mj ORDER BY bucket)]),
         |    (acc, v) -> acc + v) AS est7
         |  FROM filled GROUP BY wday),
         |exact AS (
         |  SELECT d.day AS wday, COUNT(DISTINCT e.user_id) AS exact7
         |  FROM days d JOIN ev e ON e.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY 1)
         |SELECT est.wday AS day, exact7, est7
         |FROM est JOIN exact USING (wday) ORDER BY day""".stripMargin,
    "a7_hll_verified" ->
      s"""WITH h AS (
         |  SELECT ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |${duckRegs("h", "d")},
         |${duckEst("d")},
         |exact AS (
         |  SELECT COUNT(DISTINCT o_custkey) AS true_distinct FROM orders)
         |SELECT CAST($M AS BIGINT) AS m, v AS est_distinct, true_distinct
         |FROM est_d CROSS JOIN exact""".stripMargin,
    "a7_hll_by_group" ->
      s"""WITH h AS (
         |  SELECT o_orderpriority AS grp,
         |         ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |regs AS (
         |  SELECT grp, CAST(h % $M AS INT) AS bucket,
         |         MAX(CASE WHEN h // $M = 0 THEN 53
         |                  ELSE 53 - length(bin(h // $M)) END) AS mj
         |  FROM h GROUP BY 1, 2),
         |filled AS (
         |  SELECT g.grp, CAST(bs.b AS INT) AS bucket, COALESCE(regs.mj, 0) AS mj
         |  FROM (SELECT DISTINCT grp FROM h) g
         |  CROSS JOIN (SELECT unnest(range(0, $M)) AS b) bs
         |  LEFT JOIN regs ON g.grp = regs.grp AND bs.b = regs.bucket),
         |est AS (
         |  SELECT grp, 0.7213 / (1 + 1.079 / $M) * $M * $M / list_reduce(
         |    list_prepend(0.0, [pow(2.0, -CAST(mj AS DOUBLE))
         |                       for mj in list(mj ORDER BY bucket)]),
         |    (acc, v) -> acc + v) AS est_distinct
         |  FROM filled GROUP BY grp),
         |exact AS (
         |  SELECT o_orderpriority AS grp,
         |         COUNT(DISTINCT o_custkey) AS true_distinct
         |  FROM orders GROUP BY 1)
         |SELECT est.grp AS grp, est_distinct, true_distinct
         |FROM est JOIN exact ON est.grp = exact.grp
         |ORDER BY est.grp""".stripMargin,
    "a7_hll_union" ->
      s"""WITH h AS (
         |  SELECT o_orderkey, ${duckHash("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders),
         |h_a AS (SELECT h FROM h WHERE o_orderkey % 2 = 0),
         |h_b AS (SELECT h FROM h WHERE o_orderkey % 2 <> 0),
         |${duckRegs("h_a", "a")},
         |${duckRegs("h_b", "b")},
         |regs_m AS (
         |  SELECT bucket, MAX(mj) AS mj FROM (
         |    SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
         |  GROUP BY 1),
         |${duckEst("m")},
         |${duckRegs("h", "d")},
         |${duckEst("d")}
         |SELECT CAST($M AS BIGINT) AS m,
         |       est_m.v AS est_merged, est_d.v AS est_direct,
         |       est_m.v = est_d.v AS merge_exact
         |FROM est_m CROSS JOIN est_d""".stripMargin
  )
}
