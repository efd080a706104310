package graft.ops

import graft.Tables
import graft.ext.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12d ML feature-engineering + SQL-surface operators: the
  * feature-preparation steps a training pipeline runs between raw
  * tables and the model (leave-one-out target encoding, the hashing
  * trick), two concentration diagnostics (HHI, Lorenz deciles), and the
  * parameterized-SQL API. All follow the exact-arithmetic discipline
  * ([[graft.Det]]) so the DuckDB oracle replays bit-identically.
  */
object FeatureOps {

  /** Leave-one-out target encoding of order priority against order value
    * — the categorical-feature workhorse of tabular ML: each row's
    * category is replaced by the mean target of OTHER rows in the same
    * category, (Σ − xᵢ)/(n − 1), so a row never leaks its own label into
    * its feature. The encoding is computed over the FULL table; only the
    * surfaced sample is key-filtered.
    *
    * Exactness: targets are integer cents; per-category Σ stays BIGINT
    * (sf0.1 bound ≈ 4.5·10¹¹ ≪ 2⁵³); the single division is
    * BIGINT→DOUBLE / BIGINT→DOUBLE — int64→float64 is one
    * correctly-rounded IEEE conversion on both engines.
    *
    * At 100 TB: category stats are a |categories|-row aggregate joined
    * back via broadcast — never a `Window.partitionBy(category)`, which
    * would funnel each category through ONE task (5 categories = 5 tasks
    * regardless of cluster size). The encode pass is embarrassingly
    * parallel.
    */
  def targetEncoding(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderpriority").as("prio"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"))
    val stats = o.groupBy(col("prio"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    o.join(broadcast(stats), Seq("prio"))
      .select(col("o_orderkey"), col("prio"), col("n").as("n_category"),
        ((col("sx") - col("x")).cast("double") /
          (col("n") - lit(1L)).cast("double")).as("loo_mean_cents"))
      .filter(col("o_orderkey") < 200)
      .orderBy(col("o_orderkey"))
  }

  /** The hashing trick (feature hashing, Weinberger et al. 2009): each
    * categorical token hashes into one of 64 buckets with a ±1 sign bit,
    * giving a fixed-width feature space no vocabulary can outgrow — the
    * standard answer to unbounded categorical cardinality in large-scale
    * learners. Tokens are namespaced (`seg:`, `nat:`, `bal:`) per the
    * VW convention; the surfaced frame is the per-bucket load profile
    * (token count, distinct tokens = collision census, signed sum = what
    * a linear model's gradient would see).
    *
    * Bucket and sign come from independent bit ranges of the engine-
    * portable 60-bit md5 hash ([[graft.ext.Hashing]]); the balance bucket
    * uses BIGINT DIV (truncation toward zero on both engines — DuckDB's
    * `//` is only safe on integer operands, the round-12 gotcha).
    *
    * At 100 TB: one scan, explode ×3, map-side-combined aggregate onto
    * 64 groups — no vocabulary table, no join, which is the entire point
    * of the trick.
    */
  def featureHashing(s: SparkSession, d: String): DataFrame = {
    val h = Hashing.sparkHash("tok")
    Tables.customer(s, d)
      .select(explode(array(
        concat(lit("seg:"), col("c_mktsegment")),
        concat(lit("nat:"), col("c_nationkey").cast("string")),
        concat(lit("bal:"), expr(
          "CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 100000 AS STRING)"))))
        .as("tok"))
      .select(col("tok"), expr(s"$h % 64").as("bucket"),
        expr(s"CASE WHEN ($h DIV 64) % 2 = 0 THEN 1 ELSE -1 END").as("sign"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(col("sign")).as("sum_sign"))
      .orderBy(col("bucket"))
  }

  /** Herfindahl–Hirschman concentration of supplier revenue within each
    * nation — the antitrust-grade market-concentration index,
    * HHI = Σᵢ shareᵢ² ∈ (1/n, 1]. Computed WITHOUT per-supplier share
    * divisions: HHI = Σrev² / (Σrev)², so the whole statistic is two
    * exact integer aggregates and ONE float expression tree.
    *
    * Exactness: per-supplier revenue is BIGINT cents; Σrev² widens to
    * DECIMAL(38,0) (DuckDB: HUGEINT — int64×int64 would overflow at
    * ~9.2·10¹⁸ and per-supplier rev² reaches ~5·10¹⁸ at sf0.1) and
    * exceeds 2⁵³, so it STRING-routes to double (exact digits →
    * correctly-rounded strtod on both engines); Σrev stays ≪ 2⁵³ and
    * converts exempt. The denominator is an IEEE double product of two
    * identical doubles — bit-equal cross-engine.
    *
    * At 100 TB: the fact collapses to (nation, supplier) in one
    * map-side-combined pass; everything after runs on the supplier grain.
    */
  def hhi(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nationkey"), col("s_suppkey"))
      .agg(expr(
        "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(19,0))) AS BIGINT)")
        .as("rev"))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(expr("CAST(rev AS DECIMAL(38,0)) * rev")).as("ssq"),
        sum(col("rev")).as("srev"))
      .select(col("nationkey"), col("n_suppliers"),
        (expr("CAST(CAST(ssq AS STRING) AS DOUBLE)") /
          (col("srev").cast("double") * col("srev").cast("double"))).as("hhi"))
      .orderBy(col("nationkey"))

  /** Lorenz curve in deciles of customer spend per market segment — the
    * inequality profile behind [[ExtraOps.gini]]: sort customers by
    * spend, cut into 10 equal-count buckets, report each bucket's share
    * and the cumulative share ("the top decile holds X% of revenue").
    *
    * Exactness: spend is BIGINT cents; decile sums, running sums and the
    * segment total are all BIGINT ≪ 2⁵³, so the share divisions are
    * exempt int64→float64 conversions. ntile(10) over the unique
    * (spend, custkey) order is deterministic and defined identically
    * (front-loaded remainder) in Spark and DuckDB.
    *
    * At 100 TB: the fact collapses to the customer grain first; the sort
    * window partitions by segment (the [[ExtraOps.gini]] discipline —
    * bounded skew, documented). For a single global curve at extreme
    * scale, replace ntile with approx-quantile boundaries + groupBy:
    * same curve, no single-task window.
    */
  def lorenz(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(expr(
        "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS DECIMAL(19,0))) AS BIGINT)")
        .as("x"))
    val wSort = Window.partitionBy(col("seg")).orderBy(col("x"), col("c_custkey"))
    val wCum = Window.partitionBy(col("seg")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spend.withColumn("decile", ntile(10).over(wSort))
      .groupBy(col("seg"), col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("decile_cents"))
      .withColumn("cum_cents", sum(col("decile_cents")).over(wCum))
      .withColumn("cum_share",
        col("cum_cents").cast("double") /
          sum(col("decile_cents")).over(wTot).cast("double"))
      .select(col("seg"), col("decile"), col("n_cust"), col("decile_cents"),
        col("cum_cents"), col("cum_share"))
      .orderBy(col("seg"), col("decile"))
  }

  /** Parameterized SQL — `spark.sql(text, args)` with named `:param`
    * markers (Spark 3.4+/4 API): the injection-safe way applications pass
    * user input into SQL, binding literals AFTER parsing instead of
    * string-splicing them in. The oracle is the same statement with the
    * literals inlined — passing proves the binding produced exactly the
    * spliced semantics.
    */
  def paramSql(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("x_param_customer")
    Tables.nation(s, d).createOrReplaceTempView("x_param_nation")
    s.sql(
      """SELECT n_name,
        |       COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM x_param_customer JOIN x_param_nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > :minbal AND c_mktsegment = :seg
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
      Map("minbal" -> 1000, "seg" -> "BUILDING"))
  }

  /** Item-item collaborative filtering ("customers who bought X also
    * bought Y") — cosine similarity over order-basket co-occurrence, the
    * classic Amazon-style recommender primitive (Linden et al. 2003) and
    * the predictive counterpart of [[ExtraOps.linkPredict]]'s Jaccard:
    * cos(i,j) = |orders with both| / √(deg i · deg j), which damps the
    * popularity bias raw co-counts have.
    *
    * Exactness: cooc and degrees are exact ints; deg·deg ≪ 2⁵³ so the
    * single √ and division are correctly-rounded IEEE on identical
    * operands. Top-50 by (cosine, pair) is a TakeOrderedAndProject.
    *
    * At 100 TB: candidate pairs come from the WEDGE join (basket ⋈
    * basket on the shared order) so only pairs that co-occur ever
    * materialize — O(Σ basket²), with the item-domain filter bounding
    * the catalog slice; degree attach is a broadcast.
    */
  def itemCf(s: SparkSession, d: String): DataFrame = {
    val b = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 50 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val deg = b.groupBy(col("pk")).agg(count(lit(1)).as("deg"))
    b.as("a").join(b.as("c"),
        col("a.ok") === col("c.ok") && col("a.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("pk1"), col("c.pk").as("pk2"))
      .agg(count(lit(1)).as("cooc"))
      .join(broadcast(deg.select(col("pk").as("pk1"), col("deg").as("deg1"))),
        Seq("pk1"))
      .join(broadcast(deg.select(col("pk").as("pk2"), col("deg").as("deg2"))),
        Seq("pk2"))
      .select(col("pk1"), col("pk2"), col("cooc"), col("deg1"), col("deg2"),
        (col("cooc").cast("double") /
          sqrt((col("deg1") * col("deg2")).cast("double"))).as("cosine"))
      .orderBy(desc("cosine"), col("pk1"), col("pk2"))
      .limit(50)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_item_cf" -> itemCf,
    "x_target_encoding" -> targetEncoding,
    "x_feature_hashing" -> featureHashing,
    "x_hhi" -> hhi,
    "x_lorenz" -> lorenz,
    "x_param_sql" -> paramSql)

  def oracle: Map[String, String] = Map(
    "x_item_cf" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_partkey % 50 = 0),
        |deg AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS deg FROM b GROUP BY 1),
        |pairs AS (
        |  SELECT a.pk AS pk1, c.pk AS pk2, CAST(COUNT(*) AS BIGINT) AS cooc
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        |  GROUP BY 1, 2)
        |SELECT pk1, pk2, cooc, d1.deg AS deg1, d2.deg AS deg2,
        |       CAST(cooc AS DOUBLE) / sqrt(CAST(d1.deg * d2.deg AS DOUBLE))
        |         AS cosine
        |FROM pairs JOIN deg d1 ON pk1 = d1.pk JOIN deg d2 ON pk2 = d2.pk
        |ORDER BY cosine DESC, pk1, pk2 LIMIT 50""".stripMargin,
    "x_target_encoding" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority AS prio,
        |         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x
        |  FROM orders),
        |s AS (SELECT prio, CAST(SUM(x) AS BIGINT) AS sx,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM o GROUP BY 1)
        |SELECT o.o_orderkey, o.prio, s.n AS n_category,
        |       CAST(s.sx - o.x AS DOUBLE) / CAST(s.n - 1 AS DOUBLE)
        |         AS loo_mean_cents
        |FROM o JOIN s USING (prio)
        |WHERE o.o_orderkey < 200 ORDER BY o.o_orderkey""".stripMargin,
    "x_feature_hashing" -> {
      val h = Hashing.duckHash("tok")
      s"""WITH toks AS (
         |  SELECT UNNEST(['seg:' || c_mktsegment,
         |                 'nat:' || CAST(c_nationkey AS VARCHAR),
         |                 'bal:' || CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
         |                                     AS BIGINT) // 100000 AS VARCHAR)])
         |    AS tok
         |  FROM customer),
         |b AS (SELECT tok, $h % 64 AS bucket,
         |             CASE WHEN ($h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign
         |      FROM toks)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
         |       CAST(SUM(sign) AS BIGINT) AS sum_sign
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    "x_hhi" ->
      """WITH rev AS (
        |  SELECT s_nationkey AS nationkey, s_suppkey,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
        |                       AS DECIMAL(19,0))) AS BIGINT) AS rev
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2)
        |SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |       CAST(CAST(SUM(CAST(rev AS HUGEINT) * rev) AS VARCHAR) AS DOUBLE)
        |         / (CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE)
        |            * CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE)) AS hhi
        |FROM rev GROUP BY 1 ORDER BY nationkey""".stripMargin,
    "x_lorenz" ->
      """WITH spend AS (
        |  SELECT c_mktsegment AS seg, c_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |                       AS DECIMAL(19,0))) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |dec AS (
        |  SELECT seg, CAST(NTILE(10) OVER (PARTITION BY seg
        |           ORDER BY x, c_custkey) AS INT) AS decile, x
        |  FROM spend),
        |agg AS (
        |  SELECT seg, decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |         CAST(SUM(x) AS BIGINT) AS decile_cents
        |  FROM dec GROUP BY 1, 2)
        |SELECT seg, decile, n_cust, decile_cents,
        |       CAST(SUM(decile_cents) OVER (PARTITION BY seg ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_cents,
        |       CAST(CAST(SUM(decile_cents) OVER (PARTITION BY seg ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS DOUBLE)
        |         / CAST(CAST(SUM(decile_cents) OVER (PARTITION BY seg)
        |                     AS BIGINT) AS DOUBLE) AS cum_share
        |FROM agg ORDER BY seg, decile""".stripMargin,
    "x_param_sql" ->
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
}
