package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classic TPC-H-shaped analytics over the test tables (the schema is
  * TPC-H-ish, so the canonical queries express directly): pricing summary
  * (Q1), shipping priority (Q3), local-supplier volume (Q5), revenue
  * forecast (Q6). All aggregates decimal-exact per [[graft.Det]].
  */
object TpchOps {

  /** Q1 — pricing summary report: full-scan aggregate with derived
    * measures, the canonical columnar-scan + hash-agg stress test.
    */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // date(ts) <= 1998-09-02  ⟺  ts < 1998-09-03 00:00 — comparing the
      // raw timestamp column (no to_date() wrapper) lets the predicate
      // reach the parquet reader, which prunes row groups on min/max
      // stats; the to_date() form read every row group.
      .filter(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        sum(Det.money(col("l_extendedprice")) * Det.oneMinus(col("l_discount"))
          * Det.onePlus(col("l_tax"))).cast("double").as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3 — shipping priority: selective filters on both join sides pushed
    * to the scans, big⋈big join, top-10 by revenue.
    */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    // raw-timestamp comparisons (pushdown-able); date(ts) < d ⟺ ts < d,
    // date(ts) > d ⟺ ts >= d+1 day
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-03-16").cast("timestamp"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
      .agg(Det.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** Q5 — local-supplier volume: the 6-way join (region→nation→customer→
    * orders→lineitem→supplier) with the nation-match condition, revenue
    * per nation.
    */
  def q5LocalVolume(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey")
        && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Det.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Q6 — revenue forecast: pure scan-filter-aggregate; every predicate
    * must reach the parquet reader.
    */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_discount") >= 0.02 && col("l_discount") <= 0.04
        && col("l_quantity") < 24)
      .agg(sum(Det.money(col("l_extendedprice")) * Det.rate(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q14 — promotion effect: the share of one month's revenue coming from
    * PROMO parts. Ratio of two decimal-exact sums (cast to double only for
    * the final division, so the result is partitioning-independent); the
    * part dim broadcasts, lineitem's date filter reaches the scan.
    */
  def q14Promo(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp")
        && col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"),
          Det.money(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
          .otherwise(lit(0).cast(DecimalType(14, 4)))).cast("double")
          .as("promo_revenue"),
        Det.revenue(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  /** Q18 — large-volume customers: orders whose total quantity exceeds a
    * threshold, joined back to customer. The qualifying-orders frame is the
    * output of a keyed aggregate (small), so it broadcasts into the orders
    * join rather than re-shuffling orders.
    */
  def q18LargeVolume(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    // Only the aggregated qualifying-orders frame is guaranteed small
    // (filter keeps a handful of orders at any SF); customer scales with
    // the data, so its join strategy is left to the planner/AQE.
    o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  case class Item(l_orderkey: Long, l_quantity: Double, l_returnflag: String)
  case class FlagStats(l_returnflag: String, n_big: Long, max_qty: Double)

  /** Typed Dataset pipeline: case-class encoder, typed filter/map,
    * groupByKey + mapGroups — the compile-time-checked surface for logic
    * that doesn't fit Column expressions. Output matches a plain SQL
    * oracle, proving the typed path computes the same relation.
    */
  def typedPipeline(s: SparkSession, d: String): Dataset[FlagStats] = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[Item]
      .filter((i: Item) => i.l_quantity >= 30.0)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, items) =>
        var n = 0L; var mx = Double.MinValue
        items.foreach { i => n += 1; if (i.l_quantity > mx) mx = i.l_quantity }
        FlagStats(flag, n, mx)
      }
  }

  def typedQuery(s: SparkSession, d: String): DataFrame =
    typedPipeline(s, d).toDF().orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1" -> q1Pricing,
    "tpch_q3" -> q3Shipping,
    "tpch_q5" -> q5LocalVolume,
    "tpch_q6" -> q6Forecast,
    "tpch_q14" -> q14Promo,
    "tpch_q18" -> q18LargeVolume,
    "ds_typed_pipeline" -> typedQuery
  )

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
  private val sumQty = graft.Det.sqlSum("l_quantity")
  private val sumPrice = graft.Det.sqlSum("l_extendedprice")

  val oracle: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $sumQty AS sum_qty,
         |  $sumPrice AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($discPrice * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         |  ${graft.Det.sqlAvg("l_quantity")} AS avg_qty,
         |  ${graft.Det.sqlAvg("l_extendedprice")} AS avg_price,
         |  ${graft.Det.sqlAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |       o_orderpriority,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
         |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |       COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q14" ->
      s"""SELECT
         |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $discPrice
         |                ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE) AS promo_revenue,
         |  CAST(SUM($discPrice) AS DOUBLE) AS total_revenue,
         |  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $discPrice
         |                        ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
         |        / CAST(SUM($discPrice) AS DOUBLE) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
         |  AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'""".stripMargin,
    "tpch_q18" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${graft.Det.sqlSum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${graft.Det.sqlSum("l_quantity")} > 300.0)
         |SELECT c_name, c_custkey, o_orderkey,
         |       CAST(o_orderdate AS DATE) AS o_orderdate,
         |       o_totalprice, sum_qty
         |FROM orders
         |JOIN big ON o_orderkey = big.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "ds_typed_pipeline" ->
      """SELECT l_returnflag, COUNT(*) AS n_big, MAX(l_quantity) AS max_qty
        |FROM lineitem WHERE l_quantity >= 30.0
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin
  )
}
