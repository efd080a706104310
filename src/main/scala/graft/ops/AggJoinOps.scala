package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation + join surface of the reference (SURVEY.md §2.4, §2.5) plus
  * the flagged "ext" operators (set ops, semi/anti/cross joins, rollup/cube,
  * min/max/sum, approx-distinct).
  *
  * Scale notes baked into the shapes:
  *  - dims (nation/region/supplier) are always broadcast — zero shuffle;
  *  - big⋈big (lineitem⋈orders) shuffles both sides on the join key once;
  *  - greatest-n-per-group is provided in BOTH the reference's self-join
  *    form and the idiomatic window form (one shuffle instead of two);
  *  - float sums that must be reproducible cluster-wide go through decimal
  *    ([[graft.Det]]) or a sorted-fold (see [[avgOfAvgs]]).
  */
object AggJoinOps {

  /** A1 — multi-key hash aggregate with avg (etl.py:172-177): 4 grouping
    * keys, partial (map-side) + final agg split by Catalyst.
    */
  def multiKeyAvg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).cast("int").as("ship_year"),
        month(col("l_shipdate")).cast("int").as("ship_month"))
      .agg(Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"),
        col("ship_year"), col("ship_month"))

  /** A2 — group-by + count(col) (etl.py:181-186): occurrence counts per
    * (nation, segment) — the "how often does each state appear per
    * coordinate" analog.
    */
  def countPerGroup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(col("c_custkey")).as("num"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** A3 — nested aggregation, max-of-count (etl.py:190-199): step 1 of
    * greatest-n-per-group.
    */
  def maxOfCount(s: SparkSession, d: String): DataFrame =
    countPerGroup(s, d)
      .groupBy(col("c_nationkey"))
      .agg(max(col("num")).as("max_num"))
      .orderBy(col("c_nationkey"))

  /** A4 — argmax via self-join (etl.py:201-204), the reference's form:
    * join the counts against the per-key max and keep matching rows
    * (ties preserved, exactly like the reference).
    */
  def argmaxSelfJoin(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(col("c_custkey")).as("num"))
    val maxes = counts.groupBy(col("c_nationkey"))
      .agg(max(col("num")).as("max_num"))
      .withColumnRenamed("c_nationkey", "mk")
    counts
      .join(maxes, counts("c_nationkey") === maxes("mk")
        && counts("num") === maxes("max_num"), "inner")
      .select(col("c_nationkey"), col("c_mktsegment").as("modal_segment"),
        col("num"))
      .orderBy(col("c_nationkey"), col("modal_segment"))
  }

  /** A4b — argmax via window (the idiomatic Spark form, SURVEY.md §2.7):
    * one shuffle instead of two; ties broken deterministically by segment
    * name. A ScalaTest asserts row-identity with the self-join form under
    * the same tie-break.
    */
  def argmaxWindow(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(col("c_custkey")).as("num"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("num"), col("c_mktsegment"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_mktsegment").as("modal_segment"),
        col("num"))
      .orderBy(col("c_nationkey"))
  }

  /** A5 — re-aggregation, avg-of-avgs (etl.py:210-215) — intentionally
    * UNWEIGHTED, preserving the reference's quirk (SURVEY.md §7.4).
    *
    * The outer mean of computed doubles would be order-dependent on a
    * cluster; both sides instead fold a SORTED list sequentially
    * (sort_array + aggregate here, list_sort + list_reduce in DuckDB), so
    * the result is bit-identical regardless of partitioning.
    */
  def avgOfAvgs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(Det.davg(col("c_acctbal")).as("seg_avg"))
      .groupBy(col("c_nationkey"))
      .agg(
        (aggregate(sort_array(collect_list(col("seg_avg"))), lit(0.0),
          (acc, x) => acc + x) / count(lit(1))).as("avg_of_avgs"),
        count(lit(1)).as("n_segments"))
      .orderBy(col("c_nationkey"))

  /** A6 — count(*) seasonality probe (ipynb cells 15/17). */
  def seasonality(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(month(col("o_orderdate")).cast("int").as("o_month"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_month"))

  /** A7 — exact count(distinct) (etl.py:355-360). */
  def countDistinctExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag"))

  /** A7b — approx_count_distinct (HLL), the scale-out variant: one pass, no
    * distinct shuffle, mergeable sketches. Estimates are engine-specific →
    * no oracle (rows-only check); a ScalaTest bounds the error vs exact.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** A9+Q1 — global count gates (etl.py:338-351), several tables at once. */
  def countGates(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).agg(count(lit(1)).as("n_lineitem"))
    val o = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"))
    val c = Tables.customer(s, d).agg(count(lit(1)).as("n_customer"))
    li.crossJoin(o).crossJoin(c)
  }

  /** ext — min/max/sum aggregates (not in reference; trivial builtins). */
  def minMaxSum(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("l_returnflag"))

  /** ext — ROLLUP with grouping_id (subtotal rows; nulls ordered explicitly
    * NULLS FIRST on both sides because Spark and DuckDB default opposite).
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(year(col("l_shipdate")).cast("int").as("ship_year"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), Det.dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("ship_year").asc_nulls_first,
        col("l_returnflag").asc_nulls_first)

  /** ext — CUBE over two keys. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** J1/J2-shape — dim-chain joins, all broadcast: customer ⋈ nation ⋈
    * region rolled up to region grain. Zero shuffle on the join side.
    */
  def dimChainJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        Det.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"))
  }

  /** J7-shape — 3-key composite LEFT join with genuine misses (the
    * fact_imm ⋈ fact_temp analog, etl.py:291): right side only covers
    * months 1-6, so id-bearing columns are null for the rest.
    */
  def leftCompositeJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val left = o.select(
      year(col("o_orderdate")).cast("int").as("o_year"),
      month(col("o_orderdate")).cast("int").as("o_month"),
      col("o_orderstatus")).distinct()
    val right = o.filter(month(col("o_orderdate")) <= 6)
      .groupBy(year(col("o_orderdate")).cast("int").as("r_year"),
        month(col("o_orderdate")).cast("int").as("r_month"),
        col("o_orderstatus").as("r_status"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
    left.join(right,
      left("o_year") === right("r_year")
        && left("o_month") === right("r_month")
        && left("o_orderstatus") === right("r_status"), "left")
      .select(col("o_year"), col("o_month"), col("o_orderstatus"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("o_year"), col("o_month"), col("o_orderstatus"))
  }

  /** J8-shape — big ⋈ big equi-join (lineitem ⋈ orders): sort-merge/shuffled
    * hash at scale, revenue per order priority.
    */
  def bigBigJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(Det.money(col("l_extendedprice")) * Det.oneMinus(col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** ext — left-semi join (EXISTS): orders having at least one max-quantity
    * line item. Semi joins ship only the key column of the right side.
    */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** ext — left-anti join (NOT EXISTS): customers with no high-value
    * (>400k) order. Unfiltered orders would cover every customer.
    */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_silent"),
        Det.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** ext — cross join of two small sides (region × market segments). */
  def crossJoinSmall(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).select(col("r_name"))
    val seg = Tables.customer(s, d).select(col("c_mktsegment")).distinct()
    r.crossJoin(seg).orderBy(col("r_name"), col("c_mktsegment"))
  }

  /** ext — unionByName: same schema, different column order, aligned by
    * name (the explicit form of the reference's multi-file UNION ALL).
    */
  def unionByNameOp(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(
      col("c_custkey").as("entity_key"), col("c_acctbal").as("balance"),
      lit("customer").as("side"))
    val sup = Tables.supplier(s, d).select(
      lit("supplier").as("side"), col("s_acctbal").as("balance"),
      col("s_suppkey").as("entity_key"))
    c.unionByName(sup)
      .orderBy(col("side"), col("entity_key"))
  }

  /** ext — INTERSECT (set semantics, deduplicated). */
  def intersectOp(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** ext — EXCEPT (set difference, deduplicated): sizes that only occur on
    * small parts — non-empty by construction at every scale factor.
    */
  def exceptOp(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    p.select(col("p_size").as("size"))
      .except(p.filter(col("p_size") >= 10).select(col("p_size").as("size")))
      .orderBy(col("size"))
  }

  /** ext — FILTER-clause aggregation (SQL:2003): per-predicate conditional
    * aggregates in ONE pass over the table instead of one scan per
    * predicate — the idiomatic replacement for N filtered subqueries.
    */
  def aggFilter(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_af_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        |FROM graft_af_lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** ext — percent-of-total (ratio-to-report): each group's share of the
    * grand total via a window over the aggregated frame. The window runs
    * over |groups| rows (post-aggregation), not the base table, so the
    * unpartitioned total is computed on a metadata-sized frame.
    */
  def ratioReport(s: SparkSession, d: String): DataFrame = {
    val seg = Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        Det.dsum(col("c_acctbal")).as("sum_bal"))
    val all = Window.partitionBy()
    seg
      .withColumn("cust_share",
        col("n_cust").cast("double") / sum(col("n_cust")).over(all))
      // the grand total re-enters decimal for the window sum: a double
      // window-sum's last ulp would depend on row order; the per-group
      // sums are exact multiples of 1e-4 so the round-trip is lossless
      .withColumn("bal_share", col("sum_bal")
        / sum(col("sum_bal").cast(org.apache.spark.sql.types.DecimalType(19, 4)))
          .over(all).cast("double"))
      .orderBy(col("c_mktsegment"))
  }

  /** ext — min_by/max_by (↔ DuckDB arg_min/arg_max): the argmin/argmax
    * ACCESSOR form — one aggregation instead of the self-join or window
    * forms (A4). Ordered by a unique key so both engines pick the same
    * row without tie ambiguity.
    */
  def minMaxBy(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(min_by(col("c_name"), col("c_custkey")).as("first_cust"),
        max_by(col("c_name"), col("c_custkey")).as("last_cust"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"))

  /** ext — FULL OUTER join of two keyed aggregates with deliberately
    * non-overlapping key ranges, so unmatched rows survive on BOTH sides
    * (the reconciliation shape: every key from either input appears once,
    * missing sides NULL). The using-key coalesces; at scale this is a
    * standard shuffle join — full outer cannot broadcast either side.
    */
  def fullOuterJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_nationkey") < 20)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d).filter(col("s_nationkey") >= 5)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .orderBy(col("nationkey"))
  }

  /** ext — EXCEPT ALL (multiset difference: each right occurrence cancels
    * ONE left occurrence, unlike the set-semantics `x_except`).
    */
  def exceptAllOp(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    p.select(col("p_size").as("size"))
      .exceptAll(p.filter(col("p_partkey") % 2 === 0).select(col("p_size").as("size")))
      .orderBy(col("size"))
  }

  /** ext — INTERSECT ALL (multiset intersection: min of the occurrence
    * counts survives per value).
    */
  def intersectAllOp(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    p.select(col("p_size").as("size"))
      .intersectAll(p.filter(col("p_partkey") % 3 === 0).select(col("p_size").as("size")))
      .orderBy(col("size"))
  }

  /** ext — fuzzy string matching on edit distance: nation-name pairs
    * within levenshtein ≤ 1. All-pairs is deliberate on a 25-row dim
    * (dims stay all-pairs-able at any corpus scale); corpus-scale fuzzy
    * text matching goes through the banded LSH path in [[graft.ext.Dedup]]
    * instead — never all-pairs on a fact table.
    */
  def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    n.as("a").join(n.as("b"), col("a.n_nationkey") < col("b.n_nationkey"))
      .withColumn("dist", levenshtein(col("a.n_name"), col("b.n_name")))
      .filter(col("dist") <= 1)
      .select(col("a.n_name").as("name_a"), col("b.n_name").as("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** ext — null-safe equality join (`<=>` ↔ IS NOT DISTINCT FROM): keys
    * with NULLs (every 5th nation bucket nulled) still pair up, unlike a
    * plain equi-join which drops them. Null-safe equi-joins hash NULL like
    * any other key value, so the join stays a hash/sort-merge join — no
    * degenerate NULL-spray skew at scale (all NULLs do land in one
    * bucket; salt if NULL is a heavy key).
    */
  def nullSafeJoin(s: SparkSession, d: String): DataFrame = {
    val left = Tables.customer(s, d)
      .select(col("c_custkey"), expr("nullif(c_nationkey % 5, 0)").as("k"))
    val dim = Tables.nation(s, d)
      .select(expr("nullif(n_nationkey % 5, 0)").as("dk")).distinct()
      .withColumn("bucket_label", coalesce(col("dk").cast("string"), lit("null-bucket")))
    left.join(dim, col("k") <=> col("dk"))
      .groupBy(col("bucket_label"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("bucket_label"))
  }

  /** ext — ntile quartiles per segment by (balance, key) — the unique
    * trailing key makes tile assignment deterministic under balance ties.
    */
  def ntileQuartiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), col("quartile"))
      .orderBy(col("c_custkey"))
  }

  /** ext — uncorrelated scalar subquery through the SQL surface: orders
    * above the global average price, counted per priority. The average is
    * an exact decimal sum ÷ count (one correctly-rounded double division)
    * so the > boundary is engine-independent; Catalyst plans the scalar
    * subquery as a one-row broadcast, not a per-row re-scan.
    */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_ssq")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_big
        |FROM orders_ssq
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders_ssq)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** ext — CORRELATED scalar subquery: customers above their own nation's
    * average balance. Catalyst decorrelates this into an aggregate + join
    * (no per-row re-scan — the plan is the same one you'd write by hand),
    * which is exactly why the SQL surface is safe to expose at 100 TB.
    * Decimal-exact average so the > boundary is engine-independent.
    */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_csq")
    s.sql(
      """SELECT c_nationkey, COUNT(*) AS n_above
        |FROM customer_csq c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM customer_csq c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  /** ext — correlated EXISTS / NOT EXISTS: nations with a high-balance
    * customer but no negative-balance supplier. Catalyst rewrites the two
    * subqueries into a LeftSemi and a LeftAnti join (PlanSpec-asserted) —
    * the SQL sugar costs nothing over the hand-written join form.
    */
  def existsSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_esq")
    Tables.customer(s, d).createOrReplaceTempView("customer_esq")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_esq")
    s.sql(
      """SELECT n_nationkey, n_name FROM nation_esq n
        |WHERE EXISTS (SELECT 1 FROM customer_esq c
        |              WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
        |  AND NOT EXISTS (SELECT 1 FROM supplier_esq sp
        |                  WHERE sp.s_nationkey = n.n_nationkey AND sp.s_acctbal < 0)
        |ORDER BY n_nationkey""".stripMargin)
  }

  /** ext — first_value/last_value/nth_value over an explicit full-partition
    * frame (the default frame stops at CURRENT ROW, which silently makes
    * last_value ≡ current row — the classic trap; the explicit frame is
    * the correct form and the oracle mirrors it).
    */
  def firstLastWindow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .withColumn("first_order", first(col("o_orderkey")).over(full))
      .withColumn("last_order", last(col("o_orderkey")).over(full))
      .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(full))
      .groupBy(col("o_custkey"), col("first_order"), col("last_order"),
        col("second_order"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))
  }

  /** Join-cardinality prediction from per-key histograms — the planner
    * diagnostic behind every join-order decision: |A ⋈ B| = Σ_k a_k·b_k
    * computed from the two sides' key-count frames WITHOUT materializing
    * the join, verified here against the actual join count. The count
    * frames are |distinct keys| skinny rows (8+8 bytes) vs the join's
    * full-width output — at 100 TB you run exactly this before a risky
    * join to know whether the output explodes (and the same Σ a_k·b_k
    * per key, pre-aggregation, is how you FIND the exploding keys —
    * x_skew_metrics' sibling). Complements the CBO/ANALYZE demo
    * ([[graft.plans.Cbo]]), which derives the same estimate from stored
    * stats instead of a live scan.
    */
  def joinCardinality(s: SparkSession, d: String): DataFrame = {
    val a = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("a_k"))
    val b = Tables.orders(s, d)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("b_k"))
    val pred = a.join(b, "k")
      .agg(sum(col("a_k") * col("b_k")).as("predicted_rows"))
    val actual = Tables.lineitem(s, d).select(col("l_orderkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("actual_rows"))
    pred.crossJoin(actual) // two 1-row aggregates
      .select(col("predicted_rows"), col("actual_rows"),
        (col("predicted_rows") === col("actual_rows")).as("exact_match"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_join_cardinality" -> joinCardinality,
    "x_exists_subquery" -> existsSubquery,
    "x_correlated_subquery" -> correlatedSubquery,
    "x_first_last_window" -> firstLastWindow,
    "x_nullsafe_join" -> nullSafeJoin,
    "x_ntile" -> ntileQuartiles,
    "x_scalar_subquery" -> scalarSubquery,
    "a1_multikey_avg" -> multiKeyAvg,
    "a2_count_per_group" -> countPerGroup,
    "a3_max_of_count" -> maxOfCount,
    "a4_argmax_selfjoin" -> argmaxSelfJoin,
    "a4_argmax_window" -> argmaxWindow,
    "a5_avg_of_avgs" -> avgOfAvgs,
    "a6_seasonality" -> seasonality,
    "a7_count_distinct" -> countDistinctExact,
    "a7_approx_distinct" -> approxDistinct,
    "a9_count_gates" -> countGates,
    "x_minmax_sum" -> minMaxSum,
    "x_rollup" -> rollupAgg,
    "x_cube" -> cubeAgg,
    "j1_dim_chain" -> dimChainJoin,
    "j7_left_composite" -> leftCompositeJoin,
    "j8_bigbig_join" -> bigBigJoin,
    "x_semi_join" -> semiJoin,
    "x_anti_join" -> antiJoin,
    "x_cross_join" -> crossJoinSmall,
    "x_union_by_name" -> unionByNameOp,
    "x_intersect" -> intersectOp,
    "x_except" -> exceptOp,
    "x_agg_filter" -> aggFilter,
    "x_ratio_report" -> ratioReport,
    "x_min_by" -> minMaxBy,
    "x_full_outer" -> fullOuterJoin,
    "x_except_all" -> exceptAllOp,
    "x_intersect_all" -> intersectAllOp,
    "x_fuzzy_match" -> fuzzyMatch
  )

  val oracle: Map[String, String] = Map(
    "x_join_cardinality" ->
      """WITH a AS (SELECT l_orderkey AS k, COUNT(*) AS a_k
        |           FROM lineitem GROUP BY 1),
        |b AS (SELECT o_orderkey AS k, COUNT(*) AS b_k
        |      FROM orders GROUP BY 1),
        |pred AS (SELECT CAST(SUM(a_k * b_k) AS BIGINT) AS predicted_rows
        |         FROM a JOIN b USING (k)),
        |actual AS (SELECT COUNT(*) AS actual_rows
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT predicted_rows, actual_rows,
        |       predicted_rows = actual_rows AS exact_match
        |FROM pred CROSS JOIN actual""".stripMargin,
    "x_exists_subquery" ->
      """SELECT n_nationkey, n_name FROM nation n
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
        |  AND NOT EXISTS (SELECT 1 FROM supplier sp
        |                  WHERE sp.s_nationkey = n.n_nationkey AND sp.s_acctbal < 0)
        |ORDER BY n_nationkey""".stripMargin,
    "x_correlated_subquery" ->
      """SELECT c_nationkey, COUNT(*) AS n_above
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "x_first_last_window" ->
      """SELECT o_custkey,
        |       first_value(o_orderkey) OVER w AS first_order,
        |       last_value(o_orderkey) OVER w AS last_order,
        |       nth_value(o_orderkey, 2) OVER w AS second_order,
        |       COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin,
    "x_nullsafe_join" ->
      """WITH lft AS (
        |  SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer),
        |dim AS (
        |  SELECT dk, coalesce(CAST(dk AS VARCHAR), 'null-bucket') AS bucket_label
        |  FROM (SELECT DISTINCT nullif(n_nationkey % 5, 0) AS dk FROM nation))
        |SELECT bucket_label, COUNT(*) AS n_customers
        |FROM lft JOIN dim ON lft.k IS NOT DISTINCT FROM dim.dk
        |GROUP BY bucket_label ORDER BY bucket_label""".stripMargin,
    "x_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_big
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a1_multikey_avg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(year(l_shipdate) AS INT) AS ship_year,
        |       CAST(month(l_shipdate) AS INT) AS ship_month,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1,2,3,4
        |ORDER BY l_returnflag, l_linestatus, ship_year, ship_month""".stripMargin,
    "a2_count_per_group" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(c_custkey) AS num
        |FROM customer GROUP BY 1,2 ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "a3_max_of_count" ->
      """SELECT c_nationkey, MAX(num) AS max_num FROM (
        |  SELECT c_nationkey, c_mktsegment, COUNT(c_custkey) AS num
        |  FROM customer GROUP BY 1,2)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "a4_argmax_selfjoin" ->
      """WITH counts AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(c_custkey) AS num
        |  FROM customer GROUP BY 1,2),
        |maxes AS (SELECT c_nationkey AS mk, MAX(num) AS max_num FROM counts GROUP BY 1)
        |SELECT c_nationkey, c_mktsegment AS modal_segment, num
        |FROM counts JOIN maxes ON c_nationkey = mk AND num = max_num
        |ORDER BY c_nationkey, modal_segment""".stripMargin,
    "a4_argmax_window" ->
      """WITH counts AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(c_custkey) AS num
        |  FROM customer GROUP BY 1,2),
        |ranked AS (
        |  SELECT c_nationkey, c_mktsegment, num,
        |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                            ORDER BY num DESC, c_mktsegment) AS rn
        |  FROM counts)
        |SELECT c_nationkey, c_mktsegment AS modal_segment, num
        |FROM ranked WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,
    "a5_avg_of_avgs" ->
      """WITH seg AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / COUNT(c_acctbal) AS seg_avg
        |  FROM customer GROUP BY 1,2)
        |SELECT c_nationkey,
        |       CAST(list_reduce(list_sort(list(seg_avg)), (acc,x) -> acc + x) AS DOUBLE) / COUNT(*) AS avg_of_avgs,
        |       COUNT(*) AS n_segments
        |FROM seg GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "a6_seasonality" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS o_month, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_month""".stripMargin,
    "a7_count_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "a9_count_gates" ->
      """SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
        |       (SELECT COUNT(*) FROM orders) AS n_orders,
        |       (SELECT COUNT(*) FROM customer) AS n_customer""".stripMargin,
    "x_minmax_sum" ->
      """SELECT l_returnflag,
        |       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price,
        |       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "x_rollup" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year, l_returnflag,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
        |       CAST(GROUPING(CAST(year(l_shipdate) AS INT), l_returnflag) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(1, 2)
        |ORDER BY gid, ship_year ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin,
    "x_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE(1, 2)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "j1_dim_chain" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY r_name""".stripMargin,
    "j7_left_composite" ->
      """WITH lhs AS (
        |  SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS o_year,
        |         CAST(month(o_orderdate) AS INT) AS o_month, o_orderstatus
        |  FROM orders),
        |rhs AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS r_year,
        |         CAST(month(o_orderdate) AS INT) AS r_month,
        |         o_orderstatus AS r_status, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |  FROM orders WHERE month(o_orderdate) <= 6 GROUP BY 1,2,3)
        |SELECT o_year, o_month, o_orderstatus, n_orders, sum_price
        |FROM lhs LEFT JOIN rhs
        |  ON o_year = r_year AND o_month = r_month AND o_orderstatus = r_status
        |ORDER BY o_year, o_month, o_orderstatus""".stripMargin,
    "j8_bigbig_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "x_semi_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "x_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_silent,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "x_cross_join" ->
      """SELECT r_name, c_mktsegment
        |FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
        |ORDER BY r_name, c_mktsegment""".stripMargin,
    "x_union_by_name" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS entity_key, c_acctbal AS balance, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal, 'supplier' FROM supplier)
        |ORDER BY side, entity_key""".stripMargin,
    "x_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "x_except" ->
      """SELECT p_size AS size FROM part
        |EXCEPT
        |SELECT p_size FROM part WHERE p_size >= 10
        |ORDER BY size""".stripMargin,
    "x_agg_filter" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x_ratio_report" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, COUNT(*) AS n_cust,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment, n_cust, sum_bal,
        |       CAST(n_cust AS DOUBLE) / CAST(SUM(n_cust) OVER () AS BIGINT) AS cust_share,
        |       sum_bal / CAST(SUM(CAST(sum_bal AS DECIMAL(19,4))) OVER () AS DOUBLE) AS bal_share
        |FROM seg ORDER BY c_mktsegment""".stripMargin,
    "x_min_by" ->
      """SELECT c_mktsegment,
        |       arg_min(c_name, c_custkey) AS first_cust,
        |       arg_max(c_name, c_custkey) AS last_cust,
        |       COUNT(*) AS n_cust
        |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "x_full_outer" ->
      """SELECT COALESCE(a.nationkey, b.nationkey) AS nationkey, n_cust, n_supp
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
        |      FROM customer WHERE c_nationkey < 20 GROUP BY 1) a
        |FULL JOIN
        |     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
        |      FROM supplier WHERE s_nationkey >= 5 GROUP BY 1) b
        |ON a.nationkey = b.nationkey
        |ORDER BY nationkey""".stripMargin,
    "x_except_all" ->
      """SELECT p_size AS size FROM part
        |EXCEPT ALL
        |SELECT p_size FROM part WHERE p_partkey % 2 = 0
        |ORDER BY size""".stripMargin,
    "x_intersect_all" ->
      """SELECT p_size AS size FROM part
        |INTERSECT ALL
        |SELECT p_size FROM part WHERE p_partkey % 3 = 0
        |ORDER BY size""".stripMargin,
    "x_fuzzy_match" ->
      """SELECT a.n_name AS name_a, b.n_name AS name_b,
        |       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 1
        |ORDER BY name_a, name_b""".stripMargin
  )
}
