package graft.ext

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/skew operators Spark has no primitive for, composed from
  * built-ins so they stay declarative and shuffle-minimal:
  *
  *  - AS-OF JOIN via the union-sort-carry pattern: tag both streams,
  *    union, one sort per user, carry the last right-side timestamp
  *    forward with last(ignoreNulls) — O(n log n) with ONE shuffle,
  *    versus the naive user-level theta-join which is quadratic per key.
  *    The DuckDB oracle uses its NATIVE `ASOF LEFT JOIN`, so the
  *    composition is cross-validated against an independent
  *    implementation of as-of semantics.
  *  - RANGE JOIN (non-equi) against a small broadcast ranges dim —
  *    planned as BroadcastNestedLoopJoin, which is exactly right when
  *    the build side is tiny.
  *  - SALTED AGGREGATION: two-stage aggregate (key, salt) → (key) that
  *    breaks hot keys across 16 reducers. With decimal-exact partials the
  *    result is bit-identical to the direct aggregate — the oracle runs
  *    the UNSALTED form, proving the rewrite is semantics-preserving.
  */
object TemporalOps {

  /** For every purchase event: the most recent click (same user, click.ts
    * <= purchase.ts). Inclusive-tie semantics matched to DuckDB ASOF by
    * sorting clicks before purchases at equal timestamps.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
        col("last_click_ts"))
      .orderBy(col("event_id"))
  }

  /** Range join: lineitem quantities bucketed into per-brand [min,max]
    * p_size ranges (a data-derived ranges dim), non-equi broadcast join.
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ranges = Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(min(col("p_size")).as("lo"), max(col("p_size")).as("hi"))
    // reduce-before-join: quantity has ~50 distinct values, so aggregate
    // lineitem per quantity FIRST and range-join 50 rows × |ranges| rather
    // than pushing every row through the nested-loop join. Decimal partials
    // re-aggregate exactly, so the result is identical to the naive form
    // (which is what the oracle runs).
    val byQty = Tables.lineitem(s, d)
      .groupBy(col("l_quantity"))
      .agg(count(lit(1)).as("qn"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("qsum"))
    byQty
      .join(broadcast(ranges),
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy(col("p_brand"), col("lo"), col("hi"))
      .agg(sum(col("qn")).as("n_items"),
        sum(col("qsum")).cast("double").as("sum_price"))
      .orderBy(col("p_brand"))
  }

  /** Salted two-stage aggregation: (event_type, salt=event_id%16) partials
    * → final merge. Identical output to the direct groupBy (the oracle
    * runs the unsalted form) because partials are decimal-exact; at scale
    * this is the standard fix for a hot grouping key.
    */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pc"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pc")).as("n_events"),
        sum(col("ps")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** Salted skew JOIN (the join-side sibling of [[saltedAgg]]): the fact
    * side salts each row by a hash of its row identity; the dim side is
    * replicated across all R salt values. A hot customer key then spreads
    * over R reducers instead of melting one. The result is provably the
    * plain join (salt values partition the fact rows; each fact row meets
    * its dim row exactly once) — and the oracle runs the unsalted form.
    * R×|dim| replication is the price; use for dims small enough to
    * replicate but too big (or too mixed-hot) to broadcast.
    */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val R = 8
    val fact = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("salt", pmod(xxhash64(col("o_orderkey")), lit(R)).cast("int"))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
      .withColumn("salt", explode(expr(s"sequence(0, ${R - 1})")))
    fact.join(dim,
        fact("o_custkey") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_nationkey"))
  }

  /** NEAREST-event join (the bidirectional as-of): for every click, the
    * purchase closest in time — backward or forward — within a 30-minute
    * tolerance, ties preferring backward. Same union-sort-carry design as
    * [[asofJoin]] (ONE shuffle on user, one sort), with BOTH a
    * backward-carry (last purchase so far) and a forward-carry (first
    * purchase ahead, via the mirrored frame) in a single window pass; the
    * nearer candidate wins in a plain projection. All time math in exact
    * unix microseconds. The oracle replays the identical portable window
    * SQL — both engines implement IGNORE NULLS frames, so the semantics
    * (including same-timestamp ordering by (ts, kind, event_id)) are
    * aligned by construction.
    */
  def nearestJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val u = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
        col("event_id"))
    val ord = Seq(col("ts_us"), col("kind"), col("event_id"))
    val back = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pTs = when(col("kind") === 0, col("ts_us"))
    val pId = when(col("kind") === 0, col("event_id"))
    val tolUs = 30L * 60 * 1000000
    u.withColumn("pb_ts", last(pTs, ignoreNulls = true).over(back))
      .withColumn("pb_id", last(pId, ignoreNulls = true).over(back))
      .withColumn("pf_ts", first(pTs, ignoreNulls = true).over(fwd))
      .withColumn("pf_id", first(pId, ignoreNulls = true).over(fwd))
      .filter(col("kind") === 1)
      .withColumn("db", col("ts_us") - col("pb_ts"))
      .withColumn("df", col("pf_ts") - col("ts_us"))
      .withColumn("use_back",
        col("pb_ts").isNotNull && (col("pf_ts").isNull || col("db") <= col("df")))
      .withColumn("purchase_id",
        when(col("use_back"), col("pb_id")).otherwise(col("pf_id")))
      .withColumn("delta_us",
        when(col("use_back"), col("db")).otherwise(col("df")))
      .withColumn("direction",
        when(col("use_back"), lit("backward")).otherwise(lit("forward")))
      .filter(col("purchase_id").isNotNull && col("delta_us") <= tolUs)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("purchase_id"), col("direction"), col("delta_us"))
      .orderBy(col("click_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_nearest_join" -> nearestJoin,
    "ev_asof_join" -> asofJoin,
    "x_range_join" -> rangeJoin,
    "x_salted_agg" -> saltedAgg,
    "x_salted_join" -> saltedJoin
  )

  val oracle: Map[String, String] = Map(
    "ev_nearest_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
        |         event_id
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb_ts,
        |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb_id,
        |    first_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pf_ts,
        |    first_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pf_id
        |  FROM u),
        |c AS (
        |  SELECT user_id, event_id AS click_id,
        |         ts_us - pb_ts AS db, pf_ts - ts_us AS df,
        |         pb_ts IS NOT NULL
        |           AND (pf_ts IS NULL OR ts_us - pb_ts <= pf_ts - ts_us)
        |           AS use_back,
        |         pb_id, pf_id
        |  FROM w WHERE kind = 1)
        |SELECT user_id, click_id,
        |       CASE WHEN use_back THEN pb_id ELSE pf_id END AS purchase_id,
        |       CASE WHEN use_back THEN 'backward' ELSE 'forward' END AS direction,
        |       CASE WHEN use_back THEN db ELSE df END AS delta_us
        |FROM c
        |WHERE (CASE WHEN use_back THEN pb_id ELSE pf_id END) IS NOT NULL
        |  AND (CASE WHEN use_back THEN db ELSE df END) <= 1800000000
        |ORDER BY click_id""".stripMargin,
    "ev_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts AS purchase_ts, c.ts AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "x_range_join" ->
      """WITH ranges AS (
        |  SELECT p_brand, MIN(p_size) AS lo, MAX(p_size) AS hi
        |  FROM part GROUP BY 1)
        |SELECT p_brand, lo, hi, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN ranges ON l_quantity BETWEEN lo AND hi
        |GROUP BY 1, 2, 3 ORDER BY p_brand""".stripMargin,
    "x_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "x_salted_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin
  )
}
