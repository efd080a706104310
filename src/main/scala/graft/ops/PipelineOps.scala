package graft.ops

import graft.Tables
import graft.ext.ModeAgg
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema assembly over the driver testdata — the oracle-verified
  * analog of the reference pipeline (SURVEY.md §7.2 M3): dimension builds
  * with deterministic surrogate keys and a row-preserving multi-left-join
  * fact assembly, exactly the fact_imm shape (etl.py:279-293).
  */
object PipelineOps {

  /** Dimension build: distinct natural keys + row_number surrogate ids
    * (dims are small — the global-order window is fine; fact-grain ids
    * use xxhash64, see [[graft.pipeline.StarSchema]]).
    */
  def dimBuild(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.select(col("o_orderstatus"), col("o_orderpriority")).distinct()
      .withColumn("id_status_priority", row_number().over(
        Window.orderBy(col("o_orderstatus"), col("o_orderpriority"))).cast("long"))
      .orderBy(col("id_status_priority"))
  }

  /** Fact assembly: orders left-joined to three broadcast dims, output is
    * id columns only — row-preserving (|fact| == |orders|), nullable ids
    * impossible here by construction but the join type matches etl.py.
    */
  def factAssembly(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val dStatus = o.select(col("o_orderstatus")).distinct()
      .withColumn("id_status", row_number().over(
        Window.orderBy(col("o_orderstatus"))).cast("long"))
    val dPriority = o.select(col("o_orderpriority")).distinct()
      .withColumn("id_priority", row_number().over(
        Window.orderBy(col("o_orderpriority"))).cast("long"))
    val dDate = o.select(col("o_orderdate")).distinct()
      .withColumn("id_date", row_number().over(
        Window.orderBy(col("o_orderdate"))).cast("long"))
    o.join(broadcast(dStatus), Seq("o_orderstatus"), "left")
      .join(broadcast(dPriority), Seq("o_orderpriority"), "left")
      .join(broadcast(dDate), Seq("o_orderdate"), "left")
      .select(col("o_orderkey"), col("id_status"), col("id_priority"),
        col("id_date"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Typed-Aggregator surface: exact mode (ties → smallest value) as ONE
    * mergeable aggregate instead of the reference's two-query argmax
    * (etl.py:181-207). The oracle expresses the same semantics with a
    * window — proving the Aggregator's single-shuffle form equivalent.
    */
  def modeAggregate(s: SparkSession, d: String): DataFrame = {
    val mode = udaf(ModeAgg, Encoders.STRING)
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(mode(col("c_mktsegment")).as("modal_segment"))
      .orderBy(col("c_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_dim_build" -> dimBuild,
    "pipe_fact_assembly" -> factAssembly,
    "x_mode_agg" -> modeAggregate
  )

  val oracle: Map[String, String] = Map(
    "pipe_dim_build" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(ROW_NUMBER() OVER (ORDER BY o_orderstatus, o_orderpriority) AS BIGINT) AS id_status_priority
        |FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
        |ORDER BY id_status_priority""".stripMargin,
    "pipe_fact_assembly" ->
      """WITH d_status AS (
        |  SELECT o_orderstatus, CAST(ROW_NUMBER() OVER (ORDER BY o_orderstatus) AS BIGINT) AS id_status
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders)),
        |d_priority AS (
        |  SELECT o_orderpriority, CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS BIGINT) AS id_priority
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)),
        |d_date AS (
        |  SELECT o_orderdate, CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate) AS BIGINT) AS id_date
        |  FROM (SELECT DISTINCT o_orderdate FROM orders))
        |SELECT o_orderkey, id_status, id_priority, id_date, o_totalprice
        |FROM orders
        |LEFT JOIN d_status USING (o_orderstatus)
        |LEFT JOIN d_priority USING (o_orderpriority)
        |LEFT JOIN d_date USING (o_orderdate)
        |ORDER BY o_orderkey""".stripMargin,
    "x_mode_agg" ->
      """WITH counts AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS num
        |  FROM customer GROUP BY 1, 2),
        |ranked AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                            ORDER BY num DESC, c_mktsegment) AS rn
        |  FROM counts)
        |SELECT c_nationkey, c_mktsegment AS modal_segment
        |FROM ranked WHERE rn = 1 ORDER BY c_nationkey""".stripMargin
  )
}
