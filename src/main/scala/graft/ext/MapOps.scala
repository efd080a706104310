package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MapType / nested-JSON operators: `from_json` with an explicit schema
  * (struct and map), `explode` over map columns, and the map-algebra
  * builtins (map_concat, map_filter, transform_values, map_keys/values).
  *
  * Scale notes: from_json parses each props string ONCE into a typed
  * column — downstream field accesses are struct reads, not re-parses
  * (the get_json_object form in [[EventOps.jsonProps]] re-parses per
  * extraction and is kept as the single-key surface). Map construction
  * and algebra are per-row, shuffle-free, whole-stage-codegen'd; the
  * explode forms shuffle only the exploded key/value pairs.
  */
object MapOps {

  /** from_json → typed struct, parsed once, then aggregated on the typed
    * field. The parse happens in the scan projection; everything after
    * works on a BIGINT column.
    */
  def propsStruct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"), "k BIGINT", Map.empty[String, String]))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("p.k")).as("sum_k"),
        min(col("p.k")).as("min_k"), max(col("p.k")).as("max_k"))
      .orderBy(col("event_type"))

  /** from_json → MAP<STRING,BIGINT> and explode to (key, value) rows:
    * the schema-free form for heterogeneous props bags.
    */
  def propsMapExplode(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(explode(from_json(col("props"), "map<string,bigint>",
        Map.empty[String, String])).as(Seq("pkey", "pval")))
      .groupBy(col("pkey"))
      .agg(count(lit(1)).as("n"), sum(col("pval")).as("sum_v"),
        min(col("pval")).as("min_v"), max(col("pval")).as("max_v"))
      .orderBy(col("pkey"))

  /** Map algebra on a constructed column: map(), map_concat, map_filter,
    * transform_values, map_keys/map_values, element_at — projected back
    * to deterministic scalars (map iteration order is insertion order in
    * Spark, but the verified output never depends on it: keys are sorted,
    * values are summed).
    */
  def mapOps(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .withColumn("m", map_concat(
        map(lit("nk"), col("n_nationkey").cast("long"),
          lit("rk"), col("n_regionkey").cast("long")),
        map(lit("len"), length(col("n_name")).cast("long"))))
      .select(col("n_nationkey"),
        size(col("m")).as("m_size"),
        element_at(col("m"), "len").as("name_len"),
        expr("size(map_filter(m, (k, v) -> v > 10))").as("n_big"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
        expr("aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("sum_vals"),
        element_at(expr("transform_values(m, (k, v) -> v * 2)"), "nk")
          .as("nk2"))
      .orderBy(col("n_nationkey"))

  /** The remaining map HOFs: map_from_arrays construction, transform_keys,
    * map_zip_with (union-of-keys semantics exercised via a one-sided key),
    * and the map_entries → map_from_entries round-trip. Like [[mapOps]],
    * the verified output projects to scalars that don't depend on map
    * iteration order. Per-row, shuffle-free, codegen'd.
    */
  def mapZip(s: SparkSession, d: String): DataFrame = {
    val zip = "map_zip_with(m1, m3, (k, v1, v2) -> " +
      "coalesce(v1, CAST(0 AS BIGINT)) + coalesce(v2, CAST(0 AS BIGINT)))"
    Tables.nation(s, d)
      .withColumn("m1", map_from_arrays(
        array(lit("a"), lit("b")),
        array(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))))
      .withColumn("m3", map(lit("a"), length(col("n_name")).cast("long")))
      .select(col("n_nationkey"),
        element_at(expr("transform_keys(m1, (k, v) -> upper(k))"), "A")
          .as("upper_a"),
        element_at(expr(zip), "a").as("zip_a"),
        element_at(expr(zip), "b").as("zip_b"),
        size(expr("map_from_entries(map_entries(m1))")).as("n_entries"))
      .orderBy(col("n_nationkey"))
  }

  /** Column pair → map → explode back to tall rows (the unpivot-via-map
    * idiom), grouped to per-(key, value) counts.
    */
  def mapExplode(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(explode(map(
        lit("prio"), col("o_orderpriority"),
        lit("status"), col("o_orderstatus"))).as(Seq("k", "v")))
      .groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"), col("v"))

  /** Spark 4 VARIANT ingestion: parse the JSON props ONCE into the binary
    * VARIANT type, then extract typed fields with variant_get — the
    * schema-on-read path for semi-structured columns that beats repeated
    * get_json_object string re-parsing (one parse, many typed reads) and
    * needs no fixed from_json schema up front. Grouped rollup proves the
    * extracted values behave as ordinary typed columns downstream.
    */
  def variantProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .withColumn("k_str", expr("cast(variant_get(v, '$.k', 'string') AS string)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        max(length(col("k_str"))).as("max_digits"))
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_variant_props" -> variantProps,
    "ev_props_struct" -> propsStruct,
    "ev_props_map" -> propsMapExplode,
    "x_map_ops" -> mapOps,
    "x_map_zip" -> mapZip,
    "x_map_explode" -> mapExplode
  )

  val oracle: Map[String, String] = Map(
    "ev_variant_props" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(MAX(length(json_extract_string(props, '$.k'))) AS INT) AS max_digits
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "ev_props_struct" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "ev_props_map" ->
      """WITH kv AS (
        |  SELECT e.key AS pkey, e.value AS pval
        |  FROM (SELECT unnest(map_entries(CAST(props::JSON AS MAP(VARCHAR, BIGINT)))) AS e
        |        FROM events))
        |SELECT pkey, COUNT(*) AS n, CAST(SUM(pval) AS BIGINT) AS sum_v,
        |       MIN(pval) AS min_v, MAX(pval) AS max_v
        |FROM kv GROUP BY 1 ORDER BY pkey""".stripMargin,
    "x_map_ops" ->
      """SELECT n_nationkey,
        |       3 AS m_size,
        |       CAST(length(n_name) AS BIGINT) AS name_len,
        |       CAST(CAST(n_nationkey > 10 AS INT) + CAST(n_regionkey > 10 AS INT)
        |            + CAST(length(n_name) > 10 AS INT) AS INT) AS n_big,
        |       'len,nk,rk' AS keys_csv,
        |       CAST(n_nationkey + n_regionkey + length(n_name) AS BIGINT) AS sum_vals,
        |       CAST(2 * n_nationkey AS BIGINT) AS nk2
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "x_map_zip" ->
      """SELECT n_nationkey,
        |       CAST(n_nationkey AS BIGINT) AS upper_a,
        |       CAST(n_nationkey + length(n_name) AS BIGINT) AS zip_a,
        |       CAST(n_regionkey AS BIGINT) AS zip_b,
        |       2 AS n_entries
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "x_map_explode" ->
      """WITH kv AS (
        |  SELECT 'prio' AS k, o_orderpriority AS v FROM orders
        |  UNION ALL
        |  SELECT 'status' AS k, o_orderstatus AS v FROM orders)
        |SELECT k, v, COUNT(*) AS n FROM kv GROUP BY 1, 2 ORDER BY k, v""".stripMargin
  )
}
