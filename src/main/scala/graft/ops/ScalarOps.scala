package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface of the reference (SURVEY.md §2.3): dates, string
  * splitting, regex, casts, abs, format_string, surrogate keys, UDFs.
  *
  * Dialect rules for the DuckDB oracle twins (probed empirically):
  *  - format_string "%.0f" is HALF_UP in Java but half-even in DuckDB's
  *    printf → synthesized inputs always have a non-5 digit at the
  *    rounding position (".13") so the modes agree.
  *  - DuckDB CAST(double AS INT) rounds, Spark truncates → only cast
  *    integral-valued doubles.
  *  - regexes kept dialect-neutral (Java regex ∩ RE2): no backrefs, no
  *    lookaround.
  */
object ScalarOps {

  /** F1 — the reference's one UDF (sasdate_udf, etl.py:41-47) re-expressed
    * as a native Catalyst composition: days-since-1960-01-01 → date via
    * date_add. No UDF, no codegen barrier, filters still push past it.
    * The day-counts are derived from l_shipdate so the roundtrip is total.
    */
  def sasDateNative(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(to_date(col("l_shipdate")), to_date(lit("1960-01-01")))
          .cast("int").as("sas_days"))
      .withColumn("sas_date",
        date_add(to_date(lit("1960-01-01")), col("sas_days")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F1b — the same conversion through an actual Scala UDF, demonstrating
    * the udf-registration surface (reference etl.py:47). Values are
    * deterministic, so this one is oracle-verified too. The native form
    * above is what the engine uses in real pipelines (UDFs are an
    * optimization barrier: no pushdown through them, no codegen).
    */
  def sasDateUdf(s: SparkSession, d: String): DataFrame = {
    val sasToDate = udf { days: java.lang.Integer =>
      if (days == null) null
      else java.sql.Date.valueOf(java.time.LocalDate.of(1960, 1, 1).plusDays(days.toLong))
    }
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(to_date(col("l_shipdate")), to_date(lit("1960-01-01")))
          .cast("int").as("sas_days"))
      .withColumn("sas_date", sasToDate(col("sas_days")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** F2 — to_date with an explicit pattern (etl.py:131), via a
    * format→parse roundtrip on l_shipdate.
    */
  def toDatePattern(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("date_str"))
      .withColumn("parsed_date", to_date(col("date_str"), "yyyy-MM-dd"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F3 — calendar-part extraction (etl.py:105-107,132-134). */
  def dateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast("int").as("o_year"),
        month(col("o_orderdate")).cast("int").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("int").as("o_day"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_year"), col("o_month"), col("o_day"))

  /** F4 — split + getItem on a synthesized "lat,long" string
    * (etl.py:150-151): ArrayType indexing through a string split.
    */
  def splitCoords(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        concat(col("p_size").cast("string"), lit(","),
          col("p_partkey").cast("string")).as("coords"))
      .withColumn("coord_lat", split(col("coords"), ",").getItem(0))
      .withColumn("coord_long", split(col("coords"), ",").getItem(1))
      .orderBy(col("p_partkey"))

  /** F5+F6+F7+F8 — the reference's coordinate-cleaning pipeline
    * (etl.py:135-136,156-158): regexp_extract an unsigned decimal out of a
    * "28.13N"-style string, cast to double, abs, then format_string("%.0f")
    * back to a STRING join key (the reference's lat/long keys are strings).
    */
  def coordPipeline(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        concat(col("p_size").cast("string"), lit(".13N")).as("raw_coord"))
      .withColumn("coord_dec",
        regexp_extract(col("raw_coord"), "\\d+\\.\\d+", 0))
      .withColumn("coord_val", abs(col("coord_dec").cast(DoubleType)))
      .withColumn("coord_key", format_string("%.0f", col("coord_val")))
      .orderBy(col("p_partkey"))

  /** F6 — cast chain string↔numeric on integral doubles (etl.py:135-136).
    * l_quantity is integral, so double→int truncation (Spark) and
    * rounding (DuckDB) agree.
    */
  def castChain(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"))
      .withColumn("qty_str", col("qty_int").cast(StringType))
      .withColumn("qty_back", col("qty_str").cast(DoubleType))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F7 — abs (etl.py:156-157), summed exactly. */
  def absMath(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(Det.dsum(abs(col("c_acctbal"))).as("sum_abs_bal"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  /** F9 — deterministic surrogate keys: row_number over the natural key
    * (SURVEY.md §1.4 mandates this instead of monotonically_increasing_id
    * for every verified query). Scale note: a global ORDER BY window has a
    * single-partition stage; for 100 TB dims use the natural key itself or
    * zipWithIndex on a pre-sorted layout — dims here are tiny (≤ thousands).
    */
  def surrogateKeys(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_name")).distinct()
      .withColumn("id_nation",
        row_number().over(Window.orderBy(col("n_name"))).cast("long"))
      .orderBy(col("id_nation"))

  /** F9b — monotonically_increasing_id capability parity (etl.py:114 etc.).
    * Nondeterministic across partitionings, so no oracle: the driver does a
    * rows-only check. The query itself asserts the engine-side invariant
    * (ids are unique) by construction: rows where ids collide would vanish.
    */
  def miiDemo(s: SparkSession, d: String): DataFrame = {
    val withId = Tables.nation(s, d).withColumn("id", monotonically_increasing_id())
    withId.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("id")).as("n_distinct_ids"))
  }

  /** F10 — the imported-but-unused string builtins (etl.py:1): substring,
    * length, upper/lower, lpad, concat_ws — over p_name.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_brand")).as("brand_upper"),
        lower(col("p_type")).as("type_lower"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Calendar arithmetic (quarter / month-end / add_months / day diff):
    * the month-arithmetic clamping semantics (Jan 31 + 1 month = Feb 29)
    * are identical to DuckDB's interval addition, verified per-row.
    */
  def calendarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("qtr", quarter(col("d")))
      .withColumn("month_end", last_day(col("d")))
      .withColumn("plus2m", add_months(col("d"), 2))
      .withColumn("days_since", datediff(col("d"), lit("1995-01-01").cast("date")))
      .orderBy(col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_calendar_funcs" -> calendarFuncs,
    "f1_sas_date_native" -> sasDateNative,
    "f1_sas_date_udf" -> sasDateUdf,
    "f2_to_date_pattern" -> toDatePattern,
    "f3_date_parts" -> dateParts,
    "f4_split_coords" -> splitCoords,
    "f5_coord_pipeline" -> coordPipeline,
    "f6_cast_chain" -> castChain,
    "f7_abs_math" -> absMath,
    "f9_surrogate_keys" -> surrogateKeys,
    "f9_mii_demo" -> miiDemo,
    "f10_string_funcs" -> stringFuncs
  )

  private val sasDateSql =
    """SELECT l_orderkey, l_linenumber,
      |       CAST(date_diff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) AS INT) AS sas_days,
      |       DATE '1960-01-01' + CAST(date_diff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) AS INT) AS sas_date
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  val oracle: Map[String, String] = Map(
    "x_calendar_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |       CAST(quarter(o_orderdate) AS INT) AS qtr,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f1_sas_date_native" -> sasDateSql,
    "f1_sas_date_udf" -> sasDateSql,
    "f2_to_date_pattern" ->
      """SELECT l_orderkey, l_linenumber,
        |       strftime(l_shipdate, '%Y-%m-%d') AS date_str,
        |       CAST(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS parsed_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f3_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(month(o_orderdate) AS INT) AS o_month,
        |       CAST(day(o_orderdate) AS INT) AS o_day,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1,2,3 ORDER BY o_year, o_month, o_day""".stripMargin,
    "f4_split_coords" ->
      """SELECT p_partkey,
        |       concat(CAST(p_size AS VARCHAR), ',', CAST(p_partkey AS VARCHAR)) AS coords,
        |       string_split(concat(CAST(p_size AS VARCHAR), ',', CAST(p_partkey AS VARCHAR)), ',')[1] AS coord_lat,
        |       string_split(concat(CAST(p_size AS VARCHAR), ',', CAST(p_partkey AS VARCHAR)), ',')[2] AS coord_long
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f5_coord_pipeline" ->
      """SELECT p_partkey,
        |       concat(CAST(p_size AS VARCHAR), '.13N') AS raw_coord,
        |       regexp_extract(concat(CAST(p_size AS VARCHAR), '.13N'), '\d+\.\d+') AS coord_dec,
        |       abs(CAST(regexp_extract(concat(CAST(p_size AS VARCHAR), '.13N'), '\d+\.\d+') AS DOUBLE)) AS coord_val,
        |       printf('%.0f', abs(CAST(regexp_extract(concat(CAST(p_size AS VARCHAR), '.13N'), '\d+\.\d+') AS DOUBLE))) AS coord_key
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f6_cast_chain" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS INT) AS qty_int,
        |       CAST(CAST(l_quantity AS INT) AS VARCHAR) AS qty_str,
        |       CAST(CAST(CAST(l_quantity AS INT) AS VARCHAR) AS DOUBLE) AS qty_back
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f7_abs_math" ->
      """SELECT c_nationkey,
        |       CAST(SUM(CAST(abs(c_acctbal) AS DECIMAL(30,4))) AS DOUBLE) AS sum_abs_bal,
        |       COUNT(*) AS n_customers
        |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "f9_surrogate_keys" ->
      """SELECT n_name, CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS BIGINT) AS id_nation
        |FROM (SELECT DISTINCT n_name FROM nation)
        |ORDER BY id_nation""".stripMargin,
    "f10_string_funcs" ->
      """SELECT p_partkey,
        |       substring(p_name, 1, 8) AS name_prefix,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       upper(p_brand) AS brand_upper,
        |       lower(p_type) AS type_lower,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |       concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
