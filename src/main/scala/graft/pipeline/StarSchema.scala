package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Full replication of the reference's star-schema ETL (etl.py:89-363),
  * re-expressed as pure DataFrame functions with explicit input schemas —
  * the reference inferred everything and its author flagged that as a
  * defect (`ipynb` cell 44: "I'd more strictly enforce a schema").
  *
  * Reference quirks preserved ON PURPOSE (SURVEY.md §1.4, §7.4):
  *  - dropDuplicates over ALL raw columns BEFORE column pruning
  *    (etl.py:111-112) — reordering changes row counts;
  *  - fact_temp is an UNWEIGHTED avg-of-avgs (etl.py:210-215);
  *  - dim_person is row-per-fact, not deduplicated (etl.py:247-249);
  *  - dim_ports keeps the column name `i94port` (the reference's
  *    `.alias` on a DataFrame is a no-op — we replicate the OUTPUT);
  *  - fact_imm left-joins fact_temp on (dayofmonth, month, state), so
  *    id_temp is null for uncovered combinations (etl.py:285-291).
  *
  * Deviation (deliberate, SURVEY.md §1.4): surrogate keys are
  * DETERMINISTIC — row_number over the natural key for dims,
  * xxhash64 of the natural key for fact-grain ids — instead of
  * monotonically_increasing_id, which changes value with partitioning.
  * At 100 TB the hash form is the scalable one (no global sort, no
  * single-partition window); dims are small enough for row_number.
  */
object StarSchema {

  /** I94 immigration staging schema — the 11 consumed columns of the 28
    * (FIXTURES.md A1; full schema printed at ipynb cell 8). SAS numerics
    * are double.
    */
  val i94Schema: StructType = StructType(Seq(
    StructField("cicid", DoubleType), StructField("i94port", StringType),
    StructField("arrdate", DoubleType), StructField("i94addr", StringType),
    StructField("depdate", DoubleType), StructField("i94visa", DoubleType),
    StructField("biryear", DoubleType), StructField("gender", StringType),
    StructField("airline", StringType)))

  /** GlobalLandTemperaturesByCity schema (FIXTURES.md A2) — all string,
    * exactly as a header-only CSV read delivers it (etl.py:126).
    */
  val temperatureSchema: StructType = StructType(
    Seq("dt", "AverageTemperature", "AverageTemperatureUncertainty",
      "City", "Country", "Latitude", "Longitude")
      .map(StructField(_, StringType)))

  /** airport-codes schema (FIXTURES.md A3) — all string. */
  val airportSchema: StructType = StructType(
    Seq("ident", "iso_country", "iso_region", "coordinates")
      .map(StructField(_, StringType)))

  val validStates: Seq[String] = Seq(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC")

  private val epoch1960 = to_date(lit("1960-01-01"))

  /** Immigration curation (etl.py:89-118): SAS dates → real dates (native
    * date_add, no UDF barrier), state whitelist-or-other, null fills,
    * dedup BEFORE pruning, tourism filter, deterministic row id.
    */
  def curateImmigration(raw: DataFrame): DataFrame =
    raw
      .withColumn("arrdate_dt", date_add(epoch1960, col("arrdate").cast("int")))
      .withColumn("depdate_dt", date_add(epoch1960, col("depdate").cast("int")))
      .withColumn("arrdate_dayofmonth", dayofmonth(col("arrdate_dt")))
      .withColumn("arrdate_month", month(col("arrdate_dt")))
      .withColumn("arrdate_year", year(col("arrdate_dt")))
      .withColumn("state",
        when(!col("i94addr").isin(validStates: _*), lit("other"))
          .otherwise(col("i94addr")))
      .na.fill(Map("state" -> "other", "gender" -> "unknown"))
      .dropDuplicates() // over ALL columns, before the select — etl.py:111
      .select("cicid", "i94port", "arrdate_dt", "arrdate_dayofmonth",
        "arrdate_month", "arrdate_year", "state", "depdate_dt", "i94visa",
        "biryear", "gender", "airline")
      .filter(col("i94visa") === 2.0) // tourism
      .withColumn("id_imm", xxhash64(col("cicid")))

  /** Temperature curation (etl.py:120-139): US only, parse date, extract
    * the unsigned decimal from "28.13N"-style strings, round to 0-decimal
    * STRING join keys via format_string (the reference's string-typed
    * lat/long keys — preserved).
    */
  def curateTemperature(raw: DataFrame): DataFrame =
    raw
      .filter(col("Country") === "United States")
      .withColumn("dt_date", to_date(col("dt"), "yyyy-MM-dd"))
      .withColumn("dayofmonth", dayofmonth(col("dt_date")))
      .withColumn("month", month(col("dt_date")))
      .withColumn("year", year(col("dt_date")))
      .withColumn("lat", format_string("%.0f",
        regexp_extract(col("Latitude"), "\\d+.\\d+", 0).cast(DoubleType)))
      .withColumn("long", format_string("%.0f",
        regexp_extract(col("Longitude"), "\\d+.\\d+", 0).cast(DoubleType)))
      .withColumn("AverageTemperature", col("AverageTemperature").cast(DoubleType))
      .na.drop()

  /** Airport curation (etl.py:141-162): US only, state from iso_region,
    * coordinates split [longitude, latitude] (that order — etl.py:149-151),
    * abs + "%.0f" string keys, invalid states → 'other'.
    */
  def curateAirports(raw: DataFrame): DataFrame =
    raw
      .filter(col("iso_country") === "US")
      .withColumn("coord_arr", split(col("coordinates"), ","))
      .withColumn("longitude", format_string("%.0f",
        abs(col("coord_arr").getItem(0).cast(DoubleType))))
      .withColumn("latitude", format_string("%.0f",
        abs(col("coord_arr").getItem(1).cast(DoubleType))))
      .withColumn("state_raw", split(col("iso_region"), "-").getItem(1))
      .withColumn("state",
        when(!col("state_raw").isin(validStates: _*), lit("other"))
          .otherwise(col("state_raw")))
      .na.fill(Map("state" -> "other"))
      .select("ident", "iso_country", "latitude", "longitude", "state")

  /** Modal state per rounded coordinate cell (etl.py:181-207): count per
    * (lat, long, state), max-of-count, argmax via self-join — the
    * reference's exact shape, ties included.
    */
  def modalStateByCoord(airports: DataFrame): DataFrame = {
    val counts = airports.groupBy("latitude", "longitude", "state")
      .agg(count(col("state")).as("num"))
    val maxes = counts.groupBy("latitude", "longitude")
      .agg(max(col("num")).as("maxPerLatLong"))
    counts.join(maxes, Seq("latitude", "longitude"))
      .filter(col("num") === col("maxPerLatLong"))
      .drop("num", "maxPerLatLong")
  }

  /** fact_temp (etl.py:164-219): avg temperature per (lat, long, month,
    * dayofmonth), joined to the modal state per coordinate, re-aggregated
    * per (dayofmonth, month, state) as an UNWEIGHTED avg-of-avgs,
    * deterministic id_temp over the grain.
    */
  def factTemp(temperature: DataFrame, airports: DataFrame): DataFrame = {
    val cellAvg = temperature
      .groupBy(col("lat"), col("long"), col("month"), col("dayofmonth"))
      .agg(avg(col("AverageTemperature")).as("AvgTemp"))
    val modal = modalStateByCoord(airports)
    val joined = cellAvg.join(modal,
      cellAvg("lat") === modal("latitude") && cellAvg("long") === modal("longitude"))
    joined
      .groupBy(col("dayofmonth"), col("month"), col("state"))
      .agg(avg(col("AvgTemp")).as("avg_temp")) // avg-of-avgs, unweighted
      .withColumn("id_temp", row_number().over(
        Window.orderBy(col("month"), col("dayofmonth"), col("state"))).cast("long"))
  }

  def dimState(imm: DataFrame): DataFrame =
    imm.select(col("state")).distinct()
      .withColumn("id_state",
        row_number().over(Window.orderBy(col("state"))).cast("long"))

  def dimTime(imm: DataFrame): DataFrame =
    imm.select(col("arrdate_dt").as("date")).distinct()
      .withColumn("day_of_month", dayofmonth(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("year", year(col("date")))
      .withColumn("id_time",
        row_number().over(Window.orderBy(col("date"))).cast("long"))

  /** Row-per-fact, NOT deduplicated (etl.py:247-249). */
  def dimPerson(imm: DataFrame): DataFrame =
    imm.select(col("gender"), col("biryear"), col("id_imm"))
      .withColumn("id_person", xxhash64(col("id_imm")))

  /** Output column stays `i94port` — replicating the reference's OUTPUT
    * (its DataFrame-level .alias was a no-op, etl.py:257).
    */
  def dimPorts(imm: DataFrame): DataFrame =
    imm.select(col("i94port")).distinct()
      .withColumn("id_port",
        row_number().over(Window.orderBy(col("i94port"))).cast("long"))

  def dimAirlines(imm: DataFrame): DataFrame =
    imm.select(col("airline")).distinct()
      .withColumn("id_airline",
        row_number().over(Window.orderBy(col("airline").asc_nulls_first)).cast("long"))

  /** fact_imm (etl.py:271-293): 6-way left join, row-preserving; dims are
    * broadcast (they're tiny by construction); id_temp nullable by design.
    */
  def factImm(imm: DataFrame, dState: DataFrame, dTime: DataFrame,
      dPerson: DataFrame, dPorts: DataFrame, dAirlines: DataFrame,
      fTemp: DataFrame): DataFrame =
    imm
      .join(broadcast(dTime), imm("arrdate_dt") === dTime("date"), "left")
      .join(broadcast(dAirlines), Seq("airline"), "left")
      .join(broadcast(dPorts), Seq("i94port"), "left")
      .join(broadcast(dState), Seq("state"), "left")
      .join(broadcast(fTemp.select(col("dayofmonth").as("t_dayofmonth"),
        col("month").as("t_month"), col("state").as("t_state"), col("id_temp"))),
        imm("arrdate_dayofmonth") === col("t_dayofmonth")
          && imm("arrdate_month") === col("t_month")
          && imm("state") === col("t_state"), "left")
      .join(dPerson.select(col("id_imm"), col("id_person")), Seq("id_imm"), "left")
      .select(col("id_imm"), col("id_state"), col("id_time"), col("id_person"),
        col("id_port"), col("id_airline"), col("id_temp"))

  /** QC gates (etl.py:80-86, 338-360): row-count equality vs expected
    * constants + the distinct-state cardinality gate. Raises on mismatch
    * exactly like the reference's ValueError.
    */
  def checkNumberOfRows(df: DataFrame, expected: Long, table: String): Unit = {
    val n = df.count()
    if (n != expected)
      throw new IllegalStateException(
        s"QC gate failed for $table: expected $expected rows, got $n")
  }

  def checkDistinctStates(dState: DataFrame, expected: Long): Unit = {
    val n = dState.agg(countDistinct(col("state"))).head().getLong(0)
    if (n != expected)
      throw new IllegalStateException(
        s"QC gate failed: expected $expected distinct states, got $n")
  }

  /** Full pipeline (etl.py __main__, 296-363): staging → curation → dims
    * (persisted, like the reference's 5× .persist) → facts. Returns every
    * output table keyed by its reference name.
    */
  def run(spark: SparkSession, i94: DataFrame, temperature: DataFrame,
      airports: DataFrame): Map[String, DataFrame] = {
    spark.sparkContext.setJobGroup("graft-star-schema", "star-schema ETL")
    val imm = curateImmigration(i94)
    val temp = curateTemperature(temperature)
    val air = curateAirports(airports)
    val fTemp = factTemp(temp, air).persist(StorageLevel.MEMORY_AND_DISK)
    val dState = dimState(imm).persist(StorageLevel.MEMORY_AND_DISK)
    val dTime = dimTime(imm).persist(StorageLevel.MEMORY_AND_DISK)
    val dPerson = dimPerson(imm)
    val dPorts = dimPorts(imm).persist(StorageLevel.MEMORY_AND_DISK)
    val dAirlines = dimAirlines(imm).persist(StorageLevel.MEMORY_AND_DISK)
    val fImm = factImm(imm, dState, dTime, dPerson, dPorts, dAirlines, fTemp)
    spark.sparkContext.clearJobGroup()
    Map("fact_imm" -> fImm, "fact_temp" -> fTemp, "dim_state" -> dState,
      "dim_time" -> dTime, "dim_person" -> dPerson, "dim_ports" -> dPorts,
      "dim_airlines" -> dAirlines)
  }
}
