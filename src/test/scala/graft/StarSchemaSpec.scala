package graft

import graft.pipeline.StarSchema
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-replication test (SURVEY.md §5, §7.2 M3): miniature replicas
  * of the reference's three staging datasets (FIXTURES.md A1-A3) pushed
  * through the full star-schema build; asserts the exact output schemas
  * of SURVEY.md §1.4 and fixture-scaled QC gates.
  */
class StarSchemaSpec extends AnyFunSuite {
  import TestSpark.spark

  // ---- fixtures (FIXTURES.md coverage matrix) ----
  // arrdate 20545 → 1960-01-01+20545d = 2016-04-01; 20575 → 2016-05-01
  private def i94Fixture: DataFrame = {
    val rows = Seq(
      // cicid, i94port, arrdate, i94addr, depdate, i94visa, biryear, gender, airline
      Row(1.0, "NYC", 20545.0, "NY", 20550.0, 2.0, 1989.0, "M", "VS"),
      Row(1.0, "NYC", 20545.0, "NY", 20550.0, 2.0, 1989.0, "M", "VS"), // exact dup
      Row(2.0, "MIA", 20545.0, "FL", null, 2.0, 1975.0, "F", "AA"),    // null depdate
      Row(3.0, "LVG", 20546.0, "XX", 20550.0, 2.0, 1990.0, null, null), // bad state, nulls
      Row(4.0, "NYC", 20575.0, null, 20580.0, 2.0, 1960.0, "F", "DL"),  // null state, may
      Row(5.0, "SFO", 20575.0, "CA", 20580.0, 1.0, 1985.0, "M", "UA"),  // business → filtered
      Row(6.0, "ORD", 20575.0, "IL", 20580.0, 3.0, 1995.0, "F", "AA"),  // student → filtered
      Row(7.0, "MIA", 20575.0, "FL", 20581.0, 2.0, 2000.0, "M", "AA"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), StarSchema.i94Schema)
  }

  private def tempFixture: DataFrame = {
    val rows = Seq(
      Row("2013-04-01", "25.0093", "0.1", "Orlando", "United States", "28.13N", "81.54W"),
      Row("2013-04-01", "27.0", "0.1", "Tampa", "United States", "27.94N", "82.45W"),
      Row("2013-04-01", "24.0", "0.1", "Kissimmee", "United States", "28.29N", "81.40W"), // same cell as Orlando
      Row("2013-05-01", "15.0", "0.1", "New York", "United States", "40.71N", "74.00W"),
      Row("2013-04-01", "22.0", "0.1", "Toronto", "Canada", "43.65N", "79.38W"), // non-US
      Row("2013-04-01", null, "0.1", "Miami", "United States", "25.76N", "80.19W")) // null temp
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), StarSchema.temperatureSchema)
  }

  private def airportFixture: DataFrame = {
    val rows = Seq(
      Row("KMCO", "US", "US-FL", "-81.30,28.43"),  // cell (28, 81)
      Row("KISM", "US", "US-FL", "-81.44,28.29"),  // same cell
      Row("XGA1", "US", "US-GA", "-81.20,28.40"),  // same cell, different state
      Row("KTPA", "US", "US-FL", "-82.45,27.94"),  // cell (28, 82) — Tampa's cell
      Row("KJFK", "US", "US-NY", "-73.78,40.64"),  // cell (41, 74)
      Row("BADR", "US", "US-ZZ", "-74.10,40.70"),  // invalid region → other
      Row("CYYZ", "CA", "CA-ON", "-79.63,43.68"))  // non-US → filtered
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), StarSchema.airportSchema)
  }

  private lazy val out: Map[String, DataFrame] =
    StarSchema.run(spark, i94Fixture, tempFixture, airportFixture)

  private def fieldTypes(df: DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)

  test("output schemas match SURVEY.md §1.4 exactly") {
    assert(fieldTypes(out("fact_imm")) == Seq(
      "id_imm" -> LongType, "id_state" -> LongType, "id_time" -> LongType,
      "id_person" -> LongType, "id_port" -> LongType, "id_airline" -> LongType,
      "id_temp" -> LongType))
    assert(fieldTypes(out("fact_temp")) == Seq(
      "dayofmonth" -> IntegerType, "month" -> IntegerType,
      "state" -> StringType, "avg_temp" -> DoubleType, "id_temp" -> LongType))
    assert(fieldTypes(out("dim_state")) == Seq(
      "state" -> StringType, "id_state" -> LongType))
    assert(fieldTypes(out("dim_time")) == Seq(
      "date" -> DateType, "day_of_month" -> IntegerType, "month" -> IntegerType,
      "year" -> IntegerType, "id_time" -> LongType))
    assert(fieldTypes(out("dim_person")) == Seq(
      "gender" -> StringType, "biryear" -> DoubleType, "id_imm" -> LongType,
      "id_person" -> LongType))
    // dim_ports keeps the reference's output column name `i94port`
    assert(fieldTypes(out("dim_ports")) == Seq(
      "i94port" -> StringType, "id_port" -> LongType))
    assert(fieldTypes(out("dim_airlines")) == Seq(
      "airline" -> StringType, "id_airline" -> LongType))
  }

  test("QC gates: fixture-scaled row counts (etl.py:338-351 analog)") {
    // 8 raw rows - 1 exact dup - 2 non-tourist = 5 curated tourists
    StarSchema.checkNumberOfRows(out("fact_imm"), 5, "fact_imm")
    StarSchema.checkNumberOfRows(out("dim_person"), 5, "dim_person")
    // states: NY, FL, other (XX + null) , CA/IL filtered with visa — NY,FL,other
    StarSchema.checkNumberOfRows(out("dim_state"), 3, "dim_state")
    // arrival dates: 2016-04-01, 2016-04-02, 2016-05-01
    StarSchema.checkNumberOfRows(out("dim_time"), 3, "dim_time")
    StarSchema.checkNumberOfRows(out("dim_ports"), 3, "dim_ports") // NYC, MIA, LVG
    StarSchema.checkDistinctStates(out("dim_state"), 3)
  }

  test("fact_imm is row-preserving and id_temp is null where uncovered") {
    val fact = out("fact_imm")
    assert(fact.count() == 5)
    // temp fixture covers only (apr, FL-cells + NY-cell); may rows → null id_temp
    assert(fact.filter(org.apache.spark.sql.functions.col("id_temp").isNull).count() > 0)
  }

  test("QC gate raises on mismatch like the reference's ValueError") {
    intercept[IllegalStateException] {
      StarSchema.checkNumberOfRows(out("dim_state"), 999, "dim_state")
    }
  }

  test("avg-of-avgs is unweighted (the reference's quirk, preserved)") {
    import org.apache.spark.sql.functions._
    // "%.0f" cells: Orlando (81.54W → "82") shares cell (28,82) with Tampa
    // → avg 26.00465; Kissimmee alone in (28,81) → 24.0. FL modal covers
    // both cells → UNWEIGHTED mean (24.0 + 26.00465)/2 = 25.002325, NOT
    // the row-weighted (25.0093+24.0+27.0)/3 ≈ 25.3364.
    val fl = out("fact_temp").filter(col("state") === "FL")
      .select(col("avg_temp")).collect()
    assert(fl.length == 1)
    assert(math.abs(fl.head.getDouble(0) - 25.002325) < 1e-9)
  }
}
