package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The QC suite as a pipeline GATE (reference parity: `etl.py:80-86`
  * raises ValueError on a failed count check — a bad load must STOP the
  * run, not just log a report row).
  */
class QcSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("constraint gate passes clean data and returns the full report") {
    // the raw synthetic lineitem legitimately violates the pk-uniqueness
    // constraint (the suite REPORTS that, hash-verified vs DuckDB) — so
    // the passing-gate case runs on a pk-deduplicated copy
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_clean").toString
    Tables.lineitem(spark, sf)
      .dropDuplicates("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Tables.orders(spark, sf).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rep = ops.QcOps.constraintGate(spark, dir)
    assert(rep.count() == 9)
    assert(rep.filter(!col("passed")).isEmpty)
  }

  test("metric drift gate passes at the stock band and raises when tightened") {
    // the carved previous epoch differs from the full load only in volume
    // (~11% more rows current): inside the 15% size band, outside a 5% one
    val rep = ops.QcOps.metricDriftGate(spark, sf)
    assert(rep.count() == 9)
    assert(rep.filter(!col("drift_ok")).isEmpty)
    // completeness/domain/range/RI metrics must show exactly zero drift;
    // volume (size) and the pk dup-rate legitimately move between epochs
    // (the carved slice has its own duplicate mix) but stay inside band
    assert(rep.filter(!col("check_name")
        .isin("size_ge_1000", "pk_unique_orderkey_linenumber"))
      .filter(col("rel_drift") =!= 0.0).isEmpty)
    val ex = intercept[IllegalStateException](
      ops.QcOps.metricDriftGate(spark, sf, sizeThreshold = 0.05))
    assert(ex.getMessage.contains("size_ge_1000"), ex.getMessage)
    assert(!ex.getMessage.contains("domain_returnflag"), ex.getMessage)
  }

  test("k-anonymity report: flags are pure functions of the group metrics") {
    val rep = ops.QcOps.kAnonymity(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (n, l) = (r.getAs[Long]("n_rows"), r.getAs[Long]("l_vals"))
      assert(r.getAs[Boolean]("k_ok") == (n >= 5), r.toString)
      assert(r.getAs[Boolean]("l_ok") == (l >= 2), r.toString)
      assert(l >= 1 && l <= 3 && l <= n, r.toString)
    }
    // sf0.001's ~150 customers over 125 QI cells make thin groups
    // inevitable — the gate must actually flag them
    assert(rep.exists(r => !r.getAs[Boolean]("k_ok")),
      "thin QI groups must be flagged k-anonymity violations")
  }

  test("constraint gate raises on injected violations, naming every failed check") {
    // doctor a copy of the tables: truncate lineitem below the size gate
    // and poison one price negative; orders stays intact so RI still holds
    val dir = java.nio.file.Files.createTempDirectory("graft_qc").toString
    Tables.lineitem(spark, sf)
      .limit(500)
      .withColumn("l_extendedprice",
        when(col("l_linenumber") === 1, lit(-5.0)).otherwise(col("l_extendedprice")))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Tables.orders(spark, sf).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ex = intercept[IllegalStateException](ops.QcOps.constraintGate(spark, dir))
    assert(ex.getMessage.contains("size_ge_1000"), ex.getMessage)
    assert(ex.getMessage.contains("nonneg_extendedprice"), ex.getMessage)
    // untripped checks must not be reported as failures
    assert(!ex.getMessage.contains("ri_orderkey_in_orders"), ex.getMessage)
  }

  test("cardinality profile: sketch estimates track exact counts per column") {
    val out = ops.QcOps.cardinalityProfile(spark, sf).collect()
    assert(out.length == 5, "one row per profiled column")
    out.foreach { r =>
      val (est, exact) =
        (r.getAs[Double]("est_distinct"), r.getAs[Long]("true_distinct"))
      val filled = r.getAs[Long]("n_filled_regs")
      assert(exact >= 1)
      assert(filled >= 1 && filled <= 256)
      if (r.getAs[String]("regime") == "raw") {
        // raw harmonic regime (n ≳ 2.5m): σ ≈ 1.04/√256 = 6.5%, allow ~3σ
        val err = math.abs(est - exact) / exact
        assert(err < 0.20,
          s"${r.getString(0)}: est $est vs exact $exact (${err * 100}%)")
      } else if (exact < 64) {
        // linear-counting regime, collision-free zone (n ≪ m): the
        // filled-register count reads the cardinality near-exactly
        assert(math.abs(filled - exact) <= math.max(1L, exact / 10),
          s"${r.getString(0)}: $filled filled regs vs exact $exact")
      }
      // n between m/4 and 2.5m is the documented transition band: both
      // estimators are biased there and the profile's regime label says so
    }
    // the profile must actually separate keys from enums
    val byName = out.map(r => r.getString(0) -> r.getAs[Long]("true_distinct")).toMap
    assert(byName("l_returnflag") < 10 && byName("l_orderkey") > 1000)
  }
}
