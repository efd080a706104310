package graft.plans

import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer enablement — the plan-quality knob a 100 TB
  * deployment actually turns.
  *
  * Everything else in this library leans on rule-based optimization plus
  * AQE's runtime re-planning; both are size-blind BEFORE the first
  * shuffle runs. Statistics close that gap at plan time: with table row
  * counts and per-column NDV/min/max in the catalog, Catalyst can
  * (a) cost join orders (`spark.sql.cbo.joinReorder.enabled`) so a
  * filtered dimension joins before a big×big shuffle instead of after,
  * and (b) pick broadcast sides from ESTIMATED post-filter cardinality
  * rather than raw file size (`spark.sql.cbo.planStats.enabled`).
  *
  * Production shape: the warehouse runs `ANALYZE TABLE t COMPUTE
  * STATISTICS FOR ALL COLUMNS` after each load (cost: one extra scan,
  * amortized over every query until the next load); sessions flip the
  * three CBO flags. This helper reproduces exactly that on the testdata
  * parquet: registers each file as an external catalog table (the
  * in-memory session catalog holds the stats) and analyzes it.
  * PlanSpec's CBO test asserts the observable payoff: a deliberately
  * badly-ordered 3-way join (big ⋈ big first, selective dim last)
  * reorders under stats so the filtered dimension joins first.
  */
object Cbo {
  /** CBO flags, all default-off in Spark. */
  val flags: Seq[String] = Seq(
    "spark.sql.cbo.enabled",
    "spark.sql.cbo.joinReorder.enabled",
    "spark.sql.cbo.planStats.enabled")

  def enable(s: SparkSession): Unit = flags.foreach(s.conf.set(_, "true"))
  def disable(s: SparkSession): Unit = flags.foreach(s.conf.set(_, "false"))

  /** Register `<dir>/<t>.parquet` as external catalog tables named
    * `graft_cbo_<t>` and collect full statistics (row count + per-column
    * NDV/min/max/null count). Re-entrant for any dir: a stale table from
    * an earlier call with a DIFFERENT dir is dropped and recreated —
    * CREATE IF NOT EXISTS would silently keep the old location and
    * ANALYZE the wrong files. External tables: DROP never touches data.
    */
  def analyzeTables(s: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      val name = s"graft_cbo_$t"
      val loc = s"$dir/$t.parquet".replace("'", "''")
      if (s.catalog.tableExists(name)) s.sql(s"DROP TABLE $name")
      s.sql(s"CREATE TABLE $name USING parquet LOCATION '$loc'")
      s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
}
