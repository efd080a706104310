package graft.plans

import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` aggregates to
  * the HyperLogLog++ sketch (`approx_count_distinct`) — the
  * accuracy-for-speed switch a 100 TB deployment flips for dashboards and
  * data exploration, applied at the PLAN level so every query in the
  * session (including SQL arriving from BI tools that cannot be edited)
  * benefits without a rewrite.
  *
  * Why it matters at scale: exact distinct is the one aggregate that
  * cannot partially aggregate to a fixed size — Spark plans it as a
  * two-phase expand/shuffle carrying every distinct value across the
  * wire. The sketch form is a constant ~1.5 KB buffer per group, fully
  * map-side combined, at a documented ~2% default error.
  *
  * Strictly OPT-IN via `spark.graft.approx.distinct=true` (runtime conf,
  * default off): silently changing answer semantics is not acceptable as
  * a default, so the flag must be set per session/query block, and the
  * rule fires only where the swap is faithful:
  *  - single-argument COUNT(DISTINCT x) only — the multi-column form
  *    counts distinct TUPLES, which HLL++ over one child cannot express;
  *  - aggregate FILTER clauses are preserved;
  *  - output type (BIGINT) and column names are unchanged, so downstream
  *    plans and result schemas are byte-compatible.
  *
  * ExtensionSpec pins: flag off → exact plan untouched; flag on → the
  * plan aggregates with approx_count_distinct, the estimate lands within
  * the sketch's error band, and COUNT(DISTINCT a, b) is left exact.
  *
  * Interaction with the engine's own exactness-critical queries: a
  * session-wide flag would otherwise also rewrite the verification
  * baselines (`true_distinct`/`exact7` next to sketch estimates, QC dup
  * rates) into sketches, making "exact vs approx" columns silently
  * compare a sketch to itself. Those builders therefore use
  * [[graft.Det.exactDistinct]] — the two-argument COUNT(DISTINCT x, 0)
  * tuple form this rule deliberately refuses to touch — and stay exact
  * under any session configuration (ExtensionSpec pins this too).
  */
object RewriteExactDistinctToApprox extends Rule[LogicalPlan] {
  val FLAG = "spark.graft.approx.distinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FLAG, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case AggregateExpression(Count(Seq(child)), mode, true, filter, id) =>
              AggregateExpression(HyperLogLogPlusPlus(child), mode,
                isDistinct = false, filter, id)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = rewritten)
    }
}
