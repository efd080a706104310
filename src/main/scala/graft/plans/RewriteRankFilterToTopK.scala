package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the declarative window-rank-limit idiom
  *
  *   Project [child cols only]
  *     Filter (rn <= k | rn < k+1 | rn = 1)
  *       Window [row_number() over (partition by K order by O) as rn]
  *
  * into the native bounded-heap operator ([[TopKPerKeyNode]]) — so a user
  * who writes the standard Spark pattern (or whose SQL arrives through a
  * BI tool) gets the sort-free partial→exchange→final plan automatically,
  * without calling [[TopKPerKey.topK]]. This is the engine-extension
  * counterpart of Spark's own `InferWindowGroupLimit` (which keeps the
  * sort and only prunes rows feeding it); the rule runs at either hook —
  * `injectOptimizerRule` (before group-limit inference) or
  * `ExperimentalMethods.extraOptimizations` (after it) — so it strips an
  * already-inserted [[WindowGroupLimit]] when present.
  *
  * Fires only when ALL of:
  *  - the Window computes exactly one expression: `row_number()` with the
  *    standard (UnboundedPreceding, CurrentRow) row frame. rank()/
  *    dense_rank() admit >k rows under ties — a bounded heap cannot
  *    express them, so they are left to WindowGroupLimit;
  *  - the partition spec is non-empty (global top-k already plans as
  *    TakeOrderedAndProject, which is optimal) and the order spec
  *    non-empty;
  *  - the rank attribute is consumed ONLY by the Filter: the Project
  *    above keeps plain child attributes and drops the rank. If the rank
  *    survives in the output the operator would have to re-derive it —
  *    that variant stays on the window path;
  *  - k is a positive integer literal.
  *
  * Tie semantics match `row_number` itself: with a non-total order the
  * choice of survivors among rank-boundary ties is nondeterministic in
  * BOTH forms, and with a total order both are exact — the rewrite never
  * changes the determinism class.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** k such that `cond` ≡ (row_number ≤ k), or None. */
  private def rankLimit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rn => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.exprId == rn => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            part, order, wchild, _)))
        if part.nonEmpty && order.nonEmpty &&
          projectList.forall(_.isInstanceOf[Attribute]) &&
          !projectList.exists(_.exprId == alias.exprId) =>
      rankLimit(cond, alias.exprId) match {
        case Some(k) if k > 0 =>
          // running post-hoc (extraOptimizations), InferWindowGroupLimit
          // has already inserted its partial limit — subsumed, strip it
          val base = wchild match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case other => other
          }
          Project(projectList, TopKPerKeyNode(part, order, k, base))
        case _ => p
      }
  }
}
