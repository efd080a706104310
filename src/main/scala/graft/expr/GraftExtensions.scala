package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard `SparkSessionExtensions` entry point: lets any deployment get
  * the engine's native functions at session-build time via
  *
  * {{{
  *   spark.sql.extensions=graft.expr.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions()(_))`),
  * instead of the per-session [[VectorExprs.register]] call the operator
  * library uses internally. Injection-time registration survives
  * `newSession()` children and makes the functions visible to plain SQL
  * clients (JDBC/Thrift) that never touch the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: plans graft.plans.TopKPerKeyNode as the
    // partial→exchange→final bounded-heap pair (the Scala API
    // self-registers the same object via ExperimentalMethods on first use)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // and the rewrite that routes the declarative row_number()-filter
    // idiom onto that operator automatically
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    // opt-in accuracy-for-speed switch: COUNT(DISTINCT x) → HLL++ sketch
    // when spark.graft.approx.distinct=true (default off — see the rule)
    ext.injectOptimizerRule(_ => graft.plans.RewriteExactDistinctToApprox)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => {
        // fail analysis on wrong arity: exprs(1) on a 1-arg call would be
        // an opaque IndexOutOfBounds, and a 3-arg call would otherwise
        // silently compute cosine of the first two
        require(exprs.length == 2,
          s"graft_cosine requires exactly 2 arguments, got ${exprs.length}")
        CosineSim(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_int_l2"),
      new ExpressionInfo(classOf[IntL2].getName, "graft_int_l2"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_int_l2 requires exactly 2 arguments, got ${exprs.length}")
        IntL2(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_minhash requires exactly 1 argument, got ${exprs.length}")
        MinHashSig(exprs.head, MinHashSig.K, MinHashSig.M)
      }))
  }
}
