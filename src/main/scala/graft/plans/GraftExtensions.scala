package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions._

/** Session extensions registering graft's native expressions as SQL
  * functions and an optimizer rule, via the public
  * `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).…
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("graft_rolling_hash64", es => RollingHash64(es.head)))
    e.injectFunction(fn("graft_simhash64", es => SimHash64(es.head)))
    e.injectFunction(fn("graft_shingle_hashes",
      es => ShingleHashes(es.head, es(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      })))
    e.injectFunction(fn("graft_hamming64", es => HammingDist64(es.head, es(1))))
    e.injectFunction(fn("graft_cosine_sim", es => CosineSim(es.head, es(1))))
    e.injectFunction(fn("graft_l2_dist", es => L2Dist(es.head, es(1))))
    e.injectOptimizerRule(_ => SimplifySelfSimilarity)
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectColumnar(_ => new GraftColumnarAffineRule)
  }
}

/** Optimizer rule (opt-in via `spark.graft.approxDistinct.enabled`):
  * rewrite exact `count(DISTINCT x)` aggregates to HyperLogLog++
  * (`approx_count_distinct`, 5% rsd). At 100 TB an exact distinct
  * forces either an Expand (one duplicated row per distinct-agg) or a
  * two-level shuffle keyed on the VALUE — both scale with the data;
  * the sketch keeps the aggregation single-pass, map-side combinable,
  * and constant-state. This is the lever the A20/J11 scaladocs
  * describe ("approx_count_distinct at scale") made into a
  * session-wide switch: turn it on for the profiling/reporting tier,
  * leave analytics exact. Multi-argument counts and filtered
  * aggregates are left untouched (HLL++ here takes one child); the
  * rewrite keeps the aggregate's result id, so nothing above the
  * Aggregate re-resolves. */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct.enabled", "false")
      .toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
        AggregateExpression(HyperLogLogPlusPlus(child), Complete,
          isDistinct = false, filter = None, resultId = ae.resultId)
    }
}

/** Optimizer rule: self-comparisons of graft metrics are constants —
  * `hamming(x, x) = 0` and `l2_dist(x, x) = 0.0` for any non-null x.
  * Arises naturally when a self-join's `id1 = id2` diagonal survives
  * into the similarity computation; folding it avoids evaluating the
  * vector loop per row. (Cosine is NOT folded: cosine(x,x) is 0, not
  * 1, for zero-norm vectors.) */
object SimplifySelfSimilarity extends Rule[LogicalPlan] {
  private def fold(a: Expression, zero: Literal): Expression =
    // hamming/l2 are null-intolerant: null input → null output, so a
    // nullable input folds to If(IsNull, null, 0) — still skips the
    // per-row vector loop
    if (a.nullable) If(IsNull(a), Literal.create(null, zero.dataType), zero)
    else zero

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case HammingDist64(a, b) if a.semanticEquals(b) && a.deterministic =>
      fold(a, Literal(0))
    case L2Dist(a, b) if a.semanticEquals(b) && a.deterministic =>
      fold(a, Literal(0.0))
  }
}
