package graft.plans

import graft.functions.HllCardinality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, StringType}

/** Opt-in optimizer rule: rewrites exact `COUNT(DISTINCT col)` into the HLL
  * aggregate when `spark.graft.rewrite.approxDistinct=true` (k via
  * `spark.graft.rewrite.approxDistinct.k`, default 4096).
  *
  * Why as a Rule rather than a user-facing function: Catalyst plans exact
  * distinct aggregation with an Expand (the rows are duplicated per distinct
  * aggregate) plus a second shuffle keyed by the distinct value — at 100 TB
  * that second, row-cardinality shuffle dominates the query. The rewrite
  * swaps in the constant-buffer sketch plan (single exchange, O(groups x m)
  * network) for workloads that tolerate ~1.6% error, without touching query
  * code — flip the conf, rerun.
  *
  * Scope guards: only plain `Count(single child)` with isDistinct, no
  * FILTER clause; result cast to LongType to preserve the original column
  * type. Multi-arg COUNT(DISTINCT a, b) and filtered aggregates pass
  * through untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewrite.approxDistinct", "false").toBoolean

  private def k: Int =
    SQLConf.get.getConfString("spark.graft.rewrite.approxDistinct.k", "4096").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            val hll = HllCardinality(Cast(child, StringType), k, 64)
            Cast(hll.toAggregateExpression(), LongType)
        }
    }
  }
}

/** SparkSessionExtensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Injects the rewrite
  * rule and registers every graft SQL function on session build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
  }
}

object GraftExtensions {
  /** Attach the rule to an EXISTING session (the driver harness builds
    * plain sessions): idempotently append to the session's adaptive/
    * experimental extra optimizations.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(ApproxDistinctRewrite)) {
      spark.experimental.extraOptimizations = cur :+ ApproxDistinctRewrite
    }
  }
}
