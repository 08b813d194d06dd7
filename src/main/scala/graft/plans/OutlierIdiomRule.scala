package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Coalesce, EqualTo, Expression, IsNull, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BooleanType

/** Optimizer rule for the reference's pervasive null-safe outlier predicate
  * (`wifi_measurement_s3_table_schema.md:86,101`):
  *
  *   (is_global_outlier != true OR is_global_outlier IS NULL)
  *     ≡  NOT coalesce(is_global_outlier, false)
  *
  * Truth table: true→false, false→true, null→true — identical. The rewrite
  * collapses a 2-branch boolean tree to one coalesce, which (unlike the OR
  * of two sub-predicates) converts to a single parquet pushdown-friendly
  * shape and keeps generated code smaller when the idiom appears per-row in
  * wide filters. Mostly a demonstration of `injectOptimizerRule` — Catalyst
  * handles the original fine; SURVEY §4 calls this "cosmetic", and it is.
  */
object OutlierIdiomRule extends Rule[LogicalPlan] {

  private object IdiomMatch {
    def unapply(e: Expression): Option[Expression] = e match {
      // as written in SQL text
      case Or(Not(EqualTo(c, Literal(true, BooleanType))), IsNull(c2))
        if c.semanticEquals(c2) => Some(c)
      case Or(IsNull(c2), Not(EqualTo(c, Literal(true, BooleanType))))
        if c.semanticEquals(c2) => Some(c)
      // as it reaches the optimizer: BooleanSimplification has already
      // folded `x != true` to `NOT x` before injected rules run
      case Or(Not(c), IsNull(c2))
        if c.dataType == BooleanType && c.semanticEquals(c2) => Some(c)
      case Or(IsNull(c2), Not(c))
        if c.dataType == BooleanType && c.semanticEquals(c2) => Some(c)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case IdiomMatch(c) => Not(Coalesce(Seq(c, Literal(false, BooleanType))))
    }
}
