package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Coalesce, EqualTo, Expression, IsNull, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BooleanType

/** Optimizer rule for the reference's pervasive null-safe outlier predicate
  * (`wifi_measurement_s3_table_schema.md:86,101`): canonicalize
  *
  *   (is_global_outlier != true OR is_global_outlier IS NULL)
  *     →  (NOT is_global_outlier OR is_global_outlier IS NULL)
  *
  * Truth table: true→false, false→true, null→true — identical. The target
  * shape is chosen deliberately: both disjuncts translate to parquet source
  * filters (Not/IsNull push down; a `NOT coalesce(x, false)` form would be
  * semantically equal but UNPUSHABLE — Coalesce has no data-source filter
  * translation — regressing every outlier-filtered scan). BooleanSimplification
  * usually performs the same fold before injected rules run; this rule
  * guarantees the canonical form for plans that skip that batch, and serves
  * as the `injectOptimizerRule` demonstration (SURVEY §4 calls the rewrite
  * cosmetic, and it is).
  */
object OutlierIdiomRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Or(Not(EqualTo(c, Literal(true, BooleanType))), IsNull(c2))
        if c.semanticEquals(c2) => Or(Not(c), IsNull(c2))
      case Or(IsNull(c2), Not(EqualTo(c, Literal(true, BooleanType))))
        if c.semanticEquals(c2) => Or(Not(c), IsNull(c2))
    }
}
