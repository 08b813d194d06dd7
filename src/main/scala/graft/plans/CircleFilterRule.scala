package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Geo-pushdown optimizer rule: a radius filter around a CONSTANT center
  *
  *   haversine_m(lat, lon, cLat, cLon) <= r
  *
  * cannot reach a parquet scan (the trig expression has no data-source
  * translation), so the scan reads every row-group. This rule conjoins the
  * circle's BOUNDING BOX — plain range predicates on the raw lat/lon
  * columns, which DO translate to source filters and prune on row-group
  * min/max stats — while keeping the exact haversine predicate as the
  * residual. The box is a strict superset of the circle (Δlat = r/R
  * degrees, Δlon widened by the smallest cosine in the lat band, both
  * inflated 1e-4 relative), so adding its conjuncts cannot change any
  * result — the oracle gate proves it, and the spec asserts the bounds
  * actually reach `PushedFilters`. The classic geospatial rewrite every
  * geo-capable warehouse ships; here it is ~60 lines on Catalyst.
  *
  * Idempotent under the optimizer's fixed-point driver: a bound already
  * present (semantically) in the conjunct set is not added again.
  * Works for either argument order (constant center first or second pair).
  */
object CircleFilterRule extends Rule[LogicalPlan] {

  private val EarthRadiusM = 6371000.0
  private val Inflate = 1.0001

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other => other
  }

  private def constDouble(e: Expression): Option[Double] = strip(e) match {
    case Literal(d: Double, DoubleType) => Some(d)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (latCol, lonCol, centerLat, centerLon) when exactly one side of the
    * haversine call is a constant point. */
  private def circleOf(h: HaversineExpression)
      : Option[(Expression, Expression, Double, Double)] =
    (constDouble(h.first), constDouble(h.second),
      constDouble(h.third), constDouble(h.fourth)) match {
      case (Some(cLat), Some(cLon), None, None) =>
        Some((strip(h.third), strip(h.fourth), cLat, cLon))
      case (None, None, Some(cLat), Some(cLon)) =>
        Some((strip(h.first), strip(h.second), cLat, cLon))
      case _ => None
    }

  private def bounds(lat: Expression, lon: Expression,
      cLat: Double, cLon: Double, r: Double): Seq[Expression] = {
    if (r < 0) return Nil
    val dLat = math.toDegrees(r / EarthRadiusM) * Inflate
    val latPreds = Seq(
      GreaterThanOrEqual(lat, Literal(cLat - dLat)),
      LessThanOrEqual(lat, Literal(cLat + dLat)))
    // widest Δlon in the latitude band = smallest cosine in the band
    val bandMax = math.min(89.0, math.abs(cLat) + dLat)
    val cosBand = math.cos(math.toRadians(bandMax))
    val lonPreds =
      if (cosBand <= 1e-6) Nil // polar band: no finite lon box
      else {
        val dLon = math.toDegrees(r / (EarthRadiusM * cosBand)) * Inflate
        if (cLon - dLon <= -180.0 || cLon + dLon >= 180.0) Nil // wraparound
        else Seq(
          GreaterThanOrEqual(lon, Literal(cLon - dLon)),
          LessThanOrEqual(lon, Literal(cLon + dLon)))
      }
    latPreds ++ lonPreds
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val present = conjuncts(cond)
      val additions = present.flatMap {
        case LessThanOrEqual(h: HaversineExpression, rr) =>
          constDouble(rr).toSeq.flatMap(r =>
            circleOf(h).toSeq.flatMap { case (la, lo, cLat, cLon) =>
              bounds(la, lo, cLat, cLon, r)
            })
        case LessThan(h: HaversineExpression, rr) =>
          constDouble(rr).toSeq.flatMap(r =>
            circleOf(h).toSeq.flatMap { case (la, lo, cLat, cLon) =>
              bounds(la, lo, cLat, cLon, r)
            })
        case _ => Nil
      }.filterNot(b => present.exists(_.semanticEquals(b)))
      if (additions.isEmpty) f
      else Filter(additions.foldLeft(cond)((acc, b) => And(b, acc)), child)
  }
}
