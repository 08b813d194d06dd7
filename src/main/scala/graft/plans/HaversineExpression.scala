package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for haversine distance (meters) — the
  * codegen'd SQL-surface form of `graft.functions.Geo.haversineMeters`.
  *
  * Why a native Expression instead of a UDF: `doGenCode` splices a single
  * static call into whole-stage codegen, so the distance math fuses with
  * the scan (no boxing, no codegen fence) while SQL text stays
  * `haversine_m(lat1, lon1, lat2, lon2)` and the plan tree stays one node
  * instead of the ~15-node composite the Column version expands to. Same
  * math as the comparison service (`ComparisonService.java:288-290`,
  * R = 6371000 m).
  */
case class HaversineExpression(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  // Input typing: the registration builder casts all four children to
  // DOUBLE (ExpectsInputTypes is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_m"

  override protected def nullSafeEval(
      lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    HaversineExpression.compute(
      lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HaversineExpression.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, (a1, o1, a2, o2) =>
      s"$cls.MODULE$$.compute($a1, $o1, $a2, $o2)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object HaversineExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * 6371000.0 * math.asin(math.sqrt(a))
  }
}
