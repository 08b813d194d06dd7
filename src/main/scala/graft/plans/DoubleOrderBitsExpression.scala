package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving IEEE-754 double → signed-long bit map: `a < b` as
  * doubles ⇔ `map(a) < map(b)` as longs (total order; `-0.0 < +0.0`, and
  * NaN maps above `+Infinity` — the IEEE totalOrder convention, which also
  * matches how SQL engines sort NaN last ascending).
  *
  * The trick: the raw bit pattern of a non-negative double already sorts
  * correctly as a signed long; a negative double's magnitude bits sort
  * BACKWARDS, so flipping the 63 non-sign bits (XOR with
  * `(bits >> 63) & Long.MaxValue`) reverses them while keeping the sign
  * bit — negatives stay below positives and now ascend. The map is its own
  * inverse on the long side ([[DoubleOrderBitsExpression.fromBits]]).
  *
  * This is what lets [[graft.operators.ExactQuantile]]'s histogram descent
  * — integer bucket arithmetic all the way down — serve exact order
  * statistics over DOUBLE columns unchanged: descend on the mapped longs,
  * reverse-map the found rank value.
  *
  * Codegen'd (one static call spliced into whole-stage codegen), same
  * pattern as [[HaversineExpression]].
  */
case class DoubleOrderBitsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "double_order_bits"

  override protected def nullSafeEval(input: Any): Any =
    DoubleOrderBitsExpression.toBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DoubleOrderBitsExpression.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, d => s"$cls.MODULE$$.toBits($d)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[DoubleOrderBitsExpression]]: order-mapped long → the
  * original double. Used by the grouped quantile descent, whose per-group
  * results live in a DataFrame (no driver-side reverse-map possible). */
case class DoubleOrderBitsInverseExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "double_order_bits_inv"

  override protected def nullSafeEval(input: Any): Any =
    DoubleOrderBitsExpression.fromBits(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DoubleOrderBitsExpression.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, m => s"$cls.MODULE$$.fromBits($m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleOrderBitsExpression {
  /** Double → order-isomorphic long. Shared by interpreted eval + codegen. */
  def toBits(d: Double): Long = {
    val l = java.lang.Double.doubleToLongBits(d)
    l ^ ((l >> 63) & Long.MaxValue)
  }

  /** Inverse of [[toBits]] (the XOR mask depends only on the preserved sign
    * bit, so the same transform undoes itself). */
  def fromBits(m: Long): Double =
    java.lang.Double.longBitsToDouble(m ^ ((m >> 63) & Long.MaxValue))
}
