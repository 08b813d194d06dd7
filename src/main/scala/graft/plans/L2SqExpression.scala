package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact squared L2 distance of two
  * `array<bigint>` quantized embeddings — the hard-negative-mining hot
  * path, where the `aggregate(zip_with(...))` higher-order-function chain
  * it replaces is interpreted PER ELEMENT (64 boxed expression evals per
  * pair; at probes × corpus pairs this dominated the whole query).
  *
  * Same discipline as [[CosineExpression]]: `doGenCode` splices one static
  * call reading the unsafe array buffers directly inside whole-stage
  * codegen — no catalyst→Scala copies, no codegen fence.
  *
  * Numeric contract (oracle-critical): exact BIGINT arithmetic, identical
  * to `SUM((a[i]-b[i])²)` in DuckDB — integer adds in index order, no
  * float anywhere. NULL on null or length-mismatched input (never a
  * phantom 0 distance).
  */
case class L2SqExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SqExpression.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = L2SqExpression.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}_r = $cls.MODULE$$.compute($a, $b);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.longValue();
      |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object L2SqExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
