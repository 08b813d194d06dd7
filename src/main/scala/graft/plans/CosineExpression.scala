package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two `array<float>`
  * embeddings — the ANN re-rank hot path (`graft.llm.Similarity`).
  *
  * Why a native Expression instead of the JIT UDF it replaces: the UDF pays
  * a catalyst→Scala conversion per row (each `ArrayData` copied into a
  * boxed `Seq[Float]` before the loop); `doGenCode` splices a static call
  * that reads the unsafe array buffers DIRECTLY into whole-stage codegen —
  * zero copies, no codegen fence, one plan node.
  *
  * Numeric contract (oracle-critical): a strict left fold in double, the
  * SAME summation order as DuckDB's `list_cosine_similarity` — bit-for-bit
  * equal to the UDF it replaced, which `SimilaritySpec` pins. NULL on null
  * or empty or length-mismatched inputs (sorts LAST under desc ordering —
  * a 0.0 would outrank anti-correlated real matches); 0.0 on zero norm.
  */
case class CosineExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** `compute` reads the unsafe buffers with `getFloat`, so anything other
    * than `array<float>` (e.g. an `array(0.1, 0.2)` double literal from SQL)
    * would read 4 bytes of an 8-byte slot and return garbage. Fail analysis
    * instead; the SQL builder casts, so text callers still work. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineExpression.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineExpression.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r = $cls.MODULE$$.compute($a, $b);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.doubleValue();
      |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineExpression {
  /** Shared by interpreted eval and generated code. Boxed return carries
    * the invalid-input NULL through codegen. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }
}
