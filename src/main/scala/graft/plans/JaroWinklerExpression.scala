package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity — the
  * record-linkage verifier behind `llm_jw_linkage` (reference shape: the
  * comparison service's fuzzy AP-name matching sits on the same
  * similarity family; wifi-location-data-pipeline documents/comparison).
  *
  * Spark has `levenshtein` but no Jaro–Winkler; a native Expression keeps
  * the verify loop inside whole-stage codegen (the CosineExpression
  * argument: no per-row catalyst→Scala boxing, no codegen fence).
  *
  * Numeric contract (oracle-critical, pinned against DuckDB):
  *  - operates on UTF-8 BYTES (DuckDB's string functions do the same;
  *    identical to code points on ASCII corpora);
  *  - either input empty → 0.0 (DuckDB returns 0 even for two empties);
  *  - match window = max(len)/2 − 1 clamped at 0; transpositions are
  *    `mismatched_matches / 2` in INTEGER division ('abcdef' vs 'bcadef'
  *    = 0.9444…, i.e. t = 1 from 3 out-of-order matches);
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in exactly that operation
  *    order;
  *  - Winkler boost ONLY above jaro 0.7 (DuckDB: 0.6667 stays unboosted,
  *    0.7333 boosts): jw = j + min(prefix,4)·0.1·(1−j).
  * NULL propagates from null inputs (BinaryExpression default). */
case class JaroWinklerExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpression.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaroWinklerExpression.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinklerExpression {
  /** Shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val (l1, l2) = (a.length, b.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && a(i) == b(j)) {
          matched1(i) = true; matched2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: out-of-order count over the matched subsequences
    var k = 0
    var mism = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a(i) != b(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (j <= 0.7) return j
    var pl = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (pl < pmax && a(pl) == b(pl)) pl += 1
    j + pl * 0.1 * (1.0 - j)
  }
}
