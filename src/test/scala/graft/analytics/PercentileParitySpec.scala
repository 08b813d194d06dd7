package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Pins the cross-engine percentile interpolation contract behind
  * a14_percentile_bands / a17_approx_percentile.
  *
  * Both Spark's `percentile` and DuckDB's `quantile_cont` interpolate at
  * position (n−1)·p with the TWO-SIDED form `(1−f)·lo + f·hi` — verified
  * bit-for-bit against DuckDB on a case where the algebraically equal
  * one-sided form `lo + (hi−lo)·f` differs in the last ulp, and on every
  * group of lineitem at sf0.01 AND sf0.1 (raw doubles, before the FLOOR
  * cents grid). ~22% of random (lo, hi, f) triples separate the two forms,
  * so if a Spark upgrade ever switches formula this test fires and the
  * a14/a17 oracles must be revisited.
  */
class PercentileParitySpec extends AnyFunSuite with Matchers with SparkSuite {

  test("Spark percentile uses the two-sided (1-f)*lo + f*hi interpolation") {
    import spark.implicits._
    // Cases where the two IEEE forms differ in the final ulp (seed=7 sweep).
    val cases = Seq(
      (5516.343649219647, 9808.687359778454, 0.28960928633167626),
      (81778.12218879511, 82681.762281151, 0.5816001636624663),
      (64216.32477058484, 66078.31876023806, 0.5477444657095578))
    cases.foreach { case (lo, hi, p) =>
      val oneSided = lo + (hi - lo) * p
      val twoSided = (1.0 - p) * lo + p * hi
      assert(oneSided != twoSided, "case no longer discriminates the forms")
      val got = Seq(lo, hi).toDF("v")
        .agg(expr(s"percentile(v, ${p}D)")).as[Double].head()
      java.lang.Double.doubleToLongBits(got) shouldBe
        java.lang.Double.doubleToLongBits(twoSided)
    }
  }

  test("percentile on duplicate-heavy groups is rank-stable") {
    import spark.implicits._
    // Equal values at the interpolation ranks: tie order cannot matter.
    val vs = Seq.fill(50)(10.0) ++ Seq.fill(50)(20.0)
    Seq(3, 7).foreach { parts =>
      val got = scala.util.Random.shuffle(vs).toDF("v").repartition(parts)
        .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D))"))
        .as[Seq[Double]].head()
      got shouldBe Seq(10.0, 15.0, 20.0)
    }
  }
}
