package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** o63's significance exponent at the scale its own docstring advertises:
  * a DECADE of trending daily data drives |U_t| to ~n²/4 ≈ 3.3e6, where
  * the pre-fix `6·u_t²·1e6` product wraps BIGINT (silent garbage in Spark
  * with ANSI off; out-of-range error in DuckDB). The split-division form
  * must stay exact there — pinned against driver-side BigInt. */
class PettittOverflowSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def dailyTrend(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => ("t", i)).toDF("ty", "i")
      .select(F.col("ty"),
        F.date_add(F.lit("2000-01-01").cast("date"), F.col("i")).as("d"),
        F.col("i").cast("bigint").as("c"))
  }

  test("decade-scale trend: exponent_micro is BigInt-exact, not wrapped") {
    val n = 3653 // ten years of daily data, the o58 calendar domain
    val row = RobustStatsQueries.pettittFrom(dailyTrend(n))
      .select("n_days", "k_stat", "exponent_micro").head()
    // strictly increasing series: every pair signs +1, so
    // U_i = i(n-i) — maximal at i = (n±1)/2 with K = floor(n/2)·ceil(n/2)
    val k = BigInt(n / 2) * BigInt((n + 1) / 2)
    val d = BigInt(n).pow(3) + BigInt(n).pow(2)
    val expected = (6 * k * k * 1000000) / d
    row.getLong(0) shouldBe n.toLong
    BigInt(row.getLong(1)) shouldBe k
    BigInt(row.getLong(2)) shouldBe expected
    // regression witness: the naive product is past 2^63 here, so a
    // wrapped evaluation could not have produced the exact quotient
    (6 * k * k * 1000000 > BigInt(Long.MaxValue)) shouldBe true
  }

  test("small n: split division agrees with the naive in-range product") {
    val n = 40
    val row = RobustStatsQueries.pettittFrom(dailyTrend(n))
      .select("k_stat", "exponent_micro").head()
    val k = (n / 2).toLong * ((n + 1) / 2).toLong
    row.getLong(0) shouldBe k
    row.getLong(1) shouldBe (6L * k * k * 1000000L) / (n.toLong * n * n + n.toLong * n)
  }
}
