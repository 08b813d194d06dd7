package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class RangeJoinSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def points = {
    import spark.implicits._
    Seq((1L, -250.0), (2L, 0.0), (3L, 499.99), (4L, 500.0), (5L, 1750.5))
      .toDF("pid", "v")
  }

  private def intervals = {
    import spark.implicits._
    Seq(("neg", -300.0, -100.0), ("low", 0.0, 500.0), ("wide", -1000.0, 2000.0))
      .toDF("band", "lo", "hi")
  }

  private def run(width: Double) =
    RangeJoin.bucketed(points, "v", intervals, "lo", "hi", width)
      .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("matches exactly the inclusive BETWEEN semantics") {
    val expected = points.crossJoin(intervals)
      .where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    run(250.0) shouldBe expected
    expected should contain((2L, "low"))  // lo boundary inclusive
    expected should contain((4L, "low"))  // hi boundary inclusive
    expected should contain((1L, "neg"))  // negative-domain bucketing (floor)
  }

  test("bucket width does not change the result, only the plan") {
    run(10.0) shouldBe run(5000.0)
  }

  test("plans an equi-join, not a nested-loop join") {
    val p = RangeJoin.bucketed(points, "v", intervals, "lo", "hi", 250.0)
      .queryExecution.executedPlan.toString
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("an interval spanning more than the bucket cap fails fast") {
    val ex = intercept[Exception] {
      RangeJoin.bucketed(points, "v", intervals, "lo", "hi",
        bucketWidth = 0.1, maxBucketsPerInterval = 100).count()
    }
    ex.getMessage should include("widen bucketWidth")
  }
}
