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

  test("overlap join equals brute-force overlap filter, with NO duplicate pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = (0 until 60).map { i =>
      val lo = rnd.nextInt(300).toDouble; (s"a$i", "k" + (i % 3), lo, lo + rnd.nextInt(80))
    }.toDF("aid", "key", "alo", "ahi").repartition(4)
    val b = (0 until 50).map { i =>
      val lo = rnd.nextInt(300).toDouble; (s"b$i", "k" + (i % 3), lo, lo + rnd.nextInt(80))
    }.toDF("bid", "key", "blo", "bhi").repartition(3)

    val got = RangeJoin.overlapJoin(a, "alo", "ahi", b, "blo", "bhi",
      on = Seq("key"), bucketWidth = 25.0)
      .select("aid", "bid").collect().map(_.toString)
    val expected = a.join(b, "key")
      .where(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(_.toString)
    got.sorted shouldBe expected.sorted
    got.length shouldBe got.distinct.length // canonical bucket: no dup pairs
  }

  test("an interval spanning more than the bucket cap fails fast") {
    val ex = intercept[Exception] {
      RangeJoin.bucketed(points, "v", intervals, "lo", "hi",
        bucketWidth = 0.1, maxBucketsPerInterval = 100).count()
    }
    ex.getMessage should include("widen bucketWidth")
  }
}
