package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class ExactQuantileSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("valueAtRank == sorted-sequence answer across ranks, ties, negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // heavy ties and negatives: values from a small biased domain
    val values = (0 until 3000).map(_ =>
      (rnd.nextInt(200) - 100).toLong * (if (rnd.nextBoolean()) 7 else 1))
    val df = values.toDF("v")
    val sorted = values.sorted
    for (rank <- Seq(1, 2, 1500, 1501, 2999, 3000)) {
      withClue(s"rank $rank: ") {
        ExactQuantile.valueAtRank(df, "v", rank.toLong) shouldBe
          sorted(rank - 1)
      }
    }
  }

  test("tiny fanout + tiny directLimit force a deep histogram descent") {
    import spark.implicits._
    val values = (0 until 2000).map(i => (i.toLong * 977) % 100000)
    val df = values.toDF("v")
    val sorted = values.sorted
    for (rank <- Seq(1, 777, 2000)) {
      ExactQuantile.valueAtRank(df, "v", rank.toLong,
        fanout = 4, directLimit = 8L) shouldBe sorted(rank - 1)
    }
  }

  test("medianExact: lower median on odd and even counts, constant column") {
    import spark.implicits._
    ExactQuantile.medianExact(Seq(5L, 1L, 3L).toDF("v"), "v") shouldBe
      ((3L, 2L, 3L))
    ExactQuantile.medianExact(Seq(4L, 1L, 3L, 2L).toDF("v"), "v") shouldBe
      ((4L, 2L, 2L))
    ExactQuantile.medianExact(
      Seq.fill(100)(42L).toDF("v"), "v") shouldBe ((100L, 50L, 42L))
  }

  test("invalid ranks fail loudly") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("v")
    an[IllegalArgumentException] should be thrownBy
      ExactQuantile.valueAtRank(df, "v", 0L)
    an[IllegalArgumentException] should be thrownBy
      ExactQuantile.valueAtRank(df, "v", 3L)
  }
}
