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

  test("valueAtRanks: one shared descent matches per-rank answers across seeds") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 99)) {
      val rnd = new scala.util.Random(seed)
      val values = (0 until 2500).map(_ =>
        (rnd.nextInt(4000) - 2000).toLong * (if (rnd.nextInt(3) == 0) 13 else 1))
      val df = values.toDF("v")
      val sorted = values.sorted
      val ranks = Seq(1L, 625L, 1250L, 1251L, 2375L, 2500L)
      // tiny fanout forces several shared levels; duplicate rank allowed
      val got = ExactQuantile.valueAtRanks(df, "v", ranks :+ 1250L,
        fanout = 8, directLimit = 16L)
      got shouldBe (ranks :+ 1250L).map(r => sorted((r - 1).toInt))
    }
  }

  test("valueAtRanksDouble: bit-map descent == sorted doubles, negatives/ties/fractions") {
    import spark.implicits._
    for (seed <- Seq(5, 42)) {
      val rnd = new scala.util.Random(seed)
      val values = (0 until 2000).map { _ =>
        val base = (rnd.nextInt(800) - 400) * 0.37
        if (rnd.nextInt(4) == 0) base else base + rnd.nextDouble() * 1e-3
      }
      val df = values.toDF("v")
      val sorted = values.sorted
      val ranks = Seq(1L, 500L, 1000L, 1001L, 1999L, 2000L)
      val got = ExactQuantile.valueAtRanksDouble(df, "v", ranks,
        fanout = 64, directLimit = 32L)
      got shouldBe ranks.map(r => sorted((r - 1).toInt))
    }
  }

  test("double order-bit map is an order isomorphism and self-inverse") {
    import graft.plans.DoubleOrderBitsExpression._
    val specials = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 0.3, 2.0, 1e300, Double.PositiveInfinity)
    specials.sliding(2).foreach { case Seq(a, b) =>
      assert(toBits(a) < toBits(b), s"$a vs $b")
    }
    specials.foreach(d => assert(fromBits(toBits(d)) == d ||
      (d == 0.0 && fromBits(toBits(d)) == d)))
    // NaN sorts above +Infinity (totalOrder convention)
    assert(toBits(Double.NaN) > toBits(Double.PositiveInfinity))
  }

  test("a rank vector shares the descent: job count grows by residues, not by levels x ranks") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0 until 20000).map(_ => rnd.nextInt(1 << 20).toLong).toDF("v")
      .localCheckpoint(true)
    def countJobs(body: => Unit): Int = {
      val group = s"eq-jobs-${System.nanoTime()}"
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val one = countJobs {
      ExactQuantile.valueAtRanks(df, "v", Seq(10000L), fanout = 16,
        directLimit = 64L); ()
    }
    val five = countJobs {
      ExactQuantile.valueAtRanks(df, "v",
        Seq(1L, 5000L, 10000L, 15000L, 20000L), fanout = 16,
        directLimit = 64L); ()
    }
    // five ranks may add residue TakeOrdereds (≤ 1 job each) and share
    // every histogram level; a per-rank descent would pay ~5x the levels
    five should be <= one + 5
    five should be < one * 3
  }

  test("invalid ranks fail loudly") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("v")
    an[IllegalArgumentException] should be thrownBy
      ExactQuantile.valueAtRank(df, "v", 0L)
    an[IllegalArgumentException] should be thrownBy
      ExactQuantile.valueAtRank(df, "v", 3L)
    an[IllegalArgumentException] should be thrownBy
      ExactQuantile.valueAtRank(df, "v", 1L, fanout = 1)
  }

  test("fanout 2 over the full Long range: the 2^63 bucket width stays exact") {
    import spark.implicits._
    // level-0 width = (2^64 - 1) DIV 2 + 1 = 2^63 — one past Long.MaxValue;
    // a long-narrowed width wraps negative and mis-buckets every row
    val v0 = 987654321L
    val rows = Seq.fill(20)(Long.MinValue) ++ Seq.fill(40)(v0) ++
      Seq.fill(20)(Long.MaxValue)
    val df = rows.toDF("v")
    ExactQuantile.valueAtRank(df, "v", 40L, fanout = 2,
      directLimit = 1L) shouldBe v0
  }
}
