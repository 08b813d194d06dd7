package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class GroupedQuantileSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("grouped median == per-group sorted brute force, mixed group sizes") {
    import spark.implicits._
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed)
      // group g has ~g² rows: tiny groups exit to the residue finisher on
      // level 0 while large ones keep descending — both paths in one run
      val rows = for {
        g <- 1 to 12
        _ <- 0 until g * g * 3
      } yield (g.toLong, (rnd.nextInt(20000) - 10000).toLong * (g % 4 + 1))
      val df = rows.toDF("g", "v")
      val got = GroupedQuantile.valueAtRankBy(df, Seq("g"), "v",
        GroupedQuantile.medianRank, "med", fanout = 8, directLimit = 16L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val exp = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> sorted(((sorted.length + 1) / 2) - 1)
      }
      withClue(s"seed=$seed")(got shouldBe exp)
    }
  }

  test("grouped arbitrary rank (p90) and custom rank builder") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = for (g <- 1 to 5; _ <- 0 until 400)
      yield (g.toLong, rnd.nextInt(100000).toLong)
    val df = rows.toDF("g", "v")
    val p90: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => floor((n * lit(9L) + lit(9L)) / lit(10L)).cast("long")
    val got = GroupedQuantile.valueAtRankBy(df, Seq("g"), "v", p90, "p90",
      fanout = 16, directLimit = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> sorted(((9 * sorted.length + 9) / 10) - 1)
    }
    got shouldBe exp
  }

  test("grouped DOUBLE median: bit-map descent returns the stored element") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for (g <- 1 to 6; _ <- 0 until 300 + g * 100)
      yield (g.toLong, (rnd.nextInt(4000) - 2000) * 0.37 + rnd.nextDouble() * 1e-3)
    val df = rows.toDF("g", "v")
    val got = GroupedQuantile.valueAtRankByDouble(df, Seq("g"), "v",
      GroupedQuantile.medianRank, "med", fanout = 32, directLimit = 16L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> sorted(((sorted.length + 1) / 2) - 1)
    }
    got shouldBe exp
  }

  test("rank vector per group: one descent serves median+p90+max exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for (g <- 1 to 8; _ <- 0 until 100 + g * 60)
      yield (g.toLong, (rnd.nextInt(40000) - 20000).toLong)
    val df = rows.toDF("g", "v")
    val p90: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => floor((n * lit(9L) + lit(9L)) / lit(10L)).cast("long")
    val maxRank: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => n
    val got = GroupedQuantile.valueAtRanksBy(df, Seq("g"), "v",
      Seq(GroupedQuantile.medianRank, p90, maxRank), "q",
      fanout = 8, directLimit = 16L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      withClue(s"g=$g") {
        got((g, 0L)) shouldBe sorted(((sorted.length + 1) / 2) - 1)
        got((g, 1L)) shouldBe sorted(((9 * sorted.length + 9) / 10) - 1)
        got((g, 2L)) shouldBe sorted.last
      }
    }
  }

  test("slots share descent levels: 3-rank job count stays near the 1-rank count") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val rows = for (g <- 1 to 6; _ <- 0 until 800)
      yield (g.toLong, rnd.nextInt(1 << 20).toLong)
    val df = rows.toDF("g", "v").localCheckpoint(true)
    def countJobs(body: => Unit): Int = {
      val group = s"gq-jobs-${System.nanoTime()}"
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val p90: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => floor((n * lit(9L) + lit(9L)) / lit(10L)).cast("long")
    val one = countJobs {
      GroupedQuantile.valueAtRanksBy(df, Seq("g"), "v",
        Seq(GroupedQuantile.medianRank), "q", fanout = 8, directLimit = 32L)
        .count(); ()
    }
    val three = countJobs {
      GroupedQuantile.valueAtRanksBy(df, Seq("g"), "v",
        Seq(GroupedQuantile.medianRank, p90, n => n), "q",
        fanout = 8, directLimit = 32L)
        .count(); ()
    }
    // all slots advance in the same lock-step levels (one emptiness check
    // per level); a per-rank descent would pay ~3x the level jobs
    three should be <= one + 3
  }

  test("deep descent: fanout 2 over the full Long range walks all 64 levels") {
    import spark.implicits._
    // 50×Long.MinValue, 100×v0, 50×Long.MaxValue: the median is v0 and its
    // bucket keeps 100 rows (> directLimit) at every level, so the descent
    // only ends when the range collapses to a point — exactly 64 halvings
    // from the full 64-bit range. Exercises the converged-not-level-count
    // exit condition: a level counter check would throw at level == 64.
    val v0 = 12345677L
    val rows = Seq.fill(50)(Long.MinValue) ++ Seq.fill(100)(v0) ++
      Seq.fill(50)(Long.MaxValue)
    val df = rows.map((1L, _)).toDF("g", "v")
    val got = GroupedQuantile.valueAtRankBy(df, Seq("g"), "v",
      GroupedQuantile.medianRank, "med", fanout = 2, directLimit = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got shouldBe Map(1L -> v0)
  }

  test("fanout < 2 is rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      GroupedQuantile.valueAtRankBy(df, Seq("g"), "v",
        GroupedQuantile.medianRank, "med", fanout = 1, directLimit = 1L)
  }

  test("multi-key groups and negative/tied values") {
    import spark.implicits._
    val rows = for {
      a <- 0 to 2; b <- 0 to 1
      i <- 0 until 50
    } yield (a.toLong, s"k$b", ((i % 7) - 3).toLong * (a + 1))
    val df = rows.toDF("a", "b", "v")
    val got = GroupedQuantile.valueAtRankBy(df, Seq("a", "b"), "v",
      GroupedQuantile.medianRank, "med", fanout = 4, directLimit = 8L)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val exp = rows.groupBy(r => (r._1, r._2)).map { case (k, vs) =>
      val sorted = vs.map(_._3).sorted
      k -> sorted(((sorted.length + 1) / 2) - 1)
    }
    got shouldBe exp
  }
}
