package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The island/prefix decomposition vs brute force on randomized inputs —
  * including the shapes the events-table oracle never exercises: single
  * users, everything on one day, sparse multi-gap histories, duplicate
  * sightings, and window sizes 1 and 30. */
class SlidingDistinctSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def brute(
      rows: Seq[(String, Long, Long)], w: Int): Map[(String, Long), Long] = {
    val byK = rows.distinct.groupBy(_._1)
    byK.flatMap { case (k, rs) =>
      rs.map(_._2).distinct.map { t =>
        (k, t) -> rs.filter(r => r._2 >= t - (w - 1) && r._2 <= t)
          .map(_._3).distinct.size.toLong
      }
    }.toMap
  }

  private def run(
      rows: Seq[(String, Long, Long)], w: Int): Map[(String, Long), Long] = {
    import spark.implicits._
    SlidingDistinct.exact(rows.toDF("k", "d", "u"), w)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("randomized sweep matches brute force across window sizes") {
    val rnd = new scala.util.Random(991)
    for (trial <- 1 to 6; w <- Seq(1, 3, 7, 30)) {
      val n = 30 + rnd.nextInt(120)
      val rows = Seq.fill(n)((
        s"k${rnd.nextInt(3)}",
        rnd.nextInt(40).toLong, // dense day range → overlapping islands
        rnd.nextInt(8).toLong))
      withClue(s"trial=$trial w=$w: ") { run(rows, w) shouldBe brute(rows, w) }
    }
  }

  test("degenerate shapes: one user, one day, sparse gaps, duplicates") {
    // one user sighted repeatedly — count is always exactly 1
    val solo = Seq.tabulate(10)(i => ("k", i * 3L, 1L))
    run(solo, 7) shouldBe brute(solo, 7)
    run(solo, 7).values.toSet shouldBe Set(1L)
    // everything on one day
    val oneDay = Seq.tabulate(5)(u => ("k", 100L, u.toLong))
    run(oneDay, 7) shouldBe Map(("k", 100L) -> 5L)
    // gaps wider than the window — islands must NOT bridge
    val gaps = Seq(("k", 0L, 1L), ("k", 100L, 1L), ("k", 100L, 2L))
    run(gaps, 7) shouldBe Map(("k", 0L) -> 1L, ("k", 100L) -> 2L)
    // duplicate sightings collapse
    val dup = Seq(("k", 5L, 9L), ("k", 5L, 9L), ("k", 6L, 9L))
    run(dup, 7) shouldBe Map(("k", 5L) -> 1L, ("k", 6L) -> 1L)
  }

  test("NULL users are ignored, matching COUNT(DISTINCT) semantics") {
    import spark.implicits._
    // a (k, NULL) sighting neither counts as a user nor marks its day
    // active: null rows vanish entirely before islanding (the round-13
    // fix — previously each NULL formed its own island and counted as 1)
    val rows = Seq(
      ("k", 1L, Some(7L)), ("k", 1L, None), ("k", 2L, None),
      ("k", 3L, Some(8L)))
    val df = rows.toDF("k", "d", "u")
    val got = SlidingDistinct.exact(df, 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // day 2 had ONLY a null sighting: no output row for it (no non-null
    // activity), and nulls never inflate the counts on days 1 and 3
    got shouldBe Map(("k", 1L) -> 1L, ("k", 3L) -> 2L)
  }
}
