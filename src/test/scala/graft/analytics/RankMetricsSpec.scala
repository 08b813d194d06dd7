package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class RankMetricsSpec extends AnyFunSuite with Matchers with SparkSuite {

  /** O(n²) pair definition: AUC = (concordant + ties/2) / (n1·n0), in
    * doubled-ppm integers so the comparison is exact. */
  private def bruteAucPpm(rows: Seq[(Long, Long)]): Option[Long] = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      var twiceU = 0L // 2·(concordant + 0.5·tied)
      for (p <- pos; n <- neg) {
        if (p > n) twiceU += 2L else if (p == n) twiceU += 1L
      }
      Some(twiceU * 500000L / (pos.size.toLong * neg.size.toLong))
    }
  }

  test("aucExact == the O(n2) pair definition on random tied data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 30
      // small score domain → heavy ties; labels correlated with score
      val rows = (0 until n).map { _ =>
        val sc = rnd.nextInt(12).toLong
        val y = if (rnd.nextInt(12) < sc) 1L else 0L
        (sc, y)
      }
      val got = RankMetrics
        .aucExact(rows.toDF("score", "label"), "score", "label", bucketWidth = 4)
        .head()
      val expected = bruteAucPpm(rows)
      Option(got.get(3)).map(_.asInstanceOf[Long]) shouldBe expected
      got.getLong(0) shouldBe rows.count(_._2 == 1L).toLong
      got.getLong(1) shouldBe rows.count(_._2 == 0L).toLong
    }
  }

  test("degenerate classes: AUC undefined (null), counts still reported") {
    import spark.implicits._
    val allPos = Seq((3L, 1L), (5L, 1L)).toDF("score", "label")
    val r = RankMetrics.aucExact(allPos, "score", "label").head()
    r.isNullAt(3) shouldBe true
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 0L
  }

  test("perfect separation hits 1.0 and reversal hits 0.0 exactly") {
    import spark.implicits._
    val sep = Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L))
    RankMetrics.aucExact(sep.toDF("score", "label"), "score", "label")
      .head().getLong(3) shouldBe 1000000L
    val rev = sep.map { case (s, y) => (s, 1L - y) }
    RankMetrics.aucExact(rev.toDF("score", "label"), "score", "label")
      .head().getLong(3) shouldBe 0L
  }

  test("aucExactBy: each slice equals the ungrouped AUC of that slice alone") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      val g = (i % 3).toLong
      val sc = rnd.nextInt(15).toLong
      val y = if (rnd.nextInt(15) < sc) 1L else 0L
      (g, sc, y)
    }
    val df = rows.toDF("seg", "score", "label")
    val sliced = RankMetrics.aucExactBy(df, Seq("seg"), "score", "label", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(4)))).toMap
    for (g <- 0L to 2L) {
      val solo = RankMetrics
        .aucExact(df.where($"seg" === g), "score", "label", 4).head()
      withClue(s"slice $g: ") {
        sliced(g) shouldBe ((solo.getLong(0), solo.getLong(1),
          Option(solo.get(3))))
      }
    }
  }

  test("o29 planted signal: purchase +50 boost puts AUC strictly above 1/2") {
    val out = graft.queries.BehaviorQueries.o29Auc
      .build(spark, "/root/testdata/sf0.001").head()
    out.getLong(3) should be > 500000L
    out.getLong(2) should be >= 0L
  }
}
