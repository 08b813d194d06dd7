package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Re-execution determinism gate: the driver's correctness harness hashes
  * row values, so ANY run-to-run wobble (shuffle fetch order feeding float
  * accumulation, arbitrary tie-breaks, uncapped collect_list order) fails a
  * round even when the math is right. The per-group/per-window paths are the
  * risky ones — run each twice and require identical results. */
class DeterminismSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val risky = Seq(
    CoreQueries.o6Dedup,           // row_number tie-breaking
    CoreQueries.o3MaxBy,           // max(struct) under ties
    CoreQueries.a9MadOutliers,     // double percentile + joins
    CoreQueries.p2WeightedCentroid // float sums over shuffled input
  )

  risky.foreach { q =>
    test(s"${q.name} returns identical rows on re-execution") {
      val a = q.build(spark, sfDir).collect().map(_.toString)
      val b = q.build(spark, sfDir).collect().map(_.toString)
      a shouldBe b
    }
  }

  test("batch localizer is re-execution deterministic") {
    val l1 = graft.queries.LocalizeQueries.batchLocalize.build(spark, sfDir)
      .collect().map(_.toString)
    val l2 = graft.queries.LocalizeQueries.batchLocalize.build(spark, sfDir)
      .collect().map(_.toString)
    l1 shouldBe l2
  }

  test("request scorer is re-execution deterministic") {
    val s1 = graft.queries.ServeQueries.batchScoring.build(spark, sfDir)
      .collect().map(_.toString)
    val s2 = graft.queries.ServeQueries.batchScoring.build(spark, sfDir)
      .collect().map(_.toString)
    s1 shouldBe s2
  }
}
