package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The distributed-correctness contract of the typed UDAF: reduce folded in
  * any split/order must agree with the serial fold (the property Spark's
  * partial aggregation relies on, and the property the oracle gate checks
  * cross-engine). Deterministic pseudo-random cases, no RNG state. */
class WclAggregatorSpec extends AnyFunSuite with Matchers {

  private def in(i: Int): WclIn =
    WclIn((i * 2654435761L) % 90000000L, (i * 40503L) % 180000000L, (i % 3) + 2L)

  test("merge is associative and commutative; any partitioning = serial fold") {
    val xs = (1 to 200).map(in)
    val serial = xs.foldLeft(WclAggregator.zero)(WclAggregator.reduce)
    for (split <- Seq(1, 7, 50, 199)) {
      val parts = xs.grouped(split).toSeq
        .map(_.foldLeft(WclAggregator.zero)(WclAggregator.reduce))
      val merged = parts.foldLeft(WclAggregator.zero)(WclAggregator.merge)
      merged shouldBe serial
      val mergedRev = parts.reverse.foldLeft(WclAggregator.zero)(WclAggregator.merge)
      mergedRev shouldBe serial
    }
    WclAggregator.merge(serial, WclAggregator.zero) shouldBe serial
  }

  test("finish floors the weighted mean and zero weight yields the zero point") {
    WclAggregator.finish(WclBuf(10L, 20L, 3L)) shouldBe WclOut(3L, 6L, 3L)
    WclAggregator.finish(WclAggregator.zero) shouldBe WclOut(0L, 0L, 0L)
  }
}
