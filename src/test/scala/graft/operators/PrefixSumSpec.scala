package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class PrefixSumSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("globalCumsum == serial scan for every bucketing, keys sparse and dense") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // sparse non-contiguous keys: buckets have uneven populations
    val rows = (0 until 500)
      .map(i => (i.toLong * 3 + (i % 2), rnd.nextInt(100).toLong))
    var running = 0L
    val expected = rows.sortBy(_._1).map { case (k, v) =>
      val r = k -> running; running += v; r
    }.toMap
    // width 1 (bucket per key), width > domain (single bucket), and middles
    for (width <- Seq(1L, 7L, 64L, 10000L)) {
      val got = PrefixSum
        .globalCumsum(rows.toDF("k", "v"), "k", "v", bucketWidth = width)
        .select("k", "cum_before").as[(Long, Long)].collect().toMap
      withClue(s"bucketWidth=$width") {
        got shouldBe expected
      }
    }
  }

  test("cum_before of the smallest key is zero; total order is strict") {
    import spark.implicits._
    val df = Seq((10L, 5L), (20L, 7L), (30L, 1L)).toDF("k", "v")
    val got = PrefixSum.globalCumsum(df, "k", "v", 8L)
      .orderBy("k").select("cum_before").as[Long].collect()
    got shouldBe Array(0L, 5L, 12L)
  }
}
