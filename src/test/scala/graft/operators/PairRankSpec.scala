package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The suffix-array doubling primitive at the scale its docstring
  * advertises: PairRank must stay injective where the packed composite
  * `keyA * domain + keyB` it replaced wraps BIGINT (domain ≳ 3.04e9 —
  * the o63 overflow class, silent with ANSI off). Pinned the
  * PettittOverflowSpec way: exact expected ranks from driver-side
  * arithmetic, plus a regression witness that the old pack really would
  * have collided on these inputs. */
class PairRankSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def rankOf(rows: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    PairRank.ofDistinct(rows.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("dense lexicographic bijection on an in-range random domain") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextLong() % 50))
    val got = rankOf(rows ++ rows) // duplicates must collapse, not shift
    val expect = rows.distinct.sorted.zipWithIndex
      .map { case (p, i) => p -> i.toLong }.toMap
    got shouldBe expect
  }

  test("beyond the packing bound: ranks stay injective where keyA*domain+keyB wraps") {
    // a rank domain past 2^33 puts keyA * domain beyond 2^64: with
    // d = 2^33 + 3, (2^31)·d = 2^64 + 3·2^31 ≡ 3·2^31 (mod 2^64), so the
    // two IN-DOMAIN pairs below pack to the same wrapped composite
    val d = (1L << 33) + 3L // the pack's "rankDomain" for this key set
    val collide = Seq((1L << 31, 0L), (0L, 3L * (1L << 31)))
    // regression witness: the packed composites really are equal after wrap
    val packed = collide.map { case (a, b) => a * d + b } // overflows silently
    packed.distinct should have size 1
    val rows = collide ++ Seq((0L, -42L), (0L, 7L), (d - 1L, -1L), (d - 3L, 5L))
    val got = rankOf(rows)
    got.values.toSeq.distinct should have size rows.distinct.size
    val expect = rows.distinct.sorted.zipWithIndex
      .map { case (p, i) => p -> i.toLong }.toMap
    got shouldBe expect
  }

  test("negative keyB (frozen suffix ids / sentinels) order below non-negative") {
    val rows = Seq((2L, Long.MinValue), (2L, -9L), (2L, 0L), (1L, 3L))
    rankOf(rows) shouldBe Map(
      (1L, 3L) -> 0L, (2L, Long.MinValue) -> 1L, (2L, -9L) -> 2L, (2L, 0L) -> 3L)
  }

  test("empty input yields an empty ranking, no NPE on the domain probe") {
    rankOf(Seq.empty) shouldBe Map.empty
  }

  test("skew probe: a group past the bound fails loudly, naming the salt") {
    // the one skew point of the split construction: keyA group 7 keeps
    // more distinct keyBs than the configured bound — the probe must
    // refuse (one serialized window task at corpus scale) instead of
    // silently straggling, and the message must name the mitigation
    import spark.implicits._
    val skewed = (0L until 64L).map(b => (7L, b)) :+ (1L, 5L)
    spark.conf.set("spark.graft.pairrank.maxGroup", "16")
    try {
      val ex = intercept[IllegalArgumentException] {
        PairRank.ofDistinct(skewed.toDF("a", "b"), "a", "b").collect()
      }
      ex.getMessage should include("salt")
      ex.getMessage should include("spark.graft.pairrank.maxGroup")
      // same frame under the default bound ranks fine
      spark.conf.unset("spark.graft.pairrank.maxGroup")
      rankOf(skewed) shouldBe skewed.sorted.zipWithIndex
        .map { case (p, i) => p -> i.toLong }.toMap
    } finally spark.conf.unset("spark.graft.pairrank.maxGroup")
  }

  test("equivalence: split rank == the packed-cumsum fast path inside its domain bound") {
    // the suffix doubling round uses the packed composite while
    // rankDomain² < 2^63 and PairRank beyond — both are the dense 0-based
    // lexicographic rank of the distinct pairs, so switching paths can
    // never change a rank value, only survive a bigger domain
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(800)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong - 1L))
    val domain = rows.map(_._1).max + 2L
    val packed = PrefixSum.globalCumsum(
      rows.toDF("a", "b").select((col("a") * domain + col("b") + lit(1L)).as("ck"))
        .distinct().withColumn("one", lit(1L)),
      "ck", "one", bucketWidth = domain * 64L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val split = rankOf(rows)
    split.foreach { case ((a, b), rk) =>
      withClue(s"pair ($a,$b)")(packed(a * domain + b + 1L) shouldBe rk)
    }
  }
}
