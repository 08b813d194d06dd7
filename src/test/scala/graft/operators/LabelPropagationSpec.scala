package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class LabelPropagationSpec extends AnyFunSuite with Matchers with SparkSuite {

  /** undirected edge list → (node → label) after `iters` rounds */
  private def lpa(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    val sym = (pairs ++ pairs.map(_.swap)).distinct.toDF("u", "v")
    LabelPropagation.run(nodes, sym, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques with one bridge settle into two communities") {
    val k1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val k2 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val got = lpa(k1 ++ k2 ++ Seq((3L, 10L)), 4)
    // each clique settles on ONE internal label, and the two communities
    // stay distinct — the single bridge cannot outvote two intra-clique
    // neighbors (the exact label ids depend on the synchronous dynamics:
    // min-tie-breaking drags small labels across the bridge, so clique B
    // ends labeled 3, not 10)
    Set(got(1L), got(2L), got(3L)).size shouldBe 1
    Set(got(10L), got(11L), got(12L)).size shouldBe 1
    got(1L) should not be got(10L)
  }

  test("all-tie star adopts the minimum neighbor label (determinism)") {
    // center 5 sees neighbors {2, 7, 9} each once: tie → min label 2
    val got = lpa(Seq((5L, 2L), (5L, 7L), (5L, 9L)), 1)
    got(5L) shouldBe 2L
    // leaves see only the center
    got(2L) shouldBe 5L
    got(7L) shouldBe 5L
    got(9L) shouldBe 5L
  }

  test("one round on a path propagates the smaller neighbor label") {
    val got = lpa(Seq((1L, 2L), (2L, 3L)), 1)
    got shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 2L)
  }
}
