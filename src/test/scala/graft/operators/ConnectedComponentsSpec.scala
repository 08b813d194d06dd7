package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class ConnectedComponentsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("separate components get separate min-id representatives") {
    cc(Seq((1L, 2L), (2L, 3L), (10L, 11L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
  }

  test("a long chain converges to one component (diameter rounds)") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    val got = cc(chain)
    got.values.toSet shouldBe Set(1L)
    got.keySet shouldBe (1L to 20L).toSet
  }

  test("a triangle plus pendant collapses to the smallest id") {
    cc(Seq((5L, 7L), (7L, 9L), (9L, 5L), (9L, 2L))) shouldBe
      Map(2L -> 2L, 5L -> 2L, 7L -> 2L, 9L -> 2L)
  }

  test("duplicate and reversed edges do not change the result") {
    cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("re-execution is deterministic") {
    import spark.implicits._
    val edges = (1L to 50L).flatMap(i => Seq((i, i % 10 + 100L)))
    def run() = ConnectedComponents
      .run(edges.toDF("a", "b").repartition(7), "a", "b")
      .orderBy("node").collect().map(_.toString)
    run() shouldBe run()
  }

  test("runStar agrees with min-label propagation on random graphs") {
    import spark.implicits._
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      val df = edges.toDF("a", "b").repartition(5)
      val viaLabels = ConnectedComponents.run(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // default bound → the driver union-find fast path
      val viaDriver = ConnectedComponents.runStar(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // maxDriverEdges = 0 → the distributed star loop
      val viaStars = ConnectedComponents
        .runStar(df, "a", "b", maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed $seed")(viaStars shouldBe viaLabels)
      withClue(s"seed $seed driver path")(viaDriver shouldBe viaLabels)
    }
  }

  test("runStar driver fast path engages under the bound, not above it") {
    import spark.implicits._
    val chain = (1L until 32L).map(i => (i, i + 1)).toDF("a", "b")
    // under the bound: 0 rounds — the union-find path labeled everything
    val (viaDriver, r0) =
      ConnectedComponents.runStarCounted(chain, "a", "b")
    r0 shouldBe 0
    // a bound smaller than the edge count: the star loop must run
    val (viaStars, r1) = ConnectedComponents
      .runStarCounted(chain, "a", "b", maxDriverEdges = 10)
    r1 should be > 0
    val d = viaDriver.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = viaStars.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    d shouldBe s
    d.values.toSet shouldBe Set(1L)
  }

  test("runStar collapses a long chain in far fewer than diameter rounds") {
    import spark.implicits._
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    // maxRounds 12 << diameter 63: only the O(log n) algorithm fits
    // (maxDriverEdges 0 forces the distributed loop this gate exists for)
    val got = ConnectedComponents
      .runStar(chain, "a", "b", maxRounds = 12, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.values.toSet shouldBe Set(1L)
    got.keySet shouldBe (1L to 64L).toSet
  }

  test("runStar round count is logarithmic in the chain length") {
    import spark.implicits._
    // the llm_dup_chain_clusters shape: drift chains whose diameter grows
    // with the corpus. The paper's bound is O(log n) alternating rounds;
    // assert ceil(log2(n)) + 3 so a regression to per-hop propagation
    // (O(n) rounds) can never slip through. maxDriverEdges 0 keeps the
    // gate on the DISTRIBUTED loop (the default would probe these small
    // chains onto the driver and report 0 rounds).
    for (n <- Seq(64L, 256L, 512L)) {
      val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b").repartition(5)
      val (labels, rounds) = ConnectedComponents
        .runStarCounted(chain, "a", "b", maxDriverEdges = 0)
      val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 3
      withClue(s"chain of $n: $rounds rounds vs bound $bound")(
        rounds should be <= bound)
      labels.collect().map(_.getLong(1)).toSet shouldBe Set(1L)
    }
  }

  test("runStar collapses a 10k-node path graph in ~log2(n) rounds") {
    import spark.implicits._
    // the adversarial shape for any propagation scheme: diameter 9999.
    // Min-label would need 10k rounds; the star bound is ceil(log2(10000))
    // = 14 plus slack for the alternation pattern.
    val n = 10000L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b").repartition(8)
    val (labels, rounds) = ConnectedComponents
      .runStarCounted(chain, "a", "b", maxDriverEdges = 0)
    val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 3
    withClue(s"10k chain: $rounds rounds vs bound $bound")(
      rounds should be <= bound)
    val got = labels.collect()
    got.length shouldBe n
    got.map(_.getLong(1)).toSet shouldBe Set(1L)
  }

  test("runStar on an empty edge list yields an empty labeling") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    ConnectedComponents.runStar(empty, "a", "b").count() shouldBe 0L
  }

  test("an empty edge list yields an empty labeling, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    ConnectedComponents.run(empty, "a", "b").count() shouldBe 0L
  }

  test("exceeding the iteration cap fails loudly, not silently wrong") {
    import spark.implicits._
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.run(chain, "a", "b", maxIterations = 2)
    }
    ex.getMessage should include("did not converge")
  }
}
