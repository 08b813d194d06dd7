package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class LinkRankSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def rank(
      edges: Seq[(Long, Long)],
      iterations: Int = 5,
      maxDriverEdges: Int = 2000000): Map[Long, Long] = {
    import spark.implicits._
    LinkRank.run(edges.toDF("src", "dst").repartition(5), "src", "dst",
      iterations, maxDriverEdges = maxDriverEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** The operator's integer recurrence restated as driver-side loops —
    * an independent single-threaded oracle for exact comparison. */
  private def reference(
      edges: Seq[(Long, Long)],
      iterations: Int,
      scale: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges
        .map { case (s, d) => d -> r(s) / odeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(n => n -> (150000000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("a regular graph has uniform rank (one ulp below the scale)") {
    // ring with tripled edges: every node has out-degree 3 and in-degree 3
    val n = 12L
    val edges = (0L until n).flatMap(i => Seq.fill(3)((i, (i + 1) % n)))
    val got = rank(edges)
    got.values.toSet shouldBe Set(999999999L)
    got.keySet shouldBe (0L until n).toSet
  }

  test("a star graph concentrates rank on the hub") {
    // leaves 1..9 -> hub 0; hub -> leaf 1 (no dangling nodes)
    val edges = (1L to 9L).map(i => (i, 0L)) :+ ((0L, 1L))
    val got = rank(edges)
    got shouldBe reference(edges, 5)
    got(0L) should be > got(2L)
    got(1L) should be > got(2L) // leaf 1 receives the hub's whole mass
  }

  test("matches the driver-side recurrence exactly on random graphs") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 120).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      // default bound → driver fast path; 0 → the distributed loop.
      // Both must reproduce the integer recurrence bit-exactly.
      withClue(s"seed $seed")(rank(edges) shouldBe reference(edges, 5))
      withClue(s"seed $seed distributed")(
        rank(edges, maxDriverEdges = 0) shouldBe reference(edges, 5))
    }
  }

  test("driver fast path engages under the bound, distributed above it") {
    val edges = (0L until 40L).map(i => (i, (i + 1) % 40L))
    val viaDriver = rank(edges)
    val viaDist = rank(edges, maxDriverEdges = 10) // bound < |E| → loop
    viaDriver shouldBe viaDist
    viaDriver shouldBe reference(edges, 5)
  }

  test("multi-edges count toward out-degree and contribution") {
    // 1 -> 2 twice and 1 -> 3 once: node 2 gets 2/3 of node 1's mass
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = rank(edges)
    got shouldBe reference(edges, 5)
    got(2L) should be > got(3L)
  }

  test("sink-only nodes keep the teleport floor") {
    val edges = Seq((1L, 2L)) // node 2 never contributes back
    val got = rank(edges, iterations = 3)
    got shouldBe reference(edges, 3)
    got(1L) shouldBe 150000000L
  }

  test("re-execution is deterministic") {
    val rnd = new scala.util.Random(41)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    rank(edges) shouldBe rank(edges)
  }
}
