package graft.localize

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DBSCAN bi-modality vs pure change-point detection (PAPER.md:71-77): the
  * clusters' TEMPORAL structure is what separates "the AP moved" from "the
  * AP's fixes alternate between two anchors". */
class RelocationSpec extends AnyFunSuite with Matchers {

  private val A = (40.0, -75.0)
  private val B = (40.0045, -75.0) // ~500 m north of A

  /** ~30 m deterministic jitter inside one anchor's cluster. */
  private def jitter(base: (Double, Double), k: Int): (Double, Double) =
    (base._1 + (k % 5) * 0.00006, base._2 + (k % 7) * 0.00006)

  test("true relocation: time-disjoint clusters → Relocated, ordered old→new") {
    val fixes = (0 until 30).map { k =>
      val (la, lo) = jitter(A, k); Relocation.Fix(la, lo, 1000L * k)
    } ++ (0 until 30).map { k =>
      val (la, lo) = jitter(B, k); Relocation.Fix(la, lo, 1000L * (100 + k))
    }
    val out = Relocation.analyze(fixes)
    out.verdict match {
      case Relocation.Relocated(fromIdx, toIdx) =>
        // the "from" cluster must be anchor A (earlier median time)
        val from = out.clusters(fromIdx)
        val to = out.clusters(toIdx)
        from.map(_.lat).sum / from.size shouldBe A._1 +- 0.001
        to.map(_.lat).sum / to.size shouldBe B._1 +- 0.001
      case v => fail(s"expected Relocated, got $v")
    }
  }

  test("bimodal AP: interleaved clusters → Bimodal, even though CUSUM fires") {
    // fixes alternate anchors every sample — the AP never moved, its signal
    // reflects between two mounting points / reused MACs.
    val fixes = (0 until 60).map { k =>
      val (la, lo) = jitter(if (k % 2 == 0) A else B, k)
      Relocation.Fix(la, lo, 1000L * k)
    }
    Relocation.analyze(fixes).verdict shouldBe Relocation.Bimodal

    // the lag-jump detector alone (a11's consecutive-displacement trigger)
    // DOES fire on this series — every step jumps ~500 m — which is exactly
    // the mislabel the temporal clustering corrects.
    val lagJumps = fixes.sliding(2).count {
      case Seq(p, q) =>
        graft.algo.AlgoUtil.distanceMeters(p.lat, p.lon, None, q.lat, q.lon, None) > 300.0
      case _ => false
    }
    lagJumps should be > 50
  }

  test("single cluster (+ stray noise) → Stationary") {
    val fixes = (0 until 40).map { k =>
      val (la, lo) = jitter(A, k); Relocation.Fix(la, lo, 1000L * k)
    } :+ Relocation.Fix(41.0, -76.0, 999000L) // lone far fix = noise
    val out = Relocation.analyze(fixes)
    out.verdict shouldBe Relocation.Stationary
    out.noise should have size 1
  }

  test("dbscan: eps-chained points merge into one cluster, sparse points are noise") {
    // 20 points in a 60 m-spaced line: consecutive gaps < eps → one cluster.
    val line = (0 until 20).map(k => Relocation.Fix(40.0 + k * 0.00054, -75.0, k.toLong))
    val (clusters, noise) = Relocation.dbscan(line.toIndexedSeq, 150.0, 3)
    clusters should have size 1
    clusters.head should have size 20
    noise shouldBe empty

    // same points 300 m apart: nobody reaches minPts → all noise.
    val sparse = (0 until 10).map(k => Relocation.Fix(40.0 + k * 0.0027, -75.0, k.toLong))
    val (c2, n2) = Relocation.dbscan(sparse.toIndexedSeq, 150.0, 3)
    c2 shouldBe empty
    n2 should have size 10
  }

  test("dbscan handles longitude shrink at high latitude (cos scaling)") {
    // at lat 60 a degree of longitude is ~55.7 km, so 0.00216° ≈ 120 m —
    // within eps, but 1.6 naive lon-cells apart; without cos scaling the
    // chain fragments into noise.
    val highLat = (0 until 10).map(k => Relocation.Fix(60.0, k * 0.00216, k.toLong))
    val (clusters, noise) = Relocation.dbscan(highLat.toIndexedSeq, 150.0, 3)
    clusters should have size 1
    clusters.head should have size 10
    noise shouldBe empty
  }
}
