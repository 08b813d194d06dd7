package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.algo._
import graft.localize.StateRefinement

/** Property-based invariants over the pure-Scala core: things that must
  * hold for ANY input, not just the curated fixtures. (Raw ScalaCheck —
  * sbt runs the framework natively alongside ScalaTest.) */
object PropertySpec extends Properties("graft") {

  private val rssiGen = Gen.choose(-100.0, -30.0)
  private val latGen = Gen.choose(-85.0, 85.0)
  private val lonGen = Gen.choose(-175.0, 175.0)

  property("haversine symmetric, bounded, zero at identity") =
    forAll(latGen, lonGen, latGen, lonGen) { (a1, o1, a2, o2) =>
      val d = AlgoUtil.distanceMeters(a1, o1, None, a2, o2, None)
      val back = AlgoUtil.distanceMeters(a2, o2, None, a1, o1, None)
      val self = AlgoUtil.distanceMeters(a1, o1, None, a1, o1, None)
      d >= 0.0 && math.abs(d - back) < 1e-6 && d <= 2.1e7 && self < 1e-6
    }

  property("WCL inside AP bounding box; confidence in [0, 0.8]") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.zip(latGen, lonGen), rssiGen)).map(_.take(8))) {
      entries =>
        val aps = entries.zipWithIndex.map { case (((lat, lon), _), i) =>
          AccessPoint(s"m$i", lat, lon, None, Some(10.0), Some(0.9))
        }
        val scans = entries.zipWithIndex.map { case ((_, rssi), i) =>
          WifiScan(s"m$i", rssi, 2437)
        }
        val p = WeightedCentroid.calculate(scans, aps).get
        p.lat >= aps.map(_.lat).min - 1e-9 && p.lat <= aps.map(_.lat).max + 1e-9 &&
          p.lon >= aps.map(_.lon).min - 1e-9 && p.lon <= aps.map(_.lon).max + 1e-9 &&
          p.confidence >= 0.0 && p.confidence <= 0.8
    }

  property("GDOP factor monotone and bounded in [1, 4]") =
    forAll(Gen.choose(0.0, 100.0), Gen.choose(0.0, 100.0)) { (g1, g2) =>
      val (lo, hi) = (math.min(g1, g2), math.max(g1, g2))
      val (f1, f2) = (Gdop.calculateGDOPFactor(lo), Gdop.calculateGDOPFactor(hi))
      f1 <= f2 && f1 >= 1.0 && f2 <= 4.0
    }

  property("physics validator passes any all-weak scan set") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, -51.0)).map(_.take(10))) { rssis =>
      val scans = rssis.zipWithIndex.map { case (r, i) => WifiScan(s"m$i", r, 2437) }
      SignalPhysics.isPhysicallyPossible(scans)
    }

  property("Kalman fuse: variance contracts, mean stays between") =
    forAll(Gen.choose(1.0, 1000.0), Gen.choose(1.0, 1000.0),
      Gen.choose(-0.0005, 0.0005)) { (pVar, eVar, dLon) =>
      val prior = StateRefinement.initial("a",
        StateRefinement.Estimate(40.0, -75.0, pVar, 10))
      val r = StateRefinement.update(prior,
        StateRefinement.Estimate(40.0, -75.0 + dLon, eVar, 10))
      r.relocated || (
        r.state.varianceM2 <= pVar + 1e-12 &&
          r.state.lon >= math.min(-75.0, -75.0 + dLon) - 1e-12 &&
          r.state.lon <= math.max(-75.0, -75.0 + dLon) + 1e-12)
    }

  property("RSSI denoiser: length preserved, outputs within input range") =
    forAll(Gen.nonEmptyListOf(rssiGen).map(_.take(50))) { series =>
      val out = StateRefinement.denoiseRssi(series)
      out.length == series.length &&
        out.forall(v => v >= series.min - 1e-9 && v <= series.max + 1e-9)
    }

  property("repetition metrics bounded; all-distinct and all-same extremes exact") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.take(40))) { ws =>
      (ws.size >= 2) ==> {
        val text = ws.mkString(" ")
        val Some((dw, dg, tg)) = graft.llm.TextAnalysis.repetitionMetrics(text)
        // tg can exceed 1.0 on degenerate repeats (overlapping gram
        // occurrences) — that is the real Gopher metric's behavior too;
        // larger only ever means "worse", which is all the filter needs.
        val bounded = dw >= 0.0 && dw < 1.0 && dg >= 0.0 && dg < 1.0 && tg > 0.0
        val distinctExact =
          if (ws.distinct.size == ws.size) dw == 0.0 else true
        val allSameExact =
          if (ws.distinct.size == 1) {
            val gramChars = 2 * ws.head.length + 1
            dw == 1.0 - 1.0 / ws.size && dg == 1.0 - 1.0 / (ws.size - 1) &&
            tg == (ws.size - 1).toDouble * gramChars.toDouble / text.length.toDouble
          } else true
        bounded && distinctExact && allSameExact
      }
    }

  property("CUSUM never fires on a constant series") =
    forAll(Gen.choose(-100.0, 100.0), Gen.choose(2, 60)) { (level, n) =>
      StateRefinement.cusumChangePoints(
        Seq.fill(n)(level), threshold = 5.0, drift = 0.5).isEmpty
    }

  property("minhash hash family: deterministic, and k members are pairwise distinct") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      import graft.llm.MinHash.{baseHash, familyMember}
      val base = baseHash(s)
      val members = (0 until 32).map(familyMember(base, _))
      // pure function (same input → same members) and no family collision —
      // a degenerate mixer collapsing members would destroy minhash's
      // independent-permutation assumption
      members == (0 until 32).map(familyMember(base, _)) &&
        members.distinct.size == 32
    }

  property("combiner accuracy non-negative and >= 6 m when collinear") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1.0, 100.0)).map(_.take(6)),
      Gen.choose(1.0, 4.0), Gen.oneOf(true, false)) { (accs, factor, collinear) =>
      val adj = Combiner.adjustedAccuracy(accs, factor, cond = 25.0, collinear = collinear)
      adj >= 0.0 && (!collinear || adj >= 6.0)
    }
}
