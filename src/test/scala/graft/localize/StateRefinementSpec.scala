package graft.localize

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.localize.StateRefinement._

class StateRefinementSpec extends AnyFunSuite with Matchers {

  test("Kalman fuse: posterior between prior and estimate, variance shrinks") {
    // σ=20 m each → combined σ≈28 m, 3σ≈85 m; ~43 m innovation fuses.
    val prior = initial("ap", Estimate(40.0, -75.0, varianceM2 = 400.0, n = 30))
    val r = update(prior, Estimate(40.0, -74.9995, varianceM2 = 400.0, n = 30))
    r.relocated shouldBe false
    r.state.lon should (be > -75.0 and be < -74.9995)
    r.state.varianceM2 shouldBe 200.0 +- 1e-9 // (1-K)P with K=0.5
    r.state.n shouldBe 60
    r.innovationM shouldBe 42.6 +- 1.0 // 0.0005° lon at 40N ≈ 43 m
  }

  test("confident prior moves less than uncertain prior") {
    // ~17 m innovation: inside 3σ for both prior confidences.
    val est = Estimate(40.0, -74.9998, varianceM2 = 100.0, n = 10)
    val confident = update(initial("a", Estimate(40, -75, 10.0, 50)), est).state
    val uncertain = update(initial("a", Estimate(40, -75, 400.0, 50)), est).state
    math.abs(confident.lon - (-75.0)) should be < math.abs(uncertain.lon - (-75.0))
  }

  test("large innovation triggers relocation reset, not fusion") {
    val prior = initial("ap", Estimate(40.0, -75.0, varianceM2 = 25.0, n = 200))
    // new estimate ~8.5 km away with tight covariance → > 3σ of √(25+25)
    val r = update(prior, Estimate(40.0, -74.9, varianceM2 = 25.0, n = 40))
    r.relocated shouldBe true
    r.state.lat shouldBe 40.0
    r.state.lon shouldBe -74.9 // reset to the new estimate
    r.state.relocations shouldBe 1
    r.state.n shouldBe 40 // evidence restarts after relocation
  }

  test("anisotropic prior: loose axis moves more, tight axis stays tight") {
    // street-constrained AP: σ=5 m across (lat), σ=50 m along (lon)
    val prior = ApState("ap", 40.0, -75.0, 25.0, 2500.0, 0.0, 100L)
    val dLat = 30.0 / MetersPerDegLat
    val dLon = 30.0 / (MetersPerDegLat * math.cos(math.toRadians(40.0)))
    val r = update(prior, Estimate(40.0 + dLat, -75.0 + dLon, 100.0, 30))
    r.relocated shouldBe false
    val movedLatM = (r.state.lat - 40.0) * MetersPerDegLat
    val movedLonM =
      (r.state.lon + 75.0) * MetersPerDegLat * math.cos(math.toRadians(40.0))
    movedLatM shouldBe 30.0 * 25.0 / 125.0 +- 0.1       // K_lat = 0.2
    movedLonM shouldBe 30.0 * 2500.0 / 2600.0 +- 0.2    // K_lon ≈ 0.96
    r.state.pLatM2 shouldBe 25.0 * 100.0 / 125.0 +- 1e-6   // P·R/S = 20
    r.state.pLonM2 shouldBe 2500.0 * 100.0 / 2600.0 +- 1e-6
    r.state.pCovM2 shouldBe 0.0 +- 1e-9
    // the isotropic filter CANNOT produce this: it would shrink the
    // cross-street variance with the same gain as the along-street one
    r.state.pLatM2 should be < r.state.pLonM2
  }

  test("cross-covariance steers the correction into the correlated direction") {
    // prior uncertainty concentrated along the NE diagonal (cov > 0);
    // a purely-east innovation must drag the state north as well
    val prior = ApState("ap", 0.0, 0.0, 1000.0, 1000.0, 900.0, 50L)
    val dLon = 50.0 / MetersPerDegLat // cos(0) = 1
    val r = update(prior, Estimate(0.0, dLon, 100.0, 10))
    r.relocated shouldBe false
    (r.state.lat > 0.0) shouldBe true
    (r.state.lon > 0.0) shouldBe true
    // posterior stays symmetric-PD: |cov| < sqrt(varLat·varLon)
    math.abs(r.state.pCovM2) should be <
      math.sqrt(r.state.pLatM2 * r.state.pLonM2)
  }

  test("isotropic inputs reduce exactly to the scalar filter") {
    val prior = initial("ap", Estimate(40.0, -75.0, 400.0, 30))
    val r = update(prior, Estimate(40.0, -74.9995, 400.0, 30))
    r.state.pLatM2 shouldBe r.state.pLonM2 +- 1e-9
    r.state.pCovM2 shouldBe 0.0 +- 1e-9
    r.state.varianceM2 shouldBe 200.0 +- 1e-9
  }

  test("RSSI denoising: variance shrinks, mean tracked, steps followed with lag") {
    // noisy flat series around -60: smoothed variance well below raw
    val noisy = (0 until 60).map(i => -60.0 + (if (i % 2 == 0) 4.0 else -4.0))
    val smooth = denoiseRssi(noisy)
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size; xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    variance(smooth.drop(10)) should be < variance(noisy.drop(10)) / 4
    smooth.last shouldBe -60.0 +- 2.0
    // a genuine level step is followed (with lag), not suppressed
    val stepped = Seq.fill(30)(-60.0) ++ Seq.fill(30)(-75.0)
    denoiseRssi(stepped).last shouldBe -75.0 +- 2.0
    denoiseRssi(Nil) shouldBe Nil
  }

  test("CUSUM flags a level shift and ignores noise within drift") {
    val flat = Seq.fill(30)(10.0)
    cusumChangePoints(flat, threshold = 20.0, drift = 1.0) shouldBe Nil
    val shifted = Seq.fill(20)(10.0) ++ Seq.fill(20)(25.0)
    val cps = cusumChangePoints(shifted, threshold = 20.0, drift = 1.0)
    cps should not be empty
    cps.head should (be >= 20 and be <= 24) // detected shortly after the shift
    // small zero-mean noise below drift: no detections
    val noisy = (0 until 40).map(i => 10.0 + (if (i % 2 == 0) 0.5 else -0.5))
    cusumChangePoints(noisy, threshold = 20.0, drift = 1.0) shouldBe Nil
  }
}
