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
