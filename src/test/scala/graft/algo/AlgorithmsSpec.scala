package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import factors._

/** Unit fixtures pinning the algorithms' numeric semantics (the reference
  * pins the same behaviors in ~110 JUnit cases under
  * `wifi-positioning-service/src/test/.../algorithm/impl/`, DELTA = 0.001). */
class AlgorithmsSpec extends AnyFunSuite with Matchers {
  private val Delta = 0.001

  private def ap(mac: String, lat: Double, lon: Double,
      alt: Option[Double] = None, acc: Option[Double] = Some(10.0),
      vendor: Option[String] = None): AccessPoint =
    AccessPoint(mac, lat, lon, alt, acc, Some(1.0), vendor)

  // ---- P1 proximity -------------------------------------------------------

  test("proximity picks the strongest-signal AP") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 41.0, -74.0))
    val scans = Seq(WifiScan("aa", -80, 2437), WifiScan("bb", -55, 2437))
    val p = Proximity.calculate(scans, aps).get
    p.lat shouldBe 41.0 +- Delta
    p.lon shouldBe -74.0 +- Delta
    p.accuracy shouldBe 10.0 +- Delta
  }

  test("proximity confidence = clamp((rssi+90)/60, 0, 0.85)") {
    val aps = Seq(ap("aa", 40.0, -75.0))
    def conf(rssi: Double) =
      Proximity.calculate(Seq(WifiScan("aa", rssi, 2437)), aps).get.confidence
    conf(-60) shouldBe 0.5 +- Delta
    conf(-30) shouldBe 0.85 +- Delta // capped
    conf(-90) shouldBe 0.0 +- Delta
  }

  test("proximity returns None when the strongest AP is unknown") {
    Proximity.calculate(Seq(WifiScan("zz", -40, 2437)), Seq(ap("aa", 1, 1))) shouldBe None
  }

  // ---- P2 weighted centroid ----------------------------------------------

  test("WCL weight: 10^normalized, weaker signals weigh MORE (reference quirk)") {
    // Pinned by the reference's own tests (WeightedCentroidAlgorithmTest:238+):
    // normalized = (rssi+30)/(-70), so −30 → 0 (w=1) and −100 → 1 (w=10).
    WeightedCentroid.weightOf(-30) shouldBe 1.0 +- Delta
    WeightedCentroid.weightOf(-65) shouldBe math.pow(10, 0.5) +- Delta
    WeightedCentroid.weightOf(-100) shouldBe 10.0 +- Delta
    WeightedCentroid.weightOf(-20) shouldBe 1.0 +- Delta   // clamped
    WeightedCentroid.weightOf(-120) shouldBe 10.0 +- Delta // clamped
  }

  test("WCL equal signals give the unweighted midpoint") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 42.0, -73.0))
    val scans = Seq(WifiScan("aa", -60, 2437), WifiScan("bb", -60, 2437))
    val p = WeightedCentroid.calculate(scans, aps).get
    p.lat shouldBe 41.0 +- Delta
    p.lon shouldBe -74.0 +- Delta
    // full coverage: confidence = min(0.8, 1.0 * 0.7)
    p.confidence shouldBe 0.7 +- Delta
  }

  test("WCL altitude averages only over APs that carry one") {
    val aps = Seq(
      ap("aa", 40.0, -75.0, alt = Some(100.0)),
      ap("bb", 42.0, -73.0, alt = None))
    val scans = Seq(WifiScan("aa", -60, 2437), WifiScan("bb", -60, 2437))
    WeightedCentroid.calculate(scans, aps).get.alt shouldBe 100.0 +- Delta
  }

  test("WCL hand-computed two-AP weighting") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 41.0, -74.0))
    val scans = Seq(WifiScan("aa", -30, 2437), WifiScan("bb", -100, 2437))
    val p = WeightedCentroid.calculate(scans, aps).get
    // weights 1 (strong) and 10 (weak) → pulled toward the weak-signal AP
    p.lat shouldBe (40.0 * 1 + 41.0 * 10) / 11 +- Delta
    p.lon shouldBe (-75.0 * 1 + -74.0 * 10) / 11 +- Delta
  }

  // ---- P3 rssi ratio ------------------------------------------------------

  test("RSSI ratio interpolates toward the second AP by signal ratio") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 42.0, -73.0))
    val scans = Seq(WifiScan("aa", -50, 2437), WifiScan("bb", -70, 2437))
    val p = RssiRatio.calculate(scans, aps).get
    // ratio = 10^(20/20) = 10 → lat = (40 + 10*42)/11
    p.lat shouldBe (40.0 + 10 * 42.0) / 11 +- Delta
    p.lon shouldBe (-75.0 + 10 * -73.0) / 11 +- Delta
  }

  test("RSSI ratio needs two scans and a nonzero signal difference") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 42.0, -73.0))
    RssiRatio.calculate(Seq(WifiScan("aa", -50, 2437)), aps) shouldBe None
    // equal signals → all pair weights 0 → no position
    RssiRatio.calculate(
      Seq(WifiScan("aa", -50, 2437), WifiScan("bb", -50, 2437)), aps) shouldBe None
  }

  test("RSSI ratio strong-signal confidence floor 0.7, cap 0.85") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 42.0, -73.0))
    val strong = RssiRatio.calculate(
      Seq(WifiScan("aa", -50, 2437), WifiScan("bb", -60, 2437)), aps).get
    strong.confidence should be >= 0.7
    strong.confidence should be <= 0.85
  }

  test("RSSI ratio accuracy scales with weak signal: base × clamp((−50−avg)/10,1,3)") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 42.0, -73.0))
    val weak = RssiRatio.calculate(
      Seq(WifiScan("aa", -85, 2437), WifiScan("bb", -95, 2437)), aps).get
    weak.accuracy shouldBe 10.0 * 3.0 +- Delta // avg −90 → factor capped at 3
  }

  // ---- P4 trilateration ---------------------------------------------------

  test("trilateration distance model: clamps and monotonicity") {
    Trilateration.distanceFromRssi(-20, 2437) shouldBe 1.0 +- Delta    // clamp low
    Trilateration.distanceFromRssi(-110, 2437) shouldBe 100.0 +- Delta // clamp high
    val d65 = Trilateration.distanceFromRssi(-65, 2437)
    val d75 = Trilateration.distanceFromRssi(-75, 2437)
    d65 should be < d75
    // strong signals use exponent 2.5: d = 10^((ref+65)/25)
    val ref = -20.0 * math.log10(4.0 * math.Pi / (299792458.0 / 2.437e9))
    d65 shouldBe math.pow(10, (ref + 65) / 25.0) +- 0.01
  }

  test("trilateration locates a point inside a surrounding triangle") {
    // APs ~200 m apart around (40, -75); equal signals → near centroid.
    val aps = Seq(
      ap("aa", 40.0018, -75.0), ap("bb", 39.9991, -75.0018), ap("cc", 39.9991, -74.9982))
    val scans = Seq(
      WifiScan("aa", -70, 2437), WifiScan("bb", -70, 2437), WifiScan("cc", -70, 2437))
    val p = Trilateration.calculate(scans, aps).get
    p.lat shouldBe 40.0 +- 0.002
    p.lon shouldBe -75.0 +- 0.002
    p.confidence should (be >= 0.55 and be <= 0.85)
    p.accuracy should be >= 1.0
  }

  test("trilateration needs at least 3 known APs") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 40.001, -75.0))
    val scans = Seq(
      WifiScan("aa", -60, 2437), WifiScan("bb", -60, 2437), WifiScan("zz", -60, 2437))
    Trilateration.calculate(scans, aps) shouldBe None
  }

  test("trilateration weak signals cap confidence at 0.58") {
    val aps = Seq(
      ap("aa", 40.0018, -75.0), ap("bb", 39.9991, -75.0018), ap("cc", 39.9991, -74.9982))
    val scans = Seq(
      WifiScan("aa", -88, 2437), WifiScan("bb", -90, 2437), WifiScan("cc", -92, 2437))
    val p = Trilateration.calculate(scans, aps).get
    p.confidence should be <= 0.58
  }

  // ---- P5 log-distance ----------------------------------------------------

  test("log-distance vendor path-loss exponents with signal adjustment") {
    LogDistance.pathLossExponent(Some("ubiquiti"), -65) shouldBe 2.7 +- Delta // medium: base
    LogDistance.pathLossExponent(None, -65) shouldBe 3.0 +- Delta
    // strong −45: base − min(1, 5/5) = base − 1, floored at 2.0
    LogDistance.pathLossExponent(Some("cisco"), -45) shouldBe 2.0 +- Delta
    // weak −90: base + min(1.5, 10/5=2→1.5), capped 5.0
    LogDistance.pathLossExponent(Some("aruba"), -90) shouldBe 2.8 + 1.5 +- Delta
  }

  test("log-distance frequency reference RSSI tiers") {
    LogDistance.referenceRssi(5180) shouldBe -45.0 +- Delta
    LogDistance.referenceRssi(2437) shouldBe -40.0 +- Delta
    LogDistance.referenceRssi(900) shouldBe -43.0 +- Delta
  }

  test("log-distance distance formula composes base × shadow × environment") {
    // rssi −60 (medium): n=3.0, ref −40, σ = 5 − (20/30)*3 = 3.0, env 0.8
    val expected = math.pow(10, 20.0 / 30.0) * (1.0 + 3.0 / 10.0) * 0.8
    LogDistance.distance(-60, 2437, None) shouldBe expected +- Delta
  }

  test("log-distance positions between APs, weighted toward the closer one") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 40.01, -75.0))
    val scans = Seq(WifiScan("aa", -50, 2437), WifiScan("bb", -80, 2437))
    val p = LogDistance.calculate(scans, aps).get
    p.lat should (be > 40.0 and be < 40.01)
    p.lat should be < 40.005 // closer to the strong AP
    p.confidence should (be >= 0.6 and be <= 0.95)
  }

  // ---- P6 maximum likelihood ---------------------------------------------

  test("MLE needs at least 4 known APs") {
    val aps = Seq(ap("aa", 40.0, -75.0), ap("bb", 40.001, -75.0), ap("cc", 40.0, -75.001))
    val scans = aps.map(a => WifiScan(a.mac, -60, 2437))
    MaxLikelihood.calculate(scans, aps) shouldBe None
  }

  test("MLE refines toward the center of a symmetric square of equal signals") {
    val d = 0.0018 // ~200 m
    val aps = Seq(
      ap("aa", 40.0 + d, -75.0), ap("bb", 40.0 - d, -75.0),
      ap("cc", 40.0, -75.0 + d), ap("dd", 40.0, -75.0 - d))
    val scans = aps.map(a => WifiScan(a.mac, -65, 2437))
    val p = MaxLikelihood.calculate(scans, aps).get
    p.lat shouldBe 40.0 +- 0.001
    p.lon shouldBe -75.0 +- 0.001
    p.confidence should (be >= 0.6 and be <= 0.95)
    p.accuracy should (be >= 1.0 and be <= 25.0)
  }

  test("MLE fixpoint on the p6 symmetric cross is the center to ~1e-9 degrees") {
    // The p6_mle_fixpoint oracle relies on this bound: equal RSSI makes the
    // WCL start the center (within ulps) and the gradient cancels pairwise,
    // so the ascent must not drift. 1e-9 is 4.5 orders tighter than the
    // query's FLOOR-1e-4 mid-grid margin.
    (0 until 25).foreach { k =>
      val clat = -30.0 + k * 2.5 + 0.00005
      val clon = 10.0 + k * 3.0 + 0.00005
      val rssi = -(50 + (k * 7) % 45).toDouble
      val d = 0.015625
      val aps = Seq(
        ap("ap_n", clat + d, clon), ap("ap_s", clat - d, clon),
        ap("ap_e", clat, clon + d), ap("ap_w", clat, clon - d))
      val scans = aps.map(a => WifiScan(a.mac, rssi, 2437))
      val p = MaxLikelihood.calculate(scans, aps).get
      p.lat shouldBe clat +- 1e-9
      p.lon shouldBe clon +- 1e-9
    }
  }

  test("MLE sigma tiers 2.5 / 4.0 / 6.0") {
    MaxLikelihood.adaptiveSigma(-55) shouldBe 2.5 +- Delta
    MaxLikelihood.adaptiveSigma(-70) shouldBe 4.0 +- Delta
    MaxLikelihood.adaptiveSigma(-85) shouldBe 6.0 +- Delta
  }

  // ---- P7 GDOP ------------------------------------------------------------

  test("GDOP: symmetric geometry is excellent, collinear is degenerate") {
    val center = Array(40.0, -75.0)
    val sym = Array(
      Array(40.002, -75.0), Array(39.999, -75.002), Array(39.999, -74.998))
    val symGdop = Gdop.calculateGDOP(sym, center, includeBiasTerm = true)
    symGdop should be < 4.0

    val line = Array(
      Array(40.001, -75.0), Array(40.002, -75.0), Array(40.003, -75.0))
    Gdop.calculateGDOP(line, center, includeBiasTerm = true) shouldBe 30.0 +- Delta
  }

  test("GDOP factor step mapping into [1, 4]") {
    Gdop.calculateGDOPFactor(1.0) shouldBe 1.0 +- Delta
    Gdop.calculateGDOPFactor(3.0) shouldBe 1.25 +- Delta
    Gdop.calculateGDOPFactor(5.0) shouldBe 1.75 +- Delta
    Gdop.calculateGDOPFactor(8.0) shouldBe 3.0 +- Delta
    Gdop.calculateGDOPFactor(100.0) shouldBe 4.0 +- Delta
  }

  test("collinearity detection on member positions") {
    Gdop.isCollinear(Seq(40.0, 40.001, 40.002), Seq(-75.0, -75.0, -75.0)) shouldBe true
    Gdop.isCollinear(Seq(40.0, 40.001, 40.0), Seq(-75.0, -75.0, -74.999)) shouldBe false
  }

  // ---- P8 signal physics --------------------------------------------------

  test("signal physics: bounds and same-frequency spread rule") {
    SignalPhysics.isPhysicallyPossible(Nil) shouldBe false
    SignalPhysics.isPhysicallyPossible(Seq(WifiScan("a", -20, 2437))) shouldBe false
    SignalPhysics.isPhysicallyPossible(Seq(WifiScan("a", -105, 2437))) shouldBe false
    // strong signal present → spread must be ≤ 45 dB within the frequency
    SignalPhysics.isPhysicallyPossible(
      Seq(WifiScan("a", -40, 2437), WifiScan("b", -90, 2437))) shouldBe false
    SignalPhysics.isPhysicallyPossible(
      Seq(WifiScan("a", -40, 2437), WifiScan("b", -80, 2437))) shouldBe true
    // weak group: any spread passes
    SignalPhysics.isPhysicallyPossible(
      Seq(WifiScan("a", -55, 2437), WifiScan("b", -99, 2437))) shouldBe true
    // different frequencies are independent groups
    SignalPhysics.isPhysicallyPossible(
      Seq(WifiScan("a", -40, 2437), WifiScan("b", -95, 5180))) shouldBe true
    // explicit boundary allowance
    SignalPhysics.isPhysicallyPossible(
      Seq(WifiScan("a", -30, 2437), WifiScan("b", -100, 2437))) shouldBe true
  }

  // ---- R3 weight tables (spot checks) ------------------------------------

  test("selection-framework weight tables are wired per algorithm") {
    Proximity.apCountWeight(ApCount.Single) shouldBe 1.0
    WeightedCentroid.apCountWeight(ApCount.Single) shouldBe 0.0
    RssiRatio.apCountWeight(ApCount.Two) shouldBe 1.0
    Trilateration.apCountWeight(ApCount.Three) shouldBe 1.0
    Trilateration.geometryMultiplier(GeometricQuality.Collinear) shouldBe 0.0
    MaxLikelihood.apCountWeight(ApCount.FourPlus) shouldBe 1.0
    LogDistance.apCountWeight(ApCount.Single) shouldBe 0.4
    WeightedCentroid.distributionMultiplier(SignalDistribution.Mixed) shouldBe 1.8
  }
}
