package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import factors._

/** Pins the R1–R6 rule-engine semantics (reference suites:
  * `AlgorithmSelectorTest.java`, `SelectionContextBuilderTest.java`,
  * `WeightedAveragePositionCombinerTest.java`). */
class SelectionSpec extends AnyFunSuite with Matchers {
  private val Delta = 0.001

  private def ap(mac: String, lat: Double, lon: Double): AccessPoint =
    AccessPoint(mac, lat, lon, None, Some(10.0), Some(0.9))

  private def ctx(
      n: ApCount = ApCount.FourPlus,
      sq: SignalQuality = SignalQuality.Strong,
      sd: SignalDistribution = SignalDistribution.Uniform,
      gq: GeometricQuality = GeometricQuality.Good) =
    Selector.SelectionContext(n, sq, sd, gq)

  // ---- R1 context factors -------------------------------------------------

  test("signal quality tiers at -70/-85/-95") {
    SignalQuality.of(-65) shouldBe SignalQuality.Strong
    SignalQuality.of(-70) shouldBe SignalQuality.Strong
    SignalQuality.of(-80) shouldBe SignalQuality.Medium
    SignalQuality.of(-90) shouldBe SignalQuality.Weak
    SignalQuality.of(-96) shouldBe SignalQuality.VeryWeak
  }

  test("signal distribution tiers at stddev 3/10") {
    SignalDistribution.of(2.0) shouldBe SignalDistribution.Uniform
    SignalDistribution.of(5.0) shouldBe SignalDistribution.Mixed
    SignalDistribution.of(12.0) shouldBe SignalDistribution.Outliers
  }

  test("context: fewer than 3 located APs is Poor geometry; collinear detected") {
    val twoAps = Map("a" -> ap("a", 40, -75), "b" -> ap("b", 40.001, -75))
    val scans2 = Seq(WifiScan("a", -60, 2437), WifiScan("b", -62, 2437))
    Selector.buildContext(scans2, twoAps).geometricQuality shouldBe GeometricQuality.Poor

    val lineAps = Map(
      "a" -> ap("a", 40.000, -75), "b" -> ap("b", 40.001, -75), "c" -> ap("c", 40.002, -75))
    val scans3 = lineAps.keys.map(m => WifiScan(m, -60, 2437)).toSeq
    Selector.buildContext(scans3, lineAps).geometricQuality shouldBe GeometricQuality.Collinear
  }

  // ---- R2 hard constraints ------------------------------------------------

  test("very weak signals leave only proximity") {
    Selector.hardConstraints(ctx(sq = SignalQuality.VeryWeak)) shouldBe Seq(Proximity)
  }

  test("AP-count ladder: 1 → {proximity, log-distance}; 2 adds ratio+centroid; 3 all but MLE; 4+ all") {
    Selector.hardConstraints(ctx(n = ApCount.Single)).map(_.name).toSet shouldBe
      Set("proximity", "log_distance_path_loss")
    Selector.hardConstraints(ctx(n = ApCount.Two)).map(_.name).toSet shouldBe
      Set("proximity", "rssi_ratio", "weighted_centroid", "log_distance_path_loss")
    Selector.hardConstraints(ctx(n = ApCount.Three)).map(_.name).toSet shouldBe
      Set("proximity", "rssi_ratio", "weighted_centroid", "log_distance_path_loss", "trilateration")
    Selector.hardConstraints(ctx(n = ApCount.FourPlus)).map(_.name).size shouldBe 6
  }

  test("collinear or poor geometry disqualifies trilateration") {
    Selector.hardConstraints(ctx(gq = GeometricQuality.Collinear))
      .map(_.name) should not contain "trilateration"
    Selector.hardConstraints(ctx(gq = GeometricQuality.Poor))
      .map(_.name) should not contain "trilateration"
  }

  // ---- R3 weighting + R4 finalists ---------------------------------------

  test("weight = base × signal × geometric × distribution") {
    val selected = Selector.select(ctx(n = ApCount.Three, sq = SignalQuality.Strong,
      sd = SignalDistribution.Uniform, gq = GeometricQuality.Excellent))
    val tri = selected.find(_.algorithm.name == "trilateration").get
    // base 1.0 × strong 1.1 × excellent 1.3 × uniform 1.1
    tri.weight shouldBe 1.0 * 1.1 * 1.3 * 1.1 +- Delta
  }

  test("finalists: top weight > 0.8 keeps top 2; weights < 0.4 dropped") {
    val selected = Selector.select(ctx(n = ApCount.Three, sq = SignalQuality.Strong,
      sd = SignalDistribution.Uniform, gq = GeometricQuality.Excellent))
    selected.size shouldBe 2 // trilateration 1.573 > 0.8 → top-2 mode
    selected.head.algorithm.name shouldBe "trilateration"
    all(selected.map(_.weight)) should be >= Selector.WeightThreshold
  }

  test("sole survivor keeps its weight even below threshold") {
    // Very weak: proximity base 1.0 (single) — with FourPlus base 0.2 × vweak 0.5 = 0.1 < 0.4
    val selected = Selector.select(ctx(n = ApCount.FourPlus, sq = SignalQuality.VeryWeak))
    selected.map(_.algorithm.name) shouldBe Seq("proximity")
  }

  // ---- R6 combiner --------------------------------------------------------

  test("combiner: single member passes through; zero weights fall back to first") {
    val p = Position(40, -75, 0, 10, 0.8)
    Combiner.combine(Seq(Combiner.WeightedPosition(p, 0.5))).get shouldBe p
    Combiner.combine(Seq(
      Combiner.WeightedPosition(p, 0.0),
      Combiner.WeightedPosition(Position(41, -74, 0, 20, 0.5), 0.0))).get shouldBe p
  }

  test("combiner: normalized-weight mean of coordinates and confidence") {
    val a = Combiner.WeightedPosition(Position(40.0, -75.0, 0, 10, 0.8), 3.0)
    val b = Combiner.WeightedPosition(Position(40.0004, -75.0, 100, 12, 0.6), 1.0)
    val c = Combiner.combine(Seq(a, b)).get
    c.lat shouldBe (40.0 * 0.75 + 40.0004 * 0.25) +- 1e-9
    c.alt shouldBe 25.0 +- Delta
    // positions nearly coincide → near-singular covariance → conservative
    // geometry factor; confidence only shrinks from the weighted mean
    c.confidence should be <= (0.8 * 0.75 + 0.6 * 0.25)
  }

  test("combiner: collinear members cap confidence at 0.69 and floor accuracy at 6 m") {
    val members = Seq(
      Combiner.WeightedPosition(Position(40.00, -75.0, 0, 3.0, 0.9), 1.0),
      Combiner.WeightedPosition(Position(40.01, -75.0, 0, 3.0, 0.9), 1.0),
      Combiner.WeightedPosition(Position(40.02, -75.0, 0, 3.0, 0.9), 1.0))
    val c = Combiner.combine(members).get
    c.confidence should be <= 0.69
    c.accuracy should be >= 6.0
  }

  test("combiner accuracy: median for ≤3, hybrid + MAD inflation for more") {
    Combiner.adjustedAccuracy(Seq(2.0, 6.0, 4.0), 1.0, 1.0, collinear = false) shouldBe 4.0 +- Delta
    // 6 members incl. one outlier: hybrid estimator inflated by outlier ratio
    val acc = Combiner.adjustedAccuracy(
      Seq(3.0, 3.5, 4.0, 4.5, 5.0, 50.0), 1.0, 1.0, collinear = false)
    acc should be > 4.25 // above the raw median
    acc should be < 10.0 // robust to the 50 m outlier
  }

  // ---- R5 full flow -------------------------------------------------------

  test("positioner end-to-end: validates, filters, selects, combines") {
    val aps = Seq(
      ap("a", 40.0018, -75.0), ap("b", 39.9991, -75.0018), ap("c", 39.9991, -74.9982),
      ap("d", 40.0, -75.0025).copy(status = "expired")) // J3: must be ignored
    val scans = Seq(
      WifiScan("a", -60, 2437), WifiScan("b", -63, 2437), WifiScan("c", -66, 2437),
      WifiScan("d", -50, 2437), WifiScan("unknown", -55, 2437))
    val result = Positioner.calculatePosition(scans, aps)
    result.isRight shouldBe true
    val r = result.toOption.get
    r.position.lat shouldBe 40.0 +- 0.01
    r.position.lon shouldBe -75.0 +- 0.01
    r.algorithmsUsed should not be empty
    r.algorithmWeights.keySet should not contain "maximum_likelihood" // only 3 valid APs
  }

  test("positioner rejects impossible physics and empty inputs") {
    val aps = Seq(ap("a", 40, -75))
    Positioner.calculatePosition(Nil, aps).isLeft shouldBe true
    Positioner.calculatePosition(
      Seq(WifiScan("a", -35, 2437), WifiScan("a", -95, 2437)), aps).isLeft shouldBe true
    Positioner.calculatePosition(
      Seq(WifiScan("a", -60, 2437)), aps.map(_.copy(status = "expired"))).isLeft shouldBe true
  }
}
