package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Data-driven scenario corpus in the reference's own testing style
  * (`wifi-positioning-service/scripts/test/wifi-positioing-complete-test.sh:219-579`
  * asserts expected_methods + accuracy/confidence RANGES per scenario, not
  * exact coordinates). Scenarios mirror the seed corpus families
  * (`scripts/setup/wifi-positioning-test-data.sh`): single-AP proximity,
  * dual-AP ratio, trilateration triangle, collinear line, weak signal,
  * mixed status, high-density cluster. */
class ScenarioSpec extends AnyFunSuite with Matchers {

  private def ap(mac: String, lat: Double, lon: Double,
      status: String = "active", vendor: Option[String] = None): AccessPoint =
    AccessPoint(mac, lat, lon, Some(10.0), Some(8.0), Some(0.9), vendor, status)

  private case class Scenario(
      name: String,
      scans: Seq[WifiScan],
      aps: Seq[AccessPoint],
      expectMethods: Set[String],    // must ALL appear in methodsUsed
      forbidMethods: Set[String],    // must NOT appear
      accuracyRange: (Double, Double),
      confidenceRange: (Double, Double))

  private val triangle = Seq(
    ap("t1", 40.0018, -75.0000), ap("t2", 39.9991, -75.0018), ap("t3", 39.9991, -74.9982))

  private val scenarios = Seq(
    Scenario("single-AP proximity",
      scans = Seq(WifiScan("s1", -55, 2437)),
      aps = Seq(ap("s1", 40.0, -75.0)),
      expectMethods = Set("proximity"),
      forbidMethods = Set("trilateration", "maximum_likelihood", "rssi_ratio"),
      accuracyRange = (1.0, 100.0), confidenceRange = (0.3, 0.85)),
    Scenario("dual-AP rssi-ratio family",
      scans = Seq(WifiScan("d1", -55, 2437), WifiScan("d2", -65, 2437)),
      aps = Seq(ap("d1", 40.0, -75.0), ap("d2", 40.001, -75.001)),
      expectMethods = Set.empty, // top-3 of the two-AP candidate set
      forbidMethods = Set("trilateration", "maximum_likelihood"),
      accuracyRange = (1.0, 60.0), confidenceRange = (0.2, 0.9)),
    Scenario("trilateration triangle, strong signals",
      scans = Seq(WifiScan("t1", -60, 2437), WifiScan("t2", -63, 2437),
        WifiScan("t3", -66, 2437)),
      aps = triangle,
      expectMethods = Set("trilateration"),
      forbidMethods = Set("maximum_likelihood"), // needs 4+ APs
      accuracyRange = (1.0, 50.0), confidenceRange = (0.3, 0.9)),
    Scenario("collinear APs: trilateration disqualified",
      scans = Seq(WifiScan("c1", -60, 2437), WifiScan("c2", -62, 2437),
        WifiScan("c3", -64, 2437)),
      aps = Seq(ap("c1", 40.001, -75.0), ap("c2", 40.002, -75.0), ap("c3", 40.003, -75.0)),
      expectMethods = Set.empty,
      forbidMethods = Set("trilateration"),
      accuracyRange = (1.0, 200.0), confidenceRange = (0.1, 0.69)), // combiner collinear cap
    Scenario("very weak signals: proximity only",
      scans = Seq(WifiScan("t1", -97, 2437), WifiScan("t2", -98, 2437),
        WifiScan("t3", -96, 2437)),
      aps = triangle,
      expectMethods = Set("proximity"),
      forbidMethods = Set("trilateration", "weighted_centroid", "maximum_likelihood"),
      accuracyRange = (1.0, 100.0), confidenceRange = (0.0, 0.5)),
    Scenario("mixed status: expired APs invisible",
      scans = Seq(WifiScan("t1", -60, 2437), WifiScan("t2", -63, 2437),
        WifiScan("t3", -66, 2437), WifiScan("x1", -40, 2437)),
      aps = triangle :+ ap("x1", 45.0, -70.0, status = "expired"),
      expectMethods = Set.empty,
      forbidMethods = Set("maximum_likelihood"), // still only 3 usable APs
      accuracyRange = (1.0, 60.0), confidenceRange = (0.3, 0.9)),
    Scenario("high-density cluster: MLE eligible",
      scans = (1 to 6).map(i => WifiScan(s"h$i", -55 - i * 2, 2437)),
      aps = (1 to 6).map(i =>
        ap(s"h$i", 40.0 + 0.0015 * math.cos(i), -75.0 + 0.0015 * math.sin(i),
          vendor = Some("cisco"))),
      expectMethods = Set.empty,
      forbidMethods = Set.empty,
      accuracyRange = (1.0, 60.0), confidenceRange = (0.3, 0.95)))

  scenarios.foreach { sc =>
    test(s"scenario: ${sc.name}") {
      val result = Positioner.calculatePosition(sc.scans, sc.aps)
      withClue(result) { result.isRight shouldBe true }
      val r = result.toOption.get
      val used = r.algorithmsUsed.toSet
      sc.expectMethods.foreach(m => used should contain(m))
      sc.forbidMethods.foreach(m => used should not contain m)
      r.position.accuracy should (be >= sc.accuracyRange._1 and be <= sc.accuracyRange._2)
      r.position.confidence should (be >= sc.confidenceRange._1 and be <= sc.confidenceRange._2)
      // position stays inside the usable-AP bounding box (± margin)
      val usable = sc.aps.filter(a => AccessPoint.ValidStatuses.contains(a.status))
      r.position.lat should (be >= usable.map(_.lat).min - 0.01 and
        be <= usable.map(_.lat).max + 0.01)
      r.position.lon should (be >= usable.map(_.lon).min - 0.01 and
        be <= usable.map(_.lon).max + 0.01)
    }
  }

  test("scenario: unknown MACs produce a clean error, never a position") {
    Positioner.calculatePosition(
      Seq(WifiScan("zz:zz", -50, 2437)), triangle).isLeft shouldBe true
  }
}
