package graft.algo

/** Core domain types for the positioning library — plain Scala, no Spark
  * dependency, so algorithms are unit-testable exactly like the reference's
  * (`wifi-positioning-service/.../algorithm/PositioningAlgorithm.java`) and
  * usable both driver-side (request scoring) and inside `flatMapGroups`
  * (batch per-AP localization).
  */

/** One observed AP in a device scan
  * (`wifi-positioning-service/.../dto/WifiScanResult.java`). */
final case class WifiScan(
    mac: String,
    rssi: Double,
    frequencyMhz: Int,
    ssid: Option[String] = None,
    linkSpeed: Option[Int] = None)

/** AP golden record (`wifi-positioning-service/.../dto/WifiAccessPoint.java:40-52`). */
final case class AccessPoint(
    mac: String,
    lat: Double,
    lon: Double,
    altitude: Option[Double] = None,
    horizontalAccuracy: Option[Double] = None,
    confidence: Option[Double] = None,
    vendor: Option[String] = None,
    status: String = AccessPoint.StatusActive)

object AccessPoint {
  val StatusActive = "active"
  /** Statuses usable for positioning (`WifiAccessPoint.java:37-38`); anything
    * else — notably "expired" — is filtered out (J3). */
  val ValidStatuses: Set[String] = Set("active", "warning", "verified", "test", "imported")
}

/** A position estimate (`wifi-positioning-service/.../dto/Position.java:3-11`
  * validates lat/lon ranges). */
final case class Position(
    lat: Double,
    lon: Double,
    alt: Double,
    accuracy: Double,
    confidence: Double) {
  require(lat >= -90.0 && lat <= 90.0, s"latitude out of range: $lat")
  require(lon >= -180.0 && lon <= 180.0, s"longitude out of range: $lon")
}

/** R1 context factors (`wifi-positioning-service/.../selection/SelectionContextBuilder.java:32-50`). */
object factors {

  /** AP-count class (`APCountFactor.java:41-49`). */
  sealed trait ApCount
  object ApCount {
    case object Single extends ApCount
    case object Two extends ApCount
    case object Three extends ApCount
    case object FourPlus extends ApCount
    def of(n: Int): ApCount =
      if (n <= 1) Single else if (n == 2) Two else if (n == 3) Three else FourPlus
  }

  /** Signal quality from mean RSSI (`SignalQualityFactor.java:58-69,85-93`). */
  sealed trait SignalQuality
  object SignalQuality {
    case object Strong extends SignalQuality   // mean >= -70 dBm
    case object Medium extends SignalQuality   // mean >= -85 dBm
    case object Weak extends SignalQuality     // mean >= -95 dBm
    case object VeryWeak extends SignalQuality // below -95 dBm
    def of(meanRssi: Double): SignalQuality =
      if (meanRssi >= -70.0) Strong
      else if (meanRssi >= -85.0) Medium
      else if (meanRssi >= -95.0) Weak
      else VeryWeak
  }

  /** Signal spread from RSSI stddev (`SignalDistributionFactor.java:26-32,108-131`). */
  sealed trait SignalDistribution
  object SignalDistribution {
    case object Uniform extends SignalDistribution  // stddev <= 3 dB
    case object Mixed extends SignalDistribution    // stddev <= 10 dB
    case object Outliers extends SignalDistribution // stddev > 10 dB
    def of(stddev: Double): SignalDistribution =
      if (stddev <= 3.0) Uniform else if (stddev <= 10.0) Mixed else Outliers
  }

  /** Geometry class from GDOP (`GeometricQualityFactor.java:80-91`; thresholds
    * `GDOPCalculator.java:237-240`). */
  sealed trait GeometricQuality
  object GeometricQuality {
    case object Excellent extends GeometricQuality // gdop < 2
    case object Good extends GeometricQuality      // gdop < 4
    case object Fair extends GeometricQuality      // gdop < 6
    case object Poor extends GeometricQuality      // gdop >= 6
    case object Collinear extends GeometricQuality // degenerate AP line
    def of(gdop: Double): GeometricQuality =
      if (gdop < Gdop.ExcellentGdop) Excellent
      else if (gdop < Gdop.GoodGdop) Good
      else if (gdop < Gdop.FairGdop) Fair
      else Poor
  }
}

import factors._

/** A positioning algorithm plus its selection-framework weight tables (R3 —
  * the per-algorithm multiplier constants the rule engine consumes,
  * `AlgorithmSelector.java:273-294`). */
trait PositioningAlgorithm {
  def name: String

  /** Base algorithm self-confidence (the reference's `getConfidence()`). */
  def baseConfidence: Double

  /** Compute a position, or None when preconditions fail (the reference
    * returns null). `aps` is the known-AP subset (already status-filtered). */
  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position]

  def apCountWeight(c: ApCount): Double
  def signalMultiplier(q: SignalQuality): Double
  def geometryMultiplier(g: GeometricQuality): Double
  def distributionMultiplier(d: SignalDistribution): Double
}

private[graft] object AlgoUtil {
  /** First-wins AP map on duplicate MAC (`WifiPositioningCalculator.java:303-318`). */
  def apMap(aps: Seq[AccessPoint]): Map[String, AccessPoint] = {
    val b = Map.newBuilder[String, AccessPoint]
    val seen = scala.collection.mutable.HashSet.empty[String]
    aps.foreach(ap => if (seen.add(ap.mac)) b += ap.mac -> ap)
    b.result()
  }

  /** Haversine meters; adds altitude leg when both ends carry one
    * (`TrilaterationAlgorithm.java:1034-1055`). */
  def distanceMeters(
      lat1: Double, lon1: Double, alt1: Option[Double],
      lat2: Double, lon2: Double, alt2: Option[Double]): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    val horizontal = 2.0 * 6371000.0 * math.asin(math.sqrt(a))
    (alt1, alt2) match {
      case (Some(a1), Some(a2)) => math.sqrt(horizontal * horizontal + (a2 - a1) * (a2 - a1))
      case _                    => horizontal
    }
  }

  def mean(xs: Seq[Double], orElse: Double): Double =
    if (xs.isEmpty) orElse else xs.sum / xs.size

  /** Population stddev (the reference's helper divides by n). */
  def stddevPop(xs: Seq[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val m = xs.sum / xs.size
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.size)
  }

  def clamp(x: Double, lo: Double, hi: Double): Double = math.max(lo, math.min(hi, x))
}
