package graft.algo

import factors._

/** P3 — RSSI Ratio: pairwise signal-ratio interpolation over all C(n,2) AP
  * pairs (J4 self-join shape).
  *
  * Semantics per `wifi-positioning-service/.../impl/RSSIRatioAlgorithm.java:97-111,421-549,560-665`:
  * per pair: ratio = 10^((rssi₁−rssi₂)/20), coord = (c₁ + ratio·c₂)/(1+ratio),
  * pair weight = |Δrssi|/30; position = weighted mean over pairs (altitude
  * only from pairs where both APs carry one); accuracy = mean AP accuracy
  * (default 15) × clamp((−avgRssi − 50)/10, 1, 3); confidence =
  * min(0.85, totalWeight / C(n,2)) + signalQuality·1.0 capped at 0.85, with a
  * 0.7 floor when avgRssi ≥ −70; signalQuality = mean clamp((rssi+95)/45, 0, 1).
  */
object RssiRatio extends PositioningAlgorithm {
  private val PathLossCoefficient = 20.0
  private val WeightNormalization = 30.0
  private val DefaultAvgSignal = -80.0
  private val DefaultBaseAccuracy = 15.0
  private val MaxConfidence = 0.85
  private val HighConfidenceFloor = 0.7
  private val StrongSignalThreshold = -70.0

  val name = "rssi_ratio"
  val baseConfidence = 0.75

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.size < 2 || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)

    final case class Pair(wLat: Double, wLon: Double, wAlt: Double, w: Double, hasAlt: Boolean)
    val pairs = for {
      i <- scans.indices
      j <- (i + 1) until scans.size
      ap1 <- lookup.get(scans(i).mac)
      ap2 <- lookup.get(scans(j).mac)
    } yield {
      val diff = scans(i).rssi - scans(j).rssi
      val ratio = math.pow(10, diff / PathLossCoefficient)
      val w = math.abs(diff) / WeightNormalization
      def interp(c1: Double, c2: Double) = (c1 + ratio * c2) / (1 + ratio)
      val (alt, hasAlt) = (ap1.altitude, ap2.altitude) match {
        case (Some(a1), Some(a2)) => (interp(a1, a2), true)
        case _                    => (0.0, false)
      }
      Pair(interp(ap1.lat, ap2.lat) * w, interp(ap1.lon, ap2.lon) * w, alt * w, w, hasAlt)
    }
    if (pairs.isEmpty) return None
    val totalW = pairs.map(_.w).sum
    if (totalW <= 0) return None

    val lat = pairs.map(_.wLat).sum / totalW
    val lon = pairs.map(_.wLon).sum / totalW
    val altW = pairs.filter(_.hasAlt).map(_.w).sum
    val alt = if (altW > 0) pairs.map(_.wAlt).sum / altW else 0.0

    val avgRssi = AlgoUtil.mean(scans.map(_.rssi), DefaultAvgSignal)
    val baseAcc = {
      val accs = aps.flatMap(_.horizontalAccuracy)
      if (accs.nonEmpty) accs.sum / accs.size else DefaultBaseAccuracy
    }
    val signalFactor = AlgoUtil.clamp((-avgRssi + (-50.0)) / 10.0, 1.0, 3.0)
    val accuracy = baseAcc * signalFactor

    val signalQuality =
      AlgoUtil.mean(scans.map(s => AlgoUtil.clamp((s.rssi + 95.0) / 45.0, 0.0, 1.0)), 0.5)
    val maxPossibleWeight = scans.size * (scans.size - 1) / 2.0
    val base = math.min(MaxConfidence, totalW / maxPossibleWeight)
    val computed = math.min(MaxConfidence, base + signalQuality * 1.0)
    val confidence =
      if (avgRssi >= StrongSignalThreshold) math.max(HighConfidenceFloor, computed) else computed

    Some(Position(AlgoUtil.clamp(lat, -90, 90), AlgoUtil.clamp(lon, -180, 180),
      alt, accuracy, confidence))
  }

  // R3 weight tables (`RSSIRatioAlgorithm.java:245-284`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 0.0
    case ApCount.Two      => 1.0
    case ApCount.Three    => 0.7
    case ApCount.FourPlus => 0.5
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 1.0
    case SignalQuality.Medium   => 0.9
    case SignalQuality.Weak     => 0.6
    case SignalQuality.VeryWeak => 0.0
  }
  def geometryMultiplier(g: GeometricQuality): Double = g match {
    case GeometricQuality.Excellent => 1.0
    case GeometricQuality.Good      => 1.0
    case GeometricQuality.Fair      => 0.9
    case GeometricQuality.Poor      => 0.8
    case GeometricQuality.Collinear => 0.8
  }
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 1.2
    case SignalDistribution.Mixed    => 0.9
    case SignalDistribution.Outliers => 0.7
  }
}
