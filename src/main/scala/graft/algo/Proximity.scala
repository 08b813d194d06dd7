package graft.algo

import factors._

/** P1 — Proximity: position = location of the strongest-signal known AP.
  *
  * Semantics per `wifi-positioning-service/.../impl/ProximityDetectionAlgorithm.java:52-53,83-130`:
  * confidence = clamp((rssi − (−90)) / 60, 0, 0.85); accuracy = AP's
  * horizontalAccuracy; altitude = AP altitude or 0.
  */
object Proximity extends PositioningAlgorithm {
  private val MinSignalStrength = -90.0
  private val SignalRange = 60.0
  private val MaxConfidence = 0.85
  private val DefaultAccuracy = 15.0

  val name = "proximity"
  val baseConfidence = 0.6

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.isEmpty || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)
    val strongest = scans.maxBy(_.rssi)
    lookup.get(strongest.mac).map { ap =>
      val normalized = (strongest.rssi - MinSignalStrength) / SignalRange
      val confidence = math.max(0.0, math.min(MaxConfidence, normalized))
      Position(ap.lat, ap.lon, ap.altitude.getOrElse(0.0),
        ap.horizontalAccuracy.getOrElse(DefaultAccuracy), confidence)
    }
  }

  // R3 weight tables (`ProximityDetectionAlgorithm.java:60-80`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 1.0
    case ApCount.Two      => 0.4
    case ApCount.Three    => 0.3
    case ApCount.FourPlus => 0.2
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 0.9
    case SignalQuality.Medium   => 0.7
    case SignalQuality.Weak     => 0.4
    case SignalQuality.VeryWeak => 0.5
  }
  def geometryMultiplier(g: GeometricQuality): Double = 1.0 // geometry-independent
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 1.0
    case SignalDistribution.Mixed    => 0.7
    case SignalDistribution.Outliers => 0.9
  }
}
