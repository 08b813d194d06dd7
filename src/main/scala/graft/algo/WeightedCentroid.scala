package graft.algo

import factors._

/** P2 — Weighted Centroid: exponential signal weights over known-AP positions.
  *
  * Semantics per `wifi-positioning-service/.../impl/WeightedCentroidAlgorithm.java:69-113,302-455`:
  * normalized = clamp((rssi − (−30)) / (−100 − (−30)), 0, 1), weight =
  * 10^normalized. NOTE the reference's quirk, pinned by its own tests
  * (`WeightedCentroidAlgorithmTest.java:238-278` "weaker signals get more
  * weight due to normalization"): −30 dBm normalizes to 0 (weight 1) and
  * −100 dBm to 1 (weight 10), so weaker signals dominate. Preserved verbatim
  * — "fixing" it would change every centroid. Position = Σ(pᵢwᵢ)/Σwᵢ with
  * altitude averaged only
  * over APs that carry one, with their own weight sum; accuracy = mean AP
  * horizontalAccuracy (default 15 m); confidence = min(0.8, coverage × 0.7)
  * with coverage = |scans| / |knownAPs|.
  */
object WeightedCentroid extends PositioningAlgorithm {
  private val RssiMax = -30.0
  private val RssiMin = -100.0
  private val WeightBase = 10.0
  private val MaxConfidence = 0.8
  private val DefaultAccuracy = 15.0
  private val ZeroThreshold = 1e-10

  val name = "weighted_centroid"
  val baseConfidence = 0.7

  def normalizeSignal(rssi: Double): Double =
    AlgoUtil.clamp((rssi - RssiMax) / (RssiMin - RssiMax), 0.0, 1.0)

  def weightOf(rssi: Double): Double = math.pow(WeightBase, normalizeSignal(rssi))

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.isEmpty || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)
    val contributions = scans.flatMap { s =>
      lookup.get(s.mac).map(ap => (ap, weightOf(s.rssi)))
    }
    if (contributions.isEmpty) return None

    val totalW = contributions.map(_._2).sum
    if (totalW < ZeroThreshold) return None
    val lat = contributions.map { case (ap, w) => ap.lat * w }.sum / totalW
    val lon = contributions.map { case (ap, w) => ap.lon * w }.sum / totalW

    val altContribs = contributions.collect { case (ap, w) if ap.altitude.isDefined =>
      (ap.altitude.get, w)
    }
    val altW = altContribs.map(_._2).sum
    val alt = if (altW > ZeroThreshold) altContribs.map { case (a, w) => a * w }.sum / altW else 0.0

    val accuracies = aps.flatMap(_.horizontalAccuracy)
    val accuracy = if (accuracies.nonEmpty) accuracies.sum / accuracies.size else DefaultAccuracy
    val coverage = scans.size.toDouble / aps.size
    val confidence = math.min(MaxConfidence, coverage * baseConfidence)

    Some(Position(lat, lon, alt, accuracy, confidence))
  }

  // R3 weight tables (`WeightedCentroidAlgorithm.java:121-155`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 0.0
    case ApCount.Two      => 0.8
    case ApCount.Three    => 0.8
    case ApCount.FourPlus => 0.7
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 1.0
    case SignalQuality.Medium   => 1.0
    case SignalQuality.Weak     => 0.8
    case SignalQuality.VeryWeak => 0.0
  }
  def geometryMultiplier(g: GeometricQuality): Double = g match {
    case GeometricQuality.Excellent => 1.0
    case GeometricQuality.Good      => 1.1
    case GeometricQuality.Fair      => 1.2
    case GeometricQuality.Poor      => 1.3
    case GeometricQuality.Collinear => 1.3 // robust to degenerate geometry
  }
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 1.0
    case SignalDistribution.Mixed    => 1.8
    case SignalDistribution.Outliers => 1.4
  }
}
