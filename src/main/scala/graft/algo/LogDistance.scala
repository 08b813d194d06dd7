package graft.algo

import factors._

/** P5 — Log-Distance Path Loss: vendor-calibrated path-loss model with
  * inverse-distance-weighted positioning.
  *
  * Semantics per `wifi-positioning-service/.../impl/LogDistancePathLossAlgorithm.java`:
  *  - vendor path-loss exponents (`:160-174`): cisco 3.0, aruba 2.8, meraki
  *    3.0, ubiquiti 2.7, ruckus 2.9, hpe-aruba 2.8, default 3.0; adjusted by
  *    signal (`:836-891`): strong (≥ −50) − min(1.0, (rssi+50)/5) floored at
  *    2.0; weak (≤ −80) + min(1.5, (−80−rssi)/5) capped at 5.0.
  *  - frequency reference RSSI (`:226-244`): ≥5000 MHz → −45, ≥2400 → −40,
  *    else −43.
  *  - distance (`:930-961`): d = 10^(|ref − rssi|/(10n)) × (1 + σ/10) ×
  *    envFactor, σ interpolated 2.0…5.0 by signal tier, envFactor
  *    1.0/0.8/0.6 by (signal, σ) quality.
  *  - position (`:669-714`): inverse-distance weights 1/max(1, d).
  *  - accuracy (`:730-759`): strong → minDist×0.5; weak → maxDist×3.0; else
  *    minDist×(3.0 − 2.5·signalRatio).
  *  - confidence (`:1106-1196`): 6-factor weighted model (signal .25,
  *    distance .20, geometry .20, vendor .20, path-loss fit .10,
  *    distribution .05) clamped to [0.6, 0.95].
  */
object LogDistance extends PositioningAlgorithm {
  val VendorPathLoss: Map[String, Double] = Map(
    "cisco" -> 3.0, "aruba" -> 2.8, "meraki" -> 3.0,
    "ubiquiti" -> 2.7, "ruckus" -> 2.9, "hpe-aruba" -> 2.8)
  private val DefaultPathLossExponent = 3.0
  private val StrongSignalThreshold = -50.0
  private val WeakSignalThreshold = -80.0
  private val MinExponent = 2.0
  private val MaxExponent = 5.0
  private val MinConfidence = 0.6
  private val MaxConfidence = 0.95

  val name = "log_distance_path_loss"
  val baseConfidence = 0.85

  def pathLossExponent(vendor: Option[String], rssi: Double): Double = {
    val base = vendor.map(_.toLowerCase.trim).filter(_.nonEmpty)
      .flatMap(VendorPathLoss.get).getOrElse(DefaultPathLossExponent)
    if (rssi >= StrongSignalThreshold)
      math.max(MinExponent, base - math.min(1.0, (rssi - StrongSignalThreshold) / 5.0))
    else if (rssi <= WeakSignalThreshold)
      math.min(MaxExponent, base + math.min(1.5, (WeakSignalThreshold - rssi) / 5.0))
    else base
  }

  def referenceRssi(frequencyMhz: Int): Double =
    if (frequencyMhz >= 5000) -45.0 else if (frequencyMhz >= 2400) -40.0 else -43.0

  /** Shadow-fading σ, linearly interpolated between the 2.0/5.0 dB tiers. */
  def shadowSigma(rssi: Double): Double =
    if (rssi >= StrongSignalThreshold) 2.0
    else if (rssi <= WeakSignalThreshold) 5.0
    else {
      val normalized = (rssi - WeakSignalThreshold) / (StrongSignalThreshold - WeakSignalThreshold)
      5.0 - normalized * 3.0
    }

  private def environmentFactor(rssi: Double, sigma: Double): Double =
    if (rssi >= StrongSignalThreshold && sigma <= 2.0) 1.0
    else if (rssi >= WeakSignalThreshold && sigma <= 4.0) 0.8
    else 0.6

  def distance(rssi: Double, frequencyMhz: Int, vendor: Option[String]): Double = {
    val n = pathLossExponent(vendor, rssi)
    val ref = referenceRssi(frequencyMhz)
    val base = math.pow(10, math.abs(ref - rssi) / (10.0 * n))
    val sigma = shadowSigma(rssi)
    base * (1.0 + sigma / 10.0) * environmentFactor(rssi, sigma)
  }

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.isEmpty || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)

    final case class Obs(ap: AccessPoint, dist: Double, exponent: Double, hasVendor: Boolean)
    val obs = scans.flatMap { s =>
      lookup.get(s.mac).map { ap =>
        Obs(ap, distance(s.rssi, s.frequencyMhz, ap.vendor),
          pathLossExponent(ap.vendor, s.rssi), ap.vendor.exists(_.nonEmpty))
      }
    }
    if (obs.isEmpty) return None

    // Inverse-distance-weighted position.
    val entries = obs.map(o => (o, 1.0 / math.max(1.0, o.dist)))
    val totalW = entries.map(_._2).sum
    val lat = entries.map { case (o, w) => o.ap.lat * w }.sum / totalW
    val lon = entries.map { case (o, w) => o.ap.lon * w }.sum / totalW
    val altEntries = entries.collect { case (o, w) if o.ap.altitude.isDefined =>
      (o.ap.altitude.get, w)
    }
    val alt = if (altEntries.nonEmpty) altEntries.map { case (a, w) => a * w }.sum / totalW else 0.0

    val avgSignal = scans.map(_.rssi).sum / scans.size
    val minDist = obs.map(_.dist).min
    val maxDist = obs.map(_.dist).max
    val accuracy =
      if (avgSignal >= StrongSignalThreshold) minDist * 0.5
      else if (avgSignal <= WeakSignalThreshold) maxDist * 3.0
      else {
        val ratio = (avgSignal - WeakSignalThreshold) / (StrongSignalThreshold - WeakSignalThreshold)
        minDist * (3.0 - 2.5 * ratio)
      }

    val confidence = adjustedConfidence(
      scans.map(_.rssi), obs.map(_.dist), obs.map(_.exponent),
      obs.count(_.hasVendor).toDouble / obs.size)

    Some(Position(lat, lon, alt, accuracy, confidence))
  }

  /** The 6-factor confidence model (`LogDistancePathLossAlgorithm.java:1106-1196`). */
  def adjustedConfidence(
      signals: Seq[Double],
      distances: Seq[Double],
      exponents: Seq[Double],
      vendorRatio: Double): Double = {
    val avgSignal = AlgoUtil.mean(signals, WeakSignalThreshold - 5.0)
    val signalQuality = AlgoUtil.clamp((avgSignal + 100.0) / 50.0, 0.0, 1.0)

    val avgDist = AlgoUtil.mean(distances, 30.0)
    val distanceReliability = math.exp(-avgDist / 30.0)

    val avgExp = AlgoUtil.mean(exponents, DefaultPathLossExponent)
    val pathLossReliability =
      1.0 - math.min(1.0, math.abs(avgExp - DefaultPathLossExponent) / 2.0)

    val geometricFactor = signals.size match {
      case n if n >= 4 => 1.0
      case 3           => 0.9
      case 2           => 0.8
      case _           => 0.7
    }

    val vendorQuality = 0.6 + 0.4 * vendorRatio

    val sd = AlgoUtil.stddevPop(signals)
    val distributionQuality = 1.0 - math.min(1.0, sd / 20.0) * 0.3

    val raw = signalQuality * 0.25 + distanceReliability * 0.20 + pathLossReliability * 0.10 +
      geometricFactor * 0.20 + vendorQuality * 0.20 + distributionQuality * 0.05
    AlgoUtil.clamp(raw, MinConfidence, MaxConfidence)
  }

  // R3 weight tables (`LogDistancePathLossAlgorithm.java:1229-1262`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 0.4
    case ApCount.Two      => 0.5
    case ApCount.Three    => 0.5
    case ApCount.FourPlus => 0.4
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 1.0
    case SignalQuality.Medium   => 0.8
    case SignalQuality.Weak     => 0.6
    case SignalQuality.VeryWeak => 0.0
  }
  def geometryMultiplier(g: GeometricQuality): Double = g match {
    case GeometricQuality.Excellent => 1.0
    case GeometricQuality.Good      => 1.0
    case GeometricQuality.Fair      => 0.8
    case GeometricQuality.Poor      => 0.7
    case GeometricQuality.Collinear => 0.3
  }
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 1.1
    case SignalDistribution.Mixed    => 0.8
    case SignalDistribution.Outliers => 0.8
  }
}
