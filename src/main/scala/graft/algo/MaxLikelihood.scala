package graft.algo

import factors._

/** P6 — Maximum Likelihood: Gaussian log-likelihood of observed RSSI under a
  * Close-In path-loss model, refined by adaptive-step gradient ascent from a
  * weighted-centroid start.
  *
  * Semantics per `wifi-positioning-service/.../impl/MaximumLikelihoodAlgorithm.java`:
  *  - needs ≥4 APs (`:336-344` via the framework weights; enforced here);
  *  - init = weighted centroid with w = 10^(rssi/10) (`:701-760`);
  *  - expected RSSI (`:1253-1261`): −FSPL(f,1m) − 10·3.0·log10(d);
  *  - σ by tier (`:142-166`): 2.5 (≥ −60), 4.0, 6.0 (< −80);
  *  - gradient ascent (`:461-495`): lr=1.0, halve on non-improvement,
  *    ≤100 iters, stop when lr < 0.1;
  *  - accuracy (`:792-820`): strong → 3 m, weak → 6 + |rssi+70|·0.2, GDOP
  *    adjusted, clamp [1, 25];
  *  - confidence (`:1017-1192`): tiered baselines 0.8/0.65/0.6 + weighted
  *    (signal, apCount, likelihood) factors, GDOP adjustment, caps 0.95
  *    (strong) / 0.65 (weak).
  */
object MaxLikelihood extends PositioningAlgorithm {
  private val MaxIterations = 100
  private val ConvergenceThreshold = 0.1
  private val InitialLearningRate = 1.0
  private val LearningRateReduction = 0.5
  private val PathLossExponent = 3.0
  private val SpeedOfLight = 299792458.0
  private val StrongThreshold = -60.0
  private val WeakThreshold = -80.0
  private val VeryWeakThreshold = -100.0
  private val MinConfidence = 0.6
  private val MaxConfidence = 0.95
  private val HighConfidenceThreshold = 0.8
  private val WeakConfidenceCap = 0.65
  private val DefaultLikelihoodFactor = 0.7
  private val MinAccuracy = 1.0
  private val MaxAccuracyAny = 25.0
  private val BaseAccuracyStrong = 3.0
  private val MinApCount = 4

  val name = "maximum_likelihood"
  val baseConfidence = 0.9

  /** Adaptive measurement σ by signal tier. */
  def adaptiveSigma(rssi: Double): Double =
    if (rssi >= StrongThreshold) 2.5 else if (rssi >= WeakThreshold) 4.0 else 6.0

  /** Close-In model: expected RSSI at `distance` meters for `frequencyHz`. */
  def expectedRssi(distanceM: Double, frequencyHz: Double): Double = {
    val fspl1m = 20.0 * math.log10(4.0 * math.Pi * frequencyHz / SpeedOfLight)
    -fspl1m - 10.0 * PathLossExponent * math.log10(math.max(distanceM, 1e-9))
  }

  private final case class Meas(
      lat: Double, lon: Double, alt: Option[Double],
      rssi: Double, sigma: Double, confidence: Double, frequencyHz: Double)

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.isEmpty || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)
    val meas = scans.flatMap { s =>
      lookup.get(s.mac).map { ap =>
        Meas(ap.lat, ap.lon, ap.altitude, s.rssi, adaptiveSigma(s.rssi),
          ap.confidence.getOrElse(1.0), s.frequencyMhz * 1e6)
      }
    }
    if (meas.size < MinApCount) return None

    // Weighted-centroid initial estimate: w = 10^(rssi/10).
    val ws = scans.flatMap(s => lookup.get(s.mac).map(ap => (ap, math.pow(10, s.rssi / 10.0))))
    val totalW = ws.map(_._2).sum
    if (totalW <= 0) return None
    val lat0 = ws.map { case (ap, w) => ap.lat * w }.sum / totalW
    val lon0 = ws.map { case (ap, w) => ap.lon * w }.sum / totalW
    val altW = ws.filter(_._1.altitude.isDefined).map(_._2).sum
    val alt0 =
      if (altW > 0) ws.collect { case (ap, w) if ap.altitude.isDefined =>
        ap.altitude.get * w
      }.sum / altW
      else 0.0
    val hasAlt = altW > 0

    // Gradient ascent with adaptive learning rate.
    var best = (lat0, lon0, alt0)
    var cur = best
    var bestLL = Double.NegativeInfinity
    var lr = InitialLearningRate
    var iter = 0
    while (iter < MaxIterations && lr >= ConvergenceThreshold) {
      val g = gradient(cur, meas, hasAlt)
      val cand = (cur._1 + lr * g._1, cur._2 + lr * g._2, cur._3 + lr * g._3)
      val ll = logLikelihood(cand, meas, hasAlt)
      if (ll > bestLL) {
        bestLL = ll; best = cand; cur = cand
      } else lr *= LearningRateReduction
      iter += 1
    }

    val coords = meas.map(m =>
      if (hasAlt) Array(m.lat, m.lon, m.alt.getOrElse(0.0)) else Array(m.lat, m.lon)).toArray
    val posArr = if (hasAlt) Array(best._1, best._2, best._3) else Array(best._1, best._2)
    val gdop = Gdop.calculateGDOP(coords, posArr, includeBiasTerm = hasAlt)
    val gdopFactor = Gdop.calculateGDOPFactor(gdop)
    val avgSignal = AlgoUtil.mean(scans.map(_.rssi), -85.0)

    Some(Position(
      AlgoUtil.clamp(best._1, -90, 90), AlgoUtil.clamp(best._2, -180, 180), best._3,
      accuracy(avgSignal, gdopFactor),
      confidence(bestLL, meas.size, avgSignal, scans.size, gdopFactor)))
  }

  private def dist(p: (Double, Double, Double), m: Meas, hasAlt: Boolean): Double =
    math.max(1e-9, AlgoUtil.distanceMeters(
      p._1, p._2, if (hasAlt) Some(p._3) else None, m.lat, m.lon, if (hasAlt) m.alt else None))

  private def gradient(
      p: (Double, Double, Double), meas: Seq[Meas], hasAlt: Boolean): (Double, Double, Double) = {
    var gLat = 0.0; var gLon = 0.0; var gAlt = 0.0
    meas.foreach { m =>
      val d = dist(p, m, hasAlt)
      val err = m.rssi - expectedRssi(d, m.frequencyHz)
      val scale = err / (m.sigma * m.sigma * d)
      gLat += scale * (p._1 - m.lat) * m.confidence
      gLon += scale * (p._2 - m.lon) * m.confidence
      gAlt += scale * (p._3 - m.alt.getOrElse(0.0)) * m.confidence
    }
    (gLat, gLon, if (hasAlt) gAlt else 0.0)
  }

  private def logLikelihood(
      p: (Double, Double, Double), meas: Seq[Meas], hasAlt: Boolean): Double =
    meas.map { m =>
      val d = dist(p, m, hasAlt)
      val err = m.rssi - expectedRssi(d, m.frequencyHz)
      -(err * err) / (2 * m.sigma * m.sigma) * m.confidence
    }.sum

  private def accuracy(avgSignal: Double, gdopFactor: Double): Double = {
    val base =
      if (avgSignal >= StrongThreshold) BaseAccuracyStrong
      else 6.0 + math.abs(avgSignal - (-70.0)) * 0.2
    val adjusted =
      if (avgSignal >= StrongThreshold)
        base * (1.0 + (gdopFactor - 1.0) * Gdop.AccuracyMultiplier)
      else base * gdopFactor
    AlgoUtil.clamp(adjusted, MinAccuracy, MaxAccuracyAny)
  }

  private def confidence(
      maxLL: Double, measCount: Int, avgSignal: Double, apCount: Int,
      gdopFactor: Double): Double = {
    val signalFactor =
      if (avgSignal >= StrongThreshold)
        AlgoUtil.clamp((avgSignal - WeakThreshold) / (StrongThreshold - WeakThreshold), 0.0, 1.0)
      else
        AlgoUtil.clamp(
          (avgSignal - VeryWeakThreshold) / (WeakThreshold - VeryWeakThreshold), 0.0, 1.0)
    val apFactor = AlgoUtil.clamp((apCount - 2).toDouble / (8 - 2), 0.0, 1.0)
    val likelihoodFactor =
      if (maxLL.isInfinite || maxLL.isNaN) DefaultLikelihoodFactor
      else AlgoUtil.clamp((math.exp(maxLL / measCount) - 0.1) / (0.9 - 0.1), 0.0, 1.0)

    val (baseline, range, score) =
      if (avgSignal >= StrongThreshold)
        (HighConfidenceThreshold, MaxConfidence - HighConfidenceThreshold,
          0.7 * signalFactor + 0.3 * apFactor + 0.1 * likelihoodFactor)
      else if (avgSignal < WeakThreshold)
        (MinConfidence, WeakConfidenceCap - MinConfidence,
          0.7 * signalFactor + 0.2 * apFactor + 0.1 * likelihoodFactor)
      else
        (WeakConfidenceCap, HighConfidenceThreshold - WeakConfidenceCap,
          0.7 * signalFactor + 0.25 * apFactor + 0.15 * likelihoodFactor)
    val base = baseline + range * score
    val adjusted = base * (1.0 - Gdop.ConfidenceWeight * (1.0 - 1.0 / math.max(1.0, gdopFactor)))
    if (avgSignal >= StrongThreshold)
      math.max(HighConfidenceThreshold, math.min(MaxConfidence, adjusted))
    else if (avgSignal < WeakThreshold) math.min(WeakConfidenceCap, adjusted)
    else adjusted
  }

  // R3 weight tables (`MaximumLikelihoodAlgorithm.java:337-371`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 0.0
    case ApCount.Two      => 0.0
    case ApCount.Three    => 0.0
    case ApCount.FourPlus => 1.0
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 1.2
    case SignalQuality.Medium   => 0.9
    case SignalQuality.Weak     => 0.5
    case SignalQuality.VeryWeak => 0.0
  }
  def geometryMultiplier(g: GeometricQuality): Double = g match {
    case GeometricQuality.Excellent => 1.2
    case GeometricQuality.Good      => 1.1
    case GeometricQuality.Fair      => 0.9
    case GeometricQuality.Poor      => 0.7
    case GeometricQuality.Collinear => 0.7
  }
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 0.9
    case SignalDistribution.Mixed    => 1.1
    case SignalDistribution.Outliers => 1.2
  }
}
