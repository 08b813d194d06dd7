package graft.algo

import breeze.linalg.{DenseMatrix, DenseVector}

import factors._

/** P4 — Trilateration: linearized least squares over RSSI-derived distances,
  * solved by QR, with a weighted-centroid fallback on singular geometry.
  *
  * Semantics per `wifi-positioning-service/.../impl/TrilaterationAlgorithm.java`:
  *  - RSSI→distance (`:805-832`): free-space reference at 1 m from frequency
  *    (ref = −20·log10(4π/λ)), path-loss exponent 2.5 when rssi ≥ −65 else
  *    3.0, d = 10^((ref − rssi)/(10n)) clamped to [1, 100] m.
  *  - Local tangent plane (`:506-528`): 111 km/°, lon scaled by cos(refLat)
  *    at the strongest-signal AP.
  *  - LSQ (`:851-899`): rows 2(xᵢ−x₀), 2(yᵢ−y₀) vs first valid scan as the
  *    linearization reference; QR solve; singular → exponential-weighted
  *    centroid fallback (w = 10^(rssi/20), `:578-607`) clamped to the AP
  *    bounding box.
  *  - Accuracy (`:1079-1101`): strong → 3·(1+(gdopF−1)·0.5) clamp [1,5];
  *    else 0.3·avgDist·gdopF clamp [1,50].
  *  - Confidence (`:1150-1176`): 0.55 + (0.85−0.55)(0.7·signalF + 0.3·apF)
  *    × GDOP adjust, floor 0.8 for strong signals, cap 0.58 for weak.
  */
object Trilateration extends PositioningAlgorithm {
  private val LatToMeters = 111000.0
  private val LonToMetersBase = 111000.0
  private val SpeedOfLight = 299792458.0
  private val StrongSignalThreshold = -65.0
  private val WeakSignalThreshold = -80.0
  private val PathLossExponent = 3.0
  private val StrongPathLossExponent = 2.5
  private val MinDistance = 1.0
  private val MaxDistance = 100.0
  private val MinAccuracy = 1.0
  private val MaxAccuracyStrong = 5.0
  private val BaseAccuracyStrong = 3.0
  private val MaxAccuracyAny = 50.0
  private val MinConfidence = 0.55
  private val MaxConfidence = 0.85
  private val HighConfidenceThreshold = 0.8
  private val WeakConfidenceCap = 0.58
  private val SignalWeightingDivisor = 20.0
  private val MinApCount = 3
  private val MaxApCountForScaling = 8

  val name = "trilateration"
  val baseConfidence = 0.85

  /** AP in local tangent-plane meters with its RSSI-derived range. */
  private final case class Local(x: Double, y: Double, dist: Double, rssi: Double)

  /** RSSI→distance via log-distance model with FSPL 1 m reference. */
  def distanceFromRssi(rssi: Double, frequencyMhz: Int): Double = {
    val wavelength = SpeedOfLight / (frequencyMhz * 1e6)
    val referenceRssi = -20.0 * math.log10(4.0 * math.Pi / wavelength)
    val n = if (rssi >= StrongSignalThreshold) StrongPathLossExponent else PathLossExponent
    val d = math.pow(10, (referenceRssi - rssi) / (10.0 * n))
    math.min(MaxDistance, math.max(MinDistance, d))
  }

  def calculate(scans: Seq[WifiScan], aps: Seq[AccessPoint]): Option[Position] = {
    if (scans.isEmpty || aps.isEmpty) return None
    val lookup = AlgoUtil.apMap(aps)
    val valid = scans.filter(s => lookup.contains(s.mac))
    if (valid.size < MinApCount) return None

    // Local tangent plane anchored at the strongest-signal AP.
    val refAp = lookup(valid.maxBy(_.rssi).mac)
    val lonToMeters = LonToMetersBase * math.cos(math.toRadians(refAp.lat))
    val locals = valid.map { s =>
      val ap = lookup(s.mac)
      Local(
        (ap.lat - refAp.lat) * LatToMeters,
        (ap.lon - refAp.lon) * lonToMeters,
        distanceFromRssi(s.rssi, s.frequencyMhz),
        s.rssi)
    }

    val solution = leastSquares(locals).getOrElse(fallbackCentroidLocal(valid, lookup, refAp, lonToMeters))

    val gdop = localGdop(locals, solution)
    val gdopFactor = Gdop.calculateGDOPFactor(gdop)
    val avgSignal = valid.map(_.rssi).sum / valid.size
    val avgDist = locals.map(_.dist).sum / locals.size

    val lat = AlgoUtil.clamp(refAp.lat + solution(0) / LatToMeters, -90, 90)
    val lon = AlgoUtil.clamp(refAp.lon + solution(1) / lonToMeters, -180, 180)

    // Altitude: signal-weighted mean over APs that carry one.
    val altPairs = valid.flatMap { s =>
      lookup(s.mac).altitude.map(a => (a, math.pow(10, s.rssi / SignalWeightingDivisor)))
    }
    val alt =
      if (altPairs.isEmpty) 0.0
      else altPairs.map { case (a, w) => a * w }.sum / altPairs.map(_._2).sum

    Some(Position(lat, lon, alt,
      accuracy(avgSignal, gdopFactor, avgDist),
      confidence(avgSignal, valid.size, gdopFactor)))
  }

  /** Linear system relative to the first valid scan; QR least squares. */
  private def leastSquares(locals: Seq[Local]): Option[DenseVector[Double]] = {
    val ref = locals.head
    val rows = locals.tail.map { c =>
      (Array(2.0 * (c.x - ref.x), 2.0 * (c.y - ref.y)),
        (c.x * c.x + c.y * c.y) - (ref.x * ref.x + ref.y * ref.y) +
          (ref.dist * ref.dist - c.dist * c.dist))
    }
    val a = DenseMatrix(rows.map(_._1): _*)
    val b = DenseVector(rows.map(_._2): _*)
    try {
      val x = a \ b // QR-based least squares
      if (x.data.exists(v => v.isNaN || v.isInfinite)) None else Some(x)
    } catch { case _: Exception => None }
  }

  /** Singular-geometry fallback: exponential-weighted centroid in local
    * coordinates (`TrilaterationAlgorithm.java:578-607`). */
  private def fallbackCentroidLocal(
      valid: Seq[WifiScan],
      lookup: Map[String, AccessPoint],
      refAp: AccessPoint,
      lonToMeters: Double): DenseVector[Double] = {
    var sw = 0.0; var sx = 0.0; var sy = 0.0
    valid.foreach { s =>
      val ap = lookup(s.mac)
      val w = math.pow(10, s.rssi / SignalWeightingDivisor)
      sx += (ap.lat - refAp.lat) * LatToMeters * w
      sy += (ap.lon - refAp.lon) * lonToMeters * w
      sw += w
    }
    DenseVector(sx / sw, sy / sw)
  }

  /** GDOP over local metric coordinates with a bias column. */
  private def localGdop(locals: Seq[Local], pos: DenseVector[Double]): Double = {
    val coords = locals.map(c => Array(c.x / (6371000.0 * math.Pi / 180.0),
      c.y / (6371000.0 * math.Pi / 180.0))).toArray
    val p = Array(pos(0) / (6371000.0 * math.Pi / 180.0), pos(1) / (6371000.0 * math.Pi / 180.0))
    Gdop.calculateGDOP(coords, p, includeBiasTerm = true)
  }

  private def accuracy(avgSignal: Double, gdopFactor: Double, avgDist: Double): Double =
    if (avgSignal >= StrongSignalThreshold) {
      val acc = BaseAccuracyStrong * (1.0 + (gdopFactor - 1.0) * Gdop.AccuracyMultiplier)
      AlgoUtil.clamp(acc, MinAccuracy, MaxAccuracyStrong)
    } else {
      val base = math.min(avgDist * 0.3, MaxAccuracyAny)
      AlgoUtil.clamp(base * gdopFactor, MinAccuracy, MaxAccuracyAny)
    }

  private def confidence(avgSignal: Double, apCount: Int, gdopFactor: Double): Double = {
    val signalFactor =
      if (avgSignal >= StrongSignalThreshold)
        AlgoUtil.clamp((avgSignal - WeakSignalThreshold) /
          (StrongSignalThreshold - WeakSignalThreshold), 0.0, 1.0)
      else
        AlgoUtil.clamp((avgSignal - (-100.0)) / (WeakSignalThreshold - (-100.0)), 0.0, 1.0)
    val apFactor = AlgoUtil.clamp(
      (apCount - MinApCount).toDouble / (MaxApCountForScaling - MinApCount), 0.0, 1.0)
    val base = MinConfidence + (MaxConfidence - MinConfidence) * (0.7 * signalFactor + 0.3 * apFactor)
    val adjusted =
      base * (1.0 - Gdop.ConfidenceWeight * (1.0 - 1.0 / math.max(1.0, gdopFactor)))
    val bounded =
      if (avgSignal >= StrongSignalThreshold)
        math.max(HighConfidenceThreshold, math.min(MaxConfidence, adjusted))
      else if (avgSignal < WeakSignalThreshold) math.min(WeakConfidenceCap, adjusted)
      else adjusted
    AlgoUtil.clamp(bounded, MinConfidence, MaxConfidence)
  }

  // R3 weight tables (`TrilaterationAlgorithm.java:917-954`)
  def apCountWeight(c: ApCount): Double = c match {
    case ApCount.Single   => 0.0
    case ApCount.Two      => 0.0
    case ApCount.Three    => 1.0
    case ApCount.FourPlus => 0.8
  }
  def signalMultiplier(q: SignalQuality): Double = q match {
    case SignalQuality.Strong   => 1.1
    case SignalQuality.Medium   => 0.8
    case SignalQuality.Weak     => 0.3
    case SignalQuality.VeryWeak => 0.0
  }
  def geometryMultiplier(g: GeometricQuality): Double = g match {
    case GeometricQuality.Excellent => 1.3
    case GeometricQuality.Good      => 0.9
    case GeometricQuality.Fair      => 0.6
    case GeometricQuality.Poor      => 0.3
    case GeometricQuality.Collinear => 0.0 // geometrically impossible
  }
  def distributionMultiplier(d: SignalDistribution): Double = d match {
    case SignalDistribution.Uniform  => 1.1
    case SignalDistribution.Mixed    => 0.8
    case SignalDistribution.Outliers => 0.5
  }
}
