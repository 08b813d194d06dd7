package graft.algo

/** R6 — weighted-average position combiner with robust accuracy and
  * geometry-aware confidence.
  *
  * Semantics per `wifi-positioning-service/.../impl/WeightedAveragePositionCombiner.java:97-204,255-380,449-462`
  * and `GDOPCalculator.java:253-268,707-730`:
  *  - position/confidence: normalized-weight means;
  *  - accuracy: median (≤3 members) or 0.7·median + 0.3·25%-trimmed-mean,
  *    inflated up to 50% by the 2-MAD outlier ratio, then geometry-scaled;
  *  - geometry: covariance of member positions → condition number;
  *    collinear → factor 2 + min(1, log10(cond)/2), confidence ≤ 0.69 via
  *    conf/(factor·1.2), accuracy ≥ 6 m with sqrt(cond/10) scaling;
  *    non-collinear → factor 1 / 1+(cond−5)/15 / 2+min(1,(cond−20)/80),
  *    confidence / sqrt(factor).
  */
object Combiner {
  private val MaxCollinearConfidence = 0.69
  private val MinCollinearAccuracy = 6.0
  private val CollinearConfidenceMultiplier = 1.2
  private val ConditionNumberNormalization = 10.0

  final case class WeightedPosition(position: Position, weight: Double)

  def combine(positions: Seq[WeightedPosition]): Option[Position] = {
    if (positions == null || positions.isEmpty) return None
    if (positions.size == 1) return Some(positions.head.position)
    val totalWeight = positions.map(_.weight).sum
    if (totalWeight == 0) return Some(positions.head.position)

    val norm = positions.map(wp => (wp.position, wp.weight / totalWeight))
    val lat = norm.map { case (p, w) => p.lat * w }.sum
    val lon = norm.map { case (p, w) => p.lon * w }.sum
    val alt = norm.map { case (p, w) => p.alt * w }.sum
    val confidence = norm.map { case (p, w) => p.confidence * w }.sum

    val lats = positions.map(_.position.lat)
    val lons = positions.map(_.position.lon)
    val mLat = lats.sum / lats.size
    val mLon = lons.sum / lons.size
    val covLL = lats.map(x => (x - mLat) * (x - mLat)).sum / lats.size
    val covNN = lons.map(x => (x - mLon) * (x - mLon)).sum / lons.size
    val covLN = lats.zip(lons).map { case (a, b) => (a - mLat) * (b - mLon) }.sum / lats.size
    val cond = Gdop.conditionNumber(covLL, covNN, covLN)
    val collinear = Gdop.isCollinear(lats, lons)
    val factor = geometricQualityFactor(cond, collinear)

    val accuracy = adjustedAccuracy(positions.map(_.position.accuracy), factor, cond, collinear)
    val adjConfidence =
      if (collinear)
        math.min(MaxCollinearConfidence, confidence / (factor * CollinearConfidenceMultiplier))
      else confidence / math.sqrt(factor)

    Some(Position(lat, lon, alt, accuracy, adjConfidence))
  }

  /** Condition-number → quality factor (`GDOPCalculator.java:707-730`). */
  def geometricQualityFactor(conditionNumber: Double, isCollinear: Boolean): Double =
    if (isCollinear)
      2.0 + math.min(1.0, math.log10(math.max(conditionNumber, 1.0)) / 2.0)
    else if (conditionNumber < 5.0) 1.0
    else if (conditionNumber < 20.0) 1.0 + (conditionNumber - 5.0) / 15.0
    else 2.0 + math.min(1.0, (conditionNumber - 20.0) / 80.0)

  /** Hybrid median / trimmed-mean accuracy with MAD outlier inflation. */
  def adjustedAccuracy(
      accuracies: Seq[Double], factor: Double, cond: Double, collinear: Boolean): Double = {
    if (accuracies.isEmpty) return 0.0
    val sorted = accuracies.sorted
    val med = median(sorted)
    val robust =
      if (accuracies.size <= 3) med
      else 0.7 * med + 0.3 * trimmedMean(sorted, 0.25)

    val mad = median(sorted.map(a => math.abs(a - med)).sorted)
    val outlierThreshold = med + 2.0 * mad
    val outlierRatio = accuracies.count(_ > outlierThreshold).toDouble / accuracies.size
    val inflated = if (outlierRatio > 0) robust * (1.0 + outlierRatio * 0.5) else robust

    if (collinear) {
      val geometricWeakness = math.sqrt(cond / ConditionNumberNormalization)
      math.max(MinCollinearAccuracy, inflated * math.max(factor, geometricWeakness))
    } else math.max(inflated, inflated * factor)
  }

  private def median(sorted: Seq[Double]): Double = {
    val n = sorted.size
    if (n % 2 == 0) (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0 else sorted(n / 2)
  }

  private def trimmedMean(sorted: Seq[Double], trim: Double): Double = {
    val k = (sorted.size * trim).toInt
    val trimmed = sorted.slice(k, sorted.size - k)
    if (trimmed.isEmpty) median(sorted) else trimmed.sum / trimmed.size
  }
}
