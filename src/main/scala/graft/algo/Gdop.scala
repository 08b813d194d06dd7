package graft.algo

import breeze.linalg.{inv, trace, DenseMatrix}

/** Geometric Dilution of Precision (P7), re-expressed with Breeze.
  *
  * Semantics per `wifi-positioning-service/.../algorithm/util/GDOPCalculator.java`:
  * geometry matrix H of unit vectors position→AP (optionally + bias column of
  * 1s, `:292` flow), Q = (HᵀH)⁻¹, GDOP = sqrt(trace(Q)) capped at 30
  * (`:38`); thresholds 2/4/6 (`:237-240`); step factor into [1,4] (`:603`);
  * accuracy multiplier 0.5 and confidence weight 0.3 (`:243-245`);
  * collinearity variance-ratio threshold 0.01 (`:248`).
  */
object Gdop {
  val MaxAllowedGdop = 30.0
  val ExcellentGdop = 2.0
  val GoodGdop = 4.0
  val FairGdop = 6.0
  val MaxGdopFactor = 4.0
  val AccuracyMultiplier = 0.5
  val ConfidenceWeight = 0.30
  val CollinearityThreshold = 0.01

  private val DegLatToMeters = 6371000.0 * math.Pi / 180.0
  private val MinDistanceMeters = 1.0
  private val MinApsForGdop = 3

  /** GDOP of `position` given AP `coordinates`, all `[lat, lon]` or
    * `[lat, lon, alt]` degrees/meters. Fewer than 3 APs, singular geometry, or
    * numerical failure → MaxAllowedGdop. */
  def calculateGDOP(
      coordinates: Array[Array[Double]],
      position: Array[Double],
      includeBiasTerm: Boolean): Double = {
    if (coordinates.length < MinApsForGdop || position == null) return MaxAllowedGdop
    val dims = position.length
    if (coordinates.exists(_.length < dims)) return MaxAllowedGdop

    try {
      val cols = if (includeBiasTerm) dims + 1 else dims
      val h = DenseMatrix.zeros[Double](coordinates.length, cols)
      coordinates.zipWithIndex.foreach { case (ap, i) =>
        val u = unitVector(ap, position)
        (0 until dims).foreach(j => h(i, j) = u(j))
        if (includeBiasTerm) h(i, cols - 1) = 1.0
      }
      val q = inv(h.t * h)
      val t = math.max(0.0, trace(q))
      val gdop = math.sqrt(t)
      if (gdop.isNaN || gdop.isInfinite) MaxAllowedGdop else math.min(MaxAllowedGdop, gdop)
    } catch {
      case _: Exception => MaxAllowedGdop // singular geometry
    }
  }

  /** Unit vector position→AP in local metric coordinates; APs within 1 m get
    * the stable default [1, 0, 0] to avoid a 0/0 blow-up. */
  private def unitVector(ap: Array[Double], position: Array[Double]): Array[Double] = {
    val dims = position.length
    val dx = (ap(0) - position(0)) * DegLatToMeters
    val dy =
      if (dims > 1) (ap(1) - position(1)) * DegLatToMeters * math.cos(math.toRadians(position(0)))
      else 0.0
    val dz = if (dims > 2) ap(2) - position(2) else 0.0
    val dist = math.sqrt(dx * dx + dy * dy + dz * dz)
    if (dist < MinDistanceMeters) {
      val u = Array.fill(dims)(0.0); u(0) = 1.0; u
    } else {
      val u = Array(dx / dist, dy / dist, dz / dist)
      u.take(dims)
    }
  }

  /** Piecewise GDOP→factor mapping in [1, 4] (`GDOPCalculator.java:603+`). */
  def calculateGDOPFactor(gdop: Double): Double =
    if (gdop <= ExcellentGdop) 1.0
    else if (gdop <= GoodGdop) 1.0 + 0.5 * ((gdop - ExcellentGdop) / (GoodGdop - ExcellentGdop))
    else if (gdop <= FairGdop) 1.5 + 0.5 * ((gdop - GoodGdop) / (FairGdop - GoodGdop))
    else math.min(MaxGdopFactor, 2.0 + (gdop - FairGdop) / 2.0)

  /** Condition number of a 2x2 covariance matrix via eigenvalues
    * (`GDOPCalculator.java:650`); near-singular → +inf (very poor geometry). */
  def conditionNumber(covLatLat: Double, covLonLon: Double, covLatLon: Double): Double = {
    val tr = covLatLat + covLonLon
    val det = covLatLat * covLonLon - covLatLon * covLatLon
    if (math.abs(det) < 1e-10) return Double.MaxValue
    val disc = math.sqrt(math.max(0.0, tr * tr - 4.0 * det))
    val l1 = (tr + disc) / 2.0
    val l2 = (tr - disc) / 2.0
    if (math.abs(l2) < 1e-15) Double.MaxValue else math.abs(l1) / math.abs(l2)
  }

  /** Collinearity test on member positions' coordinate covariance: the error
    * ellipse is a line when the smaller eigenvalue's share drops below the
    * variance-ratio threshold (`GDOPCalculator.java:248`, used by R6). */
  def isCollinear(lats: Seq[Double], lons: Seq[Double]): Boolean = {
    if (lats.size < 3) return false
    val mLat = lats.sum / lats.size
    val mLon = lons.sum / lons.size
    val covLL = lats.map(x => (x - mLat) * (x - mLat)).sum / lats.size
    val covNN = lons.map(x => (x - mLon) * (x - mLon)).sum / lons.size
    val covLN = lats.zip(lons).map { case (a, b) => (a - mLat) * (b - mLon) }.sum / lats.size
    val tr = covLL + covNN
    if (tr < 1e-20) return false // all points coincide — not a line
    val det = covLL * covNN - covLN * covLN
    val disc = math.sqrt(math.max(0.0, tr * tr - 4.0 * det))
    val lMin = (tr - disc) / 2.0
    lMin / tr < CollinearityThreshold
  }
}
