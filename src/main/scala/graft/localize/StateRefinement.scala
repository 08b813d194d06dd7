package graft.localize

import graft.algo.AlgoUtil

/** The paper's iterative-refinement loop (PAPER.md "Feedback Loop for
  * Continuous Improvement" + "Detecting Relocation via the Filter"):
  * a static-position Kalman filter over per-AP location state, with
  * innovation-based relocation detection (A11's change-point trigger) and
  * a CUSUM detector over the measurement time series.
  *
  * Pure Scala — runs inside `flatMapGroups` next to the localizer, or
  * driver-side over the small AP-state dimension.
  */
object StateRefinement {

  /** Meters per degree of latitude (spherical mean radius — matches
    * `AlgoUtil.distanceMeters`' sphere to first order). */
  val MetersPerDegLat: Double = 111320.0

  /** Persisted per-AP state: position + 2-D position covariance P (m²,
    * local tangent axes: lat = north, lon = east) + evidence. An AP
    * constrained along a street keeps a tight along-street variance
    * WITHOUT shrinking its cross-street variance — the isotropic scalar
    * form cannot represent that. */
  final case class ApState(
      bssid: String,
      lat: Double,
      lon: Double,
      pLatM2: Double,
      pLonM2: Double,
      pCovM2: Double,
      n: Long,
      relocations: Int = 0) {
    /** Isotropic summary (mean of the axis variances) — the scalar the
      * pre-2-D schema persisted; kept for diagnostics and old assertions. */
    def varianceM2: Double = 0.5 * (pLatM2 + pLonM2)
  }

  object ApState {
    /** Isotropic convenience: σ² on both axes, no cross term. */
    def apply(bssid: String, lat: Double, lon: Double, varianceM2: Double,
        n: Long, relocations: Int): ApState =
      ApState(bssid, lat, lon, varianceM2, varianceM2, 0.0, n, relocations)
  }

  /** A new batch estimate z_k with its covariance R_k (m², same axes). */
  final case class Estimate(
      lat: Double, lon: Double,
      rLatM2: Double, rLonM2: Double, rCovM2: Double,
      n: Long) {
    def varianceM2: Double = 0.5 * (rLatM2 + rLonM2)
  }

  object Estimate {
    /** Isotropic convenience. */
    def apply(lat: Double, lon: Double, varianceM2: Double, n: Long): Estimate =
      Estimate(lat, lon, varianceM2, varianceM2, 0.0, n)
  }

  /** Innovation threshold: relocation suspected when the new estimate sits
    * more than k standard deviations (Mahalanobis, under the combined
    * covariance P+R) from the prior state. */
  val RelocationSigma = 3.0

  final case class UpdateResult(state: ApState, innovationM: Double, relocated: Boolean)

  /** One filter step: prior state ⊕ new estimate → posterior.
    *
    * Static-position model (no process noise while an AP stays put), full
    * 2-D form: innovation y is the tangent-plane displacement in meters,
    * S = P + R, gain K = P·S⁻¹, posterior mean = prior + K·y, posterior
    * covariance P' = P − P·S⁻¹·P (symmetric and PD by construction: it
    * equals P·R·S⁻¹). A relocation (Mahalanobis distance √(yᵀS⁻¹y) > 3)
    * resets the state to the new estimate instead of fusing — the paper's
    * "state reset procedure". With isotropic inputs every formula reduces
    * exactly to the scalar filter (K = P/(P+R), P' = (1−K)P). */
  def update(prior: ApState, estimate: Estimate): UpdateResult = {
    val innovation = AlgoUtil.distanceMeters(
      prior.lat, prior.lon, None, estimate.lat, estimate.lon, None)
    // innovation vector on the local tangent plane at the prior (meters)
    val mPerDegLon = MetersPerDegLat * math.cos(math.toRadians(prior.lat))
    val yLat = (estimate.lat - prior.lat) * MetersPerDegLat
    val yLon = (estimate.lon - prior.lon) * mPerDegLon

    // S = P + R, with a PD guard: variances floored at 1 m², cross term
    // clamped below ±0.99·σσ so det(S) can never hit zero.
    val sLat = math.max(1.0, prior.pLatM2 + estimate.rLatM2)
    val sLon = math.max(1.0, prior.pLonM2 + estimate.rLonM2)
    val sCovRaw = prior.pCovM2 + estimate.rCovM2
    val covCap = 0.99 * math.sqrt(sLat * sLon)
    val sCov = math.max(-covCap, math.min(covCap, sCovRaw))
    val det = sLat * sLon - sCov * sCov
    // S⁻¹
    val iLat = sLon / det
    val iLon = sLat / det
    val iCov = -sCov / det

    val mahalanobis2 =
      yLat * (iLat * yLat + iCov * yLon) + yLon * (iCov * yLat + iLon * yLon)
    if (mahalanobis2 > RelocationSigma * RelocationSigma) {
      UpdateResult(
        ApState(prior.bssid, estimate.lat, estimate.lon,
          estimate.rLatM2, estimate.rLonM2, estimate.rCovM2,
          estimate.n, prior.relocations + 1),
        innovation, relocated = true)
    } else {
      // K = P·S⁻¹ (2×2)
      val k11 = prior.pLatM2 * iLat + prior.pCovM2 * iCov
      val k12 = prior.pLatM2 * iCov + prior.pCovM2 * iLon
      val k21 = prior.pCovM2 * iLat + prior.pLonM2 * iCov
      val k22 = prior.pCovM2 * iCov + prior.pLonM2 * iLon
      val dLatM = k11 * yLat + k12 * yLon
      val dLonM = k21 * yLat + k22 * yLon
      // P' = P − K·P (= P − P·S⁻¹·P; symmetric: both P and S⁻¹ are)
      val p11 = prior.pLatM2 - (k11 * prior.pLatM2 + k12 * prior.pCovM2)
      val p22 = prior.pLonM2 - (k21 * prior.pCovM2 + k22 * prior.pLonM2)
      val p12 = prior.pCovM2 - (k11 * prior.pCovM2 + k12 * prior.pLonM2)
      UpdateResult(
        ApState(
          prior.bssid,
          prior.lat + dLatM / MetersPerDegLat,
          prior.lon + dLonM / math.max(1e-6, mPerDegLon),
          p11, p22, p12,
          prior.n + estimate.n,
          prior.relocations),
        innovation, relocated = false)
    }
  }

  /** Bootstrap a state from a first estimate. */
  def initial(bssid: String, estimate: Estimate): ApState =
    ApState(bssid, estimate.lat, estimate.lon,
      estimate.rLatM2, estimate.rLonM2, estimate.rCovM2, estimate.n)

  /** Paper Stage 3 — RSSI denoising: a 1-D constant-level Kalman smoother
    * over a per-AP RSSI time series (the paper recommends an FCM-Kalman
    * combination for non-Gaussian noise; this is the Kalman half, with the
    * measurement σ tiered by signal strength like the MLE models — the FCM
    * membership step would pre-weight observations and slots in as the
    * `measurementVar` input).
    *
    * processVar (dB²/step) tolerates slow drift; measurementVar is the
    * per-sample noise. Returns the smoothed series, same length. */
  def denoiseRssi(
      series: Seq[Double],
      processVar: Double = 0.5,
      measurementVar: Double = 9.0): Seq[Double] = {
    if (series.isEmpty) return Nil
    var x = series.head
    var p = measurementVar
    series.map { z =>
      p += processVar                 // predict (level model: x unchanged)
      val k = p / (p + measurementVar) // gain
      x += k * (z - x)                // correct
      p *= (1.0 - k)
      x
    }
  }

  /** A11 — CUSUM change-point detection over a 1-D measurement series
    * (e.g. per-AP distance-to-state over time): returns indices where the
    * cumulative drift statistic crosses `threshold`, resetting after each
    * detection. `drift` is the tolerated per-step slack (both in the
    * series' units). */
  def cusumChangePoints(series: Seq[Double], threshold: Double, drift: Double): Seq[Int] = {
    if (series.isEmpty) return Nil
    val mean0 = series.take(math.max(1, series.size / 4)).sum /
      math.max(1, series.size / 4) // baseline from the leading window
    val out = Seq.newBuilder[Int]
    var pos = 0.0
    var neg = 0.0
    series.zipWithIndex.foreach { case (x, i) =>
      pos = math.max(0.0, pos + (x - mean0 - drift))
      neg = math.max(0.0, neg + (mean0 - x - drift))
      if (pos > threshold || neg > threshold) {
        out += i
        pos = 0.0
        neg = 0.0
      }
    }
    out.result()
  }
}
