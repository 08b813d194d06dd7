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

  /** Persisted per-AP state: position + isotropic variance (m²) + evidence. */
  final case class ApState(
      bssid: String,
      lat: Double,
      lon: Double,
      varianceM2: Double,
      n: Long,
      relocations: Int = 0)

  /** A new batch estimate z_k with its covariance R_k (isotropic, m²). */
  final case class Estimate(lat: Double, lon: Double, varianceM2: Double, n: Long)

  /** Innovation threshold: relocation suspected when the new estimate sits
    * more than k standard deviations (of the combined uncertainty) from the
    * prior state. */
  val RelocationSigma = 3.0

  final case class UpdateResult(state: ApState, innovationM: Double, relocated: Boolean)

  /** One filter step: prior state ⊕ new estimate → posterior.
    *
    * Static-position model (no process noise while an AP stays put):
    * gain K = P / (P + R); posterior mean = prior + K·innovation; posterior
    * variance = (1−K)·P. A relocation (innovation > 3σ of √(P+R)) resets the
    * state to the new estimate instead of fusing — the paper's "state reset
    * procedure". */
  def update(prior: ApState, estimate: Estimate): UpdateResult = {
    val innovation = AlgoUtil.distanceMeters(
      prior.lat, prior.lon, None, estimate.lat, estimate.lon, None)
    val combinedSigma = math.sqrt(prior.varianceM2 + estimate.varianceM2)
    if (innovation > RelocationSigma * combinedSigma) {
      UpdateResult(
        ApState(prior.bssid, estimate.lat, estimate.lon, estimate.varianceM2,
          estimate.n, prior.relocations + 1),
        innovation, relocated = true)
    } else {
      val k = prior.varianceM2 / (prior.varianceM2 + estimate.varianceM2)
      UpdateResult(
        ApState(
          prior.bssid,
          prior.lat + k * (estimate.lat - prior.lat),
          prior.lon + k * (estimate.lon - prior.lon),
          (1.0 - k) * prior.varianceM2,
          prior.n + estimate.n,
          prior.relocations),
        innovation, relocated = false)
    }
  }

  /** Bootstrap a state from a first estimate. */
  def initial(bssid: String, estimate: Estimate): ApState =
    ApState(bssid, estimate.lat, estimate.lon, estimate.varianceM2, estimate.n)

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
