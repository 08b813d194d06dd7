package graft.localize

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.AlgoUtil

/** R7 — batch AP localization: ONE shuffle localizes every AP.
  *
  * The reference fetches per-AP measurements by running Athena SQL once per
  * MAC address, serially (`wifi-data-pipeline-computation/.../APMeasurementsLookUpService.java:62-163`),
  * and its batch algorithms are stubs whose intended semantics live in the
  * paper doc (`documents/A Framework...md` — PAPER.md:127-169: N≥20
  * bootstrap WCL, N≥50 MLE, N≥100 Bayesian; batch WCL weight =
  * quality_weight · 10^(rssi/10), PAPER.md:135-139).
  *
  * Spark-first shape: `groupByKey(bssid).flatMapGroups(localize)` — the
  * serial per-MAC loop collapses into one hash shuffle over the fact table.
  * Scale properties:
  *  - measurements per AP are capped (`maxMeasurementsPerAp`, mirroring the
  *    reference's Athena LIMIT `:156-157`) so a mega-hotspot BSSID cannot
  *    skew a task; the cap keeps per-group state bounded at ~100 TB scale;
  *  - the iterator is consumed once through a bounded priority queue (top-k
  *    under a stable total order), so memory per group is O(cap), not
  *    O(group), and the capped subset is deterministic;
  *  - MLE iterations are bounded (≤100, lr-halving) — no unbounded loops
  *    inside a task.
  */
object BatchLocalizer {

  /** One measurement of one AP from one device report (flattened fact row). */
  final case class Measurement(
      bssid: String,
      latitude: Double,
      longitude: Double,
      rssi: Double,
      qualityWeight: Double)

  /** Refined per-AP location estimate (the AP "golden record" update). */
  final case class ApLocation(
      bssid: String,
      lat: Double,
      lon: Double,
      n: Long,
      method: String,
      confidence: Double,
      spreadM: Double)

  val BootstrapThreshold = 20  // N>=20 → WCL      (PAPER.md:127)
  val MleThreshold = 50        // N>=50 → MLE      (PAPER.md:161-169)
  val BayesianThreshold = 100  // N>=100 → Bayesian

  /** Batch WCL: w = quality_weight * 10^(rssi/10) (PAPER.md:135-139). */
  def wcl(ms: Seq[Measurement]): (Double, Double) = {
    var sw = 0.0; var sLat = 0.0; var sLon = 0.0
    ms.foreach { m =>
      val w = m.qualityWeight * math.pow(10, m.rssi / 10.0)
      sw += w; sLat += m.latitude * w; sLon += m.longitude * w
    }
    if (sw <= 0) {
      (ms.map(_.latitude).sum / ms.size, ms.map(_.longitude).sum / ms.size)
    } else (sLat / sw, sLon / sw)
  }

  /** Batch MLE: refine the WCL start by gradient ascent on the Gaussian
    * log-likelihood of observed RSSI under the log-distance model
    * (PAPER.md:147-159; σ = 6 dB crowdsourced-data tier, exponent 3.0). */
  def mle(ms: Seq[Measurement], start: (Double, Double), maxIter: Int = 100): (Double, Double) = {
    val sigma = 6.0
    val n = 3.0
    val refRssi = -40.0
    def expected(d: Double): Double = refRssi - 10.0 * n * math.log10(math.max(d, 1.0))
    def ll(lat: Double, lon: Double): Double = ms.map { m =>
      val d = AlgoUtil.distanceMeters(lat, lon, None, m.latitude, m.longitude, None)
      val e = m.rssi - expected(d)
      -(e * e) / (2 * sigma * sigma) * m.qualityWeight
    }.sum

    var best = start
    var bestLL = ll(best._1, best._2)
    var lr = 1e-4 // degrees; ~11 m initial step
    var iter = 0
    while (iter < maxIter && lr >= 1e-7) {
      var gLat = 0.0; var gLon = 0.0
      ms.foreach { m =>
        val d = math.max(1.0,
          AlgoUtil.distanceMeters(best._1, best._2, None, m.latitude, m.longitude, None))
        val e = m.rssi - expected(d)
        // Ascent direction: observed stronger than modeled (e > 0) means the
        // AP is closer to this measurement than d — step TOWARD it. (The
        // away-from-measurement sign decreases LL on every step and the
        // accept-if-better guard then silently freezes the WCL start.)
        val scale = e / (sigma * sigma * d) * m.qualityWeight
        gLat += scale * (m.latitude - best._1)
        gLon += scale * (m.longitude - best._2)
      }
      val norm = math.max(1e-12, math.sqrt(gLat * gLat + gLon * gLon))
      val cand = (best._1 + lr * gLat / norm, best._2 + lr * gLon / norm)
      val candLL = ll(cand._1, cand._2)
      if (candLL > bestLL) { bestLL = candLL; best = cand } else lr *= 0.5
      iter += 1
    }
    best
  }

  /** Localize one AP's measurement group; None below the bootstrap gate. */
  def localize(bssid: String, ms: Seq[Measurement]): Option[ApLocation] = {
    val n = ms.size
    if (n < BootstrapThreshold) return None
    val (wLat, wLon) = wcl(ms)
    val (method, lat, lon) =
      if (n >= BayesianThreshold) {
        // Bayesian tier: Gaussian posterior = precision-weighted blend of the
        // MLE refinement with the WCL "prior" (flat-prior special case of the
        // paper's iterative update; a persisted AP state would slot in here).
        val (mLat, mLon) = mle(ms, (wLat, wLon))
        val priorWeight = BootstrapThreshold.toDouble / n // prior fades with evidence
        ("bayesian", priorWeight * wLat + (1 - priorWeight) * mLat,
          priorWeight * wLon + (1 - priorWeight) * mLon)
      } else if (n >= MleThreshold) {
        val (mLat, mLon) = mle(ms, (wLat, wLon))
        ("mle", mLat, mLon)
      } else ("wcl", wLat, wLon)

    // Spread of contributing measurements around the estimate (diagnostic +
    // hotspot signal): mean haversine distance.
    val spread = ms.map(m =>
      AlgoUtil.distanceMeters(lat, lon, None, m.latitude, m.longitude, None)).sum / n
    // Confidence grows with evidence, shrinks with spread (bounded [0.1, 0.95]).
    val confidence = AlgoUtil.clamp(
      math.min(0.95, 0.5 + 0.1 * math.log10(n.toDouble)) * (1.0 / (1.0 + spread / 500000.0)),
      0.1, 0.95)
    Some(ApLocation(bssid, lat, lon, n.toLong, method, confidence, spread))
  }

  /** Distributed entry: measurements → per-AP locations.
    *
    * One `groupByKey` shuffle on bssid; per-group work is capped and bounded.
    * At 100 TB the input should arrive pre-filtered (A1/A2 predicates pushed
    * to the parquet scan) and optionally pre-bucketed by bssid to make this
    * shuffle-free.
    */
  def localizeAll(
      spark: SparkSession,
      measurements: Dataset[Measurement],
      maxMeasurementsPerAp: Int = 1000): Dataset[ApLocation] = {
    import spark.implicits._
    measurements
      .groupByKey(_.bssid)
      .flatMapGroups { (bssid, it) =>
        localize(bssid, cappedSorted(it, maxMeasurementsPerAp)).iterator
      }
  }

  /** Deterministic cap: keep the top-k under a stable total order over the
    * measurement fields (bounded max-heap, O(cap) memory), returned in
    * ascending order. First-k in shuffle-fetch arrival order would make
    * group MEMBERSHIP vary across runs/task retries for over-cap groups —
    * the reference caps deterministically too (Athena ORDER BY ... DESC
    * LIMIT, APMeasurementsLookUpService.java:156-157), and float
    * accumulation (WCL sums, MLE path) is order-sensitive, so the ascending
    * sort also pins the arithmetic. */
  def cappedSorted(it: Iterator[Measurement], cap: Int): Seq[Measurement] = {
    val ord: Ordering[Measurement] =
      Ordering.by(m => (m.latitude, m.longitude, m.rssi, m.qualityWeight))
    val pq = new scala.collection.mutable.PriorityQueue[Measurement]()(ord)
    it.foreach { m =>
      if (pq.size < cap) pq.enqueue(m)
      else if (ord.lt(m, pq.head)) { pq.dequeue(); pq.enqueue(m) }
    }
    pq.dequeueAll.reverse.toSeq
  }

  /** DataFrame adapter: map arbitrary columns onto the Measurement schema. */
  def fromColumns(
      df: DataFrame,
      bssid: String, lat: String, lon: String, rssi: String, weight: String)(
      implicit spark: SparkSession): Dataset[Measurement] = {
    import spark.implicits._
    df.select(
      col(bssid).cast("string").as("bssid"),
      col(lat).cast("double").as("latitude"),
      col(lon).cast("double").as("longitude"),
      col(rssi).cast("double").as("rssi"),
      col(weight).cast("double").as("qualityWeight"))
      .as[Measurement]
  }
}
