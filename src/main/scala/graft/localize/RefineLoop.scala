package graft.localize

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** R7 ⊕ J5/S10 — the paper's full feedback loop (PAPER.md:198-213): persisted
  * per-AP state → batch localization → Kalman fusion with the prior →
  * relocation reset → state write-back.
  *
  * This is where the Bayesian tier consumes the REAL prior: the batch
  * localizer summarizes the current batch's evidence (WCL/MLE), and the
  * posterior published for an AP with history is the precision-weighted
  * Kalman fusion of that estimate with its persisted state
  * (`StateRefinement.update`), not a flat blend. An innovation beyond 3σ of
  * the combined uncertainty resets the state to the new estimate — the
  * paper's relocation procedure.
  *
  * Spark-first shape: `measurements.groupByKey(bssid) COGROUP state
  * .groupByKey(bssid)` — one hash shuffle per side, state is one row per AP
  * (dimension-sized, never broadcast as it scales with key cardinality),
  * per-group work is the capped localizer + O(1) filter math.
  *
  * Replay idempotence: each state row carries the fingerprint of the last
  * APPLIED estimate; re-running the loop over the same batch recomputes the
  * same deterministic estimate (the localizer's cap and accumulation order
  * are pinned), matches the fingerprint, and leaves the state untouched —
  * at-least-once orchestration cannot double-fuse a batch.
  */
object RefineLoop {

  /** Persisted state row (parquet schema at `statePath`): position plus the
    * full 2-D covariance (m², tangent axes) — var_lat/var_lon/cov, not one
    * isotropic scalar, so an AP constrained along a street keeps its
    * cross-street uncertainty. */
  final case class StateRow(
      bssid: String,
      lat: Double,
      lon: Double,
      var_lat_m2: Double,
      var_lon_m2: Double,
      cov_m2: Double,
      n: Long,
      relocations: Int,
      last_sig: Long)

  object StateRow {
    /** Isotropic convenience (tests, priming). */
    def apply(bssid: String, lat: Double, lon: Double, varianceM2: Double,
        n: Long, relocations: Int, lastSig: Long): StateRow =
      StateRow(bssid, lat, lon, varianceM2, varianceM2, 0.0, n, relocations, lastSig)
  }

  /** One loop result: the batch estimate, the posterior state, and the
    * filter diagnostics. */
  final case class Refined(
      bssid: String,
      est_lat: Double,
      est_lon: Double,
      n: Long,
      method: String,
      state_lat: Double,
      state_lon: Double,
      var_lat_m2: Double,
      var_lon_m2: Double,
      cov_m2: Double,
      state_n: Long,
      relocations: Int,
      innovation_m: Double,
      relocated: Boolean,
      applied: Boolean,
      /** Fingerprint of the batch estimate — the value persisted as
        * `last_sig` on apply, so the write-back and the replay comparison
        * share ONE implementation. */
      sig: Long)

  /** Batch-estimate variance (m², isotropic): the spread-based standard
    * error of the mean, floored at a 5 m sigma so a tight cluster cannot
    * claim impossible certainty. */
  def estimateVariance(loc: BatchLocalizer.ApLocation): Double =
    math.max(25.0, loc.spreadM * loc.spreadM / math.max(1L, loc.n))

  /** Batch-estimate covariance R (m², tangent axes): per-axis sample second
    * moments of the contributing measurements around the estimate, divided
    * by n again (variance OF THE MEAN), each axis floored at a 5 m sigma and
    * the cross term clamped inside ±0.9·σσ so R stays positive-definite. A
    * street-constrained AP thus reports a thin ellipse, not a circle. */
  def estimateCovariance(
      loc: BatchLocalizer.ApLocation,
      ms: Seq[BatchLocalizer.Measurement]): (Double, Double, Double) = {
    val mLat = StateRefinement.MetersPerDegLat
    val mLon = mLat * math.cos(math.toRadians(loc.lat))
    var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    ms.foreach { m =>
      val dx = (m.latitude - loc.lat) * mLat
      val dy = (m.longitude - loc.lon) * mLon
      sxx += dx * dx; syy += dy * dy; sxy += dx * dy
    }
    val n = math.max(1, ms.size).toDouble
    val rLat = math.max(25.0, sxx / n / n)
    val rLon = math.max(25.0, syy / n / n)
    val cap = 0.9 * math.sqrt(rLat * rLon)
    val rCov = math.max(-cap, math.min(cap, sxy / n / n))
    (rLat, rLon, rCov)
  }

  /** Deterministic fingerprint of an applied estimate (replay guard). */
  def fingerprint(loc: BatchLocalizer.ApLocation): Long = {
    var h = java.lang.Double.doubleToLongBits(loc.lat)
    h = h * 31 + java.lang.Double.doubleToLongBits(loc.lon)
    h = h * 31 + loc.n
    h
  }

  /** One refinement pass: localize every AP group, fuse with the persisted
    * prior, and return the per-AP loop results (state NOT yet written —
    * callers decide; `run` below persists). */
  def refineWith(
      spark: SparkSession,
      measurements: Dataset[BatchLocalizer.Measurement],
      priors: Dataset[StateRow],
      maxMeasurementsPerAp: Int = 1000): Dataset[Refined] = {
    import spark.implicits._
    measurements.groupByKey(_.bssid)
      .cogroup(priors.groupByKey(_.bssid)) { (bssid, ms, ps) =>
        val prior = ps.toSeq.headOption
        val capped = BatchLocalizer.cappedSorted(ms, maxMeasurementsPerAp)
        BatchLocalizer.localize(bssid, capped) match {
          case None => Iterator.empty // below bootstrap: state untouched
          case Some(loc) =>
            val (rLat, rLon, rCov) = estimateCovariance(loc, capped)
            val est = StateRefinement.Estimate(
              loc.lat, loc.lon, rLat, rLon, rCov, loc.n)
            val sig = fingerprint(loc)
            prior match {
              case Some(p) if p.last_sig == sig => // replayed batch: no-op
                Iterator.single(Refined(bssid, loc.lat, loc.lon, loc.n, loc.method,
                  p.lat, p.lon, p.var_lat_m2, p.var_lon_m2, p.cov_m2,
                  p.n, p.relocations,
                  innovation_m = 0.0, relocated = false, applied = false, sig))
              case Some(p) =>
                val r = StateRefinement.update(
                  StateRefinement.ApState(bssid, p.lat, p.lon,
                    p.var_lat_m2, p.var_lon_m2, p.cov_m2,
                    p.n, p.relocations), est)
                Iterator.single(Refined(bssid, loc.lat, loc.lon, loc.n, loc.method,
                  r.state.lat, r.state.lon,
                  r.state.pLatM2, r.state.pLonM2, r.state.pCovM2, r.state.n,
                  r.state.relocations, r.innovationM, r.relocated, applied = true,
                  sig))
              case None =>
                val s = StateRefinement.initial(bssid, est)
                Iterator.single(Refined(bssid, loc.lat, loc.lon, loc.n, loc.method,
                  s.lat, s.lon, s.pLatM2, s.pLonM2, s.pCovM2, s.n, s.relocations,
                  innovation_m = 0.0, relocated = false, applied = true, sig))
            }
        }
      }
  }

  /** Read the persisted state table (empty frame when absent). The state
    * lives as a [[graft.mutation.VersionedTable]] — per-key merge-on-read
    * upserts, never table rewrites (the reference golden-record
    * discipline, `WifiAccessPointLocationRepositoryImpl.java`). */
  def readState(spark: SparkSession, statePath: String): Dataset[StateRow] = {
    import spark.implicits._
    if (graft.mutation.VersionedTable.currentVersion(spark, statePath).isDefined)
      graft.mutation.VersionedTable.read(spark, statePath).as[StateRow]
    else spark.emptyDataset[StateRow]
  }

  /** Seed the state table (version 0) with prior rows — for priming a
    * dimension before the first [[run]]. */
  def initState(spark: SparkSession, statePath: String,
      prior: org.apache.spark.sql.DataFrame): Unit = {
    graft.mutation.VersionedTable.create(spark, statePath, prior)
    ()
  }

  /** Full loop against a persisted state table: read prior → refine → merge
    * the posterior back (keyed on bssid, upsert). Returns the loop results. */
  def run(
      spark: SparkSession,
      measurements: Dataset[BatchLocalizer.Measurement],
      statePath: String,
      maxMeasurementsPerAp: Int = 1000): DataFrame = {
    import spark.implicits._
    val refined = refineWith(
      spark, measurements, readState(spark, statePath), maxMeasurementsPerAp)
      .toDF()
      // The loop output is reused twice (state write + caller's read) and is
      // the product of a nondeterministic-order shuffle feeding the capped
      // localizer — materialize ONCE so both consumers see the same rows.
      .localCheckpoint(false)
    val stateUpdate = refined
      .where(col("applied")) // replays must not touch state
      .select(col("bssid"),
        col("state_lat").as("lat"), col("state_lon").as("lon"),
        col("var_lat_m2"), col("var_lon_m2"), col("cov_m2"),
        col("state_n").as("n"), col("relocations"),
        col("sig").as("last_sig"))
    // MERGE-ON-READ upsert: one equality-delete + one data segment per
    // loop, O(changed keys) bytes written — a 100 TB AP dimension never
    // gets rewritten by a refine batch (the r15 mergeByKey swap did)
    if (graft.mutation.VersionedTable.currentVersion(spark, statePath).isEmpty)
      graft.mutation.VersionedTable.create(spark, statePath, stateUpdate)
    else graft.mutation.VersionedTable.morUpsert(
      spark, statePath, stateUpdate, Seq("bssid"))
    refined
  }
}
