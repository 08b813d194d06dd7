package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.algo.AlgoUtil

/** Streaming analytics over the measurement stream (§2.9 extended): the
  * reference's batch detectors re-expressed as Structured Streaming
  * operators so the pipeline can flag problems at ingest time instead of on
  * the next maintenance run.
  *
  *  - `windowedApStats`: per-AP tumbling-window signal stats via a
  *    watermarked event-time window aggregation — append mode emits each
  *    window exactly once, when the watermark passes its end; state is
  *    bounded by (watermark delay / window) × |active APs|.
  *  - `relocationAlerts`: the A11 lag-jump detector as per-AP custom state
  *    (`flatMapGroupsWithState`): an anchor position is maintained per
  *    BSSID and a relocation alert fires after `confirmFixes` CONSECUTIVE
  *    fixes beyond `jumpMeters` (one outlier fix never fires — same
  *    confirmation idea as the batch CUSUM). Event-time timeout evicts
  *    idle-AP state, so state scales with ACTIVE APs, not all APs ever
  *    seen — the property that keeps this runnable forever at 100 TB/day.
  *
  * The full DBSCAN bi-modality analysis (`Relocation.analyze`) stays a
  * batch job by design: it needs an AP's whole history, not a stream
  * suffix; the streaming detector is the early-warning trigger that
  * ENQUEUES an AP for that batch analysis.
  */
object StreamOps {

  /** Per-AP per-window stats. Input needs (bssid, rssi, event_time). */
  def windowedApStats(
      measurements: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    measurements
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration), col("bssid"))
      .agg(
        count(lit(1)).as("n"),
        avg("rssi").as("mean_rssi"),
        min("rssi").as("min_rssi"),
        max("rssi").as("max_rssi"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("bssid"), col("n"), col("mean_rssi"), col("min_rssi"), col("max_rssi"))

  /** Device scan-burst sessionization: `session_window` groups a device's
    * fixes into activity sessions separated by `gap` of silence — the
    * streaming shape of "one positioning request's scan burst" (the
    * reference's consumer batches per device report; sessions generalize
    * that to bursty devices). State per open session only; the watermark
    * closes sessions and emits them exactly once in append mode.
    * Input needs (device_id, rssi, event_time). */
  def sessionizedDeviceActivity(
      measurements: DataFrame,
      gap: String = "5 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    measurements
      .withWatermark("event_time", watermarkDelay)
      .groupBy(session_window(col("event_time"), gap), col("device_id"))
      .agg(
        count(lit(1)).as("n_scans"),
        avg("rssi").as("mean_rssi"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("device_id"), col("n_scans"), col("mean_rssi"))

  /** Streaming exact dedup on the F13 event_id — the reference consumer's
    * at-least-once Kafka delivery makes replays routine, and
    * `dropDuplicatesWithinWatermark` is the bounded-state form: a duplicate
    * arriving within the watermark delay is dropped, and the dedup state for
    * an id is evicted once the watermark passes it (an unbounded
    * `dropDuplicates` would hold every id ever seen — the 100 TB/day
    * state leak). Input needs (event_id, event_time) + payload columns. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: attach each measurement to the relocation
    * /quality alerts its AP raised in the preceding `horizon` — the
    * "should this fix be trusted?" enrichment, computed stream-side instead
    * of via a driver lookup. LEFT OUTER: an alert-free measurement is the
    * common case and must still flow through (with null alert columns) —
    * an inner join would make "no alert" indistinguishable from "no data"
    * for the downstream trust gate. Both sides are watermarked and the
    * join condition bounds alert_time to [scan_time − horizon, scan_time],
    * so Spark can evict join state as the watermarks advance (unmatched
    * rows emit once the watermark proves no alert can still arrive).
    * Inputs: measurements (bssid, event_time, …), alerts (bssid,
    * alert_time, …). */
  def joinAlertsToScans(
      measurements: DataFrame,
      alerts: DataFrame,
      horizon: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val m = measurements.withWatermark("event_time", watermarkDelay)
    val a = alerts.withWatermark("alert_time", watermarkDelay)
      .withColumnRenamed("bssid", "alert_bssid")
    m.join(a,
      col("bssid") === col("alert_bssid") &&
        col("alert_time") <= col("event_time") &&
        col("alert_time") >= col("event_time") - expr(s"INTERVAL $horizon"),
      "left_outer")
      .drop("alert_bssid")
  }

  final case class RelocationAlert(
      bssid: String,
      fromLat: Double, fromLon: Double,
      toLat: Double, toLon: Double,
      distanceM: Double,
      atMillis: Long,
      fixesSeen: Long)

  /** Per-AP detector state: the smoothed anchor plus the current streak of
    * consecutive beyond-threshold fixes. */
  final case class RelocState(
      anchorLat: Double, anchorLon: Double,
      fixesSeen: Long, farStreak: Int,
      lastFarLat: Double, lastFarLon: Double, lastFarTs: Long)

  /** Online relocation alerts. Input needs (bssid, lat, lon, event_time).
    *
    * Within a trigger the group's new fixes are processed in event-time
    * order (the iterator's arrival order is shuffle-dependent); near fixes
    * fold into the anchor with EMA weight `alpha`, far fixes build the
    * confirmation streak. State times out `stateTtl` past the watermark —
    * an AP silent that long re-bootstraps its anchor on next contact. */
  def relocationAlerts(
      spark: SparkSession,
      fixes: DataFrame,
      jumpMeters: Double = 500.0,
      confirmFixes: Int = 3,
      alpha: Double = 0.2,
      watermarkDelay: String = "30 minutes",
      stateTtlMillis: Long = 24L * 3600 * 1000): Dataset[RelocationAlert] = {
    import spark.implicits._
    fixes
      .withWatermark("event_time", watermarkDelay)
      // the watermarked event_time column itself must reach the stateful
      // operator — projecting it to a long would discard the watermark
      .select(col("bssid").cast("string"),
        col("lat").cast("double"), col("lon").cast("double"),
        col("event_time"))
      .as[(String, Double, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bssid: String, rows: Iterator[(String, Double, Double, java.sql.Timestamp)],
         state: GroupState[RelocState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.map { case (b, la, lo, t) => (b, la, lo, t.getTime) }
              .toSeq.sortBy(f => (f._4, f._2, f._3))
            var s = state.getOption.getOrElse(
              RelocState(Double.NaN, Double.NaN, 0L, 0, 0.0, 0.0, 0L))
            val alerts = Seq.newBuilder[RelocationAlert]
            batch.foreach { case (_, lat, lon, ts) =>
              if (s.fixesSeen == 0L) {
                s = RelocState(lat, lon, 1L, 0, 0.0, 0.0, 0L)
              } else {
                val d = AlgoUtil.distanceMeters(
                  s.anchorLat, s.anchorLon, None, lat, lon, None)
                if (d > jumpMeters) {
                  val streak = s.farStreak + 1
                  if (streak >= confirmFixes) {
                    alerts += RelocationAlert(bssid, s.anchorLat, s.anchorLon,
                      lat, lon, d, ts, s.fixesSeen)
                    s = RelocState(lat, lon, 1L, 0, 0.0, 0.0, 0L) // re-anchor
                  } else {
                    s = s.copy(farStreak = streak,
                      lastFarLat = lat, lastFarLon = lon, lastFarTs = ts)
                  }
                } else {
                  // near fix: fold into the anchor, clear any streak (the
                  // far fixes were transient — multipath, not movement)
                  s = RelocState(
                    s.anchorLat + alpha * (lat - s.anchorLat),
                    s.anchorLon + alpha * (lon - s.anchorLon),
                    s.fixesSeen + 1, 0, 0.0, 0.0, 0L)
                }
              }
            }
            state.update(s)
            // Evict state stateTtl past the newest event this AP produced
            // (clamped to sit past the current watermark, which Spark
            // requires for event-time timeouts).
            val base = math.max(
              batch.map(_._4).max, state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(base + stateTtlMillis)
            alerts.result().iterator
          }
      }
  }
}
