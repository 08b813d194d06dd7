package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Quality
import graft.localize.BatchLocalizer

/** Batch-localization queries exercising the R7 flatMapGroups path end to
  * end on the synthetic tables (user_id ≙ bssid; coordinates/RSSI/quality
  * synthesized deterministically from numeric columns with the engine's own
  * scalar functions).
  *
  * The per-group algorithm work (MLE gradient ascent) is not SQL-expressible,
  * so these register as rows-only checks; the numeric semantics are pinned by
  * `LocalizerSpec` instead. The tier COUNTS, however, are SQL-checkable and
  * oracled in `r7_tier_dispatch`.
  */
object LocalizeQueries {

  /** Full localizer over events: one shuffle localizes every key. */
  val batchLocalize: Reg = Reg.rowsOnly("r7_batch_localize") { (s, dir) =>
    implicit val spark = s
    val ev = Tables.events(s, dir)
    // Cluster each key's measurements within ~±150 m of a per-key anchor, the
    // shape real per-AP crowdsourced fixes have.
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 120) - 60 + (col("event_id") % 30) * 0.0001).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 37) * 0.0001).as("lon"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      Quality.qualityWeight(
        when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN"),
        col("value"), -(col("user_id") % 100)).as("w"))
    val measurements = BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")
    BatchLocalizer.localizeAll(s, measurements)
      .toDF()
      .select(col("bssid"), round(col("lat"), 4).as("lat"), round(col("lon"), 4).as("lon"),
        col("n"), col("method"), round(col("confidence"), 3).as("confidence"))
      .orderBy("bssid")
  }

  /** A10 full form + A9 local outliers over synthesized measurements:
    * spread + SSID-pattern + OUI flags, and grid-bucketed local-density
    * outliers (rows-only; components oracled separately in
    * a10_hotspot_detection / a9_outlier_mad). */
  val hotspotFull: Reg = Reg.rowsOnly("a10_hotspot_full") { (s, dir) =>
    import graft.analytics.Hotspots
    val ev = Tables.events(s, dir)
    val measurements = ev.select(
      // every 7th key gets a blacklisted OUI, every 5th a tethering SSID,
      // keys ≥ 130 roam widely — all three detector arms fire
      when(col("user_id") % 7 === 0,
        concat(lit("00:23:6c:00:00:"), format_string("%02x", col("user_id") % 250)))
        .otherwise(concat(lit("aa:bb:cc:dd:ee:"), format_string("%02x", col("user_id") % 250)))
        .as("bssid"),
      when(col("user_id") % 5 === 0, "Bob's iPhone").otherwise("HomeNet").as("ssid"),
      (when(col("user_id") >= 130, (col("event_id") % 100) * lit(0.01)).otherwise(lit(0.0))
        + (col("user_id") % 90)).as("latitude"),
      ((col("user_id") % 180) - 90 + (col("event_id") % 50) * 0.0001).as("longitude"))
    val verdicts = Hotspots.detect(measurements)
    val outliers = Hotspots.localOutliers(measurements)
    verdicts.agg(
      count(lit(1)).as("aps"),
      sum(when(col("is_hotspot"), 1).otherwise(0)).as("hotspots"),
      sum(when(col("wide_spread"), 1).otherwise(0)).as("wide_spread"),
      sum(when(col("ssid_pattern"), 1).otherwise(0)).as("ssid_pattern"),
      sum(when(col("blacklisted_oui"), 1).otherwise(0)).as("blacklisted_oui"))
      .crossJoin(outliers.agg(
        sum(when(col("local_outlier"), 1).otherwise(0)).as("local_outliers"),
        count(lit(1)).as("measurements")))
  }

  val all: Seq[Reg] = Seq(batchLocalize, hotspotFull)
}
