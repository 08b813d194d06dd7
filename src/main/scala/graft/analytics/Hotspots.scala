package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ingest.ScanIngest

/** A9 (local form) + A10 — hotspot detection and density-based local
  * outliers over the measurement fact table.
  *
  * A10 spec (PAPER.md:57-69): an AP is a mobile hotspot when its measurement
  * locations spread widely (high coordinate stddev), its SSID matches
  * tethering patterns ("AndroidAP", "iPhone", …), or its OUI belongs to the
  * mobile-device blacklist. A8 then purges flagged BSSIDs.
  *
  * A9 local form: the paper recommends LOF; the scalable rendering is a
  * grid-bucketed density score — points are hashed to ~150 m geocells, and a
  * point is locally anomalous when its cell's density is far below the mean
  * density of its AP's cells. Equi-joins on (bssid, cell) only: no kNN
  * all-pairs search, which is the part of LOF that cannot ship at 100 TB.
  */
object Hotspots {

  /** Tethering-SSID heuristic (case-insensitive). */
  def isHotspotSsid(ssid: Column): Column =
    coalesce(
      ssid.rlike("(?i)(androidap|iphone|galaxy|mi[- ]?fi|mobile ?hotspot|personal hotspot)"),
      lit(false))

  /** OUI-blacklist membership on a normalized bssid. */
  def isHotspotOui(bssid: Column, blacklist: Seq[String] = ScanIngest.Config.DefaultHotspotOuis): Column =
    ScanIngest.oui(bssid).isin(blacklist: _*)

  /** A10 — per-BSSID hotspot verdict. Input columns: bssid, ssid, latitude,
    * longitude. Output: bssid, n, spread flags and the combined verdict. */
  def detect(measurements: DataFrame, spreadStddevDegrees: Double = 0.01): DataFrame =
    measurements
      .groupBy("bssid")
      .agg(
        count(lit(1)).as("n"),
        stddev_samp("latitude").as("sd_lat"),
        stddev_samp("longitude").as("sd_lon"),
        max(when(isHotspotSsid(col("ssid")), 1).otherwise(0)).as("ssid_hit"),
        max(when(isHotspotOui(col("bssid")), 1).otherwise(0)).as("oui_hit"))
      .select(
        col("bssid"), col("n"),
        (coalesce(col("sd_lat"), lit(0.0)) > spreadStddevDegrees ||
          coalesce(col("sd_lon"), lit(0.0)) > spreadStddevDegrees).as("wide_spread"),
        (col("ssid_hit") === 1).as("ssid_pattern"),
        (col("oui_hit") === 1).as("blacklisted_oui"))
      .withColumn("is_hotspot",
        col("wide_spread") || col("ssid_pattern") || col("blacklisted_oui"))

  /** ~150 m geocell id (0.0015° grid) — the bucketing key for local-density
    * scoring. Stable, partition-friendly, no library dependency. */
  def geocell(lat: Column, lon: Column, cellDegrees: Double = 0.0015): Column =
    concat_ws("_",
      floor(lat / cellDegrees).cast("long"),
      floor(lon / cellDegrees).cast("long"))

  /** A9 local outliers: per (bssid, cell) density vs the AP's mean cell
    * density. Returns the input plus `cell_count` and `local_outlier`
    * (density below `ratio` × mean). */
  def localOutliers(measurements: DataFrame, ratio: Double = 0.2): DataFrame = {
    val withCell = measurements
      .withColumn("cell", geocell(col("latitude"), col("longitude")))
    val cellCounts = withCell.groupBy("bssid", "cell").agg(count(lit(1)).as("cell_count"))
    val apMean = cellCounts.groupBy("bssid").agg(avg("cell_count").as("mean_cell_count"))
    withCell
      .join(cellCounts, Seq("bssid", "cell"))
      .join(apMean, "bssid")
      .withColumn("local_outlier", col("cell_count") < col("mean_cell_count") * ratio)
      .drop("mean_cell_count")
  }
}
