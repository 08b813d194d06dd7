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

  /** A10's fourth signal — CHANGING NEIGHBOR SETS (PAPER.md:57-69): a
    * stationary AP is co-observed with the same surrounding APs in every
    * time bucket; a mobile one's co-observation set churns. Input is the
    * raw sighting log `(u, tb, ap)` — device, time bucket, AP; the
    * neighbor set of `ap` in bucket `tb` is every other AP some device
    * saw in the same bucket. Churn is the mean Jaccard between
    * consecutive PRESENT buckets' neighbor sets, in exact integer micros
    * (sum of per-pair micros div pair count — no float).
    *
    * Scale shape: co-observation pairs come from ONE equi-join on
    * (device, bucket) — group sizes are bounded by radio range
    * physically, so the pair fan-out is per-scan-sized, never corpus-
    * quadratic; neighbor sets aggregate per (ap, bucket) and the churn
    * walk is a per-ap window. Output: (ap, n_buckets, churn_micro,
    * mobile = churn < 0.5). APs present in fewer than two buckets carry
    * no churn signal and are omitted. */
  def neighborChurn(obs: DataFrame): DataFrame = {
    val o = obs.select(col("u"), col("tb"), col("ap")).distinct()
    val pairs = o.as("a").join(o.as("b"), Seq("u", "tb"))
      .where(col("a.ap") =!= col("b.ap"))
      .select(col("a.ap").as("ap"), col("tb"), col("b.ap").as("nbr"))
      .distinct()
    val sets = pairs.groupBy("ap", "tb")
      .agg(sort_array(collect_set("nbr")).as("nbrs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ap").orderBy("tb")
    val cons = sets
      .withColumn("nxt", lead("nbrs", 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("ap"), expr(
        "(CAST(size(array_intersect(nbrs, nxt)) AS BIGINT) * 1000000)" +
          " div size(array_union(nbrs, nxt))").as("jm"))
    val buckets = sets.groupBy("ap").agg(count(lit(1)).as("n_buckets"))
    cons.groupBy("ap")
      .agg(sum("jm").as("sjm"), count(lit(1)).as("np"))
      .join(buckets, "ap")
      .select(col("ap"), col("n_buckets"),
        expr("sjm div np").as("churn_micro"))
      .withColumn("mobile", col("churn_micro") < 500000L)
  }

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
