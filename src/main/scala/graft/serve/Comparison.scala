package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** C1–C5 — the A/B comparison layer between two positioning services
  * ("VLSS" external vs this engine), as column expressions over a DataFrame
  * of paired responses.
  *
  * Reference: `wifi-positioning-integration-service/.../service/ComparisonService.java:29,288-299`
  * (haversine + expected uncertainty), `dto/ComparisonScenario.java:99-165`
  * (scenario classification), `service/AccessPointEnrichmentService.java:23-36`
  * (AP enrichment), `mapper/VLSSInterfaceMapper.java` (request mapping).
  */
object Comparison {

  /** C3 — scenario classification. Inputs are nullable columns; semantics
    * mirror `ComparisonScenario.determineScenario` exactly, including the
    * 250 m cell-fallback accuracy threshold and the insufficient-AP error
    * sniffing. */
  def scenario(
      vlssSuccess: Column,
      friscoSuccess: Column,
      friscoError: Column,
      vlssAccuracy: Column): Column = {
    val err = lower(coalesce(friscoError, lit("")))
    val insufficientAp =
      err.contains("no known access points found in database") ||
        err.contains("no access points with valid status found") ||
        (err.contains("insufficient") && err.contains("access point"))
    val cellAccuracy = vlssAccuracy.isNotNull && vlssAccuracy >= 250.0

    when(vlssSuccess.isNull, "FRISCO_ONLY_ANALYSIS")
      .when(vlssSuccess && coalesce(friscoSuccess, lit(false)), "BOTH_WIFI_SUCCESS")
      .when(vlssSuccess && insufficientAp && cellAccuracy, "VLSS_CELL_FALLBACK_DETECTED")
      .when(vlssSuccess && cellAccuracy, "VLSS_SUCCESS_FRISCO_ERROR_CELL")
      .when(vlssSuccess, "VLSS_SUCCESS_FRISCO_ERROR_WIFI")
      .when(coalesce(friscoSuccess, lit(false)), "VLSS_ERROR_FRISCO_SUCCESS")
      .otherwise("BOTH_INSUFFICIENT_DATA")
  }

  /** C1+C2 — distance between the two estimates and whether it is explained
    * by combined uncertainty. Adds `distance_m`, `expected_uncertainty_m`,
    * `within_expected`. */
  def withComparisonMetrics(
      paired: DataFrame,
      vLat: String = "vlss_lat", vLon: String = "vlss_lon", vAcc: String = "vlss_accuracy",
      fLat: String = "frisco_lat", fLon: String = "frisco_lon",
      fAcc: String = "frisco_accuracy"): DataFrame = {
    val dist = Geo.haversineMeters(col(vLat), col(vLon), col(fLat), col(fLon))
    paired
      .withColumn("distance_m", dist)
      .withColumn("expected_uncertainty_m", Geo.expectedUncertainty(col(vAcc), col(fAcc)))
      .withColumn("within_expected", col("distance_m") <= col("expected_uncertainty_m"))
  }

  /** C4 — AP enrichment: merge the request's scanned MACs with the
    * calculation's AP diagnostics into one struct column per AP. */
  def enrichAccessPoints(
      requestAps: DataFrame,  // (request_id, mac, rssi)
      calcInfo: DataFrame     // (request_id, mac, status, usage, lat, lon)
  ): DataFrame =
    requestAps.join(calcInfo, Seq("request_id", "mac"), "left")
      .select(col("request_id"),
        struct(col("mac"), col("rssi"), col("status"), col("usage"),
          col("lat"), col("lon")).as("access_point"))

  /** C5 — external (VLSS-shaped) request → internal request mapping:
    * select/rename with unit normalization. */
  def mapExternalRequest(external: DataFrame): DataFrame =
    external.select(
      col("id").as("request_id"),
      col("client"),
      explode(col("wifiInfo")).as("scan"))
      .select(
        col("request_id"), col("client"),
        graft.ingest.ScanIngest.normalizeBssid(col("scan.macAddress")).as("mac"),
        col("scan.rssi").cast("double").as("signal_strength"),
        col("scan.frequency").cast("int").as("frequency_mhz"))
}
