package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Measurement-quality scalar functions (reference semantics F15/F16).
  *
  * - quality_weight: CONNECTED rows weigh 2.0, SCAN rows 1.0; a CONNECTED row
  *   with linkSpeed < 50 Mbps but strong RSSI (> -70 dBm) is demoted to 1.5
  *   (`wifi-measurements-transformer-service/.../WifiDataTransformationService.java:653-660`,
  *   constants `:275-277,521`; config `application.yml:134-136`).
  * - quality_score: min(1.0, 0.5 + 0.3*max(0, 1 - accuracy/100) + 0.2*max(0, (rssi+100)/100))
  *   (`WifiDataTransformationService.java:698-718`).
  *
  * Pure `Column` arithmetic — codegen-friendly, no UDF.
  */
object Quality {
  val ConnectedBaseWeight = 2.0
  val ScanBaseWeight = 1.0
  val LowLinkSpeedWeight = 1.5
  val LowLinkSpeedThresholdMbps = 50
  val StrongRssiThresholdDbm = -70

  def qualityWeight(connectionStatus: Column, linkSpeed: Column, rssi: Column): Column =
    when(connectionStatus === "SCAN", ScanBaseWeight)
      .when(linkSpeed.isNotNull && linkSpeed < LowLinkSpeedThresholdMbps &&
        rssi > StrongRssiThresholdDbm, LowLinkSpeedWeight)
      .otherwise(ConnectedBaseWeight)

  def qualityScore(locationAccuracy: Column, rssi: Column): Column =
    least(
      lit(1.0),
      lit(0.5) +
        lit(0.3) * greatest(lit(0.0), lit(1.0) - locationAccuracy / 100.0) +
        lit(0.2) * greatest(lit(0.0), (rssi + lit(100.0)) / 100.0))
}
