package graft.ingest

import org.apache.spark.sql.types._

/** Explicit nested schema of the raw device scan document — never inferred
  * (§1.3: schema is fixed/versioned; JSON parsing is lenient to unknown
  * fields, which `from_json` gives us for free since only declared fields
  * are extracted).
  *
  * Shape per `documents/smaple_wifiscan.json` and the transformer DTOs
  * (`wifi-measurements-transformer-service/.../dto/WifiScanData.java` et al;
  * field tree reproduced in FIXTURES.md §1). `wifiDisconnectedEvents` is
  * present on the wire but IGNORED by the transformer — omitting it from the
  * schema prunes it at parse time.
  */
object RawScanSchema {

  val location: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("provider", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", DoubleType),
    StructField("accuracy", DoubleType),
    StructField("speed", DoubleType),
    StructField("bearing", DoubleType),
    StructField("time", LongType)))

  val wifiConnectedInfo: StructType = StructType(Seq(
    StructField("bssid", StringType),
    StructField("ssid", StringType),
    StructField("capabilities", StringType),
    StructField("operatorFriendlyName", StringType),
    StructField("venueName", StringType),
    StructField("numOfScanResults", IntegerType),
    StructField("linkSpeed", IntegerType),
    StructField("frequency", IntegerType),
    StructField("rssi", IntegerType),
    StructField("centerFreq0", IntegerType),
    StructField("centerFreq1", IntegerType),
    StructField("channelWidth", IntegerType),
    StructField("is80211mcResponder", BooleanType),
    StructField("isPasspointNetwork", BooleanType)))

  val connectedEvent: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("eventId", StringType),
    StructField("eventType", StringType),
    StructField("isCaptive", BooleanType),
    StructField("returnedIP", StringType),
    StructField("wifiConnectedInfo", wifiConnectedInfo),
    StructField("location", location)))

  val scanResultEntry: StructType = StructType(Seq(
    StructField("ssid", StringType),
    StructField("bssid", StringType),
    StructField("scantime", LongType),
    StructField("rssi", IntegerType),
    StructField("level", IntegerType)))

  val scanResult: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("mode", StringType),
    StructField("location", location),
    StructField("results", ArrayType(scanResultEntry))))

  val root: StructType = StructType(Seq(
    StructField("osVersion", StringType),
    StructField("model", StringType),
    StructField("device", StringType),
    StructField("manufacturer", StringType),
    StructField("osName", StringType),
    StructField("sdkInt", StringType),
    StructField("appNameVersion", StringType),
    StructField("dataVersion", StringType),
    StructField("wifiConnectedEvents", ArrayType(connectedEvent)),
    StructField("scanResults", ArrayType(scanResult))))
}
