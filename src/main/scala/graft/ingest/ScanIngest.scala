package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Codec, Quality}

/** The F1–F17 ingest chain: wire lines → flattened, validated, enriched
  * measurement rows (the `wifi_measurements` fact schema, FIXTURES.md §2).
  *
  * Reference pipeline: `wifi-measurements-transformer-service/.../processor/impl/DefaultFeedProcessor.java:83-92`
  * (lines → trim → nonEmpty → decode → parse → flatMap(toMeasurements)),
  * transformation semantics in `WifiDataTransformationService.java` and
  * validation predicates in `DataValidationService.java`.
  *
  * Spark-first shape: the whole chain is narrow (decode UDF + from_json +
  * explode + column expressions) — NO shuffle anywhere. At 100 TB this
  * pipelines entirely inside one stage fused with the source scan; the only
  * exchange in the ingest job is the optional event_id dedup and the sink.
  * Per-record error isolation (F18) falls out of null-safe expressions:
  * a malformed line decodes to NULL and is filtered, never failing the batch.
  */
object ScanIngest {

  /** Tunables mirroring `application.yml` (values at :125-171). `nowMillis`
    * is injected for deterministic tests (the reference calls Instant.now()
    * inline — §7.5.6 flags that as a reproducibility hazard). */
  final case class Config(
      minRssi: Int = -100,
      maxRssi: Int = 0,
      maxAccuracyMeters: Double = 150.0,
      maxAgeDays: Int = 365,
      ouiBlacklist: Seq[String] = Config.DefaultHotspotOuis,
      // LOG_ONLY (default), FLAG, or EXCLUDE (`application.yml:137-146`)
      ouiAction: String = "LOG_ONLY",
      maxRecordBytes: Int = 1024000,
      dataVersion: String = "1.0",
      nowMillis: Option[Long] = None)

  object Config {
    /** 7 mobile-hotspot OUIs listed in `application.yml:140-146`. */
    val DefaultHotspotOuis: Seq[String] =
      Seq("00:23:6C", "3C:15:C2", "58:55:CA", "40:B0:FA", "E8:50:8B", "DA:A1:19", "F8:A9:D0")
  }

  // ---- scalar semantics (shared by both explode branches) -----------------

  /** F10 — normalize: lowercase, hyphens → colons
    * (`WifiDataTransformationService.java:819-825`). */
  def normalizeBssid(c: Column): Column = lower(regexp_replace(c, "-", ":"))

  /** F5 — BSSID validity on the NORMALIZED form: format regex + not
    * all-zeros + not broadcast (`DataValidationService.java:66-67,345-367,633-651`). */
  def isValidBssid(normalized: Column): Column =
    normalized.isNotNull &&
      normalized.rlike("^([0-9a-f]{2}:){5}([0-9a-f]{2})$") &&
      !normalized.isin("00:00:00:00:00:00", "ff:ff:ff:ff:ff:ff")

  /** F6 — RSSI within [min, max] (`DataValidationService.java:274-299`). */
  def isValidRssi(rssi: Column, cfg: Config): Column =
    rssi.isNotNull && rssi.between(cfg.minRssi, cfg.maxRssi)

  /** F7 — location validity (`DataValidationService.java:196-228`). */
  def isValidLocation(lat: Column, lon: Column, accuracy: Column, cfg: Config): Column =
    lat.isNotNull && lon.isNotNull && accuracy.isNotNull &&
      lat.between(-90.0, 90.0) && lon.between(-180.0, 180.0) &&
      accuracy > 0.0 && accuracy <= cfg.maxAccuracyMeters

  /** F8 — timestamp not in the future, not older than maxAgeDays
    * (`DataValidationService.java:70,421-449`). */
  def isValidTimestamp(tsMillis: Column, nowMillis: Column, cfg: Config): Column =
    tsMillis.isNotNull && tsMillis <= nowMillis &&
      tsMillis >= nowMillis - lit(cfg.maxAgeDays.toLong * 24 * 3600 * 1000)

  /** F9 — OUI of a normalized bssid, uppercase first three octets
    * (`DataValidationService.java:504-535`). */
  def oui(normalized: Column): Column = upper(substring(normalized, 1, 8))

  /** F11 — SSID clean: strip NULs, trim; empty → NULL
    * (`WifiDataTransformationService.java:855-863`). */
  def cleanSsid(c: Column): Column = {
    val cleaned = trim(regexp_replace(c, "\u0000", ""))
    when(cleaned.isNull || cleaned === "", lit(null).cast("string")).otherwise(cleaned)
  }

  /** F12 — device_id = sha256("manufacturer:model:device:osVersion"), nulls
    * as empty (`WifiDataTransformationService.java:748-761,866-885`). */
  def deviceId(manufacturer: Column, model: Column, device: Column, osVersion: Column): Column =
    sha2(concat_ws(":",
      coalesce(manufacturer, lit("")), coalesce(model, lit("")),
      coalesce(device, lit("")), coalesce(osVersion, lit(""))), 256)

  /** F13 — event_id = sha256("timestamp:bssid") — THE dedup key
    * (`WifiDataTransformationService.java:789-791`). */
  def eventId(tsMillis: Column, normalizedBssid: Column): Column =
    sha2(concat_ws(":", tsMillis.cast("string"), normalizedBssid), 256)

  // ---- pipeline stages ----------------------------------------------------

  /** F1/F2 — wire lines (column `value`) → parsed raw documents. Blank and
    * undecodable lines are dropped, never fatal. */
  def decodeAndParse(lines: DataFrame): DataFrame = {
    lines
      .select(trim(col("value")).as("line"))
      .where(col("line") =!= "")
      .select(Codec.decodeLine(col("line")).as("json"))
      .where(col("json").isNotNull) // F1: corrupt base64/gzip isolated here
      .select(from_json(col("json"), RawScanSchema.root).as("doc"))
      .where(col("doc").isNotNull)
  }

  /** F3 — connected-event rows. One row per wifiConnectedEvents[i]. */
  def flattenConnected(docs: DataFrame): DataFrame =
    docs
      .select(col("doc"), explode(col("doc.wifiConnectedEvents")).as("ev"))
      .select(
        col("doc"),
        col("ev.timestamp").as("measurement_timestamp"),
        col("ev.wifiConnectedInfo.bssid").as("raw_bssid"),
        col("ev.wifiConnectedInfo.ssid").as("raw_ssid"),
        col("ev.wifiConnectedInfo.rssi").as("rssi"),
        col("ev.wifiConnectedInfo.frequency").as("frequency"),
        col("ev.wifiConnectedInfo.linkSpeed").as("link_speed"),
        col("ev.wifiConnectedInfo.channelWidth").as("channel_width"),
        col("ev.wifiConnectedInfo.centerFreq0").as("center_freq0"),
        col("ev.wifiConnectedInfo.centerFreq1").as("center_freq1"),
        col("ev.wifiConnectedInfo.capabilities").as("capabilities"),
        col("ev.wifiConnectedInfo.is80211mcResponder").as("is_80211mc_responder"),
        col("ev.wifiConnectedInfo.isPasspointNetwork").as("is_passpoint_network"),
        col("ev.wifiConnectedInfo.operatorFriendlyName").as("operator_friendly_name"),
        col("ev.wifiConnectedInfo.venueName").as("venue_name"),
        col("ev.isCaptive").as("is_captive"),
        col("ev.wifiConnectedInfo.numOfScanResults").as("num_scan_results"),
        col("ev.location").as("loc"),
        lit(null).cast("long").as("scan_timestamp"),
        lit("CONNECTED").as("connection_status"))

  /** F4 — scan-result rows: 2-level explode; the parent scanResults[i]
    * location is shared by every results[j] row. Connected-only columns NULL
    * (§1.2 nullability is semantic). */
  def flattenScans(docs: DataFrame): DataFrame =
    docs
      .select(col("doc"), explode(col("doc.scanResults")).as("sr"))
      .select(col("doc"), col("sr"), explode(col("sr.results")).as("r"))
      .select(
        col("doc"),
        col("sr.timestamp").as("measurement_timestamp"),
        col("r.bssid").as("raw_bssid"),
        col("r.ssid").as("raw_ssid"),
        col("r.rssi").as("rssi"),
        lit(null).cast("int").as("frequency"),
        lit(null).cast("int").as("link_speed"),
        lit(null).cast("int").as("channel_width"),
        lit(null).cast("int").as("center_freq0"),
        lit(null).cast("int").as("center_freq1"),
        lit(null).cast("string").as("capabilities"),
        lit(null).cast("boolean").as("is_80211mc_responder"),
        lit(null).cast("boolean").as("is_passpoint_network"),
        lit(null).cast("string").as("operator_friendly_name"),
        lit(null).cast("string").as("venue_name"),
        lit(null).cast("boolean").as("is_captive"),
        lit(null).cast("int").as("num_scan_results"),
        col("sr.location").as("loc"),
        col("r.scantime").as("scan_timestamp"),
        lit("SCAN").as("connection_status"))

  /** F5–F9 validation + F10–F17 enrichment on a flattened branch. */
  def validateAndEnrich(flat: DataFrame, cfg: Config): DataFrame = {
    val nowMs = cfg.nowMillis
      .map(m => lit(m))
      .getOrElse(unix_millis(current_timestamp()))
    val bssid = normalizeBssid(col("raw_bssid"))
    val valid =
      isValidBssid(bssid) &&
        isValidRssi(col("rssi"), cfg) &&
        isValidLocation(col("loc.latitude"), col("loc.longitude"), col("loc.accuracy"), cfg) &&
        isValidTimestamp(col("measurement_timestamp"), nowMs, cfg)
    val hotspot = oui(bssid).isin(cfg.ouiBlacklist: _*)
    val afterOui = cfg.ouiAction match {
      case "EXCLUDE" => valid && !hotspot // F9 exclusion decision
      case _         => valid             // LOG_ONLY / FLAG keep the row
    }

    flat
      .where(afterOui)
      .select(
        bssid.as("bssid"),
        uuid().as("id"), // F14 row id
        col("measurement_timestamp"),
        eventId(col("measurement_timestamp"), bssid).as("event_id"),
        deviceId(col("doc.manufacturer"), col("doc.model"), col("doc.device"),
          col("doc.osVersion")).as("device_id"),
        col("doc.model").as("device_model"),
        col("doc.manufacturer").as("device_manufacturer"),
        col("doc.osVersion").as("os_version"),
        col("doc.appNameVersion").as("app_version"),
        col("loc.latitude").as("latitude"),
        col("loc.longitude").as("longitude"),
        col("loc.altitude").as("altitude"),
        col("loc.accuracy").as("location_accuracy"),
        col("loc.time").as("location_timestamp"),
        col("loc.provider").as("location_provider"),
        col("loc.source").as("location_source"),
        col("loc.speed").as("speed"),
        col("loc.bearing").as("bearing"),
        cleanSsid(col("raw_ssid")).as("ssid"),
        col("rssi"),
        col("frequency"),
        col("scan_timestamp"),
        col("connection_status"),
        Quality.qualityWeight(col("connection_status"), col("link_speed"), col("rssi"))
          .as("quality_weight"),
        col("link_speed"),
        col("channel_width"),
        col("center_freq0"),
        col("center_freq1"),
        col("capabilities"),
        col("is_80211mc_responder"),
        col("is_passpoint_network"),
        col("operator_friendly_name"),
        col("venue_name"),
        col("is_captive"),
        col("num_scan_results"),
        (if (cfg.ouiAction == "FLAG") hotspot else lit(null).cast("boolean"))
          .as("is_global_outlier"), // FLAG action marks; outlier pass overwrites
        lit(null).cast("double").as("global_outlier_distance"),
        lit(null).cast("double").as("global_outlier_threshold"),
        lit(null).cast("string").as("global_detection_algorithm"),
        lit(null).cast("timestamp").as("global_detection_timestamp"),
        lit(null).cast("string").as("global_detection_version"),
        timestamp_millis(nowMs).as("ingestion_timestamp"),
        lit(cfg.dataVersion).as("data_version"),
        lit(null).cast("string").as("processing_batch_id"),
        Quality.qualityScore(col("loc.accuracy"), col("rssi")).as("quality_score"))
  }

  /** Full chain: wire lines → measurement rows (O4 unionByName of the two
    * branches, `WifiDataTransformationService.java:157-167`), F19 oversized
    * guard applied on the decoded document. */
  def ingest(lines: DataFrame, cfg: Config = Config()): DataFrame = {
    val decoded = decodeAndParse(lines)
      .where(length(to_json(col("doc"))) <= cfg.maxRecordBytes) // F19
    // Batch mode: materialize decoded docs once — both explode branches scan
    // them, and gunzip+parse is the expensive step. Streaming plans cannot
    // checkpoint mid-stream, so there the source cache/exchange reuse applies.
    val docs = if (decoded.isStreaming) decoded else decoded.localCheckpoint(false)
    val connected = validateAndEnrich(flattenConnected(docs), cfg)
    val scans = validateAndEnrich(flattenScans(docs), cfg)
    connected.unionByName(scans)
  }

  /** O6 — keyed dedup on event_id, deterministic representative (highest
    * quality_weight, then rssi) — batch analog of the reference's 5 s
    * streaming window (`application.yml:171`). */
  def dedup(measurements: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Ordering must be a TOTAL order over payload-distinct rows for the
    // "deterministic representative" claim to hold — two same-event_id rows
    // from different devices can tie on weight/rssi/status, so the payload
    // columns break the remaining ties (the uuid `id` is itself random and
    // unusable for this).
    val w = Window.partitionBy("event_id")
      .orderBy(col("quality_weight").desc, col("rssi").desc, col("connection_status"),
        col("device_id"), col("latitude"), col("longitude"), col("location_timestamp"))
    measurements.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
