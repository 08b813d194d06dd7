package graft.ingest

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.functions.Codec

/** Golden test of the F1–F17 chain on a hand-built raw scan document
  * (same shape as `documents/smaple_wifiscan.json`, values chosen so every
  * validator branch fires — FIXTURES.md §1 edge-case list). */
class ScanIngestSpec extends AnyFunSuite with Matchers with SparkSuite {

  // Fixed "now" → deterministic timestamp validation + ingestion_timestamp.
  private val NowMs = 1700000000000L // 2023-11-14T22:13:20Z
  private val FreshMs = NowMs - 1000000L
  private val cfg = ScanIngest.Config(nowMillis = Some(NowMs))

  /** One raw document: 2 connected events (1 valid, 1 bad-rssi) and 2 scan
    * groups (first: 4 entries with one bad bssid + one broadcast; second:
    * stale timestamp → all dropped). */
  private val sampleJson: String = {
    def loc(lat: Double, lon: Double, acc: Double) =
      s"""{"source":"fused","provider":"gps","latitude":$lat,"longitude":$lon,
         |"altitude":100.5,"accuracy":$acc,"speed":0.5,"bearing":180.0,"time":$FreshMs}"""
        .stripMargin.replaceAll("\n", "")
    s"""{
       |"osVersion":"14","model":"Pixel 8","device":"shiba","manufacturer":"Google",
       |"osName":"Android","sdkInt":"34","appNameVersion":"scanner/2.1","dataVersion":"1.0",
       |"wifiConnectedEvents":[
       |  {"timestamp":$FreshMs,"eventId":"e1","eventType":"CONNECT","isCaptive":false,
       |   "returnedIP":"10.0.0.2",
       |   "wifiConnectedInfo":{"bssid":"AA-BB-CC-DD-EE-01","ssid":"HomeNet",
       |     "capabilities":"[WPA2]","operatorFriendlyName":"","venueName":"",
       |     "numOfScanResults":4,"linkSpeed":40,"frequency":2437,"rssi":-55,
       |     "centerFreq0":2437,"centerFreq1":0,"channelWidth":0,
       |     "is80211mcResponder":false,"isPasspointNetwork":false},
       |   "location":${loc(40.7128, -74.0060, 10.0)}},
       |  {"timestamp":$FreshMs,"eventId":"e2","eventType":"CONNECT","isCaptive":false,
       |   "returnedIP":"10.0.0.3",
       |   "wifiConnectedInfo":{"bssid":"AA:BB:CC:DD:EE:02","ssid":"BadRssi",
       |     "capabilities":"","operatorFriendlyName":"","venueName":"",
       |     "numOfScanResults":1,"linkSpeed":100,"frequency":5180,"rssi":-150,
       |     "centerFreq0":0,"centerFreq1":0,"channelWidth":0,
       |     "is80211mcResponder":false,"isPasspointNetwork":false},
       |   "location":${loc(40.7128, -74.0060, 10.0)}}],
       |"scanResults":[
       |  {"timestamp":$FreshMs,"mode":"active","location":${loc(40.7130, -74.0062, 25.0)},
       |   "results":[
       |     {"ssid":"Cafe\\u0000  ","bssid":"AA:BB:CC:DD:EE:10","scantime":$FreshMs,"rssi":-70,"level":3},
       |     {"ssid":"","bssid":"not-a-mac","scantime":$FreshMs,"rssi":-60,"level":3},
       |     {"ssid":"Bcast","bssid":"FF:FF:FF:FF:FF:FF","scantime":$FreshMs,"rssi":-60,"level":3},
       |     {"ssid":"Weak","bssid":"AA:BB:CC:DD:EE:11","scantime":$FreshMs,"rssi":-95,"level":1}]},
       |  {"timestamp":${NowMs - 400L * 24 * 3600 * 1000},"mode":"active",
       |   "location":${loc(40.7, -74.0, 30.0)},
       |   "results":[
       |     {"ssid":"Stale","bssid":"AA:BB:CC:DD:EE:12",
       |      "scantime":${NowMs - 400L * 24 * 3600 * 1000},"rssi":-60,"level":2}]}]
       |}""".stripMargin.replaceAll("\n", "")
  }

  private def ingested = {
    import spark.implicits._
    val wire = Seq(
      Codec.encodeLine(sampleJson),
      "", "   ",            // blank lines dropped (F1 trim/nonEmpty)
      "!!!not-base64!!!",   // corrupt base64 isolated (F1)
      Codec.encodeLine("""{"truncated":""")) // parseable-as-null doc dropped
      .toDF("value")
    ScanIngest.ingest(wire, cfg).cache()
  }

  test("golden: flattened row counts — 1 valid connected + 2 valid scan rows") {
    val rows = ingested.collect()
    rows.length shouldBe 3
    rows.count(_.getAs[String]("connection_status") == "CONNECTED") shouldBe 1
    rows.count(_.getAs[String]("connection_status") == "SCAN") shouldBe 2
  }

  test("golden: connected row fields, quality weight 1.5 (linkSpeed<50 && rssi>-70)") {
    val r = ingested.where("connection_status = 'CONNECTED'").collect().head
    r.getAs[String]("bssid") shouldBe "aa:bb:cc:dd:ee:01" // F10 normalized
    r.getAs[Int]("rssi") shouldBe -55
    r.getAs[Int]("frequency") shouldBe 2437
    r.getAs[Double]("latitude") shouldBe 40.7128
    r.getAs[Double]("quality_weight") shouldBe 1.5 // F15 demotion branch
    r.getAs[String]("device_model") shouldBe "Pixel 8"
    r.getAs[String]("data_version") shouldBe "1.0"
    // F16: min(1, 0.5 + 0.3*(1-10/100) + 0.2*((-55+100)/100)) = 0.86
    r.getAs[Double]("quality_score") shouldBe 0.86 +- 1e-9
  }

  test("golden: sha2 identities match an independent digest") {
    def sha(s: String) = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r = ingested.where("connection_status = 'CONNECTED'").collect().head
    r.getAs[String]("device_id") shouldBe sha("Google:Pixel 8:shiba:14") // F12
    r.getAs[String]("event_id") shouldBe sha(s"$FreshMs:aa:bb:cc:dd:ee:01") // F13
  }

  test("golden: scan rows share the parent location; connected-only columns NULL") {
    val scans = ingested.where("connection_status = 'SCAN'").collect()
    scans.map(_.getAs[String]("bssid")).sorted shouldBe
      Array("aa:bb:cc:dd:ee:10", "aa:bb:cc:dd:ee:11")
    all(scans.map(_.getAs[Double]("latitude"))) shouldBe 40.7130
    all(scans.map(_.getAs[Double]("location_accuracy"))) shouldBe 25.0
    scans.foreach { r: Row =>
      r.isNullAt(r.fieldIndex("link_speed")) shouldBe true
      r.isNullAt(r.fieldIndex("frequency")) shouldBe true
      r.getAs[Double]("quality_weight") shouldBe 1.0 // F15 SCAN base
    }
  }

  test("golden: F11 ssid NUL-strip/trim and empty→NULL") {
    val cafe = ingested.where("bssid = 'aa:bb:cc:dd:ee:10'").collect().head
    cafe.getAs[String]("ssid") shouldBe "Cafe"
  }

  test("validators: bad bssid, broadcast, bad rssi, stale timestamp all dropped") {
    val bssids = ingested.collect().map(_.getAs[String]("bssid")).toSet
    bssids should not contain "not-a-mac"
    bssids should not contain "ff:ff:ff:ff:ff:ff"
    bssids should not contain "aa:bb:cc:dd:ee:02" // rssi -150
    bssids should not contain "aa:bb:cc:dd:ee:12" // 400 days old
  }

  test("F9 EXCLUDE action drops blacklisted-OUI rows; default keeps them") {
    import spark.implicits._
    val hotspotJson = sampleJson.replace("AA:BB:CC:DD:EE:10", "00:23:6C:01:02:03")
    val wire = Seq(Codec.encodeLine(hotspotJson)).toDF("value")
    val kept = ScanIngest.ingest(wire, cfg).collect()
      .map(_.getAs[String]("bssid"))
    kept should contain("00:23:6c:01:02:03") // LOG_ONLY default keeps

    val excluded = ScanIngest.ingest(wire, cfg.copy(ouiAction = "EXCLUDE")).collect()
      .map(_.getAs[String]("bssid"))
    excluded should not contain "00:23:6c:01:02:03"
  }

  test("O6 dedup keeps one row per event_id, preferring higher quality weight") {
    import spark.implicits._
    val wire = Seq(Codec.encodeLine(sampleJson), Codec.encodeLine(sampleJson)).toDF("value")
    val doubled = ScanIngest.ingest(wire, cfg)
    doubled.count() shouldBe 6
    val deduped = ScanIngest.dedup(doubled)
    deduped.count() shouldBe 3
    deduped.select("event_id").distinct().count() shouldBe 3
  }

  test("ingest plan is shuffle-free (narrow pipeline fused with the scan)") {
    import spark.implicits._
    val wire = Seq(Codec.encodeLine(sampleJson)).toDF("value")
    val plan = ScanIngest.ingest(wire, cfg).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
