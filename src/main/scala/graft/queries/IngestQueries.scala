package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Codec
import graft.ingest.ScanIngest

/** End-to-end wire-format ingest exercised against the synthetic tables:
  * documents rows → raw scan JSON → base64(gzip(·)) lines (S2 producer) →
  * full F1–F17 chain → measurement aggregate. Deterministic (fixed clock,
  * fields derived from doc_id), registered rows-only (DuckDB has no gunzip).
  */
object IngestQueries {

  private val NowMs = 1700000000000L

  /** Build one raw scan document per documents row. Roughly every 13th row
    * gets an invalid rssi and every 11th an all-zeros BSSID so the validators
    * have real work; timestamps are fresh relative to the fixed clock. */
  private def rawJson = {
    val ts = lit(NowMs) - (col("doc_id") % 1000) * 1000
    val octet = format_string("%02x", col("doc_id") % 250)
    val rssi = when(col("doc_id") % 13 === 0, -150).otherwise(-(col("doc_id") % 70) - 30)
    val bssid = when(col("doc_id") % 11 === 0, lit("00:00:00:00:00:00"))
      .otherwise(concat(lit("aa:bb:cc:dd:ee:"), octet))
    format_string(
      """{"osVersion":"14","model":"m-%d","device":"dev","manufacturer":"acme",""" +
        """"appNameVersion":"v1","dataVersion":"1.0","wifiConnectedEvents":[],""" +
        """"scanResults":[{"timestamp":%d,"mode":"active",""" +
        """"location":{"source":"fused","provider":"gps","latitude":%.4f,""" +
        """"longitude":%.4f,"altitude":10.0,"accuracy":%.1f,"speed":0.0,""" +
        """"bearing":0.0,"time":%d},""" +
        """"results":[{"ssid":"net-%d","bssid":"%s","scantime":%d,"rssi":%d,"level":2}]}]}""",
      col("doc_id"), ts,
      (col("doc_id") % 120) - lit(60.0), (col("doc_id") % 300) - lit(150.0),
      (col("doc_id") % 200) + lit(1.0), ts,
      col("doc_id"), bssid, ts, rssi)
  }

  /** Wire → ingest → per-status aggregate (rows-only check; the scalar
    * semantics are oracled separately via f12/f15/f16/f_validation_gate). */
  val ingestChain: Reg = Reg.rowsOnly("f_ingest_chain") { (s, dir) =>
    // Materialize the synthesized wire once — both explode branches of the
    // ingest chain scan it (gzip encode would otherwise run twice).
    val wire = Tables.documents(s, dir)
      .select(Codec.encodeLineCol(rawJson).as("value"))
      .localCheckpoint()
    val measurements = ScanIngest.ingest(
      wire, ScanIngest.Config(nowMillis = Some(NowMs)))
    ScanIngest.dedup(measurements)
      .groupBy("connection_status")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("bssid")).as("distinct_bssids"),
        countDistinct(col("device_id")).as("distinct_devices"),
        round(avg("quality_score"), 4).as("avg_quality"))
      .orderBy("connection_status")
  }

  val all: Seq[Reg] = Seq(ingestChain)
}
