package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Streaming analytics: watermarked windowed stats emit each window once
  * and the stateful relocation detector fires only on confirmed jumps. */
class StreamOpsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val T0 = 1700000000000L // window-aligned enough for hour buckets

  test("windowedApStats: append mode emits a window once its watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Long)]
    val stats = StreamOps.windowedApStats(
      in.toDF().toDF("bssid", "rssi", "ts")
        .withColumn("event_time", timestamp_millis(col("ts"))),
      windowDuration = "1 hour", watermarkDelay = "10 minutes")
    val q = stats.writeStream.format("memory").queryName("ap_stats")
      .outputMode("append").start()
    try {
      // Three fixes for one AP inside one hour window.
      in.addData(("ap1", -60.0, T0), ("ap1", -70.0, T0 + 60000),
        ("ap2", -50.0, T0 + 120000))
      q.processAllAvailable()
      // Window not closed yet: nothing in append output.
      spark.table("ap_stats").count() shouldBe 0

      // An event 2 hours later pushes the watermark past the window end.
      in.addData(("ap1", -55.0, T0 + 2 * 3600 * 1000))
      q.processAllAvailable()
      val rows = spark.table("ap_stats").collect()
        .map(r => (r.getAs[String]("bssid"), r.getAs[Long]("n"),
          r.getAs[Double]("mean_rssi"))).toSet
      rows shouldBe Set(("ap1", 2L, -65.0), ("ap2", 1L, -50.0))
    } finally q.stop()
  }

  test("sessionizedDeviceActivity: gap splits sessions; append emits on close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Long)]
    val sessions = StreamOps.sessionizedDeviceActivity(
      in.toDF().toDF("device_id", "rssi", "ts")
        .withColumn("event_time", timestamp_millis(col("ts"))),
      gap = "5 minutes", watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // Burst of 3 fixes within the gap, then 20 min of silence, then one
      // more fix — two sessions for d1.
      in.addData(
        ("d1", -60.0, T0), ("d1", -70.0, T0 + 60000), ("d1", -65.0, T0 + 120000),
        ("d1", -50.0, T0 + 22 * 60000))
      q.processAllAvailable()
      // Advance the watermark far enough to close both sessions.
      in.addData(("d2", -40.0, T0 + 3600 * 1000))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getAs[String]("device_id"), r.getAs[Long]("n_scans"),
          r.getAs[Double]("mean_rssi"))).toSet
      rows shouldBe Set(("d1", 3L, -65.0), ("d1", 1L, -50.0))
    } finally q.stop()
  }

  test("dedupStream: replayed event ids are dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Long)]
    val out = StreamOps.dedupStream(
      in.toDF().toDF("event_id", "payload", "ts")
        .withColumn("event_time", timestamp_millis(col("ts"))),
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(("e1", "a", T0), ("e2", "b", T0 + 1000))
      q.processAllAvailable()
      // Kafka replay: same ids again (same and slightly later event time).
      in.addData(("e1", "a", T0), ("e2", "b", T0 + 2000), ("e3", "c", T0 + 3000))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[String]("event_id")).sorted
      ids shouldBe Array("e1", "e2", "e3")
    } finally q.stop()
  }

  test("joinAlertsToScans: interval join attaches only alerts inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val scans = MemoryStream[(String, Double, Long)]
    val alerts = MemoryStream[(String, String, Long)]
    val joined = StreamOps.joinAlertsToScans(
      scans.toDF().toDF("bssid", "rssi", "ts")
        .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts"),
      alerts.toDF().toDF("bssid", "kind", "ats")
        .withColumn("alert_time", timestamp_millis(col("ats"))).drop("ats"),
      horizon = "1 hour", watermarkDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("scan_alerts")
      .outputMode("append").start()
    try {
      // ap1 alerted 30 min before its scan (inside horizon); ap2's alert is
      // 2 hours stale (outside); ap3 scans with no alert at all. LEFT
      // OUTER: ap2/ap3 must still flow through with a null alert once the
      // watermark proves no matching alert can arrive.
      alerts.addData(("ap1", "relocation", T0 - 30 * 60000),
        ("ap2", "relocation", T0 - 2 * 3600 * 1000))
      scans.addData(("ap1", -60.0, T0), ("ap2", -50.0, T0), ("ap3", -40.0, T0))
      scans.addData(("apX", -99.0, T0 + 3 * 3600 * 1000)) // advance watermark
      alerts.addData(("apY", "relocation", T0 + 3 * 3600 * 1000))
      q.processAllAvailable()
      val rows = spark.table("scan_alerts").collect()
        .map(r => (r.getAs[String]("bssid"), r.getAs[String]("kind")))
      rows.toSet shouldBe Set(
        ("ap1", "relocation"), ("ap2", null), ("ap3", null))
    } finally q.stop()
  }

  test("relocationAlerts: fires after confirmed consecutive jumps, not on transients") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Double, Long)]
    val alerts = StreamOps.relocationAlerts(
      spark,
      in.toDF().toDF("bssid", "lat", "lon", "ts")
        .withColumn("event_time", timestamp_millis(col("ts"))),
      jumpMeters = 500.0, confirmFixes = 3)
    val q = alerts.writeStream.format("memory").queryName("reloc_alerts")
      .outputMode("append").start()
    try {
      // Anchor both APs at (40, -75); ap2 then sees TWO far fixes followed
      // by a near fix (transient — must not fire).
      in.addData(
        ("ap1", 40.0000, -75.0, T0), ("ap1", 40.0001, -75.0, T0 + 1000),
        ("ap1", 40.0000, -75.0, T0 + 2000),
        ("ap2", 40.0000, -75.0, T0), ("ap2", 40.0001, -75.0, T0 + 1000),
        ("ap2", 40.0100, -75.0, T0 + 2000), ("ap2", 40.0100, -75.0, T0 + 3000),
        ("ap2", 40.0001, -75.0, T0 + 4000))
      q.processAllAvailable()
      spark.table("reloc_alerts").count() shouldBe 0

      // ap1 moves ~1.1 km north: three consecutive far fixes confirm.
      in.addData(
        ("ap1", 40.0100, -75.0, T0 + 10000), ("ap1", 40.0101, -75.0, T0 + 11000),
        ("ap1", 40.0100, -75.0, T0 + 12000))
      q.processAllAvailable()
      val rows = spark.table("reloc_alerts").collect()
      rows.length shouldBe 1
      val a = rows.head
      a.getAs[String]("bssid") shouldBe "ap1"
      a.getAs[Double]("distanceM") should be > 1000.0
      a.getAs[Double]("toLat") shouldBe 40.0100 +- 1e-9
      a.getAs[Long]("fixesSeen") shouldBe 3L

      // After re-anchoring, staying put fires nothing further.
      in.addData(("ap1", 40.0100, -75.0, T0 + 13000))
      q.processAllAvailable()
      spark.table("reloc_alerts").count() shouldBe 1
    } finally q.stop()
  }
}
