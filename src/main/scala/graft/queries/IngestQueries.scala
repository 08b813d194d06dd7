package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Wire → ingest → per-status aggregate, FULLY oracled: the gzip+base64
    * wire roundtrip is an identity, so DuckDB can restate the whole chain
    * straight from `documents` — same synthesis, validation predicates
    * (F5–F8), sha2 ids (F12/F13), event_id dedup with the same total-order
    * tiebreak (O6), and quality score (F16). A hash mismatch catches a codec
    * corruption, a validator drift, or a dedup tie-break change. */
  val ingestChain: Reg = Reg.sql(
    "f_ingest_chain",
    """WITH src AS (
      |  SELECT doc_id,
      |         1700000000000 - (doc_id % 1000) * 1000 AS ts,
      |         CASE WHEN doc_id % 11 = 0 THEN '00:00:00:00:00:00'
      |              ELSE 'aa:bb:cc:dd:ee:' || printf('%02x', doc_id % 250) END AS bssid,
      |         CASE WHEN doc_id % 13 = 0 THEN -150
      |              ELSE -(CAST(doc_id % 70 AS INT)) - 30 END AS rssi,
      |         (doc_id % 200) + 1.0 AS accuracy
      |  FROM documents
      |), valid AS (
      |  SELECT *,
      |         sha256(CAST(ts AS VARCHAR) || ':' || bssid) AS event_id,
      |         sha256('acme:m-' || CAST(doc_id AS VARCHAR) || ':dev:14') AS device_id,
      |         LEAST(1.0, 0.5 + 0.3 * GREATEST(0.0, 1.0 - accuracy / 100.0)
      |                        + 0.2 * GREATEST(0.0, (rssi + 100.0) / 100.0))
      |           AS quality_score
      |  FROM src
      |  WHERE doc_id % 11 <> 0        -- F5: all-zeros bssid
      |    AND rssi BETWEEN -100 AND 0 -- F6
      |    AND accuracy <= 150.0       -- F7 (lat/lon always in range here)
      |), dedup AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
      |              ORDER BY rssi DESC, device_id) AS rn
      |  FROM valid
      |)
      |SELECT 'SCAN' AS connection_status,
      |       COUNT(*) AS cnt,
      |       COUNT(DISTINCT bssid) AS distinct_bssids,
      |       COUNT(DISTINCT device_id) AS distinct_devices,
      |       ROUND(AVG(quality_score), 4) AS avg_quality
      |FROM dedup WHERE rn = 1""".stripMargin) { (s, dir) =>
    // Materialize the synthesized wire once — both explode branches of the
    // ingest chain scan it (gzip encode would otherwise run twice).
    val wire = Tables.documents(s, dir)
      .select(Codec.encodeLineCol(rawJson).as("value"))
      .localCheckpoint(false)
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

  /** §2.9 — the streaming windowed-stats operator, oracled through its batch
    * rendering: `StreamOps.windowedApStats` is ONE code path for both modes
    * (`withWatermark` is a no-op in batch; the window expression is
    * identical), so DuckDB restating the tumbling-window grouping pins the
    * exact semantics the stream emits. RSSI values are integer-valued
    * doubles → sums/avgs are exact in IEEE double, no rounding needed. */
  val windowedStats: Reg = Reg.sql(
    "s9_windowed_stats",
    """WITH m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid,
      |         CAST(-30 - (event_id % 70) AS DOUBLE) AS rssi,
      |         (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms
      |  FROM events)
      |SELECT window_start_ms, bssid,
      |       COUNT(*) AS n,
      |       AVG(rssi) AS mean_rssi,
      |       MIN(rssi) AS min_rssi,
      |       MAX(rssi) AS max_rssi
      |FROM m GROUP BY window_start_ms, bssid
      |ORDER BY window_start_ms, bssid""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val measurements = ev.select(
      col("user_id").cast("string").as("bssid"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      col("ts").as("event_time"))
    graft.streaming.StreamOps.windowedApStats(measurements, "1 hour", "30 minutes")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("bssid"), col("n"), col("mean_rssi"), col("min_rssi"), col("max_rssi"))
      .orderBy("window_start_ms", "bssid")
  }

  /** S10 — a REAL streaming execution under the oracle gate (s9 runs the
    * streaming operator in batch mode; this one runs readStream →
    * writeStream with the state store): the corpus is written twice into a
    * scratch source dir (at-least-once delivery replaying every event), a
    * file-source stream dedups on event_id with
    * `dropDuplicatesWithinWatermark`, and Trigger.AvailableNow drains it to
    * a parquet sink. Deduped(doubled corpus) == original corpus, so DuckDB
    * states the per-type aggregate straight from `events`. The watermark
    * delay exceeds the corpus's 30-day event-time span so no row can go
    * late regardless of how AvailableNow batches the files — the result is
    * batching-invariant (in production the delay bounds state; here it
    * pins determinism).
    *
    * The demo streams a CONSTANT-size slice (event_id < 50000 — the whole
    * corpus at sf0.01, a fixed cap beyond): the gate checks dedup/watermark
    * SEMANTICS, not throughput, and the slice keeps the demo's inherent
    * 3× corpus I/O (write-twice → state store → read-back) bounded at any
    * SF instead of dominating the bench. */
  val streamDedup: Reg = Reg.sql(
    "s10_stream_dedup",
    """SELECT event_type, COUNT(*) AS cnt,
      |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      |FROM events WHERE event_id < 50000
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream")
    // Scratch is 3× the slice (in/out/ckpt) and this builder runs many
    // times per round: delete it on EVERY exit path, not just success.
    // State sized to the load (the s13 rationale): 4 partitions for the
    // 50k-key dedup state instead of the session default — each extra
    // partition is another state-store instance committing per batch.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 4)
    try {
      val src = work + "/in"
      val ev = Tables.events(s, dir).where(col("event_id") < 50000L)
      ev.write.parquet(src)
      ev.write.mode("append").parquet(src)

      val schema = s.read.parquet(src).schema
      val deduped = s.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark("event_id")
      val q = deduped.writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val agg = s.read.parquet(work + "/out")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
        .orderBy("event_type")
      // |event types| rows: materialize so the scratch dir can be deleted
      // NOW rather than when the caller finishes consuming the frame. Reuse
      // the aggregate's own schema; a hand-written StructType would drift
      // on rename.
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S12 — custom streaming STATE under the oracle gate: s10 proves the
    * built-in state store (dropDuplicatesWithinWatermark); this runs the
    * hand-written `flatMapGroupsWithState` relocation detector as a REAL
    * stream (readStream → custom state fold → AvailableNow drain) and
    * hash-gates its alert output. The fix corpus is step-shaped BY DESIGN:
    * 5 fixes at position A then 4 at position B (~11 km away) per AP, so
    * every EMA fold is exact (near fixes have delta 0, far fixes never
    * touch the anchor) and the one alert per AP has closed form — fired on
    * the 3rd consecutive far fix with from=A, to=B, fixesSeen=5 — which
    * DuckDB states from `range(50)` including the haversine distance (the
    * c1 formula, floored to whole meters so a cross-libm ulp cannot flip
    * it). The corpus is written as ONE file so the AvailableNow drain is a
    * single batch and the within-batch event-time sort fixes the fold
    * order end to end. */
  val streamRelocation: Reg = Reg.sql(
    "s12_stream_relocation",
    """WITH b AS (SELECT CAST(range AS BIGINT) AS i FROM range(50)),
      |a AS (
      |  -- all literals cast to DOUBLE: DuckDB otherwise runs 10.0 + i*0.5
      |  -- in exact DECIMAL arithmetic while Spark folds IEEE doubles
      |  SELECT printf('ap%02d', i) AS bssid,
      |         CAST(10.0 AS DOUBLE) + i * CAST(0.5 AS DOUBLE) AS from_lat,
      |         CAST(-30.0 AS DOUBLE) + i * CAST(0.8 AS DOUBLE) AS from_lon,
      |         CAST(10.0 AS DOUBLE) + i * CAST(0.5 AS DOUBLE)
      |           + CAST(0.1 AS DOUBLE) AS to_lat,
      |         CAST(-30.0 AS DOUBLE) + i * CAST(0.8 AS DOUBLE) AS to_lon,
      |         1700000000000 + i * 100000 + 7 * 10000 AS at_ms,
      |         CAST(5 AS BIGINT) AS fixes_seen
      |  FROM b)
      |SELECT bssid, from_lat, from_lon, to_lat, to_lon,
      |       CAST(FLOOR(2 * 6371000 * ASIN(SQRT(
      |         POW(SIN(RADIANS(to_lat - from_lat) / 2), 2) +
      |         COS(RADIANS(from_lat)) * COS(RADIANS(to_lat)) *
      |         POW(SIN(RADIANS(to_lon - from_lon) / 2), 2)))) AS BIGINT)
      |         AS distance_floor_m,
      |       at_ms, fixes_seen
      |FROM a ORDER BY bssid""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_reloc")
    // State sized to the load (the s13 rationale): 50 keys need 4
    // partitions of flatMapGroupsWithState stores, not the session default.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 4)
    try {
      val src = work + "/in"
      val fixes = s.range(50)
        .select(
          format_string("ap%02d", col("id")).as("bssid"),
          (lit(10.0) + col("id") * 0.5).as("lat_a"),
          (lit(-30.0) + col("id") * 0.8).as("lon_a"),
          col("id").as("b"))
        .select(col("bssid"), col("lat_a"), col("lon_a"), col("b"),
          explode(sequence(lit(0), lit(8))).as("i"))
        .select(
          col("bssid"),
          when(col("i") <= 4, col("lat_a"))
            .otherwise(col("lat_a") + 0.1).as("lat"),
          col("lon_a").as("lon"),
          timestamp_millis(lit(1700000000000L)
            + col("b") * 100000 + col("i") * 10000).as("event_time"))
      fixes.coalesce(1).write.parquet(src)

      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema).parquet(src)
      val alerts = graft.streaming.StreamOps.relocationAlerts(
        s, stream, jumpMeters = 500.0, confirmFixes = 3, alpha = 0.2,
        watermarkDelay = "3650 days")
      val q = alerts.toDF().writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out")
        .select(col("bssid"),
          col("fromLat").as("from_lat"), col("fromLon").as("from_lon"),
          col("toLat").as("to_lat"), col("toLon").as("to_lon"),
          floor(col("distanceM")).cast("bigint").as("distance_floor_m"),
          col("atMillis").as("at_ms"), col("fixesSeen").as("fixes_seen"))
        .orderBy("bssid")
      // 50-row alert list: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S13 — stream-stream interval join under the oracle gate: two REAL
    * file streams (measurements, alerts), the watermarked LEFT OUTER
    * interval join from `StreamOps.joinAlertsToScans`, AvailableNow drain.
    * The outer side is the hard part: unmatched rows may only emit once the
    * watermark PROVES no alert can still arrive, so each stream carries a
    * far-future flush sentinel — after the data batch the watermark passes
    * every real row and the engine's no-data micro-batch flushes the
    * unmatched tail (the sentinel itself never emits and is filtered on
    * both sides of the gate). The corpus is arithmetic on range(200)
    * (20 APs × 10 fixes each, alerts on even APs covering fixes 2–5), so
    * DuckDB states the exact joined row set with a plain LEFT JOIN. */
  val streamJoin: Reg = Reg.sql(
    "s13_stream_join",
    """WITH m AS (
      |  SELECT printf('ap%02d', CAST(range AS BIGINT) % 20) AS bssid,
      |         1700000000000 + (CAST(range AS BIGINT) // 20) * 60000 AS event_ms
      |  FROM range(200)),
      |al AS (
      |  SELECT printf('ap%02d', CAST(range AS BIGINT) * 2) AS a_bssid,
      |         1700000000000 + 2 * 60000 AS alert_ms,
      |         CAST(range AS BIGINT) * 2 AS sev
      |  FROM range(10))
      |SELECT m.bssid, m.event_ms,
      |       al.alert_ms, al.sev
      |FROM m LEFT JOIN al
      |  ON al.a_bssid = m.bssid
      | AND al.alert_ms <= m.event_ms
      | AND al.alert_ms >= m.event_ms - 3600000
      |ORDER BY bssid, event_ms, alert_ms, sev""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_join")
    // Size streaming state to the load: a stream-stream join instantiates
    // FOUR state stores per shuffle partition; at the session default (32)
    // that is 128 store inits for a 200-row demo corpus — pure fixed
    // overhead. 2 partitions is the real production knob (state partitions
    // sized to key cardinality — 20 APs here), restored after the drain.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 2)
    try {
      val T0 = 1700000000000L
      val flushMs = T0 + 100L * 24 * 3600 * 1000
      // 20 APs × 10 fixes, one minute apart per AP
      val ms = s.range(200)
        .select(
          format_string("ap%02d", col("id") % 20).as("bssid"),
          timestamp_millis(lit(T0) + (col("id") / 20).cast("long") * 60000)
            .as("event_time"))
        .unionByName(s.range(1).select(
          lit("zz_flush").as("bssid"),
          timestamp_millis(lit(flushMs)).as("event_time")))
      // alerts for the 10 even APs, fired at T0+2min: fixes 2..5 land in
      // [alert, alert+1h], fixes 0..1 precede it, 6..9 outrun the horizon
      val al = s.range(10)
        .select(
          format_string("ap%02d", col("id") * 2).as("bssid"),
          timestamp_millis(lit(T0 + 2 * 60000)).as("alert_time"),
          (col("id") * 2).as("sev"))
        .unionByName(s.range(1).select(
          lit("zz_flush").as("bssid"),
          timestamp_millis(lit(flushMs)).as("alert_time"),
          lit(-1L).as("sev")))
      val mSrc = work + "/m"
      val aSrc = work + "/a"
      ms.coalesce(1).write.parquet(mSrc)
      al.coalesce(1).write.parquet(aSrc)

      val mStream = s.readStream.schema(s.read.parquet(mSrc).schema).parquet(mSrc)
        .withColumnRenamed("bssid", "bssid") // no-op, keeps shape explicit
      val aStream = s.readStream.schema(s.read.parquet(aSrc).schema).parquet(aSrc)
      val joined = graft.streaming.StreamOps.joinAlertsToScans(
        mStream, aStream, horizon = "1 hour", watermarkDelay = "10 minutes")
      val q = joined.writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out")
        .where(col("bssid") =!= "zz_flush")
        .select(col("bssid"),
          unix_millis(col("event_time")).as("event_ms"),
          unix_millis(col("alert_time")).as("alert_ms"),
          col("sev"))
        .orderBy(col("bssid"), col("event_ms"), col("alert_ms"), col("sev"))
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S14 — `session_window` under a REAL streaming execution: o9 oracles
    * the batch rendering of sessionization and StreamOpsSpec pins the
    * append-mode mechanics; this closes the loop by hash-gating the
    * streaming operator itself (readStream → merging session state →
    * AvailableNow drain). The corpus is closed-form: per device, 5 fixes a
    * minute apart, 10 minutes of silence, then 3 more fixes — with a
    * 5-minute gap that is exactly two sessions whose bounds DuckDB states
    * from `range(20)` (session end = last fix + gap, the session_window
    * contract). Each device's rssi is constant, so the session mean is the
    * constant itself — no division ulp can flake the hash. A far-future
    * flush sentinel advances the watermark past every real session so the
    * no-data batch emits them all; the sentinel's own session never closes
    * and is filtered besides. */
  val streamSessions: Reg = Reg.sql(
    "s14_stream_sessions",
    """WITH d AS (SELECT CAST(range AS BIGINT) AS d FROM range(20)),
      |s AS (
      |  SELECT printf('dev%02d', d) AS device_id,
      |         CAST(-30.0 AS DOUBLE) - d AS mean_rssi, d
      |  FROM d)
      |SELECT device_id, session_start_ms, session_end_ms, n_scans, mean_rssi
      |FROM (
      |  SELECT device_id,
      |         1700000000000 + d * 3600000 AS session_start_ms,
      |         1700000000000 + d * 3600000 + 540000 AS session_end_ms,
      |         CAST(5 AS BIGINT) AS n_scans, mean_rssi
      |  FROM s
      |  UNION ALL
      |  SELECT device_id,
      |         1700000000000 + d * 3600000 + 900000,
      |         1700000000000 + d * 3600000 + 1320000,
      |         CAST(3 AS BIGINT), mean_rssi
      |  FROM s)
      |ORDER BY device_id, session_start_ms""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_sess")
    // State sized to the load (the s13 rationale): 20 devices need 4
    // partitions of session-window stores, not the session default.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 4)
    try {
      val T0 = 1700000000000L
      val src = work + "/in"
      // 20 devices × (5 fixes a minute apart, 10 min silence, 3 more fixes);
      // device bases an hour apart so the layout is obvious in the dump
      val fixes = s.range(20)
        .select(
          format_string("dev%02d", col("id")).as("device_id"),
          col("id").as("d"),
          explode(sequence(lit(0), lit(7))).as("i"))
        .select(
          col("device_id"),
          (-lit(30.0) - col("d")).cast("double").as("rssi"),
          timestamp_millis(lit(T0) + col("d") * 3600000L +
            when(col("i") <= 4, col("i")).otherwise(col("i") + 10) * 60000L)
            .as("event_time"))
        .unionByName(s.range(1).select(
          lit("zz_flush").as("device_id"),
          lit(0.0).as("rssi"),
          timestamp_millis(lit(T0 + 100L * 24 * 3600 * 1000)).as("event_time")))
      fixes.coalesce(1).write.parquet(src)

      val stream = s.readStream.schema(s.read.parquet(src).schema).parquet(src)
      val sessions = graft.streaming.StreamOps.sessionizedDeviceActivity(
        stream, gap = "5 minutes", watermarkDelay = "30 minutes")
      val q = sessions.writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out")
        .where(col("device_id") =!= "zz_flush")
        .select(col("device_id"),
          unix_millis(col("session_start")).as("session_start_ms"),
          unix_millis(col("session_end")).as("session_end_ms"),
          col("n_scans"), col("mean_rssi"))
        .orderBy("device_id", "session_start_ms")
      // 40-row session list: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S4/S6 — S3-event parse + feed dispatch under the oracle gate: SQS-style
    * ObjectCreated JSON bodies are synthesized from `documents` with planted
    * invalids (every 7th a non-S3 eventSource, every 11th a malformed bucket
    * name, every 13th a non-hex eTag — each exercising one validation drop
    * in `Sources.parseS3Events`), the survivors routed by
    * `Sources.feedType` on the object-key prefix. DuckDB restates the
    * modular fate arithmetic directly — a hash mismatch catches a schema,
    * regex, or dispatch-prefix drift. */
  val eventRouting: Reg = Reg.sql(
    "s4_event_routing",
    """WITH e AS (
      |  SELECT doc_id, n_chars,
      |         CASE WHEN doc_id % 3 = 0 THEN 'wifi_scan'
      |              WHEN doc_id % 3 = 1 THEN 'connected_events'
      |              ELSE 'default' END AS feed_type
      |  FROM documents
      |  WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0 AND doc_id % 13 <> 0)
      |SELECT feed_type, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS total_size
      |FROM e GROUP BY feed_type ORDER BY feed_type""".stripMargin) { (s, dir) =>
    val keyPrefix = when(col("doc_id") % 3 === 0, "wifi-scan/")
      .when(col("doc_id") % 3 === 1, "connected-events/")
      .otherwise("other/")
    val body = format_string(
      """{"Records":[{"eventSource":"%s","eventTime":"2026-01-01T00:00:00Z",""" +
        """"s3":{"bucket":{"name":"%s"},"object":{"key":"%sbatch-%d.gz",""" +
        """"size":%d,"eTag":"%s"}}}]}""",
      when(col("doc_id") % 7 === 0, "aws:sqs").otherwise("aws:s3"),
      when(col("doc_id") % 11 === 0, lit("BAD_BUCKET"))
        .otherwise(concat(lit("bkt-"), col("source"))),
      keyPrefix, col("doc_id"), col("n_chars"),
      when(col("doc_id") % 13 === 0, lit("zzz")).otherwise(md5(col("text"))))
    graft.sources.Sources.parseS3Events(
      Tables.documents(s, dir).select(body.as("body")))
      .select(graft.sources.Sources.feedType(col("key")).as("feed_type"),
        col("size"))
      .groupBy("feed_type")
      .agg(count(lit(1)).as("cnt"), sum("size").as("total_size"))
      .orderBy("feed_type")
  }

  /** F18/F19 — error isolation + oversized reject under the oracle gate:
    * the wire carries planted fates (every 17th line undecodable garbage,
    * every 19th blank, every 23rd an oversized document via a 5000-char
    * SSID against a 4 KiB cap; precedence corrupt > blank > oversized) and
    * the gate pins the count surviving each stage: F1/F18 isolate the
    * garbage without failing the batch, the F19 guard drops the oversized
    * AFTER parse (it decodes fine — it is a policy reject, not an error),
    * and everything else flows through validation untouched (fields are
    * synthesized always-valid so the only drops are the planted ones).
    * The counts are 1-row aggregates crossJoined (broadcast by
    * construction). */
  val rejectIsolation: Reg = Reg.sql(
    "f18_reject_isolation",
    """WITH c AS (
      |  SELECT CASE WHEN doc_id % 17 = 0 THEN 'corrupt'
      |              WHEN doc_id % 19 = 0 THEN 'blank'
      |              WHEN doc_id % 23 = 0 THEN 'oversized'
      |              ELSE 'valid' END AS fate
      |  FROM documents)
      |SELECT COUNT(*) AS wire_lines,
      |       COUNT(*) FILTER (fate NOT IN ('corrupt', 'blank')) AS parsed_docs,
      |       COUNT(*) FILTER (fate = 'oversized') AS oversized_dropped,
      |       COUNT(*) FILTER (fate = 'valid') AS measurements
      |FROM c""".stripMargin) { (s, dir) =>
    val ts = lit(NowMs) - (col("doc_id") % 1000) * 1000
    val octet = format_string("%02x", col("doc_id") % 250)
    val ssid = when(col("doc_id") % 23 === 0,
      concat(lit("net-"), repeat(lit("x"), 5000)))
      .otherwise(format_string("net-%d", col("doc_id")))
    val json = format_string(
      """{"osVersion":"14","model":"m-%d","device":"dev","manufacturer":"acme",""" +
        """"appNameVersion":"v1","dataVersion":"1.0","wifiConnectedEvents":[],""" +
        """"scanResults":[{"timestamp":%d,"mode":"active",""" +
        """"location":{"source":"fused","provider":"gps","latitude":%.4f,""" +
        """"longitude":%.4f,"altitude":10.0,"accuracy":%.1f,"speed":0.0,""" +
        """"bearing":0.0,"time":%d},""" +
        """"results":[{"ssid":"%s","bssid":"aa:bb:cc:dd:ee:%s","scantime":%d,""" +
        """"rssi":%d,"level":2}]}]}""",
      col("doc_id"), ts,
      (col("doc_id") % 120) - lit(60.0), (col("doc_id") % 300) - lit(150.0),
      (col("doc_id") % 100) + lit(1.0), ts,
      ssid, octet, ts, -(col("doc_id") % 70) - 30)
    val line = when(col("doc_id") % 17 === 0, lit("!corrupt-not-base64!"))
      .when(col("doc_id") % 19 === 0, lit(""))
      .otherwise(Codec.encodeLineCol(json))
    val wire = Tables.documents(s, dir).select(line.as("value")).localCheckpoint(false)
    val cfg = ScanIngest.Config(nowMillis = Some(NowMs), maxRecordBytes = 4096)
    val decoded = ScanIngest.decodeAndParse(wire).localCheckpoint(false)
    val sizeKept = decoded.where(length(to_json(col("doc"))) <= cfg.maxRecordBytes)
    val measurements = ScanIngest.ingest(wire, cfg)
    wire.agg(count(lit(1)).as("wire_lines"))
      .crossJoin(decoded.agg(count(lit(1)).as("parsed_docs")))
      .crossJoin(sizeKept.agg(count(lit(1)).as("size_kept")))
      .crossJoin(measurements.agg(count(lit(1)).as("measurements")))
      .select(col("wire_lines"), col("parsed_docs"),
        (col("parsed_docs") - col("size_kept")).as("oversized_dropped"),
        col("measurements"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** S16 — stream-STATIC enrichment under a REAL streaming execution: the
    * reference's actual consume shape (each Kafka batch of scans is
    * enriched against the known-AP dimension before aggregation —
    * `wifi-scan-ingestion` lookup path). s13 proves stream-stream; this
    * pins the stream-static join: a file stream of the s10 event slice
    * joins the supplier dimension (broadcast — stateless, no watermark
    * needed: the static side never changes mid-query and Spark replans it
    * per micro-batch), AvailableNow drains the enriched stream to parquet,
    * and the per-nation rollup must equal DuckDB's plain batch join — the
    * gate catches a dropped/duplicated micro-batch, a join-key drift, or
    * an enrichment column misalignment. Key is user_id % 10 + 1, inside
    * the supplier key range at every SF (suppliers ≥ 10 from sf0.001 up). */
  val streamEnrich: Reg = Reg.sql(
    "s16_stream_enrich",
    """SELECT s.s_nationkey,
      |       COUNT(*) AS cnt,
      |       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |         AS sum_value
      |FROM events e JOIN supplier s ON s.s_suppkey = e.user_id % 10 + 1
      |WHERE e.event_id < 50000
      |GROUP BY s.s_nationkey ORDER BY s.s_nationkey""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_enrich")
    try {
      val src = work + "/in"
      Tables.events(s, dir).where(col("event_id") < 50000L)
        .select(col("event_id"), col("user_id"), col("value"))
        .write.parquet(src)

      val dim = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val stream = s.readStream.schema(s.read.parquet(src).schema).parquet(src)
        .withColumn("k", col("user_id") % 10 + 1)
        .join(broadcast(dim), col("k") === col("s_suppkey"))
        .select("event_id", "value", "s_nationkey")
      val q = stream.writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val agg = s.read.parquet(work + "/out")
        .groupBy("s_nationkey")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_value"))
        .orderBy("s_nationkey")
      // |nations| rows: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** S8 — AP point lookup under the oracle gate (`Sources.apLookup`, the
    * predicate-pushdown scan of the dimension): five point requests against
    * a supplier-derived AP dimension, including keys that exist only at
    * larger SFs (supplier 1000 appears from sf0.1 up) and one that exists
    * nowhere — so the gate pins both hit and miss semantics at every scale.
    * Each lookup is a scan-level equality filter; the union of five
    * lookups collapses to one IN-pushed scan in the optimized plan. */
  val pointLookup: Reg = Reg.sql(
    "s8_point_lookup",
    """WITH dim AS (
      |  SELECT printf('aa:bb:cc:dd:%02x:%02x',
      |                CAST(s_suppkey AS BIGINT) // 256 % 256,
      |                CAST(s_suppkey AS BIGINT) % 256) AS mac_addr,
      |         CAST(10 AS DOUBLE) + s_suppkey * CAST(0.01 AS DOUBLE) AS latitude,
      |         CAST(20 AS DOUBLE) + s_suppkey * CAST(0.02 AS DOUBLE) AS longitude,
      |         s_nationkey
      |  FROM supplier)
      |SELECT mac_addr, latitude, longitude, s_nationkey
      |FROM dim
      |WHERE mac_addr IN ('aa:bb:cc:dd:00:01', 'aa:bb:cc:dd:00:03',
      |                   'aa:bb:cc:dd:00:07', 'aa:bb:cc:dd:03:e8',
      |                   'aa:bb:cc:dd:ff:ff')
      |ORDER BY mac_addr""".stripMargin) { (s, dir) =>
    val dim = Tables.supplier(s, dir).select(
      format_string("aa:bb:cc:dd:%02x:%02x",
        expr("s_suppkey div 256 % 256"), expr("s_suppkey % 256")).as("mac_addr"),
      (lit(10.0) + col("s_suppkey") * lit(0.01)).as("latitude"),
      (lit(20.0) + col("s_suppkey") * lit(0.02)).as("longitude"),
      col("s_nationkey"))
    Seq("aa:bb:cc:dd:00:01", "aa:bb:cc:dd:00:03", "aa:bb:cc:dd:00:07",
      "aa:bb:cc:dd:03:e8", "aa:bb:cc:dd:ff:ff")
      .map(graft.sources.Sources.apLookup(dim, _))
      .reduce(_.unionByName(_))
      .orderBy("mac_addr")
  }

  /** S3 — the Firehose-style batched sink under the oracle gate
    * (`Sources.batchedSink`: the reference's 500-record buffer limits
    * become `maxRecordsPerFile`): a single-partition slice written through
    * the sink must land in exactly ceil(n/500) files with content intact —
    * DuckDB states the row count, the file-count arithmetic, and the
    * DECIMAL-exact value checksum from lineitem directly. A writer-option
    * regression (dropped option, wrong constant, partial write) changes
    * n_files or the checksum and hash-mismatches. */
  val batchedSinkGate: Reg = Reg.sql(
    "s3_batched_sink",
    """WITH s AS (SELECT l_orderkey, l_extendedprice FROM lineitem
      |           WHERE l_orderkey % 7 = 0)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(CEIL(COUNT(*) / 500.0) AS BIGINT) AS n_files,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |            AS DOUBLE) AS value_sum
      |FROM s""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_batched_sink")
    try {
      val slice = Tables.lineitem(s, dir)
        .where(col("l_orderkey") % 7 === 0)
        .select("l_orderkey", "l_extendedprice")
      graft.sources.Sources.batchedSink(slice.coalesce(1), work + "/out", 500)
      val nFiles = new java.io.File(work + "/out").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val agg = s.read.parquet(work + "/out")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("value_sum"))
        .select(col("n_rows"), lit(nFiles.toLong).as("n_files"), col("value_sum"))
      // 1-row gate: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** F14 — row-id generation under a bounded-property oracle (the o17/a17
    * precedent for inherently nondeterministic values): uuid() values can't
    * be restated, but their CONTRACT can — every generated id matches the
    * RFC-4122 v4 shape and ids are unique across the frame, at any
    * partitioning. DuckDB states the row count and the two constant-true
    * gates; a colliding, malformed, or constant-folded id generator flips
    * a boolean and hash-mismatches. */
  val rowIdGate: Reg = Reg.sql(
    "f14_row_id_contract",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       TRUE AS all_uuid_v4,
      |       TRUE AS all_distinct
      |FROM events WHERE event_id < 50000""".stripMargin) { (s, dir) =>
    val ids = Tables.events(s, dir).where(col("event_id") < 50000L)
      .repartition(8)
      .select(uuid().as("id"))
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    ids.agg(
      count(lit(1)).as("n_rows"),
      (count(when(col("id").rlike(uuidRe), 1)) === count(lit(1))).as("all_uuid_v4"),
      (count_distinct(col("id")) === count(lit(1))).as("all_distinct"))
  }

  /** S17 — multi-format source/sink roundtrips under the gate: the event
    * slice (normalized to exact integer/string columns — value and ts
    * carried as quantized BIGINTs so no format's float/timestamp printer
    * is in the loop) is written as gzipped JSON-lines, quoted CSV, AND
    * zlib ORC (the third columnar format next to parquet — its reader is
    * built into Spark via orc-core), read back through the respective
    * sources, and diffed against the parquet truth with a two-sided
    * EXCEPT ALL INSIDE the query. The oracle states the closed form
    * (full row count, zero mismatches per format), so a quoting,
    * escaping, compression or schema-inference regression in any format
    * path fails the hash gate. (Avro is the one absent leg: the
    * spark-avro module jar does not ship in this environment.) */
  val multiFormatIo: Reg = Reg.sql(
    "s17_multiformat_io",
    """SELECT fmt, CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS rows,
      |       CAST(0 AS BIGINT) AS mismatched
      |FROM (VALUES ('csv'), ('json'), ('orc')) v(fmt) ORDER BY fmt""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_mfio")
    try {
      val truth = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(FLOOR(value * 1e6) AS BIGINT)").as("value_micro"),
        unix_millis(col("ts")).as("ms"), col("props"))
      truth.write.option("compression", "gzip").json(s"$work/j")
      // emptyValue both ways: Spark CSV otherwise writes "" as an empty
      // field and reads it back as null — a round-trip-breaking asymmetry
      // the moment a regenerated props column contains an empty string.
      truth.write.option("header", "true").option("emptyValue", "\"\"")
        .csv(s"$work/c")
      truth.write.option("compression", "zlib").orc(s"$work/o")
      // read back with the explicit schema (inference would also work for
      // JSON; CSV needs it for exact integer types); multiLine so a quoted
      // embedded newline in props parses as one row, not two broken ones
      val schema = truth.schema
      val j = s.read.schema(schema).json(s"$work/j")
      val c = s.read.option("header", "true").option("emptyValue", "")
        .option("multiLine", "true").schema(schema).csv(s"$work/c")
      // ONE aggregation per format instead of count + two exceptAll jobs:
      // tag each side ±1, group on the whole row, and Σ|Σtag| is exactly
      // exceptAll(a,b).count + exceptAll(b,a).count (per-row-multiset
      // |n_truth − n_readback|), while Σ(tag = −1) is the read-back count.
      def gate(df: org.apache.spark.sql.DataFrame, fmt: String) = {
        val cols = truth.columns.map(col)
        val r = truth.select(struct(cols: _*).as("r"), lit(1L).as("t"))
          .unionByName(df.select(struct(cols: _*).as("r"), lit(-1L).as("t")))
          .groupBy("r")
          .agg(sum("t").as("d"), sum(when(col("t") === -1L, 1L).otherwise(0L)).as("nb"))
          .agg(sum(abs(col("d"))).as("miss"), sum("nb").as("n"))
          .head()
        (fmt, r.getLong(1), r.getLong(0))
      }
      val o = s.read.schema(schema).orc(s"$work/o")
      val rows = Seq(gate(c, "csv"), gate(j, "json"), gate(o, "orc"))
      import s.implicits._
      rows.toDF("fmt", "rows", "mismatched").orderBy("fmt")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** S18 — Spark 4 arbitrary-state streaming (`transformWithState`): the
    * typed StatefulProcessor successor to s12's flatMapGroupsWithState, run
    * as a REAL multi-batch stream. Three source files are drained one per
    * micro-batch (`maxFilesPerTrigger` 1 + strictly ascending modification
    * times fix the batch order), so the RocksDB-backed ValueState provably
    * carries totals ACROSS batches: the oracle pins one row per device per
    * batch with closed-form running sums — output no single-batch run could
    * produce. Corpus: 10 devices × 3 files × 2 events, event values
    * 10f + 2d + {0,1} style arithmetic on range(10), so the running sum
    * after batch f is 10f(f+1) + (f+1)(2d+1) exactly. */
  val statefulTotals: Reg = Reg.sql(
    "s18_transform_with_state",
    """WITH d AS (SELECT CAST(range AS BIGINT) AS d FROM range(10)),
      |f AS (SELECT CAST(range AS BIGINT) AS f FROM range(3))
      |SELECT printf('dev%02d', d) AS device_id,
      |       CAST(f + 1 AS BIGINT) AS batch_seq,
      |       CAST(2 * (f + 1) AS BIGINT) AS n_events,
      |       CAST(10 * f * (f + 1) + (f + 1) * (2 * d + 1) AS BIGINT)
      |         AS running_sum
      |FROM d CROSS JOIN f ORDER BY device_id, batch_seq""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_tws")
    // State sized to the load (the s13 rationale), and the state store
    // switched to RocksDB: transformWithState requires it (named state
    // variables + per-variable encoders are a RocksDB-provider feature).
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.get(providerKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    // 2 partitions: the state is 10 devices, and every extra partition is
    // another RocksDB instance to open, commit, and checkpoint per batch
    s.conf.set("spark.sql.shuffle.partitions", 2)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = new java.io.File(work, "in")
      src.mkdirs()
      val t0 = System.currentTimeMillis() - 600000L
      (0 until 3).foreach { f =>
        // one file per future micro-batch: 10 devices × 2 events with
        // values 10f + d and 10f + d + 1
        val stage = s"$work/stage$f"
        s.range(10)
          .select(
            format_string("dev%02d", col("id")).as("device_id"),
            explode(array(lit(10L * f) + col("id"),
              lit(10L * f) + col("id") + 1L)).as("value"))
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$f.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        // FileStreamSource orders pending files by modification time:
        // 2 s apart is far above any fs timestamp granularity
        dst.setLastModified(t0 + f * 2000L)
      }

      val schema = s.read.parquet(src.toString).schema
      import s.implicits._
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .as[graft.streaming.StatefulOps.DeviceEvent]
      val totals = graft.streaming.StatefulOps.runningTotals(stream)
      val q = totals.toDF().writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out")
        .orderBy("device_id", "batch_seq")
      // 30-row totals list: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set(providerKey, prevProvider)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S19 — event-time TIMERS through transformWithState: per-device session
    * timeout as an explicit per-key alarm (`registerTimer` at lastEvent +
    * gap), fired by the engine's `handleExpiredTimer` once the watermark
    * proves the session cannot be extended. Two files, two micro-batches:
    * batch 1 carries every device's 3-event session; batch 2 is one
    * far-future flush event that pushes the watermark past every armed
    * timer, so the trailing no-data batch (the s13 machinery) fires all 10
    * alarms. Closed-form oracle: device d's events carry values 10d + i,
    * i < 3, minutes apart — one closed session per device, never one for
    * the flush sentinel (its own timer stays beyond the final watermark). */
  val streamTimers: Reg = Reg.sql(
    "s19_stream_timers",
    """WITH d AS (SELECT CAST(range AS BIGINT) AS d FROM range(10))
      |SELECT printf('dev%02d', d) AS device_id,
      |       CAST(3 AS BIGINT) AS n_events,
      |       CAST(30 * d + 3 AS BIGINT) AS sum_value,
      |       CAST(1700000000000 + 120000 AS BIGINT) AS last_event_ms
      |FROM d ORDER BY device_id""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_timers")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.get(providerKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    // 2 partitions: the state is 10 devices, and every extra partition is
    // another RocksDB instance to open, commit, and checkpoint per batch
    s.conf.set("spark.sql.shuffle.partitions", 2)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = new java.io.File(work, "in")
      src.mkdirs()
      val t0 = System.currentTimeMillis() - 600000L
      // batch 1: 10 devices × 3 events a minute apart, values 10d + i
      val sessions = s.range(10)
        .select(format_string("dev%02d", col("id")).as("device_id"),
          col("id").as("d"), explode(sequence(lit(0), lit(2))).as("i"))
        .select(col("device_id"),
          (col("d") * 10 + col("i")).as("value"),
          timestamp_millis(lit(NowMs) + col("i") * 60000L).as("event_time"))
      // batch 2: watermark flush far past every lastEvent + gap
      val flush = s.range(1).select(
        lit("zz_flush").as("device_id"), lit(0L).as("value"),
        timestamp_millis(lit(NowMs + 86400000L)).as("event_time"))
      Seq(sessions, flush).zipWithIndex.foreach { case (df, f) =>
        val stage = s"$work/stage$f"
        df.coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$f.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + f * 2000L)
      }

      val schema = s.read.parquet(src.toString).schema
      import s.implicits._
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .withWatermark("event_time", "1 minute")
        .as[graft.streaming.StatefulOps.TimedEvent]
      val closed = graft.streaming.StatefulOps.sessionTimeouts(
        stream, gapMs = 5 * 60000L)
      val q = closed.toDF().writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out")
        .where(col("device_id") =!= "zz_flush")
        .orderBy("device_id")
      // 10-row session list: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set(providerKey, prevProvider)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S20 — streaming MERGE sink via `foreachBatch`: the Delta/Iceberg
    * "writeStream.foreachBatch { MERGE INTO }" production pattern, emulated
    * over versioned parquet state (the MergeOps substitution — the real
    * table format is env-bounded, SURVEY §refs). A keyed changelog is
    * drained one file per micro-batch; each batch folds into the state by
    * a latest-wins merge (max of (ts, event_id) structs) plus an additive
    * update counter. Both folds are commutative+associative monoids, so
    * the final state is invariant to how AvailableNow slices the files —
    * which is exactly the property a production upsert sink needs under
    * at-least-once replay, and what lets DuckDB state the oracle as one
    * window over the flat changelog. Scale: per-batch work is one
    * keyed aggregate + one key-equi-join against state (both shuffle on
    * the key); state is key-cardinality, never changelog-cardinality. */
  val foreachBatchUpsert: Reg = Reg.sql(
    "s20_foreachbatch_upsert",
    """WITH e AS (SELECT * FROM events WHERE event_id < 50000),
      |r AS (SELECT user_id, event_id, value,
      |        ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM e),
      |c AS (SELECT user_id, COUNT(*) AS upd_cnt FROM e GROUP BY 1)
      |SELECT r.user_id, r.event_id AS last_event_id, r.value AS last_value,
      |       c.upd_cnt
      |FROM r JOIN c ON c.user_id = r.user_id
      |WHERE rn = 1 ORDER BY r.user_id""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_upsert")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val src = work + "/in"
      Tables.events(s, dir).where(col("event_id") < 50000L)
        .select("user_id", "event_id", "ts", "value")
        // 2 source files = 2 micro-batches: still a real cross-batch merge
        // (state v0 folds into v1), at one less fixed-cost trigger
        .repartition(2).write.parquet(src)

      // versioned state dirs: batch N merges state v(N-1) → vN; the swap
      // is a fresh directory write, never an in-place overwrite (the
      // MergeOps crash-safety rule)
      @volatile var version = -1L
      val stateDir = (v: Long) => s"$work/state_v$v"

      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val batchAgg = batch
            .groupBy("user_id")
            .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
              count(lit(1)).as("upd_cnt"))
          val merged =
            if (version < 0) batchAgg
            else batch.sparkSession.read.parquet(stateDir(version))
              .unionByName(batchAgg)
              .groupBy("user_id")
              .agg(max("last").as("last"), sum("upd_cnt").as("upd_cnt"))
          merged.write.parquet(stateDir(id))
          version = id
          ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(stateDir(version))
        .select(col("user_id"),
          col("last.event_id").as("last_event_id"),
          col("last.value").as("last_value"),
          col("upd_cnt"))
        .orderBy("user_id")
      // key-cardinality rows: materialize so the scratch dir can be
      // deleted eagerly (the s10 precedent)
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** Shared S21/S22 engine — streaming EXACT order statistics: per-key
    * exact rank selections over the FULL stream history, no
    * approximation, no raw-value buffering. State is the
    * [[graft.streaming.SumDeltaLog]] (key, value) → count delta log:
    * each micro-batch appends only its own per-(key, quantized-value)
    * counts (O(batch) written, history never rewritten; replays
    * overwrite their own deterministic segment), and the THRESHOLD-GATED
    * compactor collapses the log through the MergeOps atomic-swap
    * protocol — the sum monoid is not duplication-absorbing, so the
    * min-log write-then-delete shortcut would double-count; the swap
    * (crash-safety spec'd in SumDeltaLogSpec) is the correct one.
    * `maxDeltas = 1` here so the 2-batch stream exercises the compaction
    * path in production shape, not just in specs. Rank statistics come
    * from the collapsed count table by a per-key cumulative walk over
    * DISTINCT values — state and the final window both scale with the
    * per-key value domain, never with row count (a billion observations
    * of 1000 distinct values is 1000 state rows). Oracles: per-key
    * ROW_NUMBER selections over the flat stream — exact because batching
    * is invisible to a sum of counts. */
  private def streamRankStats(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.SumDeltaLog
    val work = graft.Scratch.dir("graft_smedian")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val src = work + "/in"
      Tables.events(s, dir)
        .where(col("event_id") < 60000L && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select(col("event_type").as("k"),
          floor(col("value")).cast("long").as("v"))
        // 2 source files = 2 micro-batches (one less fixed-cost trigger);
        // maxDeltas = 1 below keeps the compaction path exercised
        .repartition(2).write.parquet(src)

      val state = work + "/state"
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          // O(batch) fold: ONLY this batch's (key, value) counts land on
          // disk; compaction amortizes the read side
          SumDeltaLog.append(
            batch.groupBy("k", "v").agg(count(lit(1)).as("c")),
            state, id, Seq("k", "v"))
          SumDeltaLog.maybeCompact(batch.sparkSession, state, id,
            Seq("k", "v"), "c", maxDeltas = 1)
          ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val counts = SumDeltaLog.collapsed(s, state, Seq("k", "v"), "c")
        .getOrElse(s.emptyDataFrame)
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = counts
        .withColumn("cum", sum("c").over(wCum))
        .join(counts.groupBy("k").agg(sum("c").cast("bigint").as("n")), "k")
      val out = cum
        .groupBy(col("k").as("event_type"), col("n"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))).as("median"),
          // exact p95 rank = ceil(0.95 n) = (19n + 19) DIV 20, in integers
          min(when(col("cum") >= expr("(19 * n + 19) DIV 20"), col("v"))).as("p95"))
        .orderBy("event_type")
      // key-cardinality rows: materialize so scratch can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  val streamMedian: Reg = Reg.sql(
    "s21_stream_median",
    """WITH e AS (SELECT event_type AS k, CAST(FLOOR(value) AS BIGINT) AS v
      |           FROM events
      |           WHERE event_id < 60000 AND event_type IS NOT NULL
      |             AND value IS NOT NULL),
      |n AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k),
      |r AS (SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn
      |      FROM e)
      |SELECT r.k AS event_type, n.n, r.v AS median
      |FROM r JOIN n USING (k) WHERE rn = (n.n + 1) // 2
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    streamRankStats(s, dir).select("event_type", "n", "median")
      .orderBy("event_type")
  }

  /** S22 — streaming grouped QUANTILES (median + exact p95) off the SAME
    * count-delta log as s21: one cumulative walk serves every rank
    * selection, the per-batch write volume stays O(batch), and the
    * compactor bounds read amplification. The p95 rank is exact integer
    * arithmetic (ceil(0.95 n) = (19n + 19) DIV 20) — no float crosses
    * the gate. */
  val streamQuantiles: Reg = Reg.sql(
    "s22_stream_quantiles",
    """WITH e AS (SELECT event_type AS k, CAST(FLOOR(value) AS BIGINT) AS v
      |           FROM events
      |           WHERE event_id < 60000 AND event_type IS NOT NULL
      |             AND value IS NOT NULL),
      |n AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k),
      |r AS (SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn
      |      FROM e)
      |SELECT r.k AS event_type, n.n,
      |       MIN(CASE WHEN rn = (n.n + 1) // 2 THEN v END) AS median,
      |       MIN(CASE WHEN rn = (19 * n.n + 19) // 20 THEN v END) AS p95
      |FROM r JOIN n USING (k)
      |GROUP BY r.k, n.n
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    streamRankStats(s, dir).orderBy("event_type")
  }

  /** S24 — STREAMING drift monitor: each micro-batch of documents is
    * PSI-scored against a STATIC reference distribution (the `src0`
    * n_chars histogram — the "training time" profile) the moment it
    * arrives, the production data-health gate that pages before a bad
    * feed poisons a training mix. Three deterministic batches
    * (doc_id % 3 → one file each, ascending mtimes + maxFilesPerTrigger 1
    * fix the batch order); foreachBatch computes the batch histogram,
    * Laplace-smoothed PSI vs the reference in llm_drift_psi's exact
    * integer-micro op order, and appends ONE verdict row per batch.
    *
    * 100 TB shape: the reference histogram is bin-count sized and static;
    * per batch the only data-sized work is one histogram aggregate of the
    * batch itself — the PSI algebra runs on the bounded bin frame. The
    * oracle restates all three per-batch scores by slicing on doc_id % 3. */
  val streamDrift: Reg = Reg.sql(
    "s24_stream_drift",
    """WITH ref AS (SELECT n_chars // 128 AS bin, CAST(COUNT(*) AS BIGINT) AS ca
      |             FROM documents WHERE source = 'src0' GROUP BY 1),
      |bt AS (SELECT doc_id % 3 AS batch, n_chars // 128 AS bin,
      |              CAST(COUNT(*) AS BIGINT) AS cb
      |       FROM documents GROUP BY 1, 2),
      |bat AS (SELECT DISTINCT batch FROM bt),
      |bins AS (SELECT batch, bin FROM bat CROSS JOIN ref
      |         UNION SELECT batch, bin FROM bt),
      |g AS (SELECT bins.batch, bins.bin,
      |             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      |      FROM bins LEFT JOIN ref USING (bin)
      |                LEFT JOIN bt ON bt.batch = bins.batch
      |                            AND bt.bin = bins.bin),
      |na AS (SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS na FROM ref),
      |nb AS (SELECT batch, CAST(SUM(cb) AS BIGINT) AS nb FROM bt GROUP BY 1),
      |k AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS nbins
      |      FROM bins GROUP BY 1),
      |t AS (SELECT g.batch,
      |        CAST(FLOOR(((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) -
      |              CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)) *
      |            LN((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE)) /
      |               (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)))) * 1e6)
      |          AS BIGINT) AS term
      |      FROM g CROSS JOIN na
      |      JOIN nb ON nb.batch = g.batch
      |      JOIN k ON k.batch = g.batch)
      |SELECT t.batch AS batch_id, nb.nb AS n_docs,
      |       CAST(SUM(term) AS BIGINT) AS psi_micro,
      |       CAST(SUM(term) AS BIGINT) >= 200000 AS drifted
      |FROM t JOIN nb ON nb.batch = t.batch
      |GROUP BY t.batch, nb.nb ORDER BY batch_id""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_drift")
    try {
      // one corpus scan serves the slice staging AND (via the checkpointed
      // ref histogram) every micro-batch's PSI compare — ref used to be
      // re-derived from the parquet scan once per trigger
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), col("source"))
        .localCheckpoint(false)
      val ref = docs.where(col("source") === "src0")
        .groupBy(expr("n_chars DIV 128").as("bin")).agg(count(lit(1)).as("ca"))
        .localCheckpoint(false)
      val na = ref.agg(coalesce(sum("ca"), lit(0L)).as("na"))

      val src = new java.io.File(work, "in")
      src.mkdirs()
      val t0 = System.currentTimeMillis() - 600000L
      (0 until 3).foreach { f =>
        val stage = s"$work/stage$f"
        docs.where(col("doc_id") % 3 === f)
          .select(col("doc_id"), col("n_chars"))
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$f.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        // FileStreamSource orders pending files by modification time
        dst.setLastModified(t0 + f * 2000L): Unit
      }

      val schema = s.read.parquet(src.toString).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val b = batch.groupBy(expr("n_chars DIV 128").as("bin"))
            .agg(count(lit(1)).as("cb"))
          val bins = ref.select("bin").unionByName(b.select("bin")).distinct()
          val gg = bins.join(ref, Seq("bin"), "left").join(b, Seq("bin"), "left")
            .select(col("bin"),
              coalesce(col("ca"), lit(0L)).as("ca"),
              coalesce(col("cb"), lit(0L)).as("cb"))
          val nb = b.agg(coalesce(sum("cb"), lit(0L)).as("nb"))
          val k = bins.agg(count(lit(1)).as("nbins"))
          // identical IEEE op order to llm_drift_psi and the oracle
          val verdict = gg.crossJoin(na).crossJoin(nb).crossJoin(k)
            .select(col("nb"), expr(
              """CAST(FLOOR(((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) -
                |      CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)) *
                |    LN((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE)) /
                |       (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)))) * 1e6)
                |  AS BIGINT)""".stripMargin).as("term"))
            .groupBy("nb")
            .agg(sum("term").as("psi_micro"))
            .select(lit(batchId).as("batch_id"), col("nb").as("n_docs"),
              col("psi_micro"), (col("psi_micro") >= 200000L).as("drifted"))
          verdict.coalesce(1).write.mode("append").parquet(work + "/out")
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = s.read.parquet(work + "/out").orderBy("batch_id")
      // 3 rows: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** S25 — STREAMING SCD2 dimension maintenance: the a32 incremental fold
    * ([[HistoryQueries.applyScd2Batch]]) run where a real pipeline runs it
    * — as a `foreachBatch` sink under Structured Streaming. The order
    * changelog is staged as day-monotone files (ascending modification
    * times; `maxFilesPerTrigger 1` makes each file one micro-batch) and
    * every micro-batch folds into the persisted dimension through the
    * VersionedTable merge-on-read upsert — one equality-delete segment +
    * one data segment per batch, unchanged keys carried forward by
    * reference. The final table is row-identical to
    * the one-shot a24 rebuild — batching through the streaming runtime is
    * invisible, which IS the oracle.
    *
    * Replay safety: the fold itself is NOT idempotent (a replayed event
    * at a day that produced several same-day versions would compare
    * against the last same-day version, not its own), so the sink uses
    * BATCH-ID FENCING — the Delta txnVersion idiom: the micro-batch id is
    * a header OF the committed manifest (morUpsertFenced), so a replayed
    * `foreachBatch` call whose original committed is skipped whole, and
    * one that never committed re-runs safely (property-tested in
    * HistorySpec). Scale: per-batch cost is O(changed keys) in compute
    * AND bytes written — the r15 full-dimension rewrite is gone; at
    * 100 TB the read-side delete debt is retired out-of-band by
    * morMaterialize. State is the dimension itself, never the
    * changelog. */
  val streamScd2: Reg = Reg.sql(
    "s25_stream_scd2",
    """WITH e AS (
      |  SELECT o_custkey, o_orderstatus,
      |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
      |         o_orderkey
      |  FROM orders),
      |c AS (
      |  SELECT *, LAG(o_orderstatus) OVER
      |    (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS prev_status
      |  FROM e),
      |ch AS (SELECT * FROM c
      |       WHERE prev_status IS NULL OR o_orderstatus <> prev_status),
      |v AS (
      |  SELECT o_custkey, o_orderstatus, day,
      |         ROW_NUMBER() OVER
      |           (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS version,
      |         LEAD(day) OVER
      |           (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS to_day
      |  FROM ch)
      |SELECT o_custkey AS custkey, o_orderstatus AS status,
      |       CAST(version AS BIGINT) AS version,
      |       CAST(day AS BIGINT) AS from_day,
      |       CAST(to_day AS BIGINT) AS to_day
      |FROM v ORDER BY custkey, version""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_sscd2")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.orders(s, dir).select(
        col("o_custkey").as("custkey"), col("o_orderstatus").as("status"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("bigint").as("day"),
        col("o_orderkey").as("orderkey"))
        // one changelog scan for the range probe + three staged slices
        .localCheckpoint()
      val (lo, hi) = {
        val r = e.agg(min("day"), max("day")).head()
        (r.getLong(0), r.getLong(1))
      }
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * (hi - lo) / 3
      // stage the changelog as day-monotone files; ascending mtimes make
      // the file source deliver them in day order, one per micro-batch
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      Seq(col("day") <= cut1,
        col("day") > cut1 && col("day") <= cut2,
        col("day") > cut2).zipWithIndex.foreach { case (p, i) =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(p).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val dim = work + "/dim"
      HistoryQueries.initScd2Dim(s, dim, e)

      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            HistoryQueries.applyScd2Batch(
              batch.sparkSession, dim, batch.toDF(), fenceId = Some(id))
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val out = HistoryQueries.readScd2Dim(s, dim)
        .orderBy("custkey", "version")
      // dimension-sized result: materialize so scratch can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S26 — streaming append into the LOG-STRUCTURED versioned table
    * ([[graft.mutation.VersionedTable]]): each micro-batch lands as one
    * fenced commit (`appendFenced` — the batch id is a header OF the
    * committed manifest, so at-least-once replays of a committed batch
    * are skipped whole, with no separate fence artifact that could tear
    * away). The result reads EVERY version after the stream drains: the
    * table's history IS the stream's batch history, each snapshot exactly
    * the prefix of batches that had committed — time travel over a live
    * ingest, the production pattern for reproducible training snapshots
    * ("train on the corpus as of version N"). Commits are O(batch) data +
    * one manifest; nothing is ever rewritten. */
  val streamVersionLog: Reg = Reg.sql(
    "s26_stream_version_log",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 30000),
      |v(version) AS (VALUES (0), (1), (2))
      |SELECT CAST(version AS BIGINT) AS version,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(user_id) AS BIGINT) AS uid_sum
      |FROM v JOIN e ON e.event_id % 3 <= version
      |GROUP BY version ORDER BY version""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_svlog")
    val root = s"$work/t"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 30000L)
        .select("event_id", "user_id")
        // one events scan serves all three staged slices (and the
        // post-stream replay probe) instead of one scan per slice
        .localCheckpoint(false)
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(col("event_id") % 3 === i).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            // each commit records the batch's residue-class range in the
            // manifest (the Iceberg write-side stats), so snapshot reads
            // can data-skip whole micro-batch segments
            VersionedTable.appendFenced(batch.sparkSession, root,
              batch.toDF().withColumn("m", col("event_id") % 3),
              id, statCols = Seq("m"))
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // files-read gate: the three stream-built segments carry disjoint
      // m-stats, so a pruned read of m=2 at head opens exactly ONE of them
      val prunedSegs = VersionedTable.resolveSegments(s, root, "m", 2, 2)
      require(prunedSegs.length == 1,
        s"stream-built stats pruning failed: ${prunedSegs.length} of 3 resolved")

      import s.implicits._
      val rows = (0L to 2L).map { v =>
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
        (v, r.getLong(0), r.getLong(1))
      }
      rows.toDF("version", "n_rows", "uid_sum").orderBy("version")
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S28 — the FULL LSM loop on the versioned table: fenced streaming
    * appends interleaved with UNFENCED compaction commits
    * ([[graft.mutation.VersionedTable.compactSmall]] inside the same
    * foreachBatch, threshold sized so each compaction folds the
    * accumulated small tail). This is the composition the fence
    * CARRY-FORWARD exists for: a compaction commit between two batches
    * must not erase replay protection, so after the stream drains, a
    * deliberate replay of the LAST batch (same batch id, the
    * at-least-once crash window) must be skipped whole even though the
    * latest commit is the unfenced compaction. The oracle states
    * per-version content arithmetic plus the segment-count telemetry:
    * head has exactly 2 segments (compacted tail + last append... the
    * final compaction folds everything), the replay adds NOTHING, and
    * every pre-compaction version still reads its exact prefix. */
  val streamCompactedLog: Reg = Reg.sql(
    "s28_stream_compacted_log",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 30000),
      |v(version) AS (VALUES (0), (1), (2))
      |SELECT CAST(version AS BIGINT) AS version,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(user_id) AS BIGINT) AS uid_sum,
      |       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows,
      |       CAST(1 AS BIGINT) AS head_segments,
      |       CAST(0 AS BIGINT) AS replay_appended
      |FROM v JOIN e ON e.event_id % 3 <= version
      |GROUP BY version ORDER BY version""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_slsm")
    val root = s"$work/t"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 30000L)
        .select("event_id", "user_id")
        // one events scan serves all three staged slices (and the
        // post-stream replay probe) instead of one scan per slice
        .localCheckpoint(false)
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(col("event_id") % 3 === i).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            val sp = batch.sparkSession
            VersionedTable.appendFenced(sp, root, batch.toDF(), id)
            // the LSM maintenance step, UNFENCED, in the same trigger:
            // fold every small segment (they all are) into one — the
            // carry-forward keeps the fence alive through this commit
            VersionedTable.compactSmall(sp, root, smallBytes = Long.MaxValue)
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // the at-least-once crash window: the checkpoint missed batch 2's
      // commit and the batch replays — the fence (carried through the
      // compaction commits) must skip it whole
      val headBefore = VersionedTable.read(s, root).count()
      val replayed = VersionedTable.appendFenced(
        s, root, e.where(col("event_id") % 3 === 2), batchId = 2L)
      require(replayed.isEmpty, "replay after compaction was NOT fenced")
      val headAfter = VersionedTable.read(s, root).count()
      val head = VersionedTable.currentVersion(s, root).get
      val headSegs = VersionedTable.segmentsOf(s, root, head).length
      // Batch-prefix snapshots are the APPEND commits, recovered from the
      // fence headers themselves (batch b's append is the FIRST version
      // fenced at b; the carried fence repeats on later compactions) —
      // never hardcoded version arithmetic, which silently depended on
      // compactSmall's <2-segment no-op guard.
      val appendV: Map[Long, Long] = (0L to head)
        .flatMap(v => VersionedTable.fenceAt(s, root, v).map(_ -> v))
        .groupMapReduce(_._1)(_._2)(_ min _)
      import s.implicits._
      val rows = (0L to 2L).map { v =>
        val r = VersionedTable.read(s, root, Some(appendV(v)))
          .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
        (v, r.getLong(0), r.getLong(1), headBefore, headSegs.toLong,
          headAfter - headBefore)
      }
      rows.toDF("version", "n_rows", "uid_sum", "head_rows",
        "head_segments", "replay_appended").orderBy("version")
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S29 — STREAMING CDC APPLY through merge-on-read: each micro-batch
    * aggregates to one per-key update row and lands via
    * [[graft.mutation.VersionedTable.morUpsertFenced]] — ONE commit per
    * batch carrying an equality-delete of the batch's keys plus the
    * fresh rows, O(batch) written no matter how large the dimension has
    * grown (the write side of a 100 TB CDC sink). Sequence scoping makes
    * the head LAST-WRITER-WINS per key across batches with zero read-
    * modify-write; the appId-scoped fence makes the at-least-once replay
    * of the final batch a whole-batch no-op (gated in the oracle as
    * `replay_appended = 0`). Every per-batch snapshot stays readable. */
  val streamMorCdc: Reg = Reg.sql(
    "s29_stream_mor_cdc",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 30000),
      |b AS (SELECT user_id, event_id % 3 AS last_batch,
      |             COUNT(*) AS n_events,
      |             CAST(SUM(event_id) AS BIGINT) AS eid_sum
      |      FROM e GROUP BY user_id, event_id % 3),
      |last AS (SELECT user_id, MAX(last_batch) AS mb FROM b GROUP BY user_id)
      |SELECT CAST(b.user_id AS BIGINT) AS user_id,
      |       CAST(b.last_batch AS BIGINT) AS last_batch,
      |       CAST(b.n_events AS BIGINT) AS n_events,
      |       CAST(b.eid_sum AS BIGINT) AS eid_sum,
      |       CAST(0 AS BIGINT) AS replay_appended
      |FROM b JOIN last l ON b.user_id = l.user_id AND b.last_batch = l.mb
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_smor")
    val root = s"$work/t"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 30000L)
        .select("event_id", "user_id")
        // one events scan serves all three staged slices (and the
        // post-stream replay probe) instead of one scan per slice
        .localCheckpoint(false)
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(col("event_id") % 3 === i).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            // the CDC record: one update row per key in this batch
            val upd = batch.groupBy("user_id").agg(
              count(lit(1)).as("n_events"),
              sum("event_id").cast("bigint").as("eid_sum"))
              .withColumn("last_batch", lit(id))
              .select("user_id", "last_batch", "n_events", "eid_sum")
            VersionedTable.morUpsertFenced(
              batch.sparkSession, root, upd, Seq("user_id"), id,
              appId = "cdc")
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // at-least-once crash window: a replay of the final batch must be
      // fenced out whole — same keys, same batch id, zero effect
      val headBefore = VersionedTable.read(s, root).count()
      val replayUpd = e.where(col("event_id") % 3 === 2)
        .groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          sum("event_id").cast("bigint").as("eid_sum"))
        .withColumn("last_batch", lit(2L))
        .select("user_id", "last_batch", "n_events", "eid_sum")
      val replayed = VersionedTable.morUpsertFenced(
        s, root, replayUpd, Seq("user_id"), 2L, appId = "cdc")
      require(replayed.isEmpty, "replayed CDC batch was NOT fenced")
      val replayAppended = VersionedTable.read(s, root).count() - headBefore

      val out = VersionedTable.read(s, root)
        .select(
          col("user_id").cast("bigint").as("user_id"),
          col("last_batch").cast("bigint").as("last_batch"),
          col("n_events").cast("bigint").as("n_events"),
          col("eid_sum").cast("bigint").as("eid_sum"),
          lit(replayAppended).cast("bigint").as("replay_appended"))
        .orderBy("user_id")
      // |users|-sized CDC state — materialize so the scratch table can
      // be deleted eagerly in the finally below
      s.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S30 — STREAMING SCHEMA DRIFT into the versioned table: a fenced
    * `foreachBatch` sink whose upstream evolves mid-stream — batch 2
    * arrives with the value column RENAMED (user_id → uid) and a NEW
    * column added (score). The sink commits the rename as a
    * metadata-only schema commit IN-STREAM (guarded idempotent for
    * replays), then appends under the new shape; the head snapshot
    * surfaces every era under the current names with nulls for the
    * late-added column, while the pre-drift snapshot (recovered from the
    * fence headers, never version arithmetic) still reads under the old
    * schema. The at-least-once replay of the final batch is fenced to a
    * whole-batch no-op. This is the CDC-sink reality the a45/a48 batch
    * operators exist for: upstream teams rename and add columns without
    * coordinating a table rewrite, and the 100 TB sink absorbs it with
    * one manifest write per schema change. */
  val streamSchemaDrift: Reg = Reg.sql(
    "s30_stream_schema_drift",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 30000),
      |b01 AS (SELECT * FROM e WHERE event_id % 3 <= 1),
      |b2 AS (SELECT event_id, user_id AS uid, user_id % 7 AS score
      |       FROM e WHERE event_id % 3 = 2)
      |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM e) AS BIGINT) AS uid_sum,
      |       CAST((SELECT COUNT(*) FROM b01) AS BIGINT) AS null_score_rows,
      |       CAST((SELECT SUM(score) FROM b2) AS BIGINT) AS score_sum,
      |       CAST(2 AS BIGINT) AS pre_drift_columns,
      |       CAST(3 AS BIGINT) AS head_columns,
      |       CAST(0 AS BIGINT) AS replay_appended""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_sdrift")
    val root = s"$work/t"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 30000L)
        .select("event_id", "user_id")
        // one events scan serves all three staged slices (and the
        // post-stream replay probe) instead of one scan per slice
        .localCheckpoint(false)
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(col("event_id") % 3 === i).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            val sp = batch.sparkSession
            if (id < 2)
              VersionedTable.appendFenced(sp, root, batch.toDF(), id)
            else {
              // upstream drift lands at batch 2: rename FIRST (guarded so
              // a replayed trigger cannot re-rename), then append the new
              // shape
              if (VersionedTable.read(sp, root)
                  .columns.contains("user_id"))
                VersionedTable.renameColumn(sp, root, "user_id", "uid")
              VersionedTable.appendFenced(sp, root,
                batch.toDF().withColumnRenamed("user_id", "uid")
                  .withColumn("score", col("uid") % 7), id)
            }
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // at-least-once replay of the final (drifted) batch: fenced whole
      val headBefore = VersionedTable.read(s, root, mergeSchema = true).count()
      val replayed = VersionedTable.appendFenced(s, root,
        e.where(col("event_id") % 3 === 2)
          .withColumnRenamed("user_id", "uid")
          .withColumn("score", col("uid") % 7), batchId = 2L)
      require(replayed.isEmpty, "drifted-batch replay was NOT fenced")
      val headAfter = VersionedTable.read(s, root, mergeSchema = true).count()
      val head = VersionedTable.currentVersion(s, root).get
      val appendV: Map[Long, Long] = (0L to head)
        .flatMap(v => VersionedTable.fenceAt(s, root, v).map(_ -> v))
        .groupMapReduce(_._1)(_._2)(_ min _)
      val preDrift = VersionedTable.read(s, root, Some(appendV(1L)))
      require(preDrift.columns.sameElements(Array("event_id", "user_id")),
        s"pre-drift snapshot schema leaked: ${preDrift.columns.mkString(",")}")
      val hd = VersionedTable.read(s, root, mergeSchema = true)
      require(hd.columns.contains("uid") && !hd.columns.contains("user_id"),
        s"head schema must carry drifted names: ${hd.columns.mkString(",")}")
      val agg = hd.agg(sum("uid").cast("bigint"),
        count(when(col("score").isNull, 1)),
        sum("score").cast("bigint")).head()
      import s.implicits._
      Seq((headBefore, agg.getLong(0), agg.getLong(1), agg.getLong(2),
        preDrift.columns.length.toLong, hd.columns.length.toLong,
        headAfter - headBefore))
        .toDF("head_rows", "uid_sum", "null_score_rows", "score_sum",
          "pre_drift_columns", "head_columns", "replay_appended")
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S31 — streaming TOP-K maintenance (the live leaderboard / trending
    * shape): per-event-type top-3 users by lifetime event count, exact
    * across micro-batches. Each trigger folds only ITS batch's
    * (type, user) partial counts into versioned count state — a
    * fresh-directory write per batch, never an in-place overwrite (the
    * MergeOps crash-safety rule) — and the ranking is evaluated ONCE at
    * read time from the merged state, so per-batch cost is
    * O(batch + state), never a re-rank of history. State is bounded by
    * the (type, user) ENTITY domain, not the row count — a billion events
    * over a million users is a million state rows; when even that is too
    * big, the batch CMS/heavy-hitter sketches (o11/o26) are the
    * documented fallback, traded exactness and all. Tie-break is total
    * (count DESC, user ASC), so the oracle's ROW_NUMBER reproduces the
    * ranking bit-for-bit. */
  val streamTopk: Reg = Reg.sql(
    "s31_stream_topk",
    """WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM events WHERE event_id < 50000 GROUP BY 1, 2),
      |r AS (SELECT event_type, user_id, cnt,
      |             ROW_NUMBER() OVER (PARTITION BY event_type
      |                                ORDER BY cnt DESC, user_id) AS rnk
      |      FROM c)
      |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, cnt
      |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stopk")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val src = work + "/in"
      Tables.events(s, dir).where(col("event_id") < 50000L)
        .select("event_type", "user_id")
        .repartition(2).write.parquet(src)
      @volatile var version = -1L
      val stateDir = (v: Long) => s"$work/state_v$v"
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            val part = batch.groupBy("event_type", "user_id")
              .agg(count(lit(1)).as("cnt"))
            val merged =
              if (version < 0) part
              else batch.sparkSession.read.parquet(stateDir(version))
                .unionByName(part)
                .groupBy("event_type", "user_id")
                .agg(sum("cnt").as("cnt"))
            merged.write.parquet(stateDir(id))
            version = id
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("cnt").desc, col("user_id"))
      val out = s.read.parquet(stateDir(version))
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .where(col("rnk") <= 3)
        .select(col("event_type"), col("rnk"), col("user_id"),
          col("cnt").cast("bigint").as("cnt"))
        .orderBy("event_type", "rnk")
      // 15-row leaderboard: materialize so the scratch dir can go now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S32 — WATERMARK LATE-DATA AUDIT: the engine's real event-time
    * watermark over a daily-window APPEND-mode aggregation, with all
    * three behaviors pinned in one run. Batch 0 delivers the first
    * fortnight minus a deterministic straggler subset; batch 1 delivers a
    * straggler-free mid-month week (so the old windows get EVICTED and
    * emitted before the stragglers show up); batch 2 delivers the rest of
    * the month PLUS the stragglers. Outcomes: (a) stragglers for windows
    * already emitted are DROPPED (their windows keep batch-0-only
    * counts — append emits each window exactly once, `require`-gated);
    * (b) stragglers still inside the allowance merge and count; (c)
    * windows still open when the stream drains never emit.
    *
    * The oracle restates the engine's exact arithmetic, measured and
    * pinned against Spark's microbatch protocol: watermarks live on the
    * ms lattice (FLOOR(max_us/1000) − 259 200 000), EVICTION in batch N
    * uses the watermark through batch N−1, while the LATE-INPUT filter
    * lags one more batch (batch 2's filter is the post-batch-0
    * watermark) — so the drop boundary is wm(b0) and the final emission
    * boundary is wm(all). State is bounded by windows-in-flight × types —
    * the watermark is precisely what lets a 100 TB/day stream expire
    * buckets instead of holding the calendar in memory. */
  val streamLateData: Reg = Reg.sql(
    "s32_stream_late_data",
    """WITH e AS (SELECT event_id, event_type,
      |                  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |                  epoch_us(ts) AS us
      |           FROM events WHERE event_id % 5 = 0),
      |b0 AS (SELECT * FROM e
      |       WHERE day <= 19737 AND NOT (event_id % 3 = 0 AND day <= 19741)),
      |b2 AS (SELECT * FROM e
      |       WHERE day >= 19745 OR (event_id % 3 = 0 AND day <= 19741)),
      |wm1 AS (SELECT CAST(FLOOR(MAX(us) / 1000) AS BIGINT) - 259200000 AS v
      |        FROM b0),
      |wm3 AS (SELECT CAST(FLOOR(MAX(us) / 1000) AS BIGINT) - 259200000 AS v
      |        FROM e),
      |kept AS (
      |  SELECT day, event_type FROM e
      |  WHERE day <= 19744 AND NOT (event_id % 3 = 0 AND day <= 19741)
      |  UNION ALL
      |  SELECT day, event_type FROM b2, wm1
      |  WHERE (day + 1) * 86400000 > wm1.v)
      |SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM kept, wm3 WHERE (day + 1) * 86400000 <= wm3.v
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_slate")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") % 5 === 0)
        .select(col("event_id"), col("event_type"), col("ts"))
        .withColumn("day",
          datediff(col("ts").cast("date"), lit("1970-01-01")).cast("bigint"))
        // one events scan serves all three staged slices
        .localCheckpoint(false)
      val isL = col("event_id") % 3 === 0 && col("day") <= 19741L
      val slices = Seq(
        e.where(col("day") <= 19737L && !isL),
        e.where(col("day").between(19738L, 19744L) && !isL),
        e.where(col("day") >= 19745L || isL))
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      slices.zipWithIndex.foreach { case (b, i) =>
        val tmp = new java.io.File(work + s"/tmp$i")
        b.drop("day").coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      val schema = s.read.parquet(src.toString).schema
      val stateDir = (v: Long) => s"$work/state_v$v"
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .withWatermark("ts", "3 days")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            batch.select(col("window.start").as("wstart"), col("event_type"),
              col("cnt")).write.parquet(stateDir(id))
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // append mode: each window emits at most once across batches — a
      // duplicate key would mean a late row resurrected evicted state
      val dirs = new java.io.File(work).listFiles()
        .filter(_.getName.startsWith("state_v")).map(_.toString).sorted
      val merged = dirs.map(s.read.parquet(_)).reduce(_ unionByName _)
      require(merged.groupBy("wstart", "event_type")
        .count().where(col("count") > 1).isEmpty,
        "append-mode emission produced a duplicate window")
      val out = merged
        .select(
          datediff(col("wstart").cast("date"), lit("1970-01-01"))
            .cast("bigint").as("day"),
          col("event_type"), col("cnt").cast("bigint").as("cnt"))
        .orderBy("day", "event_type")
      // calendar-bounded frame: materialize so the scratch dir can go now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S33 — WATERMARKED STREAM-STREAM INTERVAL JOIN: the engine's real
    * two-source join with bounded state, driven through three aligned
    * micro-batches per side. Clicks join purchases on user within a
    * 6-hour attribution window; both sides carry 2-day watermarks, so
    * the join state is BOUNDED — a click is held only until the global
    * watermark (min across sources) clears its match interval, which is
    * exactly what makes a 100 TB/day two-stream join feasible at all.
    * The straggler purchases (days 1–6, withheld until the third batch)
    * arrive after their candidate clicks' state is provably evicted —
    * the margin is DAYS wide on BOTH candidate semantics (the engine's
    * late-input filter lags one batch, to the post-batch-0 watermark
    * ≈ day 8.9, measured the same way s32 measured the aggregation
    * lattice; state eviction uses the current ≈ day 18.9), so the
    * outcome pins eviction without ms-boundary sensitivity: straggler
    * pairs are DROPPED, cross-batch pairs inside the allowance are
    * kept, and append-mode uniqueness is `require`-gated. The oracle is
    * the closed-form inner join over exactly the non-straggler
    * purchases. */
  val streamIntervalJoin: Reg = Reg.sql(
    "s33_stream_interval_join",
    """WITH c AS (SELECT user_id, epoch_us(ts) AS cus
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pus,
      |             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS pday
      |      FROM events WHERE event_type = 'purchase'
      |        AND NOT (event_id % 3 = 0 AND
      |                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
      |                   <= 19728)),
      |j AS (SELECT p.pday, p.pid FROM p JOIN c ON c.user_id = p.user_id
      |      AND p.pus BETWEEN c.cus AND c.cus + 21600000000)
      |SELECT pday, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |       CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_ssjoin")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"), col("ts"))
        .withColumn("day",
          datediff(col("ts").cast("date"), lit("1970-01-01")).cast("bigint"))
        // one events scan serves all six staged slices (3 per side)
        .localCheckpoint(false)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"), col("day"))
      val purch = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("pid"),
          col("ts").as("pts"), col("day"),
          (col("event_id") % 3 === 0 && col("day") <= 19728L).as("lateP"))
      def windows(df: DataFrame, straggle: Boolean): Seq[DataFrame] = Seq(
        df.where(col("day") <= 19732L &&
          (if (straggle) !col("lateP") else lit(true))),
        df.where(col("day").between(19733L, 19742L)),
        df.where(col("day") >= 19743L ||
          (if (straggle) col("lateP") else lit(false))))
      def layout(name: String, slices: Seq[DataFrame]): String = {
        val src = new java.io.File(s"$work/$name"); src.mkdirs()
        val t0 = System.currentTimeMillis()
        slices.zipWithIndex.foreach { case (b, i) =>
          val tmp = new java.io.File(s"$work/tmp_${name}_$i")
          b.drop("day", "lateP").coalesce(1).write.parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(src, s"batch$i.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(t0 + i * 2000L)
          ()
        }
        src.toString
      }
      val srcC = layout("clicks", windows(clicks, straggle = false))
      val srcP = layout("purch", windows(purch, straggle = true))
      val scm = s.read.parquet(srcC).schema
      val spm = s.read.parquet(srcP).schema
      val stateDir = (v: Long) => s"$work/out_v$v"
      val left = s.readStream.schema(scm).option("maxFilesPerTrigger", 1)
        .parquet(srcC).withWatermark("cts", "2 days")
      val right = s.readStream.schema(spm).option("maxFilesPerTrigger", 1)
        .parquet(srcP).withWatermark("pts", "2 days")
      val q = left.join(right,
        expr("c_user = p_user AND pts >= cts AND " +
          "pts <= cts + INTERVAL 6 HOURS"))
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            batch.select(col("pid"), col("cts"), col("pts"))
              .write.parquet(stateDir(id))
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // PLAN GATE: the join must run as the stateful stream-stream
      // operator with BOTH event-time watermarks bounding its state — a
      // silent fallback (e.g. one side read as a static batch, or a
      // watermark lost to a column rename) would still pass the oracle
      // on a drained stream while holding unbounded state in production
      val planStr = {
        val bos = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
          q.explain()
        }
        bos.toString("UTF-8")
      }
      require(planStr.contains("StreamingSymmetricHashJoin"),
        "s33: stream-stream join did not plan as StreamingSymmetricHashJoin")
      require("EventTimeWatermark".r.findAllIn(planStr).size >= 2,
        "s33: expected a watermark on each stream side")
      val dirs = new java.io.File(work).listFiles()
        .filter(_.getName.startsWith("out_v")).map(_.toString).sorted
      val pairs = dirs.map(s.read.parquet(_)).reduce(_ unionByName _)
      // append-mode join: each (click, purchase) pair emits exactly once
      require(pairs.groupBy("pid", "cts").count()
        .where(col("count") > 1).isEmpty,
        "stream-stream join re-emitted a pair")
      val out = pairs
        .withColumn("pday",
          datediff(col("pts").cast("date"), lit("1970-01-01")).cast("bigint"))
        .groupBy("pday")
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          countDistinct("pid").cast("bigint").as("n_purchases"))
        .orderBy("pday")
      // calendar-bounded frame: materialize so the scratch dir can go now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S34 — STREAMING INGEST UNDER LIVE MAINTENANCE: the fenced
    * streaming sink and a concurrent compactor race each other through
    * the commit CAS, and the table stays exactly right. A background
    * thread loops compactSmall (threshold = everything) against the
    * same root the foreachBatch sink appends to; every loser of the
    * create-exclusive manifest CAS retries — the a55 OCC loop running
    * for real, concurrently, inside a streaming pipeline. The final
    * CONTENT is fully deterministic (exactly the three batches' rows,
    * whatever interleaving happened; a lost update would show as
    * missing rows, a double-apply as extra), while version counts and
    * compaction wins deliberately are not — the oracle checks the
    * invariant, not the schedule. This is the production shape the CAS
    * hardening exists for: a compaction job racing an ingest stream
    * without eating it. */
  val streamOccMaintenance: Reg = Reg.sql(
    "s34_stream_occ_maintenance",
    """WITH e AS (SELECT event_id, user_id FROM events
      |           WHERE event_id % 7 = 0)
      |SELECT CAST(COUNT(*) AS BIGINT) AS rows_n,
      |       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS distinct_ids,
      |       CAST(SUM(user_id) AS BIGINT) AS uid_sum
      |FROM e""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_soccm")
    val root = s"$work/t"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val e = Tables.events(s, dir).where(col("event_id") % 7 === 0)
        .select("event_id", "user_id")
        // one events scan serves all three staged slices
        .localCheckpoint(false)
      val src = new java.io.File(work + "/in"); src.mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 3).foreach { i =>
        val tmp = new java.io.File(work + s"/tmp$i")
        e.where(col("event_id") % 3 === i).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
        ()
      }
      @volatile var stop = false
      @volatile var compactions = 0
      val maintenance = new Thread(() => {
        while (!stop) {
          try {
            val (_, merged, _) =
              VersionedTable.compactSmall(s, root, smallBytes = Long.MaxValue)
            if (merged > 0) compactions += 1
          } catch {
            case e: java.io.IOException
                if e.getMessage.contains("lost the race") => // OCC loser: retry
            case _: IllegalStateException => // table not created yet
          }
          Thread.sleep(25)
        }
      })
      maintenance.setDaemon(true)
      maintenance.start()
      def retrying[A](op: => A): A = {
        var i = 0
        while (true) {
          try return op
          catch {
            case e: java.io.IOException
                if e.getMessage.contains("lost the race") && i < 200 => i += 1
          }
        }
        sys.error("unreachable")
      }
      val schema = s.read.parquet(src.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            retrying { VersionedTable.appendFenced(s, root, batch.toDF(), id) }
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      stop = true
      maintenance.join(10000)
      // the fence must survive whatever maintenance interleaved
      require(VersionedTable.currentFence(s, root).contains(2L),
        "fence lost through concurrent compaction")
      val out = VersionedTable.read(s, root)
        .agg(count(lit(1)).cast("bigint").as("rows_n"),
          countDistinct("event_id").cast("bigint").as("distinct_ids"),
          sum("user_id").cast("bigint").as("uid_sum"))
      // one-row invariant frame: materialize so the scratch dir can go
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S35 — STREAMING RIGHT-TO-BE-FORGOTTEN via deletion vectors: a
    * stream of forget requests applied per micro-batch as
    * [[graft.mutation.VersionedTable.posDelete]] commits — each batch
    * writes ONE (file, row-index) vector sized by ITS matches, never
    * rewriting a data file (gated: the data directory set is
    * byte-identical after the whole stream). This is the production
    * GDPR-stream shape on a 100 TB table: request batches are tiny by
    * nature (the per-batch `collect` of request keys is bounded by the
    * arrival rate, not the table), the scan-side cost is one broadcast
    * anti-join while vectors accumulate, and maintenance retires them
    * out-of-band (a57's materialize gate). Deletes COMMUTE, so the file
    * stream's arbitrary batch order is invisible to the final state —
    * the oracle sees only the set union of requests. */
  val streamForget: Reg = Reg.sql(
    "s35_stream_forget",
    """WITH e AS (SELECT event_id, user_id, value FROM events
      |           WHERE event_id < 60000),
      |f AS (SELECT DISTINCT user_id FROM e WHERE user_id % 10 = 3),
      |head AS (SELECT * FROM e WHERE user_id % 10 <> 3)
      |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) FROM head)
      |         AS BIGINT) AS head_cents,
      |       CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS forgotten_users,
      |       CAST((SELECT COUNT(DISTINCT user_id % 3) FROM f) AS BIGINT)
      |         AS deletion_vectors,
      |       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS prestream_rows,
      |       CAST(0 AS BIGINT) AS data_segments_rewritten""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_sforget")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val root = s"$work/t"
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id", "value")
        // one events scan serves both staged segments and the request set
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0),
        statCols = Seq("user_id"))
      VersionedTable.append(s, root, e.where(col("event_id") % 3 =!= 0),
        statCols = Seq("user_id"))
      val preRows = VersionedTable.read(s, root).count()
      val dataDirsBefore = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet

      // three request files = three micro-batches of forget requests
      val src = s"$work/req"
      val reqs = e.select("user_id").where(col("user_id") % 10 === 3)
        .distinct().localCheckpoint()
      for (b <- 0 to 2)
        reqs.where(col("user_id") % 3 === b).coalesce(1)
          .write.mode("append").parquet(src)

      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
          // GDPR request batches are arrival-rate-sized: the driver-side
          // key collect is bounded by the batch, never the table
          val users = batch.select("user_id").distinct()
            .collect().map(_.getLong(0))
          if (users.nonEmpty)
            VersionedTable.posDelete(s, root,
              col("user_id").isin(users.toIndexedSeq: _*))
          ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val dataDirsAfter = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet
      require(dataDirsAfter == dataDirsBefore,
        "stream forget touched a data segment — must be vector-only")
      val head = VersionedTable.currentVersion(s, root).get
      val vectors = VersionedTable.segmentsOf(s, root, head)
        .count(_.isPosDelete)
      val agg = VersionedTable.read(s, root)
        .agg(count(lit(1)),
          sum(round(col("value") * 100).cast("bigint")).cast("bigint"))
        .head()
      val forgotten = reqs.count()

      import s.implicits._
      val out = Seq((agg.getLong(0), agg.getLong(1), forgotten,
        vectors.toLong, preRows, 0L))
        .toDF("head_rows", "head_cents", "forgotten_users",
          "deletion_vectors", "prestream_rows", "data_segments_rewritten")
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  /** S36 — STREAMING AUTO-LOADER by reference: a discovery stream
    * notices directories landing in an external zone and registers each
    * micro-batch's paths through
    * [[graft.mutation.VersionedTable.importDirsFenced]] — one fenced
    * commit per batch, ZERO data bytes copied ever (gated: the table
    * root contains no local data segment at the end; the landing zone's
    * file mtimes are untouched), and an at-least-once replay of a
    * committed batch is skipped whole by the fence (gated: re-running
    * batch 0's import returns None and the version head is unchanged).
    * This is the Databricks Auto Loader / Iceberg add_files-from-a-
    * notification-queue shape: onboarding a firehose of foreign parquet
    * at manifest cost, with the imported stats making every landed
    * directory prunable immediately. */
  val streamImport: Reg = Reg.sql(
    "s36_stream_import",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000)
      |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM e) AS BIGINT) AS head_uid_sum,
      |       CAST(3 AS BIGINT) AS batches_committed,
      |       CAST(0 AS BIGINT) AS local_data_segments,
      |       CAST(0 AS BIGINT) AS bytes_copied""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_simport")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      val root = s"$work/t"
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves all three landing-zone drops
        .localCheckpoint(false)
      // the landing zone: three foreign directories, written by "someone
      // else" before the loader ever runs
      val zones = (0 to 2).map { i =>
        val p = s"$work/landing/drop_$i"
        e.where(col("event_id") % 3 === i).write.parquet(p)
        p
      }
      val zoneState = zones.flatMap(z => new java.io.File(z).listFiles()
        .map(f => f.getPath -> f.lastModified())).toSet

      // the arrival log: one path per file = one per micro-batch
      val src = s"$work/arrivals"
      zones.foreach { z =>
        import s.implicits._
        Seq(z).toDF("path").coalesce(1).write.mode("append").parquet(src)
      }
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
          // arrival batches are notification-sized: the path collect is
          // bounded by the queue, never the data
          val paths = batch.select("path").collect().map(_.getString(0))
          VersionedTable.importDirsFenced(s, root, paths.toIndexedSeq, id,
            appId = "loader", statCols = Seq("event_id"))
          ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // zero copy: no local data segment ever materialized, zone untouched
      val localSegs = new java.io.File(root).listFiles()
        .count(f => f.getName.startsWith("seg_"))
      require(localSegs == 0, s"auto-loader copied data: $localSegs local segments")
      require(zones.flatMap(z => new java.io.File(z).listFiles()
        .map(f => f.getPath -> f.lastModified())).toSet == zoneState,
        "auto-loader modified the landing zone")
      val headV = VersionedTable.currentVersion(s, root).get
      require(headV == 2L, s"expected 3 fenced commits (v0..v2), head=$headV")
      // at-least-once replay: batch 0 re-imports nothing
      val replay = VersionedTable.importDirsFenced(s, root, Seq(zones.head),
        0L, appId = "loader")
      require(replay.isEmpty && VersionedTable.currentVersion(s, root).get == 2L,
        "fence failed to swallow a replayed import batch")
      val agg = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      import s.implicits._
      val out = Seq((agg.getLong(0), agg.getLong(1), headV + 1, 0L, 0L))
        .toDF("head_rows", "head_uid_sum", "batches_committed",
          "local_data_segments", "bytes_copied")
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      deleteRecursively(new java.io.File(work))
    }
  }

  val all: Seq[Reg] =
    Seq(ingestChain, windowedStats, streamDedup, streamRelocation, streamJoin,
      streamSessions, eventRouting, rejectIsolation, streamEnrich, pointLookup,
      batchedSinkGate, rowIdGate, multiFormatIo, statefulTotals, streamTimers,
      foreachBatchUpsert, streamMedian, streamQuantiles, streamDrift,
      streamScd2, streamVersionLog, streamCompactedLog, streamMorCdc,
      streamSchemaDrift, streamTopk, streamLateData, streamIntervalJoin,
      streamOccMaintenance, streamForget, streamImport)
}
