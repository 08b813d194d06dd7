package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.serve.RequestScoring
import graft.serve.RequestScoring.{Request, ScanInput}

/** R5 batch request scoring end to end on synthetic data: the AP dimension
  * derives from supplier, requests from events (user ≙ device, scans pick
  * APs by event id). */
object ServeQueries {

  /** R5 — the full batch scoring flow, upgraded from rows-only to a
    * per-request bounded-property oracle (the multi-algorithm panel itself
    * is the pure-Scala R1–R6 engine pinned by SelectionSpec/AlgorithmsSpec
    * and the `r2_r4_selection` sweep; its single-AP and two-AP response
    * slices are exact-oracled in `r5_proximity_tier` / `r5_two_ap_response`).
    * DuckDB states, per request, the EXACT outcome and known-AP count, plus
    * range properties of the response (confidence ∈ [0,1], accuracy > 0,
    * position inside lat/lon bounds; error responses zeroed).
    *
    * The outcome prediction is sound because the error arms are
    * SQL-expressible and the panel cannot otherwise fail on this synthesis:
    *  - "physically impossible signal set": P8 restated per frequency group;
    *  - "no usable known APs": the J3 status filter restated over the dim;
    *  - "no algorithm eligible" needs every weight < 0.4 with ≥ 2
    *    candidates, which only happens in single-AP weak/mixed|outliers
    *    contexts — unreachable here: one scan per distinct MAC means
    *    single-AP ⟹ one valid scan ⟹ stddev 0 ⟹ uniform distribution;
    *  - "no algorithm produced a position": every reachable finalist set
    *    contains an always-producing algorithm (proximity / WCL /
    *    log-distance / MLE-at-4+APs), except {trilateration, rssi_ratio} at
    *    three/strong/uniform/excellent — where rssi_ratio only fails when
    *    every pair Δrssi = 0 and trilateration succeeds on the non-collinear
    *    (excellent-GDOP) geometry.
    * The AP dim is capped at s_suppkey < 250 so the mod-250 MAC octets stay
    * injective — duplicate MACs would multi-match the scan join and make
    * per-request apCount load-order-dependent. */
  val batchScoring: Reg = Reg.sql(
    "r5_batch_scoring",
    """WITH raw AS (
      |  SELECT CAST(user_id AS VARCHAR) AS request_id,
      |         (user_id * 3 + event_id % (1 + user_id % 6)) % 100 AS supp,
      |         CAST(-45 - (value % 50) AS DOUBLE) AS rssi,
      |         CASE WHEN event_id % 2 = 0 THEN 2437 ELSE 5180 END AS freq
      |  FROM events),
      |-- strongest observation per (request, AP): max struct(rssi, freq)
      |best AS (
      |  SELECT * FROM (
      |    SELECT request_id, supp, rssi, freq,
      |           ROW_NUMBER() OVER (PARTITION BY request_id, supp
      |                              ORDER BY rssi DESC, freq DESC) AS rn
      |    FROM raw) WHERE rn = 1),
      |-- the kept ≤6-scan subset: sort_array on struct(mac,…) orders by the
      |-- zero-padded hex MAC, which is numeric order of supp
      |kept AS (
      |  SELECT * FROM (
      |    SELECT request_id, supp, rssi, freq,
      |           ROW_NUMBER() OVER (PARTITION BY request_id ORDER BY supp)
      |             AS krn
      |    FROM best) WHERE krn <= 6),
      |flags AS (
      |  SELECT k.request_id, k.supp, k.rssi, k.freq,
      |         EXISTS (SELECT 1 FROM supplier s
      |                 WHERE s.s_suppkey < 250 AND s.s_suppkey = k.supp)
      |           AS known
      |  FROM kept k),
      |-- P8 physics: every rssi in [-100,-30]; per freq group, a strongest
      |-- signal over -50 dBm caps the spread at 45 dB (the -30/-100
      |-- boundary-pair exemption is unreachable with rssi in (-95,-45])
      |grp AS (
      |  SELECT request_id, freq, MAX(rssi) AS mx, MIN(rssi) AS mn,
      |         COUNT(*) AS c
      |  FROM flags GROUP BY request_id, freq),
      |phys AS (
      |  SELECT v.request_id, v.valid_all AND gr.groups_ok AS physics_ok
      |  FROM (SELECT request_id,
      |               BOOL_AND(rssi >= -100 AND rssi <= -30) AS valid_all
      |        FROM flags GROUP BY request_id) v
      |  JOIN (SELECT request_id,
      |               BOOL_AND(NOT (c >= 2 AND NOT (mx = -30.0 AND mn = -100.0)
      |                             AND mx > -50.0 AND mx - mn > 45.0))
      |                 AS groups_ok
      |        FROM grp GROUP BY request_id) gr USING (request_id)),
      |agg AS (
      |  SELECT request_id,
      |         CAST(SUM(CASE WHEN known THEN 1 ELSE 0 END) AS BIGINT)
      |           AS ap_count,
      |         BOOL_OR(known AND supp % 10 <> 0) AS has_usable
      |  FROM flags GROUP BY request_id)
      |SELECT a.request_id,
      |       CASE WHEN NOT p.physics_ok THEN 'physically impossible signal set'
      |            WHEN NOT a.has_usable THEN 'no usable known APs'
      |            ELSE 'scored' END AS outcome,
      |       a.ap_count,
      |       TRUE AS conf_ok, TRUE AS acc_ok, TRUE AS pos_ok
      |FROM agg a JOIN phys p USING (request_id)
      |ORDER BY a.request_id""".stripMargin) { (s, dir) =>
    import s.implicits._

    // AP dimension: one AP per supplier, clustered positions, mixed vendors
    // and statuses (every 10th AP expired → J3 must drop it).
    val apDim = Tables.supplier(s, dir)
      .filter(col("s_suppkey") < 250)
      .select(
      concat(lit("aa:bb:cc:dd:"),
        format_string("%02x", col("s_suppkey") % 250), lit(":"),
        format_string("%02x", (col("s_suppkey") * 7) % 250)).as("mac_addr"),
      ((col("s_suppkey") % 120) - 60 + (col("s_suppkey") % 10) * 0.0005).as("latitude"),
      ((col("s_suppkey") % 300) - 150 + (col("s_suppkey") % 7) * 0.0005).as("longitude"),
      when(col("s_suppkey") % 3 === 0, col("s_acctbal") / 1000).as("altitude"),
      (lit(5.0) + col("s_suppkey") % 10).as("horizontal_accuracy"),
      (lit(0.7) + (col("s_suppkey") % 3) * 0.1).as("confidence"),
      when(col("s_suppkey") % 4 === 0, "cisco")
        .when(col("s_suppkey") % 4 === 1, "aruba").otherwise("").as("vendor"),
      when(col("s_suppkey") % 10 === 0, "expired").otherwise("active").as("status"))

    // Requests: per user, 1–6 scans of APs near the user's own cluster
    // (the span varies by user so single/two/three/four-plus selection
    // contexts are all live at every SF; users ≡ 0 mod 30 get exactly one
    // AP whose suppkey is ≡ 0 mod 10 — the expired-status error arm).
    val nAps = 100
    val requests = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("supp",
        (col("user_id") * 3 + col("event_id") % (lit(1) + col("user_id") % 6)) % nAps)
      .select(col("user_id").cast("string").as("requestId"),
        concat(lit("aa:bb:cc:dd:"),
          format_string("%02x", col("supp") % 250), lit(":"),
          format_string("%02x", (col("supp") * 7) % 250)).as("mac"),
        (-lit(45) - (col("value") % 50)).cast("double").as("rssi"),
        when(col("event_id") % 2 === 0, 2437).otherwise(5180).as("frequencyMhz"))
      // one scan per (request, AP): strongest observation wins — otherwise
      // the kept subset collapses onto one MAC and every request becomes a
      // single-AP proximity case
      .groupBy("requestId", "mac")
      .agg(max(struct(col("rssi"), col("frequencyMhz"))).as("m"))
      .select(col("requestId"),
        struct(col("mac"), col("m.rssi").as("rssi"),
          col("m.frequencyMhz").as("frequencyMhz")).as("scan"))
      .groupBy("requestId")
      // sort_array makes the kept subset deterministic (collect_list order
      // follows arbitrary shuffle fetch order)
      .agg(slice(sort_array(collect_list(col("scan"))), 1, 6).as("scans"))
      .as[Request]

    RequestScoring.score(s, requests, apDim)
      .toDF()
      .select(
        col("requestId").as("request_id"),
        when(col("ok"), "scored").otherwise(col("error")).as("outcome"),
        col("apCount").cast("long").as("ap_count"),
        when(col("ok"), col("confidence") >= 0 && col("confidence") <= 1)
          .otherwise(col("confidence") === 0).as("conf_ok"),
        when(col("ok"), col("accuracy") > 0)
          .otherwise(col("accuracy") === 0).as("acc_ok"),
        when(col("ok"),
          col("latitude").between(-90, 90) && col("longitude").between(-180, 180))
          .otherwise(col("latitude") === 0.0 && col("longitude") === 0.0)
          .as("pos_ok"))
      .orderBy("request_id")
  }

  /** R5 proximity tier, FULLY oracled: single-AP requests always resolve via
    * pure proximity — in every signal tier LogDistance's selection weight
    * (0.4 × signalMult × 0.7 poor-geometry × 1.1 uniform ≤ 0.308) falls under
    * the 0.4 finalist threshold while Proximity survives (sole-survivor rule
    * at worst), and a VeryWeak tier hard-constrains to {proximity} outright —
    * so the combiner passes the proximity position through unchanged. DuckDB
    * can therefore state the full Response per request: position = the AP's
    * location, accuracy = its horizontal accuracy, confidence =
    * clamp((rssi + 90) / 60, 0, 0.85)
    * (`ProximityDetectionAlgorithm.java:52-53,115-130`), and the J3 error
    * outcomes (expired AP / unknown AP → "no usable known APs"). The rssi
    * sweep (−38…−93) exercises BOTH confidence clamps.
    *
    * The AP dim is restricted to s_suppkey ≤ 100 so the synthetic MAC
    * (suppkey mod 250 octets) stays injective — beyond 250 keys the mod
    * wraps, duplicate MACs hit the first-wins AP-map rule, and the chosen
    * duplicate is load-order-dependent (fine for r5_batch_scoring's
    * aggregate output, not for per-request positions). */
  val proximityTier: Reg = Reg.sql(
    "r5_proximity_tier",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |req AS (
      |  SELECT CAST(user_id AS VARCHAR) AS request_id,
      |         user_id % 100 AS supp,
      |         CAST(-38 - (user_id % 56) AS DOUBLE) AS rssi
      |  FROM u),
      |ap AS (
      |  SELECT s_suppkey,
      |         ((s_suppkey % 120) - 60 + (s_suppkey % 10) * CAST(0.0005 AS DOUBLE))
      |           AS latitude,
      |         ((s_suppkey % 300) - 150 + (s_suppkey % 7) * CAST(0.0005 AS DOUBLE))
      |           AS longitude,
      |         (CAST(5.0 AS DOUBLE) + s_suppkey % 10) AS horizontal_accuracy,
      |         CASE WHEN s_suppkey % 10 = 0 THEN 'expired' ELSE 'active' END AS status
      |  FROM supplier WHERE s_suppkey <= 100),
      |hit AS (
      |  SELECT r.*, a.latitude, a.longitude, a.horizontal_accuracy,
      |         (a.s_suppkey IS NOT NULL) AS known,
      |         (a.s_suppkey IS NOT NULL AND a.status <> 'expired') AS usable
      |  FROM req r LEFT JOIN ap a ON a.s_suppkey = r.supp)
      |SELECT request_id,
      |       CASE WHEN usable THEN 'scored' ELSE 'no usable known APs' END AS outcome,
      |       CASE WHEN usable THEN ROUND(latitude, 6) ELSE 0.0 END AS lat,
      |       CASE WHEN usable THEN ROUND(longitude, 6) ELSE 0.0 END AS lon,
      |       CASE WHEN usable THEN ROUND(horizontal_accuracy, 3) ELSE 0.0 END
      |         AS accuracy,
      |       CASE WHEN usable
      |            THEN ROUND(LEAST(0.85, GREATEST(0.0, (rssi + 90) / 60)), 4)
      |            ELSE 0.0 END AS confidence,
      |       CASE WHEN known THEN 1 ELSE 0 END AS ap_count
      |FROM hit ORDER BY request_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val apDim = Tables.supplier(s, dir)
      .where(col("s_suppkey") <= 100)
      .select(
        concat(lit("aa:bb:cc:dd:"),
          format_string("%02x", col("s_suppkey") % 250), lit(":"),
          format_string("%02x", (col("s_suppkey") * 7) % 250)).as("mac_addr"),
        ((col("s_suppkey") % 120) - 60 + (col("s_suppkey") % 10) * 0.0005).as("latitude"),
        ((col("s_suppkey") % 300) - 150 + (col("s_suppkey") % 7) * 0.0005).as("longitude"),
        when(col("s_suppkey") % 3 === 0, col("s_acctbal") / 1000).as("altitude"),
        (lit(5.0) + col("s_suppkey") % 10).as("horizontal_accuracy"),
        lit(0.8).as("confidence"),
        lit("").as("vendor"),
        when(col("s_suppkey") % 10 === 0, "expired").otherwise("active").as("status"))

    val requests = Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select(col("user_id").cast("string").as("requestId"),
        (col("user_id") % 100).as("supp"),
        (-lit(38) - (col("user_id") % 56)).cast("double").as("rssi"))
      .select(col("requestId"),
        array(struct(
          concat(lit("aa:bb:cc:dd:"),
            format_string("%02x", col("supp") % 250), lit(":"),
            format_string("%02x", (col("supp") * 7) % 250)).as("mac"),
          col("rssi"),
          when(col("supp") % 2 === 0, 2437).otherwise(5180).as("frequencyMhz"))).as("scans"))
      .as[Request]

    RequestScoring.score(s, requests, apDim)
      .toDF()
      .select(col("requestId").as("request_id"),
        when(col("ok"), "scored").otherwise(col("error")).as("outcome"),
        round(col("latitude"), 6).as("lat"),
        round(col("longitude"), 6).as("lon"),
        round(col("accuracy"), 3).as("accuracy"),
        round(col("confidence"), 4).as("confidence"),
        col("apCount").as("ap_count"))
      .orderBy("request_id")
  }

  /** R1 context factors, oracled: the rule engine's scenario classification
    * (AP-count class, signal-quality tier from mean RSSI, distribution tier
    * from RSSI stddev — `SelectionContextBuilder.java:32-50`) is plain
    * grouped statistics, so DuckDB restates the class per request exactly.
    * The geometric factor needs located-AP geometry (GDOP/collinearity) and
    * stays under SelectionSpec's unit corpus; with an empty AP map it is
    * constant Poor here. RSSI values are integer-valued doubles → means are
    * exact; stddev boundary flips would need |sd − tier| < 1e−15. */
  val contextClasses: Reg = Reg.sql(
    "r1_context_classes",
    """WITH raw AS (
      |  SELECT CAST(user_id AS VARCHAR) AS request_id,
      |         printf('%02x', (user_id * 3 + event_id % 6) % 40) AS mac,
      |         CAST(-40 - (event_id % (1 + user_id % 25)) -
      |              25 * (user_id % 3) AS DOUBLE) AS rssi
      |  FROM events),
      |dedup AS (
      |  SELECT request_id, mac, MAX(rssi) AS rssi
      |  FROM raw GROUP BY request_id, mac),
      |agg AS (
      |  SELECT request_id, COUNT(*) AS n_aps, AVG(rssi) AS m,
      |         COALESCE(STDDEV_POP(rssi), 0) AS sd
      |  FROM dedup GROUP BY request_id)
      |SELECT request_id, n_aps,
      |       CASE WHEN n_aps <= 1 THEN 'single' WHEN n_aps = 2 THEN 'two'
      |            WHEN n_aps = 3 THEN 'three' ELSE 'four_plus' END
      |         AS ap_count_class,
      |       CASE WHEN m >= -70 THEN 'strong' WHEN m >= -85 THEN 'medium'
      |            WHEN m >= -95 THEN 'weak' ELSE 'very_weak' END
      |         AS signal_class,
      |       CASE WHEN sd <= 3.0 THEN 'uniform' WHEN sd <= 10.0 THEN 'mixed'
      |            ELSE 'outliers' END AS distribution_class
      |FROM agg ORDER BY request_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{Selector, WifiScan}
    import graft.algo.factors._
    // Up to 6 APs per request; spread varies per user so every distribution
    // tier occurs; a per-user level shift sweeps the signal tiers.
    val raw = Tables.events(s, dir).select(
      col("user_id").cast("string").as("request_id"),
      format_string("%02x", (col("user_id") * 3 + col("event_id") % 6) % 40).as("mac"),
      (-lit(40) - (col("event_id") % (lit(1) + col("user_id") % 25))
        - lit(25) * (col("user_id") % 3)).cast("double").as("rssi"))
    raw.groupBy("request_id", "mac").agg(max("rssi").as("rssi"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .mapGroups { (rid, it) =>
        val rows = it.toSeq.sortBy(r => (r._2, r._3))
        val ctx = Selector.buildContext(
          rows.map(r => WifiScan(r._2, r._3, 2437)), Map.empty)
        val apClass = ctx.apCount match {
          case ApCount.Single => "single"; case ApCount.Two => "two"
          case ApCount.Three => "three"; case ApCount.FourPlus => "four_plus"
        }
        val sigClass = ctx.signalQuality match {
          case SignalQuality.Strong => "strong"; case SignalQuality.Medium => "medium"
          case SignalQuality.Weak => "weak"; case SignalQuality.VeryWeak => "very_weak"
        }
        val distClass = ctx.signalDistribution match {
          case SignalDistribution.Uniform => "uniform"
          case SignalDistribution.Mixed => "mixed"
          case SignalDistribution.Outliers => "outliers"
        }
        (rid, rows.size.toLong, apClass, sigClass, distClass)
      }
      .toDF("request_id", "n_aps", "ap_count_class", "signal_class",
        "distribution_class")
      .orderBy("request_id")
  }

  /** C3 — scenario classification, oracled per row over every branch of
    * `ComparisonScenario.determineScenario` (null-service analysis, both
    * success, cell-fallback sniffing via the insufficient-AP error strings
    * and the 250 m accuracy threshold, one-sided successes, both-failed). */
  val scenarioClasses: Reg = Reg.sql(
    "c3_scenario_classes",
    """WITH m AS (
      |  SELECT
      |    CASE WHEN event_id % 7 = 0 THEN NULL
      |         ELSE event_id % 3 <> 0 END AS vlss_success,
      |    CASE WHEN event_id % 11 = 0 THEN NULL
      |         ELSE event_id % 2 = 0 END AS frisco_success,
      |    CASE WHEN event_id % 4 = 0 THEN 'No known access points found in database'
      |         WHEN event_id % 4 = 1 THEN 'Insufficient valid access points for positioning'
      |         WHEN event_id % 4 = 2 THEN 'wifi timeout'
      |         ELSE NULL END AS frisco_error,
      |    CASE WHEN event_id % 13 = 0 THEN NULL
      |         ELSE CAST(event_id % 400 AS DOUBLE) END AS vlss_accuracy
      |  FROM events),
      |cls AS (
      |  SELECT
      |    CASE
      |      WHEN vlss_success IS NULL THEN 'FRISCO_ONLY_ANALYSIS'
      |      WHEN vlss_success AND COALESCE(frisco_success, FALSE)
      |        THEN 'BOTH_WIFI_SUCCESS'
      |      WHEN vlss_success
      |           AND (contains(lower(COALESCE(frisco_error, '')),
      |                  'no known access points found in database')
      |             OR contains(lower(COALESCE(frisco_error, '')),
      |                  'no access points with valid status found')
      |             OR (contains(lower(COALESCE(frisco_error, '')), 'insufficient')
      |                 AND contains(lower(COALESCE(frisco_error, '')), 'access point')))
      |           AND vlss_accuracy IS NOT NULL AND vlss_accuracy >= 250.0
      |        THEN 'VLSS_CELL_FALLBACK_DETECTED'
      |      WHEN vlss_success AND vlss_accuracy IS NOT NULL AND vlss_accuracy >= 250.0
      |        THEN 'VLSS_SUCCESS_FRISCO_ERROR_CELL'
      |      WHEN vlss_success THEN 'VLSS_SUCCESS_FRISCO_ERROR_WIFI'
      |      WHEN COALESCE(frisco_success, FALSE) THEN 'VLSS_ERROR_FRISCO_SUCCESS'
      |      ELSE 'BOTH_INSUFFICIENT_DATA'
      |    END AS scenario
      |  FROM m)
      |SELECT scenario, COUNT(*) AS cnt FROM cls
      |GROUP BY scenario ORDER BY scenario""".stripMargin) { (s, dir) =>
    val m = Tables.events(s, dir).select(
      when(col("event_id") % 7 === 0, lit(null).cast("boolean"))
        .otherwise(col("event_id") % 3 =!= 0).as("vlss_success"),
      when(col("event_id") % 11 === 0, lit(null).cast("boolean"))
        .otherwise(col("event_id") % 2 === 0).as("frisco_success"),
      when(col("event_id") % 4 === 0, "No known access points found in database")
        .when(col("event_id") % 4 === 1, "Insufficient valid access points for positioning")
        .when(col("event_id") % 4 === 2, "wifi timeout")
        .otherwise(lit(null).cast("string")).as("frisco_error"),
      when(col("event_id") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("event_id") % 400).cast("double")).as("vlss_accuracy"))
    m.select(graft.serve.Comparison.scenario(
        col("vlss_success"), col("frisco_success"),
        col("frisco_error"), col("vlss_accuracy")).as("scenario"))
      .groupBy("scenario").agg(count(lit(1)).as("cnt"))
      .orderBy("scenario")
  }

  /** P8 — signal-physics validator, oracled per request: every rule of
    * `SignalPhysicsValidator` (rssi bounds, per-frequency-group spread cap
    * for strong groups, the explicit −30/−100 boundary-pair allowance) is
    * grouped SQL. The synthesis sweeps valid/invalid bounds, strong and weak
    * groups, and over-spread strong groups. */
  val physicsGate: Reg = Reg.sql(
    "p8_physics_gate",
    """WITH scans AS (
      |  SELECT CAST(user_id AS VARCHAR) AS request_id,
      |         CAST(-30 - (event_id % 75) AS DOUBLE) AS rssi,
      |         CASE WHEN event_id % 2 = 0 THEN 2437 ELSE 5180 END AS freq
      |  FROM events),
      |grp AS (
      |  SELECT request_id, freq, COUNT(*) AS n,
      |         MAX(rssi) AS strongest, MIN(rssi) AS weakest
      |  FROM scans GROUP BY request_id, freq),
      |grp_ok AS (
      |  SELECT request_id,
      |         BOOL_AND(n < 2 OR (strongest = -30.0 AND weakest = -100.0)
      |                  OR strongest <= -50.0
      |                  OR strongest - weakest <= 45.0) AS groups_ok
      |  FROM grp GROUP BY request_id),
      |bounds AS (
      |  SELECT request_id, COUNT(*) AS n_scans,
      |         BOOL_AND(rssi >= -100.0 AND rssi <= -30.0) AS bounds_ok
      |  FROM scans GROUP BY request_id)
      |SELECT b.request_id, b.n_scans,
      |       (b.bounds_ok AND g.groups_ok) AS possible
      |FROM bounds b JOIN grp_ok g ON g.request_id = b.request_id
      |ORDER BY b.request_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{SignalPhysics, WifiScan}
    Tables.events(s, dir).select(
      col("user_id").cast("string").as("request_id"),
      (-lit(30) - (col("event_id") % 75)).cast("double").as("rssi"),
      when(col("event_id") % 2 === 0, 2437).otherwise(5180).as("freq"))
      .as[(String, Double, Int)]
      .groupByKey(_._1)
      .mapGroups { (rid, it) =>
        val rows = it.toSeq
        val possible = SignalPhysics.isPhysicallyPossible(
          rows.map(r => WifiScan(rid, r._2, r._3)))
        (rid, rows.size.toLong, possible)
      }
      .toDF("request_id", "n_scans", "possible")
      .orderBy("request_id")
  }

  /** P5 — log-distance path-loss model, oracled over the full input space:
    * vendor exponent table (case-insensitive, default 3.0), signal-adjusted
    * exponent (strong −, weak +, clamped [2,5]), frequency reference RSSI
    * tiers, interpolated shadow σ, and the (signal, σ) environment factor —
    * every branch is CASE arithmetic DuckDB states with the same IEEE op
    * order (POW(10, x) parity with Java Math.pow is established by the
    * r7_wcl_tier oracle's 10^(rssi/10) weights). Output is the distinct
    * (rssi, freq, vendor) grid, so row identity needs no synthetic id. */
  val logDistance: Reg = Reg.sql(
    "p5_log_distance",
    """WITH synth AS (
      |  SELECT DISTINCT
      |    CAST(-30 - (event_id % 70) AS DOUBLE) AS rssi,
      |    CASE WHEN event_id % 3 = 0 THEN 2437
      |         WHEN event_id % 3 = 1 THEN 5180 ELSE 900 END AS freq,
      |    CASE WHEN user_id % 6 = 0 THEN 'Cisco'
      |         WHEN user_id % 6 = 1 THEN 'aruba'
      |         WHEN user_id % 6 = 2 THEN 'ubiquiti'
      |         WHEN user_id % 6 = 3 THEN 'acme-unknown'
      |         WHEN user_id % 6 = 4 THEN ''
      |         ELSE NULL END AS vendor
      |  FROM events),
      |calc AS (
      |  SELECT rssi, freq, vendor,
      |    CASE WHEN freq >= 5000 THEN -45.0
      |         WHEN freq >= 2400 THEN -40.0 ELSE -43.0 END AS ref,
      |    CASE WHEN lower(trim(vendor)) = 'cisco' THEN 3.0
      |         WHEN lower(trim(vendor)) = 'aruba' THEN 2.8
      |         WHEN lower(trim(vendor)) = 'meraki' THEN 3.0
      |         WHEN lower(trim(vendor)) = 'ubiquiti' THEN 2.7
      |         WHEN lower(trim(vendor)) = 'ruckus' THEN 2.9
      |         WHEN lower(trim(vendor)) = 'hpe-aruba' THEN 2.8
      |         ELSE 3.0 END AS base_n
      |  FROM synth),
      |adj AS (
      |  SELECT rssi, freq, vendor, ref,
      |    CASE WHEN rssi >= -50.0
      |           THEN GREATEST(2.0, base_n - LEAST(1.0, (rssi + 50.0) / 5.0))
      |         WHEN rssi <= -80.0
      |           THEN LEAST(5.0, base_n + LEAST(1.5, (-80.0 - rssi) / 5.0))
      |         ELSE base_n END AS n,
      |    CASE WHEN rssi >= -50.0 THEN 2.0
      |         WHEN rssi <= -80.0 THEN 5.0
      |         ELSE 5.0 - ((rssi + 80.0) / 30.0) * 3.0 END AS sigma
      |  FROM calc),
      |dist AS (
      |  SELECT rssi, freq, vendor,
      |    POWER(10, ABS(ref - rssi) / (10.0 * n)) * (1.0 + sigma / 10.0) *
      |    (CASE WHEN rssi >= -50.0 AND sigma <= 2.0 THEN 1.0
      |          WHEN rssi >= -80.0 AND sigma <= 4.0 THEN 0.8
      |          ELSE 0.6 END) AS d
      |  FROM adj)
      |SELECT rssi, freq, COALESCE(vendor, '(none)') AS vendor,
      |       ROUND(d, 6) AS distance_m
      |FROM dist ORDER BY rssi, freq, vendor""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.LogDistance
    Tables.events(s, dir).select(
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      when(col("event_id") % 3 === 0, 2437)
        .when(col("event_id") % 3 === 1, 5180).otherwise(900).as("freq"),
      when(col("user_id") % 6 === 0, "Cisco")
        .when(col("user_id") % 6 === 1, "aruba")
        .when(col("user_id") % 6 === 2, "ubiquiti")
        .when(col("user_id") % 6 === 3, "acme-unknown")
        .when(col("user_id") % 6 === 4, "")
        .otherwise(lit(null).cast("string")).as("vendor"))
      .distinct()
      .as[(Double, Int, String)]
      .map { case (rssi, freq, vendor) =>
        (rssi, freq, Option(vendor).getOrElse("(none)"),
          LogDistance.distance(rssi, freq, Option(vendor)))
      }
      .toDF("rssi", "freq", "vendor", "d")
      .select(col("rssi"), col("freq"), col("vendor"),
        round(col("d"), 6).as("distance_m"))
      .orderBy("rssi", "freq", "vendor")
  }

  /** R2–R4 — the complete selection rule engine, oracled as a conformance
    * sweep: every context combination (4 AP-count × 4 signal × 3
    * distribution × 5 geometry = 240) present in the events table drives the
    * REAL `Selector.select`, and DuckDB independently restates the hard
    * constraints (very-weak → proximity only; count-based candidate sets;
    * poor/collinear trilateration knockout), the full 6-algorithm weight
    * tables, and the finalist rules (0.4 threshold with the sole-survivor
    * exemption, top-weight > 0.8 → keep 2, else top 3 of > 3). Ties break on
    * the fixed candidate order in both (Scala's stable sort ↔ ORDER BY
    * weight DESC, ord). Weight literals multiply in the same order on both
    * sides, so products are bit-equal. */
  val selectionEngine: Reg = Reg.sql(
    "r2_r4_selection",
    """WITH ctx AS (
      |  SELECT DISTINCT CAST(event_id % 240 AS INT) AS combo,
      |    CASE (event_id % 240) % 4 WHEN 0 THEN 'single' WHEN 1 THEN 'two'
      |         WHEN 2 THEN 'three' ELSE 'four_plus' END AS apc,
      |    CASE ((event_id % 240) // 4) % 4 WHEN 0 THEN 'strong'
      |         WHEN 1 THEN 'medium' WHEN 2 THEN 'weak'
      |         ELSE 'very_weak' END AS sig,
      |    CASE ((event_id % 240) // 16) % 3 WHEN 0 THEN 'uniform'
      |         WHEN 1 THEN 'mixed' ELSE 'outliers' END AS dst,
      |    CASE ((event_id % 240) // 48) % 5 WHEN 0 THEN 'excellent'
      |         WHEN 1 THEN 'good' WHEN 2 THEN 'fair' WHEN 3 THEN 'poor'
      |         ELSE 'collinear' END AS geo
      |  FROM events),
      |weights(algo, ord, w_single, w_two, w_three, w_four,
      |        s_strong, s_medium, s_weak, s_vweak,
      |        g_exc, g_good, g_fair, g_poor, g_coll, d_uni, d_mix, d_out) AS (
      |  VALUES
      |  ('proximity',              1, 1.0,0.4,0.3,0.2, 0.9,0.7,0.4,0.5,
      |   1.0,1.0,1.0,1.0,1.0, 1.0,0.7,0.9),
      |  ('rssi_ratio',             2, 0.0,1.0,0.7,0.5, 1.0,0.9,0.6,0.0,
      |   1.0,1.0,0.9,0.8,0.8, 1.2,0.9,0.7),
      |  ('weighted_centroid',      3, 0.0,0.8,0.8,0.7, 1.0,1.0,0.8,0.0,
      |   1.0,1.1,1.2,1.3,1.3, 1.0,1.8,1.4),
      |  ('trilateration',          4, 0.0,0.0,1.0,0.8, 1.1,0.8,0.3,0.0,
      |   1.3,0.9,0.6,0.3,0.0, 1.1,0.8,0.5),
      |  ('maximum_likelihood',     5, 0.0,0.0,0.0,1.0, 1.2,0.9,0.5,0.0,
      |   1.2,1.1,0.9,0.7,0.7, 0.9,1.1,1.2),
      |  ('log_distance_path_loss', 6, 0.4,0.5,0.5,0.4, 1.0,0.8,0.6,0.0,
      |   1.0,1.0,0.8,0.7,0.3, 1.1,0.8,0.8)),
      |cand AS (
      |  SELECT c.combo, w.algo, w.ord,
      |    CAST(CASE c.apc WHEN 'single' THEN w_single WHEN 'two' THEN w_two
      |         WHEN 'three' THEN w_three ELSE w_four END AS DOUBLE) *
      |    CAST(CASE c.sig WHEN 'strong' THEN s_strong WHEN 'medium' THEN s_medium
      |         WHEN 'weak' THEN s_weak ELSE s_vweak END AS DOUBLE) *
      |    CAST(CASE c.geo WHEN 'excellent' THEN g_exc WHEN 'good' THEN g_good
      |         WHEN 'fair' THEN g_fair WHEN 'poor' THEN g_poor
      |         ELSE g_coll END AS DOUBLE) *
      |    CAST(CASE c.dst WHEN 'uniform' THEN d_uni WHEN 'mixed' THEN d_mix
      |         ELSE d_out END AS DOUBLE) AS weight
      |  FROM ctx c CROSS JOIN weights w
      |  WHERE CASE WHEN c.sig = 'very_weak' THEN w.algo = 'proximity'
      |        ELSE
      |          (CASE c.apc
      |           WHEN 'single' THEN
      |             w.algo IN ('proximity', 'log_distance_path_loss')
      |           WHEN 'two' THEN w.algo IN ('proximity', 'rssi_ratio',
      |             'weighted_centroid', 'log_distance_path_loss')
      |           WHEN 'three' THEN w.algo <> 'maximum_likelihood'
      |           ELSE TRUE END)
      |          AND NOT (c.geo IN ('poor', 'collinear')
      |                   AND w.algo = 'trilateration')
      |        END),
      |stats AS (SELECT combo, COUNT(*) AS n_cand FROM cand GROUP BY combo),
      |kept AS (
      |  SELECT cand.* FROM cand JOIN stats USING (combo)
      |  WHERE stats.n_cand = 1 OR cand.weight >= 0.4),
      |ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY combo ORDER BY weight DESC, ord)
      |      AS rank,
      |    MAX(weight) OVER (PARTITION BY combo) AS topw,
      |    COUNT(*) OVER (PARTITION BY combo) AS m
      |  FROM kept)
      |SELECT combo, rank, algo AS algorithm, ROUND(weight, 6) AS weight
      |FROM ranked
      |WHERE rank <= CASE WHEN topw > 0.8 THEN 2 WHEN m > 3 THEN 3 ELSE m END
      |ORDER BY combo, rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.Selector
    import graft.algo.factors._
    Tables.events(s, dir)
      .select((col("event_id") % 240).cast("int").as("combo"))
      .distinct()
      .as[Int]
      .flatMap { combo =>
        val ap = (combo % 4) match {
          case 0 => ApCount.Single; case 1 => ApCount.Two
          case 2 => ApCount.Three; case _ => ApCount.FourPlus
        }
        val sig = ((combo / 4) % 4) match {
          case 0 => SignalQuality.Strong; case 1 => SignalQuality.Medium
          case 2 => SignalQuality.Weak; case _ => SignalQuality.VeryWeak
        }
        val dst = ((combo / 16) % 3) match {
          case 0 => SignalDistribution.Uniform
          case 1 => SignalDistribution.Mixed
          case _ => SignalDistribution.Outliers
        }
        val geo = ((combo / 48) % 5) match {
          case 0 => GeometricQuality.Excellent; case 1 => GeometricQuality.Good
          case 2 => GeometricQuality.Fair; case 3 => GeometricQuality.Poor
          case _ => GeometricQuality.Collinear
        }
        Selector.select(Selector.SelectionContext(ap, sig, dst, geo))
          .zipWithIndex.map { case (sel, i) =>
            (combo, (i + 1).toLong, sel.algorithm.name, sel.weight)
          }
      }
      .toDF("combo", "rank", "algorithm", "w")
      .select(col("combo"), col("rank"), col("algorithm"),
        round(col("w"), 6).as("weight"))
      .orderBy("combo", "rank")
  }

  /** R6 — the weighted-average position combiner, oracled end-to-end: the
    * normalized-weight position/confidence means, the coordinate-covariance
    * condition number (closed-form 2×2 eigenvalues, MaxValue on singular),
    * the eigenvalue-share collinearity test, the geometric quality factor,
    * and the hybrid median / 25 %-trimmed-mean accuracy with 2-MAD outlier
    * inflation — every step is per-group arithmetic DuckDB restates. The
    * synthesis plants single-member groups (pass-through), collinear member
    * sets (the ≤0.69 confidence clamp + 6 m accuracy floor branch), scatter
    * groups, and one accuracy outlier per full group (MAD inflation fires).
    * Accuracies are distinct within a group, so median/trim orderings have
    * no ties to break. */
  val combinerBlend: Reg = Reg.sql(
    "r6_combiner_blend",
    """WITH members AS (
      |  SELECT DISTINCT user_id AS gid, event_id % 6 AS m,
      |    CASE WHEN user_id % 4 = 0
      |         THEN (user_id % 90) + (event_id % 6) * CAST(0.001 AS DOUBLE)
      |         ELSE (user_id % 90) +
      |              ((event_id % 6) * (event_id % 6)) * CAST(0.0007 AS DOUBLE)
      |    END AS lat,
      |    CASE WHEN user_id % 4 = 0
      |         THEN ((user_id % 180) - 90) + (event_id % 6) * CAST(0.002 AS DOUBLE)
      |         ELSE ((user_id % 180) - 90) +
      |              CASE WHEN event_id % 2 = 0 THEN (event_id % 6) ELSE -(event_id % 6) END
      |                * CAST(0.0011 AS DOUBLE)
      |    END AS lon,
      |    (event_id % 6) * CAST(2.0 AS DOUBLE) AS alt,
      |    CASE WHEN event_id % 6 = 5 THEN CAST(60.0 AS DOUBLE)
      |         ELSE 5.0 + (event_id % 6) * CAST(3.0 AS DOUBLE) END AS acc,
      |    0.5 + (event_id % 6) * CAST(0.05 AS DOUBLE) AS conf,
      |    0.5 + (event_id % 6) * CAST(0.25 AS DOUBLE) AS w
      |  FROM events
      |  WHERE NOT (user_id % 7 = 0 AND event_id % 6 > 0)),
      |tw AS (SELECT gid, SUM(w) AS total_w, COUNT(*) AS cnt
      |       FROM members GROUP BY gid),
      |agg AS (
      |  SELECT m.gid, ANY_VALUE(t.cnt) AS n, ANY_VALUE(t.total_w) AS total_w,
      |         SUM(m.lat * (m.w / t.total_w)) AS c_lat,
      |         SUM(m.lon * (m.w / t.total_w)) AS c_lon,
      |         SUM(m.alt * (m.w / t.total_w)) AS c_alt,
      |         SUM(m.conf * (m.w / t.total_w)) AS c_conf,
      |         SUM(m.lat) / ANY_VALUE(t.cnt) AS m_lat,
      |         SUM(m.lon) / ANY_VALUE(t.cnt) AS m_lon
      |  FROM members m JOIN tw t ON t.gid = m.gid GROUP BY m.gid),
      |cov AS (
      |  SELECT a.gid,
      |         SUM((mm.lat - a.m_lat) * (mm.lat - a.m_lat)) / a.n AS cll,
      |         SUM((mm.lon - a.m_lon) * (mm.lon - a.m_lon)) / a.n AS cnn,
      |         SUM((mm.lat - a.m_lat) * (mm.lon - a.m_lon)) / a.n AS cln
      |  FROM agg a JOIN members mm ON mm.gid = a.gid
      |  GROUP BY a.gid, a.n),
      |geom AS (
      |  SELECT c.gid,
      |    CASE WHEN ABS(c.cll * c.cnn - c.cln * c.cln) < 1e-10
      |         THEN CAST(1.7976931348623157e308 AS DOUBLE)
      |         WHEN ABS((c.cll + c.cnn
      |               - SQRT(GREATEST(0.0, (c.cll + c.cnn) * (c.cll + c.cnn)
      |                      - 4.0 * (c.cll * c.cnn - c.cln * c.cln)))) / 2.0) < 1e-15
      |         THEN CAST(1.7976931348623157e308 AS DOUBLE)
      |         ELSE ABS((c.cll + c.cnn
      |               + SQRT(GREATEST(0.0, (c.cll + c.cnn) * (c.cll + c.cnn)
      |                      - 4.0 * (c.cll * c.cnn - c.cln * c.cln)))) / 2.0) /
      |              ABS((c.cll + c.cnn
      |               - SQRT(GREATEST(0.0, (c.cll + c.cnn) * (c.cll + c.cnn)
      |                      - 4.0 * (c.cll * c.cnn - c.cln * c.cln)))) / 2.0)
      |    END AS cond,
      |    (a.n >= 3 AND c.cll + c.cnn >= 1e-20 AND
      |     ((c.cll + c.cnn
      |        - SQRT(GREATEST(0.0, (c.cll + c.cnn) * (c.cll + c.cnn)
      |               - 4.0 * (c.cll * c.cnn - c.cln * c.cln)))) / 2.0)
      |       / (c.cll + c.cnn) < 0.01) AS collinear
      |  FROM cov c JOIN agg a ON a.gid = c.gid),
      |acc_stats AS (
      |  SELECT gid, MEDIAN(acc) AS med FROM members GROUP BY gid),
      |acc_rank AS (
      |  SELECT gid, acc,
      |         ROW_NUMBER() OVER (PARTITION BY gid ORDER BY acc) AS rn,
      |         COUNT(*) OVER (PARTITION BY gid) AS n
      |  FROM members),
      |trimmed AS (
      |  SELECT gid, AVG(acc) AS tmean
      |  FROM acc_rank
      |  WHERE rn > CAST(FLOOR(n * 0.25) AS BIGINT)
      |    AND rn <= n - CAST(FLOOR(n * 0.25) AS BIGINT)
      |  GROUP BY gid),
      |mad_stats AS (
      |  SELECT mm.gid, MEDIAN(ABS(mm.acc - s.med)) AS mad
      |  FROM members mm JOIN acc_stats s ON s.gid = mm.gid
      |  GROUP BY mm.gid),
      |outl AS (
      |  SELECT mm.gid,
      |    CAST(SUM(CASE WHEN mm.acc > s.med + 2.0 * d.mad THEN 1 ELSE 0 END)
      |         AS DOUBLE) / COUNT(*) AS oratio
      |  FROM members mm
      |  JOIN acc_stats s ON s.gid = mm.gid
      |  JOIN mad_stats d ON d.gid = mm.gid
      |  GROUP BY mm.gid),
      |blended AS (
      |  SELECT a.gid, a.n, a.c_lat, a.c_lon, a.c_alt, a.c_conf, g.cond,
      |    g.collinear,
      |    CASE WHEN g.collinear
      |         THEN 2.0 + LEAST(1.0, LOG10(GREATEST(g.cond, 1.0)) / 2.0)
      |         WHEN g.cond < 5.0 THEN 1.0
      |         WHEN g.cond < 20.0 THEN 1.0 + (g.cond - 5.0) / 15.0
      |         ELSE 2.0 + LEAST(1.0, (g.cond - 20.0) / 80.0) END AS factor,
      |    CASE WHEN s.med IS NULL THEN 0.0
      |         WHEN a.n <= 3 THEN s.med
      |         ELSE 0.7 * s.med + 0.3 * COALESCE(t.tmean, s.med) END AS robust,
      |    o.oratio
      |  FROM agg a
      |  JOIN geom g ON g.gid = a.gid
      |  JOIN acc_stats s ON s.gid = a.gid
      |  LEFT JOIN trimmed t ON t.gid = a.gid
      |  JOIN outl o ON o.gid = a.gid),
      |multi AS (
      |  SELECT gid, n, c_lat AS lat, c_lon AS lon, c_alt AS alt,
      |    CASE WHEN collinear
      |         THEN GREATEST(6.0,
      |           (CASE WHEN oratio > 0 THEN robust * (1.0 + oratio * 0.5)
      |                 ELSE robust END) *
      |           GREATEST(factor, SQRT(cond / 10.0)))
      |         ELSE GREATEST(
      |           CASE WHEN oratio > 0 THEN robust * (1.0 + oratio * 0.5)
      |                ELSE robust END,
      |           (CASE WHEN oratio > 0 THEN robust * (1.0 + oratio * 0.5)
      |                 ELSE robust END) * factor) END AS accuracy,
      |    CASE WHEN collinear
      |         THEN LEAST(0.69, c_conf / (factor * 1.2))
      |         ELSE c_conf / SQRT(factor) END AS confidence
      |  FROM blended WHERE n > 1),
      |single AS (
      |  SELECT gid, 1 AS n, lat, lon, alt, acc AS accuracy, conf AS confidence
      |  FROM members
      |  WHERE gid IN (SELECT gid FROM agg WHERE n = 1)),
      |unioned AS (
      |  SELECT * FROM multi UNION ALL SELECT * FROM single)
      |SELECT CAST(gid AS VARCHAR) AS group_id, CAST(n AS BIGINT) AS n_members,
      |       ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon, ROUND(alt, 6) AS alt,
      |       ROUND(accuracy, 4) AS accuracy, ROUND(confidence, 4) AS confidence
      |FROM unioned ORDER BY group_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{Combiner, Position}
    val members = Tables.events(s, dir).select(
      col("user_id").as("gid"), (col("event_id") % 6).as("m"),
      when(col("user_id") % 4 === 0,
        (col("user_id") % 90) + (col("event_id") % 6) * lit(0.001))
        .otherwise((col("user_id") % 90) +
          ((col("event_id") % 6) * (col("event_id") % 6)) * lit(0.0007)).as("lat"),
      when(col("user_id") % 4 === 0,
        ((col("user_id") % 180) - 90) + (col("event_id") % 6) * lit(0.002))
        .otherwise(((col("user_id") % 180) - 90) +
          when(col("event_id") % 2 === 0, col("event_id") % 6)
            .otherwise(-(col("event_id") % 6)) * lit(0.0011)).as("lon"),
      ((col("event_id") % 6) * lit(2.0)).as("alt"),
      when(col("event_id") % 6 === 5, lit(60.0))
        .otherwise(lit(5.0) + (col("event_id") % 6) * lit(3.0)).as("acc"),
      (lit(0.5) + (col("event_id") % 6) * lit(0.05)).as("conf"),
      (lit(0.5) + (col("event_id") % 6) * lit(0.25)).as("w"))
      .where(!(col("gid") % 7 === 0 && col("m") > 0))
      .distinct()
    members
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (gid, it) =>
        // sort by member index: Scala's accumulation order (SQL SUM order
        // differs only in final-ulp association; outputs are rounded)
        val rows = it.toSeq.sortBy(_._2)
        val wps = rows.map { case (_, _, lat, lon, alt, acc, conf, w) =>
          Combiner.WeightedPosition(Position(lat, lon, alt, acc, conf), w)
        }
        val p = Combiner.combine(wps).get
        (gid.toString, rows.size.toLong, p.lat, p.lon, p.alt, p.accuracy, p.confidence)
      }
      .toDF("group_id", "n_members", "lat0", "lon0", "alt0", "acc0", "conf0")
      .select(col("group_id"), col("n_members"),
        round(col("lat0"), 6).as("lat"), round(col("lon0"), 6).as("lon"),
        round(col("alt0"), 6).as("alt"), round(col("acc0"), 4).as("accuracy"),
        round(col("conf0"), 4).as("confidence"))
      .orderBy("group_id")
  }

  /** P3 — RSSI-ratio interpolation, oracled end-to-end: the C(n,2) pair
    * enumeration (the J4 self-join shape, ordered by scan index), the
    * 10^(Δrssi/20) ratio interpolation per pair, |Δrssi|/30 pair weights,
    * the both-sides-only altitude blend, the signal-factor accuracy scale,
    * and the two-stage capped confidence with its strong-signal floor —
    * all per-request arithmetic DuckDB restates (POW parity per
    * p5/r7_wcl). Scan-level stats run over ALL scans (including the
    * unknown-AP one some requests carry) while pair terms use only
    * known-AP pairs — the oracle distinguishes the two the same way the
    * algorithm does. */
  val rssiRatio: Reg = Reg.sql(
    "p3_rssi_ratio",
    """WITH scans AS (
      |  SELECT DISTINCT user_id AS rid, event_id % 5 AS m,
      |         (user_id * 3 + event_id % 5) % 50 AS s,
      |         CAST(-40 - ((user_id + (event_id % 5) * 7) % 55) AS DOUBLE) AS rssi
      |  FROM events),
      |ap AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS s,
      |         ((s_suppkey % 120) - 60 + (s_suppkey % 10) * CAST(0.0005 AS DOUBLE))
      |           AS ap_lat,
      |         ((s_suppkey % 300) - 150 + (s_suppkey % 7) * CAST(0.0005 AS DOUBLE))
      |           AS ap_lon,
      |         CASE WHEN s_suppkey % 3 = 0 THEN s_acctbal / 1000 END AS ap_alt,
      |         (CAST(5.0 AS DOUBLE) + s_suppkey % 10) AS ap_hacc
      |  FROM supplier WHERE s_suppkey <= 50),
      |sc AS (SELECT scans.*, ap.ap_lat, ap.ap_lon, ap.ap_alt, ap.ap_hacc,
      |              (ap.s IS NOT NULL) AS known
      |       FROM scans LEFT JOIN ap ON ap.s = scans.s),
      |pairs AS (
      |  SELECT a.rid,
      |         ABS(a.rssi - b.rssi) / 30.0 AS w,
      |         ((a.ap_lat + POWER(10, (a.rssi - b.rssi) / 20.0) * b.ap_lat) /
      |          (1 + POWER(10, (a.rssi - b.rssi) / 20.0))) *
      |           (ABS(a.rssi - b.rssi) / 30.0) AS wlat,
      |         ((a.ap_lon + POWER(10, (a.rssi - b.rssi) / 20.0) * b.ap_lon) /
      |          (1 + POWER(10, (a.rssi - b.rssi) / 20.0))) *
      |           (ABS(a.rssi - b.rssi) / 30.0) AS wlon,
      |         CASE WHEN a.ap_alt IS NOT NULL AND b.ap_alt IS NOT NULL
      |              THEN ((a.ap_alt + POWER(10, (a.rssi - b.rssi) / 20.0) * b.ap_alt) /
      |                    (1 + POWER(10, (a.rssi - b.rssi) / 20.0))) *
      |                     (ABS(a.rssi - b.rssi) / 30.0)
      |              ELSE 0.0 END AS walt,
      |         CASE WHEN a.ap_alt IS NOT NULL AND b.ap_alt IS NOT NULL
      |              THEN ABS(a.rssi - b.rssi) / 30.0 ELSE 0.0 END AS altw
      |  FROM sc a JOIN sc b ON b.rid = a.rid AND a.m < b.m
      |  WHERE a.known AND b.known),
      |pagg AS (
      |  SELECT rid, SUM(w) AS total_w, SUM(wlat) AS sw_lat, SUM(wlon) AS sw_lon,
      |         SUM(walt) AS sw_alt, SUM(altw) AS alt_w
      |  FROM pairs GROUP BY rid),
      |sstats AS (
      |  SELECT rid, COUNT(*) AS n, AVG(rssi) AS avg_rssi,
      |         AVG(LEAST(1.0, GREATEST(0.0, (rssi + 95.0) / 45.0))) AS sigq,
      |         COALESCE(AVG(CASE WHEN known THEN ap_hacc END), 15.0) AS base_acc
      |  FROM sc GROUP BY rid),
      |calc AS (
      |  SELECT p.rid, s.n, p.total_w,
      |    GREATEST(-90.0, LEAST(90.0, p.sw_lat / p.total_w)) AS lat,
      |    GREATEST(-180.0, LEAST(180.0, p.sw_lon / p.total_w)) AS lon,
      |    CASE WHEN p.alt_w > 0 THEN p.sw_alt / p.alt_w ELSE 0.0 END AS alt,
      |    s.base_acc *
      |      GREATEST(1.0, LEAST(3.0, (-s.avg_rssi + (-50.0)) / 10.0)) AS accuracy,
      |    CASE WHEN s.avg_rssi >= -70.0
      |         THEN GREATEST(0.7,
      |           LEAST(0.85, LEAST(0.85, p.total_w / (s.n * (s.n - 1) / 2.0))
      |                       + s.sigq * 1.0))
      |         ELSE LEAST(0.85, LEAST(0.85, p.total_w / (s.n * (s.n - 1) / 2.0))
      |                    + s.sigq * 1.0) END AS confidence
      |  FROM pagg p JOIN sstats s ON s.rid = p.rid
      |  WHERE s.n >= 2 AND p.total_w > 0)
      |SELECT CAST(rid AS VARCHAR) AS request_id, CAST(n AS BIGINT) AS n_scans,
      |       ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon, ROUND(alt, 6) AS alt,
      |       ROUND(accuracy, 4) AS accuracy, ROUND(confidence, 4) AS confidence
      |FROM calc ORDER BY request_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{AccessPoint, RssiRatio, WifiScan}
    val apDim = Tables.supplier(s, dir)
      .where(col("s_suppkey") <= 50)
      .select(col("s_suppkey").cast("long").as("s"),
        ((col("s_suppkey") % 120) - 60 + (col("s_suppkey") % 10) * 0.0005).as("ap_lat"),
        ((col("s_suppkey") % 300) - 150 + (col("s_suppkey") % 7) * 0.0005).as("ap_lon"),
        when(col("s_suppkey") % 3 === 0, col("s_acctbal") / 1000).as("ap_alt"),
        (lit(5.0) + col("s_suppkey") % 10).as("ap_hacc"))
    Tables.events(s, dir)
      .select(col("user_id").as("rid"), (col("event_id") % 5).as("m"),
        ((col("user_id") * 3 + col("event_id") % 5) % 50).as("s"),
        (-lit(40) - ((col("user_id") + (col("event_id") % 5) * 7) % 55))
          .cast("double").as("rssi"))
      .distinct()
      .join(apDim, Seq("s"), "left")
      .select(col("rid"), col("m"), col("s"), col("rssi"),
        col("ap_lat"), col("ap_lon"), col("ap_alt"), col("ap_hacc"))
      .as[(Long, Long, Long, Double,
           Option[Double], Option[Double], Option[Double], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (rid, it) =>
        val rows = it.toSeq.sortBy(_._2) // scan index = member index
        val scans = rows.map(r => WifiScan(r._3.toString, r._4, 2437))
        val aps = rows.collect { case (_, _, mac, _, Some(la), Some(lo), alt, hacc) =>
          AccessPoint(mac.toString, la, lo, altitude = alt,
            horizontalAccuracy = hacc)
        }
        RssiRatio.calculate(scans, aps).map { p =>
          (rid.toString, rows.size.toLong, p.lat, p.lon, p.alt, p.accuracy, p.confidence)
        }
      }
      .toDF("request_id", "n_scans", "lat0", "lon0", "alt0", "acc0", "conf0")
      .select(col("request_id"), col("n_scans"),
        round(col("lat0"), 6).as("lat"), round(col("lon0"), 6).as("lon"),
        round(col("alt0"), 6).as("alt"), round(col("acc0"), 4).as("accuracy"),
        round(col("conf0"), 4).as("confidence"))
      .orderBy("request_id")
  }

  /** C5 — external (VLSS-shaped) request mapping, oracled: the nested
    * wifiInfo array explodes to one scan row per entry with MAC
    * normalization (lowercase, hyphens → colons) and unit casts; DuckDB
    * states the exploded, normalized rows directly. */
  val requestMapping: Reg = Reg.sql(
    "c5_request_mapping",
    """WITH k(i) AS (VALUES (0), (1)),
      |rows_ AS (
      |  SELECT CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)
      |           AS request_id,
      |         CASE WHEN user_id % 2 = 0 THEN 'clientA' ELSE 'clientB' END
      |           AS client,
      |         CASE WHEN k.i = 0
      |              THEN 'AA-BB-CC-00-' || printf('%02X', user_id % 99) || '-'
      |                   || printf('%02X', event_id % 99)
      |              ELSE 'dd-ee-ff-11-' || printf('%02x', user_id % 99) || '-'
      |                   || printf('%02x', event_id % 97) END AS raw_mac,
      |         CASE WHEN k.i = 0 THEN CAST(-35 - (event_id % 60) AS DOUBLE)
      |              ELSE CAST(-40 - (user_id % 55) AS DOUBLE) END
      |           AS signal_strength,
      |         CASE WHEN k.i = 0 THEN 2412 ELSE 5200 END AS frequency_mhz
      |  FROM events CROSS JOIN k)
      |SELECT request_id, client,
      |       lower(replace(raw_mac, '-', ':')) AS mac,
      |       signal_strength, frequency_mhz
      |FROM rows_ ORDER BY request_id, mac""".stripMargin) { (s, dir) =>
    val external = Tables.events(s, dir).select(
      concat(col("user_id").cast("string"), lit(":"),
        col("event_id").cast("string")).as("id"),
      when(col("user_id") % 2 === 0, "clientA").otherwise("clientB").as("client"),
      array(
        struct(
          concat(lit("AA-BB-CC-00-"), format_string("%02X", col("user_id") % 99),
            lit("-"), format_string("%02X", col("event_id") % 99)).as("macAddress"),
          (-lit(35) - (col("event_id") % 60)).cast("double").as("rssi"),
          lit(2412).as("frequency")),
        struct(
          concat(lit("dd-ee-ff-11-"), format_string("%02x", col("user_id") % 99),
            lit("-"), format_string("%02x", col("event_id") % 97)).as("macAddress"),
          (-lit(40) - (col("user_id") % 55)).cast("double").as("rssi"),
          lit(5200).as("frequency"))).as("wifiInfo"))
    graft.serve.Comparison.mapExternalRequest(external)
      .select(col("request_id"), col("client"), col("mac"),
        col("signal_strength"), col("frequency_mhz"))
      .orderBy("request_id", "mac")
  }

  /** C4 — AP enrichment, oracled: the request's scanned MACs left-join the
    * calculation diagnostics into one record per AP (unmatched scans keep
    * null diagnostics). The struct column is flattened for the hash gate —
    * same fields, scalar columns. */
  val apEnrichment: Reg = Reg.sql(
    "c4_ap_enrichment",
    """WITH req AS (
      |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS request_id,
      |         printf('%02x', (user_id * 5 + event_id % 4) % 60) AS mac,
      |         CAST(-45 - ((user_id + event_id % 4) % 50) AS DOUBLE) AS rssi
      |  FROM events),
      |calc AS (
      |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS request_id,
      |         printf('%02x', (user_id * 5 + event_id % 4) % 60) AS mac,
      |         CASE WHEN (user_id * 5 + event_id % 4) % 60 % 3 = 0
      |              THEN 'active' ELSE 'warning' END AS status,
      |         CASE WHEN event_id % 4 = 0 THEN 'used' ELSE 'filtered' END
      |           AS usage,
      |         CAST((user_id % 90) AS DOUBLE) AS lat,
      |         CAST((user_id % 180) - 90 AS DOUBLE) AS lon
      |  FROM events WHERE event_id % 3 <> 0),
      |cd AS (
      |  SELECT request_id, mac, MIN(status) AS status, MIN(usage) AS usage,
      |         MIN(lat) AS lat, MIN(lon) AS lon
      |  FROM calc GROUP BY request_id, mac)
      |SELECT r.request_id, r.mac, r.rssi, c.status, c.usage, c.lat, c.lon
      |FROM req r LEFT JOIN cd c ON c.request_id = r.request_id AND c.mac = r.mac
      |ORDER BY r.request_id, r.mac""".stripMargin) { (s, dir) =>
    val requestAps = Tables.events(s, dir).select(
      col("user_id").cast("string").as("request_id"),
      format_string("%02x", (col("user_id") * 5 + col("event_id") % 4) % 60).as("mac"),
      (-lit(45) - ((col("user_id") + col("event_id") % 4) % 50))
        .cast("double").as("rssi")).distinct()
    // Calculation diagnostics exist for a subset of scans; MIN-dedupe keeps
    // one deterministic record per (request, mac) like the service's map.
    val calcInfo = Tables.events(s, dir)
      .where(col("event_id") % 3 =!= 0)
      .select(
        col("user_id").cast("string").as("request_id"),
        format_string("%02x", (col("user_id") * 5 + col("event_id") % 4) % 60).as("mac"),
        when(((col("user_id") * 5 + col("event_id") % 4) % 60) % 3 === 0, "active")
          .otherwise("warning").as("status"),
        when(col("event_id") % 4 === 0, "used").otherwise("filtered").as("usage"),
        (col("user_id") % 90).cast("double").as("lat"),
        ((col("user_id") % 180) - 90).cast("double").as("lon"))
      .distinct()
      .groupBy("request_id", "mac")
      .agg(min("status").as("status"), min("usage").as("usage"),
        min("lat").as("lat"), min("lon").as("lon"))
    graft.serve.Comparison.enrichAccessPoints(requestAps, calcInfo)
      .select(col("request_id"),
        col("access_point.mac").as("mac"),
        col("access_point.rssi").as("rssi"),
        col("access_point.status").as("status"),
        col("access_point.usage").as("usage"),
        col("access_point.lat").as("lat"),
        col("access_point.lon").as("lon"))
      .orderBy("request_id", "mac")
  }

  /** R5 — the COMPLETE two-AP positioning response, oracled end-to-end
    * through the real service path (validate → context → select → weight →
    * run algorithms → combine): composes the restatements proven piecewise
    * by r1/r2_r4/p3/p8/r6 into one full-response gate.
    *
    * Why the 2-AP tier closes exactly: with two located APs geometry is
    * always Poor, where proximity (0.4 × ≤0.9 = ≤0.36) and log-distance
    * (0.5 × ≤1.0 × 0.7 × ≤1.1 = 0.385) sit BELOW the 0.4 finalist
    * threshold in every signal tier — so the panel is {weighted_centroid,
    * rssi_ratio} (wcl ≥ 0.832 > 0.8 → top-2 rule), degrading to wcl alone
    * (weak+outliers drops ratio to 0.336) or proximity alone (very-weak
    * hard constraint). A ≤2-member combine is closed-form: the member
    * covariance is rank-1 (condition number = MaxValue → factor 3.0, never
    * collinear below 3 members), the 2-element median is the mean, and the
    * 2-MAD outlier test can never fire — all stated literally in SQL,
    * including the FP quirks ((x·w)/w is NOT simplified to x). */
  val twoApResponse: Reg = Reg.sql(
    "r5_two_ap_response",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |-- AP keys 1..9: present and active at EVERY scale factor's supplier
      |req AS (
      |  SELECT CAST(user_id AS VARCHAR) AS rid, user_id,
      |         (user_id % 9) AS i1,
      |         CASE WHEN (user_id * 7 + 13) % 9 = user_id % 9
      |              THEN ((user_id % 9) + 1) % 9
      |              ELSE (user_id * 7 + 13) % 9 END AS i2,
      |         CAST(-35 - (user_id % 63) AS DOUBLE) AS r1,
      |         CAST(-40 - ((user_id * 3) % 57) AS DOUBLE) AS r2
      |  FROM u),
      |keyed AS (
      |  SELECT rid, (i1 + 1) AS v1, (i2 + 1) AS v2, r1, r2
      |  FROM req),
      |-- scan order = MAC lexicographic = AP-key order (first octet decides)
      |ord AS (
      |  SELECT rid,
      |         CASE WHEN v1 < v2 THEN v1 ELSE v2 END AS va,
      |         CASE WHEN v1 < v2 THEN r1 ELSE r2 END AS ra,
      |         CASE WHEN v1 < v2 THEN v2 ELSE v1 END AS vb,
      |         CASE WHEN v1 < v2 THEN r2 ELSE r1 END AS rb
      |  FROM keyed),
      |ap_attrs AS (
      |  SELECT o.rid, o.va, o.ra, o.vb, o.rb,
      |    ((o.va % 120) - 60 + (o.va % 10) * CAST(0.0005 AS DOUBLE)) AS la_a,
      |    ((o.va % 300) - 150 + (o.va % 7) * CAST(0.0005 AS DOUBLE)) AS lo_a,
      |    CASE WHEN o.va % 3 = 0 THEN sa.s_acctbal / 1000 END AS alt_a,
      |    (CAST(5.0 AS DOUBLE) + o.va % 10) AS h_a,
      |    ((o.vb % 120) - 60 + (o.vb % 10) * CAST(0.0005 AS DOUBLE)) AS la_b,
      |    ((o.vb % 300) - 150 + (o.vb % 7) * CAST(0.0005 AS DOUBLE)) AS lo_b,
      |    CASE WHEN o.vb % 3 = 0 THEN sb.s_acctbal / 1000 END AS alt_b,
      |    (CAST(5.0 AS DOUBLE) + o.vb % 10) AS h_b
      |  FROM ord o
      |  JOIN supplier sa ON sa.s_suppkey = o.va
      |  JOIN supplier sb ON sb.s_suppkey = o.vb),
      |ctx AS (
      |  SELECT *, (ra + rb) / 2 AS mean_rssi,
      |    SQRT(((ra - (ra + rb) / 2) * (ra - (ra + rb) / 2)
      |        + (rb - (ra + rb) / 2) * (rb - (ra + rb) / 2)) / 2) AS sd_rssi
      |  FROM ap_attrs),
      |cls AS (
      |  SELECT *,
      |    CASE WHEN mean_rssi >= -70 THEN 's' WHEN mean_rssi >= -85 THEN 'm'
      |         WHEN mean_rssi >= -95 THEN 'w' ELSE 'v' END AS sig,
      |    CASE WHEN sd_rssi <= 3.0 THEN 'u' WHEN sd_rssi <= 10.0 THEN 'x'
      |         ELSE 'o' END AS dst
      |  FROM ctx),
      |-- R3 weights for apCount=Two, geometry=Poor (order: ap·sig·geo·dst)
      |wts AS (
      |  SELECT *,
      |    CAST(0.4 AS DOUBLE) *
      |      CAST(CASE sig WHEN 's' THEN 0.9 WHEN 'm' THEN 0.7 WHEN 'w' THEN 0.4
      |           ELSE 0.5 END AS DOUBLE) * CAST(1.0 AS DOUBLE) *
      |      CAST(CASE dst WHEN 'u' THEN 1.0 WHEN 'x' THEN 0.7 ELSE 0.9 END
      |           AS DOUBLE) AS w_prox,
      |    CAST(1.0 AS DOUBLE) *
      |      CAST(CASE sig WHEN 's' THEN 1.0 WHEN 'm' THEN 0.9 WHEN 'w' THEN 0.6
      |           ELSE 0.0 END AS DOUBLE) * CAST(0.8 AS DOUBLE) *
      |      CAST(CASE dst WHEN 'u' THEN 1.2 WHEN 'x' THEN 0.9 ELSE 0.7 END
      |           AS DOUBLE) AS w_ratio,
      |    CAST(0.8 AS DOUBLE) *
      |      CAST(CASE sig WHEN 's' THEN 1.0 WHEN 'm' THEN 1.0 WHEN 'w' THEN 0.8
      |           ELSE 0.0 END AS DOUBLE) * CAST(1.3 AS DOUBLE) *
      |      CAST(CASE dst WHEN 'u' THEN 1.0 WHEN 'x' THEN 1.8 ELSE 1.4 END
      |           AS DOUBLE) AS w_wcl
      |  FROM cls),
      |-- algorithm positions ------------------------------------------------
      |pos AS (
      |  SELECT *,
      |    -- proximity: strongest scan (ties keep scan order = a first)
      |    CASE WHEN rb > ra THEN la_b ELSE la_a END AS px_lat,
      |    CASE WHEN rb > ra THEN lo_b ELSE lo_a END AS px_lon,
      |    CASE WHEN rb > ra THEN COALESCE(alt_b, 0.0)
      |         ELSE COALESCE(alt_a, 0.0) END AS px_alt,
      |    CASE WHEN rb > ra THEN h_b ELSE h_a END AS px_acc,
      |    LEAST(0.85, GREATEST(0.0,
      |      ((CASE WHEN rb > ra THEN rb ELSE ra END) + 90.0) / 60.0)) AS px_conf,
      |    -- rssi_ratio: single pair (a, b); (x·w)/w stated literally
      |    POWER(10, (ra - rb) / 20.0) AS rr_ratio,
      |    ABS(ra - rb) / 30.0 AS rr_w
      |  FROM wts),
      |pos2 AS (
      |  SELECT *,
      |    GREATEST(-90.0, LEAST(90.0,
      |      (((la_a + rr_ratio * la_b) / (1 + rr_ratio)) * rr_w) / rr_w)) AS rr_lat,
      |    GREATEST(-180.0, LEAST(180.0,
      |      (((lo_a + rr_ratio * lo_b) / (1 + rr_ratio)) * rr_w) / rr_w)) AS rr_lon,
      |    CASE WHEN alt_a IS NOT NULL AND alt_b IS NOT NULL
      |         THEN (((alt_a + rr_ratio * alt_b) / (1 + rr_ratio)) * rr_w) / rr_w
      |         ELSE 0.0 END AS rr_alt,
      |    ((h_a + h_b) / 2) *
      |      GREATEST(1.0, LEAST(3.0, (-mean_rssi + (-50.0)) / 10.0)) AS rr_acc,
      |    (CASE WHEN mean_rssi >= -70.0 THEN
      |       GREATEST(0.7, LEAST(0.85, LEAST(0.85, rr_w / 1.0)
      |         + (LEAST(1.0, GREATEST(0.0, (ra + 95.0) / 45.0))
      |            + LEAST(1.0, GREATEST(0.0, (rb + 95.0) / 45.0))) / 2 * 1.0))
      |     ELSE LEAST(0.85, LEAST(0.85, rr_w / 1.0)
      |         + (LEAST(1.0, GREATEST(0.0, (ra + 95.0) / 45.0))
      |            + LEAST(1.0, GREATEST(0.0, (rb + 95.0) / 45.0))) / 2 * 1.0)
      |     END) AS rr_conf,
      |    -- weighted_centroid: w = 10^clamp((rssi+30)/(-70), 0, 1)
      |    POWER(10, GREATEST(0.0, LEAST(1.0, (ra + 30.0) / (-70.0)))) AS wc_wa,
      |    POWER(10, GREATEST(0.0, LEAST(1.0, (rb + 30.0) / (-70.0)))) AS wc_wb
      |  FROM pos),
      |pos3 AS (
      |  SELECT *,
      |    (la_a * wc_wa + la_b * wc_wb) / (wc_wa + wc_wb) AS wc_lat,
      |    (lo_a * wc_wa + lo_b * wc_wb) / (wc_wa + wc_wb) AS wc_lon,
      |    CASE
      |      WHEN alt_a IS NOT NULL AND alt_b IS NOT NULL
      |        THEN (alt_a * wc_wa + alt_b * wc_wb) / (wc_wa + wc_wb)
      |      WHEN alt_a IS NOT NULL THEN (alt_a * wc_wa) / wc_wa
      |      WHEN alt_b IS NOT NULL THEN (alt_b * wc_wb) / wc_wb
      |      ELSE 0.0 END AS wc_alt,
      |    (h_a + h_b) / 2 AS wc_acc,
      |    CAST(0.7 AS DOUBLE) AS wc_conf
      |  FROM pos2),
      |-- R4 finalists + R6 combine ------------------------------------------
      |sel AS (
      |  SELECT *,
      |    -- equal RSSIs zero the pair weight and rssi_ratio produces no
      |    -- position (total weight <= 0 → None) even when selected
      |    CASE WHEN sig = 'v' THEN 1
      |         WHEN w_ratio >= 0.4 AND ra <> rb THEN 2 ELSE 1 END
      |      AS n_members,
      |    -- very-weak → proximity sole; else wcl leads (>0.8 in every tier;
      |    -- stable-sort tie order would put ratio first, but w_ratio ≤ 0.96
      |    -- < 0.832 ≤ w_wcl never ties it)
      |    CASE WHEN sig = 'v' THEN 'proximity'
      |         WHEN w_ratio > w_wcl THEN 'rssi_ratio'
      |         ELSE 'weighted_centroid' END AS algo1,
      |    CASE WHEN sig = 'v' THEN NULL
      |         WHEN w_ratio >= 0.4 AND ra <> rb THEN
      |           CASE WHEN w_ratio > w_wcl THEN 'weighted_centroid'
      |                ELSE 'rssi_ratio' END
      |         ELSE NULL END AS algo2
      |  FROM pos3),
      |mem AS (
      |  SELECT *,
      |    CASE algo1 WHEN 'proximity' THEN px_lat
      |         WHEN 'rssi_ratio' THEN rr_lat ELSE wc_lat END AS m1_lat,
      |    CASE algo1 WHEN 'proximity' THEN px_lon
      |         WHEN 'rssi_ratio' THEN rr_lon ELSE wc_lon END AS m1_lon,
      |    CASE algo1 WHEN 'proximity' THEN px_alt
      |         WHEN 'rssi_ratio' THEN rr_alt ELSE wc_alt END AS m1_alt,
      |    CASE algo1 WHEN 'proximity' THEN px_acc
      |         WHEN 'rssi_ratio' THEN rr_acc ELSE wc_acc END AS m1_acc,
      |    CASE algo1 WHEN 'proximity' THEN px_conf
      |         WHEN 'rssi_ratio' THEN rr_conf ELSE wc_conf END AS m1_conf,
      |    CASE algo1 WHEN 'proximity' THEN w_prox * 0.6
      |         WHEN 'rssi_ratio' THEN w_ratio * 0.75
      |         ELSE w_wcl * 0.7 END AS m1_w,
      |    CASE algo2 WHEN 'rssi_ratio' THEN rr_lat
      |         WHEN 'weighted_centroid' THEN wc_lat END AS m2_lat,
      |    CASE algo2 WHEN 'rssi_ratio' THEN rr_lon
      |         WHEN 'weighted_centroid' THEN wc_lon END AS m2_lon,
      |    CASE algo2 WHEN 'rssi_ratio' THEN rr_alt
      |         WHEN 'weighted_centroid' THEN wc_alt END AS m2_alt,
      |    CASE algo2 WHEN 'rssi_ratio' THEN rr_acc
      |         WHEN 'weighted_centroid' THEN wc_acc END AS m2_acc,
      |    CASE algo2 WHEN 'rssi_ratio' THEN rr_conf
      |         WHEN 'weighted_centroid' THEN wc_conf END AS m2_conf,
      |    CASE algo2 WHEN 'rssi_ratio' THEN w_ratio * 0.75
      |         WHEN 'weighted_centroid' THEN w_wcl * 0.7 END AS m2_w
      |  FROM sel),
      |resp AS (
      |  SELECT rid, n_members,
      |    CASE WHEN algo2 IS NULL THEN algo1
      |         ELSE algo1 || ',' || algo2 END AS methods,
      |    CASE WHEN n_members = 1 THEN m1_lat
      |         ELSE m1_lat * (m1_w / (m1_w + m2_w))
      |            + m2_lat * (m2_w / (m1_w + m2_w)) END AS lat,
      |    CASE WHEN n_members = 1 THEN m1_lon
      |         ELSE m1_lon * (m1_w / (m1_w + m2_w))
      |            + m2_lon * (m2_w / (m1_w + m2_w)) END AS lon,
      |    CASE WHEN n_members = 1 THEN m1_alt
      |         ELSE m1_alt * (m1_w / (m1_w + m2_w))
      |            + m2_alt * (m2_w / (m1_w + m2_w)) END AS alt,
      |    -- 2-member combine: median = mean, MAD inflation can't fire,
      |    -- rank-1 covariance → cond = MaxValue → factor 3.0
      |    CASE WHEN n_members = 1 THEN m1_acc
      |         ELSE ((LEAST(m1_acc, m2_acc) + GREATEST(m1_acc, m2_acc)) / 2.0)
      |              * 3.0 END AS accuracy,
      |    CASE WHEN n_members = 1 THEN m1_conf
      |         ELSE (m1_conf * (m1_w / (m1_w + m2_w))
      |             + m2_conf * (m2_w / (m1_w + m2_w))) / SQRT(3.0) END
      |      AS confidence
      |  FROM mem)
      |SELECT rid AS request_id, CAST(2 AS INT) AS ap_count, n_members, methods,
      |       ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon, ROUND(alt, 6) AS alt,
      |       ROUND(accuracy, 4) AS accuracy, ROUND(confidence, 4) AS confidence
      |FROM resp ORDER BY request_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    def mac(v: org.apache.spark.sql.Column) =
      concat(lit("aa:bb:cc:dd:"), format_string("%02x", v % 250), lit(":"),
        format_string("%02x", (v * 7) % 250))
    val apDim = Tables.supplier(s, dir)
      .where(col("s_suppkey") <= 50)
      .select(
        mac(col("s_suppkey")).as("mac_addr"),
        ((col("s_suppkey") % 120) - 60 + (col("s_suppkey") % 10) * 0.0005).as("latitude"),
        ((col("s_suppkey") % 300) - 150 + (col("s_suppkey") % 7) * 0.0005).as("longitude"),
        when(col("s_suppkey") % 3 === 0, col("s_acctbal") / 1000).as("altitude"),
        (lit(5.0) + col("s_suppkey") % 10).as("horizontal_accuracy"),
        lit(0.8).as("confidence"), lit("").as("vendor"),
        when(col("s_suppkey") % 10 === 0, "expired").otherwise("active").as("status"))
    // AP keys 1..9: present and active at every SF's supplier table.
    val requests = Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select(col("user_id").cast("string").as("requestId"),
        ((col("user_id") % 9) + 1).as("v1"),
        (when((col("user_id") * 7 + 13) % 9 === col("user_id") % 9,
          ((col("user_id") % 9) + 1) % 9)
          .otherwise((col("user_id") * 7 + 13) % 9) + 1).as("v2"),
        (-lit(35) - (col("user_id") % 63)).cast("double").as("r1"),
        (-lit(40) - ((col("user_id") * 3) % 57)).cast("double").as("r2"))
      .select(col("requestId"),
        array(
          struct(mac(col("v1")).as("mac"), col("r1").as("rssi"),
            lit(2437).as("frequencyMhz")),
          struct(mac(col("v2")).as("mac"), col("r2").as("rssi"),
            lit(5180).as("frequencyMhz"))).as("scans"))
      .as[Request]
    RequestScoring.score(s, requests, apDim)
      .toDF()
      .select(col("requestId").as("request_id"),
        col("apCount").as("ap_count"),
        size(col("methodsUsed")).as("n_members"),
        concat_ws(",", col("methodsUsed")).as("methods"),
        round(col("latitude"), 6).as("lat"),
        round(col("longitude"), 6).as("lon"),
        round(col("altitude"), 6).as("alt"),
        round(col("accuracy"), 4).as("accuracy"),
        round(col("confidence"), 4).as("confidence"))
      .orderBy("request_id")
  }

  /** P7 — GDOP, oracled as a geometry conformance sweep: the engine computes
    * sqrt(trace((HᵀH)⁻¹)) through Breeze/LAPACK; DuckDB restates the 3×3
    * inverse-trace in closed form (cofactors over the symmetric normal
    * matrix of [ux, uy, 1] rows). LAPACK and cofactor arithmetic agree to
    * ~1e-14 relative on the well-conditioned sweep geometries, far inside
    * the 2-decimal rounding and the 2/4/6 class tiers. Three angular
    * patterns (spread / half-plane / narrow cone) × 3–5 APs exercise every
    * quality class including the 30 cap. */
  val gdopClasses: Reg = Reg.sql(
    "p7_gdop_classes",
    """WITH u AS (SELECT DISTINCT user_id AS gid FROM events),
      |g AS (
      |  SELECT gid, gid % 3 AS pat, 3 + (gid // 3) % 3 AS n,
      |         CAST(10 + gid % 50 AS DOUBLE) AS lat0
      |  FROM u),
      |ap AS (
      |  SELECT g.gid, g.n, g.lat0, k.k,
      |    CASE g.pat
      |      WHEN 0 THEN CASE k.k WHEN 0 THEN 0.02 WHEN 1 THEN -0.015
      |                  WHEN 2 THEN 0.003 WHEN 3 THEN -0.01 ELSE 0.016 END
      |      WHEN 1 THEN CASE k.k WHEN 0 THEN 0.02 WHEN 1 THEN 0.015
      |                  WHEN 2 THEN 0.018 WHEN 3 THEN 0.01 ELSE 0.02 END
      |      ELSE CASE k.k WHEN 0 THEN 0.02 WHEN 1 THEN 0.019
      |           WHEN 2 THEN 0.021 WHEN 3 THEN 0.02 ELSE 0.018 END
      |    END AS dx,
      |    CASE g.pat
      |      WHEN 0 THEN CASE k.k WHEN 0 THEN 0.0 WHEN 1 THEN 0.012
      |                  WHEN 2 THEN -0.02 WHEN 3 THEN -0.014 ELSE 0.013 END
      |      WHEN 1 THEN CASE k.k WHEN 0 THEN 0.002 WHEN 1 THEN 0.01
      |                  WHEN 2 THEN -0.006 WHEN 3 THEN 0.015 ELSE -0.01 END
      |      ELSE CASE k.k WHEN 0 THEN 0.001 WHEN 1 THEN 0.002
      |           WHEN 2 THEN -0.001 WHEN 3 THEN 0.003 ELSE 0.001 END
      |    END AS dy
      |  FROM g JOIN (VALUES (0), (1), (2), (3), (4)) k(k) ON k.k < g.n),
      |uv AS (
      |  SELECT gid, n,
      |    (dx * (6371000.0 * PI() / 180.0)) /
      |      SQRT((dx * (6371000.0 * PI() / 180.0))
      |             * (dx * (6371000.0 * PI() / 180.0))
      |         + (dy * (6371000.0 * PI() / 180.0) * COS(RADIANS(lat0)))
      |             * (dy * (6371000.0 * PI() / 180.0) * COS(RADIANS(lat0))))
      |      AS ux,
      |    (dy * (6371000.0 * PI() / 180.0) * COS(RADIANS(lat0))) /
      |      SQRT((dx * (6371000.0 * PI() / 180.0))
      |             * (dx * (6371000.0 * PI() / 180.0))
      |         + (dy * (6371000.0 * PI() / 180.0) * COS(RADIANS(lat0)))
      |             * (dy * (6371000.0 * PI() / 180.0) * COS(RADIANS(lat0))))
      |      AS uy
      |  FROM ap),
      |m AS (
      |  SELECT gid, ANY_VALUE(n) AS n, COUNT(*) AS cnt,
      |         SUM(ux * ux) AS sxx, SUM(uy * uy) AS syy, SUM(ux * uy) AS sxy,
      |         SUM(ux) AS sx, SUM(uy) AS sy
      |  FROM uv GROUP BY gid),
      |q AS (
      |  SELECT gid, n,
      |    LEAST(30.0, SQRT(GREATEST(0.0,
      |      (((syy * cnt - sy * sy) + (sxx * cnt - sx * sx)
      |        + (sxx * syy - sxy * sxy)) /
      |       (sxx * (syy * cnt - sy * sy) - sxy * (sxy * cnt - sy * sx)
      |        + sx * (sxy * sy - syy * sx)))))) AS gdop
      |  FROM m)
      |SELECT CAST(gid AS VARCHAR) AS group_id, CAST(n AS BIGINT) AS n_aps,
      |       CASE WHEN gdop < 2.0 THEN 'excellent' WHEN gdop < 4.0 THEN 'good'
      |            WHEN gdop < 6.0 THEN 'fair' ELSE 'poor' END AS geo_class,
      |       ROUND(gdop, 2) AS gdop
      |FROM q ORDER BY group_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.Gdop
    import graft.algo.factors.GeometricQuality
    val offsets: Map[(Int, Int), (Double, Double)] = Map(
      (0, 0) -> (0.02, 0.0), (0, 1) -> (-0.015, 0.012), (0, 2) -> (0.003, -0.02),
      (0, 3) -> (-0.01, -0.014), (0, 4) -> (0.016, 0.013),
      (1, 0) -> (0.02, 0.002), (1, 1) -> (0.015, 0.01), (1, 2) -> (0.018, -0.006),
      (1, 3) -> (0.01, 0.015), (1, 4) -> (0.02, -0.01),
      (2, 0) -> (0.02, 0.001), (2, 1) -> (0.019, 0.002), (2, 2) -> (0.021, -0.001),
      (2, 3) -> (0.02, 0.003), (2, 4) -> (0.018, 0.001))
    Tables.events(s, dir).select(col("user_id").as("gid")).distinct()
      .as[Long]
      .map { gid =>
        val pat = (gid % 3).toInt
        val n = (3 + (gid / 3) % 3).toInt
        val lat0 = (10 + gid % 50).toDouble
        val lon0 = 20.0
        val coords = Array.tabulate(n) { k =>
          val (dx, dy) = offsets((pat, k))
          Array(lat0 + dx, lon0 + dy)
        }
        val gdop = Gdop.calculateGDOP(coords, Array(lat0, lon0), includeBiasTerm = true)
        val cls = GeometricQuality.of(gdop) match {
          case GeometricQuality.Excellent => "excellent"
          case GeometricQuality.Good => "good"
          case GeometricQuality.Fair => "fair"
          case _ => "poor"
        }
        (gid.toString, n.toLong, cls, gdop)
      }
      .toDF("group_id", "n_aps", "geo_class", "g0")
      .select(col("group_id"), col("n_aps"), col("geo_class"),
        round(col("g0"), 2).as("gdop"))
      .orderBy("group_id")
  }

  /** P4 — trilateration, oracled as an exactly-3-AP conformance sweep: with
    * three APs the linearized system is 2 equations in 2 unknowns, so DuckDB
    * can state the least-squares solution in closed form (Cramer's rule) and
    * restate the full downstream chain — RSSI→distance (the p5-pinned
    * log-distance model), the tangent-plane linearization, GDOP through the
    * p7-proven 3×3 cofactor inverse, the piecewise GDOP factor, and the
    * accuracy/confidence clamp chains — all as literal scalar arithmetic
    * (one row per scenario, no unnest, every cross-term summed in a stated
    * order). Breeze solves the square system via LU and inverts HᵀH through
    * LAPACK; Cramer/cofactor agree to ~1e-12 on these well-conditioned
    * triangles (prototype-swept: min GDOP margin to the 2/4/6 class
    * boundaries is 0.09, far outside the divergence), which round(6)/
    * round(4) absorb. Three triangle shapes (spread / narrow / squashed)
    * sweep all four geometry classes including the GDOP-30 cap, and both
    * strong- and weak-signal accuracy/confidence branches.
    *
    * The strongest RSSI is pinned to AP0 by construction (r0 ≥ −64 vs
    * r1 ≤ −66, r2 ≤ −68), so the tangent-plane anchor and the
    * linearization reference are deterministic. */
  val trilaterationSweep: Reg = Reg.sql(
    "p4_trilateration",
    """WITH u AS (SELECT DISTINCT user_id AS gid FROM events),
      |cfg AS (
      |  SELECT gid,
      |    CAST(10 + gid % 50 AS DOUBLE) AS lat0, 20.0 AS lon0,
      |    CAST(-45 - gid % 20 AS DOUBLE) AS r0,
      |    CAST(-66 - (gid * 3) % 15 AS DOUBLE) AS r1,
      |    CAST(-68 - (gid * 7) % 12 AS DOUBLE) AS r2,
      |    CASE gid % 3 WHEN 0 THEN 0.018 + (gid % 5) * 0.001
      |                 WHEN 1 THEN 0.020 + (gid % 5) * 0.001
      |                 ELSE 0.022 END AS dx1,
      |    CASE gid % 3 WHEN 0 THEN 0.002 WHEN 1 THEN 0.003
      |                 ELSE 0.0025 END AS dy1,
      |    CASE gid % 3 WHEN 0 THEN 0.004 WHEN 1 THEN 0.009
      |                 ELSE 0.011 + (gid % 5) * 0.0005 END AS dx2,
      |    CASE gid % 3 WHEN 0 THEN 0.017 + (gid % 7) * 0.001
      |                 WHEN 1 THEN 0.0065 + (gid % 7) * 0.0004
      |                 ELSE 0.0042 + (gid % 7) * 0.0003 END AS dy2
      |  FROM u),
      |loc AS (
      |  SELECT *, 111000.0 * COS(RADIANS(lat0)) AS lon_m,
      |    -20.0 * LOG10(4.0 * PI() / (299792458.0 / (2437 * 1000000.0))) AS fref
      |  FROM cfg),
      |xy AS (
      |  SELECT *,
      |    ((lat0 + dx1) - lat0) * 111000.0 AS x1,
      |    ((lon0 + dy1) - lon0) * lon_m AS y1,
      |    ((lat0 + dx2) - lat0) * 111000.0 AS x2,
      |    ((lon0 + dy2) - lon0) * lon_m AS y2,
      |    LEAST(100.0, GREATEST(1.0, POW(10.0, (fref - r0) /
      |      (10.0 * CASE WHEN r0 >= -65.0 THEN 2.5 ELSE 3.0 END)))) AS d0,
      |    LEAST(100.0, GREATEST(1.0, POW(10.0, (fref - r1) /
      |      (10.0 * CASE WHEN r1 >= -65.0 THEN 2.5 ELSE 3.0 END)))) AS d1,
      |    LEAST(100.0, GREATEST(1.0, POW(10.0, (fref - r2) /
      |      (10.0 * CASE WHEN r2 >= -65.0 THEN 2.5 ELSE 3.0 END)))) AS d2
      |  FROM loc),
      |lsq AS (
      |  SELECT *,
      |    2.0 * (x1 - 0.0) AS a11, 2.0 * (y1 - 0.0) AS a12,
      |    2.0 * (x2 - 0.0) AS a21, 2.0 * (y2 - 0.0) AS a22,
      |    (x1 * x1 + y1 * y1) - (0.0 * 0.0 + 0.0 * 0.0) + (d0 * d0 - d1 * d1) AS b1,
      |    (x2 * x2 + y2 * y2) - (0.0 * 0.0 + 0.0 * 0.0) + (d0 * d0 - d2 * d2) AS b2
      |  FROM xy),
      |sol AS (
      |  SELECT *,
      |    (b1 * a22 - b2 * a12) / (a11 * a22 - a21 * a12) AS sx,
      |    (a11 * b2 - a21 * b1) / (a11 * a22 - a21 * a12) AS sy
      |  FROM lsq),
      |-- GDOP inputs: coords and position rescaled exactly as localGdop does,
      |-- then unit vectors position->AP recovered in meters
      |gin AS (
      |  SELECT *, 6371000.0 * PI() / 180.0 AS kk,
      |    sx / (6371000.0 * PI() / 180.0) AS px,
      |    sy / (6371000.0 * PI() / 180.0) AS py
      |  FROM sol),
      |gd AS (
      |  SELECT *,
      |    (0.0 / (6371000.0 * PI() / 180.0) - px) * kk AS dxm0,
      |    (0.0 / (6371000.0 * PI() / 180.0) - py) * kk * COS(RADIANS(px)) AS dym0,
      |    (x1 / (6371000.0 * PI() / 180.0) - px) * kk AS dxm1,
      |    (y1 / (6371000.0 * PI() / 180.0) - py) * kk * COS(RADIANS(px)) AS dym1,
      |    (x2 / (6371000.0 * PI() / 180.0) - px) * kk AS dxm2,
      |    (y2 / (6371000.0 * PI() / 180.0) - py) * kk * COS(RADIANS(px)) AS dym2
      |  FROM gin),
      |uvec AS (
      |  SELECT *,
      |    CASE WHEN SQRT(dxm0 * dxm0 + dym0 * dym0) < 1.0 THEN 1.0
      |         ELSE dxm0 / SQRT(dxm0 * dxm0 + dym0 * dym0) END AS ux0,
      |    CASE WHEN SQRT(dxm0 * dxm0 + dym0 * dym0) < 1.0 THEN 0.0
      |         ELSE dym0 / SQRT(dxm0 * dxm0 + dym0 * dym0) END AS uy0,
      |    CASE WHEN SQRT(dxm1 * dxm1 + dym1 * dym1) < 1.0 THEN 1.0
      |         ELSE dxm1 / SQRT(dxm1 * dxm1 + dym1 * dym1) END AS ux1,
      |    CASE WHEN SQRT(dxm1 * dxm1 + dym1 * dym1) < 1.0 THEN 0.0
      |         ELSE dym1 / SQRT(dxm1 * dxm1 + dym1 * dym1) END AS uy1,
      |    CASE WHEN SQRT(dxm2 * dxm2 + dym2 * dym2) < 1.0 THEN 1.0
      |         ELSE dxm2 / SQRT(dxm2 * dxm2 + dym2 * dym2) END AS ux2,
      |    CASE WHEN SQRT(dxm2 * dxm2 + dym2 * dym2) < 1.0 THEN 0.0
      |         ELSE dym2 / SQRT(dxm2 * dxm2 + dym2 * dym2) END AS uy2
      |  FROM gd),
      |nm AS (
      |  SELECT *,
      |    ux0 * ux0 + ux1 * ux1 + ux2 * ux2 AS sxx,
      |    uy0 * uy0 + uy1 * uy1 + uy2 * uy2 AS syy,
      |    ux0 * uy0 + ux1 * uy1 + ux2 * uy2 AS sxy,
      |    ux0 + ux1 + ux2 AS sux, uy0 + uy1 + uy2 AS suy
      |  FROM uvec),
      |gq AS (
      |  SELECT *,
      |    LEAST(30.0, SQRT(GREATEST(0.0,
      |      ((syy * 3.0 - suy * suy) + (sxx * 3.0 - sux * sux)
      |       + (sxx * syy - sxy * sxy)) /
      |      (sxx * (syy * 3.0 - suy * suy) - sxy * (sxy * 3.0 - suy * sux)
      |       + sux * (sxy * suy - syy * sux))))) AS gdop
      |  FROM nm),
      |fc AS (
      |  SELECT *,
      |    CASE WHEN gdop <= 2.0 THEN 1.0
      |         WHEN gdop <= 4.0 THEN 1.0 + 0.5 * ((gdop - 2.0) / (4.0 - 2.0))
      |         WHEN gdop <= 6.0 THEN 1.5 + 0.5 * ((gdop - 4.0) / (6.0 - 4.0))
      |         ELSE LEAST(4.0, 2.0 + (gdop - 6.0) / 2.0) END AS gf,
      |    (r0 + r1 + r2) / 3 AS avg_s,
      |    (d0 + d1 + d2) / 3 AS avg_d
      |  FROM gq),
      |pos AS (
      |  SELECT *,
      |    GREATEST(-90.0, LEAST(90.0, lat0 + sx / 111000.0)) AS out_lat,
      |    GREATEST(-180.0, LEAST(180.0, lon0 + sy / lon_m)) AS out_lon,
      |    CASE WHEN avg_s >= -65.0
      |         THEN GREATEST(1.0, LEAST(5.0, 3.0 * (1.0 + (gf - 1.0) * 0.5)))
      |         ELSE GREATEST(1.0, LEAST(50.0,
      |                LEAST(avg_d * 0.3, 50.0) * gf)) END AS out_acc,
      |    CASE WHEN avg_s >= -65.0
      |         THEN GREATEST(0.0, LEAST(1.0, (avg_s - (-80.0)) / ((-65.0) - (-80.0))))
      |         ELSE GREATEST(0.0, LEAST(1.0, (avg_s - (-100.0)) / ((-80.0) - (-100.0))))
      |         END AS sig_f
      |  FROM fc),
      |cf AS (
      |  SELECT *,
      |    (0.55 + (0.85 - 0.55) * (0.7 * sig_f + 0.3 * 0.0)) *
      |      (1.0 - 0.30 * (1.0 - 1.0 / GREATEST(1.0, gf))) AS adj
      |  FROM pos)
      |SELECT CAST(gid AS VARCHAR) AS group_id,
      |       ROUND(out_lat, 6) AS lat, ROUND(out_lon, 6) AS lon,
      |       ROUND(out_acc, 4) AS accuracy,
      |       ROUND(GREATEST(0.55, LEAST(0.85,
      |         CASE WHEN avg_s >= -65.0 THEN GREATEST(0.8, LEAST(0.85, adj))
      |              WHEN avg_s < -80.0 THEN LEAST(0.58, adj)
      |              ELSE adj END)), 4) AS confidence
      |FROM cf ORDER BY group_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{AccessPoint, Trilateration, WifiScan}
    Tables.events(s, dir).select(col("user_id").as("gid")).distinct()
      .as[Long]
      .map { gid =>
        val lat0 = (10 + gid % 50).toDouble
        val lon0 = 20.0
        val r0 = (-45 - gid % 20).toDouble
        val r1 = (-66 - (gid * 3) % 15).toDouble
        val r2 = (-68 - (gid * 7) % 12).toDouble
        val pat = (gid % 3).toInt
        val (dx1, dy1, dx2, dy2) = pat match {
          case 0 => (0.018 + (gid % 5) * 0.001, 0.002,
            0.004, 0.017 + (gid % 7) * 0.001)
          case 1 => (0.020 + (gid % 5) * 0.001, 0.003,
            0.009, 0.0065 + (gid % 7) * 0.0004)
          case _ => (0.022, 0.0025,
            0.011 + (gid % 5) * 0.0005, 0.0042 + (gid % 7) * 0.0003)
        }
        val aps = Seq(
          AccessPoint("ap0", lat0, lon0),
          AccessPoint("ap1", lat0 + dx1, lon0 + dy1),
          AccessPoint("ap2", lat0 + dx2, lon0 + dy2))
        val scans = Seq(
          WifiScan("ap0", r0, 2437),
          WifiScan("ap1", r1, 2437),
          WifiScan("ap2", r2, 2437))
        val p = Trilateration.calculate(scans, aps).get
        (gid.toString, p.lat, p.lon, p.accuracy, p.confidence)
      }
      .toDF("group_id", "lat_", "lon_", "acc_", "conf_")
      .select(col("group_id"),
        round(col("lat_"), 6).as("lat"), round(col("lon_"), 6).as("lon"),
        round(col("acc_"), 4).as("accuracy"),
        round(col("conf_"), 4).as("confidence"))
      .orderBy("group_id")
  }

  val all: Seq[Reg] = Seq(
    batchScoring, proximityTier, contextClasses, scenarioClasses, physicsGate,
    logDistance, selectionEngine, combinerBlend, rssiRatio, requestMapping,
    apEnrichment, twoApResponse, gdopClasses, trilaterationSweep)
}
