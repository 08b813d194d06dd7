package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Quality
import graft.localize.BatchLocalizer

/** Batch-localization queries exercising the R7 flatMapGroups path end to
  * end on the synthetic tables (user_id ≙ bssid; coordinates/RSSI/quality
  * synthesized deterministically from numeric columns with the engine's own
  * scalar functions).
  *
  * The per-group algorithm work (MLE gradient ascent) is not SQL-expressible,
  * so these register as rows-only checks; the numeric semantics are pinned by
  * `LocalizerSpec` instead. The tier COUNTS, however, are SQL-checkable and
  * oracled in `r7_tier_dispatch`.
  */
object LocalizeQueries {

  /** Full localizer over events: one shuffle localizes every key.
    *
    * Bounded-property oracle (the MLE/Bayesian point itself is a gradient
    * ascent — not SQL-expressible; its WCL tier is exact-oracled in
    * `r7_wcl_tier`): DuckDB states, per AP, the capped measurement count,
    * the tier dispatch (N≥100 bayesian / N≥50 mle / N≥20 wcl), and that the
    * published estimate lies inside the measurement bounding box expanded by
    * the maximum possible MLE drift (100 iterations × 1e-4° step, lr only
    * ever halves → total movement ≤ 0.01°; WCL starts strictly inside the
    * hull, and the Bayesian blend is a convex mix of the two). A dispatch
    * bug, a runaway gradient, or a nondeterministic cap all hash-mismatch
    * here row-by-row. */
  val batchLocalize: Reg = Reg.sql(
    "r7_batch_localize",
    """WITH c AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid,
      |         LEAST(COUNT(*), 1000) AS n
      |  FROM events GROUP BY user_id HAVING LEAST(COUNT(*), 1000) >= 20)
      |SELECT bssid, n,
      |       CASE WHEN n >= 100 THEN 'bayesian'
      |            WHEN n >= 50 THEN 'mle'
      |            ELSE 'wcl' END AS method,
      |       TRUE AS in_bounds
      |FROM c ORDER BY bssid""".stripMargin) { (s, dir) =>
    implicit val spark = s
    val ev = Tables.events(s, dir)
    // Cluster each key's measurements within ~±150 m of a per-key anchor, the
    // shape real per-AP crowdsourced fixes have.
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 120) - 60 + (col("event_id") % 30) * 0.0001).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 37) * 0.0001).as("lon"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      Quality.qualityWeight(
        when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN"),
        col("value"), -(col("user_id") % 100)).as("w"))
    val measurements = BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")
    // Bounding box over ALL of a key's measurements (the capped subset's
    // hull is contained in it) + the MLE drift bound.
    val drift = 0.011
    val bbox = synth.groupBy("bssid").agg(
      min("lat").as("min_lat"), max("lat").as("max_lat"),
      min("lon").as("min_lon"), max("lon").as("max_lon"))
    BatchLocalizer.localizeAll(s, measurements)
      .toDF()
      .join(bbox, "bssid")
      .select(col("bssid"), col("n"), col("method"),
        (col("lat") >= col("min_lat") - drift && col("lat") <= col("max_lat") + drift &&
         col("lon") >= col("min_lon") - drift && col("lon") <= col("max_lon") + drift)
          .as("in_bounds"))
      .orderBy("bssid")
  }

  /** A10's fourth hotspot signal — neighbor-set CHURN
    * ([[graft.analytics.Hotspots.neighborChurn]], PAPER.md:57-69's
    * "changing neighbor sets"): stationary APs ('S…') are sighted by the
    * same devices with the same co-sets in every time bucket → churn ≈ 1;
    * each mobile AP ('M…') is sighted only by the device cohort matching
    * the bucket (u % 4 = tb), so its co-observation set rotates bucket
    * over bucket → churn low → flagged. A spread/SSID/OUI-blind signal:
    * these mobile APs would pass every other a10 arm. Fully oracled —
    * the sighting synthesis, the co-observation join, the per-bucket set
    * algebra, and the integer-micro Jaccard walk all restate in SQL. */
  val neighborChurn: Reg = Reg.sql(
    "a10_neighbor_churn",
    """WITH ev AS (SELECT user_id AS u, event_id % 4 AS tb, event_id
      |            FROM events),
      |obs AS (
      |  SELECT DISTINCT u, tb, 'S' || ((u * 3 + event_id % 3) % 60) AS ap
      |  FROM ev
      |  UNION
      |  SELECT DISTINCT u, tb, 'M' || (u % 5) FROM ev WHERE u % 4 = tb),
      |p AS (SELECT DISTINCT a.ap, a.tb, b.ap AS nbr
      |      FROM obs a JOIN obs b ON a.u = b.u AND a.tb = b.tb
      |                           AND a.ap <> b.ap),
      |s AS (SELECT ap, tb, list_sort(list(DISTINCT nbr)) AS nbrs
      |      FROM p GROUP BY ap, tb),
      |c AS (SELECT ap, nbrs,
      |             LEAD(nbrs) OVER (PARTITION BY ap ORDER BY tb) AS nxt
      |      FROM s),
      |j AS (SELECT ap,
      |        (len(list_intersect(nbrs, nxt)) * 1000000) //
      |          len(list_distinct(list_concat(nbrs, nxt))) AS jm
      |      FROM c WHERE nxt IS NOT NULL),
      |b AS (SELECT ap, CAST(COUNT(*) AS BIGINT) AS n_buckets
      |      FROM s GROUP BY ap)
      |SELECT b.ap, b.n_buckets,
      |       CAST(SUM(jm) // COUNT(*) AS BIGINT) AS churn_micro,
      |       (SUM(jm) // COUNT(*)) < 500000 AS mobile
      |FROM j JOIN b ON b.ap = j.ap
      |GROUP BY b.ap, b.n_buckets ORDER BY b.ap""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("u"), (col("event_id") % 4).as("tb"),
        col("event_id"))
    val obs = ev.select(col("u"), col("tb"),
        concat(lit("S"), (col("u") * 3 + col("event_id") % 3) % 60).as("ap"))
      .unionByName(ev.where(col("u") % 4 === col("tb"))
        .select(col("u"), col("tb"), concat(lit("M"), col("u") % 5).as("ap")))
    graft.analytics.Hotspots.neighborChurn(obs).orderBy("ap")
  }

  /** A10 full form + A9 local outliers over synthesized measurements:
    * spread + SSID-pattern + OUI flags, and grid-bucketed local-density
    * outliers — fully oracled (every arm is plain SQL over the same
    * deterministic synthesis). */
  val hotspotFull: Reg = Reg.sql(
    "a10_hotspot_full",
    """WITH m AS (
      |  SELECT
      |    CASE WHEN user_id % 7 = 0
      |         THEN '00:23:6c:00:00:' || printf('%02x', user_id % 250)
      |         ELSE 'aa:bb:cc:dd:ee:' || printf('%02x', user_id % 250) END AS bssid,
      |    CASE WHEN user_id % 5 = 0 THEN 'Bob''s iPhone' ELSE 'HomeNet' END AS ssid,
      |    -- literals cast to DOUBLE: DuckDB would otherwise compute in
      |    -- DECIMAL and put boundary rows in different floor() geocells
      |    -- than Spark's double arithmetic (measured 112/100k rows at sf0.1)
      |    (CASE WHEN user_id >= 130
      |          THEN (event_id % 100) * CAST(0.01 AS DOUBLE) ELSE 0.0 END
      |      + (user_id % 90)) AS latitude,
      |    ((user_id % 180) - 90 + (event_id % 50) * CAST(0.0001 AS DOUBLE)) AS longitude
      |  FROM events),
      |verdicts AS (
      |  SELECT bssid, COUNT(*) AS n,
      |    (COALESCE(STDDEV_SAMP(latitude), 0) > 0.01 OR
      |     COALESCE(STDDEV_SAMP(longitude), 0) > 0.01) AS wide_spread,
      |    MAX(CASE WHEN regexp_matches(ssid,
      |      '(?i)(androidap|iphone|galaxy|mi[- ]?fi|mobile ?hotspot|personal hotspot)')
      |      THEN 1 ELSE 0 END) = 1 AS ssid_pattern,
      |    MAX(CASE WHEN upper(substr(bssid, 1, 8)) IN
      |      ('00:23:6C','3C:15:C2','58:55:CA','40:B0:FA','E8:50:8B','DA:A1:19','F8:A9:D0')
      |      THEN 1 ELSE 0 END) = 1 AS blacklisted_oui
      |  FROM m GROUP BY bssid),
      |cells AS (
      |  SELECT bssid,
      |    CAST(floor(latitude / CAST(0.0015 AS DOUBLE)) AS BIGINT) || '_' ||
      |    CAST(floor(longitude / CAST(0.0015 AS DOUBLE)) AS BIGINT) AS cell
      |  FROM m),
      |cell_counts AS (
      |  SELECT bssid, cell, COUNT(*) AS cell_count FROM cells GROUP BY bssid, cell),
      |ap_mean AS (
      |  SELECT bssid, AVG(cell_count) AS mean_cell_count FROM cell_counts GROUP BY bssid),
      |outliers AS (
      |  SELECT c.bssid, (cc.cell_count < am.mean_cell_count * 0.2) AS local_outlier
      |  FROM cells c
      |  JOIN cell_counts cc ON cc.bssid = c.bssid AND cc.cell = c.cell
      |  JOIN ap_mean am ON am.bssid = c.bssid)
      |SELECT
      |  (SELECT COUNT(*) FROM verdicts) AS aps,
      |  (SELECT CAST(SUM(CASE WHEN wide_spread OR ssid_pattern OR blacklisted_oui
      |              THEN 1 ELSE 0 END) AS BIGINT) FROM verdicts) AS hotspots,
      |  (SELECT CAST(SUM(CASE WHEN wide_spread THEN 1 ELSE 0 END) AS BIGINT) FROM verdicts) AS wide_spread,
      |  (SELECT CAST(SUM(CASE WHEN ssid_pattern THEN 1 ELSE 0 END) AS BIGINT) FROM verdicts) AS ssid_pattern,
      |  (SELECT CAST(SUM(CASE WHEN blacklisted_oui THEN 1 ELSE 0 END) AS BIGINT) FROM verdicts) AS blacklisted_oui,
      |  (SELECT CAST(SUM(CASE WHEN local_outlier THEN 1 ELSE 0 END) AS BIGINT) FROM outliers) AS local_outliers,
      |  (SELECT COUNT(*) FROM outliers) AS measurements""".stripMargin) { (s, dir) =>
    import graft.analytics.Hotspots
    val ev = Tables.events(s, dir)
    val measurements = ev.select(
      // every 7th key gets a blacklisted OUI, every 5th a tethering SSID,
      // keys ≥ 130 roam widely — all three detector arms fire
      when(col("user_id") % 7 === 0,
        concat(lit("00:23:6c:00:00:"), format_string("%02x", col("user_id") % 250)))
        .otherwise(concat(lit("aa:bb:cc:dd:ee:"), format_string("%02x", col("user_id") % 250)))
        .as("bssid"),
      when(col("user_id") % 5 === 0, "Bob's iPhone").otherwise("HomeNet").as("ssid"),
      (when(col("user_id") >= 130, (col("event_id") % 100) * lit(0.01)).otherwise(lit(0.0))
        + (col("user_id") % 90)).as("latitude"),
      ((col("user_id") % 180) - 90 + (col("event_id") % 50) * 0.0001).as("longitude"))
    val verdicts = Hotspots.detect(measurements)
    val outliers = Hotspots.localOutliers(measurements)
    verdicts.agg(
      count(lit(1)).as("aps"),
      sum(when(col("is_hotspot"), 1).otherwise(0)).as("hotspots"),
      sum(when(col("wide_spread"), 1).otherwise(0)).as("wide_spread"),
      sum(when(col("ssid_pattern"), 1).otherwise(0)).as("ssid_pattern"),
      sum(when(col("blacklisted_oui"), 1).otherwise(0)).as("blacklisted_oui"))
      .crossJoin(outliers.agg(
        sum(when(col("local_outlier"), 1).otherwise(0)).as("local_outliers"),
        count(lit(1)).as("measurements")))
  }

  /** R7 WCL tier, FULLY oracled: for groups in the bootstrap band
    * (20 ≤ n < 50) the localizer is pure SQL — weighted centroid with
    * w = quality_weight · 10^(rssi/10) (PAPER.md:135-139), spread = mean
    * haversine to the estimate, confidence = clamped evidence × spread
    * shrink. DuckDB restates all of it, pinning the flatMapGroups path
    * (same synthesis as r7_batch_localize) against an exact oracle. */
  val wclTier: Reg = Reg.sql(
    "r7_wcl_tier",
    """WITH m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid,
      |         ((user_id % 120) - 60 + (event_id % 30) * CAST(0.0001 AS DOUBLE)) AS lat,
      |         ((user_id % 300) - 150 + (event_id % 37) * CAST(0.0001 AS DOUBLE)) AS lon,
      |         CAST(-30 - (event_id % 70) AS DOUBLE) AS rssi,
      |         CASE WHEN event_type IS DISTINCT FROM 'purchase' THEN 1.0
      |              WHEN value IS NOT NULL AND value < 50
      |                   AND -(user_id % 100) > -70 THEN 1.5
      |              ELSE 2.0 END AS w
      |  FROM events),
      |sized AS (SELECT bssid, COUNT(*) AS n FROM m GROUP BY bssid
      |          HAVING COUNT(*) >= 20 AND COUNT(*) < 50),
      |est AS (
      |  -- association matches the Scala accumulator: lat * (w * 10^(rssi/10))
      |  SELECT m.bssid, sized.n,
      |         SUM(m.lat * (m.w * POW(10, m.rssi / 10))) /
      |           SUM(m.w * POW(10, m.rssi / 10)) AS est_lat,
      |         SUM(m.lon * (m.w * POW(10, m.rssi / 10))) /
      |           SUM(m.w * POW(10, m.rssi / 10)) AS est_lon
      |  FROM m JOIN sized ON sized.bssid = m.bssid
      |  GROUP BY m.bssid, sized.n),
      |spread AS (
      |  SELECT e.bssid, e.n, e.est_lat, e.est_lon,
      |         AVG(2 * 6371000 * ASIN(SQRT(
      |           POW(SIN(RADIANS(m.lat - e.est_lat) / 2), 2) +
      |           COS(RADIANS(e.est_lat)) * COS(RADIANS(m.lat)) *
      |           POW(SIN(RADIANS(m.lon - e.est_lon) / 2), 2)))) AS spread_m
      |  FROM est e JOIN m ON m.bssid = e.bssid
      |  GROUP BY e.bssid, e.n, e.est_lat, e.est_lon)
      |SELECT bssid, ROUND(est_lat, 4) AS lat, ROUND(est_lon, 4) AS lon, n,
      |       'wcl' AS method,
      |       ROUND(LEAST(0.95, GREATEST(0.1,
      |         LEAST(0.95, 0.5 + 0.1 * LOG10(CAST(n AS DOUBLE))) *
      |         (1.0 / (1.0 + spread_m / 500000.0)))), 3) AS confidence
      |FROM spread ORDER BY bssid""".stripMargin) { (s, dir) =>
    implicit val spark = s
    val ev = Tables.events(s, dir)
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 120) - 60 + (col("event_id") % 30) * 0.0001).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 37) * 0.0001).as("lon"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      Quality.qualityWeight(
        when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN"),
        col("value"), -(col("user_id") % 100)).as("w"))
    val measurements = BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")
    BatchLocalizer.localizeAll(s, measurements)
      .toDF()
      .where(col("method") === "wcl")
      .select(col("bssid"), round(col("lat"), 4).as("lat"), round(col("lon"), 4).as("lon"),
        col("n"), col("method"), round(col("confidence"), 3).as("confidence"))
      .orderBy("bssid")
  }

  /** A9 — true bucketed LOF (PAPER.md:109-115), FULLY oracled per point:
    * DuckDB restates the complete pipeline — 3×3 geocell candidate join,
    * deterministic kNN (distance, id), k-distance, reachability, lrd, LOF —
    * and every point's score is value-hashed. The synthesis plants a
    * displaced point (~165 m above its user's 33 m-pitch cluster grid) on
    * every 97th event so the score distribution has genuine local outliers
    * in it. */
  val lofLocal: Reg = Reg.sql(
    "a9_lof_local",
    """WITH m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid, event_id AS point_id,
      |         CASE WHEN event_id % 97 = 0
      |              THEN (user_id % 90) + CAST(0.0087 AS DOUBLE)
      |              ELSE (user_id % 90) + (event_id % 25) * CAST(0.0003 AS DOUBLE)
      |         END AS latitude,
      |         ((user_id % 180) - 90 + (event_id % 23) * CAST(0.0003 AS DOUBLE))
      |           AS longitude
      |  FROM events),
      |pts AS (
      |  SELECT *, CAST(floor(latitude / CAST(0.0015 AS DOUBLE)) AS BIGINT) AS cx,
      |            CAST(floor(longitude / CAST(0.0015 AS DOUBLE)) AS BIGINT) AS cy
      |  FROM m),
      |-- the engine's over-dense-cell guardrail (maxCellPoints = 2000):
      |-- cells above the cap are dropped whole on BOTH sides
      |cell_sizes AS (
      |  SELECT bssid, cx, cy, COUNT(*) AS cn FROM pts GROUP BY bssid, cx, cy),
      |usable AS (
      |  SELECT p.* FROM pts p
      |  JOIN cell_sizes cs ON cs.bssid = p.bssid AND cs.cx = p.cx
      |   AND cs.cy = p.cy AND cs.cn <= 2000),
      |pairs AS (
      |  SELECT p.bssid, p.point_id AS p_id, q.point_id AS q_id,
      |         2 * 6371000 * ASIN(SQRT(
      |           POW(SIN(RADIANS(q.latitude - p.latitude) / 2), 2) +
      |           COS(RADIANS(p.latitude)) * COS(RADIANS(q.latitude)) *
      |           POW(SIN(RADIANS(q.longitude - p.longitude) / 2), 2))) AS d
      |  FROM usable p
      |  JOIN (SELECT dx.x AS dx, dy.x AS dy
      |        FROM (VALUES (-1),(0),(1)) dx(x), (VALUES (-1),(0),(1)) dy(x)) o
      |    ON TRUE
      |  JOIN usable q ON q.bssid = p.bssid AND q.cx = p.cx + o.dx
      |            AND q.cy = p.cy + o.dy AND q.point_id <> p.point_id),
      |knn AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY bssid, p_id
      |                                 ORDER BY d, q_id) AS rn
      |    FROM pairs) WHERE rn <= 5),
      |kdist AS (
      |  SELECT bssid, p_id, MAX(d) AS kdist, COUNT(*) AS k_used
      |  FROM knn GROUP BY bssid, p_id),
      |reach AS (
      |  SELECT k.bssid, k.p_id, GREATEST(kq.kdist, k.d) AS reach_d
      |  FROM knn k JOIN kdist kq ON kq.bssid = k.bssid AND kq.p_id = k.q_id),
      |lrd AS (
      |  SELECT bssid, p_id,
      |         CAST(COUNT(*) AS DOUBLE) / GREATEST(SUM(reach_d), 1e-12) AS lrd
      |  FROM reach GROUP BY bssid, p_id),
      |lof AS (
      |  SELECT k.bssid, k.p_id, AVG(lq.lrd) AS mean_q_lrd
      |  FROM knn k JOIN lrd lq ON lq.bssid = k.bssid AND lq.p_id = k.q_id
      |  GROUP BY k.bssid, k.p_id)
      |SELECT l.bssid, l.p_id AS point_id, kd.k_used,
      |       ROUND(l.mean_q_lrd / r.lrd, 4) AS lof
      |FROM lof l
      |JOIN lrd r ON r.bssid = l.bssid AND r.p_id = l.p_id
      |JOIN kdist kd ON kd.bssid = l.bssid AND kd.p_id = l.p_id
      |ORDER BY l.bssid, point_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val planted = col("event_id") % 97 === 0
    val pts = ev.select(
      col("user_id").cast("string").as("bssid"),
      col("event_id").as("point_id"),
      when(planted, (col("user_id") % 90) + lit(0.0087))
        .otherwise((col("user_id") % 90) + (col("event_id") % 25) * lit(0.0003))
        .as("latitude"),
      ((col("user_id") % 180) - 90 + (col("event_id") % 23) * lit(0.0003))
        .as("longitude"))
    graft.analytics.Lof.score(pts)
      .where(col("lof").isNotNull)
      .select(col("bssid"), col("point_id"), col("k_used"),
        round(col("lof"), 4).as("lof"))
      .orderBy("bssid", "point_id")
  }

  /** A11 — DBSCAN bi-modality relocation analysis (PAPER.md:71-77), FULLY
    * oracled: each user plants one of three per-AP histories — stationary
    * (one anchor), relocated (anchor A for the first half of event-time,
    * then anchor B 500 m away), or bimodal (fixes ALTERNATE between the two
    * anchors). Jitter stays ≪ eps and anchors sit ≫ eps apart, so the
    * cluster structure — and therefore the verdict and cluster/noise
    * counts — is exactly determined by the planted mode, which DuckDB
    * states per user. A lag-jump detector alone would call the bimodal APs
    * relocated (every step jumps ~500 m); the temporal-disjointness check
    * is what this gate pins. */
  val dbscanRelocation: Reg = Reg.sql(
    "a11_dbscan_relocation",
    """WITH c AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid, user_id AS uid, COUNT(*) AS n
      |  FROM events GROUP BY user_id HAVING COUNT(*) >= 50)
      |SELECT bssid, n,
      |       CASE uid % 3 WHEN 0 THEN 'stationary'
      |                    WHEN 1 THEN 'relocated'
      |                    ELSE 'bimodal' END AS verdict,
      |       CASE WHEN uid % 3 = 0 THEN 1 ELSE 2 END AS clusters,
      |       CAST(0 AS BIGINT) AS noise_cnt
      |FROM c ORDER BY bssid""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val ev = Tables.events(s, dir)
      .withColumn("rank", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
      .where(col("n") >= 50)
    val mode = col("user_id") % 3
    val useB = // which fixes sit on anchor B (≈500 m north)
      when(mode === 1, col("rank") >= col("n") / 2)     // relocated: 2nd half
        .when(mode === 2, col("event_id") % 2 === 1)    // bimodal: alternate
        .otherwise(lit(false))                          // stationary: never
    val fixes = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 90) + when(useB, lit(0.0045)).otherwise(lit(0.0))
        + (col("event_id") % 5) * lit(0.00006)).as("lat"),
      ((col("user_id") % 180) - 90 + (col("event_id") % 7) * lit(0.00006)).as("lon"),
      (col("rank").cast("long") * 1000L).as("ts"))
      .as[(String, Double, Double, Long)]
    fixes.groupByKey(_._1)
      .mapGroups { (bssid, it) =>
        val fx = it.map { case (_, la, lo, ts) => graft.localize.Relocation.Fix(la, lo, ts) }
          .toIndexedSeq.sortBy(f => (f.tsMillis, f.lat, f.lon))
        val a = graft.localize.Relocation.analyze(fx)
        val verdict = a.verdict match {
          case graft.localize.Relocation.Stationary       => "stationary"
          case _: graft.localize.Relocation.Relocated     => "relocated"
          case graft.localize.Relocation.Bimodal          => "bimodal"
        }
        (bssid, fx.size.toLong, verdict, a.clusters.size, a.noise.size.toLong)
      }
      .toDF("bssid", "n", "verdict", "clusters", "noise_cnt")
      .orderBy("bssid")
  }

  /** R7 feedback loop (PAPER.md:198-213), FULLY oracled on its control
    * behavior: prime a scratch state table with a ~5.5 km-displaced prior
    * for every 10th AP, run the loop twice over the same measurements, and
    * report the filter decisions. Run 1 must apply an update for every
    * localizable AP and fire the relocation reset exactly on the displaced
    * priors (innovation ≫ 3σ); run 2 recomputes the identical deterministic
    * estimates, matches the stored fingerprints, and must be a complete
    * no-op — the at-least-once replay guarantee. All five counts are plain
    * SQL over events. */
  val refineLoop: Reg = Reg.sql(
    "r7_refine_loop",
    """WITH c AS (
      |  SELECT user_id AS uid, COUNT(*) AS n
      |  FROM events GROUP BY user_id HAVING COUNT(*) >= 20)
      |SELECT COUNT(*) AS aps,
      |       COUNT(*) AS applied_r1,
      |       CAST(SUM(CASE WHEN uid % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS relocated_r1,
      |       CAST(0 AS BIGINT) AS applied_r2,
      |       CAST(0 AS BIGINT) AS relocated_r2
      |FROM c""".stripMargin) { (s, dir) =>
    implicit val spark = s
    import graft.localize.{BatchLocalizer, RefineLoop}
    val ev = Tables.events(s, dir)
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 120) - 60 + (col("event_id") % 30) * 0.0001).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 37) * 0.0001).as("lon"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      Quality.qualityWeight(
        when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN"),
        col("value"), -(col("user_id") % 100)).as("w"))
    val measurements =
      BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")

    val statePath = graft.Scratch.dir("graft_refine") + "/ap_state"
    // Prime: every 10th AP gets a prior displaced ~5.5 km north — the loop
    // must recognize these as relocations, not fuse them.
    val prior = ev.where(col("user_id") % 10 === 0)
      .select(col("user_id").cast("string").as("bssid"),
        ((col("user_id") % 120) - 60 + lit(0.05)).as("lat"),
        ((col("user_id") % 300) - 150).cast("double").as("lon"))
      .distinct()
      .withColumn("var_lat_m2", lit(100.0))
      .withColumn("var_lon_m2", lit(100.0))
      .withColumn("cov_m2", lit(0.0))
      .withColumn("n", lit(50L))
      .withColumn("relocations", lit(0))
      .withColumn("last_sig", lit(0L))
    RefineLoop.initState(s, statePath, prior)

    val r1 = RefineLoop.run(s, measurements, statePath)
    val r2 = RefineLoop.run(s, measurements, statePath)
    r1.agg(
      count(lit(1)).as("aps"),
      count(when(col("applied"), 1)).as("applied_r1"),
      count(when(col("relocated"), 1)).as("relocated_r1"))
      .crossJoin(r2.agg(
        count(when(col("applied"), 1)).as("applied_r2"),
        count(when(col("relocated"), 1)).as("relocated_r2")))
  }

  /** P6 — the MLE optimizer itself under an EXACT oracle (not just the
    * r7_batch_localize bounding box): 25 planted scenarios (one per nation
    * key) put 4 equal-RSSI APs in a symmetric cross around a center, so
    *  - the weighted-centroid start IS the center (equal weights), and
    *  - the log-likelihood gradient cancels pairwise (N/S contribute ±d to
    *    the lat component with the same scale; E/W contribute 0), so the
    *    gradient-ascent fixpoint is the center analytically — the same
    *    closed-form-fixture style as the reference's
    *    `MaximumLikelihoodAlgorithmTest.java` known-geometry cases.
    * IEEE wobble budget: the WCL start sits within a few ulps of the center
    * (~1e-13°) and each residual gradient step moves ≤ lr·|g| ≈ 1e-13°, so
    * the published estimate is within ~1e-12° of the analytic center; the
    * centers sit mid-grid (+0.00005) on the FLOOR-1e-4 output grid, leaving
    * a 0.5e-4° margin — nine orders of magnitude of slack. RSSI varies by
    * scenario across all three σ tiers (2.5/4.0/6.0), which the oracle
    * restates from the planted value. */
  val mleFixpoint: Reg = Reg.sql(
    "p6_mle_fixpoint",
    """WITH cfg AS (
      |  SELECT n_nationkey AS gid,
      |         -30.0 + CAST(n_nationkey AS DOUBLE) * CAST(2.5 AS DOUBLE)
      |           + CAST(0.00005 AS DOUBLE) AS clat,
      |         10.0 + CAST(n_nationkey AS DOUBLE) * CAST(3.0 AS DOUBLE)
      |           + CAST(0.00005 AS DOUBLE) AS clon,
      |         CAST(-(50 + (n_nationkey * 7) % 45) AS DOUBLE) AS rssi
      |  FROM nation)
      |SELECT CAST(gid AS VARCHAR) AS group_id,
      |       CAST(4 AS BIGINT) AS n_aps,
      |       CAST(CASE WHEN rssi >= -60 THEN 2.5
      |                 WHEN rssi >= -80 THEN 4.0
      |                 ELSE 6.0 END AS DOUBLE) AS sigma,
      |       FLOOR(clat * 10000) / 10000 AS est_lat,
      |       FLOOR(clon * 10000) / 10000 AS est_lon
      |FROM cfg ORDER BY group_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.algo.{AccessPoint, MaxLikelihood, WifiScan}
    Tables.nation(s, dir).select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val clat = -30.0 + k * 2.5 + 0.00005
        val clon = 10.0 + k * 3.0 + 0.00005
        val rssi = -(50 + (k * 7) % 45).toDouble
        val d = 0.015625
        val aps = Seq(
          AccessPoint("ap_n", clat + d, clon), AccessPoint("ap_s", clat - d, clon),
          AccessPoint("ap_e", clat, clon + d), AccessPoint("ap_w", clat, clon - d))
        val scans = aps.map(a => WifiScan(a.mac, rssi, 2437))
        val p = MaxLikelihood.calculate(scans, aps)
          .getOrElse(sys.error(s"p6 fixture $k: calculate returned None"))
        (k.toString, 4L, MaxLikelihood.adaptiveSigma(rssi),
          math.floor(p.lat * 1e4) / 1e4, math.floor(p.lon * 1e4) / 1e4)
      }
      .toDF("group_id", "n_aps", "sigma", "est_lat", "est_lon")
      .orderBy("group_id")
  }

  /** P9 — the weighted centroid through the typed-Aggregator UDAF path
    * (`graft.functions.WclAggregator` via `functions.udaf`): same semantics
    * as p2's built-in form, but exercising the custom-UDAF extension type
    * with a quantized-integer buffer whose reduce/merge are exact monoid
    * ops — the cross-engine gate then proves the distributed merge tree
    * (any partitioning, any order) equals DuckDB's serial fold. */
  val wclUdaf: Reg = Reg.sql(
    "p9_wcl_udaf",
    """WITH m AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bssid,
      |         CAST(FLOOR(((user_id % 90) + (event_id % 25) * CAST(0.0003 AS DOUBLE))
      |                    * 1e6) AS BIGINT) AS latq,
      |         CAST(FLOOR(((user_id % 180) + (event_id % 23) * CAST(0.0003 AS DOUBLE))
      |                    * 1e6) AS BIGINT) AS lonq,
      |         CASE event_type WHEN 'purchase' THEN 4
      |                         WHEN 'click' THEN 3 ELSE 2 END AS w2
      |  FROM events)
      |SELECT bssid,
      |       CAST(SUM(latq * w2) // SUM(w2) AS BIGINT) AS lat_micro,
      |       CAST(SUM(lonq * w2) // SUM(w2) AS BIGINT) AS lon_micro,
      |       CAST(SUM(w2) AS BIGINT) AS w2_sum
      |FROM m GROUP BY bssid ORDER BY bssid""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wcl = udaf(graft.functions.WclAggregator)
    val in = Tables.events(s, dir).select(
      col("user_id").cast("string").as("bssid"),
      expr("""CAST(FLOOR(((user_id % 90) + (event_id % 25) * CAST(0.0003 AS DOUBLE))
             |           * 1e6) AS BIGINT)""".stripMargin).as("latQ"),
      expr("""CAST(FLOOR(((user_id % 180) + (event_id % 23) * CAST(0.0003 AS DOUBLE))
             |           * 1e6) AS BIGINT)""".stripMargin).as("lonQ"),
      when(col("event_type") === "purchase", 4L)
        .when(col("event_type") === "click", 3L).otherwise(2L).as("w2"))
    in.groupBy("bssid")
      .agg(wcl(col("latQ"), col("lonQ"), col("w2")).as("c"))
      .select(col("bssid"),
        col("c.latMicro").as("lat_micro"),
        col("c.lonMicro").as("lon_micro"),
        col("c.w2Sum").as("w2_sum"))
      .orderBy("bssid")
  }

  /** A11 — CUSUM change-point relocation detection (PAPER.md:71-77 names
    * CUSUM alongside the jump rule and DBSCAN), FULLY oracled on a
    * step-shaped corpus: each odd user's distance-to-anchor series steps
    * from exactly 0 m to exactly 500 m at the halfway fix (the
    * s12_stream_relocation planting style), so with threshold 1000 and
    * drift 50 the detector's arithmetic is exact integer-in-double —
    * baseline mean 0, pos accumulates 450/step, first crossing after 3
    * displaced fixes — and DuckDB states the closed form: first_cp =
    * n//2 + 2, detections repeat every 3 steps after each reset. The
    * Spark side RUNS the real detector (`StateRefinement.cusumChangePoints`)
    * per AP inside one groupByKey pass; the oracle restates the analytic
    * answer, so a drift in the reset logic, the baseline window, or the
    * accumulation order flips the gate. */
  val cusumRelocation: Reg = Reg.sql(
    "a11_cusum_relocation",
    """WITH c AS (
      |  SELECT user_id AS uid, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id HAVING COUNT(*) >= 50)
      |SELECT CAST(uid AS VARCHAR) AS bssid, n,
      |       uid % 2 = 1 AS relocated,
      |       CAST(CASE WHEN uid % 2 = 1 THEN n // 2 + 2 ELSE -1 END
      |            AS BIGINT) AS first_cp,
      |       CAST(CASE WHEN uid % 2 = 1 THEN 1 + (n - 1 - (n // 2 + 2)) // 3
      |            ELSE 0 END AS BIGINT) AS n_detections
      |FROM c ORDER BY bssid""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val ev = Tables.events(s, dir)
      .withColumn("rank", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
      .where(col("n") >= 50)
    val fixes = ev.select(
      col("user_id").cast("string").as("bssid"),
      col("rank").cast("long").as("rank"),
      // step plant: odd users jump exactly 500 m at the halfway fix
      when(col("user_id") % 2 === 1 && col("rank") >= expr("n DIV 2"), 500.0)
        .otherwise(0.0).as("dist_m"))
      .as[(String, Long, Double)]
    fixes.groupByKey(_._1)
      .mapGroups { (bssid, it) =>
        val rows = it.toIndexedSeq.sortBy(_._2)
        val cps = graft.localize.StateRefinement.cusumChangePoints(
          rows.map(_._3), threshold = 1000.0, drift = 50.0)
        (bssid, rows.size.toLong, cps.nonEmpty,
          if (cps.isEmpty) -1L else cps.head.toLong, cps.size.toLong)
      }
      .toDF("bssid", "n", "relocated", "first_cp", "n_detections")
      .orderBy("bssid")
  }

  /** R7 2-D covariance — the anisotropy gate: every AP's measurement cloud
    * is planted STREET-SHAPED (lon spread ~hundreds of meters, lat jitter
    * ~2 m), the real refine loop bootstraps a state per AP, and the gate
    * asserts the covariance ellipse the isotropic scalar form cannot
    * represent: the along-street variance dominates (> 4× cross-street),
    * the cross-street variance sits exactly on the 25 m² sigma floor, and
    * the cross term respects the positive-definiteness clamp. DuckDB
    * restates the booleans and the (capped) evidence counts closed-form —
    * a regression to isotropic fusion, a dropped floor, or a removed PD
    * clamp each flips a column. */
  val covEllipse: Reg = Reg.sql(
    "r7_cov_ellipse",
    """WITH c AS (
      |  SELECT user_id AS uid, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id HAVING COUNT(*) >= 20)
      |SELECT CAST(uid AS VARCHAR) AS bssid,
      |       CAST(LEAST(n, 1000) AS BIGINT) AS n,
      |       TRUE AS street_shaped,
      |       TRUE AS lat_floored,
      |       TRUE AS cov_bounded
      |FROM c ORDER BY bssid""".stripMargin) { (s, dir) =>
    implicit val spark = s
    import s.implicits._
    import graft.localize.{BatchLocalizer, RefineLoop}
    val ev = Tables.events(s, dir)
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 80) - 40 + (col("event_id") % 3) * lit(0.00001)).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 25) * lit(0.0005)).as("lon"),
      (-lit(40) - (col("event_id") % 50)).cast("double").as("rssi"),
      lit(1.0).as("w"))
    val ms = BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")
    RefineLoop.refineWith(s, ms, s.emptyDataset[RefineLoop.StateRow])
      .toDF()
      .select(
        col("bssid"), col("n"),
        (col("var_lon_m2") > col("var_lat_m2") * 4).as("street_shaped"),
        (col("var_lat_m2") === 25.0).as("lat_floored"),
        (abs(col("cov_m2")) <=
          sqrt(col("var_lat_m2") * col("var_lon_m2")) * 0.9 + 1e-9)
          .as("cov_bounded"))
      .orderBy("bssid")
  }

  val all: Seq[Reg] =
    Seq(batchLocalize, hotspotFull, neighborChurn, wclTier, lofLocal,
      dbscanRelocation, refineLoop, mleFixpoint, wclUdaf, cusumRelocation,
      covEllipse)
}
