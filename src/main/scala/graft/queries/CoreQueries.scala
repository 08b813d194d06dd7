package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Geo, Quality}

/** SURVEY.md §2 operator patterns re-expressed over the driver's TPC-H-ish
  * testdata (TESTDATA.md). Each query is the *generalized* form of a
  * reference operator — the reference's WiFi fact table maps onto the star
  * schema (bssid ≙ group key such as l_suppkey/l_partkey/user_id;
  * measurement_timestamp ≙ l_shipdate/ts; quality columns synthesized from
  * numeric columns with the engine's own scalar functions).
  *
  * Scale notes (the design target is ~100 TB on a real cluster, tested at
  * local[32]):
  *  - groupBy aggregations here are all partial-aggregatable (count/sum/min/
  *    max/avg) → map-side combine, one shuffle on the group key;
  *  - every dimension join (customer, supplier, region/nation, per-key medians)
  *    is explicitly `broadcast()` — the fact side never shuffles for them;
  *  - per-group top-k uses Window row_number on the group key — one hash
  *    shuffle, no global sort;
  *  - filters/projections are plain Catalyst expressions → pushed to the
  *    parquet scan (PushedFilters / pruned ReadSchema).
  */
object CoreQueries {

  private def money(c: Column): Column = c.cast("decimal(18,2)")
  private def moneySum(c: Column): Column = round(sum(money(c)).cast("double"), 2)

  /** A1 — candidate selection (`wifi_measurement_s3_table_schema.md:83-93`):
    * time cutoff + IN-list on the AP key + null-safe outlier exclusion +
    * deterministic ORDER BY. */
  val a1CandidateSelection: Reg = Reg.sql(
    "a1_candidate_selection",
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |       CAST(l_shipdate AS DATE) AS ship_date, l_quantity
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) > DATE '1999-06-01'
      |  AND l_suppkey IN (1, 2, 3, 5, 8, 13, 21, 34)
      |  AND (l_returnflag <> 'A' OR l_returnflag IS NULL)
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag, ship_date, l_quantity""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .where(to_date(col("l_shipdate")) > lit("1999-06-01").cast("date")
        && col("l_suppkey").isin(1, 2, 3, 5, 8, 13, 21, 34)
        && (col("l_returnflag") =!= "A" || col("l_returnflag").isNull))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_returnflag"), to_date(col("l_shipdate")).as("ship_date"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag", "ship_date", "l_quantity")
  }

  /** A2 — clean-data fetch (`wifi_measurement_s3_table_schema.md:97-107`):
    * recency cutoff + outlier exclusion, ORDER BY key, recency DESC. */
  val a2CleanFetch: Reg = Reg.sql(
    "a2_clean_fetch",
    """SELECT user_id, event_id, event_type, value
      |FROM events
      |WHERE CAST(ts AS DATE) >= DATE '2024-01-20'
      |  AND (event_type <> 'error' OR event_type IS NULL)
      |ORDER BY user_id, event_id DESC""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .where(to_date(col("ts")) >= lit("2024-01-20").cast("date")
        && (col("event_type") =!= "error" || col("event_type").isNull))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy(col("user_id"), col("event_id").desc)
  }

  /** A3 — per-AP grouped stats (`wifi_measurement_s3_table_schema.md:149-161`):
    * COUNT(*), conditional counts, MIN/MAX timestamp, AVG. */
  val a3PerKeyStats: Reg = Reg.sql(
    "a3_per_key_stats",
    """SELECT l_suppkey,
      |       COUNT(*) AS cnt,
      |       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_cnt,
      |       COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS accepted_cnt,
      |       CAST(MIN(l_shipdate) AS DATE) AS first_ship,
      |       CAST(MAX(l_shipdate) AS DATE) AS last_ship,
      |       ROUND(AVG(l_discount), 4) AS avg_discount
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy("l_suppkey").agg(
      count(lit(1)).as("cnt"),
      count(when(col("l_returnflag") === "R", 1)).as("returned_cnt"),
      count(when(col("l_returnflag") === "A", 1)).as("accepted_cnt"),
      to_date(min("l_shipdate")).as("first_ship"),
      to_date(max("l_shipdate")).as("last_ship"),
      round(avg("l_discount"), 4).as("avg_discount"))
      .orderBy("l_suppkey")
  }

  /** A4 — sufficiency gate (`wifi_measurement_s3_table_schema.md:165-176`,
    * HAVING COUNT(*) >= threshold; threshold 30 ≈ per-part median here,
    * the reference's N>=20 bootstrap gate generalized). */
  val a4SufficiencyGate: Reg = Reg.sql(
    "a4_sufficiency_gate",
    """SELECT l_partkey, COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 30
      |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 30)
      .orderBy("l_partkey")
  }

  /** A5 — quality assessment (`wifi_measurement_s3_table_schema.md:180-192`):
    * AVG(weight), STDDEV of coordinates, COUNT(DISTINCT DATE(ts)). */
  val a5QualityAssessment: Reg = Reg.sql(
    "a5_quality_assessment",
    """SELECT l_returnflag,
      |       ROUND(AVG(l_quantity), 4) AS avg_qty,
      |       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
      |       COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS active_days,
      |       COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
      round(avg("l_quantity"), 4).as("avg_qty"),
      round(stddev_samp("l_extendedprice"), 2).as("sd_price"),
      countDistinct(to_date(col("l_shipdate"))).as("active_days"),
      count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** A9 — MAD outlier detection (PAPER.md:109-115 generalized): per group,
    * median of |x - median(x)|; points beyond 3×MAD are outliers. Exact
    * `percentile` (interpolating), matching DuckDB MEDIAN. The per-key
    * median/MAD frames are joined back WITHOUT a broadcast hint: their row
    * count equals key cardinality, which at 100 TB (millions of keys) would
    * blow past the broadcast limit and OOM the driver — AQE picks broadcast
    * at low cardinality and shuffled-hash/sort-merge at high, which is the
    * right call at every scale. */
  val a9MadOutliers: Reg = Reg.sql(
    "a9_outlier_mad",
    """WITH med AS (
      |  SELECT l_partkey, MEDIAN(l_extendedprice) AS med
      |  FROM lineitem GROUP BY l_partkey
      |), dev AS (
      |  SELECT l.l_partkey, ABS(l.l_extendedprice - m.med) AS adev
      |  FROM lineitem l JOIN med m ON l.l_partkey = m.l_partkey
      |), mad AS (
      |  SELECT l_partkey, MEDIAN(adev) AS mad FROM dev GROUP BY l_partkey
      |)
      |SELECT d.l_partkey,
      |       COUNT(*) AS cnt,
      |       COUNT(CASE WHEN d.adev > 3 * t.mad THEN 1 END) AS outlier_cnt,
      |       ROUND(MAX(t.mad), 4) AS mad
      |FROM dev d JOIN mad t ON d.l_partkey = t.l_partkey
      |GROUP BY d.l_partkey ORDER BY d.l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val med = li.groupBy("l_partkey")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    val dev = li.join(med, "l_partkey")
      .withColumn("adev", abs(col("l_extendedprice") - col("med")))
    val mad = dev.groupBy("l_partkey")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(mad, "l_partkey")
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("adev") > lit(3) * col("mad"), 1)).as("outlier_cnt"),
        round(max("mad"), 4).as("mad"))
      .orderBy("l_partkey")
  }

  /** A10 — hotspot (mobile-AP) detection (PAPER.md:57-69 generalized): per
    * key, coordinate spread (stddev) above a threshold ⇒ mobile. */
  val a10HotspotDetection: Reg = Reg.sql(
    "a10_hotspot_detection",
    """WITH pos AS (
      |  SELECT user_id, LEAST(value, 200) / 200 * 90 AS lat
      |  FROM events
      |), spread AS (
      |  SELECT user_id, COUNT(*) AS cnt, STDDEV_SAMP(lat) AS sd_lat
      |  FROM pos GROUP BY user_id
      |)
      |SELECT CASE WHEN sd_lat > 25 THEN 'mobile' ELSE 'stationary' END AS verdict,
      |       COUNT(*) AS key_cnt, CAST(SUM(cnt) AS BIGINT) AS measurement_cnt
      |FROM spread GROUP BY 1 ORDER BY verdict""".stripMargin) { (s, dir) =>
    val pos = Tables.events(s, dir)
      .select(col("user_id"), (least(col("value"), lit(200)) / 200 * 90).as("lat"))
    pos.groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), stddev_samp("lat").as("sd_lat"))
      .select(
        when(col("sd_lat") > 25, "mobile").otherwise("stationary").as("verdict"),
        col("cnt"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("key_cnt"), sum("cnt").as("measurement_cnt"))
      .orderBy("verdict")
  }

  /** A11 — relocation detection (PAPER.md:71-77 generalized): change-point
    * signal via lag() over an event-time window per key; count big jumps. */
  val a11RelocationJumps: Reg = Reg.sql(
    "a11_relocation_jumps",
    """WITH d AS (
      |  SELECT user_id, value,
      |         value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
      |  FROM events
      |)
      |SELECT user_id, COUNT(*) AS cnt,
      |       COUNT(CASE WHEN ABS(delta) > 300 THEN 1 END) AS jump_cnt
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, dir)
      .withColumn("delta", col("value") - lag("value", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"),
        count(when(abs(col("delta")) > 300, 1)).as("jump_cnt"))
      .orderBy("user_id")
  }

  /** O1 — sorted scan with LIMIT (`wifi_measurement_s3_table_schema.md:92,106`).
    * Catalyst turns orderBy+limit into TakeOrderedAndProject — no full sort
    * materialization at scale. */
  val o1SortedScan: Reg = Reg.sql(
    "o1_sorted_scan",
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity
      |FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_quantity LIMIT 1000""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      .limit(1000)
  }

  /** O2 — per-group top-k (`APMeasurementsLookUpService.java:156-157`):
    * window row_number over the group key, never a global sort. */
  val o2TopKPerGroup: Reg = Reg.sql(
    "o2_topk_per_group",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |         ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("l_suppkey", "rn")
  }

  /** O3 — max_by / strongest-signal pick (`ProximityDetectionAlgorithm.java:99-102`):
    * arg-max via max(struct(ord, tiebreak)) — one partial-aggregatable pass,
    * deterministic under ties. */
  val o3MaxBy: Reg = Reg.sql(
    "o3_max_by_strongest",
    """WITH mv AS (SELECT user_id, MAX(value) AS top_value FROM events GROUP BY user_id)
      |SELECT e.user_id, m.top_value, MAX(e.event_id) AS top_event_id
      |FROM events e JOIN mv m ON e.user_id = m.user_id AND e.value = m.top_value
      |GROUP BY e.user_id, m.top_value ORDER BY e.user_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.value").as("top_value"), col("m.event_id").as("top_event_id"))
      .orderBy("user_id")
  }

  /** O4 — UNION ALL of two measurement streams (`WifiDataTransformationService.java:157-167`),
    * here: high-value purchases ++ error events, unionByName then aggregate. */
  val o4UnionStreams: Reg = Reg.sql(
    "o4_union_streams",
    """WITH u AS (
      |  SELECT user_id, 'CONNECTED' AS connection_status, value FROM events
      |  WHERE event_type = 'purchase' AND value > 100
      |  UNION ALL
      |  SELECT user_id, 'SCAN' AS connection_status, value FROM events
      |  WHERE event_type = 'error'
      |)
      |SELECT connection_status, COUNT(*) AS cnt,
      |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      |FROM u GROUP BY connection_status ORDER BY connection_status""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val connected = ev.where(col("event_type") === "purchase" && col("value") > 100)
      .select(col("user_id"), lit("CONNECTED").as("connection_status"), col("value"))
    val scans = ev.where(col("event_type") === "error")
      .select(col("user_id"), lit("SCAN").as("connection_status"), col("value"))
    connected.unionByName(scans)
      .groupBy("connection_status")
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .orderBy("connection_status")
  }

  /** O5 — distinct-key count (`SelectionContextBuilder.java:41`). */
  val o5DistinctCount: Reg = Reg.sql(
    "o5_distinct_count",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
      |       COUNT(DISTINCT l_suppkey) AS distinct_supps, COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("distinct_parts"),
      countDistinct(col("l_suppkey")).as("distinct_supps"),
      count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** O6 — keyed dedup keeping the latest row (`application.yml:171` 5s window,
    * key `event_id` per `WifiDataTransformationService.java:789-791`):
    * deterministic row_number()=1, not dropDuplicates (which keeps an
    * arbitrary row and would not be reproducible). */
  val o6Dedup: Reg = Reg.sql(
    "o6_dedup_latest",
    """SELECT user_id, event_type, event_id AS kept_event_id, value AS kept_value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
    Tables.events(s, dir)
      .select("user_id", "event_type", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("kept_event_id"), col("value").as("kept_value"))
      .orderBy("user_id", "event_type")
  }

  /** J1 — fact ⋈ small dimension as an explicit broadcast hash join
    * (`WifiPositioningCalculator.java:303-318` hashmap probe ≙ broadcast). */
  val j1BroadcastJoin: Reg = Reg.sql(
    "j1_broadcast_join",
    """SELECT c.c_mktsegment, COUNT(*) AS order_cnt,
      |       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("order_cnt"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** J2 — batch-get as a broadcast LEFT SEMI join
    * (`WifiAccessPointRepositoryImpl.java:150-225`). */
  val j2SemiJoin: Reg = Reg.sql(
    "j2_semi_join",
    """SELECT o_orderstatus, COUNT(*) AS cnt
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val valid = Tables.customer(s, dir)
      .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
    Tables.orders(s, dir)
      .join(broadcast(valid), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** J3 — status anti-filter (`WifiAccessPoint.java:37-38`,
    * `PositioningServiceImpl.java:355-356`): exclude rows whose key belongs
    * to an invalid-status dimension subset — broadcast LEFT ANTI join. */
  val j3StatusAnti: Reg = Reg.sql(
    "j3_status_anti_filter",
    """SELECT o_orderstatus, COUNT(*) AS cnt
      |FROM orders
      |WHERE o_custkey NOT IN (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val expired = Tables.customer(s, dir).where(col("c_mktsegment") === "FURNITURE")
    Tables.orders(s, dir)
      .join(broadcast(expired), col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** J4 — AP-pair self-join, i<j theta condition (`RSSIRatioAlgorithm.java:421-453`). */
  val j4PairSelfJoin: Reg = Reg.sql(
    "j4_pair_self_join",
    """SELECT r.r_name, COUNT(*) AS pair_cnt
      |FROM nation a
      |JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |JOIN region r ON r.r_regionkey = a.n_regionkey
      |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) { (s, dir) =>
    val n = Tables.nation(s, dir)
    val a = n.select(col("n_nationkey").as("a_key"), col("n_regionkey").as("a_region"))
    val b = n.select(col("n_nationkey").as("b_key"), col("n_regionkey").as("b_region"))
    a.join(broadcast(b), col("a_region") === col("b_region") && col("a_key") < col("b_key"))
      .join(broadcast(Tables.region(s, dir)), col("r_regionkey") === col("a_region"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("r_name")
  }

  /** J5 — estimate ⋈ prior-AP-state join (PAPER.md:198-209 Kalman-style
    * blend, simplified to a fixed-gain blend of new estimate and prior). */
  val j5EstimateStateJoin: Reg = Reg.sql(
    "j5_estimate_state_join",
    """WITH est AS (
      |  SELECT l_suppkey, ROUND(AVG(l_extendedprice), 4) AS est_price, COUNT(*) AS n
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT e.l_suppkey, e.n,
      |       CAST(ROUND(0.7 * CAST(e.est_price AS DECIMAL(18,6))
      |                + 0.3 * CAST(s.s_acctbal AS DECIMAL(18,6)), 4) AS DOUBLE) AS blended
      |FROM est e JOIN supplier s ON s.s_suppkey = e.l_suppkey
      |ORDER BY e.l_suppkey""".stripMargin) { (s, dir) =>
    val est = Tables.lineitem(s, dir).groupBy("l_suppkey")
      .agg(round(avg("l_extendedprice"), 4).as("est_price"), count(lit(1)).as("n"))
    est.join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
      .select(col("l_suppkey"), col("n"),
        // Blend in DECIMAL so the half-ulp rounding boundary of the double
        // expression cannot flip between engines (observed 1-ulp flake at sf0.1).
        expr("CAST(ROUND(0.7 * CAST(est_price AS DECIMAL(18,6)) " +
          "+ 0.3 * CAST(s_acctbal AS DECIMAL(18,6)), 4) AS DOUBLE)").as("blended"))
      .orderBy("l_suppkey")
  }

  /** F5–F8 — validation predicate gate (`DataValidationService.java:196-299,345-367,421-449`):
    * range check + regex format check + timestamp-window check, counted
    * valid/invalid per group (per-record error isolation F18: bad rows are
    * counted, never fail the batch). */
  val fValidationGate: Reg = Reg.sql(
    "f_validation_gate",
    """WITH v AS (
      |  SELECT event_type,
      |         CASE WHEN value BETWEEN 0 AND 200
      |               AND regexp_matches(event_type, '^[a-z_]+$')
      |               AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2025-01-01'
      |              THEN 1 ELSE 0 END AS is_valid
      |  FROM events)
      |SELECT event_type,
      |       CAST(SUM(is_valid) AS BIGINT) AS valid_cnt,
      |       CAST(COUNT(*) - SUM(is_valid) AS BIGINT) AS invalid_cnt
      |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val valid = col("value").between(0, 200) &&
      col("event_type").rlike("^[a-z_]+$") &&
      to_date(col("ts")).between(lit("2024-01-01").cast("date"), lit("2025-01-01").cast("date"))
    Tables.events(s, dir)
      .select(col("event_type"), when(valid, 1).otherwise(0).as("is_valid"))
      .groupBy("event_type")
      .agg(sum("is_valid").as("valid_cnt"),
        (count(lit(1)) - sum("is_valid")).as("invalid_cnt"))
      .orderBy("event_type")
  }

  /** F2 — lenient JSON field extraction from a string payload column
    * (`from_json`/`get_json_object` family; the raw-layer parse is PERMISSIVE,
    * `application.yml:28`). */
  val f2JsonExtract: Reg = Reg.sql(
    "f2_json_extract",
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       COUNT(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** F12/F13 — deterministic id derivation via sha2
    * (`WifiDataTransformationService.java:748-791`): device_id = sha256 of
    * colon-joined identity fields; event_id = sha256("ts:key"). */
  val f12Sha2Ids: Reg = Reg.sql(
    "f12_sha2_ids",
    """SELECT doc_id,
      |       sha256(lang || ':' || source) AS device_id,
      |       sha256(CAST(doc_id AS VARCHAR) || ':' || lang) AS event_id
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        sha2(concat_ws(":", col("lang"), col("source")), 256).as("device_id"),
        sha2(concat_ws(":", col("doc_id").cast("string"), col("lang")), 256).as("event_id"))
      .orderBy("doc_id")
  }

  /** F15 — quality_weight CASE ladder (engine scalar fn over synthesized
    * columns; sums of {1.0, 1.5, 2.0} are exact in double). */
  val f15QualityWeight: Reg = Reg.sql(
    "f15_quality_weight",
    """WITH w AS (
      |  SELECT event_type,
      |         CASE WHEN event_type <> 'purchase' THEN 1.0
      |              WHEN value < 50 AND -(user_id % 100) > -70 THEN 1.5
      |              ELSE 2.0 END AS weight
      |  FROM events)
      |SELECT event_type, CAST(SUM(weight) AS DOUBLE) AS sum_weight, COUNT(*) AS cnt
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val status = when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN")
    val rssi = -(col("user_id") % 100)
    Tables.events(s, dir)
      .select(col("event_type"),
        Quality.qualityWeight(status, col("value"), rssi).as("weight"))
      .groupBy("event_type")
      .agg(sum("weight").cast("double").as("sum_weight"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** F16 — quality_score formula (`WifiDataTransformationService.java:698-718`). */
  val f16QualityScore: Reg = Reg.sql(
    "f16_quality_score",
    """WITH sc AS (
      |  SELECT event_type,
      |         LEAST(1.0, 0.5 + 0.3 * GREATEST(0.0, 1.0 - value / 100.0)
      |                  + 0.2 * GREATEST(0.0, (-(user_id % 100) + 100.0) / 100.0)) AS score
      |  FROM events)
      |SELECT event_type, ROUND(AVG(score), 4) AS avg_score, COUNT(*) AS cnt
      |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val rssi = -(col("user_id") % 100).cast("double")
    Tables.events(s, dir)
      .select(col("event_type"),
        Quality.qualityScore(col("value"), rssi).as("score"))
      .groupBy("event_type")
      .agg(round(avg("score"), 4).as("avg_score"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** C1 — haversine comparison metric (`ComparisonService.java:288-290`). */
  val c1Haversine: Reg = Reg.sql(
    "c1_haversine_distance",
    """WITH p AS (
      |  SELECT event_type,
      |         LEAST(value, 200) / 200 * 90 AS lat1,
      |         CAST(user_id % 180 AS DOUBLE) AS lon1
      |  FROM events)
      |SELECT event_type, COUNT(*) AS cnt,
      |       ROUND(AVG(2 * 6371000 * ASIN(SQRT(
      |         POW(SIN(RADIANS(40.0 - lat1) / 2), 2) +
      |         COS(RADIANS(lat1)) * COS(RADIANS(40.0)) *
      |         POW(SIN(RADIANS(-75.0 - lon1) / 2), 2)))) / 1000, 3) AS avg_km
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val lat1 = least(col("value"), lit(200)) / 200 * 90
    val lon1 = (col("user_id") % 180).cast("double")
    Tables.events(s, dir)
      .select(col("event_type"),
        Geo.haversineMeters(lat1, lon1, lit(40.0), lit(-75.0)).as("dist_m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(avg(col("dist_m") / 1000), 3).as("avg_km"))
      .orderBy("event_type")
  }

  /** C2 — expected-uncertainty check (`ComparisonService.java:293-299`):
    * sqrt(acc1²+acc2²) and a within-threshold verdict count. */
  val c2Uncertainty: Reg = Reg.sql(
    "c2_expected_uncertainty",
    """WITH p AS (
      |  SELECT event_type,
      |         2 * 6371000 * ASIN(SQRT(
      |           POW(SIN(RADIANS(40.0 - LEAST(value, 200) / 200 * 90) / 2), 2) +
      |           COS(RADIANS(LEAST(value, 200) / 200 * 90)) * COS(RADIANS(40.0)) *
      |           POW(SIN(RADIANS(-75.0 - CAST(user_id % 180 AS DOUBLE)) / 2), 2))) / 1000 AS dist_km,
      |         value AS acc1
      |  FROM events)
      |SELECT event_type,
      |       COUNT(CASE WHEN dist_km <= SQRT(acc1 * acc1 + 50 * 50) THEN 1 END) AS within_cnt,
      |       COUNT(*) AS cnt
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val lat1 = least(col("value"), lit(200)) / 200 * 90
    val lon1 = (col("user_id") % 180).cast("double")
    val distKm = Geo.haversineMeters(lat1, lon1, lit(40.0), lit(-75.0)) / 1000
    Tables.events(s, dir)
      .select(col("event_type"), distKm.as("dist_km"), col("value").as("acc1"))
      .groupBy("event_type")
      .agg(
        count(when(col("dist_km") <= Geo.expectedUncertainty(col("acc1"), lit(50.0)), 1))
          .as("within_cnt"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** P2 (batch form) — per-key weighted centroid, w from the quality column
    * (PAPER.md:135-139; `WeightedCentroidAlgorithm.java:358-420`): pure
    * partial-aggregatable sums — ONE shuffle for all keys, which is exactly
    * what replaces the reference's serial per-MAC Athena loop. */
  val p2WeightedCentroid: Reg = Reg.sql(
    "p2_weighted_centroid",
    """WITH m AS (
      |  SELECT l_suppkey,
      |         (l_partkey % 180) - 90 + l_discount AS lat,
      |         (l_orderkey % 360) - 180 + l_tax AS lon,
      |         l_quantity AS w
      |  FROM lineitem)
      |SELECT l_suppkey,
      |       ROUND(SUM(lat * w) / SUM(w), 4) AS wcl_lat,
      |       ROUND(SUM(lon * w) / SUM(w), 4) AS wcl_lon,
      |       CAST(SUM(w) AS DOUBLE) AS sum_w, COUNT(*) AS n
      |FROM m GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"),
        ((col("l_partkey") % 180) - 90 + col("l_discount")).as("lat"),
        ((col("l_orderkey") % 360) - 180 + col("l_tax")).as("lon"),
        col("l_quantity").as("w"))
      .groupBy("l_suppkey")
      .agg(
        round(sum(col("lat") * col("w")) / sum(col("w")), 4).as("wcl_lat"),
        round(sum(col("lon") * col("w")) / sum(col("w")), 4).as("wcl_lon"),
        sum("w").cast("double").as("sum_w"),
        count(lit(1)).as("n"))
      .orderBy("l_suppkey")
  }

  /** R7 — maturity-tier dispatch on per-key sufficiency (PAPER.md:127,161-169:
    * N>=20 bootstrap WCL, N>=50 MLE, N>=100 Bayesian). */
  val r7TierDispatch: Reg = Reg.sql(
    "r7_tier_dispatch",
    """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
      |SELECT CASE WHEN n < 20 THEN 'insufficient'
      |            WHEN n < 50 THEN 'wcl'
      |            WHEN n < 100 THEN 'mle'
      |            ELSE 'bayesian' END AS tier,
      |       COUNT(*) AS key_cnt, CAST(SUM(n) AS BIGINT) AS measurement_cnt
      |FROM c GROUP BY 1 ORDER BY tier""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(
        when(col("n") < 20, "insufficient")
          .when(col("n") < 50, "wcl")
          .when(col("n") < 100, "mle")
          .otherwise("bayesian").as("tier"),
        col("n"))
      .groupBy("tier")
      .agg(count(lit(1)).as("key_cnt"), sum("n").as("measurement_cnt"))
      .orderBy("tier")
  }

  /** A13 — pivot (wide reporting shape): per-supplier return-flag columns.
    * Spark's `.pivot` compiles to conditional aggregation — the oracle states
    * that form explicitly, which is also what DuckDB executes. */
  val a13Pivot: Reg = Reg.sql(
    "a13_pivot",
    """SELECT l_suppkey,
      |       COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS flag_a,
      |       COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS flag_n,
      |       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS flag_r
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .count()
      .na.fill(0L, Seq("A", "N", "R"))
      .select(col("l_suppkey"), col("A").as("flag_a"), col("N").as("flag_n"),
        col("R").as("flag_r"))
      .orderBy("l_suppkey")
  }

  /** O7 — running total per key (cumulative window over event time): the
    * general time-series surface the relocation/maturity analytics build on. */
  val o7RunningTotal: Reg = Reg.sql(
    "o7_running_total",
    """SELECT user_id, event_id,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |         OVER (PARTITION BY user_id ORDER BY event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_value
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        sum(money(col("value"))).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** O8 — rank/dense_rank windows (per-key leaderboard shape). */
  val o8Rank: Reg = Reg.sql(
    "o8_rank_windows",
    """SELECT l_suppkey, l_orderkey, l_linenumber, rnk, drnk FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |         RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
      |         DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk
      |  FROM lineitem)
      |WHERE rnk <= 2
      |ORDER BY l_suppkey, rnk, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .where(col("rnk") <= 2)
      .orderBy("l_suppkey", "rnk", "l_orderkey", "l_linenumber")
  }

  /** A12 — ROLLUP subtotals (reporting surface over the fact table). */
  val a12Rollup: Reg = Reg.sql(
    "a12_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").cast("double").as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("cnt"))
      .orderBy("returnflag", "linestatus")
  }

  /** Flagship A3/A5 composite (TPC-H Q1 shape) — the headline scan+agg. */
  val q1PricingSummary: Reg = Reg.sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
      |       ROUND(AVG(l_quantity), 4) AS avg_qty,
      |       ROUND(AVG(l_discount), 4) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .where(to_date(col("l_shipdate")) <= lit("2000-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val all: Seq[Reg] = Seq(
    a1CandidateSelection, a2CleanFetch, a3PerKeyStats, a4SufficiencyGate,
    a5QualityAssessment, a9MadOutliers, a10HotspotDetection, a11RelocationJumps,
    o1SortedScan, o2TopKPerGroup, o3MaxBy, o4UnionStreams, o5DistinctCount, o6Dedup,
    o7RunningTotal, o8Rank, a12Rollup, a13Pivot,
    j1BroadcastJoin, j2SemiJoin, j3StatusAnti, j4PairSelfJoin, j5EstimateStateJoin,
    fValidationGate, f2JsonExtract, f12Sha2Ids, f15QualityWeight, f16QualityScore,
    c1Haversine, c2Uncertainty, p2WeightedCentroid, r7TierDispatch, q1PricingSummary)
}
