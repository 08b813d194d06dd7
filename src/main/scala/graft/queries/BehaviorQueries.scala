package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Geo

/** Round-7 behavioral-analytics extensions: the event-sequence and
  * state-maintenance operator family a warehouse engine needs beyond the
  * reference's literal surface, each DuckDB-oracled.
  *
  *  - O18 window funnel — ordered multi-step sequence match (view → click
  *    → purchase within a bounded horizon), the reference's scan→connect→
  *    report device journey (`WifiScanBatchMessageListener` feeding the
  *    comparison flow) generalized to the classic funnel shape. ONE shuffle:
  *    all three steps resolve inside a single per-user sort via running-min
  *    window expressions; the final per-user aggregate reuses the same hash
  *    partitioning, so no second Exchange.
  *  - O19 retention cohorts — first-touch cohorting + week-offset activity
  *    matrix. Two aggregates on the same key (first-day, then activity),
  *    joined co-partitioned; COUNT over a pre-distinct projection.
  *  - A23 incremental aggregate maintenance — per-key partial states
  *    (count/sum/min/max) computed on a base slice and a delta slice
  *    independently, then merged ALGEBRAICALLY (commutative-monoid merge:
  *    counts add, sums add, min/max fold, avg derived at the end). At 100 TB
  *    this is THE pattern for keeping a per-AP stats table fresh: read only
  *    the delta partition plus the stored state, never recompute the fact
  *    table. The DuckDB oracle IS the full recompute over base ∪ delta, so
  *    the hash gate proves merge(state(base), state(delta)) ≡ state(all).
  *  - J11 grid-cell neighbor join — all AP pairs within 500 m, found via an
  *    integer cell-bucket equi-join (0.01° cells, one side exploded to its
  *    3×3 neighborhood) instead of a cross join. The cell width over-covers
  *    the radius at every latitude in range (|lat| ≤ 51 ⇒ 500 m ≤ 0.0070°
  *    of longitude < 0.01°), so ±1-cell expansion provably misses no pair;
  *    the DuckDB oracle states the ALL-PAIRS ground truth, making the hash
  *    gate a completeness proof of the bucketing scheme. This is the
  *    scale path for the reference's proximity/interference analyses
  *    (`ProximityDetectionAlgorithm`-adjacent spatial self-joins): shuffle
  *    on cell keys, candidate set bounded by local density, never O(n²).
  */
object BehaviorQueries {

  /** O18 — three-step window funnel over events: first view, first click
    * after that view, first purchase after that click, all within 72 h of
    * the first view. Strict `>` comparisons make intra-millisecond tie
    * order irrelevant (a same-ms successor never qualifies), so the result
    * is deterministic under any stable (ms, event_id) ordering. Running
    * minima are order-insensitive; each row's running first-view equals the
    * global first view for every row at-or-after it, which is exactly the
    * rows the strict inequality admits.
    *
    * steps_reached is the sum of step indicators; the candidates are
    * monotone by construction (a click candidate requires a view, a
    * purchase candidate a click), so the sum is the funnel depth. */
  val o18WindowFunnel: Reg = Reg.sql(
    "o18_window_funnel",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ems FROM events),
      |s1 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ems END) OVER
      |    (PARTITION BY user_id ORDER BY ems, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1
      |  FROM e),
      |s2 AS (
      |  SELECT *, CASE WHEN event_type = 'click' AND ems > v1
      |                  AND ems <= v1 + 259200000 THEN ems END AS c2cand
      |  FROM s1),
      |s3 AS (
      |  SELECT *, MIN(c2cand) OVER
      |    (PARTITION BY user_id ORDER BY ems, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      |  FROM s2),
      |s4 AS (
      |  SELECT *, CASE WHEN event_type = 'purchase' AND ems > c2
      |                  AND ems <= v1 + 259200000 THEN ems END AS p3cand
      |  FROM s3)
      |SELECT user_id,
      |       MIN(CASE WHEN event_type = 'view' THEN ems END) AS first_view_ms,
      |       MIN(c2cand) AS first_click_ms,
      |       MIN(p3cand) AS first_purchase_ms,
      |       CAST(CASE WHEN MIN(CASE WHEN event_type = 'view' THEN ems END)
      |                      IS NOT NULL THEN 1 ELSE 0 END
      |          + CASE WHEN MIN(c2cand) IS NOT NULL THEN 1 ELSE 0 END
      |          + CASE WHEN MIN(p3cand) IS NOT NULL THEN 1 ELSE 0 END
      |          AS BIGINT) AS steps_reached
      |FROM s4 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val horizonMs = 72L * 3600 * 1000
    val w = Window.partitionBy("user_id").orderBy(col("__ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = Tables.events(s, dir)
      .withColumn("__ms", unix_millis(col("ts")))
      .withColumn("v1",
        min(when(col("event_type") === "view", col("__ms"))).over(w))
      .withColumn("c2cand",
        when(col("event_type") === "click" && col("__ms") > col("v1") &&
          col("__ms") <= col("v1") + horizonMs, col("__ms")))
      .withColumn("c2", min(col("c2cand")).over(w))
      .withColumn("p3cand",
        when(col("event_type") === "purchase" && col("__ms") > col("c2") &&
          col("__ms") <= col("v1") + horizonMs, col("__ms")))
    staged
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("__ms"))).as("first_view_ms"),
        min(col("c2cand")).as("first_click_ms"),
        min(col("p3cand")).as("first_purchase_ms"))
      .select(
        col("user_id"), col("first_view_ms"), col("first_click_ms"),
        col("first_purchase_ms"),
        (when(col("first_view_ms").isNotNull, 1).otherwise(0) +
          when(col("first_click_ms").isNotNull, 1).otherwise(0) +
          when(col("first_purchase_ms").isNotNull, 1).otherwise(0))
          .cast("bigint").as("steps_reached"))
      .orderBy("user_id")
  }

  /** Integer floor division matching DuckDB's `//` for ANY sign: Spark's
    * `div` truncates toward zero, which diverges from floor on negative
    * operands (pre-1970 timestamps). `a - pmod(a, b)` is non-negative-mod
    * subtracted, hence exactly divisible by b; for |a| < 2^53 both the
    * numerator and the integer quotient are exactly representable, so the
    * correctly-rounded double division is exact and the cast is lossless. */
  private def floorDiv(a: org.apache.spark.sql.Column, b: Long) =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** O19 — retention cohort matrix: users cohorted by first-activity epoch
    * week, activity bucketed by whole weeks since their own first day.
    * Day/week indices are pure integer floor-division on epoch
    * milliseconds — no calendar arithmetic to drift between engines. The
    * first-day aggregate and the activity join share the user_id hash
    * partitioning, so the join adds no Exchange; at 100 TB the first-day
    * frame is a per-user rollup (orders of magnitude smaller than the fact
    * table) but still scales with users, so it is deliberately NOT
    * broadcast. */
  val o19RetentionCohorts: Reg = Reg.sql(
    "o19_retention_cohorts",
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
      |f AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT f.cohort_day // 7 AS cohort_week,
      |         (e.day - f.cohort_day) // 7 AS week_offset, e.user_id
      |  FROM e JOIN f USING (user_id))
      |SELECT cohort_week, week_offset, COUNT(*) AS active_users
      |FROM a GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), floorDiv(unix_millis(col("ts")), 86400000L).as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(first, "user_id")
      .select(
        floorDiv(col("cohort_day"), 7L).as("cohort_week"),
        floorDiv(col("day") - col("cohort_day"), 7L).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** A23 — incremental aggregate maintenance. The fact table is split
    * deterministically into a base slice (l_orderkey % 10 < 8) and a delta
    * slice; per-supplier partial states are computed on each independently
    * and merged with the monoid operations (null-safe adds, least/greatest
    * folds — Spark's `least`/`greatest` and DuckDB's skip NULLs
    * identically). The oracle recomputes from scratch over the whole table:
    * hash equality proves the merge is lossless, which is what licenses
    * delta-only maintenance of a 100 TB stats table. Money-sum discipline
    * per Reg: DECIMAL(18,2) internally, DOUBLE out; avg derived from the
    * rounded sum in BOTH engines so the division sees identical inputs. */
  val a23IncrementalAgg: Reg = Reg.sql(
    "a23_incremental_agg",
    """SELECT l_suppkey,
      |       COUNT(*) AS n,
      |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
      |         AS sum_qty,
      |       CAST(MIN(l_shipdate) AS DATE) AS min_ship,
      |       CAST(MAX(l_shipdate) AS DATE) AS max_ship,
      |       ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
      |             / COUNT(*), 6) AS avg_qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
    def state(df: DataFrame): DataFrame = df.groupBy("l_suppkey").agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
      min(col("l_shipdate")).as("mn"),
      max(col("l_shipdate")).as("mx"))
    val zero = lit(0).cast("decimal(18,2)")
    val b = state(li.where(col("l_orderkey") % 10 < 8)).alias("b")
    val d = state(li.where(col("l_orderkey") % 10 >= 8)).alias("d")
    b.join(d, col("b.l_suppkey") === col("d.l_suppkey"), "full_outer")
      .select(
        coalesce(col("b.l_suppkey"), col("d.l_suppkey")).as("l_suppkey"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        round((coalesce(col("b.sq"), zero) + coalesce(col("d.sq"), zero))
          .cast("double"), 2).as("sum_qty"),
        least(col("b.mn"), col("d.mn")).cast("date").as("min_ship"),
        greatest(col("b.mx"), col("d.mx")).cast("date").as("max_ship"))
      .withColumn("avg_qty", round(col("sum_qty") / col("n"), 6))
      .orderBy("l_suppkey")
  }

  /** Synthetic AP placement for J11, all-integer so both engines derive
    * bit-identical coordinates: 20 cluster chains, members 0.003° of
    * latitude apart (≈333.6 m — inside the 500 m radius for adjacent
    * members, outside for |Δj| ≥ 2), cluster bases ≥ 9.2° of longitude
    * apart so chains never interact. Milli-degree integer coordinates
    * first, doubles derived once. The chain-walk term wraps mod 1000 so
    * lat_u < 101000 ⇒ |lat| ≤ 51.0° at ANY supplier count — the 3×3-cell
    * completeness proof (500 m ≤ 0.0079° of longitude at 51° < 0.01°)
    * is scale-invariant, not an artifact of small test tables. */
  private def apFrame(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey"),
      (expr("(s_suppkey % 20) * 4987 % 100000") +
        expr("(s_suppkey div 20) * 3 % 1000")).as("lat_u"),
      expr("(s_suppkey % 20) * 9203 % 200000").as("lon_u"))
      .select(
        col("s_suppkey"), col("lat_u"), col("lon_u"),
        (col("lat_u") * 0.001 - 50.0).as("lat"),
        (col("lon_u") * 0.001 - 100.0).as("lon"))

  /** J11 — spatial neighbor self-join via integer grid cells. Left side
    * keeps its own cell; right side explodes to the 3×3 neighborhood, so
    * the join is a plain equi-join on (cell_lat, cell_lon) — one shuffle,
    * output bounded by local density. A pair lands in exactly one candidate
    * cell (the left AP's own), so no post-join dedup is needed; the
    * haversine ≤ 500 m filter and s_suppkey ordering finish the job. The
    * oracle's all-pairs restatement makes hash-green a proof that the
    * bucketing misses nothing. */
  val j11GridNeighbors: Reg = Reg.sql(
    "j11_grid_neighbors",
    """WITH ap AS (
      |  -- 1e-3 (a DOUBLE literal) not 0.001 (a DECIMAL literal): DuckDB
      |  -- would otherwise derive the coordinate decimal-exact while Spark
      |  -- computes it in IEEE double, and the haversine inputs would drift.
      |  SELECT s_suppkey,
      |         ((s_suppkey % 20) * 4987 % 100000 + (s_suppkey // 20) * 3 % 1000)
      |           * 1e-3 - 50.0 AS lat,
      |         ((s_suppkey % 20) * 9203 % 200000) * 1e-3 - 100.0 AS lon
      |  FROM supplier)
      |SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
      |       ROUND(2 * 6371000 * ASIN(SQRT(
      |         POW(SIN(RADIANS(b.lat - a.lat) / 2), 2) +
      |         COS(RADIANS(a.lat)) * COS(RADIANS(b.lat)) *
      |         POW(SIN(RADIANS(b.lon - a.lon) / 2), 2))), 3) AS dist_m
      |FROM ap a JOIN ap b ON a.s_suppkey < b.s_suppkey
      |WHERE 2 * 6371000 * ASIN(SQRT(
      |        POW(SIN(RADIANS(b.lat - a.lat) / 2), 2) +
      |        COS(RADIANS(a.lat)) * COS(RADIANS(b.lat)) *
      |        POW(SIN(RADIANS(b.lon - a.lon) / 2), 2))) <= 500.0
      |ORDER BY supp_a, supp_b""".stripMargin) { (s, dir) =>
    val aps = apFrame(s, dir)
    val left = aps.select(
      col("s_suppkey").as("supp_a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
      expr("lat_u div 10").as("cell_lat"),
      expr("lon_u div 10").as("cell_lon"))
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
    val right = aps.select(
      col("s_suppkey").as("supp_b"), col("lat").as("lat_b"), col("lon").as("lon_b"),
      expr("lat_u div 10").as("bcell_lat"),
      expr("lon_u div 10").as("bcell_lon"),
      explode(offsets).as("o"))
      .select(col("supp_b"), col("lat_b"), col("lon_b"),
        (col("bcell_lat") + col("o.dy")).as("cell_lat"),
        (col("bcell_lon") + col("o.dx")).as("cell_lon"))
    val dist = Geo.haversineMeters(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b"))
    left.join(right, Seq("cell_lat", "cell_lon"))
      .where(col("supp_a") < col("supp_b") && dist <= 500.0)
      .select(col("supp_a"), col("supp_b"), round(dist, 3).as("dist_m"))
      .orderBy("supp_a", "supp_b")
  }

  /** J20 — kNN JOIN (radius-bounded): each AP's 3 nearest neighbors
    * within 500 m, exact. Same grid equi-join as j11 (left keeps its own
    * cell, right explodes to the 3×3 neighborhood — one shuffle, output
    * bounded by local density), but DIRECTED (a ≠ b, both orientations)
    * and finished with a per-probe ROW_NUMBER over the total
    * (distance, neighbor-key) order — never a global sort, never an
    * all-pairs distance pass. The radius bound is what makes grid-exact
    * kNN possible: a 500 m disk fits inside the 3×3 cell block at every
    * latitude in the frame, so the window ranks a complete candidate set
    * (the oracle's brute-force restatement proves it per run). Distances
    * are ranked on raw IEEE doubles (bit-identical haversine in both
    * engines — the j11 contract) and rounded only in the projection. */
  val j20KnnJoin: Reg = Reg.sql(
    "j20_knn_join",
    """WITH ap AS (
      |  SELECT s_suppkey,
      |         ((s_suppkey % 20) * 4987 % 100000 + (s_suppkey // 20) * 3 % 1000)
      |           * 1e-3 - 50.0 AS lat,
      |         ((s_suppkey % 20) * 9203 % 200000) * 1e-3 - 100.0 AS lon
      |  FROM supplier),
      |d AS (
      |  SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
      |         2 * 6371000 * ASIN(SQRT(
      |           POW(SIN(RADIANS(b.lat - a.lat) / 2), 2) +
      |           COS(RADIANS(a.lat)) * COS(RADIANS(b.lat)) *
      |           POW(SIN(RADIANS(b.lon - a.lon) / 2), 2))) AS dm
      |  FROM ap a JOIN ap b ON a.s_suppkey <> b.s_suppkey),
      |r AS (
      |  SELECT supp_a, supp_b, dm,
      |         ROW_NUMBER() OVER (PARTITION BY supp_a
      |                            ORDER BY dm, supp_b) AS rnk
      |  FROM d WHERE dm <= 500.0)
      |SELECT supp_a, CAST(rnk AS BIGINT) AS rnk, supp_b,
      |       ROUND(dm, 3) AS dist_m
      |FROM r WHERE rnk <= 3 ORDER BY supp_a, rnk""".stripMargin) { (s, dir) =>
    val aps = apFrame(s, dir)
    val left = aps.select(
      col("s_suppkey").as("supp_a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
      expr("lat_u div 10").as("cell_lat"),
      expr("lon_u div 10").as("cell_lon"))
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
    val right = aps.select(
      col("s_suppkey").as("supp_b"), col("lat").as("lat_b"), col("lon").as("lon_b"),
      expr("lat_u div 10").as("bcell_lat"),
      expr("lon_u div 10").as("bcell_lon"),
      explode(offsets).as("o"))
      .select(col("supp_b"), col("lat_b"), col("lon_b"),
        (col("bcell_lat") + col("o.dy")).as("cell_lat"),
        (col("bcell_lon") + col("o.dx")).as("cell_lon"))
    val dist = Geo.haversineMeters(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("supp_a").orderBy(col("dm"), col("supp_b"))
    left.join(right, Seq("cell_lat", "cell_lon"))
      .where(col("supp_a") =!= col("supp_b") && dist <= 500.0)
      .select(col("supp_a"), col("supp_b"), dist.as("dm"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= 3)
      .select(col("supp_a"), col("rnk"), col("supp_b"),
        round(col("dm"), 3).as("dist_m"))
      .orderBy("supp_a", "rnk")
  }

  /** O56 — CALIBRATION BINS (reliability diagram): the companion to
    * o29's AUC on the same score/label pair — ranking quality says
    * nothing about whether the SCORES mean what they say, which is what
    * a filtering threshold actually consumes. Scores collapse to
    * equal-width bins in one aggregate (bin domain, not row count);
    * observed positive rate and mean score per bin are integer ppm/milli
    * divisions (exact div — no float anywhere). At 100 TB: one map-side
    * partial aggregate over ~20 bins. */
  val o56CalibrationBins: Reg = Reg.sql(
    "o56_calibration_bins",
    """WITH s AS (
      |  SELECT CAST(FLOOR(value) AS BIGINT)
      |         + CASE WHEN event_type = 'purchase' THEN 50 ELSE 0 END AS sc,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events)
      |SELECT sc // 50 AS bin, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(y) AS BIGINT) AS n_pos,
      |       CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS obs_ppm,
      |       CAST(SUM(sc) * 1000 // COUNT(*) AS BIGINT) AS mean_score_milli
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(
        (expr("CAST(FLOOR(value) AS BIGINT)") +
          when(col("event_type") === "purchase", 50L).otherwise(0L)).as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(expr("sc div 50").as("bin"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("y").cast("bigint").as("n_pos"),
        expr("CAST(SUM(y) * 1000000 DIV COUNT(*) AS BIGINT)").as("obs_ppm"),
        expr("CAST(SUM(sc) * 1000 DIV COUNT(*) AS BIGINT)")
          .as("mean_score_milli"))
      .orderBy("bin")
  }

  /** J12 — fuzzy string join (edit distance ≤ 1) via q-gram prefix
    * filtering, the ed-join/ppjoin family (Gravano et al. q-gram count
    * bound; Chaudhuri/Xiao prefix principle): a single edit destroys at
    * most 2 of a string's distinct bigrams, so any lev≤1 pair shares all
    * but ≤2 of each side's bigram set — and under one global (frequency,
    * bigram) total order, two sets missing ≤2 of each other MUST collide
    * within their 3 rarest elements. Candidates therefore come from an
    * equi-join on each name's 3 rarest bigrams (rare ⇒ selective), then
    * exact levenshtein verifies — never an all-pairs compare. The DuckDB
    * oracle IS the all-pairs ground truth, so hash-green is a completeness
    * proof of the prefix filter on this corpus (the j11 pattern).
    *
    * Dirty probes are parts with one deterministically-deleted character;
    * the dictionary is the full part table. At 100 TB both sides shuffle
    * once on bigram keys; the frequency frame scales with the bigram
    * vocabulary (≤ alphabet², trivially broadcast). */
  val j12FuzzyJoin: Reg = Reg.sql(
    "j12_fuzzy_join",
    """WITH dirty AS (
      |  SELECT p_partkey AS d_key,
      |         substr(p_name, 1, CAST((p_partkey // 50) % length(p_name) AS INT))
      |           || substr(p_name,
      |                CAST((p_partkey // 50) % length(p_name) AS INT) + 2)
      |           AS nd
      |  FROM part WHERE p_partkey % 50 = 0)
      |SELECT d.d_key, c.p_partkey AS c_key,
      |       CAST(levenshtein(d.nd, c.p_name) AS BIGINT) AS dist
      |FROM dirty d JOIN part c
      |  ON abs(length(d.nd) - length(c.p_name)) <= 1
      | AND levenshtein(d.nd, c.p_name) <= 1
      |ORDER BY d_key, c_key""".stripMargin) { (s, dir) =>
    val part = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
    val dirty = part.where(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").as("d_key"),
        expr("""concat(
                |  substring(p_name, 1, CAST((p_partkey div 50) % length(p_name) AS INT)),
                |  substring(p_name, CAST((p_partkey div 50) % length(p_name) AS INT) + 2))
                |""".stripMargin).as("nd"))
    def grams(df: DataFrame, key: String, name: String): DataFrame =
      df.select(col(key), explode(expr(
        s"array_distinct(transform(sequence(1, length($name) - 1), i -> substring($name, i, 2)))"))
        .as("g"))
    // Dedup-before-expensive: every costly stage (rarity prefix window,
    // candidate join, levenshtein verify) runs on DISTINCT clean names;
    // id pairs re-expand only AFTER verification. Identical output — but
    // under duplicate-heavy data (the sf1 replica: every name ×10) the
    // verify workload drops by the duplicate multiplicity instead of
    // growing with its square. Any shared total order keeps the prefix
    // filter complete, so ranking by distinct-name frequency is sound.
    val cleanNames = part.select(col("p_name")).distinct()
    val cleanGrams = grams(cleanNames, "p_name", "p_name")
    val freq = cleanGrams.groupBy("g").agg(count(lit(1)).as("f"))
    def prefix(gramsDf: DataFrame, key: String): DataFrame = {
      val w = Window.partitionBy(key).orderBy(col("f").asc, col("g").asc)
      gramsDf.join(freq, Seq("g"), "left")
        .withColumn("f", coalesce(col("f"), lit(0L)))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 3)
        .select(col(key), col("g"))
    }
    val cand = prefix(grams(dirty, "d_key", "nd"), "d_key")
      .join(prefix(cleanGrams, "p_name"), Seq("g"))
      .select(col("d_key"), col("p_name")).distinct()
    cand
      .join(dirty, "d_key")
      .where(abs(length(col("nd")) - length(col("p_name"))) <= 1 &&
        levenshtein(col("nd"), col("p_name")) <= 1)
      .select(col("d_key"), col("p_name"),
        levenshtein(col("nd"), col("p_name")).cast("bigint").as("dist"))
      .join(part.select(col("p_partkey").as("c_key"), col("p_name")), "p_name")
      .select(col("d_key"), col("c_key"), col("dist"))
      .orderBy("d_key", "c_key")
  }

  /** O23 — first-order Markov transition counts over per-user event
    * streams: lag(event_type) under the (ts, event_id) total order, then
    * one count per (prev, cur) pair. The empirical transition matrix
    * behind journey modeling and next-event prediction; at 100 TB it is
    * one window shuffle on user_id plus a |types|²-row aggregate. */
  val o23TransitionMatrix: Reg = Reg.sql(
    "o23_transition_matrix",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         LAG(event_type) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS cur_type, COUNT(*) AS cnt
      |FROM e WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, cur_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("prev_type", "cur_type")
  }

  /** Distributed ROC-AUC (`RankMetrics.aucExact`) — the model-eval rank
    * statistic computed without any corpus-sized global sort: one distinct-
    * score aggregate, a domain-bounded bucket-offset window (broadcast), a
    * per-bucket parallel running sum, and the Mann-Whitney identity on
    * DOUBLED ranks so the average-rank tie convention stays in exact
    * BIGINTs. The synthetic "model" floors `value` and adds +50 for
    * purchases — a planted signal, so AUC lands strictly above ½ and the
    * gate exercises both the tie handling (floored scores collide heavily)
    * and the concordance arithmetic; the oracle restates the doubled-rank
    * algebra from a plain ordered window. */
  val o29Auc: Reg = Reg.sql(
    "o29_auc",
    """WITH s AS (
      |  SELECT CAST(FLOOR(value) AS BIGINT)
      |         + CASE WHEN event_type = 'purchase' THEN 50 ELSE 0 END AS sc,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (SELECT sc, CAST(COUNT(*) AS BIGINT) AS c,
      |             CAST(SUM(y) AS BIGINT) AS p
      |      FROM s GROUP BY sc),
      |o AS (SELECT sc, c, p,
      |             CAST(COALESCE(SUM(c) OVER (ORDER BY sc
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |                  0) AS BIGINT) AS cb
      |      FROM g),
      |t AS (SELECT CAST(SUM(p * (2 * cb + c + 1)) AS BIGINT) AS r2,
      |             CAST(SUM(p) AS BIGINT) AS n_pos,
      |             CAST(SUM(c - p) AS BIGINT) AS n_neg
      |      FROM o)
      |SELECT n_pos, n_neg,
      |       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
      |       CAST(CASE WHEN n_pos * n_neg > 0
      |                 THEN (r2 - n_pos * (n_pos + 1)) * 500000
      |                      // (n_pos * n_neg) END AS BIGINT) AS auc_ppm
      |FROM t""".stripMargin) { (s, dir) =>
    val scored = Tables.events(s, dir)
      .select(
        (expr("CAST(FLOOR(value) AS BIGINT)") +
          when(col("event_type") === "purchase", 50L).otherwise(0L)).as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
    graft.analytics.RankMetrics.aucExact(scored, "score", "label")
  }

  /** Per-slice AUC (`RankMetrics.aucExactBy`) — the model-eval matrix a
    * pipeline actually reports: one tie-aware exact AUC per segment, every
    * slice ranked independently and in parallel (the bucket-offset window
    * partitions by slice; no slice ever funnels to one partition). Slices
    * here are the deterministic user cohorts `user_id % 3`; same planted
    * +50 purchase signal as `o29_auc`, so every slice sits strictly above
    * ½ and slices differ only by sampling noise — exactly the dashboard a
    * per-source quality-classifier eval produces. */
  val o30SlicedAuc: Reg = Reg.sql(
    "o30_sliced_auc",
    """WITH s AS (
      |  SELECT user_id % 3 AS segment,
      |         CAST(FLOOR(value) AS BIGINT)
      |         + CASE WHEN event_type = 'purchase' THEN 50 ELSE 0 END AS sc,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (SELECT segment, sc, CAST(COUNT(*) AS BIGINT) AS c,
      |             CAST(SUM(y) AS BIGINT) AS p
      |      FROM s GROUP BY 1, 2),
      |o AS (SELECT segment, sc, c, p,
      |             CAST(COALESCE(SUM(c) OVER (PARTITION BY segment ORDER BY sc
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |                  0) AS BIGINT) AS cb
      |      FROM g),
      |t AS (SELECT segment, CAST(SUM(p * (2 * cb + c + 1)) AS BIGINT) AS r2,
      |             CAST(SUM(p) AS BIGINT) AS n_pos,
      |             CAST(SUM(c - p) AS BIGINT) AS n_neg
      |      FROM o GROUP BY segment)
      |SELECT segment, n_pos, n_neg,
      |       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
      |       CAST(CASE WHEN n_pos * n_neg > 0
      |                 THEN (r2 - n_pos * (n_pos + 1)) * 500000
      |                      // (n_pos * n_neg) END AS BIGINT) AS auc_ppm
      |FROM t ORDER BY segment""".stripMargin) { (s, dir) =>
    val scored = Tables.events(s, dir)
      .select(
        (col("user_id") % 3).as("segment"),
        (expr("CAST(FLOOR(value) AS BIGINT)") +
          when(col("event_type") === "purchase", 50L).otherwise(0L)).as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
    graft.analytics.RankMetrics
      .aucExactBy(scored, Seq("segment"), "score", "label")
      .orderBy("segment")
  }

  /** J16 — spatial join of points to a POLYGON TABLE (c9's single
    * geofence generalized to the dimension-table case): 20 non-convex
    * polygons — one template hexagon translated per region, the
    * tiles/per-market shape — joined to the event lattice through GRID
    * CELLS: each polygon explodes to the ≤4 cells covering its bbox, each
    * point hashes to its one cell, and the match is an equi-join on
    * (cx, cy) with the exact integer ray cast
    * ([[graft.functions.Geo.pointInPolygonT]]) as the residual — never a
    * nested loop over point × polygon. A point tests a polygon at most
    * once (points own ONE cell), so no post-join dedup. Coordinates are
    * shifted positive before the cell division so Spark's
    * truncate-toward-zero `div` and the oracle's floor division agree.
    * Zero-match regions survive via the left join (count 0, sum 0). */
  val j16PolygonJoin: Reg = Reg.sql(
    "j16_polygon_join",
    """WITH p AS (
      |  SELECT event_id,
      |         (((event_id * 13) % 2000) - 1000) * 1000 + (user_id % 997) AS px,
      |         (((event_id * 7) % 2000) - 1000) * 1000 + (user_id % 991) AS py
      |  FROM events),
      |r AS (SELECT range AS region,
      |             (range % 5) * 600000 - 1200000 AS dx,
      |             (range // 5) * 500000 - 750000 AS dy
      |      FROM range(20)),
      |v(i, x, y) AS (VALUES
      |  (0, -200000, -150000), (1, 225000, -175000), (2, 175000, 50000),
      |  (3, 25000, -25000), (4, 75000, 200000), (5, -150000, 125000)),
      |e AS (SELECT a.i, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      |      FROM v a JOIN v b ON b.i = (a.i + 1) % 6),
      |cand AS (
      |  SELECT r.region, r.dx, r.dy, p.event_id, p.px, p.py
      |  FROM r JOIN p ON p.px >= -200000 + r.dx AND p.px <= 225000 + r.dx
      |               AND p.py >= -175000 + r.dy AND p.py <= 200000 + r.dy),
      |k AS (
      |  SELECT region, event_id, px,
      |    SUM(CASE WHEN ((y1 + dy > py) <> (y2 + dy > py)) AND
      |             (CASE WHEN y2 - y1 > 0
      |                   THEN (px - (x1 + dx)) * (y2 - y1)
      |                          < (x2 - x1) * (py - (y1 + dy))
      |                   ELSE (px - (x1 + dx)) * (y2 - y1)
      |                          > (x2 - x1) * (py - (y1 + dy)) END)
      |             THEN 1 ELSE 0 END) AS c
      |  FROM cand, e GROUP BY region, event_id, px, py, dx, dy),
      |m AS (SELECT region, px FROM k WHERE c % 2 = 1)
      |SELECT r.region, CAST(COUNT(m.px) AS BIGINT) AS n_inside,
      |       CAST(COALESCE(SUM(m.px), 0) AS BIGINT) AS px_sum
      |FROM r LEFT JOIN m ON m.region = r.region
      |GROUP BY r.region ORDER BY r.region""".stripMargin) { (s, dir) =>
    val base = Seq((-200000L, -150000L), (225000L, -175000L),
      (175000L, 50000L), (25000L, -25000L), (75000L, 200000L),
      (-150000L, 125000L))
    val (bMinX, bMaxX) = (base.map(_._1).min, base.map(_._1).max)
    val (bMinY, bMaxY) = (base.map(_._2).min, base.map(_._2).max)
    val pts = Tables.events(s, dir).select(
      ((((col("event_id") * 13) % 2000) - 1000) * 1000 + (col("user_id") % 997))
        .as("px"),
      ((((col("event_id") * 7) % 2000) - 1000) * 1000 + (col("user_id") % 991))
        .as("py"))
      .withColumn("cx", expr("(px + 2000000) div 500000"))
      .withColumn("cy", expr("(py + 2000000) div 500000"))
    val polys = s.range(20).select(col("id").as("region"),
      expr("(id % 5) * 600000 - 1200000").as("dx"),
      expr("(id div 5) * 500000 - 750000").as("dy"))
    val polyCells = polys
      .withColumn("cx", explode(sequence(
        expr(s"($bMinX + dx + 2000000) div 500000"),
        expr(s"($bMaxX + dx + 2000000) div 500000"))))
      .withColumn("cy", explode(sequence(
        expr(s"($bMinY + dy + 2000000) div 500000"),
        expr(s"($bMaxY + dy + 2000000) div 500000"))))
    val matches = pts.join(polyCells, Seq("cx", "cy"))
      .where(Geo.pointInPolygonT(col("px"), col("py"),
        col("dx"), col("dy"), base))
      .groupBy("region")
      .agg(count(lit(1)).as("n_inside"), sum("px").as("px_sum"))
    polys.select("region").join(matches, Seq("region"), "left")
      .select(col("region"),
        coalesce(col("n_inside"), lit(0L)).as("n_inside"),
        coalesce(col("px_sum"), lit(0L)).as("px_sum"))
      .orderBy("region")
  }

  val all: Seq[Reg] = Seq(
    o18WindowFunnel, o19RetentionCohorts, a23IncrementalAgg, j11GridNeighbors,
    j12FuzzyJoin, j20KnnJoin, o23TransitionMatrix, o29Auc, o30SlicedAuc,
    o56CalibrationBins, j16PolygonJoin)
}
