package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 sixth wave: robust/rank statistics the drift and QA families
  * still lacked, each built on the engine's exact-integer discipline.
  *
  *  - O49 Kendall tau-b — the RANK correlation next to o47's Pearson
  *    matrix. Never ranks rows: counts collapse to the (x, y) VALUE
  *    DOMAIN first (≤ |dom(x)|·|dom(y)| cells, independent of row count),
  *    concordant/discordant mass comes from a cell-level self-join, and
  *    every term (nc, nd, tie corrections) is an exact integer in
  *    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); tau-b is evaluated from
  *    those integers with one identical IEEE expression in both engines.
  *  - O50 seasonal decomposition (STL-lite) — classical weekly
  *    decomposition of the daily revenue series: centered 7-day moving
  *    average trend, day-of-week seasonal indices from the detrended
  *    remainder. The corpus collapses to the DAY domain in one aggregate
  *    (30 rows here; 3 650 for a decade of data — calendar-bounded, not
  *    volume-bounded), so the unpartitioned trend window is a non-issue
  *    at any scale. Detrending is kept exact by working on 7× cents
  *    (7·daily − Σwindow) so no division happens before the final select.
  *  - O51 hash-bootstrap confidence interval — B=32 bootstrap replicas of
  *    the per-type mean, RNG-free: each (row, replica) draws a Poisson(1)
  *    resample weight through the integer Knuth-hash uniform (the
  *    llm_weighted_sample trick) against floor(CDF·2³¹) thresholds, so
  *    the resample is reproducible across runs, partitionings, and
  *    engines. One map-side ×32 explode into ONE shuffle of
  *    |types|·32 groups; replica means are ranked per type and the
  *    2nd/31st order statistics bracket the interval. At 100 TB this is
  *    a single pass with map-side partial aggregation — the plan a
  *    driver-side resampling loop could never match.
  */
object RobustStatsQueries {

  /** Poisson(1) CDF at k = 0..5, scaled by 2^31 and floored — the
    * inverse-CDF thresholds for the deterministic bootstrap weights.
    * P(X>6) ≈ 8e-5 mass collapses onto w=6 (both engines identically). */
  private val poissonT = Seq(790015084L, 1580030168L, 1975037710L,
    2106706891L, 2139624186L, 2146207645L)

  /** O49 — KENDALL TAU-B between l_quantity and the discount lattice,
    * per return flag. The whole corpus collapses to joint value-domain
    * counts (≤ 50·11 cells per flag); concordance mass is a cell×cell
    * self-join on that domain frame (broadcast, scale-free), tie terms
    * come from the marginals, and
    * tau_b = 2(nc−nd)/sqrt((P−Tx)(P−Ty)) with P=n(n−1), Tx=Σcx(cx−1)
    * evaluates from exact integers — the doubled-pair form avoids every
    * /2 so nothing ever leaves the integer lattice before the one final
    * IEEE expression. */
  val o49KendallTau: Reg = Reg.sql(
    "o49_kendall_tau",
    """WITH cells AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
      |         CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
      |         CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2, 3),
      |conc AS (
      |  SELECT a.flag,
      |         SUM(CASE WHEN a.y < b.y
      |                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS nc,
      |         SUM(CASE WHEN a.y > b.y
      |                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS nd
      |  FROM cells a JOIN cells b ON a.flag = b.flag AND a.x < b.x
      |  GROUP BY a.flag),
      |mx AS (SELECT flag, SUM(CAST(cx AS HUGEINT) * (cx - 1)) AS tx2
      |       FROM (SELECT flag, x, SUM(c) AS cx FROM cells GROUP BY 1, 2)
      |       GROUP BY flag),
      |my AS (SELECT flag, SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS ty2
      |       FROM (SELECT flag, y, SUM(c) AS cy FROM cells GROUP BY 1, 2)
      |       GROUP BY flag),
      |nn AS (SELECT flag, SUM(c) AS n FROM cells GROUP BY flag)
      |SELECT nn.flag, CAST(nn.n AS BIGINT) AS n,
      |       CAST(conc.nc AS BIGINT) AS nc, CAST(conc.nd AS BIGINT) AS nd,
      |       CAST(FLOOR(1000000.0 * (2 * CAST(conc.nc - conc.nd AS DOUBLE)) /
      |             SQRT(CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) - mx.tx2 AS DOUBLE) *
      |                  CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) - my.ty2 AS DOUBLE))) AS BIGINT)
      |         AS tau_micro
      |FROM nn JOIN conc ON nn.flag = conc.flag
      |        JOIN mx ON nn.flag = mx.flag
      |        JOIN my ON nn.flag = my.flag
      |ORDER BY nn.flag""".stripMargin) { (s, dir) =>
    def dec(e: Column) = e.cast("decimal(38,0)")
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").cast("bigint").as("x"),
        round(col("l_discount") * 100).cast("bigint").as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // domain-sized (≤ 550 cells per flag); reused 4×
    val a = cells.select(col("flag"), col("x").as("xa"), col("y").as("ya"),
      col("c").as("ca"))
    val b = cells.select(col("flag"), col("x").as("xb"), col("y").as("yb"),
      col("c").as("cb"))
    val conc = a.join(b, Seq("flag")).where(col("xa") < col("xb"))
      .groupBy("flag")
      .agg(
        sum(when(col("ya") < col("yb"), dec(col("ca") * col("cb")))
          .otherwise(dec(lit(0)))).as("nc"),
        sum(when(col("ya") > col("yb"), dec(col("ca") * col("cb")))
          .otherwise(dec(lit(0)))).as("nd"))
    val mxf = cells.groupBy("flag", "x").agg(sum("c").as("cx"))
      .groupBy("flag").agg(sum(dec(col("cx") * (col("cx") - 1))).as("tx2"))
    val myf = cells.groupBy("flag", "y").agg(sum("c").as("cy"))
      .groupBy("flag").agg(sum(dec(col("cy") * (col("cy") - 1))).as("ty2"))
    val nn = cells.groupBy("flag").agg(sum("c").as("n"))
    val p2 = dec(col("n")) * (col("n") - 1)
    nn.join(conc, "flag").join(mxf, "flag").join(myf, "flag")
      .select(col("flag"), col("n").cast("bigint").as("n"),
        col("nc").cast("bigint").as("nc"), col("nd").cast("bigint").as("nd"),
        floor(lit(1000000.0) * (lit(2) * (col("nc") - col("nd")).cast("double")) /
          sqrt((p2 - col("tx2")).cast("double") *
            (p2 - col("ty2")).cast("double"))).cast("bigint").as("tau_micro"))
      .orderBy("flag")
  }

  /** O50 — SEASONAL DECOMPOSITION of daily revenue (classical weekly
    * model): trend = centered 7-day moving average (full windows only),
    * seasonal index per day-of-week = mean detrended remainder. dow is
    * epoch-day mod 7 (engine-neutral — both SQL dialects disagree on
    * week-start conventions, the epoch lattice doesn't). The corpus
    * collapses to the day domain in the first aggregate; everything
    * after runs on a calendar-sized frame. Remainders stay on the exact
    * 7×cents lattice (7·daily − Σ₇) until the single final division. */
  val o50SeasonalDecompose: Reg = Reg.sql(
    "o50_seasonal_decompose",
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |win AS (
      |  SELECT d, cents,
      |         SUM(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
      |         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      |  FROM daily)
      |SELECT d % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |       CAST(SUM(7 * cents - s7) AS BIGINT) AS det7_sum,
      |       FLOOR(CAST(SUM(7 * cents - s7) AS DOUBLE) /
      |             (7.0 * CAST(COUNT(*) AS DOUBLE)) * 1e4) / 1e4 AS seasonal_cents
      |FROM win WHERE c7 = 7
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01"))
        .cast("bigint").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint")
        .as("cents"))
    // calendar-domain frame: the unpartitioned window is days-sized
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val win = daily
      .withColumn("s7", sum("cents").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .where(col("c7") === 7)
      .withColumn("det7", lit(7) * col("cents") - col("s7"))
    win.groupBy((col("d") % 7).as("dow"))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum("det7").cast("bigint").as("det7_sum"),
        (floor(sum("det7").cast("double") /
          (lit(7.0) * count(lit(1)).cast("double")) * 1e4) / 1e4)
          .as("seasonal_cents"))
      .orderBy("dow")
  }

  /** O51 — HASH-BOOTSTRAP confidence interval for the per-type mean
    * event value: 32 deterministic Poisson(1) resamples (weights from
    * the integer Knuth-hash uniform of (event_id, replica), thresholded
    * at floor(CDF·2³¹) — reproducible across engines, runs and
    * partitionings), replica means ranked per type, the 2nd and 31st
    * order statistics reported as the ~94% central bracket. ONE pass:
    * map-side ×32 explode straight into a (type, replica) partial
    * aggregate — 160 groups total — then a 32-row window per type. */
  val o51BootstrapCi: Reg = Reg.sql(
    "o51_bootstrap_ci",
    s"""WITH rep AS (
      |  SELECT e.event_type, g.b,
      |         CAST(ROUND(e.value * 100) AS BIGINT) AS cents,
      |         ((e.event_id * (2 * g.b + 3)) % 2147483648) * 2654435761 %
      |           2147483648 AS u
      |  FROM events e CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) g),
      |wtd AS (
      |  SELECT event_type, b, cents,
      |         CASE WHEN u < ${poissonT(0)} THEN 0
      |              WHEN u < ${poissonT(1)} THEN 1
      |              WHEN u < ${poissonT(2)} THEN 2
      |              WHEN u < ${poissonT(3)} THEN 3
      |              WHEN u < ${poissonT(4)} THEN 4
      |              WHEN u < ${poissonT(5)} THEN 5
      |              ELSE 6 END AS w
      |  FROM rep),
      |means AS (
      |  SELECT event_type, b,
      |         CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_b
      |  FROM wtd GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, mean_b,
      |         ROW_NUMBER() OVER (PARTITION BY event_type
      |                            ORDER BY mean_b, b) AS rn
      |  FROM means),
      |full_m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) /
      |           CAST(COUNT(*) AS DOUBLE) AS mean_c
      |  FROM events GROUP BY 1)
      |SELECT f.event_type, f.n, FLOOR(f.mean_c * 1e4) / 1e4 AS mean_cents,
      |       FLOOR(MAX(CASE WHEN r.rn = 2 THEN r.mean_b END) * 1e4) / 1e4 AS lo_cents,
      |       FLOOR(MAX(CASE WHEN r.rn = 31 THEN r.mean_b END) * 1e4) / 1e4 AS hi_cents
      |FROM full_m f JOIN ranked r ON f.event_type = r.event_type
      |GROUP BY f.event_type, f.n, f.mean_c
      |ORDER BY f.event_type""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir).select(col("event_type"), col("event_id"),
      round(col("value") * 100).cast("bigint").as("cents"))
    val rep = e.withColumn("b", explode(sequence(lit(0L), lit(31L))))
      .withColumn("u",
        (col("event_id") * (lit(2L) * col("b") + 3L)) % 2147483648L *
          2654435761L % 2147483648L)
    val w = poissonT.zipWithIndex.foldRight(lit(6): Column) {
      case ((t, k), acc) => when(col("u") < t, lit(k)).otherwise(acc)
    }
    val means = rep.withColumn("w", w)
      .groupBy("event_type", "b")
      .agg((sum(col("w") * col("cents")).cast("double") /
        sum("w").cast("double")).as("mean_b"))
    val ranked = means.withColumn("rn", row_number().over(
      Window.partitionBy("event_type").orderBy(col("mean_b"), col("b"))))
    val fullM = e.groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        (sum("cents").cast("double") / count(lit(1)).cast("double"))
          .as("mean_c"))
    fullM.join(ranked, "event_type")
      .groupBy(col("event_type"), col("n"), col("mean_c"))
      .agg(
        (floor(max(when(col("rn") === 2, col("mean_b"))) * 1e4) / 1e4)
          .as("lo_cents"),
        (floor(max(when(col("rn") === 31, col("mean_b"))) * 1e4) / 1e4)
          .as("hi_cents"))
      .select(col("event_type"), col("n"),
        (floor(col("mean_c") * 1e4) / 1e4).as("mean_cents"),
        col("lo_cents"), col("hi_cents"))
      .orderBy("event_type")
  }

  /** O52 — WELCH'S t-TEST between every event-type pair's value
    * distribution — the unequal-variance complement of the MWU/KS/chi²
    * family. One corpus pass collapses everything to a 5-row exact
    * moment frame (n, Σc, Σc² per type, sums in DECIMAL(38,0)/HUGEINT);
    * the t statistic and Welch–Satterthwaite df evaluate from those
    * integers on the driver (the o47 pattern: BigInteger→double is
    * correctly rounded, bit-matching DuckDB's HUGEINT cast), with the
    * identical IEEE expression shape in both engines, floor-quantized to
    * micros. At 100 TB: one aggregate with map-side partials; the pair
    * stage is |types|²-sized, data-free. */
  val o52WelchTtest: Reg = Reg.sql(
    "o52_welch_ttest",
    """WITH v AS (SELECT event_type AS ty,
      |                  CAST(ROUND(value * 100) AS BIGINT) AS c
      |           FROM events),
      |m AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n,
      |             SUM(CAST(c AS HUGEINT)) AS s1,
      |             SUM(CAST(c AS HUGEINT) * c) AS s2
      |      FROM v GROUP BY ty),
      |p AS (SELECT a.ty AS ta, b.ty AS tb,
      |             a.n AS na, b.n AS nb,
      |             CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
      |             CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
      |             CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE) /
      |               CAST(a.n * (a.n - 1) AS DOUBLE) AS va,
      |             CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE) /
      |               CAST(b.n * (b.n - 1) AS DOUBLE) AS vb
      |      FROM m a JOIN m b ON a.ty < b.ty),
      |r AS (SELECT ta, tb, na, nb, ma, mb,
      |             va / CAST(na AS DOUBLE) AS ra,
      |             vb / CAST(nb AS DOUBLE) AS rb
      |      FROM p)
      |SELECT ta, tb, na AS n_a, nb AS n_b,
      |       CAST(FLOOR(1000000.0 * (ma - mb) / SQRT(ra + rb)) AS BIGINT)
      |         AS t_micro,
      |       CAST(FLOOR(1000000.0 * (ra + rb) * (ra + rb) /
      |            (ra * ra / CAST(na - 1 AS DOUBLE) +
      |             rb * rb / CAST(nb - 1 AS DOUBLE))) AS BIGINT) AS df_micro
      |FROM r ORDER BY ta, tb""".stripMargin) { (s, dir) =>
    def dec(e: Column) = e.cast("decimal(38,0)")
    val m = Tables.events(s, dir)
      .select(col("event_type").as("ty"),
        round(col("value") * 100).cast("bigint").as("c"))
      .groupBy("ty")
      .agg(count(lit(1)).as("n"), sum(dec(col("c"))).as("s1"),
        sum(dec(col("c") * col("c"))).as("s2"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger)))
      .sortBy(_._1)
    val rows = for {
      (ta, na, s1a, s2a) <- m.toSeq
      (tb, nb, s1b, s2b) <- m.toSeq if ta < tb
    } yield {
      val ma = s1a.bigInteger.doubleValue / na.toDouble
      val mb = s1b.bigInteger.doubleValue / nb.toDouble
      val va = (BigInt(na) * s2a - s1a * s1a).bigInteger.doubleValue /
        (na * (na - 1)).toDouble
      val vb = (BigInt(nb) * s2b - s1b * s1b).bigInteger.doubleValue /
        (nb * (nb - 1)).toDouble
      val ra = va / na.toDouble
      val rb = vb / nb.toDouble
      val t = math.floor(1000000.0 * (ma - mb) / math.sqrt(ra + rb)).toLong
      val df = math.floor(1000000.0 * (ra + rb) * (ra + rb) /
        (ra * ra / (na - 1).toDouble + rb * rb / (nb - 1).toDouble)).toLong
      (ta, tb, na, nb, t, df)
    }
    import s.implicits._
    rows.toDF("ta", "tb", "n_a", "n_b", "t_micro", "df_micro")
      .orderBy("ta", "tb")
  }

  /** O53 — KMV DISTINCT-SKETCH SET ALGEBRA: union and intersection
    * cardinality ESTIMATES for every event-type pair from k=64 minimum
    * hash values per type, next to o27's single-set KMV. RNG-free (the
    * Knuth-hash uniform on user_id — the same hash across types is what
    * makes intersection estimable) and mergeable: sketches union by
    * keeping the k smallest of the combined values, θ = the k-th, so
    * û = (k−1)·2³¹/θ and î = (matched/k)·û — the Beyer et al. KMV
    * estimator. Sketch build is a salted two-phase min-k (16-way
    * parallel per type, exact — the llm_tfidf_terms lesson); after it,
    * every pair stage runs on ≤ 2k-row frames. Exact counterparts ride
    * along so the output is its own error report. At 100 TB the sketch
    * IS the point: per-type state is k values regardless of cardinality. */
  val o53KmvSetOps: Reg = Reg.sql(
    "o53_kmv_set_ops",
    """WITH du AS (SELECT DISTINCT event_type AS ty, user_id AS u FROM events),
      |h AS (SELECT ty, u,
      |             ((u % 2147483648) * 2654435761) % 2147483648 AS hv
      |      FROM du),
      |sk AS (SELECT ty, hv,
      |              ROW_NUMBER() OVER (PARTITION BY ty ORDER BY hv) AS r
      |       FROM h),
      |s64 AS (SELECT ty, hv FROM sk WHERE r <= 64),
      |types AS (SELECT DISTINCT ty FROM du),
      |pairs AS (SELECT a.ty AS ta, b.ty AS tb
      |          FROM types a JOIN types b ON a.ty < b.ty),
      |comb AS (
      |  SELECT p.ta, p.tb, s.hv,
      |         MAX(CASE WHEN s.ty = p.ta THEN 1 ELSE 0 END) AS in_a,
      |         MAX(CASE WHEN s.ty = p.tb THEN 1 ELSE 0 END) AS in_b
      |  FROM pairs p JOIN s64 s ON s.ty = p.ta OR s.ty = p.tb
      |  GROUP BY 1, 2, 3),
      |rk AS (SELECT ta, tb, hv, in_a, in_b,
      |              ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS r
      |       FROM comb),
      |est AS (
      |  SELECT ta, tb,
      |         MAX(CASE WHEN r = 64 THEN hv END) AS theta,
      |         CAST(SUM(CASE WHEN r <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS kp,
      |         CAST(SUM(CASE WHEN r <= 64 AND in_a = 1 AND in_b = 1
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS matched
      |  FROM rk GROUP BY 1, 2),
      |ex AS (
      |  SELECT p.ta, p.tb,
      |         CAST(COUNT(DISTINCT d.u) AS BIGINT) AS exact_u,
      |         CAST(SUM(CASE WHEN d.both = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS exact_i
      |  FROM pairs p JOIN (
      |    SELECT ta2, tb2, u, COUNT(DISTINCT ty) AS both FROM (
      |      SELECT p2.ta AS ta2, p2.tb AS tb2, d2.u, d2.ty
      |      FROM pairs p2 JOIN du d2 ON d2.ty = p2.ta OR d2.ty = p2.tb)
      |    GROUP BY 1, 2, 3) d
      |    ON d.ta2 = p.ta AND d.tb2 = p.tb
      |  GROUP BY 1, 2)
      |SELECT e.ta, e.tb, x.exact_u, x.exact_i,
      |       CASE WHEN e.kp >= 64 THEN
      |         CAST(FLOOR(63.0 * 2147483648.0 / CAST(e.theta AS DOUBLE))
      |           AS BIGINT)
      |       ELSE e.kp END AS union_est,
      |       CASE WHEN e.kp >= 64 THEN
      |         CAST(FLOOR(CAST(e.matched AS DOUBLE) / 64.0 *
      |              (63.0 * 2147483648.0 / CAST(e.theta AS DOUBLE)))
      |           AS BIGINT)
      |       ELSE e.matched END AS inter_est
      |FROM est e JOIN ex x ON e.ta = x.ta AND e.tb = x.tb
      |ORDER BY e.ta, e.tb""".stripMargin) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("event_type").as("ty"), col("user_id").as("u")).distinct()
      .localCheckpoint() // entity-domain frame, reused by sketch + exact
    val h = du.withColumn("hv",
      (col("u") % 2147483648L) * 2654435761L % 2147483648L)
    // salted two-phase min-k: per-(type, salt) top-64 first, exact
    val pre = h.withColumn("salt", pmod(col("u"), lit(16)))
      .withColumn("r0", row_number().over(Window.partitionBy("ty", "salt")
        .orderBy("hv")))
      .where(col("r0") <= 64)
    val s64 = pre.withColumn("r", row_number().over(
      Window.partitionBy("ty").orderBy("hv")))
      .where(col("r") <= 64)
      .select("ty", "hv")
    val types = du.select(col("ty")).distinct()
    val pairs = types.as("a").join(types.as("b"), col("a.ty") < col("b.ty"))
      .select(col("a.ty").as("ta"), col("b.ty").as("tb"))
    val comb = pairs.join(s64, col("ty") === col("ta") || col("ty") === col("tb"))
      .groupBy("ta", "tb", "hv")
      .agg(max(when(col("ty") === col("ta"), 1).otherwise(0)).as("in_a"),
        max(when(col("ty") === col("tb"), 1).otherwise(0)).as("in_b"))
    val rk = comb.withColumn("r", row_number().over(
      Window.partitionBy("ta", "tb").orderBy("hv")))
    val est = rk.groupBy("ta", "tb")
      .agg(max(when(col("r") === 64, col("hv"))).as("theta"),
        sum(when(col("r") <= 64, 1).otherwise(0)).cast("bigint").as("kp"),
        sum(when(col("r") <= 64 && col("in_a") === 1 && col("in_b") === 1, 1)
          .otherwise(0)).cast("bigint").as("matched"))
    val perUser = pairs.join(du, col("ty") === col("ta") || col("ty") === col("tb"))
      .groupBy("ta", "tb", "u")
      .agg(countDistinct("ty").as("both"))
    val ex = perUser.groupBy("ta", "tb")
      .agg(countDistinct("u").cast("bigint").as("exact_u"),
        sum(when(col("both") === 2, 1).otherwise(0)).cast("bigint")
          .as("exact_i"))
    // Beyer et al. fallback: a sketch that never filled (k' < k) holds the
    // ENTIRE union, so the estimate degrades gracefully to the exact
    // counts instead of going NULL through a missing θ.
    val uEst = lit(63.0) * 2147483648.0 / col("theta").cast("double")
    est.join(ex, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("exact_u"), col("exact_i"),
        when(col("kp") >= 64, floor(uEst).cast("bigint"))
          .otherwise(col("kp")).as("union_est"),
        when(col("kp") >= 64,
          floor(col("matched").cast("double") / 64.0 * uEst).cast("bigint"))
          .otherwise(col("matched")).as("inter_est"))
      .orderBy("ta", "tb")
  }

  /** O54 — TIME-SERIES RESAMPLING with linear interpolation: each
    * event type's irregular (ts, cents) series resampled onto the
    * hourly grid strictly inside its observed span, every grid value
    * interpolated between the nearest events on each side — the
    * align-sensors-to-a-grid primitive next to o14's forward-fill.
    * The anchors come from ONE union + two windows (events and grid
    * rows interleaved per type in (us, is_grid) order; last/first with
    * ignoreNulls — never a per-grid-point join), so cost is
    * O((events + grid)·log) per type partition. The lerp numerator
    * stays in exact integers (≤ 2⁵³, cents × µs-gap), one double
    * division at the end, floor-quantized to micros. */
  val o54ResampleInterp: Reg = Reg.sql(
    "o54_resample_interp",
    """WITH pt AS (SELECT event_type AS ty, epoch_us(ts) AS us,
      |                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |                     AS c
      |            FROM events GROUP BY 1, 2),
      |bounds AS (SELECT ty, MIN(us) AS lo, MAX(us) AS hi FROM pt GROUP BY ty),
      |grid AS (
      |  SELECT ty, unnest(generate_series(lo // 3600000000 + 1,
      |                                    (hi - 1) // 3600000000)) AS hh
      |  FROM bounds),
      |uni AS (
      |  SELECT ty, us, c, 0 AS is_grid, CAST(NULL AS BIGINT) AS hh FROM pt
      |  UNION ALL
      |  SELECT ty, hh * 3600000000 AS us, CAST(NULL AS BIGINT) AS c,
      |         1 AS is_grid, hh
      |  FROM grid),
      |w AS (
      |  SELECT ty, us, is_grid, hh,
      |         LAST_VALUE(c IGNORE NULLS) OVER
      |           (PARTITION BY ty ORDER BY us, is_grid
      |            ROWS UNBOUNDED PRECEDING) AS vp,
      |         LAST_VALUE(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER
      |           (PARTITION BY ty ORDER BY us, is_grid
      |            ROWS UNBOUNDED PRECEDING) AS up,
      |         FIRST_VALUE(c IGNORE NULLS) OVER
      |           (PARTITION BY ty ORDER BY us, is_grid
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
      |         FIRST_VALUE(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER
      |           (PARTITION BY ty ORDER BY us, is_grid
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS un
      |  FROM uni)
      |SELECT ty, hh,
      |       CAST(FLOOR(1000000.0 *
      |         CAST(vp * (un - us) + vn * (us - up) AS DOUBLE) /
      |         CAST(un - up AS DOUBLE)) AS BIGINT) AS v_micro
      |FROM w WHERE is_grid = 1
      |ORDER BY ty, hh""".stripMargin) { (s, dir) =>
    val pt = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"),
        unix_micros(col("ts")).as("us"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
    val bounds = pt.groupBy("ty").agg(min("us").as("lo"), max("us").as("hi"))
    // Guard the grid: Spark's sequence(start, stop) DESCENDS when
    // start > stop (DuckDB's generate_series returns empty), so a type
    // whose span covers no interior hour boundary must drop out here
    // rather than emit out-of-span grid rows.
    val grid = bounds
      .where(expr("lo div 3600000000") + 1 <= expr("(hi - 1) div 3600000000"))
      .select(col("ty"),
        explode(sequence(expr("lo div 3600000000") + 1,
          expr("(hi - 1) div 3600000000"))).as("hh"))
    val uni = pt.select(col("ty"), col("us"), col("c"),
      lit(0).as("is_grid"), lit(null).cast("bigint").as("hh"))
      .unionByName(grid.select(col("ty"),
        (col("hh") * 3600000000L).as("us"),
        lit(null).cast("bigint").as("c"), lit(1).as("is_grid"), col("hh")))
    val back = Window.partitionBy("ty").orderBy("us", "is_grid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("ty").orderBy("us", "is_grid")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val w = uni
      .withColumn("vp", last(col("c"), ignoreNulls = true).over(back))
      .withColumn("up", last(when(col("is_grid") === 0, col("us")),
        ignoreNulls = true).over(back))
      .withColumn("vn", first(col("c"), ignoreNulls = true).over(fwd))
      .withColumn("un", first(when(col("is_grid") === 0, col("us")),
        ignoreNulls = true).over(fwd))
    w.where(col("is_grid") === 1)
      .select(col("ty"), col("hh"),
        floor(lit(1000000.0) *
          (col("vp") * (col("un") - col("us")) +
            col("vn") * (col("us") - col("up"))).cast("double") /
          (col("un") - col("up")).cast("double")).cast("bigint").as("v_micro"))
      .orderBy("ty", "hh")
  }

  /** O55 — SEASONAL ANOMALY DETECTION: o50's decomposition turned into
    * a detector. Each full-window day's detrended revenue (7×cents
    * lattice) is z-tested against its OWN day-of-week population, and
    * the z² > 4 flag is evaluated ENTIRELY in exact integers via the
    * cross-multiplied form (n·x − Σ)²·(n−1) > 4·n·(nΣx² − Σ²) — no
    * division, no sqrt, no float anywhere (DECIMAL(38,0)/HUGEINT), so
    * the flag cannot flip between engines. The corpus collapses to the
    * day domain first; everything after is calendar-sized. At 100 TB
    * this is the daily-KPI anomaly page: one aggregate pass plus
    * metadata-scale math. */
  val o55SeasonalAnomaly: Reg = Reg.sql(
    "o55_seasonal_anomaly",
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |win AS (
      |  SELECT d, cents,
      |         SUM(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
      |         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      |  FROM daily),
      |det AS (SELECT d, d % 7 AS dow, 7 * cents - s7 AS x FROM win WHERE c7 = 7),
      |m AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
      |             SUM(CAST(x AS HUGEINT)) AS s1,
      |             SUM(CAST(x AS HUGEINT) * x) AS s2
      |      FROM det GROUP BY dow)
      |SELECT det.d AS day, det.dow, CAST(det.x AS BIGINT) AS det7,
      |       CAST(CASE WHEN (m.n * det.x - m.s1) * (m.n * det.x - m.s1) *
      |                      (m.n - 1) > 4 * m.n * (m.n * m.s2 - m.s1 * m.s1)
      |                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM det JOIN m ON det.dow = m.dow
      |ORDER BY day""".stripMargin) { (s, dir) =>
    def dec(e: Column) = e.cast("decimal(38,0)")
    val daily = Tables.events(s, dir)
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01"))
        .cast("bigint").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint")
        .as("cents"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val det = daily
      .withColumn("s7", sum("cents").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .where(col("c7") === 7)
      .select(col("d"), (col("d") % 7).as("dow"),
        (lit(7) * col("cents") - col("s7")).as("x"))
      .localCheckpoint() // calendar-sized; reused for moments + flags
    val m = det.groupBy("dow")
      .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("s1"),
        sum(dec(col("x")) * col("x")).as("s2"))
    val devN = dec(col("n")) * col("x") - col("s1")
    det.join(m, "dow")
      .select(col("d").as("day"), col("dow"), col("x").cast("bigint").as("det7"),
        when(devN * devN * (col("n") - 1) >
          lit(4) * col("n") * (dec(col("n")) * col("s2") - col("s1") * col("s1")),
          1L).otherwise(0L).cast("bigint").as("is_anomaly"))
      .orderBy("day")
  }

  /** O57 — GROUP-SEQUENTIAL SPRT (Wald's sequential probability ratio
    * test, the early-stopping engine behind industrial A/B platforms):
    * is the purchase share above p₁ or below p₀? Row-at-a-time SPRT is
    * inherently sequential — the scale-correct industrial form walks
    * BATCH increments, so the corpus collapses to hourly (trials,
    * successes) counts in one aggregate and the log-likelihood walk runs
    * on the calendar-sized frame. Increments are the frozen integer-
    * micro constants floor(ln(p₁/p₀)·1e6)/floor(ln(q₁/q₀)·1e6), so the
    * cumulative LLR is an exact integer and the first crossing of the
    * Wald bounds ln(19)=±2.944439 (α=β=0.05) is engine-exact. Two
    * one-sided tests bracket the true ~0.20 share: the 0.17→0.19 test
    * must accept H1, the 0.21→0.23 test must accept H0 — each at its
    * recorded hour with its recorded sample size, the "how fast could
    * we have stopped" number sequential testing exists for. */
  val o57Sprt: Reg = Reg.sql(
    "o57_sprt",
    """WITH hourly AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h,
      |         CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS s
      |  FROM events GROUP BY 1),
      |tests(test, a, b) AS (VALUES ('upper', 111225, -24392),
      |                             ('lower', 90971, -25643)),
      |walk AS (
      |  SELECT t.test, h.h,
      |         SUM(h.s * t.a + (h.n - h.s) * t.b)
      |           OVER (PARTITION BY t.test ORDER BY h.h) AS llr,
      |         SUM(h.n) OVER (PARTITION BY t.test ORDER BY h.h) AS n_cum
      |  FROM tests t CROSS JOIN hourly h),
      |crossed AS (
      |  SELECT test, h, llr, n_cum,
      |         ROW_NUMBER() OVER (PARTITION BY test ORDER BY h) AS rn
      |  FROM walk WHERE llr >= 2944438 OR llr <= -2944439)
      |SELECT test,
      |       CASE WHEN llr >= 2944438 THEN 'accept_h1' ELSE 'accept_h0' END
      |         AS decision,
      |       CAST(h AS BIGINT) AS dec_hour, CAST(n_cum AS BIGINT) AS n_at_dec,
      |       CAST(llr AS BIGINT) AS llr_micro
      |FROM crossed WHERE rn = 1 ORDER BY test""".stripMargin) { (s, dir) =>
    val hourly = Tables.events(s, dir)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("s"))
    import s.implicits._
    val tests = Seq(("upper", 111225L, -24392L), ("lower", 90971L, -25643L))
      .toDF("test", "a", "b")
    val w = Window.partitionBy("test").orderBy("h")
    val walk = broadcast(tests).crossJoin(hourly)
      .withColumn("llr", sum(col("s") * col("a") +
        (col("n") - col("s")) * col("b")).over(w))
      .withColumn("n_cum", sum("n").over(w))
    walk.where(col("llr") >= 2944438L || col("llr") <= -2944439L)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("test"),
        when(col("llr") >= 2944438L, "accept_h1").otherwise("accept_h0")
          .as("decision"),
        col("h").cast("bigint").as("dec_hour"),
        col("n_cum").cast("bigint").as("n_at_dec"),
        col("llr").cast("bigint").as("llr_micro"))
      .orderBy("test")
  }

  /** O58 — HODGES–LEHMANN location estimator per event type: the median
    * of all Walsh averages (pairwise means, i ≤ j) of the DAILY totals —
    * the robust location companion to o52's Welch mean (30% breakdown,
    * ~95% efficiency at the normal). The corpus collapses to the DAY
    * domain first (calendar-bounded — same o50 argument: 3 650 rows for a
    * decade, independent of row volume), so the within-type pair join is
    * over day counts, never row counts. Walsh sums stay 2× exact cents
    * (no division before the median); the median itself is the exact
    * interpolated order statistic, a dyadic rational both engines
    * represent identically, scaled by 50 into centi-cents with FLOOR. */
  val o58HodgesLehmann: Reg = Reg.sql(
    "o58_hodges_lehmann",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |walsh AS (
      |  SELECT a.ty AS ty, a.c + b.c AS w2
      |  FROM daily a JOIN daily b ON a.ty = b.ty AND a.d <= b.d)
      |SELECT ty, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |       CAST(FLOOR(MEDIAN(w2) * 50.0) AS BIGINT) AS hl_e2
      |FROM walsh GROUP BY ty ORDER BY ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
    val walsh = daily.as("a")
      .join(daily.as("b"),
        col("a.ty") === col("b.ty") && col("a.d") <= col("b.d"))
      .select(col("a.ty").as("ty"), (col("a.c") + col("b.c")).as("w2"))
    walsh.groupBy("ty")
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        floor(expr("percentile(w2, 0.5)") * 50.0).cast("bigint").as("hl_e2"))
      .orderBy("ty")
  }

  /** O59 — EWMA with half-life decay over a FIXED 20-day horizon per
    * event type, entirely in exact integers: weights 2^(20−r) for recency
    * rank r ≤ 20 are exact BIGINT shifts, the weighted numerator stays
    * under 2⁵³·10⁴ by construction (cents × ≤2²⁰ × 10⁴), and the final
    * smoothed value is one integer floor-division — bit-equal across
    * engines with no IEEE summation-order exposure at all (the
    * BASELINE.md float discipline taken to its limit). The fixed horizon
    * is also what makes it scale-safe: the window never grows with
    * history, so state is 20 days per type forever. Truncation at 20
    * days loses < 2⁻²⁰ of the weight mass of the untruncated EWMA. */
  val o59EwmaHalflife: Reg = Reg.sql(
    "o59_ewma_halflife",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |rk AS (
      |  SELECT ty, c,
      |         ROW_NUMBER() OVER (PARTITION BY ty ORDER BY d DESC) AS r
      |  FROM daily),
      |win AS (SELECT ty, c, r FROM rk WHERE r <= 20)
      |SELECT ty, CAST(COUNT(*) AS BIGINT) AS n_days,
      |       CAST(SUM(c * (CAST(1 AS BIGINT) << (20 - r))) * 10000
      |              // SUM(CAST(1 AS BIGINT) << (20 - r)) AS BIGINT)
      |         AS ewma_e4
      |FROM win GROUP BY ty ORDER BY ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
    val rk = daily.withColumn("r", row_number().over(
      Window.partitionBy("ty").orderBy(col("d").desc)))
      .where(col("r") <= 20)
      .withColumn("w", expr("shiftleft(cast(1 as bigint), 20 - cast(r as int))"))
    rk.groupBy("ty")
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        expr("(sum(c * w) * 10000) div sum(w)").cast("bigint").as("ewma_e4"))
      .orderBy("ty")
  }

  /** O60 — GRAM MATRIX of the embedding corpus (XᵀX upper triangle):
    * the one-pass sufficient statistic behind PCA / whitening / linear
    * probes. Exact lattice discipline: each coordinate is floor-quantized
    * to integer thousandths (float→double cast is exact, ×1000 is the
    * same IEEE op in both engines), so every product and sum is BIGINT.
    * The pair expansion is ROW-LOCAL (nested transform → one explode —
    * no self-join, no shuffle of the corpus), and map-side partial
    * aggregation collapses each partition to ≤ d(d+1)/2 = 2 080 rows
    * before the only shuffle: at 100 TB the reduce side still sees
    * 2 080 × partitions rows, the textbook outer-product accumulation. */
  val o60GramMatrix: Reg = Reg.sql(
    "o60_gram_matrix",
    """WITH q AS (
      |  SELECT vec_id, i,
      |         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
      |           AS qv
      |  FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)),
      |pairs AS (
      |  SELECT a.i AS i, b.i AS j, a.qv * b.qv AS p
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |       CAST(SUM(p) AS BIGINT) AS dot,
      |       CAST(COUNT(*) AS BIGINT) AS n_vecs
      |FROM pairs GROUP BY i, j ORDER BY i, j""".stripMargin) { (s, dir) =>
    val q = Tables.embeddings(s, dir).select(
      expr("transform(embedding, e -> cast(floor(cast(e as double) * 1000) as bigint))")
        .as("q"))
    q.select(explode(expr(
      """flatten(transform(sequence(1, 64), i ->
        |  transform(sequence(i, 64), j ->
        |    struct(i, j, element_at(q, i) * element_at(q, j) as p))))"""
        .stripMargin)).as("s"))
      .groupBy(col("s.i").cast("bigint").as("i"),
        col("s.j").cast("bigint").as("j"))
      .agg(sum("s.p").cast("bigint").as("dot"),
        count(lit(1)).cast("bigint").as("n_vecs"))
      .orderBy("i", "j")
  }

  /** O61 — HOLT LINEAR TREND (double exponential smoothing) in the o59
    * exact-integer rendering: level = half-life EWMA of the last 20 daily
    * values, trend = the same EWMA of the last 20 day-over-day DIFFS,
    * 7-day forecast = level + 7·trend — every weight an exact BIGINT
    * shift, both smoothers one floor-division each, zero IEEE exposure.
    * The fixed horizon bounds state per type forever (the o59 scale
    * argument); the classical recursive Holt update is deliberately
    * traded for the windowed form BECAUSE the recursion's running floats
    * can never hash-match across engines while this can, and under
    * half-life decay the truncation loses < 2⁻²⁰ of weight mass. */
  val o61HoltLinear: Reg = Reg.sql(
    "o61_holt_linear",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |dd AS (
      |  SELECT ty, d, c,
      |         c - LAG(c) OVER (PARTITION BY ty ORDER BY d) AS dc,
      |         ROW_NUMBER() OVER (PARTITION BY ty ORDER BY d DESC) AS r
      |  FROM daily),
      |lvl AS (
      |  SELECT ty,
      |         CAST(SUM(c * (CAST(1 AS BIGINT) << (20 - r))) * 10000
      |                // SUM(CAST(1 AS BIGINT) << (20 - r)) AS BIGINT)
      |           AS level_e4
      |  FROM dd WHERE r <= 20 GROUP BY ty),
      |trd AS (
      |  SELECT ty,
      |         CAST(SUM(dc * (CAST(1 AS BIGINT) << (20 - r))) * 10000
      |                // SUM(CAST(1 AS BIGINT) << (20 - r)) AS BIGINT)
      |           AS trend_e4
      |  FROM dd WHERE r <= 20 AND dc IS NOT NULL GROUP BY ty)
      |SELECT l.ty, l.level_e4, t.trend_e4,
      |       l.level_e4 + 7 * t.trend_e4 AS forecast7_e4
      |FROM lvl l JOIN trd t ON l.ty = t.ty ORDER BY l.ty""".stripMargin) {
    (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
    val wOrd = Window.partitionBy("ty").orderBy("d")
    val dd = daily
      .withColumn("dc", col("c") - lag("c", 1).over(wOrd))
      .withColumn("r", row_number().over(
        Window.partitionBy("ty").orderBy(col("d").desc)))
      .where(col("r") <= 20)
      .withColumn("w", expr("shiftleft(cast(1 as bigint), 20 - cast(r as int))"))
      .localCheckpoint() // level and trend aggregate the same slice
    val lvl = dd.groupBy("ty")
      .agg(expr("(sum(c * w) * 10000) div sum(w)").cast("bigint").as("level_e4"))
    val trd = dd.where(col("dc").isNotNull).groupBy("ty")
      .agg(expr("(sum(dc * w) * 10000) div sum(w)").cast("bigint").as("trend_e4"))
    lvl.join(trd, "ty")
      .select(col("ty"), col("level_e4"), col("trend_e4"),
        (col("level_e4") + lit(7L) * col("trend_e4")).as("forecast7_e4"))
      .orderBy("ty")
  }

  /** Benford first-digit probabilities log10(1+1/d), d = 1..9, as 18-digit
    * DECIMAL LITERALS shared verbatim with the oracle SQL: both engines
    * parse the same literal to the same double, so `n·p` is the same IEEE
    * product — no libm log10 in the hot path at all (cross-engine log10
    * ulps were the only hash risk in this query). */
  private val benfordP: Seq[(Int, String)] = Seq(
    1 -> "0.301029995663981195", 2 -> "0.176091259055681242",
    3 -> "0.124938736608299953", 4 -> "0.096910013008056414",
    5 -> "0.079181246047624827", 6 -> "0.066946789630613199",
    7 -> "0.057991946977686754", 8 -> "0.051152522447381288",
    9 -> "0.045757490560675125")

  /** O62 — BENFORD'S LAW conformance per event type: first-significant-
    * digit counts of the integer cents against log10(1+1/d), χ² in the
    * micro-quantized FLOOR discipline (each term floored to 1e-6 BEFORE
    * the 9-term sum, so the aggregate is an order-free integer). The
    * fraud/synthetic-data screen next to the drift family: fabricated
    * numeric columns flunk Benford long before their moments drift. One
    * corpus pass to (ty, digit) counts — 9 cells per type regardless of
    * volume. First digit comes from the DECIMAL STRING of a positive
    * BIGINT (no logs, no floats, engine-identical by construction). */
  val o62Benford: Reg = {
    Reg.sql(
      "o62_benford",
      s"""WITH c AS (
        |  SELECT event_type AS ty,
        |         CAST(SUBSTR(CAST(CAST(ROUND(value * 100) AS BIGINT)
        |           AS VARCHAR), 1, 1) AS INT) AS dg
        |  FROM events WHERE value > 0),
        |o AS (SELECT ty, dg, CAST(COUNT(*) AS BIGINT) AS k
        |      FROM c GROUP BY 1, 2),
        |n AS (SELECT ty, CAST(SUM(k) AS BIGINT) AS n FROM o GROUP BY ty),
        |grid AS (
        |  SELECT n.ty, n.n, d.dg AS dg, COALESCE(o.k, 0) AS k,
        |         CAST(n.n AS DOUBLE) * (CASE d.dg ${benfordP.map {
          case (dd, p) => s"WHEN $dd THEN $p" }.mkString(" ")} END) AS e
        |  FROM n CROSS JOIN (SELECT UNNEST(generate_series(1, 9)) AS dg) d
        |  LEFT JOIN o ON o.ty = n.ty AND o.dg = d.dg)
        |SELECT ty, MAX(n) AS n,
        |       CAST(SUM(CAST(FLOOR(
        |         (CAST(k AS DOUBLE) - e) * (CAST(k AS DOUBLE) - e) / e * 1e6)
        |         AS BIGINT)) AS BIGINT) AS chi2_micro
        |FROM grid GROUP BY ty ORDER BY ty""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir).where(col("value") > 0)
        .select(col("event_type").as("ty"),
          substring(round(col("value") * 100).cast("bigint").cast("string"),
            1, 1).cast("int").as("dg"))
      val o = c.groupBy("ty", "dg").agg(count(lit(1)).cast("bigint").as("k"))
        .localCheckpoint() // reused for totals and the 9-cell grid
      val n = o.groupBy("ty").agg(sum("k").cast("bigint").as("n"))
      val digits = s.range(1, 10).select(col("id").cast("int").as("dg"))
      val pExpr = expr(s"case dg ${benfordP.map { case (d, p) =>
        s"when $d then cast($p as double)" }.mkString(" ")} end")
      val grid = n.crossJoin(broadcast(digits))
        .join(o, Seq("ty", "dg"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
        .withColumn("e", col("n").cast("double") * pExpr)
      grid.groupBy("ty")
        .agg(max("n").as("n"),
          sum(floor((col("k").cast("double") - col("e")) *
            (col("k").cast("double") - col("e")) / col("e") * lit(1e6))
            .cast("bigint")).cast("bigint").as("chi2_micro"))
        .orderBy("ty")
    }
  }

  /** O63 — PETTITT CHANGEPOINT test per event type over the daily series:
    * U_t = Σ_{i≤t<j} sgn(x_j − x_i), the split statistic of the rank
    * test, computed WITHOUT the O(n³) split-join via the telescoping
    * identity U_t = Σ_{s≤t} (A_s − B_s) where A_s/B_s are each
    * endpoint's forward/backward sign sums — one O(n²) pair aggregate on
    * the calendar-bounded day domain, one window cumsum. K = max |U_t|
    * locates the most probable changepoint; the approximate-significance
    * EXPONENT 6K²/(n³+n²) is emitted as an exact integer ratio (micro-
    * scaled floor division) instead of the exp(−·) p-value — no libm in
    * the output. Everything is sign counts: pure BIGINT end to end. */
  val o63Pettitt: Reg = Reg.sql(
    "o63_pettitt",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.ty, a.d AS di, b.d AS dj,
      |         CASE WHEN b.c > a.c THEN 1
      |              WHEN b.c < a.c THEN -1 ELSE 0 END AS s
      |  FROM daily a JOIN daily b ON a.ty = b.ty AND a.d < b.d),
      |ab AS (
      |  SELECT ty, d, SUM(a) AS ab FROM (
      |    SELECT ty, di AS d, s AS a FROM pairs
      |    UNION ALL
      |    SELECT ty, dj AS d, -s AS a FROM pairs)
      |  GROUP BY ty, d),
      |u AS (
      |  SELECT ty, d,
      |         SUM(ab) OVER (PARTITION BY ty ORDER BY d
      |                       ROWS UNBOUNDED PRECEDING) AS u_t,
      |         COUNT(*) OVER (PARTITION BY ty) AS n
      |  FROM ab),
      |best AS (
      |  SELECT ty, d, u_t, n,
      |         ROW_NUMBER() OVER (PARTITION BY ty
      |                            ORDER BY ABS(u_t) DESC, d) AS rk
      |  FROM u)
      |SELECT ty, CAST(n AS BIGINT) AS n_days,
      |       CAST(ABS(u_t) AS BIGINT) AS k_stat, d AS cp_day,
      |       CAST(1000000 * ((6 * u_t * u_t) // (n * n * n + n * n))
      |              + (((6 * u_t * u_t) % (n * n * n + n * n)) * 1000000)
      |                  // (n * n * n + n * n) AS BIGINT) AS exponent_micro
      |FROM best WHERE rk = 1 ORDER BY ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
      .localCheckpoint() // both sides of the pair join
    pettittFrom(daily)
  }

  /** The Pettitt statistic from a (ty, d, c) daily frame — split out so
    * the overflow spec can drive it with a planted multi-decade series.
    *
    * The significance exponent 6K²·1e6/(n³+n²) is emitted by SPLIT
    * DIVISION — with A = 6·u_t² and D = n³+n²,
    * floor(A·1e6/D) = 1e6·(A div D) + ((A mod D)·1e6) div D — because the
    * naive A·1e6 product wraps BIGINT once |u_t| > ~1.24e6 (reachable at
    * ~4.3 years of trending daily data; DuckDB raises out-of-range there
    * while pre-fix Spark silently wrapped). All operands are
    * non-negative, so Spark's truncating `div`/`%` and DuckDB's flooring
    * `//`/`%` agree term by term. Exact while (A mod D)·1e6 < 2⁶³, i.e.
    * n ≤ 20950 days (~57 years of daily data) — far past any calendar
    * domain; beyond it the Spark side raises (guard below) exactly where
    * DuckDB's native overflow check raises, instead of wrapping. */
  private[graft] def pettittFrom(daily: DataFrame): DataFrame = {
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.ty") === col("b.ty") && col("a.d") < col("b.d"))
      .select(col("a.ty").as("ty"), col("a.d").as("di"), col("b.d").as("dj"),
        when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L).as("s"))
    val ab = pairs.select(col("ty"), col("di").as("d"), col("s").as("a"))
      .unionByName(pairs.select(col("ty"), col("dj").as("d"),
        (-col("s")).as("a")))
      .groupBy("ty", "d").agg(sum("a").as("ab"))
    val wCum = Window.partitionBy("ty").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = ab
      .withColumn("u_t", sum("ab").over(wCum))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("ty")))
    u.withColumn("rk", row_number().over(
        Window.partitionBy("ty").orderBy(abs(col("u_t")).desc, col("d"))))
      .where(col("rk") === 1)
      .select(col("ty"), col("n").cast("bigint").as("n_days"),
        abs(col("u_t")).cast("bigint").as("k_stat"), col("d").as("cp_day"),
        when(col("n") > 20950, expr(
          "raise_error('o63_pettitt: n_days past the exact-BIGINT bound')")
          .cast("bigint"))
          .otherwise(expr(
            "1000000 * ((6 * u_t * u_t) div (n * n * n + n * n))" +
              " + (((6 * u_t * u_t) % (n * n * n + n * n)) * 1000000)" +
              " div (n * n * n + n * n)"))
          .cast("bigint").as("exponent_micro"))
      .orderBy("ty")
  }

  /** O64 — RANK AUTOCORRELATION at lags 1..7 of the daily series per
    * event type: Spearman's rho over the lag-k overlap pairs, with
    * MIN-rank ties declared as part of the statistic so every quantity
    * is a small exact integer (ranks ≤ days, d² ≤ days²). The
    * seasonality detector next to o50's decomposition — a weekly cycle
    * shows as a rho spike at lag 7. The floor of 1e6·(1 − 6Σd²/(m³−m))
    * is taken WITHOUT any float: floor(A − p/q) = A − ceil(p/q) =
    * A − (p + q − 1) div q on positive integers, identical in both
    * engines by construction. Day domain only — calendar-bounded at any
    * corpus size (the o50 argument). */
  val o64RankAcf: Reg = Reg.sql(
    "o64_rank_acf",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT a.ty, k.k, a.d, a.c AS x, b.c AS y
      |  FROM daily a
      |  JOIN (SELECT UNNEST(generate_series(1, 7)) AS k) k ON TRUE
      |  JOIN daily b ON b.ty = a.ty AND b.d = a.d + CAST(k.k AS INT)),
      |rk AS (
      |  SELECT ty, k,
      |         RANK() OVER (PARTITION BY ty, k ORDER BY x) AS rx,
      |         RANK() OVER (PARTITION BY ty, k ORDER BY y) AS ry
      |  FROM lagged),
      |agg AS (
      |  SELECT ty, k, CAST(COUNT(*) AS BIGINT) AS m,
      |         CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
      |  FROM rk GROUP BY 1, 2)
      |SELECT ty, CAST(k AS BIGINT) AS lag, m,
      |       1000000 - (6000000 * sd2 + (m * m * m - m) - 1)
      |         // (m * m * m - m) AS rho_micro
      |FROM agg WHERE m >= 2 ORDER BY ty, lag""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
      .localCheckpoint() // both sides of the lag join
    val ks = s.range(1, 8).select(col("id").cast("int").as("k"))
    val lagged = daily.as("a").crossJoin(broadcast(ks))
      .join(daily.as("b"),
        col("b.ty") === col("a.ty") &&
        col("b.d") === date_add(col("a.d"), col("k")))
      .select(col("a.ty").as("ty"), col("k"),
        col("a.c").as("x"), col("b.c").as("y"))
    val w = (c: String) => Window.partitionBy("ty", "k").orderBy(c)
    val rk = lagged
      .withColumn("rx", rank().over(w("x")))
      .withColumn("ry", rank().over(w("y")))
    rk.groupBy("ty", "k")
      .agg(count(lit(1)).cast("bigint").as("m"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast("bigint").as("sd2"))
      .where(col("m") >= 2)
      .select(col("ty"), col("k").cast("bigint").as("lag"), col("m"),
        (lit(1000000L) - expr(
          "(6000000 * sd2 + (m * m * m - m) - 1) div (m * m * m - m)"))
          .as("rho_micro"))
      .orderBy("ty", "lag")
  }

  /** O65 — MANN-KENDALL monotone-trend test per event type: S = Σ of
    * pairwise signs over the daily series (the same calendar-bounded
    * O(n²) sign-pair aggregate o63's Pettitt uses — there the telescoped
    * cumulative locates a CHANGEPOINT, here the plain sum tests a
    * MONOTONE TREND, the two standard questions over one statistic
    * family). Emitted with the EXACT integer variance numerator
    * 18·Var(S) = n(n−1)(2n+5) − Σⱼ tⱼ(tⱼ−1)(2tⱼ+5) (tie-corrected; the
    * ties are groups of equal daily totals) instead of the z-score — no
    * sqrt, pure BIGINT end to end, overflow-free to n in the millions of
    * days (n³ ≪ 2⁶³). Trend is the sign of S; significance is the
    * caller's z = S∓1 / sqrt(var18/18) — driver-side arithmetic on a
    * |event_type|-row frame. */
  val o65MannKendall: Reg = Reg.sql(
    "o65_mann_kendall",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.ty,
      |         CASE WHEN b.c > a.c THEN 1
      |              WHEN b.c < a.c THEN -1 ELSE 0 END AS s
      |  FROM daily a JOIN daily b ON a.ty = b.ty AND a.d < b.d),
      |sagg AS (SELECT ty, CAST(SUM(s) AS BIGINT) AS s_stat
      |         FROM pairs GROUP BY ty),
      |nn AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY ty),
      |ties AS (
      |  SELECT ty, CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
      |           AS tiecorr
      |  FROM (SELECT ty, c, CAST(COUNT(*) AS BIGINT) AS t
      |        FROM daily GROUP BY 1, 2)
      |  GROUP BY ty)
      |SELECT sagg.ty, nn.n AS n_days, sagg.s_stat,
      |       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tiecorr
      |              AS BIGINT) AS var18,
      |       CAST(CASE WHEN sagg.s_stat > 0 THEN 1
      |                 WHEN sagg.s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)
      |         AS trend
      |FROM sagg JOIN nn ON nn.ty = sagg.ty
      |JOIN ties ON ties.ty = sagg.ty
      |ORDER BY sagg.ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
      .localCheckpoint() // pair join (both sides), n, and tie groups
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.ty") === col("b.ty") && col("a.d") < col("b.d"))
      .select(col("a.ty").as("ty"),
        when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L).as("s"))
    val sagg = pairs.groupBy("ty").agg(sum("s").cast("bigint").as("s_stat"))
    val nn = daily.groupBy("ty").agg(count(lit(1)).cast("bigint").as("n"))
    val ties = daily.groupBy("ty", "c").agg(count(lit(1)).as("t"))
      .groupBy("ty")
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .cast("bigint").as("tiecorr"))
    sagg.join(nn, "ty").join(ties, "ty")
      .select(col("ty"), col("n").as("n_days"), col("s_stat"),
        expr("n * (n - 1) * (2 * n + 5) - tiecorr").cast("bigint").as("var18"),
        signum(col("s_stat")).cast("bigint").as("trend"))
      .orderBy("ty")
  }

  /** O66 — GLOBAL SPEARMAN rank correlation (quantity vs price over the
    * whole fact table), ranked WITHOUT a single-partition window: average
    * ranks come from the o29 two-level prefix-sum device on each VALUE
    * DOMAIN (distinct-value counts → running offsets; avg rank of value v
    * in halves is the exact integer 2·cum_before(v) + cnt(v) + 1), joined
    * back domain-sized. Both domains are FIXED by the schema (50
    * quantities, a bounded cents range), so the rank frames stay small at
    * any corpus size — the 100 TB shape o64's per-(ty,lag) windows don't
    * need but a whole-fact rank does. Sufficient statistics Σuv, Σu², Σv²
    * accumulate in DECIMAL(38,0) (exact, order-independent; BIGINT wraps
    * past n ≈ 1.3e6 because u ≤ 2n — the o63 overflow discipline), then
    * cast DOUBLE (same exact value both engines) and ρ_micro floors an
    * IDENTICAL scalar expression. Σu = Σv = n(n+1) exactly, so only the
    * squares and the cross term are emitted. */
  val o66Spearman: Reg = Reg.sql(
    "o66_spearman",
    """WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS x,
      |                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      |           FROM lineitem),
      |rk AS (SELECT
      |         2 * (RANK() OVER (ORDER BY x))
      |           + COUNT(*) OVER (PARTITION BY x) - 1 AS u,
      |         2 * (RANK() OVER (ORDER BY y))
      |           + COUNT(*) OVER (PARTITION BY y) - 1 AS v
      |       FROM t),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(CAST(SUM(u * v) AS HUGEINT) AS DOUBLE) AS s_uv,
      |               CAST(CAST(SUM(u * u) AS HUGEINT) AS DOUBLE) AS s_u2,
      |               CAST(CAST(SUM(v * v) AS HUGEINT) AS DOUBLE) AS s_v2
      |        FROM rk)
      |SELECT n, s_uv, s_u2, s_v2,
      |       CAST(FLOOR(1000000.0
      |              * (CAST(n AS DOUBLE) * s_uv
      |                 - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
      |                   * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
      |              / SQRT((CAST(n AS DOUBLE) * s_u2
      |                      - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
      |                        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
      |                     * (CAST(n AS DOUBLE) * s_v2
      |                        - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
      |                          * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))))
      |         AS BIGINT) AS rho_micro
      |FROM agg ORDER BY n""".stripMargin) { (s, dir) =>
    import graft.operators.PrefixSum
    val t = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("bigint").as("x"),
        round(col("l_extendedprice") * 100).cast("bigint").as("y"))
      .localCheckpoint(false) // two domain counts + the final join share it
    // avg rank in halves per DISTINCT value: 2·cum_before + cnt + 1
    def halfRanks(c: String, width: Long): org.apache.spark.sql.DataFrame =
      PrefixSum.globalCumsum(
        t.groupBy(c).agg(count(lit(1)).as("cnt")), c, "cnt", width)
        .select(col(c),
          (lit(2L) * col("cum_before") + col("cnt") + 1L).as(s"r_$c"))
    val ranked = t
      .join(halfRanks("x", 64L), "x")   // 50-value domain
      .join(halfRanks("y", 16384L), "y") // bounded cents domain
      .select(col("r_x").as("u"), col("r_y").as("v"))
    val agg = ranked.agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("u").cast("decimal(18,0)") * col("v").cast("decimal(18,0)"))
        .cast("double").as("s_uv"),
      sum(col("u").cast("decimal(18,0)") * col("u").cast("decimal(18,0)"))
        .cast("double").as("s_u2"),
      sum(col("v").cast("decimal(18,0)") * col("v").cast("decimal(18,0)"))
        .cast("double").as("s_v2"))
    agg.select(col("n"), col("s_uv"), col("s_u2"), col("s_v2"),
      expr("""CAST(FLOOR(1000000.0
             * (CAST(n AS DOUBLE) * s_uv
                - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                  * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
             / SQRT((CAST(n AS DOUBLE) * s_u2
                     - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                       * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
                    * (CAST(n AS DOUBLE) * s_v2
                       - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                         * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))))
        AS BIGINT)""").as("rho_micro"))
      .orderBy("n")
  }

  /** O67 — WALD–WOLFOWITZ runs test per event type on the daily series,
    * mean-based: a day is ABOVE when c·n > Σc and BELOW when c·n < Σc —
    * pure BIGINT comparisons, so the threshold can never flip on a ulp
    * the way a floating mean (or a cross-engine even-count median)
    * would; exact ties drop, the classic treatment. Emits the exact
    * integers (n_above, n_below, runs); significance is the caller's
    * z = (runs − (1 + 2·n1·n2/(n1+n2))) / σ — driver-side arithmetic on
    * a |event_type|-row frame (the o65 discipline). The run-boundary
    * scan is one LAG over the calendar-bounded daily frame — the
    * o63/o64/o65 family's licensed window. Overflow bound: c·n < 2⁶³
    * holds to ~10¹⁴ cents/day over 10⁴ days. */
  val o67RunsTest: Reg = Reg.sql(
    "o67_runs_test",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(SUM(c) AS BIGINT) AS sc
      |        FROM daily GROUP BY ty),
      |sgn AS (SELECT daily.ty, d,
      |               CASE WHEN c * n > sc THEN 1
      |                    WHEN c * n < sc THEN -1 END AS s
      |        FROM daily JOIN tot USING (ty)),
      |seq AS (SELECT ty, s, LAG(s) OVER (PARTITION BY ty ORDER BY d) AS p
      |        FROM sgn WHERE s IS NOT NULL)
      |SELECT ty,
      |       CAST(COUNT(*) FILTER (WHERE s = 1) AS BIGINT) AS n_above,
      |       CAST(COUNT(*) FILTER (WHERE s = -1) AS BIGINT) AS n_below,
      |       CAST(COUNT(*) FILTER (WHERE p IS NULL OR p <> s) AS BIGINT)
      |         AS runs
      |FROM seq GROUP BY ty ORDER BY ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
      .localCheckpoint() // totals + the sign pass share it
    val tot = daily.groupBy("ty")
      .agg(count(lit(1)).cast("bigint").as("n"), sum("c").cast("bigint").as("sc"))
    val sgn = daily.join(tot, "ty")
      .select(col("ty"), col("d"),
        when(col("c") * col("n") > col("sc"), 1)
          .when(col("c") * col("n") < col("sc"), -1).as("s"))
      .where(col("s").isNotNull)
    val w = Window.partitionBy("ty").orderBy("d")
    sgn.withColumn("p", lag("s", 1).over(w))
      .groupBy("ty")
      .agg(count(when(col("s") === 1, 1)).cast("bigint").as("n_above"),
        count(when(col("s") === -1, 1)).cast("bigint").as("n_below"),
        count(when(col("p").isNull || col("p") =!= col("s"), 1))
          .cast("bigint").as("runs"))
      .orderBy("ty")
  }

  /** O68 — COX–STUART trend test per event type: pair day i with day
    * i + h (h = ⌈n/2⌉; odd-length series drop the middle day, the
    * classic treatment) and count strict sign pairs — a different power
    * profile than o65's all-pairs Mann-Kendall (Cox–Stuart is the
    * binomial sign test on the half-offset pairs, robust to
    * seasonality at the half-period). Pure BIGINT end to end: pairing
    * is one equi-join on (ty, idx + h) where idx comes from a
    * calendar-bounded window (the o63/o64/o65 family's licensed
    * frame); significance is the caller's binomial tail on
    * (s_plus, s_minus). */
  val o68CoxStuart: Reg = Reg.sql(
    "o68_cox_stuart",
    """WITH daily AS (
      |  SELECT event_type AS ty, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |idx AS (SELECT ty, c,
      |               CAST(ROW_NUMBER() OVER (PARTITION BY ty ORDER BY d)
      |                 AS BIGINT) AS i,
      |               CAST(COUNT(*) OVER (PARTITION BY ty) AS BIGINT) AS n
      |        FROM daily),
      |pairs AS (SELECT a.ty, a.n,
      |                 CASE WHEN b.c > a.c THEN 1
      |                      WHEN b.c < a.c THEN -1 ELSE 0 END AS s
      |          FROM idx a JOIN idx b
      |            ON b.ty = a.ty AND b.i = a.i + (a.n + 1) // 2
      |          WHERE a.i <= a.n // 2)
      |SELECT ty, CAST(MAX(n) AS BIGINT) AS n_days,
      |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |       CAST(COUNT(*) FILTER (WHERE s = 1) AS BIGINT) AS s_plus,
      |       CAST(COUNT(*) FILTER (WHERE s = -1) AS BIGINT) AS s_minus,
      |       CAST(CASE WHEN COUNT(*) FILTER (WHERE s = 1)
      |                      > COUNT(*) FILTER (WHERE s = -1) THEN 1
      |                 WHEN COUNT(*) FILTER (WHERE s = 1)
      |                      < COUNT(*) FILTER (WHERE s = -1) THEN -1
      |                 ELSE 0 END AS BIGINT) AS trend
      |FROM pairs GROUP BY ty ORDER BY ty""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("bigint")).cast("bigint").as("c"))
    val w = Window.partitionBy("ty").orderBy("d")
    val idx = daily
      .withColumn("i", row_number().over(w).cast("bigint"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("ty")).cast("bigint"))
      .localCheckpoint() // both sides of the half-offset join
    val pairs = idx.as("a")
      .where(col("a.i") <= expr("a.n div 2"))
      .join(idx.as("b"),
        col("b.ty") === col("a.ty") &&
          col("b.i") === col("a.i") + expr("(a.n + 1) div 2"))
      .select(col("a.ty").as("ty"), col("a.n").as("n"),
        when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L).as("s"))
    pairs.groupBy("ty")
      .agg(max("n").cast("bigint").as("n_days"),
        count(lit(1)).cast("bigint").as("n_pairs"),
        count(when(col("s") === 1L, 1)).cast("bigint").as("s_plus"),
        count(when(col("s") === -1L, 1)).cast("bigint").as("s_minus"))
      .select(col("ty"), col("n_days"), col("n_pairs"), col("s_plus"),
        col("s_minus"),
        signum(col("s_plus") - col("s_minus")).cast("bigint").as("trend"))
      .orderBy("ty")
  }

  val all: Seq[Reg] = Seq(o49KendallTau, o50SeasonalDecompose, o51BootstrapCi,
    o52WelchTtest, o53KmvSetOps, o54ResampleInterp, o55SeasonalAnomaly,
    o57Sprt, o58HodgesLehmann, o59EwmaHalflife, o60GramMatrix,
    o61HoltLinear, o62Benford, o63Pettitt, o64RankAcf, o65MannKendall,
    o66Spearman, o67RunsTest, o68CoxStuart)
}
