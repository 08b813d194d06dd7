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

  val all: Seq[Reg] = Seq(o49KendallTau, o50SeasonalDecompose, o51BootstrapCi)
}
