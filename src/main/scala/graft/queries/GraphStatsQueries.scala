package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 fifth wave: iterative graph analytics and exact rank/moment
  * statistics — the remaining classic distributed-engine primitives next to
  * o38's closure and o41's BFS.
  *
  *  - O45 PageRank — THE iterative shuffle benchmark: k rounds of
  *    (ranks ⋈ edges → groupBy dst). Ranks live on an integer micro-lattice
  *    (floor division everywhere) so the fixpoint math is order-free and
  *    bit-identical in both engines — the same discipline that made the
  *    kmeans/PQ codebooks oracle-able.
  *  - O46 bounded-hop weighted shortest paths — k-round Bellman–Ford, the
  *    min-plus counterpart of o41's BFS (whose frontier trick no longer
  *    applies once weights make already-settled distances improvable).
  *    Triangle counting is deliberately absent: `llm_link_triangles`
  *    already carries the degree-oriented compact-forward form.
  *  - O47 correlation matrix — all pairwise Pearson correlations in ONE
  *    aggregate pass: per-row products on the exact cents lattice, sums in
  *    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the co-moments are exact
  *    integers, and the closed form evaluated from those integers with the
  *    identical IEEE expression shape in both engines before a micro-grid
  *    floor.
  *  - O48 Mann–Whitney U — the rank-based two-sample test next to the
  *    KS/chi²/PSI drift family. Never ranks the corpus: counts collapse to
  *    the (event_type, cents) VALUE DOMAIN first (bounded by the value
  *    range, not the row count), and tie-averaged rank sums come from a
  *    window over that bounded frame, doubled so every number stays an
  *    exact integer.
  */
object GraphStatsQueries {

  /** O45 — PageRank by power iteration on an integer micro-lattice.
    * Node set is data-driven (distinct event users); the edge overlay is the
    * deterministic u→u+1 / u→2u generator shared with o41 so both engines
    * build the identical graph. Each of the 4 rounds is one ranks⋈edges
    * equi-join plus a groupBy(dst) sum — the canonical iterate-shuffle shape;
    * `localCheckpoint` keeps the plan flat across rounds. Contributions are
    * `rank div outdeg` and damping is `150000 + (85·Σ) div 100`, all integer
    * floor ops on positive values, so the result is independent of both
    * summation order and float rounding — dangling nodes simply leak mass,
    * identically in both engines. At 100 TB the per-round cost is one
    * edge-sized shuffle; AQE handles the hub skew the generator lacks. */
  val o45Pagerank: Reg = Reg.sql(
    "o45_pagerank",
    """WITH users AS (SELECT DISTINCT user_id AS u FROM events WHERE user_id >= 1),
      |edges AS (
      |  SELECT a.u AS src, b.u AS dst FROM users a JOIN users b ON b.u = a.u + 1
      |  UNION ALL
      |  SELECT a.u, b.u FROM users a JOIN users b ON b.u = 2 * a.u),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM edges GROUP BY src),
      |r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM users),
      |c1 AS (SELECT e.dst AS node, SUM(r.r // d.od) AS s FROM r0 r
      |       JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r1 AS (SELECT u.u AS node, CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      |       FROM users u LEFT JOIN c1 c ON c.node = u.u),
      |c2 AS (SELECT e.dst AS node, SUM(r.r // d.od) AS s FROM r1 r
      |       JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r2 AS (SELECT u.u AS node, CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      |       FROM users u LEFT JOIN c2 c ON c.node = u.u),
      |c3 AS (SELECT e.dst AS node, SUM(r.r // d.od) AS s FROM r2 r
      |       JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r3 AS (SELECT u.u AS node, CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      |       FROM users u LEFT JOIN c3 c ON c.node = u.u),
      |c4 AS (SELECT e.dst AS node, SUM(r.r // d.od) AS s FROM r3 r
      |       JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
      |r4 AS (SELECT u.u AS node, CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      |       FROM users u LEFT JOIN c4 c ON c.node = u.u)
      |SELECT CAST(node AS BIGINT) AS node, r AS pr
      |FROM r4 ORDER BY node""".stripMargin) { (s, dir) =>
    val users = Tables.events(s, dir)
      .where(col("user_id") >= 1L)
      .select(col("user_id").as("node")).distinct().localCheckpoint()
    val u2 = users.select(col("node").as("u"))
    val rawEdges = u2.as("a")
      .join(u2.as("b"), col("b.u") === col("a.u") + 1)
      .select(col("a.u").as("src"), col("b.u").as("dst"))
      .unionByName(u2.as("a")
        .join(u2.as("b"), col("b.u") === col("a.u") * 2)
        .select(col("a.u").as("src"), col("b.u").as("dst")))
    val deg = rawEdges.groupBy("src").agg(count(lit(1)).as("od"))
    val edges = rawEdges.join(deg, "src").localCheckpoint()
    var ranks = users.withColumn("r", lit(1000000L))
    for (_ <- 1 to 4) {
      val contrib = ranks.join(edges, ranks("node") === edges("src"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = users.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr("cast(150000 + (85 * coalesce(s, cast(0 as bigint))) div 100 as bigint)")
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node").cast("bigint").as("node"), col("r").as("pr"))
      .orderBy("node")
  }

  /** O46 — bounded-hop WEIGHTED shortest paths (k-round Bellman–Ford):
    * the min-plus counterpart of o41's unweighted BFS, and the primitive
    * routing/attribution queries need when hops carry costs. (Triangle
    * counting is deliberately NOT here — `llm_link_triangles` already
    * carries the degree-oriented compact-forward implementation.) Each of
    * the 24 rounds relaxes the FULL distance table through the edge list
    * — one dist⋈edges equi-join plus a min-aggregate, the classic
    * iterate-shuffle pair — so after round k the table holds the exact
    * minimum cost over paths of ≤ k edges; 24 rounds IS the declared
    * semantics (both engines state the same hop bound; nodes beyond it
    * are absent from both). Weights `1 + src % 5` are integers, so every
    * distance is exact. The oracle explores the same ≤24-hop path space
    * with a recursive CTE whose UNION dedups (node, dist, hops) states —
    * bounded because hop and weight domains are. At 100 TB the per-round
    * cost is one edge-sized shuffle and the hop bound caps total work —
    * the frontier trick (o41) does not apply once weights make old
    * distances improvable. */
  val o46BoundedSssp: Reg = Reg.sql(
    "o46_bounded_sssp",
    """WITH RECURSIVE users AS (
      |  SELECT DISTINCT user_id AS u FROM events WHERE user_id >= 1),
      |edges AS (
      |  SELECT a.u AS src, b.u AS dst, 1 + a.u % 5 AS w
      |  FROM users a JOIN users b ON b.u = a.u + 1
      |  UNION ALL
      |  SELECT a.u, b.u, 1 + a.u % 5 FROM users a JOIN users b ON b.u = 2 * a.u),
      |walk(node, dist, hops) AS (
      |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
      |  UNION
      |  SELECT e.dst, wk.dist + e.w, wk.hops + 1
      |  FROM walk wk JOIN edges e ON e.src = wk.node
      |  WHERE wk.hops < 24)
      |SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS BIGINT) AS dist
      |FROM walk GROUP BY node ORDER BY node""".stripMargin) { (s, dir) =>
    val users = Tables.events(s, dir)
      .where(col("user_id") >= 1L)
      .select(col("user_id").as("u")).distinct().localCheckpoint()
    val edges = users.as("a")
      .join(users.as("b"), col("b.u") === col("a.u") + 1)
      .select(col("a.u").as("src"), col("b.u").as("dst"),
        (lit(1L) + col("a.u") % 5).as("w"))
      .unionByName(users.as("a")
        .join(users.as("b"), col("b.u") === col("a.u") * 2)
        .select(col("a.u").as("src"), col("b.u").as("dst"),
          (lit(1L) + col("a.u") % 5).as("w")))
      .localCheckpoint()
    import s.implicits._
    var dist = Seq((1L, 0L)).toDF("node", "dist").localCheckpoint()
    for (_ <- 1 to 24) {
      val relaxed = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist.select(col("node").cast("bigint").as("node"),
      col("dist").cast("bigint").as("dist"))
      .orderBy("node")
  }

  /** O47 — the full pairwise Pearson correlation matrix of lineitem's four
    * measures in ONE scan and ONE O(1)-row aggregate (the classic feature
    * pre-screen before any model fit). Per-row values snap to the exact
    * cents lattice (ROUND, not FLOOR — cents-valued doubles sit within 1e-9
    * of the integer so round is exact while floor can land one below); all
    * 14 co-moments are sums of per-row long products carried in
    * DECIMAL(38,0), so they are order-free exact integers that DuckDB's
    * HUGEINT sums reproduce bit-for-bit. The closed form
    * (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²)) is then evaluated with
    * the IDENTICAL expression shape in both engines — correctly-rounded
    * integer→double conversion, one multiply, one sqrt, one divide, micro
    * floor — so even the float tail agrees. Never a per-pair pass: 10× the
    * columns would still be one scan. */
  val o47CorrMatrix: Reg = Reg.sql(
    "o47_corr_matrix",
    """WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS q,
      |                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
      |                  CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
      |                  CAST(ROUND(l_tax * 100) AS BIGINT) AS t
      |           FROM lineitem),
      |m AS (SELECT COUNT(*) AS n,
      |             SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, SUM(t) AS st,
      |             SUM(q*q) AS sqq, SUM(p*p) AS spp, SUM(d*d) AS sdd, SUM(t*t) AS stt,
      |             SUM(q*p) AS sqp, SUM(q*d) AS sqd, SUM(q*t) AS sqt,
      |             SUM(p*d) AS spd, SUM(p*t) AS spt, SUM(d*t) AS sdt
      |      FROM v)
      |SELECT pair, CAST(n AS BIGINT) AS n,
      |       CAST(FLOOR(1000000.0 * CAST(num AS DOUBLE) /
      |                  SQRT(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE))) AS BIGINT)
      |         AS corr_micro
      |FROM (
      |  SELECT 'quantity_price' AS pair, n, n*sqp - sq*sp AS num,
      |         n*sqq - sq*sq AS d1, n*spp - sp*sp AS d2 FROM m
      |  UNION ALL SELECT 'quantity_discount', n, n*sqd - sq*sd,
      |         n*sqq - sq*sq, n*sdd - sd*sd FROM m
      |  UNION ALL SELECT 'quantity_tax', n, n*sqt - sq*st,
      |         n*sqq - sq*sq, n*stt - st*st FROM m
      |  UNION ALL SELECT 'price_discount', n, n*spd - sp*sd,
      |         n*spp - sp*sp, n*sdd - sd*sd FROM m
      |  UNION ALL SELECT 'price_tax', n, n*spt - sp*st,
      |         n*spp - sp*sp, n*stt - st*st FROM m
      |  UNION ALL SELECT 'discount_tax', n, n*sdt - sd*st,
      |         n*sdd - sd*sd, n*stt - st*st FROM m)
      |ORDER BY pair""".stripMargin) { (s, dir) =>
    val v = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("bigint").as("q"),
      round(col("l_extendedprice") * 100).cast("bigint").as("p"),
      round(col("l_discount") * 100).cast("bigint").as("d"),
      round(col("l_tax") * 100).cast("bigint").as("t"))
    def dsum(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(38,0)"))
    val m = v.agg(
      count(lit(1)).as("n"),
      dsum(col("q")).as("sq"), dsum(col("p")).as("sp"),
      dsum(col("d")).as("sd"), dsum(col("t")).as("st"),
      dsum(col("q") * col("q")).as("sqq"), dsum(col("p") * col("p")).as("spp"),
      dsum(col("d") * col("d")).as("sdd"), dsum(col("t") * col("t")).as("stt"),
      dsum(col("q") * col("p")).as("sqp"), dsum(col("q") * col("d")).as("sqd"),
      dsum(col("q") * col("t")).as("sqt"), dsum(col("p") * col("d")).as("spd"),
      dsum(col("p") * col("t")).as("spt"), dsum(col("d") * col("t")).as("sdt"))
      .head()
    val n = m.getLong(0)
    def big(i: Int): BigInt = BigInt(m.getDecimal(i).toBigInteger)
    val Seq(sq, sp, sd, st, sqq, spp, sdd, stt, sqp, sqd, sqt, spd, spt, sdt) =
      (1 to 14).map(big)
    val bn = BigInt(n)
    def corrMicro(sxy: BigInt, sx: BigInt, sy: BigInt,
        sxx: BigInt, syy: BigInt): Long = {
      val num = (bn * sxy - sx * sy).bigInteger.doubleValue
      val d1 = (bn * sxx - sx * sx).bigInteger.doubleValue
      val d2 = (bn * syy - sy * sy).bigInteger.doubleValue
      math.floor(1000000.0 * num / math.sqrt(d1 * d2)).toLong
    }
    import s.implicits._
    Seq(
      ("discount_tax", n, corrMicro(sdt, sd, st, sdd, stt)),
      ("price_discount", n, corrMicro(spd, sp, sd, spp, sdd)),
      ("price_tax", n, corrMicro(spt, sp, st, spp, stt)),
      ("quantity_discount", n, corrMicro(sqd, sq, sd, sqq, sdd)),
      ("quantity_price", n, corrMicro(sqp, sq, sp, sqq, spp)),
      ("quantity_tax", n, corrMicro(sqt, sq, st, sqq, stt)))
      .toDF("pair", "n", "corr_micro")
      .orderBy("pair")
  }

  /** O48 — Mann–Whitney U for every event-type pair (the rank-based
    * two-sample location test next to the KS/chi²/PSI drift family — robust
    * where the mean-based tests are not). The corpus is NEVER ranked:
    * values collapse to exact cents counts per (event_type, cents) first —
    * a frame bounded by the VALUE DOMAIN (≤ ~49k cents), not the row count —
    * pairs come from a data-driven type⋈type self-join, and tie-averaged
    * rank sums fall out of one cumulative window over that bounded frame.
    * Everything is doubled into integers (2·R keeps half-ranks exact), so
    * U₂ = 2·R_A − n_A(n_A+1) is an exact integer in both engines. At 100 TB
    * the only data-sized stage is the first counts aggregate; the window
    * runs on the fixed-size lattice. */
  val o48MannWhitney: Reg = Reg.sql(
    "o48_mann_whitney",
    """WITH c AS (SELECT event_type AS ty, CAST(ROUND(value * 100) AS BIGINT) AS x,
      |                  CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM events GROUP BY 1, 2),
      |types AS (SELECT DISTINCT ty FROM c),
      |pairs AS (SELECT a.ty AS ta, b.ty AS tb FROM types a JOIN types b ON a.ty < b.ty),
      |g AS (SELECT p.ta, p.tb, c.x,
      |             SUM(c.cnt) AS m,
      |             SUM(CASE WHEN c.ty = p.ta THEN c.cnt ELSE 0 END) AS na
      |      FROM pairs p JOIN c ON c.ty = p.ta OR c.ty = p.tb
      |      GROUP BY p.ta, p.tb, c.x),
      |w AS (SELECT ta, tb, x, m, na,
      |             COALESCE(SUM(m) OVER (PARTITION BY ta, tb ORDER BY x
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |      FROM g)
      |SELECT ta, tb,
      |       CAST(SUM(na) AS BIGINT) AS n_a,
      |       CAST(SUM(m - na) AS BIGINT) AS n_b,
      |       CAST(SUM(na * (2 * cum + m + 1)) - SUM(na) * (SUM(na) + 1) AS BIGINT)
      |         AS u2_a
      |FROM w GROUP BY ta, tb ORDER BY ta, tb""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"),
        round(col("value") * 100).cast("bigint").as("x"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = c.select(col("ty")).distinct()
    val pairs = types.as("a").join(types.as("b"), col("a.ty") < col("b.ty"))
      .select(col("a.ty").as("ta"), col("b.ty").as("tb"))
    val g = pairs.join(c, col("ty") === col("ta") || col("ty") === col("tb"))
      .groupBy("ta", "tb", "x")
      .agg(sum("cnt").as("m"),
        sum(when(col("ty") === col("ta"), col("cnt")).otherwise(lit(0L))).as("na"))
    val w = g.withColumn("cum",
      coalesce(sum("m").over(Window.partitionBy("ta", "tb").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    w.groupBy("ta", "tb")
      .agg(sum("na").cast("bigint").as("n_a"),
        sum(col("m") - col("na")).cast("bigint").as("n_b"),
        (sum(col("na") * (lit(2) * col("cum") + col("m") + 1)) -
          sum("na") * (sum("na") + 1)).cast("bigint").as("u2_a"))
      .orderBy("ta", "tb")
  }

  val all: Seq[Reg] = Seq(o45Pagerank, o46BoundedSssp, o47CorrMatrix, o48MannWhitney)
}
