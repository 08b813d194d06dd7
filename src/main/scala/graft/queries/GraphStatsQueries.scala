package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 fifth wave: iterative graph analytics and exact rank/moment
  * statistics — the remaining classic distributed-engine primitives next to
  * o38's closure and o41's BFS.
  *
  *  - O45 multi-touch attribution — linear credit assignment of conversion
  *    value across the preceding touchpoint window, exact on the integer
  *    cents lattice (div + remainder-to-last-touch, so credits sum to the
  *    conversion value); the touch⋈conversion stage is a user-co-located
  *    band join. PageRank is deliberately absent: `llm_linkrank` already
  *    carries the integer-lattice power iteration.
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

  /** O45 — MULTI-TOUCH ATTRIBUTION (linear model): every purchase's value
    * is split across the user's view/click touchpoints in the 7-day
    * lookback window before it, each touch credited `cents div k` with the
    * integer remainder going to the LAST touch (closest to conversion) —
    * the credit ledger sums exactly to the attributed conversion value,
    * no float leakage, both engines bit-identical. (PageRank is
    * deliberately NOT here: `llm_linkrank` already carries the
    * integer-lattice power iteration.) The touch⋈conversion stage is a
    * user-key equi-join with a time-band predicate — the j7 band-join
    * shape, co-located per user, fan-out bounded by a user's touches per
    * week, never a cross join; last-touch selection is a max over the
    * total (ts, event_id) order inside the per-purchase aggregate.
    * Conversions with an empty window land in the `unattributed` bucket
    * via one anti-join, so the output is a complete partition of the
    * purchase value. */
  val o45Attribution: Reg = Reg.sql(
    "o45_attribution",
    """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pt,
      |                  CAST(ROUND(value * 100) AS BIGINT) AS cents
      |           FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT event_id AS tid, user_id, event_type, epoch_us(ts) AS tt
      |      FROM events WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.pid, p.cents, t.tid, t.event_type, t.tt
      |      FROM p JOIN t ON t.user_id = p.user_id
      |                    AND t.tt < p.pt AND t.tt >= p.pt - 604800000000),
      |k AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS k,
      |             MAX(ROW(tt, tid)) AS last_t
      |      FROM j GROUP BY pid),
      |credit AS (
      |  SELECT j.event_type,
      |         j.cents // k.k +
      |           CASE WHEN ROW(j.tt, j.tid) = k.last_t
      |                THEN j.cents % k.k ELSE 0 END AS c
      |  FROM j JOIN k ON k.pid = j.pid),
      |touch AS (SELECT event_type AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |                 CAST(SUM(c) AS BIGINT) AS attributed_cents
      |          FROM credit GROUP BY 1),
      |un AS (SELECT 'unattributed' AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |              CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS attributed_cents
      |       FROM p WHERE pid NOT IN (SELECT pid FROM k))
      |SELECT * FROM touch UNION ALL SELECT * FROM un
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("pt"),
        round(col("value") * 100).cast("bigint").as("cents"))
    val t = e.where(col("event_type").isin("view", "click"))
      .select(col("event_id").as("tid"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tt"))
    val j = p.join(t, Seq("user_id"))
      .where(col("tt") < col("pt") && col("tt") >= col("pt") - 604800000000L)
      .select(col("pid"), col("cents"), col("tid"), col("event_type"), col("tt"))
      .localCheckpoint()
    val k = j.groupBy("pid").agg(count(lit(1)).as("k"),
      max(struct(col("tt"), col("tid"))).as("last_t"))
    val credit = j.join(k, "pid")
      .select(col("event_type"),
        (expr("cents div k") +
          when(struct(col("tt"), col("tid")) === col("last_t"),
            col("cents") % col("k")).otherwise(lit(0L))).as("c"))
    val touch = credit.groupBy(col("event_type").as("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("c").cast("bigint").as("attributed_cents"))
    val un = p.join(k.select(col("pid")), Seq("pid"), "left_anti")
      .agg(count(lit(1)).cast("bigint").as("n"),
        coalesce(sum("cents"), lit(0L)).cast("bigint").as("attributed_cents"))
      .select(lit("unattributed").as("bucket"), col("n"), col("attributed_cents"))
    touch.unionByName(un).orderBy("bucket")
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
    // Size-probed DRIVER fast path (the IncrementalClusters bounded-
    // collect discipline, same as o41): 24 fixed relaxation rounds cost
    // 24 jobs of pure overhead when the edge list fits in one bounded
    // collect; in-memory SYNCHRONOUS Bellman–Ford (dist_k from
    // dist_{k-1}, never in-place — in-place would relax through more
    // than k hops per round and undershoot the declared ≤24-hop
    // semantics) reproduces the table exactly. Past the bound the
    // distributed loop runs unchanged.
    val maxDriverEdges = 2000000
    val probe = edges.limit(maxDriverEdges + 1).collect()
    if (probe.length <= maxDriverEdges) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      var distM = Map(1L -> 0L)
      for (_ <- 1 to 24) {
        val relaxed = es.flatMap { case (src, dst, w) =>
          distM.get(src).map(d => dst -> (d + w))
        }
        distM = (distM.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      distM.toSeq.toDF("node", "dist")
        .select(col("node").cast("bigint").as("node"),
          col("dist").cast("bigint").as("dist"))
        .orderBy("node")
    } else {
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

  val all: Seq[Reg] = Seq(o45Attribution, o46BoundedSssp, o47CorrMatrix, o48MannWhitney)
}
