package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 completion of the TPC-H-shaped star suite: with these ten, every
  * one of the 22 canonical shapes has a representative under the oracle gate
  * (Q1/Q3/Q4/Q5/Q7/Q9/Q13/Q16/Q17/Q18/Q21/Q22 live in CoreQueries/
  * AnalyticsQueries). The testdata lacks partsupp, l_shipmode, l_commitdate
  * and p_container, so those predicates are restated on available columns —
  * the PLANNER SHAPE each query exercises (noted per query) is the point,
  * not the literal TPC-H business question.
  *
  * Float discipline throughout: money sums through DECIMAL(18,2) (exact,
  * order-independent), ratios as FLOOR(1e4·x)/1e4 of a double division whose
  * operands are exact-decimal casts — identical IEEE op order in both
  * engines, so hashes cannot flip (see Reg scaladoc).
  */
object StarQueries {

  /** Q6 — forecast revenue change: the pure multi-predicate scan-aggregate.
    * No join at all; the plan is one pushed-filter parquet scan feeding a
    * partial+final aggregate — the shape that proves selective predicates
    * (date range, discount band, quantity cap) all reach PushedFilters
    * together. */
  val q6ForecastRevenue: Reg = Reg.sql(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS cnt
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.04 AND 0.06
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Q2 — minimum-cost supplier (TPC-H Q2 shape): the correlated MIN
    * subquery (cheapest supplier per part within a region) decorrelated to
    * an ARGMIN equi-join — per-(part,supplier) aggregate, per-part min,
    * equality join back on the exact min value. Cost equality on doubles is
    * safe because both sides are MINs of the same raw parquet values (no
    * arithmetic). lineitem plays the partsupp bridge role. The per-key
    * aggregates carry no hint; the region-filtered nation does (fixed
    * 5-row dimension — the established hint policy). */
  val q2MinCostSupplier: Reg = Reg.sql(
    "q2_min_cost_supplier",
    """WITH costs AS (
      |  SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS cost
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  WHERE n.n_regionkey = 2
      |  GROUP BY l.l_partkey, l.l_suppkey),
      |mins AS (SELECT l_partkey, MIN(cost) AS min_cost FROM costs GROUP BY l_partkey)
      |SELECT p.p_partkey, p.p_brand, s.s_name, c.cost
      |FROM costs c
      |JOIN mins m ON c.l_partkey = m.l_partkey AND c.cost = m.min_cost
      |JOIN part p ON p.p_partkey = c.l_partkey
      |JOIN supplier s ON s.s_suppkey = c.l_suppkey
      |WHERE p.p_size <= 10
      |ORDER BY c.cost, p.p_partkey, s.s_name
      |LIMIT 100""".stripMargin) { (s, dir) =>
    val regionNation = Tables.nation(s, dir).where(col("n_regionkey") === 2)
      .select("n_nationkey")
    val costs = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(regionNation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("cost"))
    val mins = costs.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min("cost").as("min_cost"))
    costs
      .join(mins,
        col("l_partkey") === col("m_partkey") && col("cost") === col("min_cost"))
      .join(Tables.part(s, dir).where(col("p_size") <= 10)
          .select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey").as("s2_suppkey"),
        col("s_name")), col("l_suppkey") === col("s2_suppkey"))
      .select("p_partkey", "p_brand", "s_name", "cost")
      .orderBy(col("cost"), col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** Q8 — national market share (TPC-H Q8 shape): the longest join chain in
    * the suite (lineitem⋈part⋈orders⋈customer⋈nation⋈supplier⋈nation) with
    * nation playing two roles, feeding a conditional-sum RATIO per year —
    * share = Σ(volume | supplier-nation = X) / Σ(volume). Both sums are
    * exact decimals; the division is FLOOR-truncated. */
  val q8MarketShare: Reg = Reg.sql(
    "q8_market_share",
    """WITH v AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
      |         CAST(l.l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
      |         n2.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      |  JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
      |  JOIN nation n2 ON n2.n_nationkey = sp.s_nationkey
      |  WHERE n1.n_regionkey = 1 AND p.p_type = 'ECONOMY')
      |SELECT o_year,
      |       FLOOR(1e4 * CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |                 / CAST(SUM(volume) AS DOUBLE)) / 1e4 AS mkt_share,
      |       COUNT(*) AS cnt
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
    val custNation = Tables.nation(s, dir).where(col("n_regionkey") === 1)
      .select(col("n_nationkey").as("n_cust_key"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n_supp_key"), col("n_name").as("n_supp_name"))
    val volume = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).where(col("p_type") === "ECONOMY")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("n_cust_key"))
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("n_supp_key"))
      .select(year(col("o_orderdate")).cast("bigint").as("o_year"),
        volume.as("volume"), col("n_supp_name"))
      .groupBy("o_year")
      .agg(
        (floor(lit(1e4) *
          sum(when(col("n_supp_name") === "NATION_3", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(col("volume")).cast("double")) / 1e4).as("mkt_share"),
        count(lit(1)).as("cnt"))
      .orderBy("o_year")
  }

  /** Q10 — returned-item reporting (TPC-H Q10 shape): customer-grained
    * revenue top-k — Q3's double-sided reduction at a coarser grain, with
    * the returnflag filter on the fact and a dimension attribute (nation
    * name) carried through the aggregate. TakeOrderedAndProject caps the
    * result at 20 without a global sort. */
  val q10ReturnedItems: Reg = Reg.sql(
    "q10_returned_items",
    """SELECT c.c_custkey, c.c_name,
      |       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
      |            AS DOUBLE) AS revenue,
      |       c.c_acctbal, n.n_name
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
        .cast("double").as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q11 — important stock identification (TPC-H Q11 shape): a per-key
    * aggregate gated by a GLOBAL scalar threshold — the
    * HAVING-against-scalar-subquery decision. The canonical fixed fraction
    * of Σvalue shrinks per-part shares as part cardinality grows (TPC-H
    * itself scales the fraction by 1/SF), so the threshold is restated
    * scale-invariantly as 3× the AVERAGE per-part value — same plan shape,
    * non-degenerate result at every SF. The scalar is a second aggregate
    * over the SAME per-key frame, crossJoined in as one row. */
  val q11ImportantStock: Reg = Reg.sql(
    "q11_important_stock",
    """WITH vals AS (
      |  SELECT l.l_partkey,
      |         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  WHERE n.n_regionkey = 0
      |  GROUP BY l.l_partkey),
      |tot AS (SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) * 3.0 AS threshold
      |        FROM vals)
      |SELECT v.l_partkey, CAST(v.value AS DOUBLE) AS value
      |FROM vals v, tot
      |WHERE CAST(v.value AS DOUBLE) > tot.threshold
      |ORDER BY value DESC, v.l_partkey""".stripMargin) { (s, dir) =>
    val regionNation = Tables.nation(s, dir).where(col("n_regionkey") === 0)
      .select("n_nationkey")
    val vals = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(regionNation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value"))
    val tot = vals.agg(
      (sum(col("value")).cast("double") / count(lit(1)) * 3.0).as("threshold"))
    vals.crossJoin(tot)
      .where(col("value").cast("double") > col("threshold"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q12 — shipping-priority classes (TPC-H Q12 shape): a fact-fact join
    * whose AGGREGATE is conditional on the other fact's attribute (CASE on
    * the order's priority, grouped by the line's status) — the
    * pivot-in-aggregate shape. The testdata has no l_shipmode, so
    * linestatus plays the grouping role. */
  val q12PriorityClasses: Reg = Reg.sql(
    "q12_priority_classes",
    """SELECT l.l_linestatus,
      |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY l.l_linestatus ORDER BY l.l_linestatus""".stripMargin) { (s, dir) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linestatus"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q14 — promotion effect (TPC-H Q14 shape): a single RATIO over a
    * dimension-joined fact window — conditional revenue share of one part
    * type. One join, one aggregate, FLOOR-truncated division of two exact
    * decimal sums. */
  val q14PromoEffect: Reg = Reg.sql(
    "q14_promo_effect",
    """SELECT FLOOR(1e4 * 100.0 *
      |         CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      |                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
      |                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE))
      |         / 1e4 AS promo_revenue_pct,
      |       COUNT(*) AS cnt
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      |  AND l.l_shipdate <  TIMESTAMP '1997-04-01'""".stripMargin) { (s, dir) =>
    val volume = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(Tables.part(s, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (floor(lit(1e4) * lit(100.0) *
          sum(when(col("p_type") === "PROMO", volume)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(volume).cast("double")) / 1e4).as("promo_revenue_pct"),
        count(lit(1)).as("cnt"))
  }

  /** Q15 — top supplier (TPC-H Q15 shape): an aggregate VIEW joined back to
    * its own MAX — the argmax-over-aggregate decision (Q2 is argmin per
    * key; this is the global variant). Revenue equality is exact decimal,
    * so the tie-set is deterministic. */
  val q15TopSupplier: Reg = Reg.sql(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey),
      |mx AS (SELECT MAX(total_rev) AS m FROM rev)
      |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
      |FROM rev r JOIN mx ON r.total_rev = mx.m
      |JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("total_rev"))
    val mx = rev.agg(max("total_rev").as("m"))
    rev.join(mx, col("total_rev") === col("m"))
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Q19 — discounted revenue (TPC-H Q19 shape): an OR-of-ANDs predicate
    * MIXING both join sides (part brand/size with lineitem quantity
    * brackets) riding a single equi-join — the disjunctive-residual
    * decision: the join must stay a hash join on partkey with the
    * disjunction as residual/partial pushdown, never a nested loop over
    * the disjunction. */
  val q19DiscountedRevenue: Reg = Reg.sql(
    "q19_discounted_revenue",
    """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
      |            AS DOUBLE) AS revenue,
      |       COUNT(*) AS cnt
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, dir) =>
    val qty = col("l_quantity")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        qty.between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        qty.between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        qty.between(20, 30))
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .where(cond)
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Q20 — potential part promotion (TPC-H Q20 shape): a NESTED semi-join
    * chain — suppliers IN (bridge rows whose part is IN (a name/size part
    * list) AND whose aggregated shipped quantity clears a threshold) — two
    * semi-joins deep with an aggregate in the middle, the
    * semi-reduction-of-a-semi-reduction decision. lineitem plays the
    * partsupp bridge; the availability test is restated as "shipped > 50
    * units in the window". */
  val q20PromotableSuppliers: Reg = Reg.sql(
    "q20_promotable_suppliers",
    """WITH shipped AS (
      |  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey, l_partkey)
      |SELECT s.s_name, s.s_acctbal
      |FROM supplier s
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE n.n_regionkey = 3
      |  AND s.s_suppkey IN (
      |    SELECT l_suppkey FROM shipped
      |    WHERE l_partkey IN (SELECT p_partkey FROM part
      |                        WHERE p_name LIKE '%a%' AND p_size > 20)
      |      AND qty > 50)
      |ORDER BY s.s_name""".stripMargin) { (s, dir) =>
    val parts = Tables.part(s, dir)
      .where(col("p_name").like("%a%") && col("p_size") > 20)
      .select("p_partkey")
    val hot = Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("qty"))
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .where(col("qty") > 50)
      .select("l_suppkey")
    val regionNation = Tables.nation(s, dir).where(col("n_regionkey") === 3)
      .select("n_nationkey")
    Tables.supplier(s, dir)
      .join(broadcast(regionNation), col("s_nationkey") === col("n_nationkey"))
      .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  val all: Seq[Reg] = Seq(
    q6ForecastRevenue, q2MinCostSupplier, q8MarketShare, q10ReturnedItems,
    q11ImportantStock, q12PriorityClasses, q14PromoEffect, q15TopSupplier,
    q19DiscountedRevenue, q20PromotableSuppliers)
}
