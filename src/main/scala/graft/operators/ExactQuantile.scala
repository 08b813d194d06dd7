package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.DoubleOrderBitsExpression

/** Exact order statistics over a column without a global sort —
  * "the exact median of 100 TB in a few histogram passes". Spark's own
  * exact `percentile` collects per-group value buffers (ObjectHashAggregate
  * state grows with distinct values), and a global ORDER BY ranks through a
  * full shuffle; this operator instead descends a bucket histogram:
  *
  *   1. one aggregate pass counts rows per `value DIV width` bucket; the
  *      bucket frame is collected (≤ fanout × active-range rows —
  *      driver-bounded by construction, the same bounded-collect contract
  *      as the mutation path's partition lists);
  *   2. the bucket containing global rank k is located by a cumulative walk
  *      over that tiny frame, and the search recurses into ONLY that
  *      bucket's rows with a narrower width (each level divides the value
  *      range by `fanout`);
  *   3. when the remaining range collapses (width 1) the bucket value IS
  *      the answer; when the remaining row count is small, one
  *      TakeOrdered finishes exactly.
  *
  * A RANK VECTOR shares one descent ([[valueAtRanks]]): each level runs a
  * SINGLE aggregate serving every still-active rank — the row is tagged
  * with which active range it falls in (ranges are pairwise disjoint by
  * construction: every level-ℓ range is a bucket of a level-(ℓ−1) range)
  * and bucketed within it, so median + p95 + p99 together still cost
  * ⌈log_fanout(range)⌉ + 1 aggregate jobs, not one descent per rank.
  *
  * DOUBLE columns ride the order-preserving IEEE-754 bit map
  * ([[graft.plans.DoubleOrderBitsExpression]]): descend on the mapped
  * longs, reverse-map the found value — exactness is untouched because the
  * map is an order isomorphism and equal doubles share one bit pattern.
  * (NaN maps above +Infinity — totalOrder convention; rows with NULL are
  * excluded, NaN is not.)
  *
  * Each level is one aggregate over a geometrically shrinking filtered
  * scan: ⌈log_fanout(range)⌉ + 1 jobs total, every shuffle a
  * bucket-histogram aggregate, no corpus-sized sort anywhere. Ties and
  * negatives are handled exactly (floor-div bucketing keeps order).
  */
object ExactQuantile {

  /** Value at ascending 1-indexed `rank` of `valueCol` (integral).
    * @param fanout buckets per level (histogram width divisor)
    * @param directLimit below this many candidate rows, finish with one
    *                    TakeOrdered instead of another histogram level */
  def valueAtRank(
      df: DataFrame,
      valueCol: String,
      rank: Long,
      fanout: Int = 4096,
      directLimit: Long = 65536L): Long =
    valueAtRanks(df, valueCol, Seq(rank), fanout, directLimit).head

  /** One shared histogram descent serving a whole rank vector: returns the
    * value at each ascending 1-indexed rank of `valueCol` (integral), in
    * the order given. One aggregate job per level TOTAL (all active ranks
    * share it), plus at most one small TakeOrdered per rank on the
    * collapsed residue. */
  def valueAtRanks(
      df: DataFrame,
      valueCol: String,
      ranks: Seq[Long],
      fanout: Int = 4096,
      directLimit: Long = 65536L): Seq[Long] = {
    require(ranks.nonEmpty, "need at least one rank")
    require(fanout >= 2, s"fanout must be >= 2 (got $fanout)")
    ranks.foreach(r => require(r >= 1, s"rank must be >= 1, got $r"))
    val vals = df.select(col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
    // initial range: one aggregate, three longs back
    val r0 = vals.agg(min("__v"), max("__v"), count(lit(1))).head()
    require(!r0.isNullAt(0), "no rows to rank")
    val (lo0, hi0, n0) = (r0.getLong(0), r0.getLong(1), r0.getLong(2))
    ranks.foreach(r => require(r <= n0, s"rank $r > row count $n0"))

    // Mutable per-rank descent state; ranks sharing a bucket share a range.
    final class St(var lo: Long, var hi: Long, var k: Long,
                   var remaining: Long, var res: Long, var done: Boolean)
    val sts = ranks.map(r => new St(lo0, hi0, r, n0, 0L, false)).toArray
    sts.foreach(s => if (s.hi == s.lo) { s.res = s.lo; s.done = true })

    def needsHistogram(s: St): Boolean =
      !s.done && s.hi > s.lo && s.remaining > directLimit

    var level = sts.filter(needsHistogram)
    while (level.nonEmpty) {
      // Distinct active ranges — disjoint by the bucket-of-parent invariant,
      // so a row belongs to at most one and a CASE chain tags it exactly.
      val ranges = level.map(s => (s.lo, s.hi)).distinct
      // BigInt end-to-end: a range can span nearly the full long domain
      // (the double bit map uses all 64 bits), so (hi - lo) wraps in plain
      // long math — and at fanout 2 the width itself is 2^63, one past
      // Long.MaxValue, so it must never be narrowed to a long
      val widths = ranges.map { case (lo, hi) =>
        ((BigInt(hi) - BigInt(lo)) / fanout + 1).max(1) // ceil ⇒ ≤ fanout buckets
      }
      val ridOf = ranges.zipWithIndex.toMap
      val ridCol = ranges.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, ((lo, hi), rid)) =>
          when(col("__v").between(lo, hi), lit(rid.toLong)).otherwise(acc)
      }
      // DECIMAL(21,0) keeps (__v - lo) exact where BIGINT would overflow
      // (ANSI mode faults the wrap); IntegralDivide brings it back to LONG
      val bCol = ranges.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, ((lo, hi), rid)) =>
          when(col("__v").between(lo, hi),
            expr(s"CAST((CAST(__v AS DECIMAL(21,0)) - ${lo}) DIV " +
              s"CAST(${widths(rid)} AS DECIMAL(21,0)) AS BIGINT)"))
            .otherwise(acc)
      }
      // ONE aggregate for every active rank this level; the range filter
      // pushes to the scan, so the pass reads only the union of active
      // ranges (geometrically shrinking). ≤ |ranges| × fanout rows back.
      val hist = vals.select(ridCol.as("__r"), bCol.as("__b"))
        .where(col("__r").isNotNull)
        .groupBy("__r", "__b").agg(count(lit(1)).as("__c"))
        .collect()
      val byRid: Map[Long, Array[(Long, Long)]] = hist
        .groupBy(_.getLong(0))
        .map { case (r, rows) =>
          r -> rows.map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
        }
      level.foreach { s =>
        val rid = ridOf((s.lo, s.hi)).toLong
        val width = widths(rid.toInt)
        val h = byRid(rid)
        var i = 0
        var cum = 0L
        var found = -1L
        var cnt = 0L
        while (i < h.length && found < 0) {
          val (b, c) = h(i)
          if (cum + c >= s.k) { found = b; cnt = c; s.k -= cum }
          else cum += c
          i += 1
        }
        // BigInt intermediates again: found*width can exceed Long.Max even
        // though the final bounds land back inside [lo, hi]
        val bLo = (BigInt(s.lo) + found * width).toLong
        s.lo = bLo
        s.hi = (BigInt(s.hi) min (bLo + width - 1)).toLong
        s.remaining = cnt
        if (s.hi == s.lo) { s.res = s.lo; s.done = true }
      }
      level = sts.filter(needsHistogram)
    }
    // small residues: k-th smallest via per-partition top-k merge, one
    // bounded TakeOrdered per still-open rank
    sts.foreach { s =>
      if (!s.done) {
        s.res = vals.where(col("__v").between(s.lo, s.hi))
          .orderBy("__v").limit(s.k.toInt)
          .agg(max("__v")).head().getLong(0)
        s.done = true
      }
    }
    sts.map(_.res).toSeq
  }

  /** Exact value at `rank` of a DOUBLE column: histogram descent over the
    * order-isomorphic bit-mapped longs, reverse-mapped. */
  def valueAtRankDouble(
      df: DataFrame,
      valueCol: String,
      rank: Long,
      fanout: Int = 4096,
      directLimit: Long = 65536L): Double =
    valueAtRanksDouble(df, valueCol, Seq(rank), fanout, directLimit).head

  /** Rank-vector form for DOUBLE columns: one shared descent on the mapped
    * longs, each result reverse-mapped to the exact dataset element. */
  def valueAtRanksDouble(
      df: DataFrame,
      valueCol: String,
      ranks: Seq[Long],
      fanout: Int = 4096,
      directLimit: Long = 65536L): Seq[Double] = {
    val mapped = df.select(ColumnBridge.column(DoubleOrderBitsExpression(
      ColumnBridge.expression(col(valueCol).cast("double")))).as("__m"))
    valueAtRanks(mapped, "__m", ranks, fanout, directLimit)
      .map(DoubleOrderBitsExpression.fromBits)
  }

  /** Lower-median convenience: rank ⌈n/2⌉. */
  def medianExact(df: DataFrame, valueCol: String): (Long, Long, Long) = {
    val n = df.where(col(valueCol).isNotNull).count()
    require(n > 0, "median of an empty frame")
    val k = (n + 1) / 2
    (n, k, valueAtRank(df, valueCol, k))
  }
}
