package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistic over an integral column without a global sort —
  * "the exact median of 100 TB in a few histogram passes". Spark's own
  * exact `percentile` collects per-group value buffers (ObjectHashAggregate
  * state grows with distinct values), and a global ORDER BY ranks through a
  * full shuffle; this operator instead descends a bucket histogram:
  *
  *   1. one aggregate pass counts rows per `value DIV width` bucket; the
  *      bucket frame is collected (domain/width rows — driver-bounded by
  *      the width choice, the same bounded-collect contract as the
  *      mutation path's partition lists);
  *   2. the bucket containing global rank k is located by a cumulative walk
  *      over that tiny frame, and the search recurses into ONLY that
  *      bucket's rows with a narrower width (each level divides the value
  *      range by `fanout`);
  *   3. when the remaining range collapses (width 1) the bucket value IS
  *      the answer; when the remaining row count is small, one
  *      TakeOrdered finishes exactly.
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
      directLimit: Long = 65536L): Long = {
    require(rank >= 1, s"rank must be >= 1, got $rank")
    val vals = df.select(col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
    // initial width from the value range: one aggregate, two longs back
    val r0 = vals.agg(min("__v"), max("__v"), count(lit(1))).head()
    require(!r0.isNullAt(0), "no rows to rank")
    val (lo0, hi0, n0) = (r0.getLong(0), r0.getLong(1), r0.getLong(2))
    require(rank <= n0, s"rank $rank > row count $n0")

    var cur = vals
    var k = rank
    var lo = lo0
    var hi = hi0
    var remaining = n0
    while (hi > lo && remaining > directLimit) {
      // ceil so the histogram always has <= fanout buckets
      val width = math.max(1L, (hi - lo) / fanout + 1L)
      val hist = cur
        .groupBy(expr(s"(__v - ${lo}L) DIV ${width}L").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .orderBy("__b")
        .collect() // <= fanout rows by construction
      var i = 0
      var cum = 0L
      var found = -1L
      var cnt = 0L
      while (i < hist.length && found < 0) {
        val c = hist(i).getLong(1)
        if (cum + c >= k) { found = hist(i).getLong(0); cnt = c; k -= cum }
        else cum += c
        i += 1
      }
      val bLo = lo + found * width
      val bHi = math.min(hi, bLo + width - 1)
      cur = cur.where(col("__v") >= bLo && col("__v") <= bHi)
      lo = bLo
      hi = bHi
      remaining = cnt
    }
    if (hi == lo) lo
    else
      // small residue: k-th smallest via per-partition top-k merge
      cur.orderBy("__v").limit(k.toInt)
        .agg(max("__v")).head().getLong(0)
  }

  /** Lower-median convenience: rank ⌈n/2⌉. */
  def medianExact(df: DataFrame, valueCol: String): (Long, Long, Long) = {
    val n = df.where(col(valueCol).isNotNull).count()
    require(n > 0, "median of an empty frame")
    val k = (n + 1) / 2
    (n, k, valueAtRank(df, valueCol, k))
  }
}
