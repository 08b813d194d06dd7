package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running sum — the primitive behind "position in a
  * totally ordered corpus": training-shard assignment by cumulative token
  * count, byte offsets for concatenated exports, exact CDF positions.
  *
  * A global cumulative sum is the canonical accidental-scale-killer: the
  * naive `Window.orderBy(key)` with no partition funnels the whole corpus
  * through ONE partition. This is the two-level form instead:
  *
  *   1. rows bucket by `orderCol DIV bucketWidth` — contiguous key ranges,
  *      so bucket order ≡ key order;
  *   2. per-bucket totals (one hash aggregate) form a corpus/bucketWidth-
  *      sized frame whose running offsets cost one small window — pick
  *      bucketWidth so this frame is broadcast-trivial (≤ ~10⁶ rows covers
  *      a 10¹²-row corpus at width 10⁶; add a second level before that
  *      ever binds);
  *   3. each row's global prefix = its bucket's offset (joined back
  *      hint-free — AQE broadcasts the small frame adaptively) plus a
  *      WITHIN-bucket running sum — a hash-partitioned window, fully
  *      parallel.
  *
  * `orderCol` must be integral and UNIQUE per row (a ROWS frame under ties
  * would make the prefix order-dependent); values must be non-negative
  * longs. The caller's frame comes back unchanged plus `cum_before` = sum
  * of `valueCol` over all rows with strictly smaller `orderCol`.
  */
object PrefixSum {

  def globalCumsum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val base = df.withColumn("__b", expr(s"$orderCol DIV $bucketWidth"))
    val wB = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("__b")
      .agg(sum(col(valueCol).cast("long")).as("__bc"))
      .select(col("__b"), coalesce(sum("__bc").over(wB), lit(0L)).as("__boff"))
    val wIn = Window.partitionBy("__b").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // No broadcast hint on the offset frame: it scales with rows/bucketWidth
    // (a fraction, not a constant size), so a hint would pin a driver OOM to
    // a bad width choice. AQE broadcasts it adaptively whenever it is small
    // — every sane width — and degrades to a shuffle join instead of an OOM
    // beyond that (the repo's standing rule for data-scaling frames).
    base.join(offs, "__b")
      .withColumn("cum_before",
        col("__boff") + coalesce(sum(col(valueCol).cast("long")).over(wIn), lit(0L)))
      .drop("__b", "__boff")
  }
}
