package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: match each point row `v` to every interval row with
  * `lo <= v <= hi` — the reference's "does this balance/RSSI/timestamp fall
  * in a configured band" lookups, set-oriented.
  *
  * Spark plans a raw non-equi join (`p.v BETWEEN i.lo AND i.hi`) as a
  * BroadcastNestedLoopJoin — O(|points| · |intervals|) comparisons, the
  * classic 100× scale-killer when the interval side outgrows a broadcast.
  * The scalable encoding buckets the value domain with a fixed width `w`:
  * each interval explodes to its ceil((hi−lo)/w)+1 covering buckets, each
  * point maps to floor(v/w), and the match becomes an EQUI-join on the
  * bucket id plus a residual `BETWEEN` filter. One hash shuffle each side,
  * pair work proportional to true selectivity, never |points|·|intervals|.
  *
  * Pick `w` near the median interval length: cost is
  * O(|intervals| · len/w) exploded rows vs O(|points|) candidate pairs per
  * co-resident bucket. `maxBucketsPerInterval` guards the degenerate
  * all-spanning interval (it would explode the dimension side AND funnel
  * every point through its buckets): intervals wider than the cap fail fast
  * with the width to fix, instead of silently producing a mega-skew job.
  */
object RangeJoin {

  /** @param points     fact side; `pointCol` is the numeric probe value
    * @param intervals  interval side carrying `loCol`/`hiCol` (inclusive)
    * @param bucketWidth domain bucket width (same units as `pointCol`)
    * @param maxBucketsPerInterval fail-fast cap on per-interval explosion
    */
  def bucketed(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    val loBucket = floor(col(loCol) / bucketWidth)
    val hiBucket = floor(col(hiCol) / bucketWidth)
    // The explosion guard lives INSIDE the consumed expression: a separate
    // audit column would be dead code Catalyst prunes before it can fire.
    val coveringBuckets = when(
      hiBucket - loBucket + 1 > maxBucketsPerInterval,
      raise_error(concat(
        lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval " +
          s"buckets at width $bucketWidth — widen bucketWidth ("),
        col(loCol), lit(".."), col(hiCol), lit(")"))).cast("array<bigint>"))
      .otherwise(sequence(loBucket, hiBucket))
    val exploded = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(coveringBuckets))

    val probed = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))

    probed.join(exploded, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval OVERLAP join: all (left, right) pairs with
    * `l.lo <= r.hi AND r.lo <= l.hi` (inclusive), equi-keyed by `on`.
    * Both sides explode to their covering buckets and equi-join on
    * (key, bucket); a pair that co-resides in several buckets would then
    * appear several times, so each pair is emitted ONLY from its canonical
    * bucket — the one containing `max(l.lo, r.lo)`, which overlap
    * guarantees both intervals cover. No distinct, no post-dedup shuffle.
    * Column names must be disjoint across the two inputs (rename first). */
  def overlapJoin(
      left: DataFrame,
      leftLo: String,
      leftHi: String,
      right: DataFrame,
      rightLo: String,
      rightHi: String,
      on: Seq[String],
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    def explodeSide(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = floor(col(lo) / bucketWidth)
      val hiB = floor(col(hi) / bucketWidth)
      val buckets = when(
        hiB - loB + 1 > maxBucketsPerInterval,
        raise_error(lit(s"RangeJoin.overlapJoin: interval spans more than " +
          s"$maxBucketsPerInterval buckets at width $bucketWidth — widen bucketWidth"))
          .cast("array<bigint>"))
        .otherwise(sequence(loB, hiB))
      df.where(col(lo) <= col(hi)).withColumn("__bucket", explode(buckets))
    }

    val l = explodeSide(left, leftLo, leftHi)
    val r = explodeSide(right, rightLo, rightHi)
    l.join(r, on :+ "__bucket")
      .where(
        col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
          col("__bucket") === floor(greatest(col(leftLo), col(rightLo)) / bucketWidth))
      .drop("__bucket")
  }
}
