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
}
