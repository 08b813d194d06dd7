package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-bucketed fact layout — the shuffle-elimination half of the 100 TB
  * story that the localizer/aggregation comments promise
  * (`BatchLocalizer.localizeAll`: "optionally pre-bucketed by bssid to make
  * this shuffle-free").
  *
  * The measurement fact table is written ONCE bucketed (and sorted) by the
  * analysis key; every later `groupBy`/join on that key then reads
  * bucket-aligned files and skips its Exchange entirely — the dominant cost
  * of A3/A9/R7-style per-AP analytics at scale is that one hash shuffle of
  * the full fact table, and bucketing amortizes it across every downstream
  * job. The reference's Iceberg DDL has the same intent with its
  * `bucket(bssid, N)` partition transform
  * (`documents/wifi_measurement_s3_table_schema.md:49-57`).
  *
  * Sizing: buckets should hold ~100–500 MB each at the target scale (e.g.
  * 100 TB / 256 MB ≈ 400k buckets is too many for small dimensions — bucket
  * the FACT table only, and pick a power of two so a later re-bucketing can
  * split/merge buckets without a full reshuffle).
  */
object BucketedLayout {

  /** Write `df` as a parquet table bucketed + sorted by `bucketCol`,
    * registered in the session catalog (bucket metadata lives there; a bare
    * `spark.read.parquet(path)` would not know the layout). */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
