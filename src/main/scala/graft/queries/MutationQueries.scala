package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables
import graft.mutation.MergeOps

/** A6–A8 end-to-end over a scratch parquet table: build a fact table from
  * lineitem, MAD-detect outliers (A9), label them (A6 UPDATE emulation),
  * purge them (A7 DELETE), and report the before/after counts.
  *
  * Fully oracled: the mutation itself is not a SQL query, but all four
  * output counts are pure MAD arithmetic over lineitem, so DuckDB can state
  * them exactly — labeling N outliers labels N rows, purging them removes
  * exactly those rows. A hash mismatch here would catch a broken UPDATE
  * (labels missing/extra rows) or DELETE (wrong predicate), not just a
  * broken detection. */
object MutationQueries {

  /** A6/A7 as the production daily maintenance job: the fact table is laid
    * out by an ingestion-day partition, detection runs over ONE day's
    * window, and both the label UPDATE and the purge DELETE are
    * partition-scoped — exactly one directory is rewritten (twice) while
    * every other partition's files stay byte-identical (MergeOpsSpec
    * asserts the byte-identity; this query gates the counts). Cost scales
    * with the detection window, not the table — the 100 TB shape. */
  val mergeLabelPurge: Reg = Reg.sql(
    "a6_merge_label_purge",
    """WITH fact AS (
      |  SELECT l_partkey AS bssid, l_suppkey % 8 AS day, l_extendedprice AS value
      |  FROM lineitem
      |), win AS (
      |  SELECT * FROM fact WHERE day = 3
      |), med AS (
      |  SELECT bssid, MEDIAN(value) AS med FROM win GROUP BY bssid
      |), dev AS (
      |  SELECT f.bssid, f.day, ABS(f.value - m.med) AS adev
      |  FROM win f JOIN med m ON f.bssid = m.bssid
      |), mad AS (
      |  SELECT bssid, MEDIAN(adev) AS mad FROM dev GROUP BY bssid
      |), outliers AS (
      |  SELECT d.bssid, d.day FROM dev d JOIN mad t ON d.bssid = t.bssid
      |  WHERE d.adev > 3 * t.mad
      |)
      |SELECT (SELECT COUNT(*) FROM fact) AS rows_before,
      |       (SELECT COUNT(*) FROM outliers) AS outliers_detected,
      |       (SELECT COUNT(*) FROM outliers) AS rows_labeled,
      |       (SELECT COUNT(DISTINCT day) FROM outliers) AS partitions_rewritten,
      |       (SELECT COUNT(*) FROM fact) - (SELECT COUNT(*) FROM outliers)
      |         AS rows_after_purge""".stripMargin) { (s, dir) =>
    val work = Files.createTempDirectory("graft_mutation").toString + "/fact"
    Tables.lineitem(s, dir)
      .select(
        concat_ws(":", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_partkey")).as("event_id"),
        col("l_partkey").as("bssid"),
        (col("l_suppkey") % 8).as("day"),
        col("l_extendedprice").as("value"),
        lit(null).cast("boolean").as("is_global_outlier"),
        lit(null).cast("double").as("global_outlier_distance"),
        lit(null).cast("double").as("global_outlier_threshold"),
        lit(null).cast("string").as("global_detection_algorithm"),
        lit(null).cast("timestamp").as("global_detection_timestamp"),
        lit(null).cast("string").as("global_detection_version"))
      // One shuffle keyed on the partition column aligns writers with
      // directories: 1 file per day instead of (tasks x days) small files —
      // the write-aligned layout the ingestion-date table uses at scale.
      .repartition(col("day"))
      .write.partitionBy("day").parquet(work)

    // A9 over the day=3 detection window: per-key MAD on value (same math
    // as the oracled query). The scan is partition-pruned to one directory.
    val t = s.read.parquet(work)
    val win = t.where(col("day") === 3)
    val med = win.groupBy("bssid").agg(expr("percentile(value, 0.5)").as("med"))
    val dev = win.join(med, "bssid")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("bssid").agg(expr("percentile(adev, 0.5)").as("mad"))
    val outliers = dev.join(mad, "bssid")
      .where(col("adev") > lit(3) * col("mad"))
      .select(col("event_id"), col("adev").as("distance"), col("day"))
      // consumed three times (count + label join + purge planning) and its
      // lineage reads the files the swap replaces — materialize once
      .localCheckpoint()

    val before = t.count()
    val outlierCnt = outliers.count()
    val labeledParts = MergeOps.labelOutliersPartitioned(
      s, work, "day", outliers, threshold = 3.0) // A6
    val labeled = s.read.parquet(work).where("is_global_outlier = true").count()
    MergeOps.deleteWherePartitioned( // A7 — prunes to the labeled day
      s, work, "day", col("day") === 3 && col("is_global_outlier") === true)
    val after = s.read.parquet(work).count()

    import s.implicits._
    Seq((before, outlierCnt, labeled, labeledParts.size.toLong, after))
      .toDF("rows_before", "outliers_detected", "rows_labeled",
        "partitions_rewritten", "rows_after_purge")
  }

  /** A8 — partition-scoped purge, FULLY oracled: the scratch fact table is
    * laid out by a day partition (the ingestion-date layout, schema doc
    * :49-57), and the DELETE's predicate pins one partition — so exactly one
    * directory is rewritten while every other partition's files stay
    * byte-identical (MergeOpsSpec asserts that property; this query gates
    * the counts). This is the 100 TB mutation shape: cost scales with the
    * affected partitions, not the table. */
  val purgePartitioned: Reg = Reg.sql(
    "a8_purge_partitioned",
    """WITH fact AS (
      |  SELECT l_suppkey % 8 AS day, l_extendedprice AS value FROM lineitem)
      |SELECT (SELECT COUNT(*) FROM fact) AS rows_before,
      |       (SELECT COUNT(DISTINCT day) FROM fact
      |        WHERE day = 3 AND value > 30000.0) AS partitions_rewritten,
      |       (SELECT COUNT(*) FROM fact
      |        WHERE day = 3 AND value > 30000.0) AS rows_deleted,
      |       (SELECT COUNT(*) FROM fact) -
      |       (SELECT COUNT(*) FROM fact WHERE day = 3 AND value > 30000.0)
      |         AS rows_after""".stripMargin) { (s, dir) =>
    val work = Files.createTempDirectory("graft_mutation_part").toString + "/fact"
    Tables.lineitem(s, dir)
      .select(
        concat_ws(":", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_partkey")).as("event_id"),
        (col("l_suppkey") % 8).as("day"),
        col("l_extendedprice").as("value"))
      .repartition(col("day")) // writer-aligned: 1 file per day directory
      .write.partitionBy("day").parquet(work)

    val before = s.read.parquet(work).count()
    val affected = MergeOps.deleteWherePartitioned(
      s, work, "day", col("day") === 3 && col("value") > 30000.0)
    val after = s.read.parquet(work).count()

    import s.implicits._
    Seq((before, affected.size.toLong, before - after, after))
      .toDF("rows_before", "partitions_rewritten", "rows_deleted", "rows_after")
  }

  val all: Seq[Reg] = Seq(mergeLabelPurge, purgePartitioned)
}
