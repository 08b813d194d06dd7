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
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_mutation"))
    val work = root.toString + "/fact"
    try {
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
    } finally deleteRecursively(root.toFile)
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
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_mutation_part"))
    val work = root.toString + "/fact"
    try {
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
    } finally deleteRecursively(root.toFile)
  }

  /** A19 — the periodic small-file compaction job, driven end to end under
    * the gate: partition day=3 is deliberately written as 25 small files
    * (the accretion pattern of per-micro-batch merges / repeated point
    * mutations), `oversizedPartitions` must name exactly that partition,
    * and `compactPartitions` rewrites it to ONE file through the same
    * atomic-swap protocol — content-identically (the reference counterpart
    * is Iceberg's `rewrite_data_files`). The oracle pins the construction
    * constants (25 → 1 files, 1 partition) AND the content checksum
    * (row count + DECIMAL value sum) that must survive the rewrite; the
    * Spark side emits MEASURED values, so a compaction that dropped or
    * duplicated rows, or failed to merge files, hash-mismatches. */
  val compactSmallFiles: Reg = Reg.sql(
    "a19_compact_partitions",
    """WITH fact AS (
      |  SELECT l_suppkey % 8 AS day, l_extendedprice AS value FROM lineitem)
      |SELECT CAST(1 AS BIGINT) AS partitions_compacted,
      |       CAST(25 AS BIGINT) AS files_before,
      |       CAST(1 AS BIGINT) AS files_after,
      |       (SELECT COUNT(*) FROM fact WHERE day = 3) AS day3_rows,
      |       (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |        FROM fact WHERE day = 3) AS day3_value_sum,
      |       (SELECT COUNT(*) FROM fact) AS total_rows""".stripMargin) { (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_compact"))
    val work = root.toString + "/fact"
    try {
      val fact = Tables.lineitem(s, dir)
        .select(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("l_partkey")).as("event_id"),
          (col("l_suppkey") % 8).as("day"),
          col("l_extendedprice").as("value"))
        // one lineitem scan serves both era writes
        .localCheckpoint(false)
      // healthy partitions: writer-aligned, 1 file each
      fact.where(col("day") =!= 3)
        .repartition(col("day")).write.partitionBy("day").parquet(work)
      // the fragmented partition: 25 files of day=3 rows
      fact.where(col("day") === 3)
        .repartition(25).write.mode("append").partitionBy("day").parquet(work)

      def fileCount(v: String): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$work/day=$v")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_")).toLong
      }
      def checksum() = s.read.parquet(work).where(col("day") === 3)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("vs"))
        .head()

      val filesBefore = fileCount("3")
      val candidates = MergeOps.oversizedPartitions(s, work, "day", maxFiles = 8)
      MergeOps.compactPartitions(s, work, "day", candidates, numFiles = 1)
      val filesAfter = fileCount("3")
      val after = checksum()
      val total = s.read.parquet(work).count()

      import s.implicits._
      Seq((candidates.size.toLong, filesBefore, filesAfter,
        after.getLong(0), after.getDouble(1), total))
        .toDF("partitions_compacted", "files_before", "files_after",
          "day3_rows", "day3_value_sum", "total_rows")
    } finally deleteRecursively(root.toFile)
  }

  /** S11 — schema evolution across partition eras (the reference's fact
    * table carries a `data_version` column for exactly this): the v1 era
    * (days 0–1) is written WITHOUT the later `quality_weight` column, the
    * v2 era (days 2–3) adds it, and a `mergeSchema` read unifies both —
    * v1 rows surface the added column as NULL, defaulted at read time with
    * `coalesce`. The oracle states the same unified view straight from
    * lineitem, so a broken merge (dropped column, misaligned default,
    * rows read under the wrong era) hash-mismatches. quality_weight is
    * integer-valued (floor(value/100)) so its sums are IEEE-exact.
    *
    * 100 TB shape: schema evolution by ADDING nullable columns is the only
    * kind that needs no rewrite of old partitions — the merged read costs
    * footer unions, not data I/O. */
  val schemaEvolution: Reg = Reg.sql(
    "s11_schema_evolution",
    """WITH fact AS (
      |  SELECT l_suppkey % 4 AS day, l_extendedprice AS value FROM lineitem),
      |unified AS (
      |  SELECT day, value,
      |         CASE WHEN day >= 2 THEN '2.0' ELSE '1.0' END AS data_version,
      |         CASE WHEN day >= 2 THEN FLOOR(value / 100.0) END AS quality_weight
      |  FROM fact)
      |SELECT data_version,
      |       COUNT(*) AS cnt,
      |       COUNT(quality_weight) AS rows_with_weight,
      |       CAST(SUM(COALESCE(quality_weight, 1.0)) AS DOUBLE) AS sum_eff_weight
      |FROM unified GROUP BY data_version ORDER BY data_version""".stripMargin) { (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_schema_evo"))
    val work = root.toString + "/fact"
    try {
      val fact = Tables.lineitem(s, dir)
        .select(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("l_partkey")).as("event_id"),
          (col("l_suppkey") % 4).as("day"),
          col("l_extendedprice").as("value"))
      fact.where(col("day") < 2)
        .withColumn("data_version", lit("1.0"))
        .repartition(col("day")).write.partitionBy("day").parquet(work)
      fact.where(col("day") >= 2)
        .withColumn("data_version", lit("2.0"))
        .withColumn("quality_weight", floor(col("value") / 100.0).cast("double"))
        .repartition(col("day")).write.mode("append").partitionBy("day").parquet(work)

      val unified = s.read.option("mergeSchema", "true").parquet(work)
      val agg = unified.groupBy("data_version")
        .agg(
          count(lit(1)).as("cnt"),
          count(col("quality_weight")).as("rows_with_weight"),
          sum(coalesce(col("quality_weight"), lit(1.0)))
            .cast("double").as("sum_eff_weight"))
        .orderBy("data_version")
      // few-row aggregate: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally deleteRecursively(root.toFile)
  }

  /** A31 — the GDPR/right-to-be-forgotten sweep, driven end to end under
    * the gate: delete EVERY event of a target user set from the
    * date-partitioned fact table (partition-scoped copy-on-write — cost
    * scales with affected dates, rewrites run concurrently), then repair
    * the DERIVED per-day aggregate table INCREMENTALLY by subtracting the
    * deleted slice's pre-computed aggregates (the a23 algebraic-merge
    * property in reverse — no full recompute of history), and emit the
    * governance audit. The gate pins three proofs at once:
    * `remaining_target_rows` is measured by re-scanning the POST-DELETE
    * files (the absence proof a compliance audit actually wants, pinned
    * to 0), and the repaired derived totals are emitted NEXT TO a full
    * recompute from the post-delete table — the oracle states both from
    * one closed form, so a drifting incremental repair hash-mismatches.
    * Money math in DECIMAL(18,2) end to end (the float discipline). */
  val forgetUser: Reg = Reg.sql(
    "a31_forget_user",
    """WITH fact AS (
      |  SELECT event_id % 8 AS day, user_id,
      |         CAST(value AS DECIMAL(18,2)) AS value
      |  FROM events),
      |del AS (SELECT * FROM fact WHERE user_id % 97 = 0),
      |kept AS (SELECT * FROM fact WHERE user_id % 97 <> 0)
      |SELECT (SELECT COUNT(*) FROM fact) AS rows_before,
      |       (SELECT COUNT(*) FROM del) AS rows_deleted,
      |       (SELECT COUNT(*) FROM kept) AS rows_after,
      |       (SELECT COUNT(DISTINCT day) FROM del) AS partitions_rewritten,
      |       CAST(0 AS BIGINT) AS remaining_target_rows,
      |       (SELECT COUNT(*) FROM kept) AS repaired_total_rows,
      |       (SELECT COUNT(*) FROM kept) AS recomputed_total_rows,
      |       (SELECT CAST(SUM(value) AS DOUBLE) FROM kept)
      |         AS repaired_value_sum,
      |       (SELECT CAST(SUM(value) AS DOUBLE) FROM kept)
      |         AS recomputed_value_sum""".stripMargin) { (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_forget"))
    val work = root.toString + "/fact"
    try {
      val target = col("user_id") % 97 === 0
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (col("event_id") % 8).as("day"),
          col("value").cast("decimal(18,2)").as("value"))
        .repartition(col("day"))
        .write.partitionBy("day").parquet(work)

      def dayAgg(df: org.apache.spark.sql.DataFrame) = df.groupBy("day")
        .agg(count(lit(1)).as("n"), sum("value").as("v"))

      val before = s.read.parquet(work).count()
      // derived table + the deleted slice's aggregates, both BEFORE the
      // sweep (the repair inputs a real pipeline would already have)
      val derivedBefore = dayAgg(s.read.parquet(work)).localCheckpoint(false)
      val delAgg = dayAgg(s.read.parquet(work).where(target))
        .select(col("day"), col("n").as("dn"), col("v").as("dv"))
        .localCheckpoint(false)

      val affected = MergeOps.deleteWherePartitioned(s, work, "day", target)

      // absence proof: re-scan the post-delete files for target rows
      val remaining = s.read.parquet(work).where(target).count()
      val after = s.read.parquet(work).count()

      // incremental repair vs full recompute — the audit's consistency leg
      val repaired = derivedBefore
        .join(delAgg, Seq("day"), "left")
        .select(
          (col("n") - coalesce(col("dn"), lit(0L))).as("n"),
          (col("v") - coalesce(col("dv"), lit(java.math.BigDecimal.ZERO)
            .cast("decimal(18,2)"))).as("v"))
        .agg(sum("n").cast("bigint"), sum("v").cast("double")).head()
      val recomputed = dayAgg(s.read.parquet(work))
        .agg(sum("n").cast("bigint"), sum("v").cast("double")).head()

      import s.implicits._
      Seq((before, before - after, after, affected.size.toLong, remaining,
        repaired.getLong(0), recomputed.getLong(0),
        repaired.getDouble(1), recomputed.getDouble(1)))
        .toDF("rows_before", "rows_deleted", "rows_after",
          "partitions_rewritten", "remaining_target_rows",
          "repaired_total_rows", "recomputed_total_rows",
          "repaired_value_sum", "recomputed_value_sum")
    } finally deleteRecursively(root.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A20 — the pre-bucketed fact layout under the oracle gate: events are
    * written ONCE bucketed+sorted by user_id (`BucketedLayout`, the
    * shuffle-elimination half of the 100 TB story; the reference's Iceberg
    * DDL buckets by bssid with the same intent), then the per-user
    * aggregate runs on the bucketed table. The gate pins BOTH halves of
    * the claim: result identity with the plain-scan aggregate (the DuckDB
    * restatement), AND `agg_exchanges = 0` — the builder counts
    * hashpartitioning Exchanges in the aggregation's own executed plan and
    * emits it as a column, so a regression that silently reintroduces the
    * shuffle hash-mismatches, not just slows down. */
  val bucketedAgg: Reg = Reg.sql(
    "a20_bucketed_agg",
    """SELECT user_id, COUNT(*) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
      |         AS value_sum,
      |       CAST(0 AS BIGINT) AS agg_exchanges
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_bucketed"))
    val tbl = "graft_a20_bucketed"
    try {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.sources.BucketedLayout.writeBucketed(
        Tables.events(s, dir).select("user_id", "value"),
        tbl, root.toString + "/tbl", "user_id", numBuckets = 8)
      val agg = graft.sources.BucketedLayout.table(s, tbl)
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,2)")), 2)
            .cast("double").as("value_sum"))
      val exchanges = "hashpartitioning".r
        .findAllIn(agg.queryExecution.executedPlan.toString).size
      val out = agg
        .withColumn("agg_exchanges", lit(exchanges.toLong))
        .orderBy("user_id")
      // |users| rows: materialize so the scratch table can be dropped now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      deleteRecursively(root.toFile)
    }
  }

  /** J18 — CO-LOCATED FACT-FACT JOIN on the bucketed layout (the other
    * half of a20's shuffle-elimination story, and the one that matters
    * most at 100 TB: orders ⋈ lineitem is the canonical big-big join
    * that CANNOT broadcast): both facts are written ONCE bucketed+sorted
    * by the join key (8 buckets each side), and the join then reads
    * bucket-aligned files with ZERO Exchange — the builder counts
    * hashpartitioning exchanges in the JOIN's own executed plan and
    * emits it as an oracle column, with broadcast disabled for the probe
    * so the gate can't pass by broadcasting. Result identity against the
    * plain-join aggregate is the other half of the gate. */
  val j18BucketedJoin: Reg = Reg.sql(
    "j18_bucketed_join",
    """SELECT o_orderpriority,
      |       CAST(COUNT(*) AS BIGINT) AS n_items,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |            AS DOUBLE) AS revenue,
      |       CAST(0 AS BIGINT) AS join_exchanges
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_j18"))
    val (to, tl) = ("graft_j18_orders", "graft_j18_lineitem")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.sql(s"DROP TABLE IF EXISTS $to"); s.sql(s"DROP TABLE IF EXISTS $tl")
      graft.sources.BucketedLayout.writeBucketed(
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        to, root.toString + "/o", "o_orderkey", numBuckets = 8)
      graft.sources.BucketedLayout.writeBucketed(
        Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
        tl, root.toString + "/l", "l_orderkey", numBuckets = 8)
      // broadcast off: the gate must prove BUCKET co-location, not a
      // broadcast that would hide a missing alignment
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.sources.BucketedLayout.table(s, to)
        .join(graft.sources.BucketedLayout.table(s, tl),
          col("o_orderkey") === col("l_orderkey"))
      val exchanges = "hashpartitioning".r
        .findAllIn(joined.queryExecution.executedPlan.toString).size
      require(exchanges == 0,
        s"bucketed join still exchanges ($exchanges) — layout broken")
      val out = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("revenue"))
        .withColumn("join_exchanges", lit(exchanges.toLong))
        .orderBy("o_orderpriority")
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      s.sql(s"DROP TABLE IF EXISTS $to"); s.sql(s"DROP TABLE IF EXISTS $tl")
      deleteRecursively(root.toFile)
    }
  }

  /** A21 — snapshot DIFF (the CDC reconciliation read): given two versions
    * of a keyed table, classify every key as added / removed / changed /
    * unchanged — the audit step after any MERGE (A6/A8) and the input to
    * incremental downstream refresh. The "next" snapshot is simulated
    * deterministically from orders (delete keys % 97 = 0, bump price on
    * keys % 89 = 0, insert re-keyed copies of keys % 101 = 0), so every
    * class is populated by construction and both engines state the
    * identical simulation. The changed-row predicate compares the DOUBLE
    * price directly: the update adds exactly 1.0, an exact IEEE operation
    * both engines perform identically.
    *
    * Scale shape: one full-outer shuffle join on the key — the diff of two
    * 100 TB snapshots is a co-partitioned zipper when both sit in the same
    * bucketed layout (`a20`), and the output is the small side (the change
    * set), so nothing data-sized reaches the driver. */
  val snapshotDiff: Reg = Reg.sql(
    "a21_snapshot_diff",
    """WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
      |cur AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
      |next AS (
      |  SELECT o_orderkey AS k,
      |         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
      |              ELSE o_totalprice END AS price
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + m + 1, o_totalprice
      |  FROM orders, mx WHERE o_orderkey % 101 = 0),
      |diff AS (
      |  SELECT COALESCE(c.k, n.k) AS k,
      |         CASE WHEN n.k IS NULL THEN 'removed'
      |              WHEN c.k IS NULL THEN 'added'
      |              WHEN c.price <> n.price THEN 'changed'
      |              ELSE 'unchanged' END AS change_type
      |  FROM cur c FULL OUTER JOIN next n ON c.k = n.k)
      |SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       MIN(k) AS min_key, MAX(k) AS max_key
      |FROM diff GROUP BY change_type ORDER BY change_type""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val cur = orders.select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    // 1-row max-key frame via the established 1-row broadcast precedent
    val mx = orders.agg(max("o_orderkey").as("m"))
    val next = orders.where(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("nk"),
        when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("nprice"))
      .unionByName(orders.where(col("o_orderkey") % 101 === 0)
        .crossJoin(broadcast(mx))
        .select((col("o_orderkey") + col("m") + 1).as("nk"),
          col("o_totalprice").as("nprice")))
    cur.join(next, col("k") === col("nk"), "full_outer")
      .select(coalesce(col("k"), col("nk")).as("key"),
        when(col("nk").isNull, "removed")
          .when(col("k").isNull, "added")
          .when(col("price") =!= col("nprice"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"),
        min("key").as("min_key"), max("key").as("max_key"))
      .orderBy("change_type")
  }

  /** S15 — schema evolution beyond the additive case of s11: the two
    * rewrites-free evolutions the reference's `data_version` column implies
    * (`documents/wifi_measurement_s3_table_schema.md`):
    *  - RENAME with mapping: the v1 era stores the weight as `qual`; v2
    *    renamed it `quality_weight`. The v1 read applies the old→new map.
    *  - TYPE WIDENING (INT → BIGINT): v1 wrote 32-bit values; v2's ids
    *    outgrew the type (planted +3e9 offset, beyond INT32 range), so the
    *    unified read widens v1 up the promotion lattice.
    * `SchemaEvolution.readUnified` resolves both at read time — old
    * partitions are never rewritten. The oracle restates the unified view
    * straight from lineitem, and the `weight_type` column pins the widened
    * type itself ('bigint'), so a silently-narrowed or misaligned read
    * hash-mismatches rather than truncating. */
  val schemaWidening: Reg = Reg.sql(
    "s15_schema_widening",
    """WITH fact AS (
      |  SELECT l_suppkey % 4 AS day, l_linenumber AS qual FROM lineitem),
      |unified AS (
      |  SELECT CASE WHEN day >= 2 THEN '2.0' ELSE '1.0' END AS data_version,
      |         CASE WHEN day >= 2 THEN CAST(qual AS BIGINT) + 3000000000
      |              ELSE CAST(qual AS BIGINT) END AS quality_weight
      |  FROM fact)
      |SELECT data_version,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(SUM(quality_weight) AS BIGINT) AS weight_sum,
      |       CAST(MAX(quality_weight) AS BIGINT) AS weight_max,
      |       'bigint' AS weight_type
      |FROM unified GROUP BY data_version ORDER BY data_version""".stripMargin) { (s, dir) =>
    import graft.mutation.SchemaEvolution
    import graft.mutation.SchemaEvolution.Era
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_schema_widen"))
    try {
      val fact = Tables.lineitem(s, dir)
        .select((col("l_suppkey") % 4).as("day"), col("l_linenumber"))
      // v1 era: INT column under the old name
      fact.where(col("day") < 2)
        .select(col("day"), col("l_linenumber").cast("int").as("qual"))
        .write.parquet(root.toString + "/v1")
      // v2 era: renamed column, values beyond INT32 range (forces BIGINT)
      fact.where(col("day") >= 2)
        .select(col("day"),
          (col("l_linenumber").cast("long") + 3000000000L).as("quality_weight"))
        .write.parquet(root.toString + "/v2")

      val unified = SchemaEvolution.readUnified(s, Seq(
        Era(root.toString + "/v1", renames = Map("qual" -> "quality_weight"), tag = "1.0"),
        Era(root.toString + "/v2", tag = "2.0")))
      val weightType = unified.schema("quality_weight").dataType.simpleString
      val agg = unified.groupBy("data_version")
        .agg(
          count(lit(1)).as("cnt"),
          sum("quality_weight").as("weight_sum"),
          max("quality_weight").as("weight_max"))
        .withColumn("weight_type", lit(weightType))
        .orderBy("data_version")
      // 2-row aggregate: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally deleteRecursively(root.toFile)
  }

  /** A22 — z-order layout maintenance ([[graft.operators.ZOrder]], the
    * Delta/Iceberg OPTIMIZE ZORDER shape) under the oracle gate: the gate
    * pins (a) the Morton bit-interleave arithmetic itself — DuckDB restates
    * the identical mask ladder, so one wrong shift/mask hash-mismatches on
    * 60k codes — and (b) the LAYOUT CLAIM: rows are ntile'd into 32
    * z-ordered "files" and each bucket's (x, y) spans are emitted; a broken
    * interleave (e.g. plain concatenation x<<16|y) would produce full-range
    * y-spans in every bucket rather than compact rectangles, so the spans
    * are exactly the data-skipping property the rewrite exists to buy.
    * Dims are 16-bit reductions of (l_partkey, l_suppkey); the tile order
    * carries a total tie-break so bucket membership is deterministic.
    *
    * The global ntile window here is the ORACLE's stand-in for file
    * assignment (DuckDB must state the same 32 buckets); the production
    * rewrite path is `ZOrder.clusterBy`, whose repartitionByRange computes
    * range boundaries by sampling — no single-partition global sort. */
  val zorderLayout: Reg = Reg.sql(
    "a22_zorder_layout",
    """WITH pts AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(l_partkey % 65536 AS BIGINT) AS x,
      |         CAST(l_suppkey % 65536 AS BIGINT) AS y
      |  FROM lineitem),
      |s8 AS (SELECT *, (x | (x << 8)) & 16711935 AS x8,
      |               (y | (y << 8)) & 16711935 AS y8 FROM pts),
      |s4 AS (SELECT *, (x8 | (x8 << 4)) & 252645135 AS x4,
      |               (y8 | (y8 << 4)) & 252645135 AS y4 FROM s8),
      |s2 AS (SELECT *, (x4 | (x4 << 2)) & 858993459 AS x2,
      |               (y4 | (y4 << 2)) & 858993459 AS y2 FROM s4),
      |s1 AS (SELECT *, (x2 | (x2 << 1)) & 1431655765 AS xs,
      |               (y2 | (y2 << 1)) & 1431655765 AS ys FROM s2),
      |m AS (SELECT l_orderkey, l_linenumber, x, y, xs | (ys << 1) AS z FROM s1),
      |b AS (SELECT *, NTILE(32) OVER (ORDER BY z, l_orderkey, l_linenumber)
      |                  AS bucket FROM m)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
      |       CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span,
      |       CAST(MIN(z) AS BIGINT) AS z_lo,
      |       CAST(MAX(z) AS BIGINT) AS z_hi
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.ZOrder
    val pts = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey") % 65536).cast("long").as("x"),
      (col("l_suppkey") % 65536).cast("long").as("y"))
    pts
      .withColumn("z", ZOrder.mortonCode(col("x"), col("y")))
      .withColumn("bucket", ntile(32).over(
        Window.orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("cnt"),
        (max("x") - min("x")).as("x_span"),
        (max("y") - min("y")).as("y_span"),
        min("z").as("z_lo"),
        max("z").as("z_hi"))
      .select(col("bucket").cast("long").as("bucket"), col("cnt"),
        col("x_span"), col("y_span"), col("z_lo"), col("z_hi"))
      .orderBy("bucket")
  }

  /** A30 — write-audit-publish (the Netflix/Iceberg WAP governance
    * pattern): a candidate batch is STAGED to its own directory, the
    * a29-style constraint suite runs against the STAGED FILES (never the
    * in-memory frame — the audit must see exactly what publish would
    * ship), and only a fully-PASS audit atomically renames staging into
    * the live location. Two batches prove both branches: a clean daily
    * summary publishes; the same summary with 10 planted duplicate keys
    * fails pk_unique and is rejected, leaving the live table untouched —
    * the `__publish` rows report the LIVE row count read back from disk
    * after each decision, so the gate verifies the file mechanics, not
    * just the audit arithmetic. Scale: the audit is one fused aggregate
    * over the staged partition (a29's analyzer-fusion argument); publish
    * is a metadata-level rename, never a rewrite. */
  val writeAuditPublish: Reg = Reg.sql(
    "a30_write_audit_publish",
    """WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |           FROM events WHERE event_id < 50000 GROUP BY 1, 2),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
      |rep AS (
      |  SELECT 'batch_a' AS batch, 'nonempty' AS "constraint",
      |         CAST(0 AS BIGINT) AS violations, 'PASS' AS status FROM tot
      |  UNION ALL SELECT 'batch_a', 'n_events_positive', 0, 'PASS' FROM tot
      |  UNION ALL SELECT 'batch_a', 'pk_unique', 0, 'PASS' FROM tot
      |  UNION ALL SELECT 'batch_a', '__publish', n, 'PUBLISHED' FROM tot
      |  UNION ALL SELECT 'batch_b', 'nonempty', 0, 'PASS' FROM tot
      |  UNION ALL SELECT 'batch_b', 'n_events_positive', 0, 'PASS' FROM tot
      |  UNION ALL SELECT 'batch_b', 'pk_unique', 10, 'FAIL' FROM tot
      |  UNION ALL SELECT 'batch_b', '__publish', n, 'REJECTED' FROM tot)
      |SELECT batch, "constraint", violations, status FROM rep
      |ORDER BY batch, "constraint"""".stripMargin) { (s, dir) =>
    val root = java.nio.file.Paths.get(graft.Scratch.dir("graft_wap"))
    try {
      val live = root.resolve("live")
      val summary = Tables.events(s, dir)
        .where(col("event_id") < 50000L)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"))
      // batch B: same summary with 10 planted duplicate keys (the 10
      // smallest, deterministically)
      val dupes = summary.orderBy("user_id", "day").limit(10)
      val batches = Seq(
        ("batch_a", summary),
        ("batch_b", summary.unionByName(dupes)))

      val results = batches.flatMap { case (name, df) =>
        val staging = root.resolve(s"staging_$name")
        df.write.parquet(staging.toString) // WRITE
        val staged = s.read.parquet(staging.toString) // audit the FILES
        val a = staged.agg(
          count(lit(1)).as("total"),
          countDistinct(col("user_id"), col("day")).as("dk"),
          count(when(col("n_events") < 1, 1)).as("v_pos")).head()
        val (total, dk, vPos) = (a.getLong(0), a.getLong(1), a.getLong(2))
        val audit = Seq( // AUDIT
          ("nonempty", if (total == 0) 1L else 0L),
          ("n_events_positive", vPos),
          ("pk_unique", total - dk))
        val pass = audit.forall(_._2 == 0L)
        if (pass) { // PUBLISH: atomic directory rename, never a rewrite
          if (Files.exists(live)) deleteRecursively(live.toFile)
          Files.move(staging, live)
        } else deleteRecursively(staging.toFile)
        val liveRows =
          if (Files.exists(live)) s.read.parquet(live.toString).count() else 0L
        audit.map { case (c, v) =>
          (name, c, v, if (v == 0L) "PASS" else "FAIL")
        } :+ ((name, "__publish", liveRows,
          if (pass) "PUBLISHED" else "REJECTED"))
      }
      import s.implicits._
      results.toDF("batch", "constraint", "violations", "status")
        .orderBy("batch", "constraint")
    } finally deleteRecursively(root.toFile)
  }

  /** A34 — INCREMENTAL VIEW MAINTENANCE of a two-sided join: the classic
    * delta algebra ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, run as a real protocol over
    * append-only parquet segments. Inserts arrive in three batches hitting
    * BOTH sides (orders sliced by customer, lineitems by part — the slices
    * deliberately cross, so every batch's deltas join against earlier
    * batches' accumulations); each batch appends exactly the view rows its
    * deltas create: ΔO⋈(L_acc ∪ ΔL) ∪ O_acc⋈ΔL. A pair (o, l) therefore
    * lands exactly once — in batch max(batch(o), batch(l)) — which is what
    * the oracle states directly: the per-batch appended row/quantity
    * rollup equals GREATEST(o_custkey%3, l_partkey%3) over the PLAIN FULL
    * JOIN, so a double-counted or missed delta pair breaks the hash.
    *
    * Scale: per-batch cost is two delta-sized keyed joins (the
    * accumulation side streams from its segments; the delta side is batch-
    * bounded) — never a view rebuild, never a full re-join. The store is
    * append-only with deterministic segment names (replays overwrite their
    * own segment — the IncrementalNearDup discipline), and the view itself
    * is insert-only because the sources are insert-only; updates/deletes
    * compose with the MergeOps keyed-merge protocols instead. */
  val ivmJoin: Reg = Reg.sql(
    "a34_ivm_join",
    """SELECT CAST(GREATEST(o.o_custkey % 3, l.l_partkey % 3) AS BIGINT)
      |         AS batch_id,
      |       o.o_orderpriority,
      |       CAST(COUNT(*) AS BIGINT) AS appended_rows,
      |       CAST(SUM(l.l_quantity) AS BIGINT) AS qty
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_ivm")
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val oDirs = scala.collection.mutable.ArrayBuffer.empty[String]
      val lDirs = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 3).foreach { i =>
        val oDir = s"$work/o/b$i"
        val lDir = s"$work/l/b$i"
        o.where(col("o_custkey") % 3 === i).write.parquet(oDir)
        l.where(col("l_partkey") % 3 === i).write.parquet(lDir)
        // join inputs are the STORED segments, exactly as a real
        // maintenance job would read them
        val dO = s.read.parquet(oDir)
        val dL = s.read.parquet(lDir)
        val lAccNew = s.read.parquet((lDirs :+ lDir).toSeq: _*)
        val fromNewO = dO.join(lAccNew, col("o_orderkey") === col("l_orderkey"))
        val appended =
          if (oDirs.isEmpty) fromNewO
          else fromNewO.unionByName(
            s.read.parquet(oDirs.toSeq: _*)
              .join(dL, col("o_orderkey") === col("l_orderkey")))
        appended
          .select(lit(i.toLong).as("batch_id"), col("o_orderpriority"),
            col("l_quantity"))
          .write.parquet(s"$work/view/b$i")
        oDirs += oDir
        lDirs += lDir
      }
      val out = s.read.parquet((0 until 3).map(i => s"$work/view/b$i"): _*)
        .groupBy("batch_id", "o_orderpriority")
        .agg(count(lit(1)).as("appended_rows"),
          sum("l_quantity").cast("bigint").as("qty"))
        .orderBy("batch_id", "o_orderpriority")
      // 15-row rollup: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A37 — join IVM with RETRACTIONS: the signed-multiset (z-set) delta
    * algebra ΔV = ΔA⋈(B∪ΔB) ∪ A⋈ΔB where deltas carry mult ∈ {+1,−1}
    * and a view row's multiplicity is the PRODUCT of its inputs' — the
    * DBSP/differential-dataflow generalization of a34's insert-only
    * protocol. Three batches hit both sides; batch 1 DELETES a slice of
    * batch 0's orders, batch 2 DELETES a slice of earlier lineitems (the
    * a31 GDPR-purge shape, now repairing a JOIN view instead of
    * aggregates). Signed products make every case fall out with no
    * special-casing: a delete joining a same-batch insert nets 0, a
    * delete joining an already-deleted partner's ± pair nets 0, and a
    * late insert against a retracted accumulation row nets 0.
    *
    * The oracle states the per-batch NET change per priority from first
    * principles: net_b(pair) = visible_after(b) − visible_after(b−1),
    * where visibility is pure arrival/deletion arithmetic over the plain
    * full join — so a missed retraction, a double one, or a wrong delta
    * term breaks the hash at the exact batch it happens.
    *
    * Scale: per-batch cost is two delta-sized keyed joins against the
    * accumulated segments (deletes are just negative rows — same join,
    * no tombstone scan); consolidation (sum of mult per pair) is deferred
    * to readers, the LSM discipline. */
  val ivmRetract: Reg = Reg.sql(
    "a37_ivm_retract",
    """WITH pairs AS (
      |  SELECT o.o_orderpriority, l.l_quantity AS qty,
      |         GREATEST(o.o_custkey % 3, l.l_partkey % 3) AS bi,
      |         (o.o_custkey % 3 = 0 AND o.o_orderkey % 7 = 0) AS del_o,
      |         (l.l_partkey % 3 IN (0, 1) AND l.l_suppkey % 5 = 0) AS del_l
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |b(batch_id) AS (VALUES (0), (1), (2)),
      |vis AS (
      |  SELECT batch_id, o_orderpriority, qty,
      |    (CASE WHEN bi <= batch_id AND NOT (del_o AND batch_id >= 1)
      |               AND NOT (del_l AND batch_id >= 2) THEN 1 ELSE 0 END) -
      |    (CASE WHEN bi <= batch_id - 1 AND NOT (del_o AND batch_id >= 2)
      |               THEN 1 ELSE 0 END) AS net
      |  FROM pairs CROSS JOIN b)
      |SELECT CAST(batch_id AS BIGINT) AS batch_id, o_orderpriority,
      |       CAST(SUM(net) AS BIGINT) AS net_pairs,
      |       CAST(SUM(net * qty) AS BIGINT) AS net_qty
      |FROM vis GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_ivm_ret")
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"))
      val oDirs = scala.collection.mutable.ArrayBuffer.empty[String]
      val lDirs = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 3).foreach { i =>
        // batch i's SIGNED deltas: inserts are this residue class at +1;
        // batch 1 retracts a slice of batch 0's orders, batch 2 retracts
        // a slice of batches 0/1's lineitems, each at −1
        var dOw = o.where(col("o_custkey") % 3 === i)
          .withColumn("mult", lit(1L))
        if (i == 1) dOw = dOw.unionByName(
          o.where(col("o_custkey") % 3 === 0 && col("o_orderkey") % 7 === 0)
            .withColumn("mult", lit(-1L)))
        var dLw = l.where(col("l_partkey") % 3 === i)
          .withColumn("mult", lit(1L))
        if (i == 2) dLw = dLw.unionByName(
          l.where((col("l_partkey") % 3).isin(0, 1) &&
              col("l_suppkey") % 5 === 0)
            .withColumn("mult", lit(-1L)))
        val oDir = s"$work/o/b$i"
        val lDir = s"$work/l/b$i"
        dOw.write.parquet(oDir)
        dLw.write.parquet(lDir)
        // join inputs are the STORED signed segments
        val dO = s.read.parquet(oDir)
        val dL = s.read.parquet(lDir)
        val lAccNew = s.read.parquet((lDirs :+ lDir).toSeq: _*)
        val fromNewO = dO.join(lAccNew.withColumnRenamed("mult", "multL"),
          col("o_orderkey") === col("l_orderkey"))
          .withColumn("m", col("mult") * col("multL"))
        val appended =
          if (oDirs.isEmpty) fromNewO
          else fromNewO.unionByName(
            s.read.parquet(oDirs.toSeq: _*)
              .join(dL.withColumnRenamed("mult", "multL"),
                col("o_orderkey") === col("l_orderkey"))
              .withColumn("m", col("mult") * col("multL")))
        appended
          .select(lit(i.toLong).as("batch_id"), col("o_orderpriority"),
            col("l_quantity"), col("m"))
          .write.parquet(s"$work/view/b$i")
        oDirs += oDir
        lDirs += lDir
      }
      val out = s.read.parquet((0 until 3).map(i => s"$work/view/b$i"): _*)
        .groupBy("batch_id", "o_orderpriority")
        .agg(sum("m").as("net_pairs"),
          sum(col("m") * col("l_quantity")).cast("bigint").as("net_qty"))
        .orderBy("batch_id", "o_orderpriority")
      // 15-row rollup: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A35 — TIME TRAVEL over the log-structured versioned table
    * ([[graft.mutation.VersionedTable]]): create (v0) → append (v1) →
    * copy-on-write DELETE (v2, a replace commit), then read EVERY version
    * AFTER all commits landed — v0 and v1 must still serve their exact
    * historical rows (immutable segments + append-only manifest log, the
    * Delta/Iceberg substance the in-place MergeOps swap cannot give) —
    * then expire to the newest snapshot and prove the survivor still
    * reads identically while exactly the unreferenced segments are
    * vacuumed. Every emitted number is a closed form over orders, so the
    * oracle pins each snapshot's content, not just "some rows came back".
    *
    * Scale: commits are O(new data) + one manifest line per segment;
    * snapshot reads list one manifest; expiry is metadata-sized except
    * the final segment deletes. */
  val timeTravel: Reg = Reg.sql(
    "a35_time_travel",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
      |v0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE k % 4 = 0),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE k % 4 IN (0, 1)),
      |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE k % 4 IN (0, 1) AND c % 10 <> 3)
      |SELECT 'prune' AS snapshot, n AS rows_n, CAST(1 AS BIGINT) AS custkey_sum
      |  FROM v0
      |UNION ALL SELECT 'v0', n, s FROM v0
      |UNION ALL SELECT 'v1', n, s FROM v1
      |UNION ALL SELECT 'v2', n, s FROM v2
      |UNION ALL SELECT 'v2_after_vacuum', n, s FROM v2
      |UNION ALL SELECT 'vacuum', CAST(2 AS BIGINT), CAST(2 AS BIGINT)
      |ORDER BY snapshot""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_vtab")
    val root = s"$work/t"
    try {
      // `m` is the residue class each commit carries — the stat column the
      // manifest records, standing in for the reference's ingestion-day
      // partition pruning (wifi_measurement_s3_table_schema.md:196-207)
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, root, o.where(col("m") === 0),
        statCols = Seq("m"))
      VersionedTable.append(s, root, o.where(col("m") === 1),
        statCols = Seq("m"))
      // copy-on-write DELETE: v2 references only the replacement segment
      VersionedTable.replace(s, root,
        VersionedTable.read(s, root).where(!(col("c") % 10 === 3)))
      def stat(v: Long): (Long, Long) = {
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (r.getLong(0), r.getLong(1))
      }
      // all three snapshots read AFTER every commit landed: time travel
      val (n0, s0) = stat(0); val (n1, s1) = stat(1); val (n2, s2) = stat(2)
      // DATA SKIPPING, files-read-count gated: at v1 the table holds two
      // segments with disjoint recorded m-ranges; a pruned read of m=0
      // must open exactly ONE of them and still return v0's row count
      val prunedSegs = VersionedTable.resolveSegments(
        s, root, "m", 0, 0, version = Some(1L))
      require(prunedSegs.length == 1,
        s"stats pruning failed: ${prunedSegs.length} of 2 segments resolved")
      val prunedN = VersionedTable.readPruned(
        s, root, "m", 0, 0, version = Some(1L)).count()
      val (droppedV, deletedSegs) = VersionedTable.expireSnapshots(s, root, 1)
      val (n2b, s2b) = stat(2) // the survivor is untouched by the vacuum
      import s.implicits._
      Seq(
        ("prune", prunedN, prunedSegs.length.toLong),
        ("v0", n0, s0), ("v1", n1, s1), ("v2", n2, s2),
        ("v2_after_vacuum", n2b, s2b),
        ("vacuum", droppedV.toLong, deletedSegs.toLong))
        .toDF("snapshot", "rows_n", "custkey_sum")
        .orderBy("snapshot")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A36 — the A6/A7 outlier MERGE as VERSIONED copy-on-write commits
    * (the Iceberg v2 audit property `wifi_measurement_s3_table_schema
    * .md:73-75,111-135` that the in-place MergeOps swap cannot give):
    * the fact table lands as ONE partitioned write whose 8 per-day
    * directories register as stat-carrying segments (v0 — the Iceberg
    * partition-field shape: the stat IS the directory's value, no stats
    * scan), detection reads the day-3 window through MANIFEST
    * PRUNING (1 of 8 segments opened — gated), the label UPDATE and the
    * purge DELETE land as [[graft.mutation.VersionedTable.mergeWhere]]
    * commits that rewrite ONLY the intersecting segment and carry the
    * other seven forward by reference — and after everything, the
    * pre-merge snapshot (v0) and the labeled-but-unpurged snapshot (v1)
    * are both still readable. Head counts are identical to
    * `a6_merge_label_purge`'s by construction; the extra columns are
    * the time-travel and files-read gates stated as oracle constants.
    *
    * Scale: a one-day correction writes one day's replacement segment
    * plus one manifest — never the table. Detection cost is the pruned
    * window, not the corpus. */
  val versionedMerge: Reg = Reg.sql(
    "a36_versioned_merge",
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
      |       CAST(1 AS BIGINT) AS segments_rewritten,
      |       CAST(7 AS BIGINT) AS segments_carried,
      |       (SELECT COUNT(*) FROM fact) - (SELECT COUNT(*) FROM outliers)
      |         AS rows_after_purge,
      |       (SELECT COUNT(*) FROM fact) AS premerge_snapshot_rows,
      |       (SELECT COUNT(*) FROM outliers) AS labeled_snapshot_rows,
      |       CAST(1 AS BIGINT) AS day3_segments_opened""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_vmerge")
    val root = s"$work/t"
    try {
      val fact = Tables.lineitem(s, dir)
        .select(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"),
            col("l_suppkey"), col("l_partkey")).as("event_id"),
          col("l_partkey").as("bssid"),
          (col("l_suppkey") % 8).as("day"),
          col("l_extendedprice").as("value"),
          lit(null).cast("boolean").as("is_global_outlier"))
      // ONE partitioned write registers all 8 per-day segments, each
      // manifest line carrying day=[d,d] from the directory name — the
      // Iceberg partition-field shape, no per-day scan, no stats scan
      val (v0, nSegs) = VersionedTable.createPartitioned(s, root, fact, "day")
      require(v0 == 0L && nSegs == 8, s"expected 8 day segments, got $nSegs")
      // A9 detection over the day-3 window via MANIFEST PRUNING: the
      // files-read gate asserts 1 of 8 segments is opened
      val day3Segs = VersionedTable.resolveSegments(s, root, "day", 3, 3)
      require(day3Segs.length == 1,
        s"day-3 prune opened ${day3Segs.length} of 8 segments")
      val win = VersionedTable.readPruned(s, root, "day", 3, 3)
      val med = win.groupBy("bssid")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = win.join(med, "bssid")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("bssid")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      val outliers = dev.join(mad, "bssid")
        .where(col("adev") > lit(3) * col("mad"))
        .select(col("event_id"))
        // consumed by both merges and the counts — materialize once
        .localCheckpoint()
      val nOut = outliers.count()
      val rowsBefore = VersionedTable.read(s, root).count()

      // label UPDATE as a COW MERGE commit (v1): only the day-3 segment
      // is rewritten; the other seven carry forward by reference
      val hits = broadcast(outliers.withColumn("__hit", lit(true)))
      val (v1, rw1, ca1) = VersionedTable.mergeWhere(
        s, root, "day", 3, 3,
        _.join(hits, Seq("event_id"), "left")
          .withColumn("is_global_outlier",
            when(col("__hit"), lit(true)).otherwise(lit(null).cast("boolean")))
          .drop("__hit"),
        statCols = Seq("day"))
      // purge DELETE as a second COW MERGE commit (v2)
      val (_, rw2, ca2) = VersionedTable.mergeWhere(
        s, root, "day", 3, 3,
        _.join(hits.select("event_id"), Seq("event_id"), "left_anti"),
        statCols = Seq("day"))
      require(rw1 == 1 && rw2 == 1 && ca1 == 7 && ca2 == 7,
        s"COW merge rewrote ($rw1,$rw2) carried ($ca1,$ca2) — expected 1/7")

      val rowsAfter = VersionedTable.read(s, root).count()
      // TIME TRAVEL after both merges: the pre-merge snapshot is intact
      // and the labeled-but-unpurged snapshot still shows its labels
      val preMergeRows = VersionedTable.read(s, root, Some(0L)).count()
      val labeledRows = VersionedTable
        .readPruned(s, root, "day", 3, 3, version = Some(v1))
        .where(col("is_global_outlier") === true).count()

      import s.implicits._
      Seq((rowsBefore, nOut, nOut, rw1.toLong, ca1.toLong, rowsAfter,
        preMergeRows, labeledRows, day3Segs.length.toLong))
        .toDF("rows_before", "outliers_detected", "rows_labeled",
          "segments_rewritten", "segments_carried", "rows_after_purge",
          "premerge_snapshot_rows", "labeled_snapshot_rows",
          "day3_segments_opened")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A38 — COMPACTION AS A SNAPSHOT over the versioned table (Iceberg's
    * rewrite_data_files, the versioned sibling of a19's in-place
    * small-file compaction): a large base segment plus six micro-batch-
    * sized appends (the small-segment tail streaming ingest accretes),
    * then one [[graft.mutation.VersionedTable.compactSmall]] commit that
    * folds exactly the six smalls into ONE segment — threshold picked
    * corpus-relatively (half the largest segment) so the shape holds at
    * any SF — carrying the base by reference and UNIONING the smalls'
    * manifest stats without rescanning them. Content at head is
    * byte-for-byte the pre-compaction content, the pre-compaction
    * version stays readable, and pruning through the merged segment's
    * unioned stats still works (files-read gates on both sides).
    * Compaction never deletes: the smalls become vacuum candidates only
    * when their snapshots expire. */
  val versionedCompact: Reg = Reg.sql(
    "a38_versioned_compact",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 6 AS m
      |           FROM orders),
      |base AS (SELECT * FROM o WHERE k % 13 <> 0),
      |small AS (SELECT * FROM o WHERE k % 13 = 0),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(SUM(c) AS BIGINT) AS s FROM o),
      |sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |              CAST(SUM(c) AS BIGINT) AS s FROM small
      |       WHERE m IN (2, 3))
      |SELECT CAST(7 AS BIGINT) AS segments_before,
      |       CAST(6 AS BIGINT) AS segments_merged,
      |       CAST(1 AS BIGINT) AS segments_carried,
      |       CAST(2 AS BIGINT) AS segments_after,
      |       tot.n AS rows_head, tot.s AS custkey_sum_head,
      |       tot.n AS rows_precompact_snapshot,
      |       CAST(1 AS BIGINT) AS m23_segments_opened,
      |       sm.n AS m23_rows, sm.s AS m23_custkey_sum
      |FROM tot, sm""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_vcompact")
    val root = s"$work/t"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 6).as("m"))
      VersionedTable.create(s, root, o.where(col("k") % 13 =!= 0)) // big base
      (0 to 5).foreach { i => // the streaming small-segment tail
        VersionedTable.append(s, root,
          o.where(col("k") % 13 === 0 && col("m") === i),
          statCols = Seq("m"))
      }
      val before = VersionedTable.segmentBytes(s, root)
      val threshold = before.map(_._2).max / 2
      val (nv, merged, carried) =
        VersionedTable.compactSmall(s, root, smallBytes = threshold)
      require(nv == 7L && merged == 6 && carried == 1,
        s"compaction folded $merged/carried $carried at v$nv — expected 6/1")
      val after = VersionedTable.segmentBytes(s, root)
      // head content unchanged, pre-compaction snapshot intact
      val h = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("c").cast("bigint")).head()
      val p = VersionedTable.read(s, root, Some(6L))
        .agg(count(lit(1))).head()
      // files-read gates on both sides of the compaction. At v6 the six
      // smalls carry disjoint m-stats, so an m∈[2,3] probe opens exactly
      // 2 of them (the statless base is always conservatively kept —
      // subtract it). At head the merged segment's UNIONED stats [0,5]
      // legitimately intersect every m probe, so it reads 1 stat segment.
      val m23segs = VersionedTable.resolveSegments(
        s, root, "m", 2, 3, version = Some(6L))
        .length - 1 // minus the statless base, which is always kept
      require(m23segs == 2,
        s"pre-compaction m∈[2,3] prune opened $m23segs stat segments, want 2")
      val m23 = VersionedTable.readPruned(s, root, "m", 2, 3)
        .where(col("k") % 13 === 0)
        .agg(count(lit(1)), sum("c").cast("bigint")).head()
      import s.implicits._
      Seq((before.length.toLong, merged.toLong, carried.toLong,
        after.length.toLong, h.getLong(0), h.getLong(1), p.getLong(0),
        (VersionedTable.resolveSegments(s, root, "m", 2, 3).length - 1).toLong,
        m23.getLong(0), m23.getLong(1)))
        .toDF("segments_before", "segments_merged", "segments_carried",
          "segments_after", "rows_head", "custkey_sum_head",
          "rows_precompact_snapshot", "m23_segments_opened",
          "m23_rows", "m23_custkey_sum")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A39 — GDPR erasure through the VERSIONED table, resolving the
    * tension a31 leaves open: time travel is the feature, but
    * right-to-be-forgotten requires the erased rows to be UNRECOVERABLE —
    * including from history. The production answer (Iceberg's) is
    * layout + protocol: the table is BUCKETED BY USER
    * ([[graft.mutation.VersionedTable.createPartitioned]] on
    * user_id % 8 — GDPR locality, so an erasure touches one bucket, not
    * the corpus), the purge is a [[graft.mutation.VersionedTable
    * .mergeWhere]] copy-on-write commit pruned to that bucket's segment
    * (1 rewritten, 7 carried by reference), and then
    * [[graft.mutation.VersionedTable.expireSnapshots]] drops the
    * pre-erasure version and vacuums exactly its now-unreferenced
    * segment — after which the old snapshot is PROVABLY unreadable (the
    * query reads it under Try and reports the outcome as an oracle
    * constant) and the erased bytes are off disk. Other users in the
    * same bucket survive the rewrite untouched.
    *
    * Scale: erasure cost = one bucket's rewrite + one manifest + one
    * vacuum of one dead segment, at ANY corpus size. */
  val versionedForget: Reg = Reg.sql(
    "a39_versioned_forget",
    """WITH e AS (SELECT event_id, user_id, user_id % 8 AS ub
      |           FROM events WHERE event_id < 60000),
      |victim AS (SELECT MIN(user_id) AS u FROM e WHERE user_id >= 97),
      |purged AS (SELECT e.* FROM e, victim WHERE e.user_id = victim.u)
      |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS rows_before,
      |       (SELECT u FROM victim) AS victim_user,
      |       CAST((SELECT COUNT(*) FROM purged) AS BIGINT) AS rows_purged,
      |       CAST(1 AS BIGINT) AS segments_rewritten,
      |       CAST(7 AS BIGINT) AS segments_carried,
      |       CAST((SELECT COUNT(*) FROM e) -
      |            (SELECT COUNT(*) FROM purged) AS BIGINT) AS rows_after,
      |       CAST((SELECT SUM(user_id) FROM e) -
      |            (SELECT COALESCE(SUM(user_id), 0) FROM purged)
      |            AS BIGINT) AS uid_sum_after,
      |       CAST(1 AS BIGINT) AS versions_dropped,
      |       CAST(1 AS BIGINT) AS dead_segments_deleted,
      |       CAST(0 AS BIGINT) AS old_snapshot_readable""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_vforget")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select(col("event_id"), col("user_id"),
          (col("user_id") % 8).as("ub"))
      val (_, nSegs) = VersionedTable.createPartitioned(s, root, e, "ub")
      require(nSegs == 8, s"expected 8 user buckets, got $nSegs")
      val rowsBefore = VersionedTable.read(s, root).count()
      // the erasure request: one user (deterministically the smallest id
      // at or above 97). The user-bucketed layout localizes every one of
      // their rows to ONE segment — GDPR locality.
      val victim = e.where(col("user_id") >= 97L)
        .agg(min("user_id")).head().getLong(0)
      val bucket = (victim % 8).toDouble
      val (_, rw, ca) = VersionedTable.mergeWhere(
        s, root, "ub", bucket, bucket,
        _.where(col("user_id") =!= victim), statCols = Seq("ub"))
      require(rw == 1 && ca == 7,
        s"erasure rewrote $rw / carried $ca segments — expected 1/7")
      val after = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      // history truncation: the pre-erasure snapshot must die for the
      // erasure to be real — drop it and vacuum its orphaned segment,
      // then PROVE the old snapshot is gone (read under Try)
      val (droppedV, deadSegs) = VersionedTable.expireSnapshots(s, root, 1)
      val oldReadable =
        scala.util.Try(VersionedTable.read(s, root, Some(0L)).count())
          .map(_ => 1L).getOrElse(0L)
      import s.implicits._
      Seq((rowsBefore, victim, rowsBefore - after.getLong(0),
        rw.toLong, ca.toLong, after.getLong(0), after.getLong(1),
        droppedV.toLong, deadSegs.toLong, oldReadable))
        .toDF("rows_before", "victim_user", "rows_purged",
          "segments_rewritten", "segments_carried", "rows_after",
          "uid_sum_after", "versions_dropped", "dead_segments_deleted",
          "old_snapshot_readable")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A40 — INCREMENTAL READ between snapshots (Iceberg's incremental
    * scan, the CDC-consumption substance): a downstream consumer
    * checkpoints "I have processed through version 1" and later asks for
    * exactly what arrived since — which
    * [[graft.mutation.VersionedTable.incrementalRead]] answers from
    * MANIFEST SET-DIFFERENCE alone: the segments v3 references that v1
    * does not. No diff scan, no row comparison, no read of the already-
    * consumed prefix; the files-read gate asserts exactly 2 of the 4
    * batch segments open. The oracle states both the consumed-prefix and
    * the incremental-slice aggregates from residue arithmetic, plus the
    * gate constants. */
  val incrementalRead: Reg = Reg.sql(
    "a40_incremental_read",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000)
      |SELECT CAST((SELECT COUNT(*) FROM e WHERE event_id % 4 <= 1) AS BIGINT)
      |         AS consumed_through_v1,
      |       CAST((SELECT COUNT(*) FROM e WHERE event_id % 4 >= 2) AS BIGINT)
      |         AS incremental_rows,
      |       CAST((SELECT SUM(user_id) FROM e WHERE event_id % 4 >= 2)
      |            AS BIGINT) AS incremental_uid_sum,
      |       CAST(2 AS BIGINT) AS segments_opened,
      |       CAST(4 AS BIGINT) AS segments_at_head,
      |       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_vincr")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 4 === 0))
      (1 to 3).foreach { i =>
        VersionedTable.append(s, root, e.where(col("event_id") % 4 === i))
      }
      // consumer checkpointed at v1; what arrived through v3?
      val added = VersionedTable.addedSegments(s, root, 1L, 3L)
      require(added.length == 2,
        s"incremental read opened ${added.length} of 4 segments — want 2")
      val inc = VersionedTable.incrementalRead(s, root, 1L, 3L).get
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val consumed = VersionedTable.read(s, root, Some(1L)).count()
      val headSegs = VersionedTable.segmentsOf(
        s, root, VersionedTable.currentVersion(s, root).get).length
      val headRows = VersionedTable.read(s, root).count()
      import s.implicits._
      Seq((consumed, inc.getLong(0), inc.getLong(1), added.length.toLong,
        headSegs.toLong, headRows))
        .toDF("consumed_through_v1", "incremental_rows",
          "incremental_uid_sum", "segments_opened", "segments_at_head",
          "head_rows")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A41 — MERGE-ON-READ DELETE (the Iceberg v2 shape the reference's
    * table contract mandates, `wifi_measurement_s3_table_schema.md:69-76`
    * `'write.delete.mode'='merge-on-read'`): instead of rewriting the
    * touched segments (a36's COW), [[graft.mutation.VersionedTable
    * .morDelete]] commits ONE equality-delete segment of key tuples —
    * O(matched keys) written, ZERO data files rewritten (gated: the
    * pre-existing data directory set is byte-identical afterwards). The
    * delete applies at scan time as an anti-join scoped BY SEQUENCE to
    * strictly-older data, which the query proves the hard way: it
    * re-inserts half the deleted keys afterwards and they are visible at
    * head, NOT swallowed by the older delete. The pre-delete snapshot
    * stays readable (time travel across a MOR commit).
    *
    * Scale: a GDPR-sized delete on a 100 TB table writes kilobytes (the
    * keys) and one manifest; the read-side anti-join build side is those
    * same kilobytes — broadcast. COW (a36/a39) pays the rewrite up
    * front; MOR defers it to [[a42 materialization|morMaterialize]],
    * which is the actual production trade. */
  val morDelete: Reg = Reg.sql(
    "a41_mor_delete",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |base AS (SELECT * FROM e WHERE event_id % 3 <= 1),
      |victims AS (SELECT event_id FROM base WHERE user_id % 5 = 0),
      |reins AS (SELECT event_id, user_id FROM base
      |          WHERE user_id % 5 = 0 AND event_id % 2 = 0),
      |head AS (SELECT event_id, user_id FROM base WHERE user_id % 5 <> 0
      |         UNION ALL SELECT event_id, user_id FROM reins)
      |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM head) AS BIGINT) AS head_uid_sum,
      |       CAST((SELECT COUNT(*) FROM victims) AS BIGINT) AS deleted_keys,
      |       CAST((SELECT COUNT(*) FROM reins) AS BIGINT) AS reinserted_rows,
      |       CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS predelete_rows,
      |       CAST(1 AS BIGINT) AS delete_segments,
      |       CAST(0 AS BIGINT) AS data_segments_rewritten""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_mordel")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0),
        statCols = Seq("event_id"))
      VersionedTable.append(s, root, e.where(col("event_id") % 3 === 1),
        statCols = Seq("event_id"))
      val preRows = VersionedTable.read(s, root).count()
      val dataDirsBefore = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet

      // the MOR DELETE: one del_ segment of keys, no data rewrite
      val (v2, nDeleted) = VersionedTable.morDelete(
        s, root, Seq("event_id"), _.where(col("user_id") % 5 === 0))
      require(v2 == 2L, s"delete commit expected v2, got $v2")
      val dataDirsAfter = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet
      require(dataDirsAfter == dataDirsBefore,
        "MOR delete touched a data segment — must be O(keys) only")
      val delSegs = VersionedTable.segmentsOf(s, root, v2)
        .count(_.isDelete)

      // the seq-scoping proof: re-insert HALF the deleted keys; the
      // older delete must not swallow the fresh rows
      VersionedTable.append(s, root,
        e.where(col("event_id") % 3 <= 1)
          .where(col("user_id") % 5 === 0 && col("event_id") % 2 === 0),
        statCols = Seq("event_id"))
      val head = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val reins = VersionedTable.read(s, root).count() -
        VersionedTable.read(s, root, Some(2L)).count()
      // time travel across the MOR commit: pre-delete snapshot intact
      val v1Rows = VersionedTable.read(s, root, Some(1L)).count()
      require(v1Rows == preRows, "pre-delete snapshot changed under MOR")

      import s.implicits._
      Seq((head.getLong(0), head.getLong(1), nDeleted, reins, v1Rows,
        delSegs.toLong, 0L))
        .toDF("head_rows", "head_uid_sum", "deleted_keys",
          "reinserted_rows", "predelete_rows", "delete_segments",
          "data_segments_rewritten")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A42 — MERGE-ON-READ UPSERT + MATERIALIZATION (the full Iceberg v2
    * `'write.update.mode'='merge-on-read'` loop): two CDC waves land via
    * [[graft.mutation.VersionedTable.morUpsert]] — each ONE commit
    * carrying an equality-delete of the wave's keys plus a data segment
    * of its rows, O(changed rows) written, last-writer-wins per key by
    * sequence scoping. Then [[graft.mutation.VersionedTable
    * .morMaterialize]] converts the accumulated read debt into clean
    * data segments out-of-band: content PROVABLY identical (stated in
    * the oracle), delete segments gone, and only the data segments the
    * deletes could reach rewritten (base + wave-1's data; wave-2's own
    * segment is already beyond every delete — the gate asserts 2/2/1).
    * Every MOR snapshot stays time-travel readable afterwards.
    *
    * Scale: the upsert write side is delta-sized at any table size; the
    * materialize cost is proportional to AFFECTED segments only, and a
    * stats-partitioned table localizes that to the touched partitions. */
  val morUpsert: Reg = Reg.sql(
    "a42_mor_upsert",
    """WITH c AS (SELECT c_custkey AS k,
      |                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      |           FROM customer WHERE c_custkey <= 1500),
      |base AS (SELECT k, cents FROM c WHERE k <= 1000),
      |u1 AS (SELECT k, cents + 10000 AS cents FROM c
      |       WHERE k <= 1000 AND k % 10 = 0
      |       UNION ALL SELECT k, cents FROM c WHERE k > 1000 AND k <= 1100),
      |u2 AS (SELECT k, cents - 5000 AS cents FROM c
      |       WHERE k <= 1200 AND k % 7 = 0),
      |after1 AS (SELECT k, cents FROM u1
      |           UNION ALL SELECT k, cents FROM base
      |           WHERE k NOT IN (SELECT k FROM u1)),
      |after2 AS (SELECT k, cents FROM u2
      |           UNION ALL SELECT k, cents FROM after1
      |           WHERE k NOT IN (SELECT k FROM u2))
      |SELECT CAST((SELECT COUNT(*) FROM after1) AS BIGINT) AS v1_rows,
      |       CAST((SELECT SUM(cents) FROM after1) AS BIGINT) AS v1_cents,
      |       CAST((SELECT COUNT(*) FROM after2) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(cents) FROM after2) AS BIGINT) AS head_cents,
      |       CAST((SELECT COUNT(*) FROM after2) AS BIGINT) AS mat_rows,
      |       CAST((SELECT SUM(cents) FROM after2) AS BIGINT) AS mat_cents,
      |       CAST(2 AS BIGINT) AS segments_rewritten,
      |       CAST(2 AS BIGINT) AS deletes_dropped,
      |       CAST(0 AS BIGINT) AS delete_segments_after""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_morups")
    val root = s"$work/t"
    try {
      val c = Tables.customer(s, dir).where(col("c_custkey") <= 1500L)
        .select(col("c_custkey").as("k"),
          round(col("c_acctbal") * 100).cast("bigint").as("cents"))
      VersionedTable.create(s, root, c.where(col("k") <= 1000L),
        statCols = Seq("k"))
      // CDC wave 1: updates to every 10th key + 100 fresh inserts
      val u1 = c.where(col("k") <= 1000L && col("k") % 10 === 0)
        .withColumn("cents", col("cents") + 10000L)
        .unionByName(c.where(col("k") > 1000L && col("k") <= 1100L))
      val v1 = VersionedTable.morUpsert(s, root, u1, Seq("k"),
        statCols = Seq("k"))
      val r1 = VersionedTable.read(s, root, Some(v1))
        .agg(count(lit(1)), sum("cents").cast("bigint")).head()
      // CDC wave 2 overlaps wave 1 (k % 70 == 0 hits both): the LATEST
      // writer must win per key
      val u2 = c.where(col("k") <= 1200L && col("k") % 7 === 0)
        .withColumn("cents", col("cents") - 5000L)
      val v2 = VersionedTable.morUpsert(s, root, u2, Seq("k"),
        statCols = Seq("k"))
      val r2 = VersionedTable.read(s, root, Some(v2))
        .agg(count(lit(1)), sum("cents").cast("bigint")).head()

      // MATERIALIZE: read debt → clean segments, content identical;
      // only the delete-reachable data segments rewrite (base, u1-data)
      val (v3, rewritten, dropped) =
        VersionedTable.morMaterialize(s, root, statCols = Seq("k"))
      require(rewritten == 2 && dropped == 2,
        s"materialize rewrote $rewritten dropped $dropped — expected 2/2")
      val r3 = VersionedTable.read(s, root, Some(v3))
        .agg(count(lit(1)), sum("cents").cast("bigint")).head()
      val delsAfter = VersionedTable.segmentsOf(s, root, v3)
        .count(_.isDelete)
      // the MOR snapshots stay readable after materialization
      require(VersionedTable.read(s, root, Some(v1)).count() == r1.getLong(0),
        "MOR snapshot v1 broke after materialization")

      import s.implicits._
      Seq((r1.getLong(0), r1.getLong(1), r2.getLong(0), r2.getLong(1),
        r3.getLong(0), r3.getLong(1), rewritten.toLong, dropped.toLong,
        delsAfter.toLong))
        .toDF("v1_rows", "v1_cents", "head_rows", "head_cents",
          "mat_rows", "mat_cents", "segments_rewritten",
          "deletes_dropped", "delete_segments_after")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A43 — CHANGELOG CONSUMPTION (Iceberg changelog scan / Delta CDF):
    * a downstream replica checkpointed at v1 asks for everything that
    * changed through head and applies it WITHOUT rereading the table:
    * [[graft.mutation.VersionedTable.changelog]] derives ordered
    * per-commit change sets from consecutive manifest diffs alone —
    * inserts cost the new data segments, retractions cost the new
    * delete-key segments — and [[graft.mutation.VersionedTable
    * .applyChangelog]] folds them (anti-join retractions, union inserts,
    * in version order) onto the stale replica. The oracle gate is the
    * strong one: the folded replica's row count AND content sum equal
    * the head snapshot's exactly, across an upsert (delete+insert in one
    * commit) and a pure delete.
    *
    * Scale: the replica pays O(changed rows) per sync, never a table
    * diff — the only way a 100 TB table keeps downstream copies fresh. */
  val changelogApply: Reg = Reg.sql(
    "a43_changelog_apply",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |s0 AS (SELECT * FROM e WHERE event_id % 4 = 0),
      |s1 AS (SELECT * FROM e WHERE event_id % 4 = 1),
      |v1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1),
      |u AS (SELECT event_id, user_id + 1000000 AS user_id FROM s0
      |      WHERE user_id % 3 = 0),
      |v2 AS (SELECT event_id, user_id FROM u
      |       UNION ALL SELECT * FROM v1
      |       WHERE event_id NOT IN (SELECT event_id FROM u)),
      |vict AS (SELECT event_id FROM v2 WHERE user_id % 5 = 0),
      |v3 AS (SELECT * FROM v2 WHERE user_id % 5 <> 0)
      |SELECT CAST((SELECT COUNT(*) FROM v1) AS BIGINT) AS replica_start_rows,
      |       CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS cs2_inserted,
      |       CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS cs2_retracted,
      |       CAST((SELECT COUNT(*) FROM vict) AS BIGINT) AS cs3_retracted,
      |       CAST((SELECT COUNT(*) FROM v3) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM v3) AS BIGINT) AS head_uid_sum,
      |       CAST((SELECT COUNT(*) FROM v3) AS BIGINT) AS replica_rows,
      |       CAST((SELECT SUM(user_id) FROM v3) AS BIGINT)
      |         AS replica_uid_sum""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_chlog")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 4 === 0))
      VersionedTable.append(s, root, e.where(col("event_id") % 4 === 1))
      // the replica checkpoints HERE (v1), then the table keeps moving:
      // an upsert rewriting every user_id%3==0 row of the v0 slice...
      val u = e.where(col("event_id") % 4 === 0 && col("user_id") % 3 === 0)
        .withColumn("user_id", col("user_id") + 1000000L)
      VersionedTable.morUpsert(s, root, u, Seq("event_id"))
      // ...and a MOR delete of every user_id%5==0 row still visible
      VersionedTable.morDelete(s, root, Seq("event_id"),
        _.where(col("user_id") % 5 === 0))

      val cs = VersionedTable.changelog(s, root, 1L, 3L)
      require(cs.map(_.version) == Seq(2L, 3L),
        s"changelog versions ${cs.map(_.version)} — expected 2,3")
      val cs2Ins = cs(0).inserted.get.count()
      val cs2Del = cs(0).deletedKeys.get.count()
      val cs3Del = cs(1).deletedKeys.get.count()
      require(cs(1).inserted.isEmpty, "pure delete commit emitted inserts")

      val replicaStart = VersionedTable.read(s, root, Some(1L))
      val startRows = replicaStart.count()
      val replica = VersionedTable.applyChangelog(replicaStart, cs)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val head = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      require(replica == head,
        s"changelog replica diverged from head: $replica vs $head")

      import s.implicits._
      Seq((startRows, cs2Ins, cs2Del, cs3Del,
        head.getLong(0), head.getLong(1),
        replica.getLong(0), replica.getLong(1)))
        .toDF("replica_start_rows", "cs2_inserted", "cs2_retracted",
          "cs3_retracted", "head_rows", "head_uid_sum",
          "replica_rows", "replica_uid_sum")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A44 — POINT LOOKUP through per-segment BLOOM SIDECARS (the
    * reference's S8 `mac_addr` point-get,
    * `wifi-positioning-service/.../WifiAccessPointRepository` shape, at
    * file-skipping scale): the fact table lands ROUND-ROBIN across 8
    * segments, so every segment spans the full key range and min/max
    * stats prune NOTHING — the gate asserts stats keep 8/8. After
    * [[graft.mutation.VersionedTable.buildBlooms]], each lookup consults
    * the sidecars and opens ~1 segment (gated: total opened across all
    * lookups ≤ 2× the lookup count, vs 8× without blooms). Results are
    * the looked-up rows themselves — the oracle recomputes them from the
    * key schedule.
    *
    * Scale: a golden-record get on a 100 TB un-sorted table costs one
    * bloom probe per file (metadata-sized, cacheable) plus ONE data file
    * read — without requiring the table to be key-partitioned first. */
  val pointSkipBloom: Reg = Reg.sql(
    "a44_point_skip_bloom",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(user_id AS BIGINT) AS user_id
      |FROM events
      |WHERE event_id < 60000 AND event_id % 6000 = 0
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_bloom")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      // round-robin layout: stats are useless for points, blooms are not
      VersionedTable.create(s, root, e.where(col("event_id") % 8 === 0),
        statCols = Seq("event_id"))
      (1 to 7).foreach(i => VersionedTable.append(s, root,
        e.where(col("event_id") % 8 === i), statCols = Seq("event_id")))
      VersionedTable.buildBlooms(s, root, "event_id")
      val keys = e.where(col("event_id") % 6000 === 0)
        .select("event_id").orderBy("event_id")
        .collect().map(_.getLong(0))
      require(keys.nonEmpty, "no lookup keys in slice")
      // stats alone cannot prune this layout (probe a mid-range key —
      // extreme keys sit at segment min/max boundaries where stats do
      // clip a few segments)
      val mid = keys(keys.length / 2)
      require(VersionedTable.resolveSegments(
        s, root, "event_id", mid.toDouble, mid.toDouble)
        .length == 8, "round-robin layout unexpectedly stats-prunable")
      var openedTotal = 0
      val rows = keys.flatMap { k =>
        openedTotal +=
          VersionedTable.resolvePointLookup(s, root, "event_id", k).length
        VersionedTable.readPoint(s, root, "event_id", k)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      // the files-read gate: blooms collapse 8 candidate segments per
      // lookup to ~1 (2x allows rare false positives)
      require(openedTotal <= 2 * keys.length && openedTotal >= keys.length,
        s"bloom skip opened $openedTotal segments for ${keys.length} lookups")
      import s.implicits._
      rows.toSeq.toDF("event_id", "user_id").orderBy("event_id")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A45 — SCHEMA EVOLUTION on the versioned table (Iceberg add-column,
    * snapshot-scoped): a later era of segments carries a NEW column; the
    * head snapshot reads the UNION schema (old rows surface null for the
    * added column — no rewrite of history, the entire point), while the
    * pre-evolution snapshot still reads with EXACTLY the schema it was
    * written under (gated: v0 has 2 columns). A MOR delete then lands
    * across both eras in one equality-delete segment, proving row-level
    * operations compose with schema drift.
    *
    * Scale: adding a column to a 100 TB table costs zero data writes —
    * only new segments carry it; the union-schema read is a per-file
    * footer merge, no scan. */
  val versionedSchemaEvolution: Reg = Reg.sql(
    "a45_versioned_schema_evolution",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |old AS (SELECT event_id, user_id FROM e WHERE event_id % 2 = 0),
      |nw AS (SELECT event_id, user_id, user_id % 7 AS score FROM e
      |       WHERE event_id % 2 = 1),
      |head AS (SELECT event_id, user_id, NULL AS score FROM old
      |         UNION ALL SELECT event_id, user_id, score FROM nw),
      |kept AS (SELECT * FROM head WHERE user_id % 11 <> 0)
      |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS head_rows,
      |       CAST((SELECT COUNT(*) FROM old) AS BIGINT) AS null_score_rows,
      |       CAST((SELECT SUM(score) FROM nw) AS BIGINT) AS score_sum,
      |       CAST(2 AS BIGINT) AS v0_columns,
      |       CAST(3 AS BIGINT) AS head_columns,
      |       CAST((SELECT COUNT(*) FROM head) -
      |            (SELECT COUNT(*) FROM kept) AS BIGINT) AS deleted_rows,
      |       CAST((SELECT COUNT(*) FROM kept) AS BIGINT)
      |         AS after_delete_rows""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_schevo")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 2 === 0))
      // the evolution: a new era of segments carries `score`
      VersionedTable.append(s, root,
        e.where(col("event_id") % 2 === 1)
          .withColumn("score", col("user_id") % 7))
      val head = VersionedTable.read(s, root, mergeSchema = true)
      val agg = head.agg(
        count(lit(1)),
        count(when(col("score").isNull, 1)),
        sum("score").cast("bigint")).head()
      val v0Cols = VersionedTable.read(s, root, Some(0L), mergeSchema = true)
        .columns.length
      require(v0Cols == 2, s"v0 schema leaked the evolved column: $v0Cols")
      // row-level ops compose with the drifted schema: one MOR delete
      // whose keys span BOTH eras
      val (_, nDel) = VersionedTable.morDelete(s, root, Seq("event_id"),
        _.where(col("user_id") % 11 === 0))
      val after = VersionedTable.read(s, root, mergeSchema = true).count()
      import s.implicits._
      Seq((agg.getLong(0), agg.getLong(1), agg.getLong(2), v0Cols.toLong,
        head.columns.length.toLong, nDel, after))
        .toDF("head_rows", "null_score_rows", "score_sum", "v0_columns",
          "head_columns", "deleted_rows", "after_delete_rows")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A46 — BIN-PACKED COMPACTION (Iceberg rewrite_data_files binpack):
    * six equal micro-batch segments plus a pending MOR delete fold into
    * THREE target-sized bins (first-fit descending, two sources each,
    * rewritten concurrently with the delete materialized in) — never
    * into one mega-segment, which at 100 TB would undo file-level
    * parallelism and pruning granularity. Content is identical at head
    * AND at the pre-compaction version (representation change, zero
    * content change — both stated by the oracle); the now-dangling
    * delete segment retires at the commit. */
  val binpackCompact: Reg = Reg.sql(
    "a46_binpack_compact",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |kept AS (SELECT * FROM e WHERE user_id % 9 <> 0)
      |SELECT CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM kept) AS BIGINT) AS head_uid_sum,
      |       CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS prev_rows,
      |       CAST(3 AS BIGINT) AS bins_written,
      |       CAST(6 AS BIGINT) AS segments_folded,
      |       CAST(0 AS BIGINT) AS delete_segments_after""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_binpack")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 6 === 0),
        statCols = Seq("event_id"))
      (1 to 5).foreach(i => VersionedTable.append(s, root,
        e.where(col("event_id") % 6 === i), statCols = Seq("event_id")))
      VersionedTable.morDelete(s, root, Seq("event_id"),
        _.where(col("user_id") % 9 === 0))
      val maxBytes = VersionedTable.segmentBytes(s, root)
        .filter(_._1.startsWith("seg_")).map(_._2).max
      val (nv, bins, folded) = VersionedTable.compactBinpack(
        s, root, smallBytes = maxBytes, targetBytes = 2 * maxBytes + 16)
      require(bins == 3 && folded == 6,
        s"binpack wrote $bins bins from $folded segments — expected 3/6")
      val delsAfter = VersionedTable.segmentsOf(s, root, nv)
        .count(_.isDelete)
      val head = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val prevRows = VersionedTable.read(s, root, Some(nv - 1)).count()
      import s.implicits._
      Seq((head.getLong(0), head.getLong(1), prevRows,
        bins.toLong, folded.toLong, delsAfter.toLong))
        .toDF("head_rows", "head_uid_sum", "prev_rows", "bins_written",
          "segments_folded", "delete_segments_after")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A47 — INCREMENTAL VIEW MAINTENANCE fed by the MOR CHANGELOG (the
    * composition a34/a37's IVM and a43's changelog exist for): a grouped
    * aggregate view materializes once at v1, then stays fresh through an
    * upsert and a delete WITHOUT recomputation —
    * [[graft.mutation.VersionedTable.changelogRows]] enriches each
    * commit's deleted keys to the FULL rows they removed (semi-join
    * against the pre-commit snapshot — an aggregate can only retract a
    * row it can see), and each change set folds in as signed partial
    * aggregates: view ⊎ agg(inserts) ⊎ −agg(deletedRows). The oracle is
    * the direct aggregate of the final table — maintained ≡ recomputed,
    * per group, exactly.
    *
    * Scale: per commit the maintenance cost is delta-sized aggregates
    * plus one view-sized merge — never a rescan of the fact table. */
  val changelogIvm: Reg = Reg.sql(
    "a47_changelog_ivm",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |s0 AS (SELECT * FROM e WHERE event_id % 4 = 0),
      |s1 AS (SELECT * FROM e WHERE event_id % 4 = 1),
      |v1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1),
      |u AS (SELECT event_id, user_id + 1000003 AS user_id FROM s0
      |      WHERE user_id % 3 = 0),
      |v2 AS (SELECT event_id, user_id FROM u
      |       UNION ALL SELECT * FROM v1
      |       WHERE event_id NOT IN (SELECT event_id FROM u)),
      |head AS (SELECT * FROM v2 WHERE user_id % 5 <> 0)
      |SELECT CAST(user_id % 50 AS BIGINT) AS bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(event_id) AS BIGINT) AS eid_sum
      |FROM head GROUP BY user_id % 50 ORDER BY bucket""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_chivm")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 4 === 0))
      VersionedTable.append(s, root, e.where(col("event_id") % 4 === 1))
      def aggOf(df: org.apache.spark.sql.DataFrame, sign: Int) =
        df.groupBy((col("user_id") % 50).as("bucket"))
          .agg((count(lit(1)) * sign).as("n_rows"),
            (sum("event_id") * sign).cast("bigint").as("eid_sum"))
      // the view materializes ONCE, at v1
      var view = aggOf(VersionedTable.read(s, root), 1).localCheckpoint()

      // the table keeps moving: an upsert wave and a delete wave
      VersionedTable.morUpsert(s, root,
        e.where(col("event_id") % 4 === 0 && col("user_id") % 3 === 0)
          .withColumn("user_id", col("user_id") + 1000003L),
        Seq("event_id"))
      VersionedTable.morDelete(s, root, Seq("event_id"),
        _.where(col("user_id") % 5 === 0))

      // per-commit maintenance: signed partial aggregates, view-sized merge
      VersionedTable.changelogRows(s, root, 1L, 3L).foreach { cs =>
        val parts = Seq(Some(view),
          cs.inserted.map(aggOf(_, 1)),
          cs.deletedRows.map(aggOf(_, -1))).flatten
        view = parts.reduce(_ unionByName _)
          .groupBy("bucket")
          .agg(sum("n_rows").as("n_rows"),
            sum("eid_sum").cast("bigint").as("eid_sum"))
          .where(col("n_rows") > 0)
          .localCheckpoint()
      }
      // maintained ≡ recomputed, stated by comparing against the oracle's
      // direct aggregate of the final table
      view.select(col("bucket").cast("bigint").as("bucket"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("eid_sum").cast("bigint").as("eid_sum"))
        .orderBy("bucket")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A48 — COLUMN RENAME as a metadata-only commit (the Iceberg
    * rename-without-rewrite substance, emulated via a manifest-carried
    * physical→logical name chain instead of parquet field ids): renaming
    * a column on a populated table writes ZERO data files (gated: the
    * rename commit references byte-identical segment names), the head
    * snapshot surfaces EVERY era — segments physically written under the
    * old name included — under the new name, the pre-rename snapshot
    * still reads under its own schema (snapshot-scoped, the time-travel
    * contract), and row-level MOR deletes plus stats-pruned reads keyed
    * on the RENAMED column keep working across physical eras because the
    * manifest's stat keys and delete-key names travel with the rename.
    *
    * Scale: renaming a column on a 100 TB table is one manifest write;
    * the per-era mapping costs a `withColumnRenamed` projection at scan
    * time and disappears entirely as compaction migrates physical names
    * forward. */
  val versionedRename: Reg = Reg.sql(
    "a48_versioned_rename",
    """WITH e AS (SELECT event_id, user_id,
      |             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |           FROM events WHERE event_id < 60000),
      |kept AS (SELECT * FROM e WHERE user_id % 13 <> 0),
      |pre AS (SELECT * FROM e WHERE event_id % 3 <> 2)
      |SELECT CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(cents) FROM kept) AS BIGINT) AS head_cents_sum,
      |       CAST((SELECT COUNT(*) FROM pre) AS BIGINT) AS pre_rename_rows,
      |       CAST((SELECT SUM(cents) FROM pre) AS BIGINT)
      |         AS pre_rename_amount_sum,
      |       CAST((SELECT COUNT(*) FROM kept
      |             WHERE cents BETWEEN 10000 AND 20000) AS BIGINT)
      |         AS pruned_range_rows""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_rename")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select(col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("bigint").as("amount"))
      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0),
        statCols = Seq("amount"))
      VersionedTable.append(s, root, e.where(col("event_id") % 3 === 1),
        statCols = Seq("amount"))
      val segsBefore =
        VersionedTable.segmentsOf(s, root, 1L).map(_.name).toSet
      val rv = VersionedTable.renameColumn(s, root, "amount", "cents")
      // metadata-only gate: the rename commit references the SAME files
      require(VersionedTable.segmentsOf(s, root, rv).map(_.name).toSet
        == segsBefore, "rename moved data")
      // the post-rename era appends under the new name
      VersionedTable.append(s, root,
        e.where(col("event_id") % 3 === 2).withColumnRenamed("amount", "cents"),
        statCols = Seq("cents"))
      // a MOR delete keyed across ALL physical eras
      VersionedTable.morDelete(s, root, Seq("event_id"),
        _.where(col("user_id") % 13 === 0))
      val head = VersionedTable.read(s, root)
      require(head.columns.contains("cents") && !head.columns.contains("amount"),
        "head schema must carry only the new name")
      val hAgg = head.agg(count(lit(1)), sum("cents").cast("bigint")).head()
      // time travel: the pre-rename snapshot keeps its OWN schema
      val pre = VersionedTable.read(s, root, Some(rv - 1))
      require(pre.columns.contains("amount") && !pre.columns.contains("cents"),
        "pre-rename snapshot schema must keep the old name")
      val pAgg = pre.agg(count(lit(1)), sum("amount").cast("bigint")).head()
      // stats-pruned read on the RENAMED column (stat keys were remapped)
      val pruned = VersionedTable
        .readPruned(s, root, "cents", 10000.0, 20000.0).count()
      import s.implicits._
      Seq((hAgg.getLong(0), hAgg.getLong(1), pAgg.getLong(0), pAgg.getLong(1),
        pruned))
        .toDF("head_rows", "head_cents_sum", "pre_rename_rows",
          "pre_rename_amount_sum", "pruned_range_rows")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A49 — PARTITION-SPEC EVOLUTION (Iceberg evolve-spec): the table
    * starts laid out by one partition column (event-id decile buckets)
    * and LATER batches land under a different spec (user-id residues) —
    * no rewrite of existing data, ever. Each partition value is its
    * segment's exact manifest stat, so pruning on the OLD column skips
    * old-era segments exactly while keeping new-era segments
    * conservatively (absent stat ≠ prune), and symmetrically for the new
    * column — both gated by files-read counts, with row-level content
    * identical to the direct computation in both engines.
    *
    * Scale: changing how a 100 TB table partitions costs one manifest
    * write per subsequent commit; historical layout keeps serving the
    * queries it was built for. */
  val partitionEvolution: Reg = Reg.sql(
    "a49_partition_evolution",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |old AS (SELECT * FROM e WHERE event_id % 2 = 0),
      |nw AS (SELECT * FROM e WHERE event_id % 2 = 1),
      |oldq AS (SELECT * FROM old WHERE event_id // 6000 = 1),
      |nwq AS (SELECT * FROM nw WHERE user_id % 8 = 5)
      |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows,
      |       CAST((SELECT COUNT(*) FROM oldq) +
      |            (SELECT COUNT(*) FROM nw WHERE event_id // 6000 = 1)
      |            AS BIGINT) AS old_col_rows,
      |       CAST((SELECT COUNT(*) FROM nwq) +
      |            (SELECT COUNT(*) FROM old WHERE user_id % 8 = 5)
      |            AS BIGINT) AS new_col_rows,
      |       CAST((SELECT SUM(user_id) FROM oldq) +
      |            (SELECT SUM(user_id) FROM nw WHERE event_id // 6000 = 1)
      |            AS BIGINT) AS old_col_uid_sum""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_pevo")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select(col("event_id"), col("user_id"),
          (col("event_id") / 6000).cast("bigint").as("eid_bucket"),
          (col("user_id") % 8).as("uid_bucket"))
      // era 1: partitioned by event-id decile buckets (10 segments)
      val (_, nOld) = VersionedTable.createPartitioned(s, root,
        e.where(col("event_id") % 2 === 0), "eid_bucket")
      // era 2 — the SPEC CHANGE: same table, new batches lay out by
      // user-id residue (8 segments); old segments untouched
      val (_, nNew) = VersionedTable.appendPartitioned(s, root,
        e.where(col("event_id") % 2 === 1), "uid_bucket")
      // segment counts follow the data's bucket domains (sf-dependent for
      // the event-id deciles; user residues always cover 0..7)
      require(nOld >= 2 && nNew == 8,
        s"unexpected layout: $nOld old-spec + $nNew new-spec segments")
      // pruning on the OLD spec column: exactly 1 old-era segment + all
      // 8 new-era segments (conservative — they carry no eid_bucket stat)
      val oldQ = VersionedTable.resolveSegments(s, root, "eid_bucket", 1.0, 1.0)
      require(oldQ.length == 1 + nNew,
        s"old-spec prune opened ${oldQ.length} segments, expected ${1 + nNew}")
      // and symmetrically on the NEW spec column
      val newQ = VersionedTable.resolveSegments(s, root, "uid_bucket", 5.0, 5.0)
      require(newQ.length == nOld + 1,
        s"new-spec prune opened ${newQ.length} segments, expected ${nOld + 1}")
      val headRows = VersionedTable.read(s, root).count()
      val oldRead = VersionedTable.readPruned(s, root, "eid_bucket", 1.0, 1.0)
      val oAgg = oldRead.agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val newRows = VersionedTable.readPruned(s, root, "uid_bucket", 5.0, 5.0)
        .count()
      import s.implicits._
      Seq((headRows, oAgg.getLong(0), newRows, oAgg.getLong(1)))
        .toDF("head_rows", "old_col_rows", "new_col_rows", "old_col_uid_sum")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A50 — RESTORE: rollback-as-a-new-commit (Delta's `RESTORE TABLE`,
    * Iceberg's rollback). A bad copy-on-write job (v2 over-deletes with a
    * wrong predicate) is undone by [[graft.mutation.VersionedTable.restore]]
    * committing v3 = v1's segment list verbatim — one manifest write, zero
    * data files touched (the query `require`s the restored manifest's
    * segment names+seqs equal the target's exactly), the bad v2 stays
    * time-travel-readable for audit, and the table keeps accepting appends
    * on top of the restored lineage (v4). Every emitted count is a closed
    * form over orders, so the oracle pins each snapshot's exact content.
    *
    * Scale: rollback of a 100 TB table costs one manifest write; the
    * mistake's blast radius is audit history, not a rewrite. */
  val versionedRestore: Reg = Reg.sql(
    "a50_restore",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 4 AS m
      |           FROM orders),
      |v0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1)),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1, 2)),
      |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1, 2) AND c % 7 <> 2),
      |v4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o)
      |SELECT 'v0' AS snapshot, n AS rows_n, s AS custkey_sum FROM v0
      |UNION ALL SELECT 'v1', n, s FROM v1
      |UNION ALL SELECT 'v2_bad', n, s FROM v2
      |UNION ALL SELECT 'v3_restored', n, s FROM v1
      |UNION ALL SELECT 'v4_appended', n, s FROM v4
      |ORDER BY snapshot""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_restore")
    val root = s"$work/t"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, root, o.where(col("m").isin(0, 1)),
        statCols = Seq("m"))
      VersionedTable.append(s, root, o.where(col("m") === 2),
        statCols = Seq("m"))
      // the incident: a correction job ships the WRONG predicate and
      // copy-on-writes away every c%7==2 row (v2)
      VersionedTable.replace(s, root,
        VersionedTable.read(s, root).where(!(col("c") % 7 === 2)))
      val v3 = VersionedTable.restore(s, root, 1L)
      require(v3 == 3L, s"restore committed v$v3, expected v3")
      // rollback must be METADATA-ONLY: the restored manifest carries the
      // target's segment entries verbatim (names AND seqs — delete scoping
      // must replay identically)
      val want = VersionedTable.segmentsOf(s, root, 1L).map(g => (g.name, g.seq))
      val got = VersionedTable.segmentsOf(s, root, 3L).map(g => (g.name, g.seq))
      require(got == want, s"restore rewrote the manifest: $got != $want")
      // the restored lineage keeps accepting appends
      VersionedTable.append(s, root, o.where(col("m") === 3),
        statCols = Seq("m"))
      def stat(v: Long): (Long, Long) = {
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (n0, s0) = stat(0); val (n1, s1) = stat(1); val (n2, s2) = stat(2)
      val (n3, s3) = stat(3); val (n4, s4) = stat(4)
      import s.implicits._
      Seq(("v0", n0, s0), ("v1", n1, s1), ("v2_bad", n2, s2),
        ("v3_restored", n3, s3), ("v4_appended", n4, s4))
        .toDF("snapshot", "rows_n", "custkey_sum")
        .orderBy("snapshot")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A51 — ORPHAN-FILE vacuum (Iceberg's `remove_orphan_files`): crashed
    * writers leave segments written but never committed, `.stage_*`
    * directories from killed partitioned layouts, and bloom sidecars
    * without a segment — debt that NO snapshot references, so
    * expire-snapshots can never collect it. The query plants exactly one
    * of each (plus a sidecar for a LIVE segment that must survive),
    * proves the age guard refuses young files (a cleanup racing a live
    * writer must not eat its about-to-commit segment), then vacuums and
    * `require`s the deleted set is exactly the planted one, byte-count
    * gates that both snapshots still read identically. All emitted
    * numbers are closed forms / stated constants for the oracle.
    *
    * Scale: the scan is one directory listing + manifest union — metadata-
    * sized; deletes are O(orphans). */
  val orphanVacuum: Reg = Reg.sql(
    "a51_orphan_vacuum",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 4 AS m
      |           FROM orders),
      |v0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m = 0),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1))
      |SELECT 'age_guarded' AS step, CAST(0 AS BIGINT) AS rows_n,
      |       CAST(3 AS BIGINT) AS aux
      |UNION ALL SELECT 'v0_after', n, s FROM v0
      |UNION ALL SELECT 'v1_after', n, s FROM v1
      |UNION ALL SELECT 'vacuumed', CAST(3 AS BIGINT), CAST(1 AS BIGINT)
      |ORDER BY step""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_orphan")
    val root = s"$work/t"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, root, o.where(col("m") === 0), statCols = Seq("m"))
      VersionedTable.append(s, root, o.where(col("m") === 1), statCols = Seq("m"))
      val liveSeg = VersionedTable.segmentsOf(s, root, 1L).head.name
      // plant the three orphan classes a real incident leaves behind
      val orphanSeg = "seg_orphan" + java.util.UUID.randomUUID().toString.replace("-", "")
      o.where(col("m") === 2).write.parquet(s"$root/$orphanSeg")
      o.limit(1).write.parquet(s"$root/.stage_crashed/__p=0")
      val blooms = new java.io.File(s"$root/_blooms")
      blooms.mkdirs()
      Files.writeString(blooms.toPath.resolve(s"$orphanSeg.k.bloom"), "x")
      Files.writeString(blooms.toPath.resolve(s"$liveSeg.k.bloom"), "x")
      // age guard: everything just planted is YOUNG — a retention window
      // must protect it (the concurrent-writer race)
      val guarded = VersionedTable.removeOrphans(s, root, olderThanMs = 3600000L)
      require(guarded.isEmpty, s"age guard failed, deleted: $guarded")
      val deleted = VersionedTable.removeOrphans(s, root)
      val want = Seq(".stage_crashed", s"_blooms/$orphanSeg.k.bloom", orphanSeg).sorted
      require(deleted == want, s"vacuum deleted $deleted, wanted $want")
      require(new java.io.File(blooms, s"$liveSeg.k.bloom").exists(),
        "vacuum ate the live segment's sidecar")
      def stat(v: Long): (Long, Long) = {
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (n0, s0) = stat(0); val (n1, s1) = stat(1)
      import s.implicits._
      Seq(("age_guarded", guarded.length.toLong, 3L),
        ("v0_after", n0, s0), ("v1_after", n1, s1),
        ("vacuumed", deleted.length.toLong, 1L))
        .toDF("step", "rows_n", "aux")
        .orderBy("step")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** J19 — RUNTIME-FILTER segment pruning (the dynamic-partition-pruning
    * substance on the versioned table): the fact side lands as one
    * day-partitioned layout (each day's value IS its segment's exact
    * manifest stat), the dim side's qualifying day range is NOT knowable
    * at plan time — it is a one-row aggregate over the dim table computed
    * at RUN time — and the fact scan then opens only the segments whose
    * stats intersect that measured [lo, hi] (`resolveSegments` +
    * `readPruned`, files-read gated: exactly 3 of 32 here). This is the
    * join-sided pruning Iceberg/Delta get from DPP and Spark from
    * runtime filters; on a 100 TB fact table the scan cost becomes the
    * dim's day span, not the corpus. The oracle restates the whole join
    * in closed form, so the pruned plan must also be CORRECT, not just
    * small. */
  val runtimePruneJoin: Reg = Reg.sql(
    "j19_runtime_prune_join",
    """WITH fact AS (
      |  SELECT l_suppkey % 32 AS day, l_partkey AS bssid,
      |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |dim AS (
      |  SELECT 8 + s_suppkey % 3 AS day, s_suppkey
      |  FROM supplier WHERE s_suppkey % 11 = 0),
      |d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dim_n FROM dim GROUP BY day)
      |SELECT f.day, CAST(COUNT(*) AS BIGINT) AS fact_rows,
      |       CAST(SUM(f.cents) AS BIGINT) AS cents_sum, d.dim_n
      |FROM fact f JOIN d ON d.day = f.day
      |GROUP BY f.day, d.dim_n ORDER BY f.day""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_dpp")
    val root = s"$work/t"
    try {
      val fact = Tables.lineitem(s, dir).select(
        (col("l_suppkey") % 32).as("day"), col("l_partkey").as("bssid"),
        round(col("l_extendedprice") * 100).cast("bigint").as("cents"))
      val (_, nSegs) = VersionedTable.createPartitioned(s, root, fact, "day")
      require(nSegs == 32, s"expected 32 day segments, got $nSegs")
      val dim = Tables.supplier(s, dir)
        .where(col("s_suppkey") % 11 === 0)
        .select((lit(8) + col("s_suppkey") % 3).as("day"))
      // the RUNTIME filter: dim bounds exist only after this aggregate runs
      val b = dim.agg(min("day").cast("double"), max("day").cast("double")).head()
      val (lo, hi) = (b.getDouble(0), b.getDouble(1))
      val opened = VersionedTable.resolveSegments(s, root, "day", lo, hi)
      require(opened.length == 3,
        s"runtime pruning failed: opened ${opened.length} of 32 segments")
      val dimCnt = dim.groupBy("day").agg(count(lit(1)).as("dim_n"))
      val out = VersionedTable.readPruned(s, root, "day", lo, hi)
        .join(dimCnt, "day")
        .groupBy("day", "dim_n")
        .agg(count(lit(1)).cast("bigint").as("fact_rows"),
          sum("cents").cast("bigint").as("cents_sum"))
        .select(col("day"), col("fact_rows"), col("cents_sum"),
          col("dim_n").cast("bigint").as("dim_n"))
        .orderBy("day")
      // 3-row rollup: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A52 — SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`): a
    * zero-copy fork of a versioned table. The clone's first commit is ONE
    * manifest whose entries reference the source's segments by absolute
    * path — `require`d to be all-external and data-file-free — after
    * which the two tables evolve independently: the clone takes an append
    * and a merge-on-read DELETE (the delete's anti-join spans external
    * and local segments alike) while the source's head, version count and
    * bytes stay untouched, and the clone's pre-mutation snapshot stays
    * time-travel-readable. Every emitted count is a closed form over
    * orders; the zero-copy facts (2 external refs, 1 local data segment)
    * are structural constants of the scenario, `require`-gated before
    * they are emitted.
    *
    * Scale: cloning a 100 TB table is one manifest write — the
    * dev/test-fork and what-if-experiment primitive; clone-side writes
    * cost only their own deltas. */
  val shallowClone: Reg = Reg.sql(
    "a52_shallow_clone",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 4 AS m
      |           FROM orders),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1, 2)),
      |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o),
      |v3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE c % 7 <> 3)
      |SELECT 'clone_v1' AS snapshot, n AS rows_n, s AS custkey_sum FROM v1
      |UNION ALL SELECT 'clone_v2_appended', n, s FROM v2
      |UNION ALL SELECT 'clone_v3_mor_delete', n, s FROM v3
      |UNION ALL SELECT 'src_after', n, s FROM v1
      |UNION ALL SELECT 'zero_copy', CAST(2 AS BIGINT), CAST(1 AS BIGINT)
      |ORDER BY snapshot""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_clone")
    val src = s"$work/src"
    val dst = s"$work/dst"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, src, o.where(col("m").isin(0, 1)),
        statCols = Seq("m"))
      VersionedTable.append(s, src, o.where(col("m") === 2),
        statCols = Seq("m"))
      val cv = VersionedTable.shallowClone(s, src, dst)
      // the clone's first version IS the cloned source version (keeps the
      // carried seq clock strictly below future clone commits)
      require(cv == 1L, s"clone landed at v$cv, expected v1")
      val refs = VersionedTable.segmentsOf(s, dst, cv)
      require(refs.length == 2 && refs.forall(g => g.name.contains(":/")),
        s"clone manifest must carry 2 external refs: $refs")
      // the clone diverges: an append and a merge-on-read delete
      VersionedTable.append(s, dst, o.where(col("m") === 3),
        statCols = Seq("m"))
      val (v3, _) = VersionedTable.morDelete(s, dst, Seq("k"),
        _.where(col("c") % 7 === 3))
      require(v3 == 3L, s"clone mutations landed at v$v3, expected v3")
      // the source is untouched: same head version, same content
      require(VersionedTable.currentVersion(s, src).contains(1L),
        "source grew a version from clone-side writes")
      // zero-copy: the only files under the clone root are its OWN deltas
      val fsys = new java.io.File(dst)
      val localData = fsys.listFiles().count(_.getName.startsWith("seg_"))
      val localDel = fsys.listFiles().count(_.getName.startsWith("del_"))
      require(localData == 1 && localDel == 1,
        s"clone copied data: $localData seg / $localDel del dirs under $dst")
      def stat(root: String, v: Option[Long]): (Long, Long) = {
        val r = VersionedTable.read(s, root, v)
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (n1, s1) = stat(dst, Some(1L))
      val (n2, s2) = stat(dst, Some(2L))
      val (n3, s3) = stat(dst, None)
      val (ns, ss) = stat(src, None)
      require((n1, s1) == (ns, ss),
        "clone v1 must read identically to the source head")
      import s.implicits._
      Seq(("clone_v1", n1, s1), ("clone_v2_appended", n2, s2),
        ("clone_v3_mor_delete", n3, s3), ("src_after", ns, ss),
        ("zero_copy", 2L, 1L))
        .toDF("snapshot", "rows_n", "custkey_sum")
        .orderBy("snapshot")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A53 — CLUSTERING METRICS (Delta OPTIMIZE-report / Iceberg
    * partition-stats observability): how well a table's physical layout
    * supports data skipping, measured ENTIRELY from manifest metadata.
    * Eight appends with deliberately overlapping key ranges (each spans
    * three 1k-buckets) give a point lookup an overlap depth of up to 3 —
    * `resolveSegments` must open every range covering the probe; the
    * same rows re-clustered into disjoint partition segments
    * (createPartitioned) bring every probe to exactly 1 file. The four
    * probes sit 500 away from any planted range endpoint, so realized
    * min/max stats cannot flip a count. Layout quality is THE 100 TB
    * lever: the overlapped layout reads 3× the bytes for identical
    * results, and this report is how an operator sees that without
    * scanning data — the scan is |segments| manifest lines. */
  val clusterMetrics: Reg = Reg.sql(
    "a53_cluster_metrics",
    """WITH o AS (SELECT o_orderkey % 10000 AS kk FROM orders),
      |dup AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
      |        FROM o, range(0, 8) t(i)
      |        WHERE kk BETWEEN i * 1000 AND i * 1000 + 2999),
      |plain AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o)
      |SELECT 'probe_0500' AS metric, CAST(1 AS BIGINT) AS overlapped,
      |       CAST(1 AS BIGINT) AS clustered
      |UNION ALL SELECT 'probe_2500', 3, 1
      |UNION ALL SELECT 'probe_7500', 3, 1
      |UNION ALL SELECT 'probe_9500', 1, 1
      |UNION ALL SELECT 'rows', dup.n, plain.n FROM dup, plain
      |UNION ALL SELECT 'segments', 8, 10
      |ORDER BY metric""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_cluster")
    val (t1, t2) = (s"$work/t1", s"$work/t2")
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 10000).as("kk"))
      def slice(i: Int) =
        o.where(col("kk").between(i * 1000, i * 1000 + 2999))
      VersionedTable.create(s, t1, slice(0), statCols = Seq("kk"))
      (1 to 7).foreach(i =>
        VersionedTable.append(s, t1, slice(i), statCols = Seq("kk")))
      val (_, nSeg2) = VersionedTable.createPartitioned(s, t2,
        o.withColumn("bucket", expr("kk div 1000")), "bucket")
      require(nSeg2 == 10, s"clustered layout landed $nSeg2 segments")
      val probes = Seq(500L, 2500L, 7500L, 9500L)
      val depth1 = probes.map(p => p -> VersionedTable
        .resolveSegments(s, t1, "kk", p.toDouble, p.toDouble).length.toLong)
      val depth2 = probes.map(p => p -> VersionedTable
        .resolveSegments(s, t2, "bucket", (p / 1000).toDouble,
          (p / 1000).toDouble).length.toLong)
      val rows1 = VersionedTable.read(s, t1).count()
      val rows2 = VersionedTable.read(s, t2).count()
      val nSeg1 =
        VersionedTable.segmentsOf(s, t1,
          VersionedTable.currentVersion(s, t1).get).length.toLong
      import s.implicits._
      (probes.indices.map { i =>
        (f"probe_${probes(i)}%04d", depth1(i)._2, depth2(i)._2)
      } ++ Seq(("rows", rows1, rows2), ("segments", nSeg1, nSeg2.toLong)))
        .toDF("metric", "overlapped", "clustered")
        .orderBy("metric")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A55 — OPTIMISTIC CONCURRENCY CONTROL: the lost-update anomaly and
    * the CAS loop that closes it, on real racing commits. A fast writer
    * appends (v1) while a slow writer holds a REPLACE it derived from
    * the stale v0 snapshot; the slow writer's `replaceIf(expect = 0)`
    * MUST fail (the create-exclusive manifest rename is the
    * compare-and-swap — had it been a plain last-writer-wins replace,
    * the append's rows would silently vanish), and the OCC retry —
    * re-read the new head, re-derive the transform, `replaceIf(expect
    * = 1)` — lands a v2 that carries BOTH changes. `require`-gated:
    * the stale attempt throws, the head lands at v2 with the union of
    * effects, v1 stays time-travel-readable. Every snapshot aggregate
    * is a closed form over orders. At 100 TB this is the difference
    * between a compaction job racing an ingest stream and a compaction
    * job EATING an ingest stream. */
  val occConflict: Reg = Reg.sql(
    "a55_occ_conflict",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 4 AS m
      |           FROM orders),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1)),
      |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1) AND c % 7 <> 2)
      |SELECT 'conflicts' AS snapshot, CAST(1 AS BIGINT) AS rows_n,
      |       CAST(2 AS BIGINT) AS custkey_sum
      |UNION ALL SELECT 'v1_append', n, s FROM v1
      |UNION ALL SELECT 'v2_retried', n, s FROM v2
      |ORDER BY snapshot""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_occ")
    val root = s"$work/t"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, root, o.where(col("m") === 0))
      // slow writer SNAPSHOTS its base: derives a purge from v0's content
      val staleBase = VersionedTable.currentVersion(s, root).get
      val stalePurged = VersionedTable.read(s, root, Some(staleBase))
        .where(!(col("c") % 7 === 2))
      // fast writer lands first
      VersionedTable.append(s, root, o.where(col("m") === 1))
      // stale CAS must LOSE — a success here would silently drop the append
      val conflicted =
        try { VersionedTable.replaceIf(s, root, stalePurged, staleBase); 0L }
        catch { case e: java.io.IOException
            if e.getMessage.contains("lost the race") => 1L }
      require(conflicted == 1L, "stale replaceIf won the race")
      // the OCC loop: re-read the NEW head, re-derive, retry
      val head = VersionedTable.currentVersion(s, root).get
      val v2 = VersionedTable.replaceIf(s, root,
        VersionedTable.read(s, root, Some(head))
          .where(!(col("c") % 7 === 2)), head)
      require(v2 == 2L, s"retry landed v$v2, expected v2")
      def stat(v: Long): (Long, Long) = {
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (n1, s1) = stat(1L)
      val (n2, s2) = stat(2L)
      import s.implicits._
      Seq(("conflicts", 1L, 2L), ("v1_append", n1, s1), ("v2_retried", n2, s2))
        .toDF("snapshot", "rows_n", "custkey_sum")
        .orderBy("snapshot")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A56 — AS OF TIMESTAMP time travel: Delta's timestamp resolution
    * (latest commit whose manifest mtime <= the probe) on the versioned
    * table. Wall-clock commit times are inherently non-reproducible, so
    * the query does what a correct CLIENT does: spaces the three commit
    * mtimes deterministically and probes BETWEEN them — mid-gap resolves
    * the earlier version, an exact commit time resolves that commit
    * (<= semantics), far-future resolves head, and a pre-creation probe
    * throws (caught and emitted as its own row). Resolution is one
    * directory listing; content checks are the closed-form snapshot
    * aggregates. */
  val timeTravelTs: Reg = Reg.sql(
    "a56_time_travel_ts",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderkey % 4 AS m
      |           FROM orders),
      |v0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m = 0),
      |v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1)),
      |v2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      |       FROM o WHERE m IN (0, 1, 2))
      |SELECT 'at_v1_commit' AS probe, n AS rows_n, s AS custkey_sum FROM v1
      |UNION ALL SELECT 'far_future', n, s FROM v2
      |UNION ALL SELECT 'mid_gap_01', n, s FROM v0
      |UNION ALL SELECT 'pre_creation', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
      |ORDER BY probe""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_ttts")
    val root = s"$work/t"
    try {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          (col("o_orderkey") % 4).as("m"))
      VersionedTable.create(s, root, o.where(col("m") === 0))
      VersionedTable.append(s, root, o.where(col("m") === 1))
      VersionedTable.append(s, root, o.where(col("m") === 2))
      // space the commit mtimes deterministically (the client-side move
      // Delta docs recommend when commits land within one clock tick)
      val logDir = new java.io.File(s"$root/_log")
      val manifests = logDir.listFiles()
        .filter(_.getName.endsWith(".manifest")).sortBy(_.getName)
      val t0 = ((System.currentTimeMillis() / 10000L) * 10000L) - 600000L
      manifests.zipWithIndex.foreach { case (f, i) =>
        require(f.setLastModified(t0 + i * 60000L)); ()
      }
      def probe(ts: Long): (Long, Long, Long) = {
        val v = VersionedTable.versionAsOf(s, root, ts)
        val r = VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)), sum("c").cast("bigint")).head()
        (v, r.getLong(0), r.getLong(1))
      }
      val (rv1, n1, s1) = probe(t0 + 60000L)        // exactly v1's mtime
      val (rv2, n2, s2) = probe(t0 + 3600000L)      // far future -> head
      val (rv0, n0, s0) = probe(t0 + 30000L)        // mid-gap -> v0
      require(rv0 == 0L && rv1 == 1L && rv2 == 2L,
        s"AS OF resolution drifted: $rv0/$rv1/$rv2")
      val pre =
        try { probe(t0 - 60000L); (0L, 0L) }
        catch { case _: IllegalArgumentException => (-1L, -1L) }
      import s.implicits._
      Seq(("at_v1_commit", n1, s1), ("far_future", n2, s2),
        ("mid_gap_01", n0, s0), ("pre_creation", pre._1, pre._2))
        .toDF("probe", "rows_n", "custkey_sum")
        .orderBy("probe")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A57 — POSITION DELETES (Delta deletion vectors / Iceberg v2
    * position-delete files): [[graft.mutation.VersionedTable.posDelete]]
    * retires the rows matching a predicate by committing ONE `pdel_`
    * segment of (file, row-index) tuples — O(matched rows) written, ZERO
    * data files rewritten (gated: the pre-existing data directory set is
    * byte-identical afterwards), and NO key columns required — the
    * delete mechanism equality deletes cannot give a keyless or
    * duplicate-keyed table. Binding to physical files is what makes
    * resurrection impossible BY CONSTRUCTION: the query re-inserts half
    * the deleted rows and they are visible at head because fresh files
    * have fresh names — no seq scoping logic involved at all. The gate
    * then runs [[graft.mutation.VersionedTable.morMaterialize]] and
    * proves the vectors retire with head content unchanged.
    *
    * Scale: the scan-side cost while vectors exist is one broadcast
    * anti-join on (file, pos) — the build side is the vector itself,
    * kilobytes for a GDPR-sized delete on a 100 TB table. This is
    * exactly Delta's deletion-vector read path; materialization is the
    * same out-of-band trade as a42. */
  val positionDeletes: Reg = Reg.sql(
    "a57_position_deletes",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |base AS (SELECT * FROM e WHERE event_id % 3 <= 1),
      |victims AS (SELECT event_id, user_id FROM base WHERE user_id % 5 = 0),
      |reins AS (SELECT event_id, user_id FROM victims WHERE event_id % 2 = 0),
      |head AS (SELECT event_id, user_id FROM base WHERE user_id % 5 <> 0
      |         UNION ALL SELECT event_id, user_id FROM reins)
      |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS head_rows,
      |       CAST((SELECT SUM(user_id) FROM head) AS BIGINT) AS head_uid_sum,
      |       CAST((SELECT COUNT(*) FROM victims) AS BIGINT) AS deleted_positions,
      |       CAST((SELECT COUNT(*) FROM reins) AS BIGINT) AS reinserted_rows,
      |       CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS predelete_rows,
      |       CAST(1 AS BIGINT) AS deletion_vectors,
      |       CAST(0 AS BIGINT) AS data_segments_rewritten,
      |       CAST(0 AS BIGINT) AS vectors_after_materialize""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_pdelq")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0),
        statCols = Seq("event_id"))
      VersionedTable.append(s, root, e.where(col("event_id") % 3 === 1),
        statCols = Seq("event_id"))
      val preRows = VersionedTable.read(s, root).count()
      val dataDirsBefore = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet

      // the deletion vector: one pdel_ segment, no data rewrite
      val (v2, nDeleted) = VersionedTable.posDelete(
        s, root, col("user_id") % 5 === 0)
      require(v2 == 2L, s"posDelete commit expected v2, got $v2")
      val dataDirsAfter = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(f =>
          f.getName -> f.lastModified()).toSet
      require(dataDirsAfter == dataDirsBefore,
        "position delete touched a data segment — must be O(rows) only")
      val pdelSegs = VersionedTable.segmentsOf(s, root, v2)
        .count(_.isPosDelete)

      // non-resurrection BY FILE IDENTITY: re-insert half the victims;
      // the vector binds to the OLD files and cannot swallow the new
      VersionedTable.append(s, root,
        e.where(col("event_id") % 3 <= 1)
          .where(col("user_id") % 5 === 0 && col("event_id") % 2 === 0),
        statCols = Seq("event_id"))
      val head = VersionedTable.read(s, root)
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      val reins = VersionedTable.read(s, root).count() -
        VersionedTable.read(s, root, Some(2L)).count()
      val v1Rows = VersionedTable.read(s, root, Some(1L)).count()
      require(v1Rows == preRows, "pre-delete snapshot changed")

      // maintenance retires the vectors with head content unchanged
      val headBefore = head.getLong(0)
      VersionedTable.morMaterialize(s, root, statCols = Seq("event_id"))
      val vHead = VersionedTable.currentVersion(s, root).get
      require(VersionedTable.read(s, root).count() == headBefore,
        "materialization changed head content")
      val pdelAfter = VersionedTable.segmentsOf(s, root, vHead)
        .count(_.isPosDelete)

      import s.implicits._
      Seq((head.getLong(0), head.getLong(1), nDeleted, reins, v1Rows,
        pdelSegs.toLong, 0L, pdelAfter.toLong))
        .toDF("head_rows", "head_uid_sum", "deleted_positions",
          "reinserted_rows", "predelete_rows", "deletion_vectors",
          "data_segments_rewritten", "vectors_after_materialize")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A58 — STRING-BOUND SEGMENT PRUNING (the Iceberg truncate-transform
    * substance): manifests carry ASCII-guarded TRUNCATED string bounds
    * (lower = min truncated — shrinking keeps it a lower bound; upper =
    * max truncated with last kept char incremented — stays an upper
    * bound), so a text-dimension probe (`lang = 'en'` here; tenant/
    * source/region in production) opens ONLY the intersecting segments —
    * gated: `resolveSegmentsStr` returns exactly 1 of the 5 per-lang
    * segments, the same files-read discipline as the numeric gates (s8,
    * a19). At 100 TB text dimensions are the partition values; pruning
    * them from the manifest is the difference between one segment and a
    * full scan. Bounds are grammar-safe (unpadded base64 in the manifest
    * line) and conservative by construction, so the residual predicate
    * always re-applies. */
  val stringStatsPruning: Reg = Reg.sql(
    "a58_string_stats",
    """SELECT CAST((SELECT COUNT(DISTINCT lang) FROM documents) AS BIGINT)
      |         AS segments,
      |       CAST(1 AS BIGINT) AS files_opened,
      |       CAST((SELECT COUNT(*) FROM documents WHERE lang = 'en')
      |         AS BIGINT) AS en_docs,
      |       CAST((SELECT SUM(n_chars) FROM documents WHERE lang = 'en')
      |         AS BIGINT) AS en_nchars,
      |       CAST((SELECT COUNT(DISTINCT source) FROM documents
      |             WHERE lang = 'en') AS BIGINT) AS en_sources""".stripMargin) {
    (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_sstatq")
    val root = s"$work/t"
    try {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
      val langs = docs.select("lang").distinct()
        .collect().map(_.getString(0)).sorted
      langs.zipWithIndex.foreach { case (l, i) =>
        val slice = docs.where(col("lang") === l)
        if (i == 0) VersionedTable.create(s, root, slice, statCols = Seq("lang"))
        else VersionedTable.append(s, root, slice, statCols = Seq("lang"))
      }
      val opened = VersionedTable.resolveSegmentsStr(s, root, "lang", "en", "en")
      require(opened.length == 1,
        s"string-bound pruning opened ${opened.length} of ${langs.length} " +
          "segments for a single-lang probe")
      val en = VersionedTable.readPrunedStr(s, root, "lang", "en", "en")
        .agg(count(lit(1)), sum("n_chars").cast("bigint"),
          countDistinct("source")).head()
      import s.implicits._
      Seq((langs.length.toLong, opened.length.toLong, en.getLong(0),
        en.getLong(1), en.getLong(2)))
        .toDF("segments", "files_opened", "en_docs", "en_nchars",
          "en_sources")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A59 — IMPORT EXISTING FILES by reference (Iceberg `add_files` /
    * Delta `CONVERT TO DELTA` substance): a parquet directory written by
    * some other system joins the table as ONE external manifest entry —
    * zero data bytes copied at any directory size (gated: the table
    * root's directory set is unchanged and the source files' mtimes are
    * untouched), with an optional stats pass so imported data prunes
    * exactly like native segments. Delete scoping is append-like: the
    * import gets the commit's seq, so a later MOR delete reaches the
    * imported rows (proved here), while earlier deletes never do
    * (ImportDirSpec pins that direction). The 100 TB onboarding story:
    * converting a warehouse into the table costs manifests, not a
    * rewrite. */
  val importFiles: Reg = Reg.sql(
    "a59_import_files",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |imp AS (SELECT * FROM e WHERE event_id % 3 = 2),
      |pre AS (SELECT * FROM e WHERE event_id % 3 <= 1)
      |SELECT CAST((SELECT COUNT(*) FROM pre) AS BIGINT) AS pre_import_rows,
      |       CAST((SELECT COUNT(*) FROM imp) AS BIGINT) AS imported_rows,
      |       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS head_rows,
      |       CAST(0 AS BIGINT) AS files_copied,
      |       CAST((SELECT COUNT(*) FROM e WHERE user_id % 4 <> 1) AS BIGINT)
      |         AS postdelete_rows,
      |       CAST((SELECT COUNT(DISTINCT event_id) FROM e
      |             WHERE user_id % 4 = 1) AS BIGINT) AS deleted_keys"""
      .stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_importq")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      // the "foreign warehouse": a directory nobody copied
      val ext = s"$work/warehouse_drop"
      e.where(col("event_id") % 3 === 2).write.parquet(ext)
      val extFiles = new java.io.File(ext).listFiles()
        .map(f => f.getName -> f.lastModified()).toSet

      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0),
        statCols = Seq("event_id"))
      VersionedTable.append(s, root, e.where(col("event_id") % 3 === 1),
        statCols = Seq("event_id"))
      val preRows = VersionedTable.read(s, root).count()
      val rootDirs = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(_.getName).toSet

      VersionedTable.importDir(s, root, ext, statCols = Seq("event_id"))
      require(new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("seg_")).map(_.getName).toSet == rootDirs,
        "import copied data into the table root — must be by reference")
      require(new java.io.File(ext).listFiles()
        .map(f => f.getName -> f.lastModified()).toSet == extFiles,
        "import modified the source directory")
      val headRows = VersionedTable.read(s, root).count()
      val imported = headRows - preRows

      // a delete AFTER the import reaches imported rows like any data
      val (_, nDel) = VersionedTable.morDelete(s, root, Seq("event_id"),
        v => v.where(col("user_id") % 4 === 1))
      val postRows = VersionedTable.read(s, root).count()

      import s.implicits._
      Seq((preRows, imported, headRows, 0L, postRows, nDel))
        .toDF("pre_import_rows", "imported_rows", "head_rows",
          "files_copied", "postdelete_rows", "deleted_keys")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A60 — INVERTED TEXT INDEX as a derived VersionedTable, range-
    * sharded on TERM with the a58 truncated-string bounds as the shard
    * pruner: postings (term, doc_id) land in 8 term-range segments
    * (ranges from an ntile over the vocabulary — a vocab-sized sort,
    * index-build cost, never corpus-sized), so a term lookup opens
    * at most the owning posting segment plus one truncated-bound-
    * adjacent neighbor (gated via resolveSegmentsStr; exactly one on
    * this corpus) instead of scanning the posting corpus. This is the text sibling of the
    * bloom point-lookup gate (a44) and the PQ vector index (s27): the
    * manifest IS the index directory. Incremental story: new batches
    * append posting segments whose term bounds are wide, lookups open
    * base+deltas, and compaction re-ranges — the standard LSM trade
    * already measured for the cluster store. */
  val textIndex: Reg = Reg.sql(
    "a60_text_index",
    """WITH t AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS term
      |           FROM documents),
      |probes AS (SELECT MIN(term) AS term FROM t
      |           UNION ALL SELECT MAX(term) FROM t)
      |SELECT p.term, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(MIN(t.doc_id) AS BIGINT) AS min_doc,
      |       CAST(MAX(t.doc_id) AS BIGINT) AS max_doc
      |FROM probes p JOIN t ON t.term = p.term
      |GROUP BY p.term ORDER BY p.term""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    import org.apache.spark.sql.expressions.Window
    val work = graft.Scratch.dir("graft_tindexq")
    val root = s"$work/idx"
    try {
      val postings = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " ", -1))).as("term"))
        .localCheckpoint() // vocab ranging + 8 segment writes share it
      // range-shard the vocabulary: ntile(8) over term order — the
      // vocab-sized global sort is the index BUILD cost (vocabulary,
      // not corpus, sized), the standard B-tree/SSTable trade
      val ranges = postings.select("term").distinct()
        .withColumn("b", ntile(8).over(Window.orderBy("term")))
      val sharded = postings.join(ranges, "term").localCheckpoint()
      (1 to 8).foreach { b =>
        val slice = sharded.where(col("b") === b).select("term", "doc_id")
          .sortWithinPartitions("term")
        if (b == 1) VersionedTable.create(s, root, slice, statCols = Seq("term"))
        else VersionedTable.append(s, root, slice, statCols = Seq("term"))
      }
      // probes: lexicographic vocabulary extremes (engine-identical)
      val mm = postings.agg(min("term"), max("term")).head()
      // the pruning gate is conditional on the index being PRUNABLE: a
      // shard with non-ASCII bounds records no sstat (reads
      // conservatively, still correct), and two adjacent shards sharing
      // a 16-char term prefix legitimately both match (the incremented
      // truncated upper of shard k overlaps shard k+1's lower) — so the
      // hard claim is ≤ 2 statted shards opened, never a data-dependent
      // crash on an unlucky vocabulary
      val dataSegs = VersionedTable
        .segmentsOf(s, root, VersionedTable.currentVersion(s, root).get)
        .filterNot(sg => sg.isDelete || sg.isPosDelete)
      val allStatted = dataSegs.forall(_.sstats.contains("term"))
      val out = Seq(mm.getString(0), mm.getString(1)).sorted.map { term =>
        val opened = VersionedTable.resolveSegmentsStr(s, root, "term", term, term)
        require(opened.nonEmpty && opened.length <= dataSegs.length,
          s"index lookup for '$term' resolved outside the manifest")
        if (allStatted) require(opened.length <= 2,
          s"index lookup for '$term' opened ${opened.length} of " +
            s"${dataSegs.length} statted shards (expected ≤ 2: the owner " +
            "plus at most one truncated-bound-adjacent shard)")
        val r = VersionedTable.readPrunedStr(s, root, "term", term, term)
          .where(col("term") === term)
          .agg(count(lit(1)), min("doc_id"), max("doc_id")).head()
        (term, r.getLong(0), r.getLong(1), r.getLong(2))
      }
      import s.implicits._
      out.toDF("term", "n_docs", "min_doc", "max_doc").orderBy("term")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A61 — SNAPSHOT TAGS (Iceberg named references): an immutable
    * name→version pin created with the same create-exclusive primitive
    * as the commit CAS, honored by expiry — the tagged snapshot and its
    * whole segment closure survive an expire that drops every other
    * out-of-window version. This is the audit/repro workflow on a
    * 100 TB table: tag "gold" before a risky rewrite, expire routinely,
    * and the pinned snapshot stays bit-readable for the cost of its
    * segments alone. The query drives create → tag → replace → expire →
    * read-by-tag and emits the closed-form row counts; the
    * tagged-survives / untagged-expired outcomes are require-gated. */
  val snapshotTags: Reg = Reg.sql(
    "a61_snapshot_tags",
    """WITH e AS (SELECT event_id, user_id FROM events WHERE event_id < 60000),
      |v0 AS (SELECT * FROM e WHERE event_id % 3 = 0),
      |v1 AS (SELECT * FROM e),
      |v2 AS (SELECT * FROM e WHERE user_id % 2 = 0)
      |SELECT CAST((SELECT COUNT(*) FROM v1) AS BIGINT) AS tagged_rows,
      |       CAST((SELECT SUM(user_id) FROM v1) AS BIGINT) AS tagged_uid_sum,
      |       CAST((SELECT COUNT(*) FROM v2) AS BIGINT) AS head_rows,
      |       CAST(2 AS BIGINT) AS versions_dropped,
      |       CAST(1 AS BIGINT) AS tags_after""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_tagq")
    val root = s"$work/t"
    try {
      val e = Tables.events(s, dir).where(col("event_id") < 60000L)
        .select("event_id", "user_id")
        // one events scan serves every staged segment / mutation slice
        .localCheckpoint(false)
      VersionedTable.create(s, root, e.where(col("event_id") % 3 === 0)) // v0
      VersionedTable.append(s, root, e.where(col("event_id") % 3 =!= 0)) // v1
      VersionedTable.tag(s, root, "gold", 1L)
      VersionedTable.replace(s, root,
        VersionedTable.read(s, root).where(col("user_id") % 2 === 0)) // v2
      VersionedTable.append(s, root,
        e.where(col("user_id") % 2 === 0).limit(0)) // v3 (empty append)
      val (droppedN, _) = VersionedTable.expireSnapshots(s, root, keep = 1)
      require(droppedN == 2, s"expected v0+v2 dropped, got $droppedN")
      // the pinned snapshot survives with its whole closure...
      val tagged = VersionedTable.readTag(s, root, "gold")
        .agg(count(lit(1)), sum("user_id").cast("bigint")).head()
      // ...and the untagged out-of-window versions are really gone
      require(
        try { VersionedTable.read(s, root, Some(0L)).count(); false }
        catch { case _: Throwable => true },
        "untagged v0 still readable after expiry")
      val headRows = VersionedTable.read(s, root).count()
      import s.implicits._
      Seq((tagged.getLong(0), tagged.getLong(1), headRows, droppedN.toLong,
        VersionedTable.tags(s, root).size.toLong))
        .toDF("tagged_rows", "tagged_uid_sum", "head_rows",
          "versions_dropped", "tags_after")
    } finally deleteRecursively(new java.io.File(work))
  }

  /** A62 — the reference's PRODUCTION READ PATH (candidate selection,
    * `wifi_measurement_s3_table_schema.md:83-93` = a1) run the way it
    * runs at 100 TB: the measurement table lives as a month-partitioned
    * VersionedTable (the `years/months/days(ingestion_timestamp)`
    * layout — each month's value is its segment's exact manifest stat),
    * and the recency cutoff prunes at the MANIFEST before any file
    * opens (`resolveSegments` + `readPruned`, files-read gated: exactly
    * the on-or-after-cutoff months, ~30 of ~83 on this corpus). The
    * residual predicate still applies inside surviving months. The
    * oracle is a1's SQL verbatim — the pruned plan must return
    * bit-identical rows to the full-scan a1, proving the stats pruning
    * is pure I/O savings, never a semantic change. */
  val prunedCandidates: Reg = Reg.sql(
    "a62_pruned_candidates",
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |       CAST(l_shipdate AS DATE) AS ship_date, l_quantity
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) > DATE '1999-06-01'
      |  AND l_suppkey IN (1, 2, 3, 5, 8, 13, 21, 34)
      |  AND (l_returnflag <> 'A' OR l_returnflag IS NULL)
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |         ship_date, l_quantity""".stripMargin) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_prunedcand")
    val root = s"$work/meas"
    try {
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_returnflag"), to_date(col("l_shipdate")).as("ship_date"),
        col("l_quantity"),
        (year(to_date(col("l_shipdate"))) * 12 +
          month(to_date(col("l_shipdate"))) - 1).as("ym"))
        // one lineitem scan serves the layout write AND the expected-month
        // gate count
        .localCheckpoint(false)
      val (_, nSegs) = VersionedTable.createPartitioned(s, root, li, "ym")
      val cutoffYm = 1999 * 12 + 6 - 1 // the month containing 1999-06-01
      val expectMonths = li.where(col("ym") >= cutoffYm)
        .select("ym").distinct().count()
      val opened = VersionedTable.resolveSegments(
        s, root, "ym", cutoffYm.toDouble, Double.MaxValue)
      require(opened.length.toLong == expectMonths && opened.length < nSegs,
        s"manifest pruning failed: opened ${opened.length} of $nSegs " +
          s"month segments (expected $expectMonths)")
      val out = VersionedTable
        .readPruned(s, root, "ym", cutoffYm.toDouble, Double.MaxValue)
        .where(col("ship_date") > lit("1999-06-01").cast("date")
          && col("l_suppkey").isin(1, 2, 3, 5, 8, 13, 21, 34)
          && (col("l_returnflag") =!= "A" || col("l_returnflag").isNull))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_returnflag"), col("ship_date"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag",
          "ship_date", "l_quantity")
      // cutoff-sized result (the production query's own working set):
      // materialize so the scratch store can be deleted now
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(new java.io.File(work))
  }

  val all: Seq[Reg] = Seq(mergeLabelPurge, purgePartitioned, compactSmallFiles,
    versionedRestore, orphanVacuum, runtimePruneJoin, shallowClone,
    clusterMetrics, occConflict, timeTravelTs,
    versionedRename, partitionEvolution,
    schemaEvolution, bucketedAgg, snapshotDiff, schemaWidening, zorderLayout,
    writeAuditPublish, forgetUser, ivmJoin, ivmRetract, timeTravel,
    versionedMerge, versionedCompact, versionedForget, incrementalRead,
    morDelete, morUpsert, positionDeletes, stringStatsPruning, importFiles,
    textIndex, snapshotTags, changelogApply, pointSkipBloom,
    versionedSchemaEvolution, binpackCompact, changelogIvm, j18BucketedJoin,
    prunedCandidates)
}
