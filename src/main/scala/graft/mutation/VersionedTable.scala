package graft.mutation

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-structured versioned table — the transaction-log core of
  * Delta/Iceberg reproduced on plain parquet, upgrading the in-place
  * MergeOps emulation with the two properties a swap cannot give:
  * SNAPSHOT ISOLATION (a reader resolving version N sees exactly N's
  * files, regardless of concurrent commits) and TIME TRAVEL (any
  * unexpired version stays readable).
  *
  * Layout under one root:
  *  - `seg_<uuid>/` — IMMUTABLE parquet segments; never rewritten,
  *    never deleted except by [[expireSnapshots]];
  *  - `_log/v<N>.manifest` — version N's segment list, one relative
  *    segment name per line. The manifest RENAME is the commit point:
  *    content is staged to a hidden sibling and moved in with the
  *    filesystem's atomic rename, so a manifest either exists complete or
  *    not at all (readers can never resolve a torn version), and
  *    create-exclusive semantics make two racing writers of the same
  *    version fail cleanly rather than both "win".
  *
  * The reference targets Iceberg merge-on-read
  * (`documents/wifi_measurement_s3_table_schema.md:69-76`); no format jar
  * ships here, so this is the documented emulation of the format's
  * LOG-STRUCTURED substance: immutable data files + an append-only
  * metadata log + O(1) commits, with UPDATE/DELETE as copy-on-write
  * commits that reference replacement segments. Underscore/dot prefixes
  * keep every metadata artifact invisible to direct parquet reads. */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new Path(root, "_log")

  private def manifest(root: String, v: Long) =
    new Path(logDir(root), f"v$v%06d.manifest")

  /** Highest committed version, or None for an empty/nonexistent table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = logDir(root)
    if (!f.exists(dir)) return None
    val vs = f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def manifestLines(
      spark: SparkSession, root: String, v: Long): Seq[String] = {
    val f = fs(spark, root)
    val p = manifest(root, v)
    if (!f.exists(p))
      throw new java.io.FileNotFoundException(
        s"version $v of $root does not exist (expired or never committed)")
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(f.open(p), "UTF-8"))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def readManifest(
      spark: SparkSession, root: String, v: Long): Seq[String] =
    manifestLines(spark, root, v).filterNot(_.startsWith("#"))

  /** The streaming-sink idempotence fence of the CURRENT version (the
    * `#fence=<id>` manifest header — the same txnVersion idiom as
    * MergeOps.mergeByKey's `_fence`, here riding the commit itself).
    * None when the table is empty or the last commit was unfenced. */
  def currentFence(spark: SparkSession, root: String): Option[Long] =
    currentVersion(spark, root).flatMap { v =>
      manifestLines(spark, root, v)
        .find(_.startsWith("#fence="))
        .map(_.stripPrefix("#fence=").toLong)
    }

  /** Commit `segments` (relative names) as the next version; returns it.
    * The staged-write + atomic-rename makes the manifest the commit point;
    * rename-over-existing fails, so racing writers cannot both commit.
    * A `fence` id is recorded in the manifest header — atomically with
    * the segment list, since it IS the committed file. */
  private def commit(
      spark: SparkSession, root: String, segments: Seq[String],
      fence: Option[Long] = None): Long = {
    val f = fs(spark, root)
    val dir = logDir(root)
    if (!f.exists(dir) && !f.mkdirs(dir))
      throw new java.io.IOException(s"cannot create $dir")
    val v = currentVersion(spark, root).fold(0L)(_ + 1)
    val tmp = new Path(dir, s".v$v.manifest.tmp")
    val out = f.create(tmp, true)
    val header = fence.map(id => s"#fence=$id\n").getOrElse("")
    try out.write((header + segments.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifest(root, v)
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"commit of version $v lost the race (manifest exists)")
    }
    v
  }

  /** Write `df` as a fresh immutable segment; returns its relative name. */
  private def writeSegment(
      spark: SparkSession, root: String, df: DataFrame): String = {
    val name = "seg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    df.write.parquet(new Path(root, name).toString)
    name
  }

  /** Create the table at version 0 with `df`'s rows. */
  def create(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(currentVersion(spark, root).isEmpty, s"$root already versioned")
    commit(spark, root, Seq(writeSegment(spark, root, df)))
  }

  /** APPEND commit: previous segments plus one new one — O(new data)
    * writes, O(1) metadata, exactly the log-structured insert path. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val prev = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    commit(spark, root,
      readManifest(spark, root, prev) :+ writeSegment(spark, root, df))
  }

  /** Replay-safe streaming-sink append: creates the table on the first
    * batch, appends on later ones, and SKIPS whole when the current
    * fence says `batchId` already committed (returns None) — at-least-
    * once `foreachBatch` delivery lands each micro-batch exactly once,
    * because the fence is a header OF the committed manifest, not a
    * separate artifact that could tear away from it. Monotone batch ids
    * (Structured Streaming's contract) are assumed. */
  def appendFenced(
      spark: SparkSession, root: String, df: DataFrame,
      batchId: Long): Option[Long] = {
    if (currentFence(spark, root).exists(_ >= batchId)) return None
    val prevSegs = currentVersion(spark, root)
      .map(readManifest(spark, root, _)).getOrElse(Seq.empty)
    Some(commit(spark, root,
      prevSegs :+ writeSegment(spark, root, df), fence = Some(batchId)))
  }

  /** REPLACE commit (the copy-on-write UPDATE/DELETE shape): the new
    * version references ONLY the replacement segment; prior versions keep
    * referencing the old segments untouched — that is what makes them
    * still readable. At 100 TB replace only the affected partition's
    * segments (compose with the MergeOps partition discipline). */
  def replace(spark: SparkSession, root: String, df: DataFrame): Long = {
    currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    commit(spark, root, Seq(writeSegment(spark, root, df)))
  }

  /** Snapshot read: resolve `version` (default: latest) to its manifest's
    * segment list — immutable files, so the read is stable no matter what
    * commits land afterwards. */
  def read(
      spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"$root has no versions"))
    val segs = readManifest(spark, root, v)
      .map(n => new Path(root, n).toString)
    spark.read.parquet(segs: _*)
  }

  /** Expire snapshots older than the newest `keep` versions: drop their
    * manifests, then delete any segment no retained manifest references —
    * the VACUUM/expire-snapshots maintenance op. Returns
    * (versions dropped, segments deleted). */
  def expireSnapshots(
      spark: SparkSession, root: String, keep: Int): (Int, Int) = {
    require(keep >= 1, "must keep at least the current version")
    val f = fs(spark, root)
    val dir = logDir(root)
    if (!f.exists(dir)) return (0, 0)
    val vs = f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.sorted
    val dropped = vs.dropRight(keep)
    val kept = vs.takeRight(keep)
    val liveSegs = kept.flatMap(readManifest(spark, root, _)).toSet
    dropped.foreach(v => f.delete(manifest(root, v), false))
    val deadSegs = f.listStatus(new Path(root)).map(_.getPath)
      .filter(p => p.getName.startsWith("seg_") && !liveSegs(p.getName))
    deadSegs.foreach(f.delete(_, true))
    (dropped.length, deadSegs.length)
  }
}
