package graft.mutation

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max => fmax, min => fmin}

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
  *    segment name per line, each optionally followed by TAB-separated
  *    per-segment column stats (`col=min:max`, doubles widened one ulp
  *    outward so they are always conservative). The manifest RENAME is
  *    the commit point: content is staged to a hidden sibling and moved
  *    in with `FileContext.rename(..., Rename.NONE)` — atomic AND
  *    create-exclusive, so a manifest either exists complete or not at
  *    all (readers can never resolve a torn version) and two racing
  *    writers of the same version cannot both "win" even on local
  *    filesystems whose plain `rename` overwrites (POSIX renameTo).
  *
  * DATA SKIPPING: commits may declare `statCols`; min/max of each is
  * computed from the freshly-written segment and recorded on its
  * manifest line. [[resolveSegments]] / [[readPruned]] then skip whole
  * segments whose recorded range is disjoint from a query interval —
  * the Iceberg manifest-stats substance the reference's query contract
  * leans on (`documents/wifi_measurement_s3_table_schema.md:70,196-207`:
  * every production query prunes on time/partition before touching
  * data). Segments without a stat for the probed column are kept
  * (conservative). [[mergeWhere]] composes the same stats into
  * copy-on-write MERGE: only segments intersecting the merge interval
  * are rewritten; disjoint segments carry forward BY REFERENCE with
  * their stats — at 100 TB a one-day correction rewrites one day's
  * files and one manifest, never the table.
  *
  * The streaming-sink idempotence fence (`#fence=<id>` header) rides
  * the committed manifest itself and CARRIES FORWARD through unfenced
  * commits (effective fence = max of previous and provided), so an
  * interleaved compaction/merge can never erase replay protection.
  *
  * The reference targets Iceberg merge-on-read
  * (`documents/wifi_measurement_s3_table_schema.md:69-76`); no format jar
  * ships here, so this is the documented emulation of the format's
  * LOG-STRUCTURED substance: immutable data files + an append-only
  * metadata log + O(1) commits, with UPDATE/DELETE as copy-on-write
  * commits that reference replacement segments. Underscore/dot prefixes
  * keep every metadata artifact invisible to direct parquet reads. */
object VersionedTable {

  /** One manifest entry: a segment name plus its recorded column stats
    * (numeric min/max, conservative). */
  final case class Segment(name: String, stats: Map[String, (Double, Double)]) {
    /** Could this segment contain a row with `c` in [lo, hi]? Missing
      * stats ⇒ true (never prune on absent information). */
    def mayIntersect(c: String, lo: Double, hi: Double): Boolean =
      stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
  }

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

  private def parseSegment(line: String): Segment = {
    val parts = line.split('\t')
    val stats = parts.tail.iterator.map { kv =>
      val Array(c, range) = kv.split('=')
      val Array(mn, mx) = range.split(':')
      c -> (mn.toDouble, mx.toDouble)
    }.toMap
    Segment(parts.head, stats)
  }

  private def renderSegment(s: Segment): String =
    (s.name +: s.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s"$c=$mn:$mx"
    }).mkString("\t")

  /** Version `v`'s manifest as parsed segment entries. */
  def segmentsOf(spark: SparkSession, root: String, v: Long): Seq[Segment] =
    manifestLines(spark, root, v).filterNot(_.startsWith("#")).map(parseSegment)

  /** The streaming-sink idempotence fence of the CURRENT version (the
    * `#fence=<id>` manifest header — the same txnVersion idiom as
    * MergeOps.mergeByKey's `_fence`, here riding the commit itself).
    * Fences carry forward through unfenced commits, so this is the max
    * fenced batch id ever committed. None when never fenced. */
  def currentFence(spark: SparkSession, root: String): Option[Long] =
    currentVersion(spark, root).flatMap(fenceOf(spark, root, _))

  private def fenceOf(spark: SparkSession, root: String, v: Long): Option[Long] =
    manifestLines(spark, root, v)
      .find(_.startsWith("#fence="))
      .map(_.stripPrefix("#fence=").toLong)

  /** Commit `segments` as the next version; returns it. The staged-write
    * + create-exclusive atomic rename makes the manifest the commit
    * point. The effective fence is max(previous fence, provided fence):
    * an unfenced commit after a fenced one PRESERVES replay protection
    * rather than silently erasing it. */
  private def commit(
      spark: SparkSession, root: String, segments: Seq[Segment],
      fence: Option[Long] = None): Long = {
    val f = fs(spark, root)
    val dir = logDir(root)
    if (!f.exists(dir) && !f.mkdirs(dir))
      throw new java.io.IOException(s"cannot create $dir")
    val prev = currentVersion(spark, root)
    val carried = prev.flatMap(fenceOf(spark, root, _))
    val eff = (carried ++ fence).reduceOption(_ max _)
    val v = prev.fold(0L)(_ + 1)
    val header = eff.map(id => s"#fence=$id\n").getOrElse("")
    publishManifest(spark, root, v,
      header + segments.map(renderSegment).mkString("\n") + "\n")
    v
  }

  /** The commit point itself: stage the manifest content to a hidden
    * sibling, then move it in with `Rename.NONE` — atomic AND
    * create-exclusive, failing when the destination exists, even on
    * LocalFileSystem whose plain `rename` (POSIX renameTo) silently
    * overwrites. Two writers racing for the same version: exactly one
    * wins; the loser's staging file is cleaned and the winner's manifest
    * is untouched. */
  private[mutation] def publishManifest(
      spark: SparkSession, root: String, v: Long, content: String): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(logDir(root), s".v$v.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val target = manifest(root, v)
    try {
      FileContext.getFileContext(target.toUri,
        spark.sparkContext.hadoopConfiguration)
        .rename(tmp, target, Options.Rename.NONE)
    } catch {
      case e: Exception =>
        f.delete(tmp, false)
        throw new java.io.IOException(
          s"commit of version $v lost the race (manifest exists)", e)
    }
  }

  /** Write `df` as a fresh immutable segment and record min/max of each
    * `statCols` column from the written files (one segment-sized scan at
    * commit time — the Iceberg write-side stats cost). Bounds are
    * widened one ulp outward so double rounding of wide integer types
    * can never prune a segment that holds a qualifying row. */
  private def writeSegment(
      spark: SparkSession, root: String, df: DataFrame,
      statCols: Seq[String]): Segment = {
    val name = "seg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val path = new Path(root, name).toString
    df.write.parquet(path)
    val stats =
      if (statCols.isEmpty) Map.empty[String, (Double, Double)]
      else {
        val written = spark.read.parquet(path)
        val aggs = statCols.flatMap { c =>
          Seq(fmin(col(c).cast("double")).as(s"__mn_$c"),
            fmax(col(c).cast("double")).as(s"__mx_$c"))
        }
        val r = written.agg(aggs.head, aggs.tail: _*).head()
        statCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) None
          else Some(c -> (Math.nextDown(r.getDouble(2 * i)),
            Math.nextUp(r.getDouble(2 * i + 1))))
        }.toMap
      }
    Segment(name, stats)
  }

  /** Create the table at version 0 with `df`'s rows. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statCols: Seq[String] = Nil): Long = {
    require(currentVersion(spark, root).isEmpty, s"$root already versioned")
    commit(spark, root, Seq(writeSegment(spark, root, df, statCols)))
  }

  /** One-pass PARTITIONED create: write `df` partitioned by numeric
    * `partCol` in a SINGLE write job, then register each partition
    * directory as its own segment whose `partCol` stat IS the partition
    * value — the Iceberg partition-field shape: per-segment stats with NO
    * stats scan (the value is in the directory name), exact pruning on
    * `partCol`, and one job instead of one-write-plus-one-stats-scan per
    * partition. The data files keep the column (it is duplicated into a
    * synthetic `__p` for the directory layout, which partitionBy then
    * strips), so segment reads return the full schema. Returns
    * (version 0, segments created). */
  def createPartitioned(
      spark: SparkSession, root: String, df: DataFrame,
      partCol: String): (Long, Int) = {
    require(currentVersion(spark, root).isEmpty, s"$root already versioned")
    val f = fs(spark, root)
    val staging = new Path(root,
      ".stage_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    df.withColumn("__p", col(partCol))
      .write.partitionBy("__p").parquet(staging.toString)
    val segs = f.listStatus(staging)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__p="))
      .sortBy(_.getPath.getName)
      .map { st =>
        val v = st.getPath.getName.stripPrefix("__p=").toDouble
        val name = "seg_" + java.util.UUID.randomUUID().toString.replace("-", "")
        if (!f.rename(st.getPath, new Path(root, name)))
          throw new java.io.IOException(s"cannot place segment for ${st.getPath}")
        Segment(name, Map(partCol -> (v, v)))
      }.toSeq
    require(segs.nonEmpty, s"createPartitioned: $partCol produced no partitions")
    f.delete(staging, true)
    (commit(spark, root, segs), segs.length)
  }

  /** APPEND commit: previous segments plus one new one — O(new data)
    * writes, O(1) metadata, exactly the log-structured insert path. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statCols: Seq[String] = Nil): Long = {
    val prev = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    commit(spark, root,
      segmentsOf(spark, root, prev) :+ writeSegment(spark, root, df, statCols))
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
      batchId: Long, statCols: Seq[String] = Nil): Option[Long] = {
    if (currentFence(spark, root).exists(_ >= batchId)) return None
    val prevSegs = currentVersion(spark, root)
      .map(segmentsOf(spark, root, _)).getOrElse(Seq.empty)
    Some(commit(spark, root,
      prevSegs :+ writeSegment(spark, root, df, statCols),
      fence = Some(batchId)))
  }

  /** REPLACE commit (the copy-on-write UPDATE/DELETE shape): the new
    * version references ONLY the replacement segment; prior versions keep
    * referencing the old segments untouched — that is what makes them
    * still readable. At 100 TB prefer [[mergeWhere]], which replaces only
    * the affected interval's segments. */
  def replace(spark: SparkSession, root: String, df: DataFrame,
      statCols: Seq[String] = Nil): Long = {
    currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    commit(spark, root, Seq(writeSegment(spark, root, df, statCols)))
  }

  /** The segment paths a pruned read of `version` actually touches: every
    * segment whose recorded `c` range intersects [lo, hi], plus any with
    * no recorded stat for `c`. This is the files-read gate — specs and
    * queries assert on its length. */
  def resolveSegments(
      spark: SparkSession, root: String, c: String, lo: Double, hi: Double,
      version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"$root has no versions"))
    segmentsOf(spark, root, v)
      .filter(_.mayIntersect(c, lo, hi))
      .map(s => new Path(root, s.name).toString)
  }

  /** Snapshot read: resolve `version` (default: latest) to its manifest's
    * segment list — immutable files, so the read is stable no matter what
    * commits land afterwards. */
  def read(
      spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"$root has no versions"))
    val segs = segmentsOf(spark, root, v)
      .map(s => new Path(root, s.name).toString)
    spark.read.parquet(segs: _*)
  }

  /** Stats-pruned snapshot read of rows with `c` in [lo, hi]: whole
    * segments disjoint from the interval are never opened (manifest-level
    * data skipping); the residual predicate still applies because a
    * surviving segment may carry out-of-range rows. */
  def readPruned(
      spark: SparkSession, root: String, c: String, lo: Double, hi: Double,
      version: Option[Long] = None): DataFrame = {
    val segs = resolveSegments(spark, root, c, lo, hi, version)
    if (segs.isEmpty) read(spark, root, version).where(lit(false))
    else spark.read.parquet(segs: _*)
      .where(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
  }

  /** Copy-on-write MERGE scoped by manifest stats: segments whose `c`
    * range intersects [lo, hi] are read, passed through `transform`
    * (label UPDATE, purge DELETE, upsert — any row-set rewrite), and
    * rewritten as ONE new segment; every disjoint segment carries forward
    * BY REFERENCE with its stats. The prior version stays readable — the
    * Iceberg v2 audit property the in-place MergeOps swap cannot give.
    * Returns (new version, segments rewritten, segments carried). */
  def mergeWhere(
      spark: SparkSession, root: String, c: String, lo: Double, hi: Double,
      transform: DataFrame => DataFrame,
      statCols: Seq[String] = Nil): (Long, Int, Int) = {
    val v = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    val all = segmentsOf(spark, root, v)
    val (touched, carried) = all.partition(_.mayIntersect(c, lo, hi))
    if (touched.isEmpty) return (v, 0, carried.length)
    val touchedDf = spark.read.parquet(
      touched.map(s => new Path(root, s.name).toString): _*)
    val rewritten = writeSegment(spark, root, transform(touchedDf), statCols)
    val nv = commit(spark, root, carried :+ rewritten)
    (nv, touched.length, carried.length)
  }

  /** INCREMENTAL READ (Iceberg's incremental scan / changelog-consumption
    * substance): the rows ADDED between two snapshots, resolved entirely
    * from manifest set-difference — segments referenced by `toV` but not
    * by `fromV`. For append-only tables this is exactly the appended
    * batches; the downstream-ETL pattern "process what's new since
    * checkpoint version N" costs the NEW segments only, never a diff scan
    * of the table. COW commits (replace/merge/compact) rewrite segments,
    * so their output segments appear as "added" — callers consuming a
    * changelog across rewrites should checkpoint around maintenance
    * commits (the Iceberg restriction, documented here rather than
    * hidden). Returns None when no segments were added. */
  def incrementalRead(
      spark: SparkSession, root: String, fromV: Long,
      toV: Long): Option[DataFrame] = {
    val added = addedSegments(spark, root, fromV, toV)
    if (added.isEmpty) None
    else Some(spark.read.parquet(
      added.map(n => new Path(root, n).toString): _*))
  }

  /** Segment names referenced by `toV` but not `fromV` — the files an
    * incremental read opens; exposed for files-read gates. */
  def addedSegments(
      spark: SparkSession, root: String, fromV: Long, toV: Long): Seq[String] = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    val old = segmentsOf(spark, root, fromV).map(_.name).toSet
    segmentsOf(spark, root, toV).map(_.name).filterNot(old)
  }

  /** Data bytes of each live segment at head — the sizing input callers
    * use to pick [[compactSmall]]'s threshold corpus-relatively. */
  def segmentBytes(spark: SparkSession, root: String): Seq[(String, Long)] = {
    val v = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no versions"))
    val f = fs(spark, root)
    segmentsOf(spark, root, v).map(s =>
      s.name -> f.getContentSummary(new Path(root, s.name)).getLength)
  }

  /** COMPACTION as a COMMIT (Iceberg's rewrite_data_files): live segments
    * whose data size is at or below `smallBytes` are read once and
    * rewritten as ONE segment; larger segments carry forward BY REFERENCE.
    * The merged segment's stats come from the carried manifests' stats
    * (interval union per column — no rescan; a column missing a stat on
    * ANY merged segment stays statless, the conservative join). Content is
    * unchanged at head, every prior version stays readable, and the old
    * small segments become vacuum candidates only when their snapshots
    * expire — compaction never deletes. Streaming appends are the natural
    * producer of the small-segment tail this folds (one segment per
    * micro-batch); at 100 TB this runs out-of-band per partition.
    * Returns (new version, segments merged, segments carried); no commit
    * happens when fewer than 2 segments qualify. */
  def compactSmall(
      spark: SparkSession, root: String,
      smallBytes: Long): (Long, Int, Int) = {
    val v = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"$root has no version 0"))
    val f = fs(spark, root)
    val all = segmentsOf(spark, root, v)
    val (small, big) = all.partition { s =>
      f.getContentSummary(new Path(root, s.name)).getLength <= smallBytes
    }
    if (small.length < 2) return (v, 0, all.length)
    val merged = spark.read.parquet(
      small.map(s => new Path(root, s.name).toString): _*)
    val name = "seg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    merged.coalesce(1).write.parquet(new Path(root, name).toString)
    // stats union straight from the manifest — the merged interval per
    // column, defined only when EVERY merged segment carried that stat
    val statKeys = small.map(_.stats.keySet).reduce(_ intersect _)
    val stats = statKeys.map { c =>
      val (mns, mxs) = small.map(_.stats(c)).unzip
      c -> (mns.min, mxs.max)
    }.toMap
    val nv = commit(spark, root, big :+ Segment(name, stats))
    (nv, small.length, big.length)
  }

  /** Expire snapshots older than the newest `keep` versions: drop their
    * manifests, then delete segments that are BOTH unreferenced by every
    * retained manifest AND older than `segmentRetainMs` — the Iceberg
    * expire-snapshots age discipline, so a vacuum racing a concurrent
    * writer never deletes its staged-but-uncommitted segment (writeSegment
    * runs before its commit). `segmentRetainMs = 0` deletes immediately
    * and is safe only under single-writer maintenance (the test default).
    * Returns (versions dropped, segments deleted). */
  def expireSnapshots(
      spark: SparkSession, root: String, keep: Int,
      segmentRetainMs: Long = 0L): (Int, Int) = {
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
    val liveSegs = kept.flatMap(segmentsOf(spark, root, _).map(_.name)).toSet
    dropped.foreach(v => f.delete(manifest(root, v), false))
    val cutoff = System.currentTimeMillis() - segmentRetainMs
    val deadSegs = f.listStatus(new Path(root))
      .filter(st => st.getPath.getName.startsWith("seg_") &&
        !liveSegs(st.getPath.getName) &&
        st.getModificationTime <= cutoff)
      .map(_.getPath)
    deadSegs.foreach(f.delete(_, true))
    (dropped.length, deadSegs.length)
  }
}
