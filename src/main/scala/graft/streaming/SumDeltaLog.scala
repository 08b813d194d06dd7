package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mutation.MergeOps

/** Persisted keyed COUNT state for streaming exact order statistics
  * (`s21_stream_median` / `s22_stream_quantiles`): a (key..., value) →
  * count DELTA LOG under the SUM monoid, with per-batch write volume
  * proportional to the BATCH and read amplification bounded by a
  * crash-safe compactor.
  *
  * Layout: `root/seg/d<batchId>` delta segments (one per micro-batch,
  * deterministic name → a replayed batch OVERWRITES, never re-appends;
  * after compaction, the base's `c<batchId>` name doubles as a watermark
  * making replays of already-folded batches a NO-OP — see [[append]])
  * plus at most one `root/seg/c<batchId>` compacted base. The read side
  * collapses all segments with one `groupBy(keys).sum(cnt)` — equal to
  * the eagerly-merged store because SUM is a commutative monoid over
  * these per-batch partial counts.
  *
  * COMPACTION is where the sum monoid differs from the min-monoid bucket
  * log ([[IncrementalNearDup]]): min is duplication-absorbing, so that
  * store tolerates the write-compacted-then-delete-deltas shortcut (a
  * crash in the window leaves both, and min(x, x) = x). SUM is not —
  * the same window would DOUBLE-COUNT every batch the compacted base
  * already includes. So the compactor here swaps the ENTIRE `seg`
  * directory through the [[MergeOps.swapDir]] two-rename protocol:
  * readers see either the old segment set or the new single base, never
  * a mix; a crash between the renames parks the store at the hidden
  * `.seg.tmp_old` sibling, which [[MergeOps.recoverIfNeeded]] (run
  * before every read and every compaction) restores. `SumDeltaLogSpec`
  * drives the crash states explicitly.
  *
  * 100 TB shape: per batch, ONLY that batch's per-(key, value) counts
  * are written (O(batch)); compaction is O(store) once per `maxDeltas`
  * batches — amortized O(store/maxDeltas), the standard LSM cost model —
  * and the store itself scales with the per-key VALUE DOMAIN (a count
  * map), never with observation count. At warehouse scale the compactor
  * runs out-of-band on the same protocol. */
object SumDeltaLog {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def segRoot(root: String) = s"${root.stripSuffix("/")}/seg"

  /** Current segment directories, oldest first. Recovery runs FIRST: a
    * crashed compaction's store lives only at `.seg.tmp_old` and a bare
    * listing would silently read an empty (or half-deleted) store. */
  def segments(spark: SparkSession, root: String): Seq[String] = {
    val dir = segRoot(root)
    MergeOps.recoverIfNeeded(spark, dir)
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.toString).toSeq.sorted
  }

  /** Highest batch id already folded into a compacted base (the id in the
    * `c<id>` segment name), or -1 when no compaction has run. Every batch
    * at or below this watermark is ALREADY COUNTED in the base. */
  def compactionWatermark(spark: SparkSession, root: String): Long =
    segments(spark, root)
      .map(p => new Path(p).getName)
      .collect { case n if n.startsWith("c") => n.stripPrefix("c").toLong }
      .foldLeft(-1L)(_ max _)

  /** Fold one micro-batch's counts in: O(batch) bytes, deterministic
    * segment name (replays overwrite). `batch` must already be the
    * per-(keys..., value) partial counts of THIS batch. Segments land
    * sorted on the group columns so parquet row-group stats stay tight.
    *
    * Replay safety has TWO fences. Pre-compaction, the deterministic
    * `d<id>` name makes a replay overwrite, never re-append. But once
    * `maybeCompact` folds d<id> into a base c<id'>, id ≤ id', the delta
    * file is GONE — a crash between compaction and the streaming
    * checkpoint commit would replay the batch and recreate d<id>
    * ALONGSIDE the base that already contains it, double-counting under
    * the sum monoid. So append is a no-op for any id at or below the
    * compaction watermark (the id is right there in the base's name). */
  def append(batch: DataFrame, root: String, id: Long, sortCols: Seq[String]): Unit = {
    if (id <= compactionWatermark(batch.sparkSession, root)) return
    batch.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(s"${segRoot(root)}/d$id")
  }

  /** Collapsed (keys..., cnt) view — equal to the eagerly-merged store by
    * the sum-monoid law. None when no state exists yet. */
  def collapsed(spark: SparkSession, root: String,
      keyCols: Seq[String], cntCol: String): Option[DataFrame] = {
    val dirs = segments(spark, root)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*)
      .groupBy(keyCols.map(col): _*).agg(sum(cntCol).as(cntCol)))
  }

  /** Collapse the log into one base segment when it exceeds `maxDeltas`
    * segments, atomically (the whole-directory swap documented above).
    * Returns true if a compaction ran. */
  def maybeCompact(spark: SparkSession, root: String, id: Long,
      keyCols: Seq[String], cntCol: String, maxDeltas: Int = 16): Boolean = {
    val dirs = segments(spark, root)
    if (dirs.length <= maxDeltas) false
    else {
      val merged = spark.read.parquet(dirs: _*)
        .groupBy(keyCols.map(col): _*).agg(sum(cntCol).as(cntCol))
      MergeOps.swapDir(spark, segRoot(root)) { tmp =>
        merged.sortWithinPartitions(keyCols.map(col): _*)
          .write.parquet(s"$tmp/c$id")
      }
      true
    }
  }

  /** Total bytes currently under the store — spec hook for the per-batch
    * write-volume gate. */
  def bytesUnder(spark: SparkSession, root: String): Long = {
    val p = new Path(segRoot(root))
    val f = fs(spark, root)
    if (!f.exists(p)) 0L else f.getContentSummary(p).getLength
  }
}
