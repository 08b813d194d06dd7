package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The log-structured table's contract: immutable snapshots, atomic
  * manifest commits, and vacuum that deletes exactly the unreferenced
  * segments. */
class VersionedTableSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_vtab_spec") + "/t"

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def idsAt(root: String, v: Long): Set[Long] =
    VersionedTable.read(spark, root, Some(v))
      .collect().map(_.getLong(0)).toSet

  test("create/append/replace produce versions 0..2; every snapshot stays exact") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3)) shouldBe 0L
    VersionedTable.append(spark, root, df(4, 5)) shouldBe 1L
    VersionedTable.replace(spark, root,
      VersionedTable.read(spark, root).where(F.col("id") =!= 2)) shouldBe 2L
    idsAt(root, 0) shouldBe Set(1L, 2L, 3L)
    idsAt(root, 1) shouldBe Set(1L, 2L, 3L, 4L, 5L)
    idsAt(root, 2) shouldBe Set(1L, 3L, 4L, 5L)
    VersionedTable.currentVersion(spark, root) shouldBe Some(2L)
    // default read = latest
    VersionedTable.read(spark, root).count() shouldBe 4L
  }

  test("a torn (staged-but-unrenamed) manifest never resolves as a version") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    val log = new java.io.File(root, "_log")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(log.toString, ".v1.manifest.tmp"), "junk\n")
    // the commit point is the rename: a leftover staging file is invisible
    VersionedTable.currentVersion(spark, root) shouldBe Some(0L)
    VersionedTable.read(spark, root).count() shouldBe 1L
    // and the next commit simply claims v1, replacing nothing
    VersionedTable.append(spark, root, df(2)) shouldBe 1L
    idsAt(root, 1) shouldBe Set(1L, 2L)
  }

  test("reading a never-committed version fails loudly") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    intercept[java.io.FileNotFoundException] {
      VersionedTable.read(spark, root, Some(7L)).count()
    }
    ()
  }

  test("expireSnapshots drops old manifests and exactly the dead segments") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))        // seg A
    VersionedTable.append(spark, root, df(3))           // segs A,B
    VersionedTable.replace(spark, root, df(9))          // seg C only
    val (dropped, deleted) = VersionedTable.expireSnapshots(spark, root, 1)
    dropped shouldBe 2
    deleted shouldBe 2 // A and B die; C survives
    idsAt(root, 2) shouldBe Set(9L)
    intercept[java.io.FileNotFoundException] {
      VersionedTable.read(spark, root, Some(0L)).count()
    }
    // keep >= existing versions is a no-op
    VersionedTable.expireSnapshots(spark, root, 5) shouldBe ((0, 0))
  }

  test("appendFenced: replays of a committed batch are skipped whole") {
    val root = freshRoot()
    VersionedTable.appendFenced(spark, root, df(1, 2), 0L) shouldBe Some(0L)
    VersionedTable.appendFenced(spark, root, df(3), 1L) shouldBe Some(1L)
    // at-least-once replay of batch 1: no new version, no new rows
    VersionedTable.appendFenced(spark, root, df(3), 1L) shouldBe None
    VersionedTable.currentVersion(spark, root) shouldBe Some(1L)
    VersionedTable.read(spark, root).count() shouldBe 3L
    VersionedTable.currentFence(spark, root) shouldBe Some(1L)
    // the fence header never leaks into the segment list
    idsAt(root, 1) shouldBe Set(1L, 2L, 3L)
    // an unfenced commit afterwards CARRIES the fence forward — an
    // interleaved compaction/merge must not erase replay protection
    VersionedTable.append(spark, root, df(4))
    VersionedTable.currentFence(spark, root) shouldBe Some(1L)
    // ...so a replay of batch 1 after the unfenced commit is still skipped
    VersionedTable.appendFenced(spark, root, df(3), 1L) shouldBe None
    VersionedTable.read(spark, root).count() shouldBe 4L
  }

  test("stats pruning: reads open only segments intersecting the interval") {
    val root = freshRoot()
    import spark.implicits._
    def seg(lo: Long, hi: Long) = (lo to hi).toDF("id")
    VersionedTable.create(spark, root, seg(0, 9), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(10, 19), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(20, 29), statCols = Seq("id"))
    // the files-read gate: a probe inside one segment's range resolves ONE
    VersionedTable.resolveSegments(spark, root, "id", 12, 15)
      .length shouldBe 1
    VersionedTable.resolveSegments(spark, root, "id", 8, 21)
      .length shouldBe 3
    VersionedTable.resolveSegments(spark, root, "id", 100, 200)
      .length shouldBe 0
    // pruned read ≡ full read + predicate
    VersionedTable.readPruned(spark, root, "id", 12, 15)
      .collect().map(_.getLong(0)).toSet shouldBe Set(12L, 13L, 14L, 15L)
    VersionedTable.readPruned(spark, root, "id", 100, 200).count() shouldBe 0L
    // a segment committed WITHOUT stats is conservatively kept
    VersionedTable.append(spark, root, seg(50, 59))
    VersionedTable.resolveSegments(spark, root, "id", 12, 15)
      .length shouldBe 2
    VersionedTable.readPruned(spark, root, "id", 12, 15).count() shouldBe 4L
  }

  test("mergeWhere rewrites only intersecting segments; prior snapshot intact") {
    val root = freshRoot()
    import spark.implicits._
    def seg(lo: Long, hi: Long) = (lo to hi).toDF("id")
    VersionedTable.create(spark, root, seg(0, 9), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(10, 19), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(20, 29), statCols = Seq("id"))
    // COW DELETE of ids 10..14: one segment rewritten, two carried
    val (nv, rewritten, carried) = VersionedTable.mergeWhere(
      spark, root, "id", 10, 19,
      _.where(F.col("id") >= 15), statCols = Seq("id"))
    nv shouldBe 3L
    rewritten shouldBe 1
    carried shouldBe 2
    idsAt(root, 3) shouldBe ((0L to 9L) ++ (15L to 29L)).toSet
    // the pre-merge snapshot is STILL readable — the audit property
    idsAt(root, 2) shouldBe (0L to 29L).toSet
    // carried segments kept their stats: pruning still works at head
    VersionedTable.resolveSegments(spark, root, "id", 0, 5).length shouldBe 1
    // disjoint merge interval: no-op commit-wise
    val (nv2, rw2, _) = VersionedTable.mergeWhere(
      spark, root, "id", 500, 600, identity(_))
    nv2 shouldBe 3L
    rw2 shouldBe 0
  }

  test("vacuum age-gate: young unreferenced segments survive a retention window") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    VersionedTable.replace(spark, root, df(9)) // segment A now unreferenced @head
    // with a 1h retention window the just-written segment A must survive
    // (it could be a concurrent writer's staged-but-uncommitted segment)
    val (dropped, deleted) =
      VersionedTable.expireSnapshots(spark, root, 1, segmentRetainMs = 3600000L)
    dropped shouldBe 1
    deleted shouldBe 0
    new java.io.File(root).listFiles()
      .count(_.getName.startsWith("seg_")) shouldBe 2
    // retention 0 (single-writer maintenance) collects it
    VersionedTable.expireSnapshots(spark, root, 1)._2 shouldBe 1
  }

  test("createPartitioned: one write, per-partition segments with exact stats") {
    val root = freshRoot()
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, i % 4)).toDF("id", "day")
    val (v0, n) = VersionedTable.createPartitioned(spark, root, df, "day")
    v0 shouldBe 0L
    n shouldBe 4
    // full schema survives (partition column duplicated, not stripped)
    VersionedTable.read(spark, root).columns.toSet shouldBe Set("id", "day")
    VersionedTable.read(spark, root).count() shouldBe 40L
    // the partition value IS the stat: exact pruning, one segment per value
    VersionedTable.resolveSegments(spark, root, "day", 2, 2).length shouldBe 1
    VersionedTable.readPruned(spark, root, "day", 2, 2)
      .collect().map(_.getLong(0)).toSet shouldBe
      (0L until 40L).filter(_ % 4 == 2).toSet
    // no staging residue
    new java.io.File(root).listFiles()
      .count(_.getName.startsWith(".stage_")) shouldBe 0
  }

  test("compactSmall folds only small segments, unions their stats, keeps history") {
    val root = freshRoot()
    import spark.implicits._
    def seg(lo: Long, hi: Long) = (lo to hi).toDF("id")
    // three small stat-carrying segments + one big statless one
    VersionedTable.create(spark, root, seg(0, 4), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(5, 9), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(10, 14), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(100, 5099), statCols = Seq("id"))
    // size through the same Hadoop lens compactSmall uses (the local
    // java.io view also counts .crc shadows and skews the threshold)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bigBytes = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("seg_"))
      .map(d => hfs.getContentSummary(
        new org.apache.hadoop.fs.Path(d.toString)).getLength).max
    val (nv, merged, carried) =
      VersionedTable.compactSmall(spark, root, smallBytes = bigBytes - 1)
    nv shouldBe 4L
    merged shouldBe 3
    carried shouldBe 1
    // head content unchanged; prior version intact
    VersionedTable.read(spark, root).count() shouldBe 5015L
    idsAt(root, 2) shouldBe (0L to 14L).toSet
    // merged stats are the manifest-union: pruning on id resolves exactly
    // the merged segment for an in-range probe, exactly the carried big
    // one for an out-of-union probe
    VersionedTable.resolveSegments(spark, root, "id", 3, 12).length shouldBe 1
    VersionedTable.resolveSegments(spark, root, "id", 3000, 3001)
      .length shouldBe 1
    VersionedTable.readPruned(spark, root, "id", 3, 12).count() shouldBe 10L
    // fewer than 2 qualifying segments: no commit
    VersionedTable.compactSmall(spark, root, smallBytes = 1L)._2 shouldBe 0
    VersionedTable.currentVersion(spark, root) shouldBe Some(4L)
  }

  test("commit is create-exclusive: a racing manifest makes the commit fail") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    // two writers race for v1: the first publish wins; the second — which
    // resolved the same next version before the first landed — must FAIL,
    // not silently overwrite (LocalFileSystem's plain rename would)
    val racing = java.nio.file.Paths.get(root, "_log", "v000001.manifest")
    java.nio.file.Files.writeString(racing, "seg_other\n")
    val e = intercept[java.io.IOException] {
      VersionedTable.publishManifest(spark, root, 1L, "seg_mine\n")
    }
    e.getMessage should include("lost the race")
    // the winning writer's manifest was NOT overwritten, loser's staging gone
    java.nio.file.Files.readString(racing) shouldBe "seg_other\n"
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_log", ".v1.manifest.tmp")) shouldBe false
  }

  test("NaN rows drop the stat instead of poisoning pruning") {
    val root = freshRoot()
    import spark.implicits._
    // Spark's max orders NaN above +Inf: a poisoned stat (mx=NaN) would
    // make mayIntersect false and silently prune rows that qualify
    VersionedTable.create(spark, root,
      Seq(1.0, 2.0, Double.NaN).toDF("x"), statCols = Seq("x"))
    VersionedTable.append(spark, root,
      Seq(100.0, 200.0).toDF("x"), statCols = Seq("x"))
    // the NaN segment carries NO stat → conservatively kept everywhere
    VersionedTable.segmentsOf(spark, root, 1L)
      .count(_.stats.isEmpty) shouldBe 1
    // the statless NaN segment is kept; the disjoint [100,200] one prunes
    VersionedTable.resolveSegments(spark, root, "x", 1, 2).length shouldBe 1
    VersionedTable.readPruned(spark, root, "x", 1, 2)
      .collect().map(_.getDouble(0)).toSet shouldBe Set(1.0, 2.0)
    // and mergeWhere still sees it as touchable
    val (_, rewritten, _) = VersionedTable.mergeWhere(
      spark, root, "x", 1, 2, _.where(!F.col("x").isNaN))
    rewritten shouldBe 1
    VersionedTable.read(spark, root).count() shouldBe 4L
  }

  test("createPartitioned rejects null/NaN part values and leaves no residue") {
    val root = freshRoot()
    import spark.implicits._
    val withNull = Seq((1L, Some(0.0)), (2L, None: Option[Double]))
      .toDF("id", "day")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.createPartitioned(spark, root, withNull, "day")
    }
    e.getMessage should include("nulls")
    // failed create leaves the root EMPTY: no staging, no orphan
    // segments, no manifest — the table can be created cleanly after
    val residue = Option(new java.io.File(root).listFiles())
      .map(_.filterNot(_.getName == "_log").toSeq).getOrElse(Seq.empty)
    residue shouldBe Seq.empty
    VersionedTable.currentVersion(spark, root) shouldBe None
    val nan = Seq((1L, 0.0), (2L, Double.NaN)).toDF("id", "day")
    intercept[IllegalArgumentException] {
      VersionedTable.createPartitioned(spark, root, nan, "day")
    }.getMessage should include("NaN")
    VersionedTable.createPartitioned(
      spark, root, withNull.where(F.col("day").isNotNull), "day")
      ._2 shouldBe 1
  }

  test("fences are scoped per appId: a restarted lineage is not swallowed") {
    val root = freshRoot()
    // lineage A commits batches 0..1
    VersionedTable.appendFenced(spark, root, df(1), 0L, appId = "A")
    VersionedTable.appendFenced(spark, root, df(2), 1L, appId = "A")
    // a NEW lineage (fresh checkpoint, ids restart at 0) must land, not
    // be silently dropped as a replay of A's history
    VersionedTable.appendFenced(spark, root, df(3), 0L, appId = "B")
      .isDefined shouldBe true
    VersionedTable.read(spark, root).count() shouldBe 3L
    // replays stay fenced WITHIN each lineage
    VersionedTable.appendFenced(spark, root, df(9), 1L, appId = "A") shouldBe None
    VersionedTable.appendFenced(spark, root, df(9), 0L, appId = "B") shouldBe None
    VersionedTable.currentFence(spark, root, "A") shouldBe Some(1L)
    VersionedTable.currentFence(spark, root, "B") shouldBe Some(0L)
    // both fences carry forward through an unfenced commit
    VersionedTable.append(spark, root, df(4))
    VersionedTable.currentFence(spark, root, "A") shouldBe Some(1L)
    VersionedTable.currentFence(spark, root, "B") shouldBe Some(0L)
    // fenceAt recovers WHERE each batch landed
    VersionedTable.fenceAt(spark, root, 0L, "A") shouldBe Some(0L)
    VersionedTable.fenceAt(spark, root, 2L, "B") shouldBe Some(0L)
    intercept[IllegalArgumentException] {
      VersionedTable.appendFenced(spark, root, df(9), 5L, appId = "a:b")
    }
    ()
  }

  test("schema evolution: head reads the union schema, old snapshots keep theirs") {
    val root = freshRoot()
    import spark.implicits._
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // a later segment adds a column — the Iceberg add-column evolution
    VersionedTable.append(spark, root,
      Seq((2L, "b", 9.5)).toDF("id", "v", "score"))
    val head = VersionedTable.read(spark, root, mergeSchema = true)
    head.columns.toSet shouldBe Set("id", "v", "score")
    head.where(F.col("score").isNull).count() shouldBe 1L // the old row
    head.agg(F.sum("score")).head().getDouble(0) shouldBe 9.5
    // snapshot-scoped schema: v0 still reads with its original 2 columns
    VersionedTable.read(spark, root, Some(0L), mergeSchema = true)
      .columns.toSet shouldBe Set("id", "v")
    // MOR delete still applies across the evolved schema
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") === 1))
    VersionedTable.read(spark, root, mergeSchema = true)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
  }

  test("append after expiry keeps numbering monotone and content correct") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    VersionedTable.append(spark, root, df(2))
    VersionedTable.expireSnapshots(spark, root, 1)
    VersionedTable.append(spark, root, df(3)) shouldBe 2L
    idsAt(root, 2) shouldBe Set(1L, 2L, 3L)
  }

  test("restore rolls back data but NEVER replay protection (fences carry)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    VersionedTable.appendFenced(spark, root, df(2), batchId = 7L) shouldBe Some(1L)
    // the incident: a bad replace wipes everything but id=1
    VersionedTable.replace(spark, root,
      VersionedTable.read(spark, root).where(F.col("id") === 1))
    VersionedTable.restore(spark, root, 1L) shouldBe 3L
    idsAt(root, 3) shouldBe Set(1L, 2L)
    // fence survived the rollback: batch 7's replay is still dropped
    VersionedTable.currentFence(spark, root) shouldBe Some(7L)
    VersionedTable.appendFenced(spark, root, df(9), batchId = 7L) shouldBe None
    VersionedTable.appendFenced(spark, root, df(9), batchId = 8L) shouldBe Some(4L)
    idsAt(root, 4) shouldBe Set(1L, 2L, 9L)
  }

  test("restore to a pre-rename snapshot serves that snapshot's schema") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    VersionedTable.renameColumn(spark, root, "id", "uid") shouldBe 1L
    VersionedTable.append(spark, root, {
      import spark.implicits._
      Seq(3L).toDF("uid")
    }) shouldBe 2L
    VersionedTable.restore(spark, root, 0L) shouldBe 3L
    // the restored head reads under the names v0 was committed with
    VersionedTable.read(spark, root).columns.toSeq shouldBe Seq("id")
    idsAt(root, 3) shouldBe Set(1L, 2L)
    // and the renamed intermediate stays readable under ITS names
    VersionedTable.read(spark, root, Some(2L)).columns.toSeq shouldBe Seq("uid")
  }

  test("removeOrphans deletes exactly the unreferenced debt, never live data") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    VersionedTable.append(spark, root, df(3))
    // orphan: a segment written by a writer that died before committing
    df(99).write.parquet(s"$root/seg_orphandead")
    // young-file age guard protects a concurrent writer's staged segment
    VersionedTable.removeOrphans(spark, root, olderThanMs = 3600000L) shouldBe Nil
    VersionedTable.removeOrphans(spark, root) shouldBe Seq("seg_orphandead")
    // every snapshot still reads exactly
    idsAt(root, 0) shouldBe Set(1L, 2L)
    idsAt(root, 1) shouldBe Set(1L, 2L, 3L)
    // idempotent: nothing left to collect
    VersionedTable.removeOrphans(spark, root) shouldBe Nil
  }

  test("orphan sweep age-floors staging files and collects CRC sidecars") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    // a live committer's freshly staged manifest (and its checksummed-fs
    // sidecar) must survive even a cutoff-0 maintenance call — staging
    // files are by definition pre-commit, so they get an age floor
    val tmp = new java.io.File(s"$root/_log/.v9.manifest.deadbeef.tmp")
    val crc = new java.io.File(s"$root/_log/..v9.manifest.deadbeef.tmp.crc")
    // a sidecar whose data file is already gone (consumed by the commit
    // hard-link): the accumulate-forever shape, hidden from Hadoop's
    // checksummed listStatus
    val lone = new java.io.File(s"$root/_log/..v8.manifest.cafe.tmp.crc")
    tmp.createNewFile() shouldBe true
    crc.createNewFile() shouldBe true
    lone.createNewFile() shouldBe true
    VersionedTable.removeOrphans(spark, root) shouldBe Nil
    tmp.exists() shouldBe true
    crc.exists() shouldBe true
    lone.exists() shouldBe true
    // backdated past the floor, all three are a crashed writer's debt
    val old = System.currentTimeMillis() - 7200000L
    tmp.setLastModified(old) shouldBe true
    crc.setLastModified(old) shouldBe true
    lone.setLastModified(old) shouldBe true
    val swept = VersionedTable.removeOrphans(spark, root)
    swept should contain allOf (
      "_log/.v9.manifest.deadbeef.tmp",
      "_log/..v8.manifest.cafe.tmp.crc")
    tmp.exists() shouldBe false
    crc.exists() shouldBe false // rides its data file's checksummed delete
    lone.exists() shouldBe false
  }

  test("stale init claim on a never-published root is swept, unblocking it") {
    val root = freshRoot()
    new java.io.File(s"$root/_log").mkdirs() shouldBe true
    val init = new java.io.File(s"$root/_log/.init")
    init.createNewFile() shouldBe true
    // claimed: every initializer loses the race (its dead segment is the
    // same debt a lost CAS append leaves, collected below)
    an[java.io.IOException] should be thrownBy
      VersionedTable.create(spark, root, df(1))
    // a FRESH claim is never swept (the claimant may be mid-publish)
    VersionedTable.removeOrphans(spark, root, olderThanMs = 3600000L) shouldBe Nil
    init.exists() shouldBe true
    // a stale claim with no manifest behind it is a crashed initializer
    init.setLastModified(System.currentTimeMillis() - 7200000L) shouldBe true
    VersionedTable.removeOrphans(spark, root,
      olderThanMs = 3600000L) shouldBe Seq("_log/.init")
    VersionedTable.create(spark, root, df(1)) shouldBe 0L
    idsAt(root, 0) shouldBe Set(1L)
  }

  test("removeOrphans refuses to guess on a non-versioned directory") {
    val dir = graft.Scratch.dir("graft_orphan_spec") + "/plain"
    df(1).write.parquet(s"$dir/seg_lookslikeone")
    VersionedTable.removeOrphans(spark, dir) shouldBe Nil
    spark.read.parquet(s"$dir/seg_lookslikeone").count() shouldBe 1L
  }
}
