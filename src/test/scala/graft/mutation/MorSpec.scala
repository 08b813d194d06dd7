package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Merge-on-read contract: equality deletes are O(changed rows) on the
  * write side, scoped by sequence number so re-inserts survive, applied
  * exactly once at scan time, and erasable by materialization — with
  * every prior snapshot intact throughout. */
class MorSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_mor_spec") + "/t"

  private def kv(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def at(root: String, v: Long): Set[(Long, String)] =
    VersionedTable.read(spark, root, Some(v))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def segNames(root: String): (Int, Int) = {
    val segs = VersionedTable.segmentsOf(
      spark, root, VersionedTable.currentVersion(spark, root).get)
    (segs.count(!_.isDelete), segs.count(_.isDelete))
  }

  test("morDelete writes one delete segment; data segments untouched; history intact") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      kv(1L -> "a", 2L -> "b", 3L -> "c"), statCols = Seq("id"))
    VersionedTable.append(spark, root, kv(4L -> "d"), statCols = Seq("id"))
    val dataDirsBefore = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("seg_")).map(_.getName).toSet
    val (nv, n) = VersionedTable.morDelete(
      spark, root, Seq("id"), _.where(F.col("id") % 2 === 0))
    nv shouldBe 2L
    n shouldBe 2L
    // O(delta) writes: every pre-existing data directory is byte-for-byte
    // untouched; exactly one del_ directory appeared
    new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("seg_")).map(_.getName).toSet shouldBe
      dataDirsBefore
    segNames(root) shouldBe ((2, 1))
    at(root, 2) shouldBe Set(1L -> "a", 3L -> "c")
    // the pre-delete snapshot still reads whole
    at(root, 1) shouldBe Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    // deleting nothing commits nothing
    VersionedTable.morDelete(
      spark, root, Seq("id"), _.where(F.col("id") === 999))._2 shouldBe 0L
    VersionedTable.currentVersion(spark, root) shouldBe Some(2L)
  }

  test("seq scoping: a re-inserted key is NOT swallowed by an older delete") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a", 2L -> "b"))
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") === 2))
    // key 2 returns with new content — the delete (seq 1) must not touch
    // the new segment (seq 2)
    VersionedTable.append(spark, root, kv(2L -> "b2"))
    at(root, 2) shouldBe Set(1L -> "a", 2L -> "b2")
    // and the interim snapshot still shows the deleted state
    at(root, 1) shouldBe Set(1L -> "a")
  }

  test("morUpsert retires old key versions and inserts new ones in one commit") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val nv = VersionedTable.morUpsert(
      spark, root, kv(2L -> "B", 9L -> "i"), Seq("id"))
    nv shouldBe 1L
    at(root, 1) shouldBe Set(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i")
    at(root, 0) shouldBe Set(1L -> "a", 2L -> "b", 3L -> "c")
    // a second upsert over the SAME key: only the latest value survives
    VersionedTable.morUpsert(spark, root, kv(2L -> "BB"), Seq("id"))
    at(root, 2) shouldBe Set(1L -> "a", 2L -> "BB", 3L -> "c", 9L -> "i")
    // null keys are rejected loudly
    import spark.implicits._
    intercept[IllegalArgumentException] {
      VersionedTable.morUpsert(spark, root,
        Seq((Option.empty[Long], "x")).toDF("id", "v"), Seq("id"))
    }
    ()
  }

  test("morMaterialize erases delete debt without changing content; history intact") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a", 2L -> "b"),
      statCols = Seq("id"))
    VersionedTable.append(spark, root, kv(3L -> "c"), statCols = Seq("id"))
    VersionedTable.morUpsert(spark, root, kv(2L -> "B"), Seq("id"),
      statCols = Seq("id"))
    val before = at(root, 2)
    val (nv, rewritten, dropped) =
      VersionedTable.morMaterialize(spark, root, statCols = Seq("id"))
    nv shouldBe 3L
    // only the segments the delete could touch (seq < delSeq) rewrite:
    // the two original data segments, not the upsert's own data segment
    rewritten shouldBe 2
    dropped shouldBe 1
    segNames(root) shouldBe ((3, 0))
    at(root, 3) shouldBe before
    at(root, 2) shouldBe before // MOR snapshot still readable
    // stats survive materialization: pruning still resolves narrowly
    VersionedTable.resolveSegments(spark, root, "id", 3, 3)
      .length shouldBe 1
    // idempotent: nothing to do on a clean table
    VersionedTable.morMaterialize(spark, root)._3 shouldBe 0
  }

  test("mergeWhere and compactSmall materialize applicable deletes, never resurrect") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a", 2L -> "b"),
      statCols = Seq("id"))
    VersionedTable.append(spark, root, kv(10L -> "x", 11L -> "y"),
      statCols = Seq("id"))
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") === 2 || F.col("id") === 11))
    // COW merge over [0,5]: touched slice must come out deletes-applied
    val (_, rw, _) = VersionedTable.mergeWhere(
      spark, root, "id", 0, 5,
      _.withColumn("v", F.upper(F.col("v"))), statCols = Seq("id"))
    rw shouldBe 1
    at(root, 3) shouldBe Set(1L -> "A", 10L -> "x")
    // the delete segment was carried (still applies to the carried data)
    segNames(root)._2 shouldBe 1
    // compaction folds data segments only and applies the delete
    val (_, merged, _) =
      VersionedTable.compactSmall(spark, root, smallBytes = Long.MaxValue)
    merged shouldBe 2
    at(root, 4) shouldBe Set(1L -> "A", 10L -> "x")
    // after expiry of old snapshots the del segment becomes dead and is vacuumed
    VersionedTable.expireSnapshots(spark, root, 1)
    new java.io.File(root).listFiles()
      .count(_.getName.startsWith("del_")) shouldBe 0
    at(root, 4) shouldBe Set(1L -> "A", 10L -> "x")
  }

  test("readPruned on a MOR table prunes data AND delete segments soundly") {
    val root = freshRoot()
    import spark.implicits._
    def seg(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"v$i")).toDF("id", "v")
    VersionedTable.create(spark, root, seg(0, 9), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(10, 19), statCols = Seq("id"))
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id").isin(3L, 12L)))
    VersionedTable.readPruned(spark, root, "id", 0, 9)
      .collect().map(_.getLong(0)).toSet shouldBe
      (0L to 9L).toSet - 3L
    VersionedTable.readPruned(spark, root, "id", 10, 19)
      .collect().map(_.getLong(0)).toSet shouldBe
      (10L to 19L).toSet - 12L
    // disjoint probe: zero rows, and the files-read gate stays data-only
    VersionedTable.readPruned(spark, root, "id", 100, 200).count() shouldBe 0L
    VersionedTable.resolveSegments(spark, root, "id", 0, 9).length shouldBe 1
  }

  test("morUpsertFenced: replay-fenced CDC apply, creates on first batch") {
    val root = freshRoot()
    VersionedTable.morUpsertFenced(
      spark, root, kv(1L -> "a", 2L -> "b"), Seq("id"), 0L, appId = "cdc")
      .isDefined shouldBe true
    VersionedTable.morUpsertFenced(
      spark, root, kv(2L -> "B", 3L -> "c"), Seq("id"), 1L, appId = "cdc")
      .isDefined shouldBe true
    // replay of batch 1 is skipped whole
    VersionedTable.morUpsertFenced(
      spark, root, kv(2L -> "ZZZ"), Seq("id"), 1L, appId = "cdc") shouldBe None
    at(root, VersionedTable.currentVersion(spark, root).get) shouldBe
      Set(1L -> "a", 2L -> "B", 3L -> "c")
  }

  test("changelog folds the fromV snapshot into the toV snapshot exactly") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, kv(3L -> "c"))
    VersionedTable.morUpsert(spark, root, kv(2L -> "B", 4L -> "d"), Seq("id"))
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") === 1))
    val cs = VersionedTable.changelog(spark, root, 0L, 3L)
    cs.map(_.version) shouldBe Seq(1L, 2L, 3L)
    cs(0).inserted.get.count() shouldBe 1L    // the append
    cs(0).deletedKeys shouldBe None
    cs(1).inserted.get.count() shouldBe 2L    // upsert rows
    cs(1).deletedKeys.get.count() shouldBe 2L // upsert retractions
    cs(2).inserted shouldBe None
    cs(2).deletedKeys.get.count() shouldBe 1L // the delete
    val replica = VersionedTable.applyChangelog(
      VersionedTable.read(spark, root, Some(0L)), cs)
    replica.collect().map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      at(root, 3L)
    // empty window: no change sets
    VersionedTable.changelog(spark, root, 3L, 3L) shouldBe Seq.empty
  }

  test("bloom sidecars skip segments stats cannot, degrade safely, die with vacuum") {
    val root = freshRoot()
    import spark.implicits._
    // round-robin layout: every segment spans the FULL id range, so
    // min/max stats prune nothing — the bloom's reason to exist
    def slice(m: Long) =
      (0L until 400L).filter(_ % 4 == m).map(i => (i, s"v$i")).toDF("id", "v")
    VersionedTable.create(spark, root, slice(0), statCols = Seq("id"))
    (1L to 3L).foreach(m =>
      VersionedTable.append(spark, root, slice(m), statCols = Seq("id")))
    // stats keep all 4 segments for any in-range point
    VersionedTable.resolveSegments(spark, root, "id", 17, 17).length shouldBe 4
    // before blooms exist, lookups conservatively open all 4
    VersionedTable.resolvePointLookup(spark, root, "id", 17L).length shouldBe 4
    VersionedTable.buildBlooms(spark, root, "id") shouldBe 4
    // with blooms: id=17 lives in exactly one segment (fpp may rarely
    // add one more — assert the prune happened, not perfection)
    val opened = VersionedTable.resolvePointLookup(spark, root, "id", 17L)
    opened.length should be <= 2
    VersionedTable.readPoint(spark, root, "id", 17L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq(17L -> "v17")
    // absent key: zero rows regardless of bloom false positives
    VersionedTable.readPoint(spark, root, "id", 5000L).count() shouldBe 0L
    // rebuild is idempotent
    VersionedTable.buildBlooms(spark, root, "id") shouldBe 0
    // MOR delete of the key: the point lookup must see it gone
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") === 17))
    VersionedTable.readPoint(spark, root, "id", 17L).count() shouldBe 0L
    // vacuum after a replace retires the dead segments' sidecars too
    VersionedTable.replace(spark, root,
      VersionedTable.read(spark, root), statCols = Seq("id"))
    VersionedTable.expireSnapshots(spark, root, 1)
    new java.io.File(root, "_blooms").listFiles()
      .count(_.getName.endsWith(".bloom")) shouldBe 0
  }

  test("compactBinpack folds into bounded bins, applies deletes, keeps history") {
    val root = freshRoot()
    import spark.implicits._
    def seg(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"v$i")).toDF("id", "v")
    // four similar-sized small segments + a MOR delete over them
    VersionedTable.create(spark, root, seg(0, 99), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(100, 199), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(200, 299), statCols = Seq("id"))
    VersionedTable.append(spark, root, seg(300, 399), statCols = Seq("id"))
    VersionedTable.morDelete(spark, root, Seq("id"),
      _.where(F.col("id") % 10 === 0))
    val before = VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSet
    val segBytes = VersionedTable.segmentBytes(spark, root)
      .filter(_._1.startsWith("seg_")).map(_._2)
    // target fits exactly two source segments per bin -> 2 bins of 2
    val target = segBytes.max * 2 + 16
    val (nv, binsWritten, folded) = VersionedTable.compactBinpack(
      spark, root, smallBytes = segBytes.max, targetBytes = target)
    binsWritten shouldBe 2
    folded shouldBe 4
    // content identical, deletes materialized into the bins
    VersionedTable.read(spark, root, Some(nv))
      .collect().map(_.getLong(0)).toSet shouldBe before
    VersionedTable.segmentsOf(spark, root, nv)
      .count(_.isDelete) shouldBe 0 // dangling delete retired at commit
    // stat union survives: a probe inside one bin's range opens 1 segment
    VersionedTable.resolveSegments(spark, root, "id", 1, 1)
      .length should be <= 2
    // prior version (with its delete) still reads correctly
    VersionedTable.read(spark, root, Some(nv - 1))
      .collect().map(_.getLong(0)).toSet shouldBe before
    // nothing foldable under a tiny target: no commit
    VersionedTable.compactBinpack(spark, root,
      smallBytes = Long.MaxValue, targetBytes = 1L)._2 shouldBe 0
  }

  test("mixed delete key sets are rejected") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> "a"))
    VersionedTable.morDelete(spark, root, Seq("id"), identity(_))
    intercept[IllegalArgumentException] {
      VersionedTable.morUpsert(spark, root, kv(2L -> "b"), Seq("id", "v"))
    }
    ()
  }
}
