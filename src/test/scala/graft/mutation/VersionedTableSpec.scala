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
    // an unfenced commit afterwards clears the fence
    VersionedTable.append(spark, root, df(4))
    VersionedTable.currentFence(spark, root) shouldBe None
  }

  test("append after expiry keeps numbering monotone and content correct") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    VersionedTable.append(spark, root, df(2))
    VersionedTable.expireSnapshots(spark, root, 1)
    VersionedTable.append(spark, root, df(3)) shouldBe 2L
    idsAt(root, 2) shouldBe Set(1L, 2L, 3L)
  }
}
