package graft.mutation

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Zero-copy shallow clone of a VersionedTable (A52): by-reference
  * manifests, independent evolution, vacuum safety. */
class ShallowCloneSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def work(): String =
    Files.createTempDirectory("graft_clone_spec").toString

  private def rows(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i % 5).toLong)).toDF("k", "v")
  }

  test("clone reads the source snapshot without copying a single data file") {
    val w = work()
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, rows(10), statCols = Seq("k"))
    VersionedTable.append(spark, src, rows(20).where(col("k") > 10))
    val v = VersionedTable.shallowClone(spark, src, dst)
    v shouldBe 1L
    VersionedTable.read(spark, dst).count() shouldBe 20
    // every manifest entry is an external reference; nothing local
    val segs = VersionedTable.segmentsOf(spark, dst, v)
    segs should have size 2
    all(segs.map(_.name)) should include(":/")
    new java.io.File(dst).listFiles().map(_.getName).toSet shouldBe Set("_log")
    // carried stats keep pruning through external refs
    VersionedTable.readPruned(spark, dst, "k", 1.0, 5.0).count() shouldBe 5
  }

  test("clone evolves independently; source and clone history both intact") {
    val w = work()
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, rows(10))
    VersionedTable.shallowClone(spark, src, dst)
    VersionedTable.append(spark, dst, rows(12).where(col("k") > 10))
    // MOR delete on the clone must anti-join across EXTERNAL segments
    val (v, nDel) = VersionedTable.morDelete(spark, dst, Seq("k"),
      _.where(col("k") % 2 === 0))
    v shouldBe 2L
    nDel shouldBe 6L
    VersionedTable.read(spark, dst).count() shouldBe 6
    // source untouched, clone's pre-mutation snapshot still readable
    VersionedTable.currentVersion(spark, src) shouldBe Some(0L)
    VersionedTable.read(spark, src).count() shouldBe 10
    VersionedTable.read(spark, dst, Some(0L)).count() shouldBe 10
  }

  test("clone-side vacuum and expiry never touch source files") {
    val w = work()
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, rows(10))
    VersionedTable.shallowClone(spark, src, dst)
    VersionedTable.append(spark, dst, rows(11).where(col("k") > 10))
    VersionedTable.replace(spark, dst, VersionedTable.read(spark, dst))
    VersionedTable.removeOrphans(spark, dst) shouldBe empty
    // expire everything but the head: only CLONE-LOCAL dead segments die
    VersionedTable.expireSnapshots(spark, dst, keep = 1)
    VersionedTable.read(spark, src).count() shouldBe 10
    VersionedTable.read(spark, dst).count() shouldBe 11
  }

  test("cloning a specific version, and refusing a non-empty destination") {
    val w = work()
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, rows(10))
    VersionedTable.append(spark, src, rows(15).where(col("k") > 10))
    VersionedTable.shallowClone(spark, src, dst, Some(0L)) shouldBe 0L
    VersionedTable.read(spark, dst).count() shouldBe 10
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.shallowClone(spark, src, s"$w/dst")
  }

  test("create and clone racing for one root collide on the init claim") {
    val w = work()
    val src = s"$w/src"
    VersionedTable.create(spark, src, rows(10))
    VersionedTable.append(spark, src, rows(12).where(col("k") > 10))
    // The per-version manifest CAS cannot arbitrate this race: create
    // publishes v0 while the clone's first version is the SOURCE version
    // (here 1), so both would land in one history. Simulate the window —
    // a competing initializer has claimed the root but not yet published,
    // which is invisible to the empty-destination check alone.
    val a = s"$w/a"
    new java.io.File(s"$a/_log").mkdirs() shouldBe true
    new java.io.File(s"$a/_log/.init").createNewFile() shouldBe true
    (the[java.io.IOException] thrownBy
      VersionedTable.shallowClone(spark, src, a))
      .getMessage should include("lost the race")
    (the[java.io.IOException] thrownBy
      VersionedTable.create(spark, a, rows(3)))
      .getMessage should include("lost the race")
    // a successful initialization leaves its own claim behind, so even an
    // initializer that skipped the version check cannot publish beside it
    val b = s"$w/b"
    VersionedTable.shallowClone(spark, src, b) shouldBe 1L
    an[Exception] should be thrownBy VersionedTable.create(spark, b, rows(3))
    VersionedTable.read(spark, b).count() shouldBe 12
  }

  test("rename chain carries into the clone: old-era segments read renamed") {
    val w = work()
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, rows(10))
    VersionedTable.renameColumn(spark, src, "v", "val")
    val v = VersionedTable.shallowClone(spark, src, dst)
    v shouldBe 1L
    VersionedTable.read(spark, dst).columns should contain("val")
    VersionedTable.read(spark, dst).agg(sum("val")).head().getLong(0) shouldBe
      VersionedTable.read(spark, src).agg(sum("val")).head().getLong(0)
  }
}
